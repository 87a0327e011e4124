"""Geospatial keys — grid-bucketed distance join over planted
coordinates. The fixture carries no lat/lon, so coordinates are planted
deterministically from the keys (the PII/HTML planting pattern: same
integer-hash construction in the oracle), keeping the check exact while
the OPERATOR — a radius join that never goes all-pairs — is real.

Scale shape: each side maps to a 1°×1° grid cell (pure expression);
the probe side expands to its 3×3 cell neighborhood (bounded ×9
fan-out), the join is a plain equi-join on the cell id, and the exact
haversine filter runs only on co-cell candidates. All-pairs distance
work never happens — the same bucket-then-verify doctrine as the
MinHash/IVF keys. The oracle brute-forces the small fixture cross join,
so the bucketed plan's COMPLETENESS (no pair missed at the cell
boundary) is value-checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.registry import register
from trireme_spark.sources.io import table

_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296

_RADIUS_KM = 50.0
_EARTH_R2 = 2 * 6371.0088


def _plant(key, salt: int):
    """Uniform [0,1) from an integer key — Knuth hash, oracle-mirrored."""
    h = F.pmod(
        F.pmod(F.col(key) + F.lit(salt), F.lit(_M31)) * F.lit(_KNUTH),
        F.lit(_M32),
    )
    return h.cast("double") / F.lit(float(_M32))


def _plant_sql(key: str, salt: int) -> str:
    return f"(((({key} + {salt}) % {_M31}) * {_KNUTH}) % {_M32}) / {_M32}.0"


def _hav_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"{_EARTH_R2} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2) ^ 2"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2) ^ 2))"
    )


_GEO_ORACLE = f"""
WITH c AS (
  SELECT c_custkey,
         {_plant_sql('c_custkey', 1)} * 120 - 60 AS lat,
         {_plant_sql('c_custkey', 2)} * 240 - 120 AS lon
  FROM customer
), s AS (
  SELECT s_suppkey,
         {_plant_sql('s_suppkey', 3)} * 120 - 60 AS lat,
         {_plant_sql('s_suppkey', 4)} * 240 - 120 AS lon
  FROM supplier
)
SELECT c_custkey, s_suppkey,
       FLOOR({_hav_sql('c.lat', 'c.lon', 's.lat', 's.lon')} * 1e6) / 1e6
           AS dist_km
FROM c CROSS JOIN s
WHERE FLOOR({_hav_sql('c.lat', 'c.lon', 's.lat', 's.lon')} * 1e6) / 1e6
      <= {_RADIUS_KM}
"""


def _haversine(lat1, lon1, lat2, lon2):
    a = (
        F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return F.lit(_EARTH_R2) * F.asin(F.sqrt(a))


@register("geo_distance_join", oracle=_GEO_ORACLE)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: every (customer, supplier) pair within 50 km of each
    other over planted coordinates — the spatial join primitive
    (store-coverage, rider-matching, geo dedup).

    Scale design: 1°×1° grid cells (≈111 km of latitude — always ≥ the
    50 km radius, and ≥ a longitude degree's span down to ±60° where the
    planted band ends, so a ±1-cell probe is COMPLETE); customers keep
    their single cell, suppliers explode to the 3×3 neighborhood
    (bounded ×9), the join is a hash equi-join on the cell id, and the
    exact haversine evaluates only for co-cell candidates — all-pairs
    never happens (the bucket-then-verify doctrine). Distances
    floor-quantize to 1e-6 km before the threshold compare and the
    output, so a libm ulp cannot flip a boundary pair cross-engine.
    The brute-force oracle value-checks the bucketed plan's
    completeness at every cell boundary in the fixture."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (_plant("c_custkey", 1) * 120 - 60).alias("lat"),
        (_plant("c_custkey", 2) * 240 - 120).alias("lon"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (_plant("s_suppkey", 3) * 120 - 60).alias("s_lat"),
        (_plant("s_suppkey", 4) * 240 - 120).alias("s_lon"),
    )
    cell = (
        F.floor(F.col("lat")).cast("long") * 1000
        + F.floor(F.col("lon")).cast("long")
    )
    c = cust.withColumn("cell", cell)
    # supplier probes its 3×3 neighborhood — bounded fan-out, pure expr
    offsets = F.array(
        *[
            F.lit(dy * 1000 + dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    s = supp.withColumn(
        "cell",
        F.explode(
            F.transform(
                offsets,
                lambda o: (
                    F.floor(F.col("s_lat")).cast("long") * 1000
                    + F.floor(F.col("s_lon")).cast("long")
                    + o
                ),
            )
        ),
    )
    dist = _haversine(
        F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")
    )
    qdist = F.floor(dist * F.lit(1e6)) / F.lit(1e6)
    return (
        c.join(s, "cell")
        .select(
            "c_custkey",
            "s_suppkey",
            qdist.alias("dist_km"),
        )
        .where(F.col("dist_km") <= _RADIUS_KM)
    )
