"""Projection / filter / predicates — SURVEY.md §2.2 (p1–p7).

All pure per-row, shuffle-free plans: filter + project inside one
whole-stage-codegen span, predicates pushed into the parquet scan
(``PushedFilters`` in the explain output). Per-row double arithmetic is
IEEE-deterministic, so raw doubles compare exactly against the oracle with
no decimal bridge needed (that's only for aggregation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.registry import register
from trireme_spark.sources.io import table

_P1_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity > 45 AND l_extendedprice <= 60000
  AND l_returnflag <> 'N' AND l_shipdate >= TIMESTAMP '1997-01-01'
"""


@register("filter_comparison", oracle=_P1_ORACLE)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p1 — the six comparison operators on numbers and timestamps."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45)
        & (F.col("l_extendedprice") <= 60000)
        & (F.col("l_returnflag") != "N")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


_P2_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice BETWEEN 20000 AND 40000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


@register("filter_between_in", oracle=_P2_ORACLE)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p2 — BETWEEN and IN-list predicates."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_totalprice").between(20000, 40000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


_P3_ORACLE = r"""
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%widget%'
  AND p_brand LIKE 'Brand#1_'
  AND regexp_matches(p_type, '^(ECONOMY|PROMO)$')
"""


@register("filter_like_regex", oracle=_P3_ORACLE)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p3 — LIKE infix, LIKE single-char wildcard, and regex match."""
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%widget%")
        & F.col("p_brand").like("Brand#1_")
        & F.col("p_type").rlike("^(ECONOMY|PROMO)$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


_P4_ORACLE = """
SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_or_null
FROM lineitem
WHERE (NULLIF(l_discount, 0.0) IS NULL AND l_quantity >= 30)
   OR (NULLIF(l_discount, 0.0) IS NOT NULL AND NOT l_returnflag = 'A')
"""


@register("filter_null_bool", oracle=_P4_ORACLE)
def filter_null_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p4 — IS (NOT) NULL plus AND/OR/NOT precedence.

    The fixtures are null-free, so nulls are derived via NULLIF — which also
    exercises three-valued logic through the OR.
    """
    li = table(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_or_null"),
        F.col("l_quantity"),
        F.col("l_returnflag"),
    ).where(
        (F.col("disc_or_null").isNull() & (F.col("l_quantity") >= 30))
        | (
            F.col("disc_or_null").isNotNull()
            & ~(F.col("l_returnflag") == "A")
        )
    ).select("l_orderkey", "l_linenumber", "disc_or_null")


_P5_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       l_quantity * 2.5 + 1 AS scaled_qty,
       -l_discount AS neg_disc
FROM lineitem
WHERE l_linenumber <= 2
"""


@register("project_compute", oracle=_P5_ORACLE)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p5 — arithmetic expression columns (per-row IEEE double: exact)."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
        (-F.col("l_discount")).alias("neg_disc"),
    )


_P6_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       CAST(o_orderstatus = 'F' AS INTEGER) AS is_final,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast
FROM orders
"""


@register("project_cast", oracle=_P6_ORACLE)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p6 — casts under ANSI mode.

    ``try_cast`` (not ``cast``) for the failing string→int case: Spark 4
    runs ANSI-on, where a plain cast of '1-URGENT' raises — same as DuckDB,
    and TRY_CAST yields NULL in both (SURVEY.md §4).
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # decimal→string, not raw DECIMAL: DuckDB's pandas bridge turns
        # decimals into float64 while Spark keeps Decimal — a hash trap.
        F.col("o_totalprice")
        .cast("decimal(12,2)")
        .cast("string")
        .alias("price_dec"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        # date→string, not raw DATE: pandas materializes Spark dates as
        # datetime.date but DuckDB dates as datetime64 — a hash trap.
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
    )


_P7_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 50000 THEN 'high'
            WHEN o_totalprice >= 10000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
       GREATEST(o_totalprice, 25000.0) AS floor_price,
       LEAST(CAST(o_orderkey AS DOUBLE), o_totalprice) AS least_mix
FROM orders
"""


@register("conditional_case", oracle=_P7_ORACLE)
def conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p7 — CASE WHEN / coalesce / nullif / greatest / least."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 50000, "high")
        .when(F.col("o_totalprice") >= 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_or_default"),
        F.greatest(F.col("o_totalprice"), F.lit(25000.0)).alias(
            "floor_price"
        ),
        F.least(F.col("o_orderkey").cast("double"), F.col("o_totalprice"))
        .alias("least_mix"),
    )


# ---------------------------------------------------------------------------
# filter_top_percent — percentile-threshold filtering (top 5% per group)
# ---------------------------------------------------------------------------

_TOPPCT_ORACLE = """
WITH th AS (
  SELECT o_orderpriority,
         ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, th.p95
FROM orders o JOIN th USING (o_orderpriority)
WHERE o.o_totalprice >= th.p95
"""


@register("filter_top_percent", oracle=_TOPPCT_ORACLE)
def filter_top_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5%-per-group filter — "the whales": rows at or above their
    OWN group's 95th percentile, the relative-threshold screen behind
    outlier review queues and premium segmentation (an absolute
    threshold drifts as the business grows; a percentile one doesn't).

    Two-pass shape: pass 1 computes one exact percentile per group
    (5-row threshold table), pass 2 re-scans with the broadcast
    thresholds as a codegen'd filter — NO per-row rank window over the
    corpus (the rank form shuffles everything; this shuffles nothing
    on pass 2 and the threshold table is dimension-sized forever).
    Spark percentile() and DuckDB quantile_cont share the linear-
    interpolation definition (the a7 parity); ROUND(4) guards the
    boundary, and ≥ on the ROUNDED threshold keeps the cut identical
    both engines. approx_percentile is the documented swap at
    corpus-keyed group cardinality."""
    o = table(spark, sf_dir, "orders")
    th = o.groupBy("o_orderpriority").agg(
        F.round(
            F.percentile(F.col("o_totalprice"), F.lit(0.95)), 4
        ).alias("p95")
    )
    return (
        o.join(F.broadcast(th), "o_orderpriority")
        .where(F.col("o_totalprice") >= F.col("p95"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "p95")
    )
