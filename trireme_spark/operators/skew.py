"""Skew-mitigation utilities (SURVEY.md §4).

AQE's skew-join splitting handles sort-merge joins automatically; salting is
the manual fallback for the cases AQE can't rewrite (aggregations over a hot
key, broadcast-ineligible dims, pre-AQE clusters). Both operators here are
result-identical to their naive forms — asserted in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where hot keys on the skewed side are spread over
    ``n_salts`` sub-partitions and the dim side is replicated to meet them.

    Cost model: the dim shuffle grows n_salts×, the skewed side's largest
    reducer shrinks n_salts× — the right trade whenever one key's rows
    exceed an executor's share. Salt assignment is a hash of the whole row
    (deterministic, uniform); join semantics are unchanged because the salt
    is an extra equi-conjunct that every replicated dim row satisfies.
    """
    salt = F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(n_salts))
    salted = skewed.withColumn("_salt", salt)
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(dim_rep, on + ["_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Hot-key aggregation in two shuffles: (key, salt) partial → key final.

    ``aggs`` maps output column → "sum:col" / "count:*" / "max:col" /
    "min:col" (decomposable aggregates only — that's what makes the
    two-phase split algebraically exact). Spark's own partial aggregation
    already map-side combines; this helps when one key dominates so hard
    that even the combined partials overload a single reducer.
    """
    salt = F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(n_salts))
    first_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        tmp = f"_p_{out}"
        if op == "count":
            first_exprs.append(F.count(F.lit(1)).alias(tmp))
            final_exprs.append(F.sum(tmp).alias(out))
        elif op == "sum":
            first_exprs.append(F.sum(col).alias(tmp))
            final_exprs.append(F.sum(tmp).alias(out))
        elif op == "max":
            first_exprs.append(F.max(col).alias(tmp))
            final_exprs.append(F.max(tmp).alias(out))
        elif op == "min":
            first_exprs.append(F.min(col).alias(tmp))
            final_exprs.append(F.min(tmp).alias(out))
        else:
            raise ValueError(f"non-decomposable agg spec: {spec}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *first_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)
