"""Aggregations — SURVEY.md §2.4 (a1–a9).

All hash aggregations: Catalyst plans partial (map-side) + final aggregation
automatically, so every groupBy here scales by shuffling only the partially
aggregated state, not raw rows. Double sums go through the parity bridge
(see :mod:`trireme_spark.parity`) to hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.parity import davg, dsum, oracle_avg, oracle_sum
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_A1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_sum('l_quantity')} AS sum_qty,
       {oracle_sum('l_extendedprice')} AS sum_base_price,
       {oracle_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {oracle_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {oracle_avg('l_quantity')} AS avg_qty,
       {oracle_avg('l_extendedprice')} AS avg_price,
       {oracle_avg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_pricing_summary", oracle=_A1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a1 — TPC-H Q1-shaped pricing summary (the flagship / ``entry()``).

    Plan shape at any scale: vectorized parquet scan with the shipdate
    predicate pushed to row-group stats → whole-stage-codegen'd project →
    partial hash agg → shuffle on (returnflag, linestatus) [9 groups → tiny]
    → final hash agg. The only shuffle carries ~9 rows per map task.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
