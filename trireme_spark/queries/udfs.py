"""UDF / UDAF / UDTF surface — SURVEY.md §2.10 (x1–x5).

UDFs are the slow path by design (SURVEY.md §4): everything that CAN be a
built-in is elsewhere in this engine; these keys exist to prove the Python
extension surface itself. x2–x4 are Arrow-vectorized (pandas batches cross
the JVM↔Python boundary columnar, ~10–100× over row-at-a-time); x1 is the
deliberate row-at-a-time counter-example; x5 is a Python UDTF.

Determinism note: the pandas aggregations use ``math.fsum``/order-stable
formulas and round coarsely enough that cross-engine float drift (≤1e-8 on
~1e4-magnitude ratios) cannot straddle a rounding boundary.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from trireme_spark.registry import register
from trireme_spark.sources.io import table

_X1_ORACLE = """
SELECT o_orderkey, CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio
FROM orders
"""


@register("udf_python", oracle=_X1_ORACLE)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x1 — row-scalar Python UDF ('1-URGENT' → 1). Row-at-a-time pickling;
    kept off every hot path — see x2 for the vectorized form."""
    prio = F.udf(lambda s: int(s[0]), IntegerType())
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", prio("o_orderpriority").alias("prio"))


_X2_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
"""


@register("udf_pandas_scalar", oracle=_X2_ORACLE)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x2 — vectorized scalar pandas UDF (Arrow batches; numpy does the
    same IEEE per-row ops as the JVM, so results match exactly)."""

    @F.pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


_X3_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
           AS weighted_avg_price
FROM lineitem GROUP BY l_returnflag
"""


@register("udaf_pandas_agg", oracle=_X3_ORACLE)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x3 — grouped-agg pandas UDF: quantity-weighted mean price.

    ``math.fsum`` makes the Python-side sums order-independent (correctly
    rounded), so the partition-order nondeterminism of the incoming batch
    can't leak into the result."""

    @F.pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        den = math.fsum(qty)
        return math.fsum(price * qty) / den if den else float("nan")

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wmean("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        )
    )


_X4_ORACLE = """
SELECT event_id, user_id,
       ROUND((value - AVG(value) OVER (PARTITION BY user_id))
             / STDDEV_SAMP(value) OVER (PARTITION BY user_id), 6) AS zscore
FROM events
"""


@register("udtf_grouped_map", oracle=_X4_ORACLE)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x4 — applyInPandas per-group transform: z-score of value per user.

    Scale caveat (by design, documented): applyInPandas materializes one
    group per Python worker call — fine for bounded per-user history, and
    the reason heavy normalization elsewhere in the engine uses window
    algebra instead."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        sd = v.std(ddof=1)
        pdf = pdf[["event_id", "user_id"]].copy()
        pdf["zscore"] = ((v - v.mean()) / sd).round(6)
        return pdf

    ev = table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, zscore double")
    )


_X5_ORACLE = """
WITH d AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(UNNEST(range(len(toks))) AS INTEGER) AS pos,
       UNNEST(toks) AS token
FROM d
"""


@register("udtf_python", oracle=_X5_ORACLE)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x5 — Python UDTF: one row per token with its position (the oracle
    zips DuckDB's dual UNNEST — WITH ORDINALITY is unimplemented there)."""

    @F.udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, token in enumerate(text.lower().split(" ")):
                yield doc_id, pos, token

    spark.udtf.register("trireme_tokenize", Tokenize)
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "trireme_docs_x5"
    )
    return spark.sql(
        "SELECT t.* FROM trireme_docs_x5, "
        "LATERAL trireme_tokenize(doc_id, text) t"
    )
