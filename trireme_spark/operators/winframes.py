"""Distributed global window frames.

A `SUM ... OVER (ORDER BY v RANGE BETWEEN W PRECEDING AND CURRENT ROW)`
with no PARTITION BY is a one-reducer window in every SQL engine's
physical plan. This module computes it with only keyed/broadcast
shuffles:

1. Collapse to per-distinct-value group sums (keyed aggregation).
2. Global inclusive cumulative C(v) over the distinct values via the
   two-pass trick: order-preserving range buckets, local running sum,
   broadcast per-range offsets.
3. Each row's frame sum = C(v) − C(greatest v' < v − W), the second term
   looked up by a union-style as-of: query points (v − W) interleave the
   data points in a second two-pass range ordering, carrying the last
   data C forward; ties order the query BEFORE the equal data point so
   the frame's inclusive lower bound is honored. Cross-range carry uses
   the monotonicity of C: the incoming value for a range is the running
   max of earlier ranges' local maxima (range metadata, broadcast).

Determinism rule (learned the hard way): range ids are PURE EXPRESSIONS
of the value — equal-width buckets between the table's min/max from a
one-row aggregate — never ``repartitionByRange + spark_partition_id()``.
Sampled range boundaries plus a nondeterministic partition id can
disagree between two executions of the same plan subtree (Catalyst does
not guarantee exchange reuse), silently corrupting the offsets;
an expression recomputes identically every time. Equal-width buckets
can skew on pathological value distributions — that costs balance,
never correctness (between-bucket ordering always holds).

All sums run in DECIMAL so the subtraction is exact and hash-matches the
oracle's window sum bit-for-bit after the final double cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trireme_spark.parity import DSCALE, meta_part


def _bucket(v, lo, hi, n: int):
    """Order-preserving equal-width bucket id of ``v`` over [lo, hi],
    clamped to [0, n-1] (values outside the bounds — e.g. query points
    below the min — pool in the edge buckets)."""
    raw = ((v - lo) / ((hi - lo) / n)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def global_range_frame_sum(
    df: DataFrame,
    id_col: str,
    value_col: str,
    frame_width,
    out_col: str = "frame_sum",
) -> DataFrame:
    """``df`` + ``out_col`` = SUM(value) OVER (ORDER BY value RANGE
    BETWEEN frame_width PRECEDING AND CURRENT ROW) — no global window.

    ``id_col`` must be unique (used to join the lookup back).
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    vdec = F.col(value_col).cast(DSCALE)

    from trireme_spark.operators.hints import cache_once

    # value bounds: one row, broadcast into every bucket expression —
    # cached, or each of its three crossJoin consumers replays a full
    # min/max pass over the input
    bounds = cache_once(
        df.agg(
            F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
        )
    )

    # 1. per-distinct-value sums (+ bucket id from the bounds)
    ps = (
        df.groupBy(value_col)
        .agg(F.sum(vdec).alias("grp"))
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "rng", _bucket(F.col(value_col), F.col("__lo"), F.col("__hi"), n)
        )
    )

    # 2. two-pass inclusive cumulative C(v)
    w_in = (
        Window.partitionBy("rng")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ps.withColumn("cum_local", F.sum("grp").over(w_in))
    # constant partition key: same single-partition execution over the
    # O(#buckets) offset table, but a non-empty partition spec silences
    # the scary-but-benign "No Partition Defined for Window" warning
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        local.groupBy("rng")
        .agg(F.sum("grp").alias("tot"))
        .withColumn(
            "off",
            F.coalesce(F.sum("tot").over(w_prev), F.lit(0).cast(DSCALE)),
        )
        .select("rng", "off")
    )
    # cum is O(#distinct values) — the compression this design rides;
    # cached, or its two consumers (the as-of data points and the final
    # re-attach join) each replay the whole per-value cumulative chain
    cum = cache_once(
        local.join(F.broadcast(offs), "rng").select(
            F.col(value_col).alias("v"),
            (F.col("cum_local") + F.col("off")).alias("C"),
        )
    )

    # 3. strict-below as-of lookup of each row's frame floor v - W.
    #    side -1 (queries) sorts before side 0 (data) at equal v, so a
    #    data point exactly AT the floor is not subtracted (inclusive
    #    frame lower bound).
    data_pts = cum.select(
        "v", F.lit(0).alias("side"), F.col("C").alias("C_data"),
        F.lit(None).cast("long").alias("qid"),
    )
    query_pts = df.select(
        (F.col(value_col) - F.lit(frame_width)).alias("v"),
        F.lit(-1).alias("side"),
        F.lit(None).cast(DSCALE).alias("C_data"),
        F.col(id_col).alias("qid"),
    )
    u = (
        data_pts.unionByName(query_pts)
        .crossJoin(F.broadcast(bounds))
        .withColumn("rng", _bucket(F.col("v"), F.col("__lo"), F.col("__hi"), n))
    )
    w2 = (
        Window.partitionBy("rng")
        .orderBy("v", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "fill_local", F.last("C_data", ignorenulls=True).over(w2)
    )
    # incoming carry per range: C is monotonic in v, so the last data C
    # of earlier ranges == the running max of their local maxima
    carries = (
        filled.groupBy("rng")
        .agg(F.max("C_data").alias("mx"))
        .withColumn("incoming", F.max("mx").over(w_prev))
        .select("rng", "incoming")
    )
    strict_below = (
        filled.join(F.broadcast(carries), "rng")
        .where(F.col("side") == -1)
        .select(
            F.col("qid").alias(id_col),
            F.coalesce(
                "fill_local", "incoming", F.lit(0).cast(DSCALE)
            ).alias("C_below"),
        )
    )

    with_c = df.join(cum.withColumnRenamed("v", value_col), value_col)
    return with_c.join(strict_below, id_col).select(
        *df.columns,
        (F.col("C") - F.col("C_below")).cast("double").alias(out_col),
    )


def two_pass_ntile(
    df: DataFrame,
    order,
    rng,
    n_tiles: int,
    out_col: str,
) -> DataFrame:
    """``df`` + ``out_col`` = NTILE(n_tiles) OVER (ORDER BY order...) —
    the global-quantile bucketer — without a single-reducer window.

    ``rng`` must be an order-preserving bucket expression of the leading
    sort key (same determinism rule as the module header: a PURE
    EXPRESSION, never a sampled/nondeterministic partition id). Skewed
    buckets cost balance, never correctness.

    Two passes: row_number within each range bucket (keyed window), plus
    broadcast per-range offsets → exact global rank r ∈ [1, N]; the tile
    is then SQL NTILE's fill rule — the first (N mod k) tiles take
    ⌈N/k⌉ rows, the rest ⌊N/k⌋ — computed from r and the broadcast total.
    """
    d = df.withColumn("__rng", rng)
    w_in = Window.partitionBy("__rng").orderBy(*order)
    local = d.withColumn("__loc", F.row_number().over(w_in))
    w_prev = (
        Window.partitionBy(meta_part("__rng"))
        .orderBy("__rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # counts is O(#range buckets) — cache it so the offsets and total
    # legs share one evaluation of the input subtree instead of each
    # replaying it (chained two_pass_ntile calls otherwise multiply the
    # upstream plan 3x per call; the orders_rfm_segments plan reached 54
    # scans of orders before this).
    from trireme_spark.operators.hints import cache_once

    counts = cache_once(
        local.groupBy("__rng").agg(F.count(F.lit(1)).alias("__n"))
    )
    offs = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_prev), F.lit(0))
    ).select("__rng", "__off")
    total = counts.agg(F.sum("__n").alias("__N"))
    r = F.col("__loc") + F.col("__off")
    q = F.floor(F.col("__N") / n_tiles)
    rem = F.col("__N") % n_tiles
    big = rem * (q + 1)  # rows living in the ⌈N/k⌉-sized leading tiles
    tile = (
        F.when(r <= big, F.ceil(r / (q + 1)))
        # greatest(q,1): when N < k, q = 0 but every row already took the
        # `big` branch — this only guards the dead division
        .otherwise(rem + F.ceil((r - big) / F.greatest(q, F.lit(1))))
    )
    return (
        local.join(F.broadcast(offs), "__rng")
        .crossJoin(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("__rng", "__loc", "__off", "__N")
    )
