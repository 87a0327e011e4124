"""Window functions — SURVEY.md §2.5 (w1–w5).

Determinism discipline: every ROW-frame / row_number ordering carries a
unique tie-break key (partition-count changes reorder ties otherwise —
a latent bug at any scale); rank/percent_rank deliberately order by the
tie-prone key alone so peer semantics are actually exercised. Running sums
use the decimal parity bridge inside the window (sequential accumulation is
order-defined, but decimal keeps it airtight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trireme_spark.parity import DSCALE
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_W1_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
       ROW_NUMBER() OVER (PARTITION BY l_suppkey
           ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
       RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY l_suppkey
           ORDER BY l_quantity DESC) AS drnk,
       NTILE(4) OVER (PARTITION BY l_suppkey
           ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS quartile
FROM lineitem
"""


@register("win_ranking", oracle=_W1_ORACLE)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w1 — row_number / rank / dense_rank / ntile. rank & dense_rank order
    by the tie-heavy quantity alone (real peer groups); row_number & ntile
    add unique tie-breaks for determinism."""
    li = table(spark, sf_dir, "lineitem")
    total = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_quantity").desc(), "l_orderkey", "l_linenumber"
    )
    ties = Window.partitionBy("l_suppkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.row_number().over(total).alias("rn"),
        F.rank().over(ties).alias("rnk"),
        F.dense_rank().over(ties).alias("drnk"),
        F.ntile(4).over(total).alias("quartile"),
    )


_W2_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
    SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 3
"""


@register("win_topk_per_group", oracle=_W2_ORACLE)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w2 — top-3 orders per customer.

    At 100 TB: Spark 3.5+ rewrites rn<=3-over-window into a
    WindowGroupLimit (per-partition top-k heaps before the shuffle), so
    this does NOT sort whole partitions."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


_W3_ORACLE = """
SELECT event_id, user_id, value,
       value - LAG(value) OVER w AS delta_value,
       LEAD(event_type) OVER w AS next_type,
       LAG(event_type, 2, 'none') OVER w AS prev2_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("win_lag_lead", oracle=_W3_ORACLE)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w3 — per-user event deltas via lag/lead (with default value)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


_W4_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
           ORDER BY o_totalprice
           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS near_price_spend
FROM orders
"""


@register("win_running_frame", oracle=_W4_ORACLE)
def win_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w4 — running total (ROWS frame) + numeric RANGE frame.

    RANGE peers are value-defined, so no tie-break is needed (or allowed);
    the ROWS frame gets the usual unique ordering.

    Scale note: the ROWS frame is per-customer (partitioned, scales). The
    numeric RANGE-frame column is computed by the DISTRIBUTED two-pass
    operator (operators/winframes.py) instead of a naive global window:
    Spark evaluates a bounded-start sliding frame by re-aggregating the
    whole frame per row on ONE reducer — O(n·frame) serial, measured
    62 s at sf0.1 vs ~3 s distributed — while the operator is exact in
    decimal and oracle-pinned to the same window SQL."""
    from trireme_spark.operators.winframes import global_range_frame_sum

    o = table(spark, sf_dir, "orders")
    rows_w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    price_dec = F.col("o_totalprice").cast(DSCALE)
    running = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(price_dec).over(rows_w).cast("double").alias("running_spend"),
    )
    return global_range_frame_sum(
        running,
        id_col="o_orderkey",
        value_col="o_totalprice",
        frame_width=10000,
        out_col="near_price_spend",
    )


_W5_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ROUND(PERCENT_RANK() OVER peers, 8) AS pct_rank,
       ROUND(CUME_DIST() OVER peers, 8) AS cume,
       FIRST_VALUE(o_orderkey) OVER seq AS cheapest_key,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
       ) AS priciest_key
FROM orders
WINDOW peers AS (PARTITION BY o_orderpriority ORDER BY o_totalprice),
       seq AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("win_analytic", oracle=_W5_ORACLE)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w5 — percent_rank / cume_dist (peer semantics on the raw ordering)
    + first/last value over explicit ROWS frames."""
    o = table(spark, sf_dir, "orders")
    peers = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    seq = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The oracle's LAST_VALUE over (CURRENT ROW .. UNBOUNDED FOLLOWING) is
    # the partition's final row — a per-partition CONSTANT. Spark executes
    # an UnboundedFollowing frame by rescanning current→end for EVERY row
    # (O(n²) per partition — measured 52 s at sf0.1); the full
    # unbounded-both-ends frame computes the identical constant once per
    # partition (O(n)).
    tail = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(peers), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(peers), 8).alias("cume"),
        F.first("o_orderkey").over(seq).alias("cheapest_key"),
        F.last("o_orderkey").over(tail).alias("priciest_key"),
    )


_W6_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
           ORDER BY o_totalprice
           RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS near_price_spend
FROM orders
"""


@register("win_range_frame_distributed", oracle=_W6_ORACLE)
def win_range_frame_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w6 (addendum) — the SAME global numeric RANGE-frame sum as w4's
    near_price_spend, computed WITHOUT a one-reducer window: per-value
    group sums → two-pass distributed cumulative → union-style as-of
    lookup of each row's frame floor (operators/winframes.py). The oracle
    is the plain window SQL, so the rewrite is proven exactly equivalent
    — this key exists to demonstrate the 100 TB form of w4's docstring."""
    from trireme_spark.operators.winframes import global_range_frame_sum

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return global_range_frame_sum(
        o,
        id_col="o_orderkey",
        value_col="o_totalprice",
        frame_width=10000.0,
        out_col="near_price_spend",
    )


_WCD_ORACLE = """
SELECT event_id, user_id,
       count(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS distinct_types_so_far
FROM events
"""


@register("win_count_distinct", oracle=_WCD_ORACLE)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per key — Spark's window functions reject
    DISTINCT aggregates outright, so the idiomatic workaround is
    ``size(collect_set(...))`` over the running frame: the set
    deduplicates, its size is the distinct count. The oracle runs the
    real COUNT(DISTINCT ...) OVER that other engines accept, pinning the
    workaround's equivalence.

    Scale note: window state is the per-frame distinct VALUE SET — fine
    for low-cardinality columns (event types, status codes; this is the
    standard use), but a high-cardinality column would make each frame's
    state O(distinct values); that path wants the windowed HLL sketch
    (agg_approx_distinct's machinery) instead."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias(
            "distinct_types_so_far"
        ),
    )


# ---------------------------------------------------------------------------
# win_pattern_runs — MATCH_RECOGNIZE-style monotone-run detection
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), r AS (
  SELECT user_id, ts, event_id, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
)
SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
       CAST(COUNT(*) AS BIGINT) AS run_len,
       MIN(event_id) AS first_event,
       ROUND(MAX(value) - MIN(value), 6) AS gain
FROM r
GROUP BY user_id, run_id
HAVING COUNT(*) >= 4
"""


@register("win_pattern_runs", oracle=_RUNS_ORACLE)
def win_pattern_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (MATCH_RECOGNIZE-lite): maximal
    strictly-increasing runs of ``value`` per user, reported when the
    run spans ≥ 4 events — the trend/CEP shape (ramp detection, retry
    storms, escalating latencies) that pattern-matching clauses express
    and plain SQL engines answer with gaps-and-islands algebra.

    Scale design: ONE user_id-keyed shuffle serves the whole pattern —
    the break flag (lag), the run id (running sum of breaks), and the
    per-run aggregate all ride the same partitioning (Catalyst reuses
    the exchange; the agg is map-side combinable on (user, run)).
    A NULL or non-increasing step breaks the run (CASE ... ELSE 1 —
    NULL-safe by construction, same rule both engines); runs aggregate
    min/max only, so gain is exact at the fixture's 6-dp value grain.
    Run ids are per-user ordinal positions — deterministic under any
    partitioning, nothing global."""
    ev = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.col("value") > F.lag("value").over(wo), F.lit(0)
    ).otherwise(F.lit(1))
    s = ev.select("user_id", "ts", "event_id", "value", brk.alias("brk"))
    run = s.withColumn(
        "run_id",
        F.sum("brk")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    return (
        run.groupBy("user_id", "run_id")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("event_id").alias("first_event"),
            F.round(F.max("value") - F.min("value"), 6).alias("gain"),
        )
        .where(F.col("run_len") >= 4)
    )


# ---------------------------------------------------------------------------
# win_nth_value — positional value extraction over running frames
# ---------------------------------------------------------------------------

_NTH_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       first_value(o_orderkey) OVER w AS first_key,
       last_value(o_orderkey) OVER w AS latest_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("win_nth_value", oracle=_NTH_ORACLE)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window extraction: nth_value(2) (the runner-up price
    seen so far), first_value and last_value over an explicit RUNNING
    frame per customer — the "compare each row to the leaders so far"
    analytic (price anchoring, second-best bids, leaderboard deltas).

    The frame is pinned ROWS UNBOUNDED PRECEDING..CURRENT on BOTH
    engines: nth_value's default-frame behavior differs subtly across
    engines (RANGE vs ROWS on ties), so the explicit frame is the
    parity contract, with (price DESC, orderkey) making every frame
    prefix deterministic. One customer-keyed shuffle, O(1) frame state
    per function, no unbounded-following scans."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("latest_key"),
    )


# ---------------------------------------------------------------------------
# win_time_range_trailing — per-key trailing-interval RANGE frame
# ---------------------------------------------------------------------------

_30D_US = 30 * 86400 * 10**6

_TRAILING_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
         PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
         RANGE BETWEEN {_30D_US} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d_spend
FROM orders
"""


@register("win_time_range_trailing", oracle=_TRAILING_ORACLE)
def win_time_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day spend per customer at each order — the
    time-interval RANGE frame ("rolling sum over the last N days"),
    the per-key sibling of w4/w6's global numeric frame. RANGE (not
    ROWS) is the semantic point: same-instant orders are frame PEERS
    and always aggregate together, so the result is independent of any
    tie-breaking order.

    Cross-engine contract: both engines order by the EPOCH-MICROSECOND
    long (NTZ timestamps don't cast to long — the unix_micros bridge)
    with an integer frame width, so frame membership is exact integer
    arithmetic — no interval-type or calendar semantics can diverge.
    Decimal-exact partial sums (order-independent within the frame).

    Scale design: one customer-keyed shuffle; the running RANGE frame
    evaluates incrementally (O(1) amortized per row, bounded by events
    inside the window) — never a per-row rescan; key cardinality is
    |customers|, so parallelism scales with the dimension and no global
    single-reducer window exists."""
    o = table(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(us)
        .rangeBetween(-_30D_US, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(DSCALE))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )


# ---------------------------------------------------------------------------
# win_moving_quantile — trailing exact median over a keyed rows frame
# ---------------------------------------------------------------------------

_MOVQ_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
       ROUND(quantile_cont(l_extendedprice, 0.5) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10
FROM lineitem
"""


@register("win_moving_quantile", oracle=_MOVQ_ORACLE)
def win_moving_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exact MEDIAN per supplier over the last 10 shipments —
    the order-statistic sibling of the moving average: robust to the
    price spikes that drag a rolling mean (the reason ops dashboards
    plot rolling medians). Exact, not approx: percentile() as a WINDOW
    aggregate with a bounded ROWS frame.

    Scale design: one keyed window (shuffle on l_suppkey, time-ordered),
    frame state bounded at 10 rows — the per-frame sort the exact
    order statistic needs is O(10 log 10) on a constant-size buffer,
    NOT the O(n²)-per-partition trap of an unbounded frame (the class
    the r2 scale sweep caught twice). Parity: Spark percentile() and
    DuckDB quantile_cont() both linearly interpolate; ROUND(4) absorbs
    the interpolation's last-ulp division drift."""
    li = table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-9, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round(
            F.percentile("l_extendedprice", F.lit(0.5)).over(w), 4
        ).alias("med10"),
    )


# --- win_topk_with_ties (registered r11; r13 grading window) -----------------
# Cadence-batch key 2 (SURVEY round-11 log). WITH TIES top-k: the
# row_number() top-k (win_topk_per_group) DROPS tied rows at the
# boundary arbitrarily unless the order is a total order; RANK-based
# top-k keeps every row tied with rank k — the semantics SQL spells
# FETCH FIRST k ROWS WITH TIES.

_TOPK_TIES_ORACLE = """
WITH cnt AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, o_custkey, n_orders, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT c_mktsegment, o_custkey, n_orders,
         RANK() OVER (PARTITION BY c_mktsegment
                      ORDER BY n_orders DESC) AS rnk
  FROM cnt
) WHERE rnk <= 3
"""


@register("win_topk_with_ties", oracle=_TOPK_TIES_ORACLE)
def win_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment by order count, WITH TIES —
    every customer whose RANK is <= 3 survives, so boundary ties return
    more than 3 rows instead of an arbitrary subset.

    Scale design: the oracle's direct form is a RANK window partitioned
    by segment — 5 partitions each holding ~N/5 customers, a skewed
    corpus-grain sort at scale. The implementation is the TWO-PASS
    rewrite: collapse to the (segment, value) grain first (map-side-
    combined count of customers per distinct order-count — bounded by
    the distinct-value alphabet, not by customers), compute each
    value's rank-start 1 + #{customers with strictly greater value}
    as a running sum over that DIMENSION-sized frame, keep values with
    rank_start <= 3, and semi-join the surviving values back onto the
    customer-grain rollup (hash join, no sort). The corpus-grain data
    is never windowed — the same two-pass doctrine as
    win_range_frame_distributed / two_pass_ntile.

    Cross-engine parity: counts and ranks are exact integers; RANK for
    a kept row equals its value's rank_start (all rows sharing a value
    share the rank) — no tie-break needed, which is the point.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cnt = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .join(c, "o_custkey")
    )
    vals = cnt.groupBy("c_mktsegment", "n_orders").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    wv = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("n_orders").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = vals.select(
        "c_mktsegment",
        "n_orders",
        (F.sum("n_cust").over(wv) - F.col("n_cust") + 1).alias("rnk"),
    ).where(F.col("rnk") <= 3)
    return cnt.join(keep, ["c_mktsegment", "n_orders"]).select(
        "c_mktsegment",
        "o_custkey",
        "n_orders",
        F.col("rnk").cast("long").alias("rnk"),
    )
