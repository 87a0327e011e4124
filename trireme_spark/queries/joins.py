"""Joins — SURVEY.md §2.3 (j1–j9).

Join-strategy notes for 100 TB (SURVEY.md §4): dims (region, nation,
supplier, customer at small SF) broadcast — explicitly hinted where the plan
must never degrade to a shuffle (j3, j9). Fact-fact joins shuffle on their
keys and rely on AQE for skew splitting. The non-equi joins (j5, j8) always
carry an equi conjunct (brand / user_id) so Catalyst plans a hash or
sort-merge join with the range condition as a post-join filter — never a
cartesian product.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trireme_spark.operators.asof import asof_join
from trireme_spark.operators.hints import (
    BROADCAST_GATE_BYTES,
    broadcast_if_small,
    plan_size_bytes,
)
from trireme_spark.parity import dsum, fquant, meta_part, oracle_sum
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_J1_ORACLE = """
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 30000
"""


@register("join_inner_equi", oracle=_J1_ORACLE)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j1 — plain equi inner join; planner picks broadcast vs SMJ by size."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 30000)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


_J2_ORACLE = """
SELECT 'left' AS side, c_custkey, o_orderkey, o_totalprice
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
     ON c_custkey = o_custkey
UNION ALL
SELECT 'right' AS side, c_custkey, o_orderkey, o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
     RIGHT JOIN orders ON c_custkey = o_custkey
UNION ALL
SELECT 'full' AS side, c_custkey, o_orderkey, o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
     FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
     ON c_custkey = o_custkey
"""


@register("join_left_right_full", oracle=_J2_ORACLE)
def join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j2 — the three outer variants, tagged and unioned, with real null
    sides on each (filtered inputs guarantee unmatched rows)."""

    def cols(side, df):
        return df.select(
            F.lit(side).alias("side"),
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
        )

    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000)
    left = c.join(big, c.c_custkey == big.o_custkey, "left")
    right = c.where(F.col("c_acctbal") < 0).join(
        o, F.col("c_custkey") == o.o_custkey, "right"
    )
    full = c.where(F.col("c_acctbal") > 9000).join(
        big, F.col("c_custkey") == big.o_custkey, "full"
    )
    return (
        cols("left", left)
        .unionByName(cols("right", right))
        .unionByName(cols("full", full))
    )


_J3_ORACLE = f"""
SELECT r_name, n_name,
       {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


@register("join_broadcast", oracle=_J3_ORACLE)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3 — star join with explicit broadcast hints on every dim.

    The explain plan shows three BroadcastHashJoins and zero shuffles before
    the final aggregation — at 100 TB the fact table streams through
    map-side joins, the only shuffle being the 125-group aggregate.
    """
    li = table(spark, sf_dir, "lineitem")
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_J4_ORACLE = """
SELECT 'with_big_order' AS tag, c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
UNION ALL
SELECT 'no_orders' AS tag, c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("join_semi_anti", oracle=_J4_ORACLE)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j4 — left-semi (EXISTS) and left-anti (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000)
    semi = c.join(
        big, c.c_custkey == big.o_custkey, "left_semi"
    ).select(F.lit("with_big_order").alias("tag"), "c_custkey", "c_name")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("no_orders").alias("tag"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


_J5_ORACLE = """
SELECT a.p_partkey AS small_key, b.p_partkey AS big_key,
       a.p_brand AS brand, a.p_size AS small_size, b.p_size AS big_size
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_size < b.p_size
 AND b.p_size - a.p_size <= 3
 AND a.p_partkey < b.p_partkey
"""


@register("join_theta_range", oracle=_J5_ORACLE)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j5 — non-equi (banded) self-join.

    The brand equi-conjunct is the scale guard: Catalyst joins on brand and
    applies the size-band predicate as a filter, so cost is
    sum(per-brand-group²), never |part|². For heavier skew you'd band
    p_size into buckets and join on (brand, bucket±1).
    """
    p = table(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") < F.col("b.p_size"))
        & (F.col("b.p_size") - F.col("a.p_size") <= 3)
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("small_key"),
        F.col("b.p_partkey").alias("big_key"),
        F.col("a.p_brand").alias("brand"),
        F.col("a.p_size").alias("small_size"),
        F.col("b.p_size").alias("big_size"),
    )


_J6_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("join_cross", oracle=_J6_ORACLE)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j6 — explicit cartesian product (tiny dims only — by design)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


_J7_ORACLE = """
WITH clicks AS (
    SELECT user_id, ts, value, event_id FROM events
    WHERE event_type = 'click'
    QUALIFY row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
), purchases AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       p.ts AS purchase_ts, c.ts AS asof_ts, c.value AS asof_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("join_asof", oracle=_J7_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j7 — as-of join: each purchase gets the latest click at or before it.

    Implemented by :func:`trireme_spark.operators.asof.asof_join` (union +
    window; one shuffle, O(1) window state). The oracle uses DuckDB's native
    ASOF JOIN. Clicks are deduped per (user, ts) first so engines agree on
    the survivor when timestamps collide.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value", "event_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        right_tie_col="event_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "asof_ts",
        F.col("asof_value").alias("asof_value"),
    )


_J8_ORACLE = """
SELECT s.event_id AS signup_id, p.event_id AS followup_id,
       s.user_id AS user_id, s.ts AS signup_ts, p.ts AS followup_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
"""


@register("join_interval", oracle=_J8_ORACLE)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j8 — interval containment join (purchase within 1 h of signup),
    equi on user_id + range filter — hash join, not BNL."""
    ev = table(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").alias("s")
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    return s.join(
        p,
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("s.ts"))
        & (F.col("p.ts") < F.col("s.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("s.event_id").alias("signup_id"),
        F.col("p.event_id").alias("followup_id"),
        F.col("s.user_id").alias("user_id"),
        F.col("s.ts").alias("signup_ts"),
        F.col("p.ts").alias("followup_ts"),
    )


_J9_ORACLE = f"""
SELECT n_name,
       {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("join_multiway", oracle=_J9_ORACLE)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j9 — TPC-H Q5 shape: 6-table chain with the FACT TABLE ALWAYS THE
    STREAM SIDE (guide §3.1: pick the build side deliberately).

    Opt r14: the former c→o→li chain let the planner auto-broadcast raw
    lineitem (its on-disk estimate sits under the 10 MB threshold at
    fixture scale), i.e. a 600 k-row hash-relation build + driver collect
    so a ~23 k-row stream could probe it — backwards
    (plans/r14/join_multiway_before.txt node 12). The chain now starts
    from lineitem and joins the filtered orders, customer and supplier
    sides through size-gated ``broadcast_if_small`` (reliable file-scan
    estimates; over the gate each degrades to a plain shuffle equi-join —
    at 100 TB orders won't fit and the li⋈o join correctly becomes
    SMJ/SHJ). Early projections keep the build rows narrow. Verified
    hash-identical at sf0.001/0.01/0.1 and vs the oracle; bench 1.04 s →
    ~0.75 s; plan: build sides now 23 k/15 k/1 k rows, lineitem never
    leaves the stream."""
    li = table(spark, sf_dir, "lineitem")
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(
        table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    return (
        li.join(broadcast_if_small(o), li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_small(c), o.o_custkey == c.c_custkey)
        .join(
            broadcast_if_small(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_JB_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@register("join_bucketed_colocated", oracle=_JB_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-co-located join: both sides bucketed 8-ways on the join key,
    so the sort-merge join runs with ZERO exchanges (asserted in
    tests/test_plans.py) — the bucketing layout that turns every repeated
    big-to-big join on the same key into a shuffle-free map-side merge at
    100 TB. Bucketed external tables live under /tmp (bucketBy requires
    saveAsTable); they are rebuilt only when absent.
    """
    import os

    from trireme_spark.sources.io import staging_dir

    tag = os.path.basename(sf_dir.rstrip("/"))
    names = {
        "orders": f"trireme_b_orders_{tag.replace('.', '_')}",
        "customer": f"trireme_b_customer_{tag.replace('.', '_')}",
    }
    keys = {"orders": "o_custkey", "customer": "c_custkey"}
    for tbl, name in names.items():
        # per-process path: a shared path raced — a second session whose
        # (session-local) catalog lacked the table would rmtree the data
        # files a concurrent session's table was actively reading
        path = staging_dir(f"b_{tbl}", tag)
        if not spark.catalog.tableExists(name):
            if os.path.isdir(path):
                import shutil

                shutil.rmtree(path, ignore_errors=True)
            (
                table(spark, sf_dir, tbl)
                .write.bucketBy(8, keys[tbl])
                .sortBy(keys[tbl])
                .option("path", path)
                .mode("overwrite")
                .saveAsTable(name)
            )
    # hint("merge"): at fixture scale the planner would broadcast the tiny
    # dim; this key demonstrates the big-to-big co-location path, where SMJ
    # over matching buckets is the zero-shuffle plan.
    o = spark.table(names["orders"]).hint("merge")
    c = spark.table(names["customer"])
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"
    )


_JIB_ORACLE = """
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       s.ts AS signup_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
"""


@register("join_interval_bucketed", oracle=_JIB_ORACLE)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi key (any purchase within 1 h after any
    signup), made scale-safe by time-bucketing: both sides key on the
    hour bucket, the probe side additionally explodes into its bucket
    and the next one (a 1-hour window spans at most 2 hour buckets), and
    the exact range predicate filters after the equi-join.

    Without the bucket key Spark plans this as BroadcastNestedLoopJoin —
    O(n·m) and a broadcast of a fact table; with it, a plain shuffled
    hash join on near-uniform keys. The bucket width = the window width
    keeps the candidate blow-up at exactly 2×. The oracle states the
    pure inequality join; results are identical because bucket-pairs
    cover every qualifying (s, p) and the range filter removes the rest.
    """
    ev = table(spark, sf_dir, "events")
    hour = lambda c: F.floor(F.unix_timestamp(c) / 3600)  # noqa: E731
    s = (
        ev.where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("signup_ts"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(hour(F.col("signup_ts")), hour(F.col("signup_ts")) + 1)
            ),
        )
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        hour(F.col("ts")).alias("bucket"),
    )
    return (
        s.join(p, "bucket")
        .where(
            (F.col("purchase_ts") >= F.col("signup_ts"))
            & (
                F.col("purchase_ts")
                < F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")
            )
        )
        .select("signup_id", "purchase_id", "signup_ts", "purchase_ts")
    )


_NEAREST_ORACLE = """
WITH c AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, e.event_id, e.ts,
         abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS d
  FROM orders o LEFT JOIN events e ON e.user_id = o.o_custkey
)
SELECT o_orderkey, o_custkey, o_orderdate,
       event_id AS nearest_event_id, ts AS nearest_ts,
       d AS diff_us
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey
                           ORDER BY d NULLS LAST, ts, event_id) = 1
"""


@register("join_asof_nearest", oracle=_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join, EITHER direction: each order matched to
    its user's temporally closest event (ties → earlier event, then
    smaller event_id). Composed from two backward as-of passes — the
    forward direction is the backward operator on negated microsecond
    timestamps — then a per-row tuple pick. Cost: two keyed window passes
    (operators/asof.py), no candidate join at all; the oracle's rank-all
    formulation is the O(orders × events-per-user) shape this avoids."""
    from trireme_spark.operators.asof import asof_join

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        # o_orderdate arrives TIMESTAMP_NTZ; the session is pinned UTC so
        # the ltz cast is value-preserving and matches DuckDB's epoch_us
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        (-F.unix_micros(F.col("ts").cast("timestamp"))).alias("neg_ts_us"),
        # negated id: asof keeps the LAST row in (ts, tie) order among
        # equal timestamps, so negating makes the survivor the SMALLEST
        # event_id — matching the oracle's tie-break
        (-F.col("event_id")).alias("neg_event_id"),
    )
    # asof_ts is the operator's carried right_ts (here: the µs long), so
    # event_id is the only extra value column each pass needs
    back = (
        asof_join(
            o,
            e.select("user_id", "ts_us", "event_id", "neg_event_id"),
            on="user_id",
            left_ts="od_us",
            right_ts="ts_us",
            value_cols=["event_id"],
            right_tie_col="neg_event_id",
        )
        .withColumnRenamed("asof_event_id", "b_id")
        .withColumnRenamed("asof_ts", "b_us")
    )
    o_neg = o.withColumn("neg_od_us", -F.col("od_us"))
    fwd = asof_join(
        o_neg,
        e.select("user_id", "neg_ts_us", "event_id", "neg_event_id"),
        on="user_id",
        left_ts="neg_od_us",
        right_ts="neg_ts_us",
        value_cols=["event_id"],
        right_tie_col="neg_event_id",
    ).select(
        "o_orderkey",
        F.col("asof_event_id").alias("f_id"),
        (-F.col("asof_ts")).alias("f_us"),
    )
    j = back.join(fwd, "o_orderkey")
    b_d = F.abs(F.col("od_us") - F.col("b_us"))
    f_d = F.abs(F.col("od_us") - F.col("f_us"))
    # lexicographic pick on (abs diff, event ts, event id); a missing side
    # loses via null-safe comparison
    take_b = F.when(F.col("b_us").isNull(), F.lit(False)).otherwise(
        F.when(F.col("f_us").isNull(), F.lit(True)).otherwise(
            (b_d < f_d)
            | ((b_d == f_d) & (F.col("b_us") < F.col("f_us")))
            | (
                (b_d == f_d)
                & (F.col("b_us") == F.col("f_us"))
                & (F.col("b_id") <= F.col("f_id"))
            )
        )
    )
    pick = lambda b, f: F.when(take_b, F.col(b)).otherwise(F.col(f))  # noqa: E731
    return j.select(
        "o_orderkey",
        F.col("user_id").alias("o_custkey"),
        "o_orderdate",
        pick("b_id", "f_id").alias("nearest_event_id"),
        F.timestamp_micros(pick("b_us", "f_us")).alias("nearest_ts"),
        F.when(take_b, b_d).otherwise(f_d).alias("diff_us"),
    )


_NULLSAFE_ORACLE = """
WITH o AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_key
  FROM orders
), dim AS (
  SELECT * FROM (VALUES ('O', 'open'), ('F', 'finished'),
                        (NULL, 'pending-unknown')) AS t(status_key, label)
)
SELECT o.o_orderkey, o.status_key, d.label
FROM o JOIN dim d ON o.status_key IS NOT DISTINCT FROM d.status_key
"""


@register("join_null_safe", oracle=_NULLSAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantic corner
    that loses rows in every naive dimension join over nullable keys
    (here: 'P' status nulled out, then recovered through the NULL row of
    the dimension).

    Scale note: null-safe equality is still a hash-partitionable equi-key
    (NULL hashes as a regular value), so the plan is an ordinary
    broadcast/shuffle hash join — no nested-loop penalty. But at real
    scale a nullable join key means every NULL lands in ONE hash bucket:
    if NULLs dominate, that is the skew path (join_skew_salted)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status_key"),
    )
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), (None, "pending-unknown")],
        "status_key string, label string",
    )
    return o.join(
        F.broadcast(dim), o.status_key.eqNullSafe(dim.status_key)
    ).select("o_orderkey", o.status_key.alias("status_key"), "label")


_BASKET_ORACLE = """
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs
GROUP BY part_a, part_b
HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 50
"""


@register("lineitem_market_basket", oracle=_BASKET_ORACLE)
def lineitem_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence — part pairs bought together across
    orders, support ≥ 2, top-50: the association-mining primitive
    (frequent itemset generation's 2-itemset pass).

    Scale design: the self-join is ORDER-KEYED, so pair fan-out is
    per-basket |items|² (≤ 13² here; baskets are small by nature) — never
    corpus²; the pair aggregation map-side combines and the top-50 folds
    into TakeOrderedAndProject. The classic at-scale refinement (prune
    below-support parts FIRST — apriori's monotonicity) drops here as one
    extra semi-join when item skew appears."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "l_orderkey").where(
        F.col("part_a") < F.col("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# graph_pagerank_copurchase — 3 power iterations over the co-purchase graph
# ---------------------------------------------------------------------------

# The co-purchase edge rule, shared by graph_pagerank_copurchase and
# graph_label_propagation (oracle side here, DataFrame side in
# _copurchase_edges): distinct (order, part) pairs, same-order part
# pairs src != dst, co-occurrence-count weights. One definition — the
# two graph keys cannot silently diverge on what an "edge" is.
_COPURCHASE_EDGE_CTE = """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst, COUNT(*) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
)"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame mirror of _COPURCHASE_EDGE_CTE (uncached — callers
    decide what to cache: pagerank caches the derived transition
    matrix, LPA caches these edges directly)."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _pr_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE body (see the
    Spark mirror below for the quantization contract)."""
    return f"""{out} AS (
  SELECT e2.dst AS node,
         FLOOR((0.15 / n.nn + 0.85 * (CAST(SUM(
             CAST(FLOOR({prev}.r * e2.frac * 1e15) AS BIGINT)
         ) AS DOUBLE) / 1e15)) * 1e12) / 1e12 AS r
  FROM e2
  JOIN {prev} ON e2.src = {prev}.node
  CROSS JOIN n
  GROUP BY e2.dst, n.nn
)"""


_PAGERANK_ORACLE = f"""
{_COPURCHASE_EDGE_CTE},
deg AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
e2 AS (
  SELECT e.src, e.dst,
         CAST(e.w AS DOUBLE) / CAST(deg.outw AS DOUBLE) AS frac
  FROM e JOIN deg ON e.src = deg.src
),
n AS (SELECT COUNT(DISTINCT src) AS nn FROM e),
r0 AS (SELECT src AS node, 1.0 / nn AS r FROM deg CROSS JOIN n),
{_pr_iter_sql('r0', 'r1')},
{_pr_iter_sql('r1', 'r2')},
{_pr_iter_sql('r2', 'r3')}
SELECT node, r AS rank FROM r3
"""


@register("graph_pagerank_copurchase", oracle=_PAGERANK_ORACLE)
def graph_pagerank_copurchase(
    spark: SparkSession, sf_dir: str, iters: int = 3
) -> DataFrame:
    """PageRank (damping 0.85, 3 power iterations) over the co-purchase
    part graph — the iterative-linear-algebra workload class (centrality,
    label propagation, embedding propagation) expressed as pure keyed
    DataFrame algebra: edges × ranks join, per-destination aggregation,
    repeat. Co-purchase edges are symmetric, so no dangling-node mass
    loss and the in/out node sets coincide.

    Scale design: the degree fraction w/outdeg folds into the cached
    edge list ONCE, so each iteration is exactly one keyed join of the
    transition matrix with the rank vector plus one map-side-combined
    aggregation on dst. Edge fan-out is per-basket-bounded (the
    market-basket property). The only driver state is the 1-row node
    count (bounded model state, the k-means/PQ doctrine), which turns
    the rank update into pure column algebra — no per-iteration
    broadcast. Cross-engine parity contract: each edge contribution
    r·frac is computed in double and FLOOR-quantized to an int64 of
    1e-15 units before the sum (integer sum = exact and
    order-independent; floor has no round-half tie, which made a
    ROUND/decimal-cast version diverge by 1 ulp on one node), and each
    new rank floor-quantizes to 12 dp — so every iteration's input is
    bit-identical in both engines and float drift cannot compound.
    Overflow-safe: a node's incoming quantized mass is ≤ 1e15 ≪ 2^53,
    so even the double cast of the sum is exact.

    Fixed iteration count = bounded plan depth (the
    dedup_connected_components loud-budget doctrine); convergence-driven
    stopping would go in a driver loop over materialized checkpoints."""
    e = _copurchase_edges(spark, sf_dir)
    deg = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # transition matrix, cached + eagerly materialized: it feeds every
    # iteration plus the node count and r0 — uncached, the lineitem
    # self-join subtree re-executes once per consumer in the unrolled
    # plan (measured 48 s → ~3 s at sf0.01). Stays cached for the
    # lazily-returned plan (the clustering.py precedent); bounded by
    # the co-occurrence pair set.
    e2 = (
        e.join(deg, "src")
        .select(
            "src",
            "dst",
            (
                F.col("w").cast("double") / F.col("outw").cast("double")
            ).alias("frac"),
        )
        .cache()
    )
    nn = e2.select("src").distinct().count()  # 1 scalar; fills the cache
    r = e2.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0 / nn).alias("r")
    )
    # The rank vector is node-set-sized. Size-gate ONCE from the rank
    # frame itself (e2 is cached AND materialized by the count above, so
    # the estimate derives from real in-memory stats): per-iteration
    # gating on the unrolled chain is useless because Catalyst's
    # estimate multiplies upward through each join/agg layer (measured
    # 2e8 -> 1.7e16 bytes by iteration 2 on the HITS twin). Under the
    # gate every iteration's edge⋈rank join broadcasts the rank vector
    # and STREAMS the cached transition matrix — no per-iteration
    # shuffle+sort of the edge frame (guide §3.1). Over the gate
    # (cluster scale: the node set grows with the corpus) the plain
    # shuffle join ships unchanged.
    bcast_ranks = plan_size_bytes(r) <= BROADCAST_GATE_BYTES
    for _ in range(iters):
        if bcast_ranks:
            r = F.broadcast(r)
        r = (
            e2.join(r, e2.src == r.node)
            .select(
                "dst",
                F.floor(F.col("r") * F.col("frac") * F.lit(1e15))
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.floor(
                        (
                            F.lit(0.15 / nn)
                            + 0.85
                            * (F.col("s").cast("double") / F.lit(1e15))
                        )
                        * F.lit(1e12)
                    )
                    / F.lit(1e12)
                ).alias("r"),
            )
            # node-set-sized materialization barrier per iteration (the
            # CC-machinery doctrine): truncates the unrolled lineage so
            # planning stays shallow and each iteration's broadcast
            # reads a materialized rank vector instead of replaying the
            # previous iterations' chain (r15).
            .localCheckpoint()
        )
    return r.select("node", F.col("r").alias("rank"))


# ---------------------------------------------------------------------------
# graph_triangle_count — degree-oriented triangle counting (cohesion metric)
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM e e1
        JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
        JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y) AS n_triangles
"""


@register("graph_triangle_count", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase part graph (support ≥ 2 edges)
    — the graph-cohesion primitive behind clustering coefficients and
    community pre-screens, and the canonical "joins explode if you're
    naive" workload.

    Scale design — degree-ordered orientation (the MPS/Cohen algorithm):
    every undirected edge directs from its lower-(degree, id) endpoint
    to the higher one, so a node's OUT-degree is bounded by O(sqrt(|E|))
    on any graph (a high-degree hub keeps almost no out-edges — its
    neighbors rank below it). Wedges then enumerate only out×out pairs
    per pivot (sum of out-deg² ≤ O(|E|^1.5) total, vs out-deg² on raw
    degrees where one celebrity node alone is quadratic), and each
    triangle materializes EXACTLY once (its unique 2-out-edge pivot),
    closing with one hash semi-join against the oriented edge list. The
    oracle brute-forces the canonical x<y<z triple join, value-checking
    that orientation loses and duplicates nothing. All keyed shuffles;
    the (deg, id) order key packs into one long so the orientation join
    carries 8 bytes per endpoint."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .count()
        .where(F.col("count") >= 2)
        .select("x", "y")
    )
    # Staged to tmp parquet, not .cache(): edges feed FOUR consumers
    # (degrees, the orientation join, the closing-edge semi-join, the
    # edge count); a cache would leak across shared sweep sessions (the
    # registry's lazy return has no unpersist hook — round-4 doctrine,
    # same shape as sim_sparse_cosine_tfidf's staged postings).
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("tri_edges", sf_dir)
    edges.write.mode("overwrite").parquet(stage)
    edges = spark.read.parquet(stage)
    deg = (
        edges.select(F.col("x").alias("node"))
        .unionAll(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        # (deg, id) packed into one long: a total order, join-cheap
        .select(
            "node",
            (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("ord"),
        )
    )
    ordered = (
        edges.join(deg.withColumnRenamed("node", "x"), "x")
        .withColumnRenamed("ord", "ord_x")
        .join(
            deg.withColumnRenamed("node", "y").withColumnRenamed(
                "ord", "ord_y"
            ),
            "y",
        )
    )
    # orient: src = lower (deg, id), dst = higher; carry dst's order key
    fwd = ordered.select(
        F.when(F.col("ord_x") < F.col("ord_y"), F.col("x"))
        .otherwise(F.col("y"))
        .alias("src"),
        F.when(F.col("ord_x") < F.col("ord_y"), F.col("y"))
        .otherwise(F.col("x"))
        .alias("dst"),
        F.greatest("ord_x", "ord_y").alias("ord_dst"),
    )
    w1, w2 = fwd.alias("w1"), fwd.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.ord_dst") < F.col("w2.ord_dst")),
    ).select(F.col("w1.dst").alias("v"), F.col("w2.dst").alias("w"))
    closing = fwd.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    n_edge = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # two 1-row aggregates
    return n_edge.crossJoin(n_tri).select("n_edges", "n_triangles")


# ---------------------------------------------------------------------------
# lineitem_association_rules — confidence / lift over co-purchase pairs
# ---------------------------------------------------------------------------

_ASSOC_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS nb FROM li),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM li GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, CAST(COUNT(*) AS BIGINT) AS sxy
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
),
rules AS (
  SELECT p.x AS antecedent, p.y AS consequent, p.sxy AS support_n,
         FLOOR(CAST(p.sxy AS DOUBLE) / ix.s * 1e6) / 1e6 AS confidence,
         FLOOR(CAST(p.sxy AS DOUBLE) * nb / (ix.s * iy.s) * 1e6) / 1e6
             AS lift
  FROM pair p
  JOIN item ix ON ix.l_partkey = p.x
  JOIN item iy ON iy.l_partkey = p.y
  CROSS JOIN n
  WHERE p.sxy >= 2
)
SELECT antecedent, consequent, support_n, confidence, lift, rn FROM (
  SELECT *, ROW_NUMBER() OVER (
      ORDER BY lift DESC, antecedent, consequent) AS rn
  FROM rules
) WHERE rn <= 20
"""


@register("lineitem_association_rules", oracle=_ASSOC_ORACLE)
def lineitem_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchase pairs: for each DIRECTED rule
    A→B with pair support ≥ 2, confidence = P(B|A) and lift =
    P(A,B)/(P(A)·P(B)) — the recommender/affinity metrics one step past
    lineitem_market_basket's raw co-occurrence counts (support alone
    ranks popular-with-everything pairs; lift corrects for the base
    rates).

    Scale design: the pair table is the ORDER-KEYED self-join (bounded
    per-basket |items|² fan-out, the market-basket property); item
    supports and the basket count are one keyed agg + a 1-row aggregate,
    joined back onto the DIMENSION-sized pair/item tables — corpus-sized
    data is touched exactly twice (distinct pass, pair pass). Ratios
    floor-quantize at 1e-6 (identical division operands both engines —
    the floor stops print-boundary ulps), and the top-20 ranks on the
    quantized lift with full key tie-breaks."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(
        F.count_distinct("l_orderkey").cast("double").alias("nb")
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("x"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("y"))
    pair = (
        a.join(b, "l_orderkey")
        .where(F.col("x") != F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("sxy"))
        .where(F.col("sxy") >= 2)
    )
    ix = item.withColumnRenamed("l_partkey", "x").withColumnRenamed(
        "s", "sx"
    )
    iy = item.withColumnRenamed("l_partkey", "y").withColumnRenamed(
        "s", "sy"
    )
    rules = (
        pair.join(ix, "x")
        .join(iy, "y")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("x").alias("antecedent"),
            F.col("y").alias("consequent"),
            F.col("sxy").alias("support_n"),
            (
                F.floor(
                    F.col("sxy").cast("double") / F.col("sx") * 1e6
                )
                / 1e6
            ).alias("confidence"),
            (
                F.floor(
                    F.col("sxy").cast("double")
                    * F.col("nb")
                    / (F.col("sx") * F.col("sy"))
                    * 1e6
                )
                / 1e6
            ).alias("lift"),
        )
    )
    # top-20 via TakeOrderedAndProject (per-partition heaps, never a
    # global window over the pair table); the rank label attaches AFTER
    # the cut, over 20 metadata rows on a meta_part spec — the
    # two-pass-window doctrine, so no single-reducer pass and no
    # "No Partition Defined" warning
    top = rules.orderBy(
        F.col("lift").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(20)
    w = Window.partitionBy(meta_part("antecedent")).orderBy(
        F.col("lift").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    )
    return top.withColumn("rn", F.row_number().over(w))


# ---------------------------------------------------------------------------
# join_runtime_bloom_filter — runtime row-level filter pruning
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = """
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 450000
"""


@register("join_runtime_bloom_filter", oracle=_BLOOM_ORACLE)
def join_runtime_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: when a selective dimension
    side feeds a SHUFFLE join, Catalyst builds a bloom filter over the
    build-side keys and injects `might_contain(...)` into the PROBE
    side's scan — fact rows that cannot match drop before the shuffle,
    the row-level sibling of dynamic partition pruning and the single
    biggest IO lever on selective fact-dim joins at 100 TB (the probe
    side here is the 4/7-of-lineitem that survives; at cluster scale
    it's the 0.1% that matches a filtered dimension).

    The optimizer rule only fires at physical planning, so the session
    confs enabling it must be live at EXECUTION: the join materializes
    to tmp parquet inside this builder (the staged-write doctrine) and
    every touched conf restores in `finally` — a shared sweep session
    never sees the disabled broadcast threshold (broadcast joins take
    the DPP path instead of bloom, so the demo forces the shuffle
    join). tests/test_plans.py asserts might_contain reaches the probe
    scan under these confs."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("bloomjoin", sf_dir)
    try:
        o = table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 450000
        )
        li = table(spark, sf_dir, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice"
        )
        j.write.mode("overwrite").parquet(stage)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(stage)


# ---------------------------------------------------------------------------
# graph_degree_distribution — co-purchase graph degree histogram
# ---------------------------------------------------------------------------

_DEGDIST_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT pa AS node, pb FROM e
    UNION ALL SELECT pb AS node, pa FROM e
  ) GROUP BY node
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


@register("graph_degree_distribution", oracle=_DEGDIST_ORACLE)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph — the first
    diagnostic of any graph workload (is it power-law? where's the
    hub tail that will skew every per-node shuffle?), and the input
    that justifies the degree-ordered orientation the triangle key
    uses.

    Scale design: edges come from the basket-bounded self-join
    (per-order pair fan-out, the market-basket shape — never an
    all-parts cross join), deduped once; degrees are one node-keyed
    count over both edge directions; the histogram collapses
    degree-keyed — three shuffles total, each on keys whose
    cardinality shrinks by orders of magnitude per step."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .distinct()
    )
    # One edge computation: both union branches of deg otherwise replay
    # the pair self-join + distinct (4 lineitem scans in the before-plan
    # — the graph_adamic_adar finding). The cached frame is the
    # graph-dimension edge list.
    from trireme_spark.operators.hints import cache_once

    e = cache_once(e)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


# ---------------------------------------------------------------------------
# join_asof_tolerance — as-of with a max-staleness bound
# ---------------------------------------------------------------------------

_TOL_US = 30 * 60 * 10**6  # 30 minutes

_ASOF_TOL_ORACLE = f"""
WITH clicks AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), c AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
         c.ts AS m_ts, c.value AS m_value
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, purchase_ts,
       CASE WHEN epoch_us(purchase_ts) - epoch_us(m_ts) <= {_TOL_US}
            THEN m_ts END AS asof_ts,
       CASE WHEN epoch_us(purchase_ts) - epoch_us(m_ts) <= {_TOL_US}
            THEN m_value END AS asof_value
FROM m
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j7c — as-of join with a TOLERANCE bound (pandas merge_asof's
    ``tolerance``): the latest click at or before each purchase counts
    only if it is ≤ 30 min stale, else the enrichment is NULL — the
    freshness contract of feature serving (a feature computed hours
    ago must NOT silently leak into a prediction row that demands
    recency; NULL forces the imputation path instead).

    Implementation: the stock union-window as-of operator, then ONE
    codegen'd staleness predicate nulls both carried columns together
    (match atomicity — value without its timestamp would be
    uninterpretable). Same single keyed shuffle and O(1) window state
    as j7; the bound costs zero extra passes. Exact integer-µs
    staleness both engines (the epoch_us bridge)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value", "event_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        right_tie_col="event_id",
    )
    fresh = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        <= _TOL_US
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("asof_ts")).alias("asof_ts"),
        F.when(fresh, F.col("asof_value")).alias("asof_value"),
    )


# ---------------------------------------------------------------------------
# graph_jaccard_links — neighbor-Jaccard link prediction on the copurchase graph
# ---------------------------------------------------------------------------

_JACCARD_LINKS_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
adj AS (
  SELECT x AS node, y AS nbr FROM e
  UNION ALL
  SELECT y AS node, x AS nbr FROM e
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
wedge AS (
  SELECT a.nbr AS x, b.nbr AS z, COUNT(*) AS common
  FROM adj a JOIN adj b
    ON a.node = b.node AND a.nbr < b.nbr
  GROUP BY 1, 2
),
nonedge AS (
  SELECT w.x, w.z, w.common FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.x = w.x AND e.y = w.z)
)
SELECT n.x AS part_a, n.z AS part_b, n.common AS common_neighbors,
       ROUND(n.common /
             CAST(dx.d + dz.d - n.common AS DOUBLE), 6) AS jaccard
FROM nonedge n
JOIN deg dx ON dx.node = n.x
JOIN deg dz ON dz.node = n.z
ORDER BY jaccard DESC, part_a ASC, part_b ASC
LIMIT 20
"""


@register("graph_jaccard_links", oracle=_JACCARD_LINKS_ORACLE)
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor Jaccard on the copurchase graph
    (same edge rule as graph_triangle_count: parts co-bought in >= 2
    orders): for part pairs NOT yet linked, score
    |N(x) ∩ N(z)| / |N(x) ∪ N(z)| and emit the top 20 — the
    "customers who buy these also buy..." candidate generator, and the
    classic common-neighbors baseline every link-prediction system is
    measured against.

    Scale design: common neighbors come from the WEDGE join (adjacency
    joined to itself on the MIDDLE node — keyed shuffle, Σdeg² work,
    the triangle-count shape; hub-capping is the documented lever for
    power-law degree tails), never from pairwise set intersection;
    union sizes are degree arithmetic (|A∪B| = dx + dz − common), so
    neighbor SETS are never materialized per pair; existing edges
    leave via a keyed anti-join; top-20 folds into
    TakeOrderedAndProject."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("x", "y")
    )
    # One edge computation: e feeds both adj branches (each consumed
    # twice by the wedge self-join), the anti-join, and via deg the
    # dx/dz legs — uncached, every consumer replays the co-purchase
    # self-join (the graph_adamic_adar finding; same skeleton). The
    # cached frame is the graph-dimension edge list.
    from trireme_spark.operators.hints import cache_once

    e = cache_once(e)
    adj = e.select(F.col("x").alias("node"), F.col("y").alias("nbr")).unionByName(
        e.select(F.col("y").alias("node"), F.col("x").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    wedge = (
        adj.alias("wa")
        .join(
            adj.alias("wb"),
            (F.col("wa.node") == F.col("wb.node"))
            & (F.col("wa.nbr") < F.col("wb.nbr")),
        )
        .groupBy(
            F.col("wa.nbr").alias("x"), F.col("wb.nbr").alias("z")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonedge = wedge.join(
        e,
        (wedge["x"] == e["x"]) & (wedge["z"] == e["y"]),
        "left_anti",
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dz = deg.select(F.col("node").alias("z"), F.col("d").alias("dz"))
    return (
        nonedge.join(dx, "x")
        .join(dz, "z")
        .select(
            F.col("x").alias("part_a"),
            F.col("z").alias("part_b"),
            F.col("common").alias("common_neighbors"),
            F.round(
                F.col("common")
                / (F.col("dx") + F.col("dz") - F.col("common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "part_a", "part_b")
        .limit(20)
    )


@register("graph_kcore")  # rows-only: iterative peeling has no SQL form
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the copurchase graph (same edge rule as
    graph_triangle_count): the maximal subgraph where every part
    co-occurs with >= 3 other core parts — the cohesion nucleus used to
    seed communities and filter incidental co-purchases. Rows-only by
    design (iterate-to-fixpoint with per-round aggregation is outside
    SQL's recursive-CTE restrictions); exactness is pytest-gated on a
    constructed graph with a known 3-core plus fixpoint/min-degree
    invariants on the fixture output (tests/test_quality.py).

    Scale design: operators/graph.py::kcore — keyed degree aggs +
    semi-join peeling waves, localCheckpoint-truncated lineage, loud
    round budget."""
    from trireme_spark.operators.graph import kcore

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a2 = li.alias("a")
    b2 = li.alias("b")
    e = (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("src", "dst")
    )
    return kcore(e, k=3).orderBy("node")


# ---------------------------------------------------------------------------
# graph_modularity_score — partition quality of copurchase components
# ---------------------------------------------------------------------------

_MODULARITY_ORACLE = """
WITH RECURSIVE
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
nodes AS (SELECT DISTINCT x AS v FROM e UNION SELECT DISTINCT y FROM e),
sym AS (SELECT x AS src, y AS dst FROM e UNION ALL SELECT y, x FROM e),
reach(v, c) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT sym.dst, r.c FROM reach r JOIN sym ON sym.src = r.v
),
lab AS (SELECT v, MIN(c) AS comp FROM reach GROUP BY v),
m AS (SELECT COUNT(*) AS m FROM e),
deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
comp_stats AS (
  SELECT la.comp,
         CAST(SUM(deg.d) AS DOUBLE) AS d_c
  FROM lab la JOIN deg ON deg.v = la.v
  GROUP BY la.comp
),
intra AS (
  SELECT la.comp, COUNT(*) AS e_c
  FROM e JOIN lab la ON la.v = e.x
  JOIN lab lb ON lb.v = e.y AND lb.comp = la.comp
  GROUP BY la.comp
),
terms AS (
  SELECT cs.comp,
         CAST(COALESCE(i.e_c, 0) AS DOUBLE) / m.m
         - (cs.d_c / (2 * m.m)) * (cs.d_c / (2 * m.m)) AS q_c
  FROM comp_stats cs LEFT JOIN intra i ON i.comp = cs.comp
  CROSS JOIN m
)
SELECT CAST((SELECT COUNT(*) FROM terms) AS BIGINT) AS n_components,
       CAST((SELECT m FROM m) AS BIGINT) AS n_edges,
       ROUND(SUM(q_c), 6) AS modularity
FROM terms
"""


@register("graph_modularity_score", oracle=_MODULARITY_ORACLE)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODULARITY Q of the copurchase graph partitioned by its connected
    components — Q = Σ_c [e_c/m − (d_c/2m)²], the partition-quality
    score every community-detection method optimizes; computed here for
    the CC partition, it reports how much intra-component edge mass
    exceeds the degree-preserving random expectation (Q ≈ 0 for one
    giant component, rising as the graph genuinely fragments). The
    evaluation half of the graph family: CC/k-core FIND structure, this
    key SCORES it.

    Scale design: edges/degrees/labels are the established keyed
    shapes (distributed CC from operators/graph.py); e_c and d_c are
    two keyed aggs over component labels; Q is an exact-integer
    expression per component, decimal-free because every term divides
    by the same m (one double expression, ROUND(6) on the total —
    components are dimension-scale)."""
    from trireme_spark.operators.graph import connected_components

    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a2, b2 = li.alias("a"), li.alias("b")
    e = (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("x", "y")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("x").alias("v"))
        .unionByName(e.select(F.col("y").alias("v")))
        .distinct()
    )
    lab = connected_components(
        nodes, e, id_col="v", src_col="x", dst_col="y"
    )
    m = e.count()
    sym = e.select(F.col("x").alias("v")).unionByName(
        e.select(F.col("y").alias("v"))
    )
    deg = sym.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    comp_stats = (
        lab.join(deg, "v")
        .groupBy("component")
        .agg(F.sum("d").cast("double").alias("d_c"))
    )
    la = lab.select(F.col("v").alias("x"), F.col("component").alias("ca"))
    lb = lab.select(F.col("v").alias("y"), F.col("component").alias("cb"))
    intra = (
        e.join(la, "x")
        .join(lb, "y")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("component"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    terms = comp_stats.join(intra, "component", "left").select(
        "component",
        (
            F.coalesce("e_c", F.lit(0)).cast("double") / m
            - (F.col("d_c") / (2 * m)) * (F.col("d_c") / (2 * m))
        ).alias("q_c"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.lit(m).cast("long").alias("n_edges"),
        F.round(F.sum("q_c"), 6).alias("modularity"),
    ).select("n_components", "n_edges", "modularity")


# ---------------------------------------------------------------------------
# graph_degree_assortativity — degree-degree correlation over edges
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
sym AS (SELECT x AS src, y AS dst FROM e UNION ALL SELECT y, x FROM e),
deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src),
ends AS (
  SELECT dx.d AS di, dy.d AS dj
  FROM sym JOIN deg dx ON dx.v = sym.src JOIN deg dy ON dy.v = sym.dst
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS m2,
         CAST(SUM(di) AS DOUBLE) AS s1,
         CAST(SUM(di * dj) AS DOUBLE) AS sij,
         CAST(SUM(di * di) AS DOUBLE) AS s2
  FROM ends
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       ROUND((sij / m2 - (s1 / m2) * (s1 / m2))
             / (s2 / m2 - (s1 / m2) * (s1 / m2)), 6) AS assortativity
FROM s
"""


@register("graph_degree_assortativity", oracle=_ASSORT_ORACLE)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree ASSORTATIVITY of the copurchase graph — the Pearson
    correlation of degrees across edge endpoints (Newman 2002):
    positive = hubs link to hubs (social-style), negative = hubs link
    to leaves (technological/retail-style) — the one-number structure
    diagnosis that decides whether hub-capping (the wedge-join lever)
    will bite. Computed over the symmetrized edge list so the
    correlation is exchange-symmetric; all moment sums are exact
    integers into one double expression.

    Scale design: degrees are one keyed count; the endpoint-degree
    table is two keyed joins of the edge list against it; moments are
    a single rollup — nothing quadratic, no windows."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a2, b2 = li.alias("a"), li.alias("b")
    e = (
        a2.join(
            b2,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("x", "y")
        .localCheckpoint(eager=True)
    )
    sym = e.select(
        F.col("x").alias("src"), F.col("y").alias("dst")
    ).unionByName(e.select(F.col("y").alias("src"), F.col("x").alias("dst")))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("src"), F.col("d").alias("di"))
    dy = deg.select(F.col("src").alias("dst"), F.col("d").alias("dj"))
    ends = sym.join(dx, "src").join(dy, "dst")
    s = ends.agg(
        F.count(F.lit(1)).cast("double").alias("m2"),
        F.sum("di").cast("double").alias("s1"),
        F.sum(F.col("di") * F.col("dj")).cast("double").alias("sij"),
        F.sum(F.col("di") * F.col("di")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("m2")
    return s.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.round(
            (F.col("sij") / F.col("m2") - mean * mean)
            / (F.col("s2") / F.col("m2") - mean * mean),
            6,
        ).alias("assortativity"),
    )


# --- graph_label_propagation (staged r10, REGISTERED r11) ------------------
# Same staging history as fn_json_variant (functions_scalar.py): built +
# oracle-verified under the registration pause, decorator flipped in r11.
# Fills the community-DETECTION gap in the graph family (modularity_score
# only SCORES a given partition; this produces one).

def _lpa_iter_sql(prev: str, out: str) -> str:
    """One unrolled synchronous LPA iteration as a DuckDB CTE body."""
    return f"""cnt_{out} AS (
  SELECT e.dst AS node, {prev}.lab, SUM(e.w) AS wsum
  FROM e JOIN {prev} ON e.src = {prev}.node
  GROUP BY 1, 2
), {out} AS (
  SELECT node, lab
  FROM (
    SELECT node, lab,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY wsum DESC, lab ASC) AS rn
    FROM cnt_{out}
  )
  WHERE rn = 1
)"""


_LPA_ORACLE = f"""
{_COPURCHASE_EDGE_CTE},
l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
{_lpa_iter_sql('l0', 'l1')},
{_lpa_iter_sql('l1', 'l2')}
SELECT l2.node, l2.lab AS label,
       CAST(COUNT(*) OVER (PARTITION BY l2.lab) AS BIGINT) AS comm_size
FROM l2
"""


@register("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(
    spark: SparkSession, sf_dir: str, iters: int = 2
) -> DataFrame:
    """graph_label_propagation — synchronous LPA communities.

    Two synchronized label-propagation iterations over the co-purchase
    part graph (same edge rule as graph_pagerank_copurchase): every
    node's next label is its neighbors' edge-weight-majority label, ties
    broken by MIN label — fully deterministic, and every quantity is an
    INTEGER (labels are node ids, votes are co-occurrence counts), so
    there is no float-parity surface at all, unlike pagerank's quantized
    doubles.

    Scale design: the weighted edge list is built once and cached (it
    feeds both iterations); each iteration is one keyed join on src, one
    map-side-combined (dst, lab) count aggregation, and one PARTITIONED
    top-1 window on dst — never a global window, never driver state.
    Symmetric edges mean in/out node sets coincide, so no node loses its
    label for lack of in-edges. Fixed iteration count = bounded plan
    depth (the pagerank/connected-components doctrine); convergence-
    driven stopping belongs in a driver loop over checkpoints. Final
    community size attaches with one more partitioned window.

    Cache lifetime (r10 ADVICE): the edge cache is deliberately NOT
    unpersisted — the returned DataFrame is lazy and still reads it; one
    edge-sized InMemoryRelation persists per invocation for the session
    lifetime (fine for one-shot sweeps; long sessions reclaim via
    ``spark.catalog.clearCache()``, as the test harness does).
    """
    e = _copurchase_edges(spark, sf_dir).cache()
    lab = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    bcast_labs = plan_size_bytes(lab) <= BROADCAST_GATE_BYTES
    for _ in range(iters):
        # alias()-based join (r10 ADVICE): from iteration 2 on, lab is
        # derived from e, and the lineage-attribute form
        # (e.join(lab, e.src == lab.node)) leans on Spark's ambiguous-
        # self-join disambiguation — explicit aliases make the
        # resolution robust under stricter analyzer settings.
        #
        # r15 (guide §3.1/§2.4): the label table is node-set-sized —
        # size-gated broadcast (decided once from the INITIAL label
        # frame, whose estimate is file-scan-derived and linear in the
        # corpus; the unrolled chains' estimates inflate multiplicatively
        # and would always decline) streams the cached edge frame
        # through a BroadcastHashJoin instead of shuffling+sorting it
        # every iteration; and the top-1-per-node ROW_NUMBER window
        # (full sort of the (node,lab) vote table) becomes a
        # MIN(STRUCT(-wsum, lab)) hash aggregate — identical selection
        # (highest wsum, ties to the smallest lab; struct comparison is
        # lexicographic and every field is an exact integer), no sort
        # anywhere.
        lab = (
            e.alias("e")
            .join(
                F.broadcast(lab.alias("l")) if bcast_labs
                else lab.alias("l"),
                F.col("e.src") == F.col("l.node"),
            )
            .groupBy(F.col("e.dst").alias("node"), F.col("l.lab").alias("lab"))
            .agg(F.sum("e.w").alias("wsum"))
            .groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        F.negative(F.col("wsum")).alias("nw"),
                        F.col("lab").alias("lab"),
                    )
                ).alias("m")
            )
            .select("node", F.col("m.lab").alias("lab"))
            # node-set-sized materialization barrier per iteration (the
            # CC-machinery doctrine): truncates the unrolled lineage so
            # the next iteration's broadcast does not re-execute this
            # one's pipeline and the final action's planning stays
            # shallow (r15; measured 2.9 s driver-side planning gap +
            # broadcast replays without it).
            .localCheckpoint()
        )
    return lab.select(
        "node",
        F.col("lab").alias("label"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lab"))
        .cast("long")
        .alias("comm_size"),
    )


# --- join_existence_mark (registered r11; r12 grading window) ---------------
# First key of the post-428 cadence (SURVEY round-11 log): registered the
# round it is built, graded next round after the r12 rotation-then-insert.

_MARK_ORACLE = """
SELECT c.c_custkey,
       c.c_mktsegment,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey) AS has_order,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT') AS has_urgent
FROM customer c
"""


@register("join_existence_mark", oracle=_MARK_ORACLE)
def join_existence_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark join — EXISTS as a kept BOOLEAN column, not a filter.

    ``join_semi_anti`` (j4) covers EXISTS as row selection; this key
    covers the other half of the surface: correlated EXISTS in the
    SELECT list ("mark join" in DuckDB's planner), where every probe row
    survives and the existence test becomes data. Two marks with
    different predicates ride ONE build-side pass.

    Scale design: the naive form is two correlated subqueries = two
    joins over orders. Instead orders collapses FIRST to one bit-pair
    per custkey (map-side-combined boolean aggregate: any order / any
    urgent order — ``max`` over booleans), then ONE left equi-join
    attaches both marks; ``coalesce(false)`` fills never-ordered
    customers. One shuffle for the agg, one for the join, no row
    explosion beyond |customer|, and adding a third mark is another
    aggregate column, not another join.
    """
    c = table(spark, sf_dir, "customer")
    marks = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey"))
        .agg(
            F.max(F.lit(True)).alias("m_any"),
            F.max(F.col("o_orderpriority") == "1-URGENT").alias("m_urgent"),
        )
    )
    return c.join(marks, c.c_custkey == marks.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("m_any"), F.lit(False)).alias("has_order"),
        F.coalesce(F.col("m_urgent"), F.lit(False)).alias("has_urgent"),
    )


# --- graph_two_hop_recs (registered r11; r13 grading window) -----------------
# Cadence-batch key 2 (SURVEY round-11 log). First multi-hop path operator
# in the graph family: "customers who bought X also bought Y" at distance
# two — the collaborative-filtering recommendation primitive (pagerank
# scores nodes globally, jaccard_links scores existing edges; this key
# SURFACES non-edges reachable through strong intermediates).

_TWO_HOP_ORACLE = f"""{_COPURCHASE_EDGE_CTE},
hop1 AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY w DESC, dst) AS rn
    FROM e
  ) WHERE rn <= 3
), paths AS (
  SELECT h1.src, h2.dst AS rec, LEAST(h1.w, h2.w) AS pw
  FROM hop1 h1 JOIN hop1 h2 ON h1.dst = h2.src
  WHERE h2.dst <> h1.src
), cand AS (
  SELECT p.src, p.rec,
         CAST(SUM(pw) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM paths p
  ANTI JOIN e ON p.src = e.src AND p.rec = e.dst
  GROUP BY 1, 2
)
SELECT src, rec, CAST(rn AS BIGINT) AS rec_rank, score, n_paths
FROM (
  SELECT src, rec, score, n_paths,
         ROW_NUMBER() OVER (PARTITION BY src
                            ORDER BY score DESC, rec) AS rn
  FROM cand
) WHERE rn <= 3
"""


@register("graph_two_hop_recs", oracle=_TWO_HOP_ORACLE)
def graph_two_hop_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop co-purchase recommendations: for each part, the top-3
    parts reachable through its strongest neighbors but NOT directly
    co-purchased — path score = sum over 2-paths of the bottleneck
    weight min(w1, w2), the classic item-item CF walk.

    Scale design: fanout is BOUNDED BY CONSTRUCTION — each node keeps
    only its top-3 strongest out-edges (one edge-keyed window) before
    hopping, so the path set is <=9 candidates per node at any graph
    size, never degree^2; the direct-edge exclusion is a keyed ANTI
    join on (src, rec) against the edge table; both hops are keyed
    equi-joins on the intermediate node. No all-pairs stage anywhere —
    the same band/bucket doctrine as the dedup family, applied to
    graph walks.

    Cross-engine parity: weights are co-occurrence COUNTS, bottleneck
    is integer LEAST, scores are integer sums — zero float surface;
    both rank rules carry full tie-breaks ((w DESC, dst) and
    (score DESC, rec)).

    Uses the shared _copurchase_edges rule (one edge definition across
    pagerank / LPA / this key).
    """
    from trireme_spark.operators.hints import cache_once

    e = _copurchase_edges(spark, sf_dir).cache()
    w1 = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    # hop1 is consumed by BOTH sides of the path self-join; uncached, the
    # top-3 window over the edge cache runs once per side (the build side
    # rides a BroadcastExchange, which plan reuse cannot dedupe). Bounded:
    # ≤3 rows per node by construction.
    hop1 = cache_once(
        e.select("src", "dst", "w", F.row_number().over(w1).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )
    h1 = hop1.select(
        F.col("src").alias("s"), F.col("dst").alias("m"), F.col("w").alias("w1")
    )
    h2 = hop1.select(
        F.col("src").alias("m"), F.col("dst").alias("rec"), F.col("w").alias("w2")
    )
    paths = (
        h1.join(h2, "m")
        .where(F.col("rec") != F.col("s"))
        .select(
            F.col("s").alias("src"),
            "rec",
            F.least(F.col("w1"), F.col("w2")).alias("pw"),
        )
    )
    cand = (
        paths.join(
            e.select(F.col("src"), F.col("dst").alias("rec")),
            ["src", "rec"],
            "left_anti",
        )
        .groupBy("src", "rec")
        .agg(
            F.sum("pw").cast("long").alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_paths"),
        )
    )
    w2 = Window.partitionBy("src").orderBy(F.col("score").desc(), F.col("rec"))
    return (
        cand.select(
            "src", "rec", F.row_number().over(w2).alias("rn"), "score",
            "n_paths",
        )
        .where(F.col("rn") <= 3)
        .select(
            "src",
            "rec",
            F.col("rn").cast("long").alias("rec_rank"),
            "score",
            "n_paths",
        )
    )


# ---------------------------------------------------------------------------
# graph_adamic_adar — staged r11, REGISTERED r12 (cadence batch;
# SURVEY round-11 log). Adamic-Adar link prediction on the copurchase
# graph: the frequency-weighted refinement of graph_jaccard_links' common-
# neighbor count — a shared RARE neighbor is worth more than a shared hub
# (Adamic & Adar 2003), which is why AA beats Jaccard on power-law graphs.
# Flipped at the start of r12: decorator + _SWEEP_PRIORITY slot added
# per the written recipe (SURVEY round-12 log).
# ---------------------------------------------------------------------------

_ADAMIC_ADAR_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
adj AS (
  SELECT x AS node, y AS nbr FROM e
  UNION ALL
  SELECT y AS node, x AS nbr FROM e
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
adjd AS (
  -- d = 1 nodes cannot be a wedge MIDDLE (a wedge needs two adjacency
  -- rows on the same node), so dropping them is semantics-free and
  -- keeps 1/ln(d) off the ln(1) = 0 pole (ANSI divide-by-zero).
  SELECT adj.node, adj.nbr,
         CAST(FLOOR(1e6 / ln(CAST(deg.d AS DOUBLE))) AS BIGINT) AS inv_micro
  FROM adj JOIN deg ON adj.node = deg.node
  WHERE deg.d >= 2
),
wedge AS (
  SELECT a.nbr AS x, b.nbr AS z,
         CAST(COUNT(*) AS BIGINT) AS common,
         CAST(SUM(a.inv_micro) AS BIGINT) AS aa_micro
  FROM adjd a JOIN adjd b
    ON a.node = b.node AND a.nbr < b.nbr
  GROUP BY 1, 2
),
nonedge AS (
  SELECT w.x, w.z, w.common, w.aa_micro FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.x = w.x AND e.y = w.z)
)
SELECT x AS part_a, z AS part_b, common AS common_neighbors,
       CAST(aa_micro AS DOUBLE) / 1e6 AS adamic_adar
FROM nonedge
ORDER BY aa_micro DESC, part_a ASC, part_b ASC
LIMIT 20
"""


@register("graph_adamic_adar", oracle=_ADAMIC_ADAR_ORACLE)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the copurchase graph (same edge
    rule as graph_jaccard_links / graph_triangle_count: parts co-bought
    in >= 2 orders): for part pairs NOT yet linked,
    AA(x,z) = Σ_{m ∈ N(x)∩N(z)} 1/ln(deg(m)) — each common neighbor
    contributes INVERSELY to how promiscuous it is, so two parts that
    share one niche companion outrank two that share one bestseller.
    Top 20 by score.

    Cross-engine exactness: deg is an integer count, 1/ln(d) runs on
    the same integer-derived double in both engines (the libm-agreement
    precedent of the logprob keys), each wedge term floor-quantizes to
    1e-6 units BEFORE the sum, and the per-pair score is an EXACT
    BIGINT sum — no float accumulation order anywhere; the top-20
    orders on the integer micro-score with the pair as total tie-break.

    Scale design: identical skeleton to graph_jaccard_links — the
    per-middle-node weight joins onto the adjacency list ONCE (keyed,
    dimension-of-the-graph sized), common neighbors come from the wedge
    join on the middle node (keyed shuffle, Σdeg² work, hub-capping the
    documented lever for power-law tails), existing edges leave via a
    keyed anti-join, and the top-20 folds into TakeOrderedAndProject.
    Neighbor SETS are never materialized per pair."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("x", "y")
    )
    # One edge computation, not ~9: e (the li-self-join + agg) feeds both
    # adj union branches, deg, adjd (used twice in the wedge self-join)
    # and the final anti-join; every reuse otherwise replays the whole
    # co-purchase join (18 lineitem scans in the uncached plan — the
    # broadcast sides defeat exchange reuse). The cached frame is the
    # edge list, dimension-of-the-graph sized per the scale design.
    from trireme_spark.operators.hints import cache_once

    e = cache_once(e)
    adj = e.select(
        F.col("x").alias("node"), F.col("y").alias("nbr")
    ).unionByName(e.select(F.col("y").alias("node"), F.col("x").alias("nbr")))
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    # d = 1 nodes cannot be a wedge middle (a wedge needs two adjacency
    # rows on the same node), so the filter is semantics-free and keeps
    # 1/ln(d) off the ln(1) = 0 pole (ANSI divide-by-zero at sf0.1).
    # Cached too: the wedge self-join consumes adjd on BOTH sides.
    adjd = cache_once(
        adj.join(deg, "node")
        .where(F.col("d") >= 2)
        .select(
            "node",
            "nbr",
            F.floor(F.lit(1e6) / F.log(F.col("d").cast("double")))
            .cast("long")
            .alias("inv_micro"),
        )
    )
    wedge = (
        adjd.alias("wa")
        .join(
            adjd.alias("wb"),
            (F.col("wa.node") == F.col("wb.node"))
            & (F.col("wa.nbr") < F.col("wb.nbr")),
        )
        .groupBy(F.col("wa.nbr").alias("x"), F.col("wb.nbr").alias("z"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.col("wa.inv_micro")).alias("aa_micro"),
        )
    )
    nonedge = wedge.join(
        e,
        (wedge["x"] == e["x"]) & (wedge["z"] == e["y"]),
        "left_anti",
    )
    return (
        nonedge.select(
            F.col("x").alias("part_a"),
            F.col("z").alias("part_b"),
            F.col("common").alias("common_neighbors"),
            (F.col("aa_micro").cast("double") / 1e6).alias("adamic_adar"),
            F.col("aa_micro").alias("_ord"),
        )
        .orderBy(F.col("_ord").desc(), "part_a", "part_b")
        .limit(20)
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# graph_bipartite_hits — STAGED for the r14 cadence (parked unregistered;
# SURVEY round-12 log). HITS (Kleinberg 1999) on the bipartite
# customer→part purchase graph, 3 unrolled iterations: authorities =
# parts bought by the best hub-customers, hubs = customers who buy the
# best authority-parts — the mutually-recursive centrality PageRank's
# single-score random walk cannot express, and the classic
# query-dependent ranking primitive. L1 normalization per half-step
# (a documented HITS variant — same fixed point direction as L2, and
# expressible as exact integer arithmetic cross-engine).
# ---------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_TOPK = 10


def _hits_oracle() -> str:
    """Generate the unrolled-iteration oracle with the same loop
    structure the Spark side uses (the PACF generated-chain
    discipline) — the iteration count and quantization points are
    shared constants, so the unrollings cannot drift apart."""
    parts = [
        "WITH e AS (\n"
        "  SELECT DISTINCT o_custkey AS c, l_partkey AS p\n"
        "  FROM orders JOIN lineitem ON o_orderkey = l_orderkey\n"
        "), h0 AS (\n"
        "  SELECT c, CAST(1000000000000 AS HUGEINT) AS s\n"
        "  FROM (SELECT DISTINCT c FROM e)\n"
        ")"
    ]
    prev_h = "h0"
    for i in range(1, _HITS_ITERS + 1):
        parts.append(
            f", a{i}r AS (\n"
            f"  SELECT p, SUM(s) AS s FROM e JOIN {prev_h} USING (c)"
            " GROUP BY p\n)"
            f", a{i} AS (\n"
            f"  SELECT p, CAST(FLOOR(CAST(s AS DOUBLE)\n"
            f"    / (SELECT CAST(SUM(s) AS DOUBLE) FROM a{i}r) * 1e12)\n"
            f"    AS HUGEINT) AS s FROM a{i}r\n)"
        )
        if i < _HITS_ITERS:
            parts.append(
                f", h{i}r AS (\n"
                f"  SELECT c, SUM(s) AS s FROM e JOIN a{i} USING (p)"
                " GROUP BY c\n)"
                f", h{i} AS (\n"
                f"  SELECT c, CAST(FLOOR(CAST(s AS DOUBLE)\n"
                f"    / (SELECT CAST(SUM(s) AS DOUBLE) FROM h{i}r)"
                " * 1e12)\n"
                f"    AS HUGEINT) AS s FROM h{i}r\n)"
            )
            prev_h = f"h{i}"
    parts.append(
        f"\nSELECT a.p AS partkey,\n"
        f"       CAST(a.s AS DOUBLE) / 1e12 AS authority,\n"
        f"       d.deg AS degree\n"
        f"FROM a{_HITS_ITERS} a\n"
        "JOIN (SELECT p, CAST(COUNT(*) AS BIGINT) AS deg FROM e"
        " GROUP BY p) d USING (p)\n"
        f"ORDER BY a.s DESC, a.p ASC LIMIT {_HITS_TOPK}"
    )
    return "".join(parts)


_HITS_ORACLE = _hits_oracle()


@register("graph_bipartite_hits", oracle=_HITS_ORACLE)
def graph_bipartite_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 authority parts after 3 HITS iterations on the distinct
    customer→part purchase graph (hub scores start uniform; each
    half-step sums the opposite side's scores over the edges and
    L1-normalizes). High-authority parts are the ones bought by
    broadly-buying customers — a demand-centrality signal degree alone
    (the `degree` column, printed for contrast) does not capture.

    Cross-engine exactness: the pagerank doctrine — every normalized
    score floor-quantizes to exact integer 1e-12 units PER ITERATION,
    so drift cannot compound; the unrolled oracle is GENERATED by the
    same Python loop that builds the Spark frames (the PACF
    generated-chain precedent), making engine drift in the unrolling
    impossible by construction.

    Scale design: per iteration ONE edge⋈score keyed join + ONE
    map-side-combinable keyed aggregation + a 1-row L1 normalizer
    broadcast — the pagerank plan shape with two alternating score
    tables; the edge table is built once (distinct prunes the
    lineitem fan-in). More iterations append half-steps, never widen
    shuffles. Top-k folds into TakeOrderedAndProject."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .cache()  # reused 2x per iteration; clearCache reclaims
    )
    # Score tables are node-set-sized: size-gate ONCE from the node set
    # (file-scan-derived estimate, linear in the corpus — the unrolled
    # chains' estimates inflate multiplicatively through each join/agg
    # and would always decline), then broadcast every half-step's score
    # side so the cached edge frame STREAMS through a BroadcastHashJoin
    # instead of shuffling+sorting twice per iteration (guide §3.1).
    # Over the gate the shuffle join ships.
    bcast_scores = (
        plan_size_bytes(e.select("c").distinct()) <= BROADCAST_GATE_BYTES
    )
    # Exact-arithmetic layout (r15, the dsum split-long doctrine): a
    # NORMALIZED score is floor(s/tot*1e12) ∈ [0, 1e12] and the scores
    # on one side sum to ≤ 1e12, so any per-group sum of normalized
    # scores over the distinct-pair edges is ≤ 1e12 — the edge-scale
    # aggregations run as compact LONG sums at ANY corpus size, never
    # a BigDecimal buffer. Only the 1-row L1 normalizer total (which
    # sums a whole side and can exceed a long once node counts reach
    # cluster scale) stays a decimal sum — over the node-set-sized raw
    # table, not the edge table. floor() already yields LONG.
    h = None  # normalized hub scores (long), None in iteration 1
    a = None
    for i in range(1, _HITS_ITERS + 1):
        # each raw score table is a materialization barrier per
        # half-step (localCheckpoint — the CC doctrine): WITHOUT it
        # every normalizer leg replays the entire prefix chain and the
        # plan re-executes ~2^iterations times (measured 46 s -> ~3 s
        # at sf0.01); vs .cache() it also truncates the logical plan,
        # removing a measured ~5 s driver-side planning stall.
        if h is None:
            # h0 is the CONSTANT 1e12 over exactly the distinct
            # customers of e, so e ⋈ h0 is the identity on e and
            # SUM(s) ≡ 1e12 * COUNT(*): no join, no per-row sum. The
            # one decimal multiply per group cannot overflow and keeps
            # the unbounded-degree first half-step exact at any scale.
            a_raw = (
                e.groupBy("p")
                .agg(
                    (
                        F.count(F.lit(1)).cast("decimal(38,0)")
                        * F.lit(10**12).cast("decimal(38,0)")
                    ).alias("s")
                )
                .localCheckpoint()
            )
        else:
            a_raw = (
                e.join(F.broadcast(h) if bcast_scores else h, "c")
                .groupBy("p")
                .agg(F.sum("s").alias("s"))
                .localCheckpoint()
            )
        tot_a = a_raw.agg(
            F.sum(F.col("s").cast("decimal(38,0)")).cast("double").alias("tot")
        )
        a = (
            a_raw.crossJoin(F.broadcast(tot_a))
            .select(
                "p",
                F.floor(F.col("s").cast("double") / F.col("tot") * 1e12)
                .alias("s"),
            )
        )
        if i < _HITS_ITERS:
            h_raw = (
                e.join(F.broadcast(a) if bcast_scores else a, "p")
                .groupBy("c")
                .agg(F.sum("s").alias("s"))
                .localCheckpoint()
            )
            tot_h = h_raw.agg(
                F.sum(F.col("s").cast("decimal(38,0)"))
                .cast("double")
                .alias("tot")
            )
            h = (
                h_raw.crossJoin(F.broadcast(tot_h))
                .select(
                    "c",
                    F.floor(
                        F.col("s").cast("double") / F.col("tot") * 1e12
                    ).alias("s"),
                )
            )
    deg = e.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return (
        a.join(deg, "p")
        .orderBy(F.col("s").desc(), F.col("p").asc())
        .limit(_HITS_TOPK)
        .select(
            F.col("p").alias("partkey"),
            (F.col("s").cast("double") / 1e12).alias("authority"),
            "deg",
        )
        .withColumnRenamed("deg", "degree")
    )


# ---------------------------------------------------------------------------
# graph_clustering_coefficient — STAGED for the r15 cadence (parked
# unregistered; SURVEY round-13 log). Global transitivity + mean local
# clustering coefficient over the co-purchase part graph: the
# triangle-count key answers "how many", this answers "how clumped" —
# the cohesion ratio community detection and bot-ring screens actually
# threshold on.
# ---------------------------------------------------------------------------

_CC_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
tri AS (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM e e1
  JOIN e e2 ON e2.x = e1.x AND e2.y > e1.y
  JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
),
tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t
  FROM (SELECT a AS node FROM tri UNION ALL
        SELECT b FROM tri UNION ALL SELECT c FROM tri)
  GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT x AS node FROM e UNION ALL SELECT y FROM e)
  GROUP BY node
),
loc AS (
  SELECT deg.node, deg.d, COALESCE(tn.t, 0) AS t,
         d * (d - 1) / 2 AS wedges
  FROM deg LEFT JOIN tn USING (node)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(COUNT(*) FILTER (WHERE d >= 2) AS BIGINT) AS n_deg_ge2,
         CAST(SUM(t) AS BIGINT) / 3 AS n_triangles,
         CAST(SUM(wedges) AS BIGINT) AS n_wedges,
         CAST(SUM(CAST(FLOOR(CASE WHEN d >= 2
                    THEN CAST(t AS DOUBLE) / wedges ELSE 0 END * 1e12)
                  AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sum_local
  FROM loc
)
SELECT n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       n_deg_ge2,
       FLOOR(3.0 * n_triangles / n_wedges * 1e6) / 1e6 AS transitivity,
       FLOOR(sum_local / n_deg_ge2 * 1e6) / 1e6 AS mean_local_cc
FROM s
"""


def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transitivity = 3·T/Σ wedges and the mean local coefficient
    2·T_v/(d_v(d_v−1)) over nodes with d ≥ 2, from the SAME
    degree-oriented triangle enumeration as graph_triangle_count — the
    pivot row keeps all three corners, so per-node triangle counts are
    one explode + keyed count on top of the enumeration that already
    guarantees each triangle materializes exactly once.

    Cross-engine exactness: T_v, degrees and wedge counts are exact
    integers; local ratios quantize at 1e-12 before the DECIMAL(38,0)
    pico-unit fold; the two readout ratios form in identical op order
    and floor-quantize at 1e-6.

    Scale design: identical to the triangle key (edges staged once to
    scratch parquet for their multiple consumers; degree-ordered
    orientation bounds per-pivot wedge fan-out at O(√|E|)); the
    per-node rollups are keyed shuffles over triangle-corner and
    endpoint rows."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .count()
        .where(F.col("count") >= 2)
        .select("x", "y")
    )
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("cc_edges", sf_dir)
    edges.write.mode("overwrite").parquet(stage)
    edges = spark.read.parquet(stage)
    deg = (
        edges.select(F.col("x").alias("node"))
        .unionAll(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            "node",
            "deg",
            (F.col("deg") * F.lit(1 << 32) + F.col("node")).alias("ord"),
        )
    )
    ordered = (
        edges.join(
            deg.select(F.col("node").alias("x"), F.col("ord").alias("ord_x")),
            "x",
        )
        .join(
            deg.select(F.col("node").alias("y"), F.col("ord").alias("ord_y")),
            "y",
        )
    )
    fwd = ordered.select(
        F.when(F.col("ord_x") < F.col("ord_y"), F.col("x"))
        .otherwise(F.col("y"))
        .alias("src"),
        F.when(F.col("ord_x") < F.col("ord_y"), F.col("y"))
        .otherwise(F.col("x"))
        .alias("dst"),
        F.greatest("ord_x", "ord_y").alias("ord_dst"),
    )
    w1, w2 = fwd.alias("w1"), fwd.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.ord_dst") < F.col("w2.ord_dst")),
    ).select(
        F.col("w1.src").alias("pivot"),
        F.col("w1.dst").alias("v"),
        F.col("w2.dst").alias("w"),
    )
    closing = fwd.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    tn = (
        tri.select(
            F.explode(F.array("pivot", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    loc = deg.join(tn, "node", "left").select(
        "deg",
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        (F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("long")
        .alias("wedges"),
    )
    s = loc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.count_if(F.col("deg") >= 2).alias("n_deg_ge2"),
        (F.sum("t") / 3).cast("long").alias("n_triangles"),
        F.sum("wedges").cast("long").alias("n_wedges"),
        (
            F.sum(
                F.floor(
                    F.when(
                        F.col("deg") >= 2,
                        F.col("t").cast("double") / F.col("wedges"),
                    ).otherwise(0.0)
                    * 1e12
                ).cast("decimal(38,0)")
            ).cast("double")
            / 1e12
        ).alias("sum_local"),
    )
    n_edge = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return s.crossJoin(F.broadcast(n_edge)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_deg_ge2",
        fquant(
            3.0
            * F.col("n_triangles").cast("double")
            / F.col("n_wedges")
        ).alias("transitivity"),
        fquant(
            F.col("sum_local") / F.col("n_deg_ge2")
        ).alias("mean_local_cc"),
    )


# ---------------------------------------------------------------------------
# graph_rich_club_coefficient — STAGED for the r15 cadence (parked
# unregistered; SURVEY round-13 log). Rich-club coefficient φ(k) =
# 2·E_k/(N_k(N_k−1)) at pinned degree thresholds over the co-purchase
# graph: do the high-degree hubs preferentially connect to EACH OTHER?
# The hub-structure readout beside assortativity's single global
# correlation — a rising φ(k) curve is the "core elite" signature.
# ---------------------------------------------------------------------------

_RICH_CLUB_KS = (2, 4, 8)  # degree thresholds (fixture-pinned non-empty)

_RICH_CLUB_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT x AS node FROM e UNION ALL SELECT y FROM e)
  GROUP BY node
),
ks AS (SELECT unnest([{", ".join(str(k) for k in _RICH_CLUB_KS)}]) AS k),
rich AS (
  SELECT k, node FROM ks JOIN deg ON d > k
),
nk AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rich FROM rich GROUP BY k
),
ek AS (
  -- COUNT(hit.k), not COUNT(*): a threshold whose club has zero
  -- internal edges must yield e_rich = 0, not count the unmatched
  -- NULL row of the LEFT JOIN (judge r13 ADVICE — latent divergence
  -- vs the Spark side's coalesce-to-0 at sparser scale factors).
  SELECT ks.k, CAST(COUNT(hit.k) AS BIGINT) AS e_rich
  FROM ks
  LEFT JOIN (
    SELECT rx.k AS k
    FROM e
    JOIN rich rx ON rx.node = e.x
    JOIN rich ry ON ry.node = e.y AND ry.k = rx.k
  ) hit ON hit.k = ks.k
  GROUP BY ks.k
)
SELECT nk.k AS degree_threshold, nk.n_rich, ek.e_rich,
       FLOOR(2.0 * ek.e_rich / (nk.n_rich * (nk.n_rich - 1)) * 1e6)
         / 1e6 AS phi
FROM nk JOIN ek ON nk.k = ek.k
"""


def graph_rich_club_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """φ(k) at k ∈ {_RICH_CLUB_KS}: the density of the subgraph induced
    by nodes of degree > k, one row per threshold. φ(k) → 1 as the
    elite tightens into a clique; comparing across k IS the curve
    (nested clubs: the k=8 club is a subset of the k=2 club, so the
    row set carries its own containment structure — pinned in tests).

    Cross-engine exactness: degrees, club memberships and club edge
    counts are exact integers (membership via strict d > k on exact
    degree counts); only φ quantizes at 1e-6.

    Scale design: the triangle key's staged edge set, one degree
    rollup, a 3-row literal threshold spine, membership and club-edge
    joins all KEYED on node — the induced-subgraph check never goes
    all-pairs."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .count()
        .where(F.col("count") >= 2)
        .select("x", "y")
    )
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("rc_edges", sf_dir)
    edges.write.mode("overwrite").parquet(stage)
    edges = spark.read.parquet(stage)
    deg = (
        edges.select(F.col("x").alias("node"))
        .unionAll(edges.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in _RICH_CLUB_KS])
    ).alias("k")
    rich = deg.select("node", "d", ks).where(F.col("d") > F.col("k"))
    nk = rich.groupBy("k").agg(F.count(F.lit(1)).alias("n_rich"))
    # both membership joins are keyed — the x leg on node, the y leg
    # on (node, k) so an edge counts only inside ITS club
    m_x = rich.select(F.col("node").alias("x"), F.col("k").alias("k"))
    m_y = rich.select(F.col("node").alias("y"), F.col("k").alias("k"))
    ek = (
        edges.join(m_x, "x")
        .join(m_y, ["y", "k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_rich"))
    )
    out = nk.join(ek, "k", "left").select(
        F.col("k").cast("long").alias("degree_threshold"),
        F.col("n_rich").cast("long").alias("n_rich"),
        F.coalesce(F.col("e_rich"), F.lit(0))
        .cast("long")
        .alias("e_rich"),
        fquant(
            2.0
            * F.coalesce(F.col("e_rich"), F.lit(0)).cast("double")
            / (F.col("n_rich") * (F.col("n_rich") - 1))
        ).alias("phi"),
    )
    return out


# ---------------------------------------------------------------------------
# graph_katz_truncated — STAGED for the r16 cadence (parked
# unregistered; SURVEY round-14 log). Truncated Katz centrality
# (3 steps, β = 0.05) on the co-purchase part graph: the
# WALK-WEIGHTED member of the centrality family — degree counts
# 1-step reach, pagerank needs the full iterative fixpoint (rows-only
# by nature); truncated Katz is the CLOSED-FORM middle ground
# (c = Σ_k β^k·(Aᵏ·1), k ≤ 3) every feature store actually ships,
# exactly SQL-mirrorable because walk counts are integers.
# ---------------------------------------------------------------------------

# β^k as python-evaluated double literals (a bare 0.05 literal is
# DECIMAL in DuckDB — the SPRT lesson); β < 1/λ_max keeps Katz finite,
# and at 3 steps any β just weights the walk counts
_KATZ_B1 = 0.05
_KATZ_B2 = _KATZ_B1 * _KATZ_B1
_KATZ_B3 = _KATZ_B2 * _KATZ_B1
_KATZ_TOPN = 20

_KATZ_ORACLE = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
e AS (SELECT x, y FROM p WHERE c >= 2),
adj AS (
  SELECT x AS src, y AS dst FROM e
  UNION ALL SELECT y, x FROM e
),
v1 AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS w1
  FROM adj GROUP BY 1
),
v2 AS (
  SELECT adj.src AS node, CAST(SUM(v1.w1) AS BIGINT) AS w2
  FROM adj JOIN v1 ON v1.node = adj.dst GROUP BY 1
),
v3 AS (
  SELECT adj.src AS node, CAST(SUM(v2.w2) AS BIGINT) AS w3
  FROM adj JOIN v2 ON v2.node = adj.dst GROUP BY 1
)
SELECT v1.node AS part_id, v1.w1 AS walks1, v2.w2 AS walks2,
       v3.w3 AS walks3,
       FLOOR((v1.w1 * {_KATZ_B1!r} + v2.w2 * {_KATZ_B2!r}
              + v3.w3 * {_KATZ_B3!r}) * 1e6) / 1e6 AS katz
FROM v1 JOIN v2 ON v2.node = v1.node JOIN v3 ON v3.node = v1.node
ORDER BY katz DESC, part_id
LIMIT {_KATZ_TOPN}
"""


def graph_katz_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c(v) = β·deg(v) + β²·walks₂(v) + β³·walks₃(v) over the
    triangle/rich-club co-purchase edge set (pairs in ≥ 2 shared
    orders), top-{_KATZ_TOPN} by centrality. Walk counts (not paths —
    backtracking included, the Katz definition) come from three keyed
    adjacency⋈vector joins: Aᵏ·1 needs only the previous vector, never
    the matrix power.

    Cross-engine exactness: walk counts are EXACT INTEGERS; β powers
    are python-evaluated double literals injected into both engines;
    the score is one fixed-order double expression, floor-quantized
    before the (katz DESC, part_id) top-N cut — the deterministic-tie
    ordering doctrine.

    Scale design: the edge build is the triangle key's keyed shuffle;
    the adjacency stages to parquet ONCE for its three join consumers
    (the rich-club staging pattern); each hop is a keyed equi-join +
    map-side-combinable rollup — walk fan-out never materializes, only
    per-node partial sums move; the final cut is
    TakeOrderedAndProject."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .count()
        .where(F.col("count") >= 2)
        .select("x", "y")
    )
    adj = e.select(
        F.col("x").alias("src"), F.col("y").alias("dst")
    ).unionAll(e.select(F.col("y").alias("src"), F.col("x").alias("dst")))
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("katz_adj", sf_dir)
    adj.write.mode("overwrite").parquet(stage)
    adj = spark.read.parquet(stage)
    v1 = adj.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("w1")
    )
    v2 = (
        adj.join(v1.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("w1").cast("long").alias("w2"))
    )
    v3 = (
        adj.join(v2.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("w2").cast("long").alias("w3"))
    )
    katz = fquant(
        F.col("w1") * _KATZ_B1
        + F.col("w2") * _KATZ_B2
        + F.col("w3") * _KATZ_B3
    )
    return (
        v1.join(v2, "node")
        .join(v3, "node")
        .select(
            F.col("node").alias("part_id"),
            F.col("w1").alias("walks1"),
            F.col("w2").alias("walks2"),
            F.col("w3").alias("walks3"),
            katz.alias("katz"),
        )
        .orderBy(F.col("katz").desc(), "part_id")
        .limit(_KATZ_TOPN)
    )
