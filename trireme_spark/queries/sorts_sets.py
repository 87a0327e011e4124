"""Sorts / limits / top-k (o1–o2) and set operations / dedup (u1–u3) —
SURVEY.md §2.6–2.7.

Scale notes: o2's ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
each partition keeps a k-row heap and only k·partitions rows ever move, never
a global sort. o1 pins a total order (unique tie-break key) so the emitted
ranks are deterministic — under-specified ORDER BY is a correctness bug
waiting for a partition-count change to expose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trireme_spark.parity import DSCALE, dsum, meta_part, oracle_sum
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_O1_ORACLE = """
SELECT ROW_NUMBER() OVER (
           ORDER BY NULLIF(o_orderstatus, 'P') DESC NULLS LAST,
                    o_totalprice ASC, o_orderkey ASC) AS pos,
       o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       o_totalprice
FROM orders
WHERE o_totalprice > 150000
"""


@register("sort_multi_key", oracle=_O1_ORACLE)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o1 — multi-key ORDER BY with DESC NULLS LAST, made verifiable: the
    emitted position column proves the order, and the unique key tie-break
    makes it total.

    Global row numbers WITHOUT a one-reducer window: bucket rows into
    order-preserving ranges, number within each range, offset each range
    by the count of rows in earlier ranges (a broadcast one-row-per-range
    table).

    The range id is a pure expression of the sort key (status mapped to
    its ordinal, price equal-width-bucketed within status), NOT
    ``repartitionByRange + spark_partition_id()``: sampled boundaries +
    a nondeterministic id can disagree between plan-subtree executions
    and corrupt the offsets (see pack_sequences). Clamping keeps rows
    outside the assumed price domain correct (they pool in the edge
    bucket — skew, never wrongness)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    base = o.select(
        "o_orderkey",
        status.alias("status_or_null"),
        "o_totalprice",
    )
    order = [
        F.col("status_or_null").desc_nulls_last(),
        F.col("o_totalprice").asc(),
        F.col("o_orderkey").asc(),
    ]
    n_ranges = spark.sparkContext.defaultParallelism
    # status desc_nulls_last over {'O','F',NULL} → ordinals 0,1,2; price
    # ascending within status, assumed domain [0, 1e6) (TPC-H totalprice
    # is bounded per order at any SF)
    s_ord = (
        F.when(F.col("status_or_null") == "O", 0)
        .when(F.col("status_or_null") == "F", 1)
        .otherwise(2)
    )
    p_bkt = F.least(
        F.greatest(
            (F.col("o_totalprice") / F.lit(1e6 / n_ranges)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_ranges - 1),
    )
    ranged = base.withColumn("rng", s_ord * n_ranges + p_bkt)
    w_in = Window.partitionBy("rng").orderBy(*order)
    local = ranged.withColumn("loc_pos", F.row_number().over(w_in))
    # lit(0) partition key = same single-partition run over #buckets rows,
    # without the benign "No Partition Defined" warning in the driver log
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("rng")
        .agg(F.count(F.lit(1)).alias("rng_n"))
        .withColumn(
            "offset", F.coalesce(F.sum("rng_n").over(w_prev), F.lit(0))
        )
        .select("rng", "offset")
    )
    return (
        local.join(F.broadcast(offsets), "rng")
        .select(
            (F.col("loc_pos") + F.col("offset")).alias("pos"),
            "o_orderkey",
            "status_or_null",
            "o_totalprice",
        )
        .orderBy("pos")
    )


_O2_ORACLE = f"""
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
       {oracle_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("limit_topk", oracle=_O2_ORACLE)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o2 — TPC-H Q3 shape: global top-10 by revenue.

    ``orderBy().limit(10)`` → TakeOrderedAndProject (per-partition heaps);
    the exact decimal revenue makes the top-10 cut deterministic across
    engines, with o_orderkey as the tie-break."""
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias(
                "order_date"
            ),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_U1_ORACLE = """
SELECT 'all' AS mode, o_orderkey FROM (
    SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
    UNION ALL
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT 'distinct' AS mode, o_orderkey FROM (
    SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
    UNION
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@register("set_union", oracle=_U1_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u1 — UNION ALL (multiset, keeps overlap duplicates) vs UNION
    (distinct), tagged side by side."""
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 150000).select("o_orderkey")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    union_all = big.unionByName(urgent)
    union_distinct = union_all.distinct()
    return union_all.select(
        F.lit("all").alias("mode"), "o_orderkey"
    ).unionByName(
        union_distinct.select(F.lit("distinct").alias("mode"), "o_orderkey")
    )


_U2_ORACLE = """
SELECT 'intersect' AS mode, c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_totalprice > 100000
    INTERSECT
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT 'except' AS mode, c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_totalprice > 100000
    EXCEPT
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT 'except_all' AS mode, c FROM (
    SELECT o_custkey AS c FROM orders WHERE o_totalprice > 100000
    EXCEPT ALL
    SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@register("set_intersect_except", oracle=_U2_ORACLE)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u2 — INTERSECT / EXCEPT / EXCEPT ALL (multiset difference)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("c")
    )
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c")
    )

    def tag(df, mode):
        return df.select(F.lit(mode).alias("mode"), "c")

    return (
        tag(a.intersect(b), "intersect")
        .unionByName(tag(a.subtract(b), "except"))
        .unionByName(tag(a.exceptAll(b), "except_all"))
    )


_U3_ORACLE = """
SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
FROM events
QUALIFY row_number() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts ASC, event_id ASC) = 1
"""


@register("dedup_exact", oracle=_U3_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """u3 — exact dedup on a column subset with a DETERMINISTIC survivor
    (earliest ts, then lowest id) — ``dropDuplicates`` semantics but
    reproducible across partitionings, which bare dropDuplicates is not."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


_RCTE_ORACLE = """
WITH RECURSIVE anc(node, cur, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT node, cur // 2, depth + 1 FROM anc WHERE cur > 0
)
SELECT node AS doc_id,
       max(depth) AS depth,
       CAST(sum(cur) AS BIGINT) AS ancestor_id_sum
FROM anc GROUP BY node
"""


@register("sql_recursive_cte", oracle=_RCTE_ORACLE)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new engine surface in Spark 4): walk each doc up a
    synthetic binary-tree hierarchy (parent = id ÷ 2) to the root,
    emitting depth and the sum of ancestor ids. Dialects differ only in
    the integer-division operator (Spark ``DIV``, DuckDB ``//``); the
    recursion semantics match exactly.

    Scale note: each recursive step is a distributed self-join — Spark
    plans it as iterative union steps, so depth (log₂ of the id space,
    ~40 for int64) bounds the rounds, not the data size."""
    from trireme_spark.sql import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        WITH RECURSIVE anc(node, cur, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents
          UNION ALL
          SELECT node, cur DIV 2, depth + 1 FROM anc WHERE cur > 0
        )
        SELECT node AS doc_id,
               MAX(depth) AS depth,
               SUM(cur) AS ancestor_id_sum
        FROM anc GROUP BY node
        """,
    )


_SUBQ_SQL = """
SELECT c_custkey, c_name,
       (SELECT COUNT(*) FROM orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
       EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000) AS has_big_order,
       c_nationkey IN (SELECT n_nationkey FROM nation
                        WHERE n_name LIKE 'A%') AS in_a_nation
FROM customer c
"""


@register("sql_subqueries", oracle=_SUBQ_SQL)
def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated and uncorrelated subqueries through the SQL path:
    correlated scalar COUNT, correlated EXISTS, uncorrelated IN. The SAME
    ANSI text runs on both engines. Catalyst decorrelates all three into
    aggregated/semi joins — the plan never executes a per-row subquery,
    which is what makes the SQL form safe at 100 TB."""
    from trireme_spark.sql import run_sql

    return run_sql(spark, sf_dir, _SUBQ_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@register("sql_lateral_join", oracle=_LATERAL_SQL)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 orders per customer) — the SAME
    ANSI text runs on both engines. Catalyst decorrelates the correlated
    ORDER BY … LIMIT into a ranked window join (the w2 pattern), so
    execution is a keyed shuffle, never a per-customer subquery — which
    is what makes the LATERAL surface safe at 100 TB."""
    from trireme_spark.sql import run_sql

    return run_sql(spark, sf_dir, _LATERAL_SQL)


_GBA_SQL = """
SELECT c_mktsegment, o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY ALL
"""


@register("sql_group_by_all", oracle=_GBA_SQL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (infer grouping keys from the non-aggregate select
    items) — supported by both engines with identical inference rules;
    the SAME ANSI text runs on both. Plans exactly like an explicit
    GROUP BY: partial+final hash aggregate, one exchange."""
    from trireme_spark.sql import run_sql

    return run_sql(spark, sf_dir, _GBA_SQL)


# ---------------------------------------------------------------------------
# lineitem_pareto_abc — cumulative revenue share → ABC inventory classes
# ---------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
             AS rev
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT SUM(rev) AS t FROM pr),
c AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS cum
  FROM pr
)
SELECT l_partkey,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(CAST(cum AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cum_share,
       CASE WHEN 2 * cum <= t THEN 'A'
            WHEN 5 * cum <= 4 * t THEN 'B'
            ELSE 'C' END AS abc_class
FROM c, tot
"""


@register("lineitem_pareto_abc", oracle=_PARETO_ORACLE)
def lineitem_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis — every part's cumulative share of total
    revenue in descending-revenue order, classed A (top 50% of revenue),
    B (next 30%), C (tail): the 80/20 concentration cut every inventory
    and curation pipeline runs (same shape ranks data sources by token
    contribution in a corpus-mixture audit).

    Scale design: the corpus-sized work is ONE map-side-combined rollup
    to parts; the global prefix sum over the part dimension is the
    DISTRIBUTED two-pass form (equal-width revenue buckets from a 1-row
    bounds aggregate — order-preserving pure expression of the sort key
    — local running sums, broadcast per-bucket offsets), never a
    one-reducer window. All sums stay decimal, and the class boundaries
    compare 2·cum ≤ t / 5·cum ≤ 4·t in EXACT integer-scaled arithmetic,
    so no division-rounding drift can flip a class cross-engine; the
    reported cum_share divides as double only for display (round 6)."""
    from trireme_spark.operators.hints import cache_once

    li = table(spark, sf_dir, "lineitem")
    # cache the part-dimension rollup: bounds / ranged / tot (and the
    # offsets leg derived from ranged) each otherwise replay the full
    # lineitem aggregation — five corpus scans for one part-grain frame
    # (the bounded-derived-frame replay class of this round's fixes)
    pr = cache_once(
        li.groupBy("l_partkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            ).alias("rev")
        )
    )
    n_rng = spark.sparkContext.defaultParallelism
    bounds = pr.agg(F.min("rev").alias("lo"), F.max("rev").alias("hi"))
    # descending revenue order → bucket ascends with (hi - rev); the
    # greatest() keeps a degenerate all-equal-revenue input from a
    # divide-by-zero (ANSI mode errors) — everything pools in bucket 0,
    # which is skew, never wrongness
    width = F.greatest(
        (F.col("hi") - F.col("lo")) / n_rng,
        F.lit(1).cast("decimal(27,6)"),
    )
    raw = ((F.col("hi") - F.col("rev")) / width).cast("int")
    ranged = pr.crossJoin(F.broadcast(bounds)).withColumn(
        "rng",
        F.least(F.greatest(raw, F.lit(0)), F.lit(n_rng - 1)),
    )
    w_in = (
        Window.partitionBy("rng")
        .orderBy(F.col("rev").desc(), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("cum_local", F.sum("rev").over(w_in))
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        local.groupBy("rng")
        .agg(F.sum("rev").alias("rng_tot"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("rng_tot").over(w_prev),
                F.lit(0).cast("decimal(38,6)"),
            ),
        )
        .select("rng", "off")
    )
    tot = pr.agg(F.sum("rev").alias("t"))
    cum = F.col("cum_local") + F.col("off")
    return (
        local.join(F.broadcast(offs), "rng")
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
            F.round(
                cum.cast("double") / F.col("t").cast("double"), 6
            ).alias("cum_share"),
            F.when(2 * cum <= F.col("t"), "A")
            .when(5 * cum <= 4 * F.col("t"), "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


# ---------------------------------------------------------------------------
# sql_pipe_syntax — Spark 4 pipe-operator SQL surface
# ---------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
           AS revenue
FROM orders
WHERE o_totalprice > 100000
GROUP BY o_orderstatus
HAVING COUNT(*) > 10
"""

_PIPE_SPARK = """
FROM orders
|> WHERE o_totalprice > 100000
|> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 AS revenue
   GROUP BY o_orderstatus
|> WHERE n > 10
|> SELECT o_orderstatus, n, revenue
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's pipe-operator SQL (`|>`) — the linear query dialect
    (scan |> filter |> aggregate |> post-filter) added in Spark 4.0,
    value-checked against the classic GROUP BY/HAVING form the oracle
    runs: one more full engine SURFACE (parser dialect), zero new
    physical semantics — the pipe text lowers to exactly the same
    partial+final aggregate plan."""
    from trireme_spark.sql import run_sql

    return run_sql(spark, sf_dir, _PIPE_SPARK)


# ---------------------------------------------------------------------------
# sql_parameterized — parameterized spark.sql() (Spark 4 API surface)
# ---------------------------------------------------------------------------

_PARAM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderpriority <> '5-LOW'
GROUP BY o_orderpriority
"""


@register("sql_parameterized", oracle=_PARAM_ORACLE)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized ``spark.sql`` (Spark 4): named ``:params`` bind
    server-side as LITERALS in the parse tree — the injection-safe way
    to template queries (string interpolation is the bug class this API
    retires). Catalyst sees real literals, so constant folding and
    parquet predicate pushdown work exactly as if the values were
    inlined; the plan is identical to the hand-written filter.

    The parameters deliberately include a numeric threshold (pushed to
    the scan) and a string exclusion (folded into the same Filter) —
    the two shapes dashboards template most."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "trireme_orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM trireme_orders_param
        WHERE o_totalprice > :min_price AND o_orderpriority <> :skip_prio
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000.0, "skip_prio": "5-LOW"},
    )


# ---------------------------------------------------------------------------
# sql_select_except — star-modifier projection + ORDER BY ALL
# ---------------------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT * EXCLUDE (c_acctbal, c_mktsegment) FROM customer
WHERE c_nationkey < 5
ORDER BY ALL
"""


@register("sql_select_except", oracle=_EXCEPT_ORACLE)
def sql_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-modifier SQL surface: ``SELECT * EXCEPT (cols)`` (Spark 4;
    DuckDB spells it EXCLUDE) plus ``ORDER BY ALL`` — the
    wide-table ergonomics that modern warehouse SQL standardized:
    project everything but the columns you're dropping without
    enumerating a 300-column schema, order deterministically without
    repeating the list.

    Although the sugar differs per dialect (EXCEPT/EXCLUDE), both lower
    to the identical pruned projection — column pruning still reaches
    the scan because the star expands at analysis time, not runtime.
    ORDER BY ALL orders by every projected column left-to-right, which
    both engines define identically."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "trireme_cust_except"
    )
    return spark.sql(
        """
        SELECT * EXCEPT (c_acctbal, c_mktsegment)
        FROM trireme_cust_except
        WHERE c_nationkey < 5
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# sql_identifier_dynamic — IDENTIFIER() clause: safe dynamic names
# ---------------------------------------------------------------------------

_IDENT_ORACLE = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS bal
FROM customer GROUP BY c_mktsegment
"""


@register("sql_identifier_dynamic", oracle=_IDENT_ORACLE)
def sql_identifier_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 3.5+): table AND column names arrive
    as parameters but bind as NAMES, not strings — the injection-safe
    complement of sql_parameterized (that key templates VALUES; this
    one templates IDENTIFIERS, the other half of every dashboard/
    multi-tenant query generator, where f-string interpolation is the
    classic SQL-injection hole).

    The identifier resolves at ANALYSIS time, so column pruning and
    aggregate planning are identical to the hand-written name — zero
    plan cost for the indirection."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "trireme_cust_ident"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS c_mktsegment,
               COUNT(*) AS n,
               CAST(SUM(CAST(IDENTIFIER(:val_col) AS DECIMAL(27,6)))
                    AS DOUBLE) AS bal
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        """,
        args={
            "grp_col": "c_mktsegment",
            "val_col": "c_acctbal",
            "tbl": "trireme_cust_ident",
        },
    )


# ---------------------------------------------------------------------------
# orders_gini_coefficient — revenue concentration via two-pass global rank
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(27,6))) AS DECIMAL(27,6)) AS rev
  FROM lineitem GROUP BY l_partkey
), r AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev ASC, l_partkey ASC) AS pos
  FROM pr
), s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(rev) AS DOUBLE) AS sx,
         CAST(SUM(pos * rev) AS DOUBLE) AS sixi
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_parts, sx AS total_revenue,
       FLOOR((2.0 * sixi / (n * sx) - (n + 1.0) / n) * 1e6) / 1e6 AS gini
FROM s
"""


@register("orders_gini_coefficient", oracle=_GINI_ORACLE)
def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-part revenue concentration (0 = equal,
    →1 = winner-take-all) — the single-number inequality complement of
    lineitem_pareto_abc's class bands, and the same statistic a corpus
    team runs on token-share-per-source to detect source dominance.

    Formula: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-ranked
    values. The global rank uses the DISTRIBUTED two-pass form (the
    pareto/sort machinery): equal-width revenue buckets from a 1-row
    bounds aggregate → per-bucket row_number → broadcast bucket
    offsets — never a single-reducer global window. Tie order cannot
    change the value (equal x contribute the same Σi·x under any
    permutation of their ranks), so the statistic is deterministic
    even though tied ranks are not.

    Exactness: rev and i·rev stay DECIMAL through the sums; the final
    ratio is one double expression over exact operands, floor-
    quantized at 1e-6."""
    from trireme_spark.operators.hints import cache_once

    li = table(spark, sf_dir, "lineitem")
    # part-dimension rollup (bounded by |part|) consumed by the bounds
    # agg AND both two-pass-rank legs — uncached, each consumer replayed
    # the full lineitem aggregation (4 lineitem scans in the formatted
    # plan; 1 after). The lineitem_pareto_abc treatment (log #13).
    pr = cache_once(
        li.groupBy("l_partkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    DSCALE
                )
            ).alias("rev")
        )
    )
    n_ranges = spark.sparkContext.defaultParallelism
    bounds = pr.agg(
        F.min("rev").alias("lo"), F.max("rev").alias("hi")
    )
    ranged = pr.crossJoin(F.broadcast(bounds)).withColumn(
        "rng",
        F.least(
            F.greatest(
                (
                    (F.col("rev") - F.col("lo"))
                    * n_ranges
                    / (F.col("hi") - F.col("lo") + F.lit(1e-6))
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(n_ranges - 1),
        ),
    )
    w_in = Window.partitionBy("rng").orderBy(
        F.col("rev").asc(), F.col("l_partkey").asc()
    )
    local = ranged.withColumn("loc_pos", F.row_number().over(w_in))
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("rng")
        .agg(F.count(F.lit(1)).alias("rng_n"))
        .withColumn(
            "offset", F.coalesce(F.sum("rng_n").over(w_prev), F.lit(0))
        )
        .select("rng", "offset")
    )
    s = (
        local.join(F.broadcast(offsets), "rng")
        .select(
            "rev",
            (F.col("loc_pos") + F.col("offset")).alias("pos"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("rev").cast("double").alias("sx"),
            F.sum(F.col("pos") * F.col("rev")).cast("double").alias("sixi"),
        )
    )
    return s.select(
        F.col("n").cast("long").alias("n_parts"),
        F.col("sx").alias("total_revenue"),
        (
            F.floor(
                (
                    2.0 * F.col("sixi") / (F.col("n") * F.col("sx"))
                    - (F.col("n") + 1.0) / F.col("n")
                )
                * 1e6
            )
            / 1e6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# sql_distribute_sort_by — DISTRIBUTE BY / SORT BY physical-layout SQL
# ---------------------------------------------------------------------------

_DISTSORT_ORACLE = """
SELECT o_custkey, CAST(o_orderdate AS VARCHAR) AS od, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS seq
FROM orders
"""


@register("sql_distribute_sort_by", oracle=_DISTSORT_ORACLE)
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY ... SORT BY — the Hive-dialect surface for
    PHYSICAL layout control: hash-partition rows by key, sort WITHIN
    each partition (no global order) — what you write before a
    partitioned sink or a partition-local algorithm when ORDER BY's
    global sort would be a pointless single barrier.

    The layout itself has no row-visible effect, so the key makes it
    OBSERVABLE: a per-customer sequence computed by a window whose
    required distribution+ordering is ALREADY satisfied by the
    DISTRIBUTE/SORT BY — Catalyst elides the window's own exchange
    and sort (one Exchange total in the plan, asserted by the plan
    gate), which is precisely the optimization this clause exists to
    enable."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "trireme_orders_distsort"
    )
    return spark.sql(
        """
        SELECT o_custkey, CAST(o_orderdate AS STRING) AS od, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS seq
        FROM (
          SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
          FROM trireme_orders_distsort
          DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderdate, o_orderkey
        )
        """
    )


# ---------------------------------------------------------------------------
# orders_skyline_2d — Pareto-frontier (skyline) operator
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_totalprice >= a.o_totalprice
    AND b.o_orderdate >= a.o_orderdate
    AND (b.o_totalprice > a.o_totalprice
         OR b.o_orderdate > a.o_orderdate)
)
"""


@register("orders_skyline_2d", oracle=_SKYLINE_ORACLE)
def orders_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) over (value, recency): orders no other
    order dominates on BOTH axes — the multi-criteria shortlist
    operator (best trade-offs, not best-on-one-metric) classical DBs
    ship as SKYLINE OF; here from primitives.

    The exact 2-D identity, ties included: a point (p, d) survives iff
      (a) d >  max date over STRICTLY higher prices, AND
      (b) d == max date among its EQUAL-price peers
    — (a) kills (price>, date>=) dominators, (b) kills (price=, date>)
    dominators; equal-on-both-axes points are mutually undominated and
    both conditions keep them. No borderline re-verify join is needed.

    Scale design: the strictly-higher running max is a GLOBAL-order
    dependency, so it runs in the DISTRIBUTED two-pass form (the
    Gini/pareto machinery) over the COLLAPSED per-distinct-price table
    (groupBy price → max date; rows = #distinct prices ≤ n): equal-width
    price buckets from a 1-row bounds broadcast → per-bucket
    ROWS-running max over distinct prices, exclusive of the current row,
    ordered by an integer cents-scaled price so "previous row" is
    exactly "strictly higher price" (a RANGE -1 frame over a DESC
    double ordering frames only prices ≥ current+1.0 and silently skips
    dominators 0.01-0.99 higher — the r5-judged bug) → per-bucket max
    table (rows = #buckets) whose PREFIX maxes join back as each
    bucket's carry-in. Buckets cut on price, so a distinct price lives
    wholly in one bucket and the carry is exactly "all strictly-higher
    buckets". No single-reducer window touches data; the per-price
    frontier joins back to rows on the cents key (keyed equi-join, AQE
    picks broadcast when small). The brute-force NOT-EXISTS oracle
    value-checks the rewrite.

    Higher dimensions: d>2 skylines block-partition + local skyline +
    merge — same bucket doctrine, documented trade."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("od"),
    ).withColumn(
        "dt", F.unix_date(F.col("od")).cast("long")
    ).withColumn(
        # fixture prices are 2-decimal currency; cents-scale to an exact
        # integer ordering key so frame arithmetic is strict-inequality
        "cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    n_ranges = spark.sparkContext.defaultParallelism
    # 1-row bounds + the distinct-price collapse are each consumed by
    # two downstream legs (local window / per-bucket carry); uncached,
    # every consumer replayed the orders aggregation underneath (5
    # orders scans in the formatted plan; 1 after). grp's grain is the
    # distinct cents domain — bounded by the PRICE RANGE, not the
    # corpus — so the cache obeys the bounded-frame doctrine.
    from trireme_spark.operators.hints import cache_once

    bounds = cache_once(
        o.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    )
    # bucket 0 = highest prices so bucket order matches price DESC;
    # computed from the integer cents key so row- and group-side bucket
    # assignment can never diverge on float rounding
    def _rng(c):
        return F.least(
            F.greatest(
                (
                    (F.col("hi") - c)
                    * n_ranges
                    / (F.col("hi") - F.col("lo") + F.lit(1))
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(n_ranges - 1),
        )

    # collapse: one row per distinct price (keyed agg, distributed)
    grp = cache_once(
        o.groupBy("cents").agg(F.max("dt").alias("gmax"))
        .crossJoin(F.broadcast(bounds))
        .withColumn("rng", _rng(F.col("cents")))
    )
    # per-bucket running max over strictly-higher DISTINCT prices:
    # rows-frame exclusive of current row is exact on the collapsed table
    w_run = (
        Window.partitionBy("rng")
        .orderBy(F.col("cents").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = grp.withColumn("run_dt", F.max("gmax").over(w_run))
    # carry-in: max date of all strictly-higher-price buckets
    per_bucket = grp.groupBy("rng").agg(F.max("gmax").alias("b_max"))
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.withColumn(
        "carry", F.max("b_max").over(w_prev)
    ).select("rng", "carry")
    frontier = (
        local.join(F.broadcast(carry), "rng", "left")
        .withColumn(
            "best_above",
            F.greatest(
                F.coalesce(F.col("run_dt"), F.lit(-(10**9))),
                F.coalesce(F.col("carry"), F.lit(-(10**9))),
            ),
        )
        .select("cents", "gmax", "best_above")
    )
    return (
        o.join(frontier, "cents")
        .where(
            (F.col("dt") > F.col("best_above"))
            & (F.col("dt") == F.col("gmax"))
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("od").cast("string").alias("od"),
        )
    )


# ---------------------------------------------------------------------------
# orders_skyline_3d — higher-dimensional skyline (block-partition + merge)
# ---------------------------------------------------------------------------

_SKY3_ORACLE = """
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
         l_extendedprice AS price, l_quantity AS qty,
         CAST(l_shipdate AS DATE) AS sd
  FROM lineitem WHERE l_orderkey % 10 = 0
)
SELECT l_orderkey, l_linenumber, price, qty,
       CAST(sd AS VARCHAR) AS ship_day
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.price >= a.price AND b.qty >= a.qty AND b.sd >= a.sd
    AND (b.price > a.price OR b.qty > a.qty OR b.sd > a.sd)
)
"""


@register("orders_skyline_3d", oracle=_SKY3_ORACLE)
def orders_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D SKYLINE (Pareto frontier over price, quantity, ship recency)
    — the d>2 case the 2-D sort-based identity (orders_skyline_2d)
    cannot express, in the classic DISTRIBUTED block-partition form:

    1. hash-partition the points; each partition computes its LOCAL
       skyline with a sort-pruned scan (sorted by price desc, a point
       only needs checking against already-kept points — O(m·s) per
       partition for local skyline size s, all inside one Arrow batch);
    2. the union of local skylines is a complete candidate set (a
       globally undominated point is undominated in its own partition);
    3. the final pass anti-joins candidates against candidates —
       dominance is transitive, so a candidate dominated only by a
       pruned point is also dominated by some candidate. Candidates are
       skyline-sized (<< input), so the nested-loop anti-join
       broadcasts under the size gate; a frontier too large to
       broadcast would recurse the same block-partition step instead
       (documented trade, loud via the gate falling back to a shuffle).

    Sub-sampling (l_orderkey % 10) keeps the brute-force NOT-EXISTS
    oracle quadratic-feasible at sweep scale; the operator itself never
    goes quadratic in the input."""
    import pandas as pd

    from trireme_spark.operators.hints import broadcast_if_small

    li = table(spark, sf_dir, "lineitem")
    pts = (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").alias("qty"),
            F.unix_date(F.col("l_shipdate").cast("date"))
            .cast("long")
            .alias("dt"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def local_skyline(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            yield pdf
            return
        import numpy as np

        m = pdf[["price", "qty", "dt"]].to_numpy(dtype="float64")
        order = np.lexsort((-m[:, 2], -m[:, 1], -m[:, 0]))
        kept_idx: list[int] = []
        kept = np.empty((0, 3))
        for i in order:
            x = m[i]
            if len(kept_idx):
                dom = ((kept >= x).all(axis=1) & (kept > x).any(axis=1))
                if dom.any():
                    continue
            kept_idx.append(i)
            kept = m[kept_idx]
        yield pdf.iloc[sorted(kept_idx)]

    # One local-skyline Arrow pass, not two: the a/b anti-join below
    # otherwise evaluates the whole mapInPandas subtree once per side
    # (the build side rides a BroadcastExchange, which plan reuse cannot
    # dedupe — the candidate_pairs_prefix lesson). The cached frame is
    # the candidate set, skyline-sized (<< input) by step-2's argument.
    from trireme_spark.operators.hints import cache_once

    cand = cache_once(pts.mapInPandas(local_skyline, pts.schema))
    a = cand.alias("a")
    b = cand.alias("b")
    dominated = (
        (F.col("b.price") >= F.col("a.price"))
        & (F.col("b.qty") >= F.col("a.qty"))
        & (F.col("b.dt") >= F.col("a.dt"))
        & (
            (F.col("b.price") > F.col("a.price"))
            | (F.col("b.qty") > F.col("a.qty"))
            | (F.col("b.dt") > F.col("a.dt"))
        )
    )
    return (
        a.join(broadcast_if_small(b), dominated, "left_anti")
        .select(
            "l_orderkey",
            "l_linenumber",
            "price",
            "qty",
            F.date_from_unix_date(F.col("dt").cast("int"))
            .cast("string")
            .alias("ship_day"),
        )
    )


# ---------------------------------------------------------------------------
# orders_lorenz_curve — decile cumulative-share points (Lorenz curve)
# ---------------------------------------------------------------------------

_LORENZ_ORACLE = """
WITH cs AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
              AS DECIMAL(27,6)) AS spend
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT spend, o_custkey,
         ROW_NUMBER() OVER (ORDER BY spend ASC, o_custkey ASC) AS pos,
         COUNT(*) OVER () AS n
  FROM cs
), d AS (
  SELECT ((pos - 1) * 10) // n + 1 AS decile, spend FROM r
), g AS (
  SELECT decile,
         CAST(SUM(spend) AS DECIMAL(27,6)) AS dspend,
         COUNT(*) AS n_customers
  FROM d GROUP BY decile
)
SELECT decile, CAST(dspend AS DOUBLE) AS decile_spend, n_customers,
       ROUND(CAST(SUM(dspend) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(dspend) OVER () AS DOUBLE), 6) AS cum_share
FROM g
"""


@register("orders_lorenz_curve", oracle=_LORENZ_ORACLE)
def orders_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points: customers ranked by total spend, cut into
    deciles, each decile's cumulative share of all revenue — the curve
    whose area complement IS the Gini key's number; dashboards want the
    curve, not just the scalar ("bottom 50% of customers = 19% of
    revenue").

    Scale design: per-customer totals are a keyed decimal agg; the
    global rank reuses the DISTRIBUTED two-pass machinery (equal-width
    spend buckets → per-bucket row_number → broadcast prefix offsets —
    no single-reducer window over data); decile assignment is integer
    floor arithmetic on (pos, n) so both engines cut identically even
    through ties (the total order is pinned by the custkey tie-break);
    the cumulative share runs over TEN metadata rows. Spend stays
    DECIMAL to the final division."""
    from trireme_spark.operators.hints import cache_once

    o = table(spark, sf_dir, "orders")
    # customer-dimension rollup (bounded by |customer|) consumed by the
    # bounds agg AND both two-pass-rank legs — uncached, each consumer
    # replayed the full orders aggregation (4 orders scans in the
    # formatted plan; 1 after). Same treatment as the Gini key.
    cs = cache_once(
        o.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast(DSCALE)).alias("spend")
        )
    )
    n_ranges = spark.sparkContext.defaultParallelism
    bounds = cs.agg(
        F.min("spend").alias("lo"),
        F.max("spend").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    ranged = cs.crossJoin(F.broadcast(bounds)).withColumn(
        "rng",
        F.least(
            F.greatest(
                (
                    (F.col("spend") - F.col("lo"))
                    * n_ranges
                    / (F.col("hi") - F.col("lo") + F.lit(1e-6))
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(n_ranges - 1),
        ),
    )
    w_in = Window.partitionBy("rng").orderBy(
        F.col("spend").asc(), F.col("o_custkey").asc()
    )
    local = ranged.withColumn("loc_pos", F.row_number().over(w_in))
    w_prev = (
        Window.partitionBy(meta_part("rng"))
        .orderBy("rng")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("rng")
        .agg(F.count(F.lit(1)).alias("rng_n"))
        .withColumn(
            "offset", F.coalesce(F.sum("rng_n").over(w_prev), F.lit(0))
        )
        .select("rng", "offset")
    )
    d = (
        local.join(F.broadcast(offsets), "rng")
        .select(
            "spend",
            F.expr(
                "((loc_pos + offset - 1) * 10) DIV n + 1"
            ).alias("decile"),
        )
    )
    g = d.groupBy("decile").agg(
        F.sum("spend").alias("dspend"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    w_cum = (
        Window.partitionBy(meta_part("decile"))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(meta_part("decile"))
    return g.select(
        "decile",
        F.col("dspend").cast("double").alias("decile_spend"),
        "n_customers",
        F.round(
            F.sum("dspend").over(w_cum).cast("double")
            / F.sum("dspend").over(w_tot).cast("double"),
            6,
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# sql_scripting_control_flow — Spark 4 SQL scripting (BEGIN/DECLARE/IF)
# ---------------------------------------------------------------------------

_SCRIPT_ORACLE = """
WITH thr AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(*) AS t
  FROM orders
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       ROUND(thr.t, 6) AS threshold,
       CASE WHEN thr.t > 100000 THEN 'high-value-era'
            ELSE 'low-value-era' END AS regime
FROM orders o CROSS JOIN thr
WHERE o.o_totalprice > thr.t
GROUP BY o.o_orderpriority, thr.t
"""


@register("sql_scripting_control_flow", oracle=_SCRIPT_ORACLE)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (SQL/PSM): a BEGIN…END block with DECLARE,
    SET from a scalar subquery, and IF/ELSE control flow — the
    stored-procedure-style surface (4.0+) that lets a SQL-only user
    express multi-step logic the engine previously required DataFrame
    glue for. The script computes a corpus-derived threshold into a
    variable, branches on it, and the taken branch's SELECT is the
    script's result; the oracle is the equivalent single declarative
    query, proving the scripted form changes dialect, not semantics.

    Scale design: each script statement compiles to a normal Catalyst
    plan (the threshold subquery is one agg; the branch query is one
    filtered agg with the variable folded as a LITERAL — predicate
    pushdown works exactly as if hand-inlined)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "trireme_orders_script"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 0;
          SET thr = (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                        AS DOUBLE) / COUNT(*)
            FROM trireme_orders_script
          );
          IF thr > 100000 THEN
            SELECT o_orderpriority,
                   COUNT(*) AS n_above,
                   ROUND(thr, 6) AS threshold,
                   'high-value-era' AS regime
            FROM trireme_orders_script
            WHERE o_totalprice > thr
            GROUP BY o_orderpriority;
          ELSE
            SELECT o_orderpriority,
                   COUNT(*) AS n_above,
                   ROUND(thr, 6) AS threshold,
                   'low-value-era' AS regime
            FROM trireme_orders_script
            WHERE o_totalprice > thr
            GROUP BY o_orderpriority;
          END IF;
        END
        """
    )


# ---------------------------------------------------------------------------
# sql_filter_clause — FILTER (WHERE ...) aggregate modifiers
# ---------------------------------------------------------------------------

_FILTER_CLAUSE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_all,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT)
           AS n_big,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f,
       CAST(COUNT(DISTINCT o_custkey)
            FILTER (WHERE o_totalprice > 150000) AS BIGINT)
           AS big_customers
FROM orders GROUP BY o_orderpriority
"""


@register("sql_filter_clause", oracle=_FILTER_CLAUSE_ORACLE)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL:2003 ``FILTER (WHERE ...)`` aggregate modifier —
    conditional aggregation WITHOUT the CASE-WHEN contortion (and,
    unlike CASE, composable with COUNT(DISTINCT)): multiple differently
    filtered aggregates in ONE grouped pass. One more parser surface
    (alongside pipe syntax/scripting) lowering to the identical
    partial+final aggregate plan — the oracle runs the same FILTER
    text, proving cross-dialect agreement.

    Scale design: one keyed aggregation; every FILTER is a codegen'd
    predicate inside the aggregate — no extra scans, no joins."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "trireme_orders_filter"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f,
               COUNT(DISTINCT o_custkey)
                   FILTER (WHERE o_totalprice > 150000) AS big_customers
        FROM trireme_orders_filter GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# sql_lateral_view — Hive-compat LATERAL VIEW [OUTER] explode syntax
# ---------------------------------------------------------------------------

_LATERAL_VIEW_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN []
              ELSE string_split_regex(lower(text), '\\s+')[:5] END AS toks
  FROM documents
)
SELECT doc_id, unnest(toks) AS tok, 'inner' AS mode FROM d
UNION ALL
SELECT d.doc_id, i.tok, 'outer'
FROM d LEFT JOIN (SELECT doc_id, unnest(toks) AS tok FROM d) i
  ON i.doc_id = d.doc_id
"""


@register("sql_lateral_view", oracle=_LATERAL_VIEW_ORACLE)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-compat ``LATERAL VIEW explode`` — the table-generating-
    function syntax a decade of Hive/Spark SQL migrations carry, in
    BOTH variants: plain (empty arrays DROP the row) and OUTER (empty
    arrays keep the row with NULL) — the semantics difference that
    silently loses documents in a migration when someone "simplifies"
    OUTER away (%10 docs get an empty array planted to force the
    divergence). One more parser surface lowering to the same Generate
    operator as explode()/explode_outer().

    Scale design: Generate is a per-row fan-out under codegen; no
    shuffle."""
    d = table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
        )
        .otherwise(F.slice(F.split(F.lower("text"), r"\s+"), 1, 5))
        .alias("toks"),
    )
    planted.createOrReplaceTempView("trireme_lateral_docs")
    return spark.sql(
        """
        SELECT doc_id, tok, 'inner' AS mode
        FROM trireme_lateral_docs LATERAL VIEW explode(toks) t AS tok
        UNION ALL
        SELECT doc_id, tok, 'outer' AS mode
        FROM trireme_lateral_docs
        LATERAL VIEW OUTER explode(toks) t AS tok
        """
    )


# ---------------------------------------------------------------------------
# sql_not_in_null_trap — three-valued-logic anti-join semantics
# ---------------------------------------------------------------------------

_NOT_IN_ORACLE = """
WITH probe AS (
  SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 100 = 0
),
keys AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT 'not_in' AS mode, CAST(COUNT(*) AS BIGINT) AS n FROM probe
WHERE o_custkey NOT IN (SELECT k FROM keys)
UNION ALL
SELECT 'not_exists', CAST(COUNT(*) AS BIGINT) FROM probe p
WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = p.o_custkey)
UNION ALL
SELECT 'not_in_null_filtered', CAST(COUNT(*) AS BIGINT) FROM probe
WHERE o_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)
"""


@register("sql_not_in_null_trap", oracle=_NOT_IN_ORACLE)
def sql_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NULL three-valued-logic trap, pinned as a contract:
    with even ONE NULL in the subquery, ``NOT IN`` returns ZERO rows
    (x <> NULL is UNKNOWN, so nothing is provably "not in"), while
    ``NOT EXISTS`` with an equality correlate ignores NULLs and returns
    the real anti-join — the single most-reported wrong-results bug in
    SQL migrations, reproduced here with planted NULL keys and all
    three spellings side by side (the n=0 row IS the assertion). Both
    engines must agree exactly on all three counts.

    Scale design: NOT IN with a nullable subquery plans as a
    null-aware anti join (Spark: NAAJ broadcast); NOT EXISTS is a
    plain left-anti — same data, different operators, which is exactly
    why the semantics diverge."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_custkey"
    ).createOrReplaceTempView("trireme_notin_probe")
    c.where(F.col("c_custkey") % 3 == 0).select(
        F.when(F.col("c_custkey") % 50 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k")
    ).createOrReplaceTempView("trireme_notin_keys")
    return spark.sql(
        """
        SELECT 'not_in' AS mode, COUNT(*) AS n FROM trireme_notin_probe
        WHERE o_custkey NOT IN (SELECT k FROM trireme_notin_keys)
        UNION ALL
        SELECT 'not_exists', COUNT(*) FROM trireme_notin_probe p
        WHERE NOT EXISTS (SELECT 1 FROM trireme_notin_keys
                          WHERE k = p.o_custkey)
        UNION ALL
        SELECT 'not_in_null_filtered', COUNT(*) FROM trireme_notin_probe
        WHERE o_custkey NOT IN (SELECT k FROM trireme_notin_keys
                                WHERE k IS NOT NULL)
        """
    )
