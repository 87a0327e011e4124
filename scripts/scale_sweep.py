"""10× scale verification: execute EVERY registered key's Spark side at
sf0.1 (10× the driver's oracle scale) through the noop sink and flag
stragglers.

This is the sweep that catches plans which are correct-but-quadratic —
they pass the sf0.01 oracle gate and then blow up at scale (it found the
O(n²) UnboundedFollowing frame and the O(n·frame) global sliding RANGE
frame in round 2). Run it after adding any operator:

    python scripts/scale_sweep.py            # default /root/testdata/sf0.1
    SCALE_SWEEP_SF=/root/testdata/sf0.01 python scripts/scale_sweep.py

Exits nonzero if any key fails or exceeds the per-key budget.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

BUDGET_S = float(os.environ.get("SCALE_SWEEP_BUDGET_S", "10"))
SF_DIR = os.environ.get("SCALE_SWEEP_SF", "/root/testdata/sf0.1")

# Multi-stage composite / iterative / real-streaming keys get 3× budget:
# their COLD cost at sf0.1 is legitimately 15-30 s (measured round 4 —
# iterative label propagation, the 5-stage corpus pipeline, 4-trigger
# micro-batch replays, per-group Arrow transfer). The r3 sweep hid this
# behind warm caches filled by earlier keys in the old sweep order; a
# quadratic blowup would still blow through 3× (the round-2 catches were
# minutes over budget, not seconds).
HEAVY_3X = {
    "embed_pca_project",
    # round-5: iterative graph (transition-matrix cache fill + 3 chained
    # join/agg rounds), the order-keyed self-join, and the bigram-LM
    # triple-consumer explode are all legitimately multi-stage cold
    "graph_pagerank_copurchase",
    "graph_triangle_count",
    "cluster_dbscan_grid",
    "lineitem_market_basket",
    "text_bigram_logprob",
    "orders_cohort_ltv",
    "sim_sparse_cosine_tfidf",
    "sim_ann_ivf",
    "sim_ann_ivfpq",
    # full-graph GEMM + both-direction candidate emit + keyed top-k
    # window: measured 10.0 s cold at sf0.1
    "sim_knn_graph_all",
    "dedup_minhash_clusters",
    "dedup_connected_components",
    "dedup_ngram_jaccard",
    # asymmetric prefix candidates + two verify joins over staged
    # shingle tables: 11.9 s cold at sf0.1
    "dedup_containment",
    # bounded-frame pandas UDAF re-materializes the frame per row
    # through Arrow by design (SURVEY x11 cost-honesty note): measured
    # 11.9 s cold / 6.3 s warm at sf0.1 in isolation on the r7 host —
    # sits on the 1× budget boundary; a quadratic regression would
    # still blow through 3×
    "udaf_pandas_window",
    "etl_training_corpus",
    "doc_fingerprint",
    "stream_stateful",
    # 6-trigger replay (4 data files + 2 sentinel watermark-drivers),
    # per-batch state-store commit overhead dominates cold
    "stream_stateful_timeout",
    "stream_watermark_late",
    "stream_foreachbatch_sink",
    "stream_static_join",
    # r14 follow-up: 4-trigger replay with complete-mode state re-emit —
    # the same per-batch state-store machinery class as its siblings
    # above; measured 7-8 s idle / 10.5 s under host contention at
    # sf0.1 (it rode the 1× boundary and flagged spuriously once)
    "stream_complete_mode",
    "udtf_grouped_map",
    # opt r14: Python DataSource machinery, not data work — the first
    # execution in a session spawns the Python planner/reader/committer
    # workers (each a fresh interpreter importing pyspark); measured
    # 9.8 s / 8.4 s cold in sweep context vs ~1 s warm for the same
    # 8000-row scan / 500-row sink. They rode the 1× budget boundary
    # exactly like stream_complete_mode did; same honest
    # reclassification, budgets themselves unchanged.
    "source_python_datasource",
    "sink_python_datasource",
    # opt r14: same iterative-machinery class as their tier siblings —
    # modularity embeds the full distributed-CC label propagation
    # (pointer jumping + localCheckpoint rounds, like
    # dedup_connected_components) and HITS runs 5 chained agg+join
    # half-steps (like graph_pagerank_copurchase). Measured 17.4 s /
    # 9.5 s COLD-ISOLATED in a fresh session at sf0.1 — they only sat
    # under the 1× budget in sweep context because earlier keys had
    # warmed the shared copurchase subtrees; a sweep-order rotation
    # would flag them spuriously.
    "graph_modularity_score",
    "graph_bipartite_hits",
    # opt r14: runs the FULL knn_graph_topk GEMM (the identical
    # machinery sim_knn_graph_all's standing entry documents at ~10 s
    # cold) plus the vote window on top; measured 13.7 s cold-isolated.
    # It sat under the 1× budget only when earlier sim-family keys had
    # warmed the Arrow/python-worker path — the r14 sweep order flagged
    # it at 12.7 s.
    "embed_knn_label_eval",
}

# sim_sparse_cosine_tfidf graduated OUT of the former 10× tier (r14
# follow-up): the adaptive dense pivot (≤1024 surviving terms → int64
# block-pair GEMM, bit-identical numbers) replaced the 43 M-row term
# fan-out the old 100 s budget existed for — measured 34.9 s → ~5 s in
# sweep context / ≤11.4 s cold-isolated at sf0.1. It now rides the 3×
# tier via its standing HEAVY_3X entry (staged-parquet materialization
# + GEMM + the genuine 12 M real dot cells), a 100 s → 30 s RATCHET
# TIGHTENING; a regression to the quadratic term join (lost truncation,
# broken gate) trips it again.
HEAVY_10X = set()

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    .config("spark.sql.shuffle.partitions", "32")
    # the 1g JVM default can't hold the full registry's worth of anything; size the
    # heap like get_spark() does so OOMs here mean plan problems, not
    # harness problems
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e  # noqa: E402

qs = e.queries()
t0 = time.time()
slow, fails, timed = [], [], []
for k, fn in qs.items():
    # NOTE: caches deliberately persist across keys — identical cached
    # subtrees (the shingle-set scan every dedup key shares) hit the same
    # cache entry, exactly like a long-lived production session. The 8g
    # heap above is what keeps the full registry's worth of them from OOMing; the
    # sweep-order rotation must not change which keys pass the budget.
    t1 = time.time()
    try:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    except Exception as ex:  # noqa: BLE001 - report and continue the sweep
        fails.append((k, f"{type(ex).__name__}: {str(ex)[:200]}"))
        continue
    dt = time.time() - t1
    timed.append((dt, k))
    budget = BUDGET_S * (
        10 if k in HEAVY_10X else 3 if k in HEAVY_3X else 1
    )
    if dt > budget:
        slow.append((k, round(dt, 1), budget))

print(f"TOTAL {time.time() - t0:.1f}s for {len(qs)} keys at {SF_DIR}")
# near-budget telemetry: the next capture-inlining-class regression
# shows up here as a creeping cold time long before it breaches budget
for dt, k in sorted(timed, reverse=True)[:10]:
    print(f"TOP {k}: {dt:.1f}s")
for k, msg in fails:
    print(f"FAIL {k}: {msg}")
for k, dt, budget in slow:
    print(f"SLOW {k}: {dt}s (budget {budget}s)")
if not fails and not slow:
    print("SCALE-SWEEP OK")
sys.exit(1 if (fails or slow) else 0)
