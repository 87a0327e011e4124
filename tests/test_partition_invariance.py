"""Partition-layout invariance: results must not depend on HOW the data
is partitioned, only on the data.

Why this axis matters: session.prep() pins spark.sql.shuffle.partitions
to 32 for scheduler-overhead reasons, but deliberately tolerates
environments where that conf is immutable (the ``except`` path) — there,
every registered query runs at WHATEVER partition count the grading
driver's session carries. Likewise the scan side: a different
``spark.sql.files.maxPartitionBytes`` (or a real cluster's block layout)
changes how many splits a parquet scan produces and in what order rows
arrive at each task. A key whose result leans on partition count or
intra-partition arrival order — a limit without a total order, per-
partition RNG, a first()/collect-order survivor pick, a non-commutative
fold — is correct at the pinned layout and silently wrong elsewhere.
At 100 TB this is not hypothetical: the layout is whatever 1000
executors' input splits make it.

Each test computes the key once at the pinned layout, then re-runs it
under a HOSTILE layout — 7 shuffle partitions (odd, tiny, divides
nothing evenly), 64 KB scan splits (every fixture scan goes
multi-split), and prep()'s shuffle pin raising as an immutable-conf
environment would — and requires row-for-row identical results. The
key families chosen are the ones where layout sensitivity is the known
failure mode: sampling/splitting (hash-predicate determinism claim),
top-k/limit (total-order claim), survivor picks (keyed-window claim),
ordered collects, the salted two-phase aggregate (commutativity claim),
and greedy sequence packing (explicit-order claim).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from trireme_spark import registry

# The layout-sensitivity risk surface, keys per claimed-deterministic
# mechanism (all cheap at sf0.001):

pytestmark = pytest.mark.slow  # opt-in battery (r15): run with -m "" or -m slow

KEYS = [
    # hash-based sampling/splitting: per-row predicates, no RNG
    "sample_stratified",
    "sample_weighted",
    "sample_source_mixture",
    "sample_temperature_weights",
    "sample_reservoir_per_group",
    "sample_neyman_allocation",
    "split_train_holdout",
    "split_leakage_safe",
    "shuffle_deterministic",
    # top-k/limit: total orders with explicit tie-breaks
    "limit_topk",
    "win_topk_per_group",
    # survivor picks / ordered aggregation
    "dedup_exact",
    "dedup_doc_canonical",
    "agg_listagg_ordered",
    "agg_collect",
    # commutative two-phase aggregation under skew salting
    "agg_two_phase_skew",
    # sequence packing: greedy over an explicit order
    "pack_sequences",
    # stateful streaming folds (r8 VERDICT #7): shuffle-partition count
    # sets the state-store partition count on the REAL replays (t6/t13
    # run actual availableNow streams here, fresh checkpoint per call)
    # and could reorder per-group Arrow batches inside
    # applyInPandasWithState; the batch-equivalent session/dedup
    # builders claim keyed-window determinism. All must be pure
    # functions of the data.
    "stream_session",        # t3 — gaps-and-islands sessionization
    "stream_dedup",          # t5 — survivor pick over duplicated input
    "stream_stateful",       # t6 — applyInPandasWithState running counts
    "stream_watermark_late", # t4 — append-mode watermark finalization
    "stream_stateful_timeout",  # t13-class — stateful fold w/ timeouts
    # r14 post-closing rebuilds: each introduced a new claimed-
    # deterministic mechanism — the xxhash64 block-pair GEMM grouping +
    # staged-parquet re-read (dense pivot), the win-partition count
    # repeat detection, and the chord²-band prune + struct-min argmin.
    # All must be pure functions of the data, whatever the layout.
    "sim_sparse_cosine_tfidf",
    "text_dedup_repeated_spans",
    "geo_nearest_facility",
]


def _canon(df) -> list[str]:
    return sorted(repr(tuple(r)) for r in df.collect())


# Baseline rows at the pinned layout, computed once per key so the
# parametrized tests don't pay the query twice on reruns.
_BASELINE: dict[str, list[str]] = {}


def _baseline(spark, key) -> list[str]:
    if key not in _BASELINE:
        _BASELINE[key] = _canon(registry.QUERIES[key](spark, SF_SMOKE))
    return _BASELINE[key]


@pytest.mark.parametrize("key", KEYS)
def test_layout_invariance_rows_identical(spark, key, monkeypatch):
    base = _baseline(spark, key)  # pinned layout (prep() sets 32)

    from tests.conftest import hostile_layout

    hostile = hostile_layout(
        spark,
        monkeypatch,
        lambda: _canon(registry.QUERIES[key](spark, SF_SMOKE)),
    )

    assert hostile == base, (
        f"{key}: rows differ between the pinned layout and a hostile one "
        "(7 shuffle partitions, 64KB scan splits, immutable-conf prep "
        "path) — the result depends on partition layout, not just data"
    )
