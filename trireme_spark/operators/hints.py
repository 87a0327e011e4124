"""Size-gated join hints.

An unconditional ``F.broadcast`` on a corpus-derived table is the one
join-strategy decision that CANNOT be left static: at fixture scale it is
measurably faster (AQE declines to auto-broadcast array-heavy tables whose
row-count stats undersell their width), but the broadcast state grows
O(corpus) and OOMs an executor somewhere past the point where the table
stops fitting — the exact 100 TB anti-pattern the r5 review flagged on the
near-dup verify joins.

``broadcast_if_small`` makes the decision from Catalyst's own plan-size
estimate, which propagates from the file scan and therefore grows linearly
with the corpus: under the threshold the hint applies (small-corpus fast
path, same plan the bench measured); over it the join falls back to a plain
shuffle equi-join on the pair keys — measured scale-positive in the r4 A/B
(dedup_minhash_clusters 87 s -> 41 s at duplicate-stress scale) — while AQE
remains free to runtime-broadcast if the actual shuffle turns out small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default gate: comfortably inside a 300 MB driver/executor broadcast
# budget after the ~2-4x row-object inflation relative to the on-disk
# estimate. Overridable per call site.
BROADCAST_GATE_BYTES = 64 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for ``df`` (bytes).

    File-relation leaves report real on-disk size; projections/filters
    scale it; joins/aggregates multiply estimates upward. Conservative
    failure mode: if the estimate is unavailable, return a huge number so
    the caller declines to broadcast.
    """
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(stats.sizeInBytes()))
    except Exception:
        return 1 << 62


def broadcast_if_small(
    df: DataFrame, limit_bytes: int = BROADCAST_GATE_BYTES
) -> DataFrame:
    """Apply ``F.broadcast`` only when the plan-size estimate fits."""
    if plan_size_bytes(df) <= limit_bytes:
        return F.broadcast(df)
    return df


def cache_once(df: DataFrame) -> DataFrame:
    """``.cache()`` unless an identical plan is already in the cache.

    Repeated invocations of the same registered query (the bench's n-run
    loop, a driver re-sweep) rebuild identical logical plans; a plain
    ``.cache()`` then logs ``CacheManager: Asked to cache already cached
    data`` on every run after the first. Looking the plan up first keeps
    the log byte-clean and the cache semantics identical.
    """
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        if cm.lookupCachedData(df._jdf).isDefined():
            return df
    except Exception:
        pass
    return df.cache()
