"""Iterative graph operators — connected components for dedup clustering.

After near-dup pair detection, a corpus build needs the transitive closure
of "is a duplicate of" to pick one canonical document per group; pairs
alone over-delete (A~B, B~C must keep exactly one of {A,B,C}, not two
survivors of two independent pair decisions).

Algorithm: min-label propagation. Every node starts as its own component;
each round, every node adopts the smallest label among itself and its
neighbors; fixpoint in O(max component diameter) rounds. Each round is two
keyed shuffles (join on dst, groupBy src) — fully distributed, no driver
state beyond the converged? flag. For 100 TB graphs with high-diameter
components, the published upgrade is the large-star/small-star rewrite
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14),
which contracts in O(log²) rounds with the same join/agg primitives;
near-dup graphs are low-diameter in practice, so propagation is the right
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) where component = min node id reachable from id.

    ``edges`` may be directed input; it's symmetrized here so components
    are of the undirected graph. Isolated nodes keep their own id.

    Each iteration materializes (cache + count) so the plan doesn't grow a
    per-round lineage chain — the count doubles as the convergence check
    (# of nodes whose label shrank), so the action is not wasted work.
    """
    sym = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).unionByName(
        edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    )
    # localCheckpoint, not cache(): each round's plan references the
    # previous round's frame TWICE (the neighbor join and the merge), so
    # under cache() the LOGICAL plan doubles per round — analysis cost
    # grows 2^rounds and OOMs the driver near round ~7 on any
    # high-diameter graph (observed on the DBSCAN eps-graph; the
    # low-diameter dedup graphs converged before the wall). Checkpoint
    # truncates lineage so every round plans against a leaf. At cluster
    # scale prefer a reliable checkpoint dir (localCheckpoint loses
    # partitions with a dead executor); the shape is identical.
    cc = nodes.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("comp")
    ).localCheckpoint(eager=True)
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            sym.join(cc, sym["d"] == cc["v"])
            .groupBy("s")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        step = cc.join(nbr_min, cc["v"] == nbr_min["s"], "left").select(
            "v",
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
            (F.col("nbr_comp") < F.col("comp")).alias("_shrank"),
        )
        # pointer jumping (path compression): also adopt the label OF the
        # current label — min-label propagation alone needs O(diameter)
        # rounds; the extra keyed join shortcuts long chains to
        # O(log diameter). Correctness is unchanged: a label is always
        # the id of some node in the same component, and least() is
        # monotone, so the fixpoint (= component min) is identical.
        lk = step.select(
            F.col("v").alias("lv"), F.col("comp").alias("lcomp")
        )
        nxt = (
            step.join(lk, step["comp"] == lk["lv"], "left")
            .select(
                "v",
                F.least(
                    F.col("comp"), F.coalesce("lcomp", F.col("comp"))
                ).alias("comp"),
                (
                    F.col("_shrank")
                    | (F.col("lcomp") < F.col("comp"))
                ).alias("_shrank"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where(F.col("_shrank")).count()
        cc = nxt.select("v", "comp")
        if changed == 0:
            break
    if changed != 0:
        # Propagation needs O(component diameter) rounds; silently
        # returning unconverged labels would mis-cluster. A graph that
        # trips this wants the large-star/small-star contraction (see
        # module docstring), not a bigger max_iter.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still shrinking) — component diameter "
            "exceeds the propagation budget"
        )
    return cc.select(F.col("v").alias(id_col), F.col("comp").alias("component"))


def kcore(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core of an undirected graph via iterative peeling: repeatedly
    delete every node of degree < k (degrees recomputed after each
    deletion wave) until stable; what survives is the unique maximal
    subgraph of minimum degree >= k — the standard cohesion filter
    (spam/bot subnetwork mining, community seeding, nucleus of the
    copurchase graph).

    ``edges`` is one row per undirected edge (src < dst). Returns
    (node, core_deg) for surviving nodes, core_deg = degree INSIDE the
    core.

    Scale design: each round is a keyed degree aggregation plus two
    semi-joins of the edge list against surviving nodes — fully keyed
    shuffles, no driver state beyond the survivor count; rounds are
    bounded by the degeneracy ordering depth (loud RuntimeError on
    budget exhaustion, never a silent partial answer). localCheckpoint
    per round truncates the growing lineage exactly like the
    connected-components loop above.
    """
    adj = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("nbr")
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("node"), F.col(src_col).alias("nbr")
        )
    ).localCheckpoint(eager=True)
    n_prev = adj.select("node").distinct().count()
    for _ in range(max_rounds):
        deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("node")
        n_now = keep.count()
        if n_now == 0:
            return keep.withColumn("core_deg", F.lit(0).cast("long"))
        if n_now == n_prev:
            return (
                adj.groupBy("node")
                .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
            )
        adj = (
            adj.join(keep, "node", "left_semi")
            .join(
                keep.select(F.col("node").alias("nbr")), "nbr", "left_semi"
            )
            .localCheckpoint(eager=True)
        )
        n_prev = n_now
    raise RuntimeError(
        f"kcore: no fixpoint within {max_rounds} rounds (k={k})"
    )
