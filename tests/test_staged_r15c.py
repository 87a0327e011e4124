"""r15-staged keys, batch 3 — parked UNregistered (r15 lot now 9):

  graph_clustering_coefficient — global transitivity + mean local CC
                                 over the co-purchase graph, per-node
                                 triangle counts riding the SAME
                                 degree-oriented enumeration as
                                 graph_triangle_count

Same contract set as the other staging files.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.joins import (
    _CC_ORACLE,
    graph_clustering_coefficient,
)

STAGED = {
    "graph_clustering_coefficient": (
        graph_clustering_coefficient,
        _CC_ORACLE,
    ),
}


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_oracle_parity_smoke(spark, key):
    fn, oracle = STAGED[key]
    assert_matches_oracle(fn(spark, SF_SMOKE), oracle, SF_SMOKE)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_oracle_parity_grading_scale(spark, key):
    fn, oracle = STAGED[key]
    assert_matches_oracle(fn(spark, SF_FULL), oracle, SF_FULL)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_registration_consistency(key):
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_layout_invariance(spark, key, monkeypatch):
    from tests.conftest import hostile_layout

    fn, _ = STAGED[key]

    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    base = canon(fn(spark, SF_SMOKE))
    hostile = hostile_layout(
        spark, monkeypatch, lambda: canon(fn(spark, SF_SMOKE))
    )
    assert hostile == base, key


def _graph(sf_dir: str):
    li = pd.read_parquet(
        sf_dir + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pair_count = defaultdict(int)
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g.l_partkey.astype(int)))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_count[(parts[i], parts[j])] += 1
    edges = {p for p, c in pair_count.items() if c >= 2}
    adj = defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    return edges, adj


def test_cc_python_recompute(spark):
    """Brute-force per-node triangle counts + textbook local CC on the
    adjacency sets — no orientation trick anywhere."""
    edges, adj = _graph(SF_SMOKE)
    t = defaultdict(int)
    n_tri = 0
    for x, y in edges:  # x < y by construction
        common = adj[x] & adj[y]
        # each triangle {x<y<z} is counted exactly once: at its
        # lowest edge (x, y) with the apex z above both
        for z in common:
            if z > y:
                n_tri += 1
                t[x] += 1
                t[y] += 1
                t[z] += 1
    n_wedges = sum(
        len(adj[v]) * (len(adj[v]) - 1) // 2 for v in adj
    )
    deg2 = [v for v in adj if len(adj[v]) >= 2]
    local = [
        t[v] / (len(adj[v]) * (len(adj[v]) - 1) / 2) for v in deg2
    ]
    got = (
        graph_clustering_coefficient(spark, SF_SMOKE).toPandas().iloc[0]
    )
    assert int(got.n_nodes) == len(adj)
    assert int(got.n_edges) == len(edges)
    assert int(got.n_triangles) == n_tri
    assert int(got.n_deg_ge2) == len(deg2)
    assert abs(float(got.transitivity) - 3 * n_tri / n_wedges) < 2e-6
    assert (
        abs(float(got.mean_local_cc) - sum(local) / len(local)) < 1e-5
    )
    # transitivity and mean local CC are both ratios in [0, 1]
    assert 0.0 <= float(got.transitivity) <= 1.0
    assert 0.0 <= float(got.mean_local_cc) <= 1.0


def test_cc_consistent_with_triangle_count_key(spark):
    """The per-node enumeration must total to EXACTLY the registered
    triangle key's count (same graph, same orientation guarantee)."""
    tri = (
        registry.QUERIES["graph_triangle_count"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
    )
    cc = (
        graph_clustering_coefficient(spark, SF_SMOKE).toPandas().iloc[0]
    )
    assert int(cc.n_triangles) == int(tri.n_triangles)
    assert int(cc.n_edges) == int(tri.n_edges)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_cc_fixture_assumptions(sf_dir):
    """At least one node with degree ≥ 2 (the mean-local denominator)
    and at least one triangle (the readouts are non-degenerate)."""
    edges, adj = _graph(sf_dir)
    assert any(len(adj[v]) >= 2 for v in adj)
    found = False
    for x, y in edges:
        if adj[x] & adj[y]:
            found = True
            break
    assert found


def test_cc_plan_shape(spark):
    """The triangle key's shape: staged edge parquet (one scratch
    write, multiple consumers), keyed joins only — no cartesian, no
    corpus-grain window, no Python."""
    from tests.test_plans import plan

    p = plan(graph_clustering_coefficient(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
