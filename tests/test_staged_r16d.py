"""r16-staged keys, batch 4 — parked UNregistered (r16 lot now 16):

  agg_icc_oneway          — ICC(1) variance partitioning over months +
                            the one-way F against F(79, ∞)
  agg_bhattacharyya_distance — histogram-overlap divergence (BC,
                            Bhattacharyya D, Hellinger)
  agg_jonckheere_terpstra — ordered k-sample trend as the sum of the
                            10 pairwise MWU counts on the exact ladder

Same contract set as the other staging files.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _BHAT_BINS,
    _BHAT_ORACLE,
    _BHAT_WIDTH,
    _ICC_F_CRIT,
    _ICC_ORACLE,
    _JT_ORACLE,
    _JT_Z_CRIT,
    agg_bhattacharyya_distance,
    agg_icc_oneway,
    agg_jonckheere_terpstra,
)

STAGED = {
    "agg_icc_oneway": (agg_icc_oneway, _ICC_ORACLE),
    "agg_bhattacharyya_distance": (
        agg_bhattacharyya_distance,
        _BHAT_ORACLE,
    ),
    "agg_jonckheere_terpstra": (agg_jonckheere_terpstra, _JT_ORACLE),
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


def _q6(x) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- agg_icc_oneway ------------------------------------------------------------


def test_icc_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    mu = float(sum(_q6(v) for v in o.o_totalprice)) / len(o)
    o["m"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    ssw = ssb = 0.0
    ns, sxs = [], []
    for _, sub in o.groupby("m"):
        x = [float(v) / mu for v in sub.o_totalprice]
        n = len(x)
        sx = float(sum(_q6(v) for v in x))
        qx = float(sum(_q6(v * v) for v in x))
        ssw += qx - sx * sx / n
        ns.append(n)
        sxs.append(sx)
    nt, g = float(sum(ns)), len(ns)
    gm = sum(sxs) / nt
    ssb = sum(n * (sx / n - gm) ** 2 for n, sx in zip(ns, sxs))
    msb, msw = ssb / (g - 1), ssw / (nt - g)
    k0 = (nt - sum(n * n for n in ns) / nt) / (g - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    got = agg_icc_oneway(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == int(nt)
    assert int(got.n_groups) == g
    assert abs(float(got.k0) - k0) < 1e-4
    assert abs(float(got.icc1) - icc) < 1e-5
    assert abs(float(got.f_stat) - msb / msw) < 1e-4
    assert bool(got.significant) == (float(got.f_stat) > _ICC_F_CRIT)


def test_icc_near_zero_on_fixture(spark):
    """Order values don't cluster by month on the fixture — the
    calibrated-zero readout (|ICC| < 0.05) is the point of the
    referee."""
    got = agg_icc_oneway(spark, SF_FULL).toPandas().iloc[0]
    assert abs(float(got.icc1)) < 0.05


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_icc_fixture_assumptions(sf_dir):
    """80 months at both scales (the pinned F(79, ∞) df), every month
    non-empty (a singleton month is fine — it contributes zero
    within-group sum-of-squares, not a 0/0)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    assert m.nunique() == 80
    assert m.value_counts().min() >= 1


def test_icc_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_icc_oneway(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "SortMergeJoin" not in p, p


# --- agg_bhattacharyya_distance ---------------------------------------------------


def _bhat_recompute(sf_dir: str):
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    bins = (
        (o.o_totalprice / _BHAT_WIDTH)
        .apply(math.floor)
        .clip(upper=_BHAT_BINS - 1)
    )
    wknd = o.o_orderdate.dt.dayofweek.isin([5, 6])
    cw = bins[wknd].value_counts()
    cd = bins[~wknd].value_counts()
    nw, nd = int(wknd.sum()), int((~wknd).sum())
    used = bins.nunique()
    bc = sum(
        math.sqrt(
            (cw.get(b, 0) / nw) * (cd.get(b, 0) / nd)
        )
        for b in bins.unique()
    )
    return nw, nd, used, bc


def test_bhat_python_recompute(spark):
    nw, nd, used, bc = _bhat_recompute(SF_SMOKE)
    got = agg_bhattacharyya_distance(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_weekend) == nw
    assert int(got.n_weekday) == nd
    assert int(got.n_bins_used) == used
    assert abs(float(got.bc_coefficient) - bc) < 2e-6
    assert abs(float(got.bhattacharyya_d) - (-math.log(bc))) < 2e-6
    assert abs(float(got.hellinger) - math.sqrt(1 - bc)) < 2e-6


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_bhat_fixture_assumptions_and_bounds(sf_dir):
    """Both marginals populated, BC ∈ (0, 1], and near 1 on the
    fixture (weekend pricing is NOT different — the honest overlap
    readout); ≥ 15 of the 20 bins used."""
    nw, nd, used, bc = _bhat_recompute(sf_dir)
    assert nw > 100 and nd > 100
    assert used >= 15
    assert 0 < bc <= 1 + 1e-12
    assert bc > 0.95


def test_bhat_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_bhattacharyya_distance(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "SortMergeJoin" not in p, p


# --- agg_jonckheere_terpstra ----------------------------------------------------


def _jt_recompute(sf_dir: str):
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(np.int64)
    gi = o.o_orderpriority.str[0].astype(int)
    groups = {
        i: np.sort(cents[gi == i].to_numpy()) for i in sorted(gi.unique())
    }
    jt = 0.0
    keys = sorted(groups)
    for ai in range(len(keys)):
        for bj in range(ai + 1, len(keys)):
            a, b = groups[keys[ai]], groups[keys[bj]]
            lo = np.searchsorted(a, b, side="left")
            hi = np.searchsorted(a, b, side="right")
            jt += lo.sum() + 0.5 * (hi - lo).sum()
    ns = np.array([len(groups[k]) for k in keys], dtype=float)
    nt = ns.sum()
    mu = (nt * nt - (ns * ns).sum()) / 4
    t = pd.Series(cents).value_counts().to_numpy().astype(float)
    a_term = (
        nt * (nt - 1) * (2 * nt + 5)
        - (ns * (ns - 1) * (2 * ns + 5)).sum()
        - (t * (t - 1) * (2 * t + 5)).sum()
    )
    b_term = (ns * (ns - 1) * (ns - 2)).sum() * (
        t * (t - 1) * (t - 2)
    ).sum()
    c_term = (ns * (ns - 1)).sum() * (t * (t - 1)).sum()
    var = (
        a_term / 72
        + b_term / (36 * nt * (nt - 1) * (nt - 2))
        + c_term / (8 * nt * (nt - 1))
    )
    z = (jt - mu) / math.sqrt(var)
    return int(nt), len(keys), jt, z


def test_jt_python_recompute(spark):
    nt, k, jt, z = _jt_recompute(SF_SMOKE)
    got = agg_jonckheere_terpstra(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == nt
    assert int(got.n_groups) == k
    assert float(got.jt_stat) == jt
    assert abs(float(got.z_stat) - z) < 2e-6
    assert bool(got.significant) == (abs(float(got.z_stat)) > _JT_Z_CRIT)


def test_jt_equals_sum_of_pairwise_mwu(spark):
    """JT is BY DEFINITION the sum of the 10 pairwise U statistics —
    recompute each U from pandas midranks (a different route than the
    ladder) and match the engine's JT exactly."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(np.int64)
    gi = o.o_orderpriority.str[0].astype(int)
    keys = sorted(gi.unique())
    jt = 0.0
    for ai in range(len(keys)):
        for bj in range(ai + 1, len(keys)):
            a = cents[gi == keys[ai]]
            b = cents[gi == keys[bj]]
            both = pd.concat([a, b])
            ranks = both.rank(method="average")
            r2 = ranks.iloc[len(a):].sum()
            n1, n2 = len(a), len(b)
            jt += r2 - n2 * (n2 + 1) / 2  # U_ij = R_j - n_j(n_j+1)/2
    got = agg_jonckheere_terpstra(spark, SF_SMOKE).toPandas().iloc[0]
    assert abs(float(got.jt_stat) - jt) < 1e-6


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_jt_fixture_assumptions(sf_dir):
    """All five ordered priorities populated (≥ 30 each) at both
    scales."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    counts = o.o_orderpriority.str[0].astype(int).value_counts()
    assert sorted(counts.index) == [1, 2, 3, 4, 5]
    assert counts.min() >= 30


def test_jt_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_jonckheere_terpstra(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p
    # one ladder window over the distinct-value frame
    assert p.count("Window") <= 2, p
