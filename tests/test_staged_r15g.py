"""r15-staged keys, batch 7 — parked UNregistered (r15 lot now 18):

  orders_expected_shortfall — 95% VaR + CVaR tail-risk pair (exact
                              integer-rank tail, never a percentile)
  events_spc_p_chart        — Shewhart p-chart with variable-n limits
                              (the attribute-SPC member)
  ts_arch_lm_test           — Engle's volatility-clustering gate
                              (closed-form 2-lag auxiliary OLS)

Same contract set as the other staging files.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.timeseries import (
    _ARCH_CRIT,
    _ARCH_LAGS,
    _ARCH_ORACLE,
    _ES_ORACLE,
    _ES_Q_PCT,
    _PCHART_ORACLE,
    _PCHART_SIGMA,
    events_spc_p_chart,
    orders_expected_shortfall,
    ts_arch_lm_test,
)

STAGED = {
    "orders_expected_shortfall": (
        orders_expected_shortfall,
        _ES_ORACLE,
    ),
    "events_spc_p_chart": (events_spc_p_chart, _PCHART_ORACLE),
    "ts_arch_lm_test": (ts_arch_lm_test, _ARCH_ORACLE),
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


# --- orders_expected_shortfall ----------------------------------------------------


def _daily_revenue(sf_dir: str) -> pd.Series:
    from decimal import ROUND_HALF_UP, Decimal

    o = pd.read_parquet(sf_dir + "/orders.parquet")
    day = o.o_orderdate.dt.floor("D")
    v = o.o_totalprice.map(
        lambda x: Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    return (
        pd.DataFrame({"day": day, "v": v})
        .groupby("day")["v"]
        .sum()
        .map(float)
    )


def test_es_python_recompute(spark):
    y = _daily_revenue(SF_SMOKE)
    n = len(y)
    k = max(1, n * _ES_Q_PCT // 100)
    tail = sorted(y)[:k]
    got = orders_expected_shortfall(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_days) == n and int(got.k_tail) == k
    assert abs(float(got.var_95) - tail[-1]) < 2e-6
    assert abs(float(got.es_95) - sum(tail) / k) < 1e-4
    # coherence: the tail mean cannot exceed its own maximum
    assert float(got.es_95) <= float(got.var_95) + 1e-9


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_es_fixture_assumptions(sf_dir):
    """k ≥ 1 (the GREATEST guard binds only below 20 days) and the
    tail is a strict subset."""
    y = _daily_revenue(sf_dir)
    k = max(1, len(y) * _ES_Q_PCT // 100)
    assert 1 <= k < len(y)


def test_es_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(orders_expected_shortfall(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- events_spc_p_chart -----------------------------------------------------------


def test_pchart_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.floor("D")
    d = ev.groupby("day").agg(
        n=("event_type", "size"),
        x=("event_type", lambda s: int((s == "error").sum())),
    )
    pbar = d.x.sum() / d.n.sum()
    got = (
        events_spc_p_chart(spark, SF_SMOKE)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    viol = 0
    for i, (day, row) in enumerate(d.sort_index().iterrows()):
        sig = math.sqrt(pbar * (1 - pbar) / row.n)
        p_day = int(row.x / row.n * 1e6) / 1e6
        ucl = int(min(1.0, pbar + _PCHART_SIGMA * sig) * 1e6) / 1e6
        lcl = int(max(0.0, pbar - _PCHART_SIGMA * sig) * 1e6) / 1e6
        g = got.iloc[i]
        assert g.day == day.strftime("%Y-%m-%d")
        assert int(g.n) == row.n and int(g.x) == row.x
        assert abs(float(g.p_day) - p_day) < 2e-6
        assert abs(float(g.ucl) - ucl) < 2e-6
        assert abs(float(g.lcl) - lcl) < 2e-6
        ooc = p_day > float(g.ucl) or p_day < float(g.lcl)
        assert bool(g.out_of_control) == ooc
        viol += int(ooc)
    assert (got.n_violations == viol).all()


def test_pchart_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_spc_p_chart(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- ts_arch_lm_test --------------------------------------------------------------


def test_arch_numpy_lstsq_recompute(spark):
    """The auxiliary regression solved by numpy lstsq — a genuinely
    different solver than the closed-form determinant algebra."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()
    r = np.diff(np.log(y))
    u = (r - r.mean()) ** 2
    Y = u[_ARCH_LAGS:]
    X = np.column_stack(
        [np.ones(len(Y))]
        + [u[_ARCH_LAGS - l : -l] for l in range(1, _ARCH_LAGS + 1)]
    )
    beta, *_ = np.linalg.lstsq(X, Y, rcond=None)
    resid = Y - X @ beta
    r2 = 1 - float(resid @ resid) / float(((Y - Y.mean()) ** 2).sum())
    lm = len(Y) * r2
    got = ts_arch_lm_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_obs) == len(Y)
    assert abs(float(got.r_squared) - r2) < 1e-4
    assert abs(float(got.lm_stat) - lm) < 1e-2
    assert bool(got.arch_effects) == (float(got.lm_stat) > _ARCH_CRIT)
    assert 0.0 <= float(got.r_squared) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_arch_fixture_assumptions(sf_dir):
    """Non-degenerate design: the lag matrix has full rank (det of the
    centered normal equations > 0) and the shocks vary."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()
    r = np.diff(np.log(y))
    u = (r - r.mean()) ** 2
    v1, v2 = u[1:-1], u[:-2]
    c11 = float(((v1 - v1.mean()) ** 2).sum())
    c22 = float(((v2 - v2.mean()) ** 2).sum())
    c12 = float(((v1 - v1.mean()) * (v2 - v2.mean())).sum())
    assert c11 * c22 - c12 * c12 > 0
    assert u.var() > 0


def test_arch_plan_shape(spark):
    """One corpus scan (cached monthly frame); every window and fold
    runs over the bounded frame."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_arch_lm_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
