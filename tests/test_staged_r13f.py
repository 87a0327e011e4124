"""r13-staged keys, batch 6 — parked UNregistered (r13 lot now 20, the
full cadence cap):

  ts_dickey_fuller_unit_root — the stationarity gate for the ts family
  agg_tail_dependence        — upper-tail co-occurrence of daily
                               volume and daily average value
  events_calibration_curve   — reliability diagram + Brier + ECE

Same contract set as the other staging files.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _TAIL_DEP_ORACLE,
    _TAIL_Q_PCT,
    agg_tail_dependence,
)
from trireme_spark.queries.timeseries import (
    _CAL_BINS,
    _CALIBRATION_ORACLE,
    _DF_CRIT,
    _DICKEY_FULLER_ORACLE,
    events_calibration_curve,
    ts_dickey_fuller_unit_root,
)

STAGED = {
    "ts_dickey_fuller_unit_root": (
        ts_dickey_fuller_unit_root,
        _DICKEY_FULLER_ORACLE,
    ),
    "agg_tail_dependence": (agg_tail_dependence, _TAIL_DEP_ORACLE),
    "events_calibration_curve": (
        events_calibration_curve,
        _CALIBRATION_ORACLE,
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


# --- ts_dickey_fuller_unit_root ---------------------------------------------------


def test_df_python_recompute(spark):
    """Textbook DF regression via numpy lstsq residuals — a genuinely
    different solver than the closed-form sufficient-statistic path."""
    import numpy as np

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    from decimal import ROUND_HALF_UP, Decimal

    monthly = {}
    for r in o.itertuples(index=False):
        ts = pd.Timestamp(r.o_orderdate)
        m = ts.year * 12 + ts.month
        monthly[m] = monthly.get(m, Decimal(0)) + Decimal(
            repr(float(r.o_totalprice))
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    dy, yl = [], []
    for m, y in monthly.items():
        if m - 1 in monthly:
            dy.append(float(y) - float(monthly[m - 1]))
            yl.append(float(monthly[m - 1]))
    n = len(dy)
    X = np.column_stack([np.ones(n), np.array(yl)])
    beta, *_ = np.linalg.lstsq(X, np.array(dy), rcond=None)
    resid = np.array(dy) - X @ beta
    ssr = float(resid @ resid)
    sxx = float(((np.array(yl) - np.mean(yl)) ** 2).sum())
    rho = beta[1]
    se = math.sqrt(ssr / (n - 2) / sxx)
    got = ts_dickey_fuller_unit_root(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_diffs) == n
    assert abs(float(got.rho_hat) - rho) < 1e-6
    assert abs(float(got.df_stat) - rho / se) < 1e-4
    assert bool(got.stationary) == (float(got.df_stat) < _DF_CRIT)
    assert not math.isnan(float(got.df_stat))


def test_df_plan_shape(spark):
    """One corpus rollup to the calendar-bounded monthly series, a
    keyed self-join over that bounded frame, a 1-row fold — the
    granger shape with one regressor."""
    from tests.test_plans import plan

    p = plan(ts_dickey_fuller_unit_root(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "HashAggregate" in p, p


# --- agg_tail_dependence ----------------------------------------------------------


def test_tail_python_recompute(spark):
    from decimal import ROUND_HALF_UP, Decimal

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    daily = {}
    for r in o.itertuples(index=False):
        dd = (pd.Timestamp(r.o_orderdate) - pd.Timestamp("1990-01-01")).days
        c = daily.setdefault(dd, [0, Decimal(0)])
        c[0] += 1
        c[1] += Decimal(repr(float(r.o_totalprice))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    n = len(daily)
    by_cnt = sorted(daily.items(), key=lambda kv: (-kv[1][0], kv[0]))
    by_avg = sorted(
        daily.items(), key=lambda kv: (-(float(kv[1][1]) / kv[1][0]), kv[0])
    )
    got = agg_tail_dependence(spark, SF_SMOKE).toPandas()
    assert len(got) == len(_TAIL_Q_PCT)
    for q in _TAIL_Q_PCT:
        k = (n * (100 - q)) // 100
        top_x = {dd for dd, _ in by_cnt[:k]}
        top_y = {dd for dd, _ in by_avg[:k]}
        m = len(top_x & top_y)
        row = got[got.q_pct == q].iloc[0]
        assert int(row.n_days) == n and int(row.k_tail) == k
        assert int(row.m_joint) == m
        assert abs(float(row.lambda_u) - m / k) < 2e-6
        assert abs(float(row.indep_baseline) - k / n) < 2e-6
        assert 0.0 <= float(row.lambda_u) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_tail_k_positive(sf_dir):
    """Pinned fixture assumption: the 95% tail keeps k >= 1 days, so
    lambda_u's denominator never vanishes."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    n = o["o_orderdate"].dt.floor("D").nunique()
    assert (n * 5) // 100 >= 1, n


def test_tail_plan_shape(spark):
    """The corpus is never windowed: ranks ride the calendar-bounded
    day frame (one rollup first); the q spine is a bounded broadcast."""
    from tests.test_plans import plan

    p = plan(agg_tail_dependence(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "windowspecdefinition" in p, p
    assert "CartesianProduct" not in p, p
    # the rollup precedes every window: the first (bottom-most) wide
    # operator over the scan is a HashAggregate, not a Window/Sort
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- events_calibration_curve -----------------------------------------------------


def test_calibration_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    users = {}
    for r in ev.itertuples(index=False):
        u = users.setdefault(int(r.user_id), [0, 0, 0])
        u[0] += 1
        u[1] += int(r.event_type == "click")
        u[2] += int(r.event_type == "purchase")
    bins = {}
    brier_pico = 0
    n = len(users)
    for tot, ck, pu in users.values():
        p = math.floor(ck / tot * 1e6) / 1e6
        y = int(5 * pu > tot)
        b = min(_CAL_BINS - 1, math.floor(p * _CAL_BINS))
        cell = bins.setdefault(b, [0, 0, 0])
        cell[0] += 1
        cell[1] += math.floor(p * 1e6)
        cell[2] += y
        brier_pico += math.floor((p - y) * (p - y) * 1e12)
    ece_micro = sum(
        math.floor(
            abs(pos / cnt - pm / 1e6 / cnt) * cnt * 1e6
        )
        for cnt, pm, pos in bins.values()
    )
    got = events_calibration_curve(spark, SF_SMOKE).toPandas()
    assert len(got) == len(bins)
    for b, (cnt, pm, pos) in bins.items():
        row = got[got.bin == b].iloc[0]
        assert int(row.n_users) == cnt
        assert abs(float(row.confidence) - pm / 1e6 / cnt) < 2e-6
        assert abs(float(row.accuracy) - pos / cnt) < 2e-6
        assert (
            abs(float(row.abs_gap) - abs(pos / cnt - pm / 1e6 / cnt))
            < 2e-6
        )
        assert abs(float(row.brier) - brier_pico / 1e12 / n) < 2e-6
        assert abs(float(row.ece) - ece_micro / 1e6 / n) < 2e-6
    # calibration sanity: Brier and ECE live in [0, 1]
    assert 0.0 <= float(got.brier.iloc[0]) <= 1.0
    assert 0.0 <= float(got.ece.iloc[0]) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_calibration_outcome_varies(sf_dir):
    """Pinned fixture assumption: the heavy-purchaser label has BOTH
    classes (the PSM every-user-purchases lesson — bare presence was
    degenerate, the 20%-share threshold is not)."""
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    g = ev.groupby("user_id")["event_type"].agg(
        n="size", pu=lambda s: int((s == "purchase").sum())
    )
    y = (5 * g.pu > g.n).astype(int)
    assert 0 < int(y.sum()) < len(y), y.value_counts()


def test_calibration_plan_shape(spark):
    """One corpus scan to user grain, one bin-cell aggregation, then
    windows over the bounded bin frame — Brier/ECE ride the same
    rollup (no second pass)."""
    from tests.test_plans import plan

    p = plan(events_calibration_curve(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "windowspecdefinition" in p, p
    assert "Join" not in p, p
