"""r16-staged keys, batch 3 — parked UNregistered (r16 lot now 13):

  orders_theil_u2_forecast       — RMSE(lag-7)/RMSE(lag-1) referee
                                   beside MASE
  ts_cointegration_engle_granger — two-step EG: OLS spread, DF walk on
                                   the residual, the pinned −3.37 bar
  ts_forecast_theta_method       — M3-winning trend+SES(α=.5) combo,
                                   exact power-of-two SES weights
  events_brier_decomposition     — Murphy's REL−RES+UNC triage of the
                                   calibration key's Brier
  orders_zero_inflation_score    — van den Broek ZIP-vs-Poisson score
                                   test on the quarter count panel

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
from trireme_spark.queries.timeseries import (
    _BRIER_BINS,
    _BRIER_DECOMP_ORACLE,
    _EG_CRIT,
    _EG_ORACLE,
    _THETA_ALPHA,
    _THETA_ORACLE,
    _U2_ORACLE,
    _ZIP_CHI2_CRIT,
    _ZIP_ORACLE,
    _ZIP_YEAR,
    events_brier_decomposition,
    orders_theil_u2_forecast,
    orders_zero_inflation_score,
    ts_cointegration_engle_granger,
    ts_forecast_theta_method,
)

STAGED = {
    "orders_theil_u2_forecast": (orders_theil_u2_forecast, _U2_ORACLE),
    "ts_cointegration_engle_granger": (
        ts_cointegration_engle_granger,
        _EG_ORACLE,
    ),
    "ts_forecast_theta_method": (ts_forecast_theta_method, _THETA_ORACLE),
    "events_brier_decomposition": (
        events_brier_decomposition,
        _BRIER_DECOMP_ORACLE,
    ),
    "orders_zero_inflation_score": (
        orders_zero_inflation_score,
        _ZIP_ORACLE,
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


# --- shared frames -----------------------------------------------------------


def _q6(x) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _daily(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    o["day"] = o.o_orderdate.dt.floor("D")
    d = o.groupby("day").agg(
        rev=("o_totalprice", lambda s: float(sum(_q6(v) for v in s))),
        cnt=("o_totalprice", "size"),
    )
    return d.sort_index()


# --- orders_theil_u2_forecast ---------------------------------------------------


def test_u2_python_recompute(spark):
    d = _daily(SF_SMOKE)
    mu = float(sum(_q6(v) for v in d.rev)) / len(d)
    x = (d.rev / mu).tolist()
    n = s77 = s11 = 0.0
    cnt = 0
    for i in range(7, len(x)):
        cnt += 1
        s77 += (x[i] - x[i - 7]) ** 2
        s11 += (x[i] - x[i - 1]) ** 2
    got = orders_theil_u2_forecast(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_days_scored) == cnt
    assert abs(float(got.theil_u2) - math.sqrt(s77 / s11)) < 2e-6
    assert abs(float(got.rmse_model) - math.sqrt(s77 / cnt) * mu) < 1e-3
    assert abs(float(got.rmse_naive) - math.sqrt(s11 / cnt) * mu) < 1e-3
    assert bool(got.model_beats_naive) == (float(got.theil_u2) < 1)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_u2_fixture_assumptions(sf_dir):
    """≥ 50 scored days and a nonzero naive error at both scales."""
    d = _daily(sf_dir)
    assert len(d) >= 57
    x = d.rev.tolist()
    assert any(x[i] != x[i - 1] for i in range(1, len(x)))


def test_u2_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(orders_theil_u2_forecast(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p
    # both lags ride ONE window pass
    assert p.count("Window") <= 2, p


# --- ts_cointegration_engle_granger ----------------------------------------------


def _eg_recompute(sf_dir: str):
    d = _daily(sf_dir)
    my = float(sum(_q6(v) for v in d.rev)) / len(d)
    mx = d.cnt.sum() / len(d)
    a = (d.rev / my).to_numpy()
    b = (d.cnt / mx).to_numpy()
    n = float(len(d))
    sa, sb = a.sum(), b.sum()
    beta = (n * (a * b).sum() - sb * sa) / (n * (b * b).sum() - sb * sb)
    alpha = (sa - beta * sb) / n
    e = a - alpha - beta * b
    el, de = e[:-1], np.diff(e)
    see, sed, sdd = (el * el).sum(), (el * de).sum(), (de * de).sum()
    rho = sed / see
    tau = rho / math.sqrt(((sdd - sed * sed / see) / (len(el) - 1)) / see)
    return len(d), beta, tau


def test_eg_python_recompute(spark):
    n, beta, tau = _eg_recompute(SF_SMOKE)
    got = ts_cointegration_engle_granger(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_days) == n
    assert abs(float(got.beta_rel) - beta) < 1e-5
    assert abs(float(got.eg_tau) - tau) < 1e-4
    assert bool(got.cointegrated) == (float(got.eg_tau) < _EG_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_eg_fixture_assumptions(sf_dir):
    """The regression is non-degenerate (order count varies) and the
    residual walk has ≥ 100 steps at both scales."""
    d = _daily(sf_dir)
    assert d.cnt.nunique() > 1
    assert len(d) >= 100


def test_eg_revenue_volume_cointegrate(spark):
    """Daily revenue IS volume-driven on the fixture — the referee must
    find the pair cointegrated at the grading scale (a strongly
    stationary residual: both series share the order-arrival trend)."""
    got = (
        ts_cointegration_engle_granger(spark, SF_FULL).toPandas().iloc[0]
    )
    assert bool(got.cointegrated)
    assert float(got.beta_rel) > 0


def test_eg_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(ts_cointegration_engle_granger(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p


# --- ts_forecast_theta_method -----------------------------------------------------


def test_theta_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o["m"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    monthly = (
        o.groupby("m")
        .o_totalprice.agg(lambda s: float(sum(_q6(v) for v in s)))
        .sort_index()
    )
    mu = float(sum(_q6(v) for v in monthly)) / len(monthly)
    x = (monthly / mu).tolist()
    n = len(x)
    t = np.arange(1, n + 1, dtype=float)
    xa = np.array(x)
    st, sx = t.sum(), xa.sum()
    b = (n * (t * xa).sum() - st * sx) / (n * (t * t).sum() - st * st)
    a = (sx - b * st) / n
    z = 2 * xa - (a + b * t)
    # SES(alpha) with L_1 = z_1, unrolled to geometric weights
    level = z[0] * (1 - _THETA_ALPHA) ** (n - 1) + sum(
        _THETA_ALPHA * (1 - _THETA_ALPHA) ** (n - i - 1) * z[i]
        for i in range(1, n)
    )
    fc = (a + b * (n + 1) + level) / 2 * mu
    got = ts_forecast_theta_method(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months) == n
    assert abs(float(got.trend_slope_rel) - b) < 1e-5
    assert abs(float(got.ses_level) - level * mu) < 1e-2
    assert abs(float(got.theta_forecast) - fc) < 1e-2


def test_theta_ses_recursion_equals_weights(spark):
    """The unrolled geometric weights ARE the SES recursion: iterate
    L_t = αz_t + (1−α)L_{t−1} in python and match the engine's fold."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o["m"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    monthly = (
        o.groupby("m")
        .o_totalprice.agg(lambda s: float(sum(_q6(v) for v in s)))
        .sort_index()
    )
    mu = float(sum(_q6(v) for v in monthly)) / len(monthly)
    x = (monthly / mu).to_numpy()
    n = len(x)
    t = np.arange(1, n + 1, dtype=float)
    st, sx = t.sum(), x.sum()
    b = (n * (t * x).sum() - st * sx) / (n * (t * t).sum() - st * st)
    a = (sx - b * st) / n
    z = 2 * x - (a + b * t)
    level = z[0]
    for i in range(1, n):
        level = _THETA_ALPHA * z[i] + (1 - _THETA_ALPHA) * level
    got = ts_forecast_theta_method(spark, SF_SMOKE).toPandas().iloc[0]
    assert abs(float(got.ses_level) - level * mu) < 1e-2


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_theta_fixture_assumptions(sf_dir):
    """Enough months that the oldest SES weight underflows the pico
    quantum IDENTICALLY in both engines (n ≥ 45 ⇒ 0.5ⁿ⁻¹ < 1e-13) and
    the trend fit is non-degenerate."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    assert m.nunique() >= 45
    assert m.nunique() == 80  # the fixed fixture span both scales


def test_theta_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(ts_forecast_theta_method(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p


# --- events_brier_decomposition -----------------------------------------------------


def _brier_recompute(sf_dir: str):
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    u = ev.groupby("user_id").agg(
        n=("event_type", "size"),
        clicks=("event_type", lambda s: int((s == "click").sum())),
        purch=("event_type", lambda s: int((s == "purchase").sum())),
    )
    p = (u.clicks / u.n * 1e6).apply(math.floor) / 1e6
    y = (5 * u.purch > u.n).astype(int)
    bins = (p * _BRIER_BINS).apply(math.floor).clip(upper=_BRIER_BINS - 1)
    n = len(u)
    ybar = y.sum() / n
    brier = float(((p - y) ** 2).sum()) / n
    rel = res = 0.0
    used = 0
    for _, idx in pd.Series(range(n), index=bins.values).groupby(level=0):
        used += 1
        pb = p.iloc[idx.values]
        yb = y.iloc[idx.values]
        nb = len(pb)
        rel += nb * (pb.mean() - yb.mean()) ** 2 / n
        res += nb * (yb.mean() - ybar) ** 2 / n
    unc = ybar * (1 - ybar)
    return n, used, brier, rel, res, unc, p, y, bins


def test_brier_python_recompute(spark):
    n, used, brier, rel, res, unc, _, _, _ = _brier_recompute(SF_SMOKE)
    got = events_brier_decomposition(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_users) == n
    assert int(got.n_bins_used) == used
    assert abs(float(got.brier) - brier) < 2e-6
    assert abs(float(got.reliability) - rel) < 2e-6
    assert abs(float(got.resolution) - res) < 2e-6
    assert abs(float(got.uncertainty) - unc) < 2e-6
    assert abs(float(got.brier_skill_score) - (1 - brier / unc)) < 1e-5


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_brier_murphy_identity(sf_dir):
    """REL − RES + UNC equals the BINNED-forecast Brier exactly, and
    the raw Brier differs from it by within-bin variance minus twice
    the within-bin p,y covariance (the generalized / Stephenson-et-al
    decomposition) — verified term by term on the fixture."""
    n, _, brier, rel, res, unc, p, y, bins = _brier_recompute(sf_dir)
    within_var = within_cov = 0.0
    binned_brier = 0.0
    df = pd.DataFrame({"p": p.values, "y": y.values, "b": bins.values})
    for _, sub in df.groupby("b"):
        pb = sub.p.mean()
        within_var += float(((sub.p - pb) ** 2).sum()) / n
        within_cov += float(((sub.p - pb) * sub.y).sum()) / n
        binned_brier += float(((pb - sub.y) ** 2).sum()) / n
    assert abs((rel - res + unc) - binned_brier) < 1e-9
    assert abs((brier - binned_brier) - (within_var - 2 * within_cov)) < 1e-9
    assert within_var >= 0


def test_brier_matches_calibration_key(spark):
    """The raw Brier agrees with events_calibration_curve's brier
    column — same forecast, same outcome, two implementations."""
    from trireme_spark.queries.timeseries import events_calibration_curve

    cal = events_calibration_curve(spark, SF_SMOKE).toPandas()
    got = events_brier_decomposition(spark, SF_SMOKE).toPandas().iloc[0]
    assert abs(float(got.brier) - float(cal.brier.iloc[0])) < 2e-6


def test_brier_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_brier_decomposition(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "windowspecdefinition" not in p, p


# --- orders_zero_inflation_score ------------------------------------------------------


def _zip_recompute(sf_dir: str):
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    custs = o.o_custkey.unique()
    oy = o[o.o_orderdate.dt.year == _ZIP_YEAR]
    cnt = oy.groupby(
        [oy.o_custkey, oy.o_orderdate.dt.quarter]
    ).size()
    n = len(custs) * 4
    sy = int(cnt.sum())
    n0 = n - cnt[cnt > 0].count()
    lam = sy / n
    p0 = math.exp(-lam)
    s = (n0 - n * p0) ** 2 / (n * p0 * (1 - p0) - n * lam * p0 * p0)
    return n, int(n0), lam, p0, s


def test_zip_python_recompute(spark):
    n, n0, lam, p0, s = _zip_recompute(SF_SMOKE)
    got = orders_zero_inflation_score(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_cells) == n
    assert int(got.n_zero) == n0
    assert abs(float(got.lambda_hat) - lam) < 2e-6
    assert abs(float(got.p0_poisson) - p0) < 2e-6
    assert abs(float(got.score_stat) - s) < 1e-4
    assert bool(got.zero_inflated) == (
        float(got.score_stat) > _ZIP_CHI2_CRIT
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_zip_fixture_assumptions(sf_dir):
    """Zeros exist but don't saturate (0.3 < n0/n < 0.9) and the score
    denominator is strictly positive at both scales."""
    n, n0, lam, p0, _ = _zip_recompute(sf_dir)
    assert 0.3 < n0 / n < 0.9
    assert n * p0 * (1 - p0) - n * lam * p0 * p0 > 0


def test_zip_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(orders_zero_inflation_score(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "CartesianProduct" not in p, p
