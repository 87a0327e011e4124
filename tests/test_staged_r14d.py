"""r14-staged keys, batch 4 — parked UNregistered (r14 lot now 13):

  orders_logrank_test          — two-sample log-rank on customer survival
                                 (the survival family's TEST: KM curve +
                                 Nelson-Aalen hazard now have inference)
  ts_kpss_stationarity         — KPSS level-stationarity, the complement
                                 of the Dickey-Fuller unit-root gate
  orders_jarque_bera_normality — one-pass moment normality referee for
                                 the parametric inference family

Same contract set as the other staging files: driver-style oracle
parity at the smoke AND grading scales, an independent recompute (pure
python / pandas / numpy — no Spark expressions, no DuckDB), a
plan-shape pin, layout invariance, fixture-assumption pins, and a
registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _JB_CRIT,
    _JB_ORACLE,
    orders_jarque_bera_normality,
)
from trireme_spark.queries.timeseries import (
    _KM_CHURN_GAP,
    _KPSS_CRIT,
    _KPSS_LAGS,
    _KPSS_ORACLE,
    _LOGRANK_CRIT,
    _LOGRANK_ORACLE,
    _LOGRANK_SEG,
    orders_logrank_test,
    ts_kpss_stationarity,
)

STAGED = {
    "orders_logrank_test": (orders_logrank_test, _LOGRANK_ORACLE),
    "ts_kpss_stationarity": (ts_kpss_stationarity, _KPSS_ORACLE),
    "orders_jarque_bera_normality": (
        orders_jarque_bera_normality,
        _JB_ORACLE,
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


# --- orders_logrank_test ----------------------------------------------------------


def _lifetimes(sf_dir: str) -> pd.DataFrame:
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    c = pd.read_parquet(sf_dir + "/customer.parquet")
    o["d"] = o["o_orderdate"].dt.floor("D")
    life = o.groupby("o_custkey").agg(
        first=("d", "min"), last=("d", "max")
    )
    life["t"] = (life["last"] - life["first"]).dt.days
    snap = life["last"].max()
    life["event"] = (snap - life["last"]).dt.days > _KM_CHURN_GAP
    life = life.merge(
        c[["c_custkey", "c_mktsegment"]],
        left_index=True,
        right_on="c_custkey",
    )
    life["g1"] = life["c_mktsegment"] == _LOGRANK_SEG
    return life


def test_logrank_python_recompute(spark):
    """First-principles risk-set walk in pure python: maintain the two
    at-risk counts, accumulate O−E and the hypergeometric variance at
    every pooled event time — no quantization, no decimal sums, a
    genuinely different summation path."""
    life = _lifetimes(SF_SMOKE)
    n1 = int(life["g1"].sum())
    n2 = int((~life["g1"]).sum())
    oe = v = 0.0
    d_treat = d_ctrl = 0
    for t in sorted(life["t"].unique()):
        at_t = life[life["t"] == t]
        d1 = int((at_t["g1"] & at_t["event"]).sum())
        d2 = int((~at_t["g1"] & at_t["event"]).sum())
        dt, nt = d1 + d2, n1 + n2
        if dt > 0:
            oe += d1 - dt * n1 / nt
            if nt > 1:
                v += dt * (n1 / nt) * (n2 / nt) * (nt - dt) / (nt - 1)
            d_treat += d1
            d_ctrl += d2
        n1 -= int(at_t["g1"].sum())
        n2 -= int((~at_t["g1"]).sum())
    got = orders_logrank_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_treat) == int(life["g1"].sum())
    assert int(got.n_ctrl) == int((~life["g1"]).sum())
    assert int(got.d_treat) == d_treat
    assert int(got.d_ctrl) == d_ctrl
    assert abs(float(got.o_minus_e) - oe) < 1e-5
    assert abs(float(got.var_sum) - v) < 1e-5
    assert abs(float(got.logrank_chi2) - oe * oe / v) < 1e-4
    assert bool(got.significant) == (
        float(got.logrank_chi2) > _LOGRANK_CRIT
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_logrank_fixture_assumptions(sf_dir):
    """Both arms populated and at least one pooled death — χ²'s
    denominator cannot vanish; and censoring is REAL on the fixture
    (some customers are silent ≤ 90 days at snapshot), so the test is
    exercising the thing that distinguishes it from a t-test."""
    life = _lifetimes(sf_dir)
    assert life["g1"].sum() > 0 and (~life["g1"]).sum() > 0
    assert life["event"].sum() > 0
    assert (~life["event"]).sum() > 0  # censored customers exist


def test_logrank_plan_shape(spark):
    """One corpus rollup to customer grain (cached — orders and
    customer each scan ONCE; the uncached fan-out re-scanned orders
    4×), one customer-keyed dim join, windows only over the bounded
    event-time frame (rollup precedes every window)."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(orders_logrank_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- ts_kpss_stationarity ---------------------------------------------------------


def _monthly_revenue(sf_dir: str) -> np.ndarray:
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    return (
        o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()
    )


def test_kpss_numpy_recompute(spark):
    """Textbook KPSS in numpy — raw-unit residuals (no ybar
    normalization), np.cumsum, float lag products: a genuinely
    different arithmetic path that must land within quantization of
    the scale-free production form."""
    y = _monthly_revenue(SF_SMOKE)
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    g = [float((e[l:] * e[: n - l]).sum()) / n for l in range(_KPSS_LAGS + 1)]
    lrv = g[0] + 2 * sum(
        (1 - l / (_KPSS_LAGS + 1)) * g[l] for l in range(1, _KPSS_LAGS + 1)
    )
    eta = float((s * s).sum()) / (n * n) / lrv
    got = ts_kpss_stationarity(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months) == n
    assert abs(float(got.kpss_eta) - eta) < 1e-5
    assert bool(got.level_stationary) == (float(got.kpss_eta) < _KPSS_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_kpss_fixture_assumptions(sf_dir):
    """Pinned fixture assumptions: (a) the Bartlett truncation
    L = ⌊4(n/100)^¼⌋ equals the module constant for the fixture's
    calendar span; (b) the monthly series is DENSE (row-lag ==
    calendar-lag), which the lag products rely on."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = (o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month).unique()
    n = len(m)
    assert math.floor(4 * (n / 100) ** 0.25) == _KPSS_LAGS, n
    assert n == int(m.max()) - int(m.min()) + 1  # dense months


def test_kpss_plan_shape(spark):
    """ONE corpus scan (the monthly rollup, cached for its two
    consumers); every window runs over the bounded monthly frame —
    rollup precedes every window."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_kpss_stationarity(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- orders_jarque_bera_normality -------------------------------------------------


def test_jb_numpy_recompute(spark):
    """Two-pass CENTERED moments in numpy (the production form expands
    raw moments binomially — different cancellation path entirely)."""
    x = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        "o_totalprice"
    ].to_numpy()
    n = len(x)
    d = x - x.mean()
    m2 = float((d**2).mean())
    skew = float((d**3).mean()) / m2**1.5
    exkurt = float((d**4).mean()) / m2**2 - 3
    jb = n / 6 * (skew**2 + exkurt**2 / 4)
    got = orders_jarque_bera_normality(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_orders) == n
    assert abs(float(got.skewness) - skew) < 1e-6
    assert abs(float(got.excess_kurtosis) - exkurt) < 1e-6
    assert abs(float(got.jb_stat) - jb) < 1e-3
    assert bool(got.normal) == (float(got.jb_stat) <= _JB_CRIT)


def test_jb_moment_magnitudes_fit_the_wide_lane():
    """The DECIMAL(38,6) widening is sized for price⁴ at the grading
    scale: per-term < 1e32 headroom and the corpus sum stays well
    inside it (the reason DSCALE=DECIMAL(27,6) could not be used)."""
    x = pd.read_parquet(SF_FULL + "/orders.parquet")["o_totalprice"]
    assert float((x**4).max()) < 1e32
    assert float((x.astype("float64") ** 4).sum()) < 1e32
    # and x^4 genuinely overflows the narrow lane
    assert float((x**4).max()) > 10**21


def test_jb_plan_shape(spark):
    """ONE scan, ONE map-side-combinable aggregate, no join, no window,
    no Python."""
    from tests.test_plans import plan

    p = plan(orders_jarque_bera_normality(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p
