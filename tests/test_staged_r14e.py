"""r14-staged keys, batch 5 — parked UNregistered (r14 lot now 16):

  orders_gumbel_return_level — block-maxima Gumbel fit + T=100 return
                               level (the EVT complement of Hill's
                               peaks-over-threshold tail index)
  events_uplift_qini         — Qini/uplift gains curve over fixed-width
                               score bands (the targeting referee)
  ts_conformal_interval_eval — split-conformal interval + empirical
                               coverage (the uncertainty referee)

Same contract set as the other staging files: driver-style oracle
parity at the smoke AND grading scales, an independent recompute (pure
python / pandas / numpy — no Spark expressions, no DuckDB), a
plan-shape pin, layout invariance, fixture-assumption pins, and a
registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.timeseries import (
    _CONF_ALPHA,
    _CONF_LAG,
    _CONFORMAL_ORACLE,
    _GUMBEL_EULER,
    _GUMBEL_ORACLE,
    _GUMBEL_T,
    _QINI_BANDS,
    _QINI_ORACLE,
    _QINI_SALT,
    events_uplift_qini,
    orders_gumbel_return_level,
    ts_conformal_interval_eval,
)

STAGED = {
    "orders_gumbel_return_level": (
        orders_gumbel_return_level,
        _GUMBEL_ORACLE,
    ),
    "events_uplift_qini": (events_uplift_qini, _QINI_ORACLE),
    "ts_conformal_interval_eval": (
        ts_conformal_interval_eval,
        _CONFORMAL_ORACLE,
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


# --- orders_gumbel_return_level ---------------------------------------------------


def test_gumbel_numpy_recompute(spark):
    """Method-of-moments Gumbel in numpy (pandas groupby max, ddof=1
    std) — a different summation path than the decimal bridge."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    m = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    bm = o.groupby(m)["o_totalprice"].max().to_numpy()
    beta = bm.std(ddof=1) * math.sqrt(6) / math.pi
    mu = bm.mean() - _GUMBEL_EULER * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / _GUMBEL_T))
    p_rec = 1 - math.exp(-math.exp(-(bm.max() - mu) / beta))
    got = orders_gumbel_return_level(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_blocks) == len(bm)
    # bracket indexing: "loc" collides with the pandas .loc accessor
    assert abs(float(got["loc"]) - mu) < 1e-4
    assert abs(float(got["scale"]) - beta) < 1e-4
    assert abs(float(got.return_level_100) - rl) < 1e-3
    assert abs(float(got.max_observed) - bm.max()) < 2e-6
    assert abs(float(got.exceed_prob_record) - p_rec) < 1e-6
    # the T=100 return level sits above the fitted location by
    # beta*ln(...) construction and the record probability is a prob
    assert float(got.return_level_100) > float(got["loc"])
    assert 0.0 <= float(got.exceed_prob_record) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_gumbel_fixture_assumptions(sf_dir):
    """≥ 2 blocks with non-degenerate spread — β's denominator (n−1)
    and the sd itself never vanish."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    bm = o.groupby(m)["o_totalprice"].max()
    assert len(bm) >= 2
    assert bm.std(ddof=1) > 0


def test_gumbel_plan_shape(spark):
    """ONE scan, a bounded monthly-max rollup, scalar 1-row algebra —
    no join, no window, no Python."""
    from tests.test_plans import plan

    p = plan(orders_gumbel_return_level(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p


# --- events_uplift_qini -----------------------------------------------------------


def _qini_users(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    g = ev.groupby("user_id")["event_type"]
    u = pd.DataFrame(
        {
            "clicks": g.apply(lambda s: int((s == "click").sum())),
            "purch": g.apply(lambda s: int((s == "purchase").sum())),
            "n": g.size(),
        }
    )
    u["score"] = np.floor(u.clicks / u.n * 1e6) / 1e6
    u["y"] = (5 * u.purch > u.n).astype(int)
    u["arm"] = [
        int(hashlib.md5(f"{uid}{_QINI_SALT}".encode()).hexdigest()[:8], 16)
        % 2
        for uid in u.index
    ]
    u["band"] = np.minimum(
        _QINI_BANDS - 1, np.floor(u.score * _QINI_BANDS).astype(int)
    )
    return u


def test_qini_python_recompute(spark):
    """Pure-python md5 arm split + band cumulation from the top score
    band down; per-row equality on the counts, tolerance on ratios."""
    u = _qini_users(SF_SMOKE)
    got = (
        events_uplift_qini(spark, SF_SMOKE)
        .toPandas()
        .sort_values("band", ascending=False)
        .reset_index(drop=True)
    )
    cn_t = cn_c = cr_t = cr_c = 0
    for i, band in enumerate(sorted(u.band.unique(), reverse=True)):
        cell = u[u.band == band]
        cn_t += int((cell.arm == 1).sum())
        cn_c += int((cell.arm == 0).sum())
        cr_t += int(cell[cell.arm == 1].y.sum())
        cr_c += int(cell[cell.arm == 0].y.sum())
        row = got.iloc[i]
        assert int(row.band) == band
        assert int(row.cum_n_treat) == cn_t
        assert int(row.cum_n_ctrl) == cn_c
        assert int(row.cum_r_treat) == cr_t
        assert int(row.cum_r_ctrl) == cr_c
        assert (
            abs(float(row.qini_value) - (cr_t - cr_c * cn_t / cn_c)) < 1e-5
        )
        assert (
            abs(float(row.uplift_at_depth) - (cr_t / cn_t - cr_c / cn_c))
            < 2e-6
        )


def test_qini_null_experiment_reads_small(spark):
    """The hash split carries NO real treatment, so the full-depth
    uplift (the ATE row, band = min) must be small relative to the
    base rate — the curve's null calibration IS the referee check."""
    got = events_uplift_qini(spark, SF_FULL).toPandas()
    full = got.loc[got.band.idxmin()]
    base = full.cum_r_treat / full.cum_n_treat
    assert abs(float(full.uplift_at_depth)) < max(0.1, 0.5 * base)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_qini_fixture_assumptions(sf_dir):
    """Every cumulative depth has both arms populated (the qini ratio's
    denominators never vanish) — asserted on the hash arms directly."""
    u = _qini_users(sf_dir)
    top_band = int(u.band.max())
    top = u[u.band == top_band]
    assert (top.arm == 1).any() and (top.arm == 0).any()


def test_qini_plan_shape(spark):
    """One corpus pass to user grain, a 10-cell aggregation, cumulative
    windows over the bounded band frame — rollup precedes every window,
    no join at all."""
    from tests.test_plans import plan

    p = plan(events_uplift_qini(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- ts_conformal_interval_eval ---------------------------------------------------


def _daily_values(sf_dir: str) -> pd.Series:
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    # mirror the decimal bridge: per-row half-up to 6dp, exact sum
    from decimal import ROUND_HALF_UP, Decimal

    day = pd.to_datetime(ev.ts).dt.floor("D")
    vals = ev.value.map(
        lambda v: Decimal(repr(float(v))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    return (
        pd.DataFrame({"day": day, "v": vals})
        .groupby("day")["v"]
        .sum()
        .sort_index()
        .map(float)
    )


def test_conformal_python_recompute(spark):
    """First-principles split conformal in pandas: shift-7 forecast,
    time-ordered 2/3 split, sorted-residual order statistic, test
    coverage count."""
    y = _daily_values(SF_SMOKE)
    r = (y - y.shift(_CONF_LAG)).abs().dropna()
    n = len(r)
    n_cal = (n * 2) // 3
    cal, test = r.iloc[:n_cal], r.iloc[n_cal:]
    k = min(math.ceil((n_cal + 1) * (1 - _CONF_ALPHA)), n_cal)
    q = sorted(cal)[k - 1]
    covered = int((test <= q).sum())
    got = ts_conformal_interval_eval(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_cal) == n_cal
    assert int(got.k_rank) == math.ceil((n_cal + 1) * (1 - _CONF_ALPHA))
    assert int(got.n_test) == len(test)
    assert int(got.n_covered) == covered
    assert abs(float(got.q_hat) - q) < 2e-6
    assert abs(float(got.coverage) - covered / len(test)) < 2e-6
    assert (
        abs(
            float(got.coverage_gap)
            - (covered / len(test) - (1 - _CONF_ALPHA))
        )
        < 2e-6
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_conformal_fixture_assumptions(sf_dir):
    """Pinned fixture assumptions: the daily event spine is DENSE
    (row-lag == calendar-lag for the shift-7 forecaster), and the
    calibration/test split leaves both sides non-empty with
    k ≤ n_cal (the LEAST guard never binds)."""
    ev = pd.read_parquet(sf_dir + "/events.parquet", columns=["ts"])
    d = pd.to_datetime(ev.ts).dt.floor("D")
    n_days = d.nunique()
    assert n_days == (d.max() - d.min()).days + 1  # dense
    n = n_days - _CONF_LAG
    n_cal = (n * 2) // 3
    assert n_cal >= 1 and n - n_cal >= 1
    assert math.ceil((n_cal + 1) * (1 - _CONF_ALPHA)) <= n_cal


def test_conformal_plan_shape(spark):
    """ONE corpus scan (the cached bounded residual frame feeds both
    the rank leg and the coverage fold); no cartesian beyond the 1-row
    q̂ attach."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_conformal_interval_eval(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
