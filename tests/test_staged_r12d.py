"""r12-staged keys, batch 4 — built and verified this round ahead of the
r12 registration (the post-428 cadence; SURVEY round-11 log). Four more
keys, parked UNregistered for the r12 flip:

  ts_pacf_durbin_levinson     — PACF via the unrolled DL recursion
  orders_chow_test            — structural-break F-test on the trend line
  agg_gini_split_gain         — CART split screening on a binary label
  orders_survival_nelson_aalen — cumulative hazard on the KM life table

Same contract set as tests/test_staged_r12.py: driver-style oracle parity
at the smoke AND grading scales, an independent recompute (pure python /
pandas — no Spark expressions, no DuckDB), a plan-shape pin, layout
invariance, and a registration-consistency guard that holds before AND
after the flip.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _GINI_SPLIT_ORACLE,
    _GINI_THRESHOLDS,
    agg_gini_split_gain,
)
from trireme_spark.queries.timeseries import (
    _CHOW_ORACLE,
    _CHOW_SPLIT,
    _KM_CHURN_GAP,
    _NA_ORACLE,
    _PACF_MAXLAG,
    _PACF_ORACLE,
    orders_chow_test,
    orders_survival_nelson_aalen,
    ts_pacf_durbin_levinson,
)

STAGED = {
    "ts_pacf_durbin_levinson": (ts_pacf_durbin_levinson, _PACF_ORACLE),
    "orders_chow_test": (orders_chow_test, _CHOW_ORACLE),
    "agg_gini_split_gain": (agg_gini_split_gain, _GINI_SPLIT_ORACLE),
    "orders_survival_nelson_aalen": (
        orders_survival_nelson_aalen,
        _NA_ORACLE,
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
    """Holds on both sides of the r12 flip: while staged the key must
    NOT be registered; once it registers, its oracle must be the staged
    constant and it must own a sweep slot."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


def _dec6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- ts_pacf_durbin_levinson ----------------------------------------------------


def test_pacf_python_recompute(spark):
    """Mirror the full quantization ladder in python (the ladder is part
    of the statistic's definition, as with spectral entropy), then run
    the TEXTBOOK Durbin-Levinson recursion — the generated SQL chain
    must agree with a plain loop implementation."""
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev["hidx"] = ev.ts.values.astype("datetime64[h]").astype("int64")
    got = ts_pacf_durbin_levinson(spark, SF_SMOKE).toPandas()
    for etype, sub in ev.groupby("event_type"):
        hourly = {}
        for r in sub.itertuples(index=False):
            hourly[int(r.hidx)] = hourly.get(int(r.hidx), Decimal(0)) + _dec6(
                r.value
            )
        series = {h: float(v) for h, v in hourly.items()}
        n = len(series)
        mu = float(sum(_dec6(v) for v in series.values())) / n
        sxx = float(sum(_dec6(v * v) for v in series.values()))
        sx = float(sum(_dec6(v) for v in series.values()))
        denom = sxx - sx * sx / n
        r_ = {}
        for k in range(1, _PACF_MAXLAG + 1):
            num = sum(
                math.floor((series[h] - mu) * (series[h + k] - mu) * 1e6)
                for h in series
                if h + k in series
            )
            r_[k] = math.floor(num / 1e6 / denom * 1e6) / 1e6

        def q(v):
            return math.floor(v * 1e9) / 1e9

        # textbook DL loop (not the generated closed form)
        phi = {(1, 1): q(r_[1])}
        for k in range(2, _PACF_MAXLAG + 1):
            num = r_[k] - sum(
                phi[(k - 1, j)] * r_[k - j] for j in range(1, k)
            )
            den = 1 - sum(phi[(k - 1, j)] * r_[j] for j in range(1, k))
            phi[(k, k)] = q(num / den)
            for j in range(1, k):
                phi[(k, j)] = q(
                    phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
                )
        sub_got = got[got.event_type == etype]
        assert len(sub_got) == _PACF_MAXLAG
        for r in sub_got.itertuples(index=False):
            assert (
                abs(float(r.pacf) - phi[(int(r.lag), int(r.lag))]) < 1e-8
            ), (etype, r.lag)


def test_pacf_plan_shape(spark):
    """Global stats and the 5-row lag spine broadcast onto the
    dimension-sized hourly series; the recursion is pure column algebra
    on a per-type row — no iteration, no UDF, no cartesian."""
    from tests.test_plans import plan

    p = plan(ts_pacf_durbin_levinson(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


# --- orders_chow_test -----------------------------------------------------------


def test_chow_python_recompute(spark):
    """First-principles Chow F from per-regime OLS fits (numpy lstsq
    residuals, NOT the sufficient-statistic algebra)."""
    import numpy as np

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o["x"] = (o.o_orderdate - pd.Timestamp("1990-01-01")).dt.days
    o["pre"] = o.o_orderdate < pd.Timestamp(_CHOW_SPLIT)
    daily = {}
    for r in o.itertuples(index=False):
        key = (int(r.x), bool(r.pre))
        daily[key] = daily.get(key, Decimal(0)) + _dec6(r.o_totalprice)

    def ssr(pts):
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        A = np.vstack([np.ones_like(x), x]).T
        res = np.linalg.lstsq(A, y, rcond=None)
        pred = A @ res[0]
        return float(((y - pred) ** 2).sum())

    all_pts = [(x, float(v)) for (x, _), v in daily.items()]
    a_pts = [(x, float(v)) for (x, p), v in daily.items() if p]
    b_pts = [(x, float(v)) for (x, p), v in daily.items() if not p]
    ssr_p, ssr_a, ssr_b = ssr(all_pts), ssr(a_pts), ssr(b_pts)
    f_ref = ((ssr_p - ssr_a - ssr_b) / 2) / (
        (ssr_a + ssr_b) / (len(a_pts) + len(b_pts) - 4)
    )
    got = orders_chow_test(spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_pre) == len(a_pts)
    assert int(row.n_post) == len(b_pts)
    assert abs(float(row.f_stat) - f_ref) < 1e-3
    assert abs(float(row.rmse_split) - math.sqrt(
        (ssr_a + ssr_b) / (len(a_pts) + len(b_pts) - 4)
    )) < 0.5
    assert bool(row.structural_break) == (float(row.f_stat) > 3.0)


def test_chow_plan_shape(spark):
    """Every sufficient statistic rides ONE corpus rollup — a single
    scan, no join; the F readout is column algebra on a 1-row frame."""
    from tests.test_plans import plan

    p = plan(orders_chow_test(spark, SF_SMOKE))
    assert "Join" not in p, p
    assert p.count("Location: InMemoryFileIndex") == 1, p


# --- agg_gini_split_gain --------------------------------------------------------


def test_gini_split_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    bad = (o.o_orderstatus == "F").astype(int)
    price = o.o_totalprice
    ref = {}
    gains = {}
    for t in _GINI_THRESHOLDS:
        L = price <= t
        nl, bl = int(L.sum()), int(bad[L].sum())
        nr, br = int((~L).sum()), int(bad[~L].sum())

        def g(b, n):
            p = b / n
            return 1.0 - p * p - (1 - p) * (1 - p)

        gain = (
            g(bl + br, nl + nr)
            - nl / (nl + nr) * g(bl, nl)
            - nr / (nl + nr) * g(br, nr)
        )
        ref[t] = (nl, nr, g(bl, nl), g(br, nr), gain)
        gains[t] = math.floor(gain * 1e9)
    best = max(_GINI_THRESHOLDS, key=lambda t: (gains[t], -t))
    got = agg_gini_split_gain(spark, SF_SMOKE).toPandas()
    assert len(got) == len(_GINI_THRESHOLDS)
    for r in got.itertuples(index=False):
        nl, nr, gl, gr, gain = ref[int(r.threshold)]
        assert (int(r.n_left), int(r.n_right)) == (nl, nr)
        assert abs(float(r.gini_left) - gl) < 2e-6
        assert abs(float(r.gini_right) - gr) < 2e-6
        assert abs(float(r.gain) - gain) < 2e-9
        assert bool(r.is_best) == (int(r.threshold) == best)


def test_gini_split_plan_shape(spark):
    """The candidate-split spine is bounded model state: broadcast
    nested-loop against 9 literal rows, ONE corpus scan, one map-side-
    combinable aggregation."""
    from tests.test_plans import plan

    p = plan(agg_gini_split_gain(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p, p
    assert p.count("Location: InMemoryFileIndex") == 1, p


# --- orders_survival_nelson_aalen -----------------------------------------------


def test_nelson_aalen_python_recompute(spark):
    """Re-derive the censored life table and accumulate d/n and d/n²
    with the same floor-quantized increments; cross-check the
    Fleming-Harrington survival stays BELOW-or-equal KM's survival
    pointwise is NOT generally true, so only the NA identities are
    asserted."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    life = o.groupby("o_custkey").o_orderdate.agg(["min", "max"])
    life["t"] = (life["max"] - life["min"]).dt.days
    snap = life["max"].max()
    life["event"] = (snap - life["max"]).dt.days > _KM_CHURN_GAP
    n0 = len(life)
    per_t = (
        life.groupby("t")
        .agg(d=("event", "sum"), leaving=("event", "size"))
        .sort_index()
    )
    got = (
        orders_survival_nelson_aalen(spark, SF_SMOKE)
        .toPandas()
        .sort_values("t")
    )
    seen = 0
    H_units = 0
    V_units = 0
    rows = iter(got.itertuples(index=False))
    for t, r in per_t.iterrows():
        n_at_risk = n0 - seen
        seen += int(r.leaving)
        if int(r.d) == 0:
            continue
        H_units += math.floor(int(r.d) / n_at_risk * 1e12)
        V_units += math.floor(int(r.d) / n_at_risk / n_at_risk * 1e12)
        row = next(rows)
        assert int(row.t) == int(t)
        assert int(row.d) == int(r.d)
        assert int(row.n_at_risk) == n_at_risk
        H = H_units / 1e12
        assert abs(float(row.cum_hazard) - H) < 2e-6
        assert abs(float(row.hazard_var) - V_units / 1e12) < 2e-9
        assert abs(float(row.fh_survival) - math.exp(-H)) < 2e-6
    assert next(rows, None) is None


def test_nelson_aalen_plan_shape(spark):
    """KM's shape: corpus collapses to one customer rollup; the
    cumulative windows run under meta_part specs on the dimension-sized
    time table."""
    from tests.test_plans import plan

    p = plan(orders_survival_nelson_aalen(spark, SF_SMOKE))
    assert "windowspecdefinition" in p, p
    assert "shiftright" in p, p  # meta_part partition spec survives


# --- layout invariance ----------------------------------------------------------


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
