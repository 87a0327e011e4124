"""r14-staged keys, batch 6 — parked UNregistered (r14 lot now 20, the
full cadence cap):

  geo_point_in_polygon  — ray-casting geofence over planted coordinates
  agg_cronbach_alpha    — internal-consistency reliability of the
                          (month × priority) revenue panel
  ts_sample_entropy     — SampEn(m=2, r=0.2σ) regularity of the monthly
                          series (time-domain complement of spectral
                          entropy)
  events_sequential_sprt — Wald SPRT walk on the daily purchase rate
                          (the sequential member of the inference
                          family)

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
    _CRONBACH_K,
    _CRONBACH_ORACLE,
    agg_cronbach_alpha,
)
from trireme_spark.queries.geo import (
    _KNUTH,
    _M31,
    _M32,
    _PIP_ORACLE,
    _PIP_POLY,
    geo_point_in_polygon,
)
from trireme_spark.queries.timeseries import (
    _SAMPEN_ORACLE,
    _SAMPEN_R_FACTOR,
    _SPRT_A,
    _SPRT_B,
    _SPRT_L0,
    _SPRT_L1,
    _SPRT_ORACLE,
    _SPRT_P0,
    _SPRT_P1,
    events_sequential_sprt,
    ts_sample_entropy,
)

STAGED = {
    "geo_point_in_polygon": (geo_point_in_polygon, _PIP_ORACLE),
    "agg_cronbach_alpha": (agg_cronbach_alpha, _CRONBACH_ORACLE),
    "ts_sample_entropy": (ts_sample_entropy, _SAMPEN_ORACLE),
    "events_sequential_sprt": (events_sequential_sprt, _SPRT_ORACLE),
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


# --- geo_point_in_polygon ---------------------------------------------------------


def _planted(custkey: int, salt: int) -> float:
    return ((custkey + salt) % _M31) * _KNUTH % _M32 / _M32


def _inside(lat: float, lon: float) -> bool:
    n = len(_PIP_POLY)
    crossings = 0
    for i in range(n):
        (y1, x1), (y2, x2) = _PIP_POLY[i], _PIP_POLY[(i + 1) % n]
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (
            y2 - y1
        ) + x1:
            crossings += 1
    return crossings % 2 == 1


def test_pip_python_recompute(spark):
    """Pure-python planting + ray casting per customer; exact count
    equality per group."""
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    n_in = 0
    for k in c["c_custkey"].astype(int):
        lat = _planted(k, 1) * 120 - 60
        lon = _planted(k, 2) * 240 - 120
        n_in += int(_inside(lat, lon))
    got = geo_point_in_polygon(spark, SF_SMOKE).toPandas()
    by = {bool(r.inside): r for r in got.itertuples(index=False)}
    assert int(by[True].n_customers) == n_in
    assert int(by[False].n_customers) == len(c) - n_in
    assert (
        abs(float(by[True].share) + float(by[False].share) - 1.0) < 3e-6
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_pip_fixture_assumptions(sf_dir):
    """Both sides of the fence are populated (two output groups) — the
    share window's denominator is the full customer count."""
    c = pd.read_parquet(sf_dir + "/customer.parquet")
    flags = set()
    for k in c["c_custkey"].astype(int):
        lat = _planted(k, 1) * 120 - 60
        lon = _planted(k, 2) * 240 - 120
        flags.add(_inside(lat, lon))
        if len(flags) == 2:
            break
    assert flags == {True, False}


def test_pip_plan_shape(spark):
    """ONE scan, the five-edge test unrolled into one codegen'd
    projection, a 2-group aggregate — no join, no Python."""
    from tests.test_plans import plan

    p = plan(geo_point_in_polygon(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "EvalPython" not in p, p


# --- agg_cronbach_alpha -----------------------------------------------------------


def test_cronbach_pandas_recompute(spark):
    """Textbook α on the pivoted complete-block panel (pandas var with
    ddof=1, raw revenue units — no normalization, no quantization)."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o["blk"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    cell = (
        o.groupby(["blk", "o_orderpriority"])["o_totalprice"]
        .sum()
        .unstack()
    )
    cell = cell.dropna()  # complete blocks only
    k = cell.shape[1]
    assert k == _CRONBACH_K
    item_vars = cell.var(ddof=1)
    total_var = cell.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - item_vars.sum() / total_var)
    got = agg_cronbach_alpha(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months) == len(cell)
    assert int(got.k_items) == k
    assert abs(float(got.cronbach_alpha) - alpha) < 1e-5
    assert (
        abs(float(got.item_var_share) - item_vars.sum() / total_var)
        < 1e-5
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_cronbach_fixture_assumptions(sf_dir):
    """≥ 2 complete months with non-degenerate total variance — both
    variance denominators and the α ratio are defined."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    o["blk"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    cell = (
        o.groupby(["blk", "o_orderpriority"])["o_totalprice"]
        .sum()
        .unstack()
        .dropna()
    )
    assert len(cell) >= 2
    assert cell.sum(axis=1).var(ddof=1) > 0


def test_cronbach_plan_shape(spark):
    """ONE corpus scan (the cached cell frame feeds four consumers);
    no cartesian beyond the 1-row broadcast attaches."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(agg_cronbach_alpha(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- ts_sample_entropy ------------------------------------------------------------


def test_sampen_numpy_recompute(spark):
    """Brute-force Richman-Moorman in numpy: raw-unit series, explicit
    double loops over template pairs."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()
    n = len(y)
    r = _SAMPEN_R_FACTOR * y.std(ddof=0)
    nt = n - 2
    b_cnt = a_cnt = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            d2 = max(abs(y[i] - y[j]), abs(y[i + 1] - y[j + 1]))
            if d2 <= r:
                b_cnt += 1
                if max(d2, abs(y[i + 2] - y[j + 2])) <= r:
                    a_cnt += 1
    got = ts_sample_entropy(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months) == n
    assert int(got.n_templates) == nt
    assert int(got.b_count) == b_cnt
    assert int(got.a_count) == a_cnt
    assert abs(float(got.sampen) - (-math.log(a_cnt / b_cnt))) < 1e-5
    # A-pairs are a subset of B-pairs by construction
    assert int(got.a_count) <= int(got.b_count)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_sampen_fixture_assumptions(sf_dir):
    """A > 0 and B > 0 at r = 0.2σ — the log ratio is defined (a
    too-tight r on a noisier fixture would zero A)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()
    r = _SAMPEN_R_FACTOR * y.std(ddof=0)
    nt = len(y) - 2
    a_cnt = 0
    for i in range(nt):
        for j in range(i + 1, nt):
            if (
                max(
                    abs(y[i] - y[j]),
                    abs(y[i + 1] - y[j + 1]),
                    abs(y[i + 2] - y[j + 2]),
                )
                <= r
            ):
                a_cnt += 1
    assert a_cnt > 0


def test_sampen_plan_shape(spark):
    """ONE corpus scan (cached monthly frame); the O(n²) pair check is
    a broadcast theta-join over bounded metadata — never a shuffled
    cartesian of the corpus."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_sample_entropy(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- events_sequential_sprt -------------------------------------------------------


def test_sprt_python_recompute(spark):
    """Day-ordered walk in pure python with math.log factors — exact
    per-day count equality, tolerance on the walk values."""
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.floor("D")
    d = (
        ev.groupby("day")
        .agg(
            n=("event_type", "size"),
            x=("event_type", lambda s: int((s == "purchase").sum())),
        )
        .sort_index()
    )
    got = (
        events_sequential_sprt(spark, SF_SMOKE)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    llr = 0.0
    decided = None
    decision = "continue"
    for i, (day, row) in enumerate(d.iterrows()):
        llr += row.x * _SPRT_L1 + (row.n - row.x) * _SPRT_L0
        state = (
            "accept_h1"
            if llr >= _SPRT_A
            else "accept_h0"
            if llr <= _SPRT_B
            else "continue"
        )
        if decided is None and state != "continue":
            decided, decision = day, state
        g = got.iloc[i]
        assert g.day == day.strftime("%Y-%m-%d")
        assert int(g.n_events) == row.n and int(g.n_purch) == row.x
        assert abs(float(g.llr_cum) - llr) < 1e-5
        assert g.boundary == state
    assert (got.final_decision == decision).all()
    assert (got.decision_day == decided.strftime("%Y-%m-%d")).all()


def test_sprt_constants_are_what_they_claim():
    assert _SPRT_L1 == math.log(_SPRT_P1 / _SPRT_P0)
    assert _SPRT_L0 == math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))
    assert _SPRT_A == -_SPRT_B == math.log(0.95 / 0.05)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_sprt_fixture_assumptions(sf_dir, spark):
    """The fixture's ~0.20 purchase rate sits above the (0.15, 0.20)
    indifference region's midpoint, so the walk DECIDES (crosses a
    boundary) at both scales — the monitor readout is non-degenerate."""
    got = events_sequential_sprt(spark, sf_dir).toPandas()
    assert (got.final_decision != "continue").all()
    assert got.decision_day.notna().all()


def test_sprt_plan_shape(spark):
    """One corpus pass to the bounded day frame; the walk, crossing
    scan and decision broadcast are windows over that frame — rollup
    precedes every window."""
    from tests.test_plans import plan

    p = plan(events_sequential_sprt(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]
