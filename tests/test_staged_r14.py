"""r14-staged keys — the parking lot opened one round past r13 (whose
20-key lot is full; the cadence cap is 20/round, so these five wait for
the r14 batch). Parked UNregistered:

  agg_cohens_effect_size   — Cohen's d / Hedges' g for the welch split
  events_poisson_rate_ratio — two-sample Poisson rate-ratio test
  ts_forecast_mase_eval    — MASE referee for the seasonal-naive model
  orders_event_study_did   — leads-and-lags DiD trajectory
  graph_bipartite_hits     — HITS authorities on the purchase bipartite

Same contract set as the other staging files: driver-style oracle
parity at the smoke AND grading scales, an independent recompute,
a plan-shape pin, layout invariance, and a registration-consistency
guard valid on both sides of the flip.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _COHENS_ORACLE,
    agg_cohens_effect_size,
)
from trireme_spark.queries.joins import (
    _HITS_ITERS,
    _HITS_ORACLE,
    _HITS_TOPK,
    graph_bipartite_hits,
)
from trireme_spark.queries.timeseries import (
    _ES_EVENT_MONTH,
    _ES_WINDOW,
    _EVENT_STUDY_ORACLE,
    _MASE_ORACLE,
    _MASE_SEASON,
    _RATE_RATIO_ORACLE,
    events_poisson_rate_ratio,
    orders_event_study_did,
    ts_forecast_mase_eval,
)

STAGED = {
    "agg_cohens_effect_size": (agg_cohens_effect_size, _COHENS_ORACLE),
    "events_poisson_rate_ratio": (
        events_poisson_rate_ratio,
        _RATE_RATIO_ORACLE,
    ),
    "ts_forecast_mase_eval": (ts_forecast_mase_eval, _MASE_ORACLE),
    "orders_event_study_did": (
        orders_event_study_did,
        _EVENT_STUDY_ORACLE,
    ),
    "graph_bipartite_hits": (graph_bipartite_hits, _HITS_ORACLE),
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


def _dec6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- agg_cohens_effect_size -------------------------------------------------------


def test_cohens_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    # pandas dayofweek: Monday=0..Sunday=6; weekend = Sat(5)/Sun(6)
    weekend = o["o_orderdate"].dt.dayofweek.isin([5, 6])
    x1 = o.loc[weekend, "o_totalprice"].astype(float)
    x0 = o.loc[~weekend, "o_totalprice"].astype(float)
    n1, n0 = len(x1), len(x0)
    sp2 = (
        ((x1 - x1.mean()) ** 2).sum() + ((x0 - x0.mean()) ** 2).sum()
    ) / (n1 + n0 - 2)
    d = (x1.mean() - x0.mean()) / math.sqrt(sp2)
    g = d * (1 - 3 / (4 * (n1 + n0) - 9))
    se = math.sqrt((n1 + n0) / (n1 * n0) + d * d / (2 * (n1 + n0)))
    got = agg_cohens_effect_size(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_weekend) == n1 and int(got.n_weekday) == n0
    assert abs(float(got.cohens_d) - d) < 5e-6
    assert abs(float(got.hedges_g) - g) < 5e-6
    assert abs(float(got.ci_lo) - (d - 1.96 * se)) < 5e-6
    assert abs(float(got.ci_hi) - (d + 1.96 * se)) < 5e-6
    dq = float(got.cohens_d)
    exp_mag = (
        "negligible"
        if abs(dq) < 0.2
        else "small"
        if abs(dq) < 0.5
        else "medium"
        if abs(dq) < 0.8
        else "large"
    )
    assert got.magnitude == exp_mag
    # |g| <= |d| always (the bias correction shrinks toward 0)
    assert abs(float(got.hedges_g)) <= abs(float(got.cohens_d)) + 1e-9


def test_cohens_plan_shape(spark):
    """One conditional corpus aggregation to six moments — the welch
    plan exactly: no join, no window."""
    from tests.test_plans import plan

    p = plan(agg_cohens_effect_size(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p


# --- events_poisson_rate_ratio ----------------------------------------------------


def test_rate_ratio_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    day = ev["ts"].dt.date
    first = ev["ts"].dt.day <= 15
    d = pd.DataFrame(
        {"day": day, "first": first, "err": ev["event_type"] == "error"}
    )
    g = d.groupby(["first", "day"])["err"].sum().reset_index()
    t1 = int((g["first"]).sum())
    t2 = int((~g["first"]).sum())
    k1 = int(g.loc[g["first"], "err"].sum())
    k2 = int(g.loc[~g["first"], "err"].sum())
    rr = (k1 / t1) / (k2 / t2)
    se = math.sqrt(1 / k1 + 1 / k2)
    got = events_poisson_rate_ratio(spark, SF_SMOKE).toPandas().iloc[0]
    assert (int(got.days_first), int(got.days_second)) == (t1, t2)
    assert (int(got.errors_first), int(got.errors_second)) == (k1, k2)
    assert abs(float(got.rate_ratio) - rr) < 5e-6
    lo = math.exp(math.log(rr) - 1.96 * se)
    hi = math.exp(math.log(rr) + 1.96 * se)
    assert abs(float(got.ci_lo) - lo) < 5e-6
    assert abs(float(got.ci_hi) - hi) < 5e-6
    assert bool(got.significant) == (
        float(got.ci_lo) > 1.0 or float(got.ci_hi) < 1.0
    )
    assert float(got.ci_lo) < float(got.rate_ratio) < float(got.ci_hi)


def test_rate_ratio_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_poisson_rate_ratio(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p


# --- ts_forecast_mase_eval --------------------------------------------------------


def test_mase_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    daily = {}
    for r in o.itertuples(index=False):
        dd = (pd.Timestamp(r.o_orderdate) - pd.Timestamp("1990-01-01")).days
        daily[dd] = daily.get(dd, Decimal(0)) + _dec6(r.o_totalprice)
    sae_s = sae_n = n_eval = 0
    for dd, y in daily.items():
        if dd - _MASE_SEASON in daily and dd - 1 in daily:
            n_eval += 1
            sae_s += math.floor(
                abs(float(y) - float(daily[dd - _MASE_SEASON])) * 1e6
            )
            sae_n += math.floor(
                abs(float(y) - float(daily[dd - 1])) * 1e6
            )
    got = ts_forecast_mase_eval(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_eval) == n_eval
    assert abs(float(got.mae_seasonal_naive) - sae_s / 1e6 / n_eval) < 2e-2
    assert abs(float(got.mae_naive) - sae_n / 1e6 / n_eval) < 2e-2
    assert abs(float(got.mase) - sae_s / sae_n) < 2e-6
    assert bool(got.beats_naive) == (float(got.mase) < 1.0)
    assert float(got.mase) > 0.0


def test_mase_plan_shape(spark):
    """The corpus is scanned ONCE: the calendar-bounded daily frame is
    cached and reused by the target and both lag legs."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_forecast_mase_eval(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- orders_event_study_did -------------------------------------------------------


def test_event_study_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    seg = dict(zip(c["c_custkey"].astype(int), c["c_mktsegment"]))
    ev_m = _ES_EVENT_MONTH[0] * 12 + _ES_EVENT_MONTH[1]
    cells = {}
    for r in o.itertuples(index=False):
        ts = pd.Timestamp(r.o_orderdate)
        tau = ts.year * 12 + ts.month - ev_m
        if not (-_ES_WINDOW <= tau <= _ES_WINDOW):
            continue
        treated = seg[int(r.o_custkey)] == "BUILDING"
        key = (treated, tau)
        cells[key] = cells.get(key, Decimal(0)) + _dec6(r.o_totalprice)
    gaps = {
        tau: float(cells[(True, tau)]) - float(cells[(False, tau)])
        for tau in range(-_ES_WINDOW, _ES_WINDOW + 1)
    }
    pre = [math.floor(gaps[t] * 1e6) for t in range(-_ES_WINDOW, 0)]
    pre_gap = sum(pre) / 1e6 / len(pre)
    got = orders_event_study_did(spark, SF_SMOKE).toPandas()
    assert len(got) == 2 * _ES_WINDOW + 1
    for tau in range(-_ES_WINDOW, _ES_WINDOW + 1):
        row = got[got.tau == tau].iloc[0]
        assert bool(row.is_pre) == (tau < 0)
        assert abs(float(row.gap) - gaps[tau]) < 2e-2
        assert abs(float(row.effect) - (gaps[tau] - pre_gap)) < 2e-4
    # the re-centering identity: pre-period effects average ~0
    pre_eff = got[got.is_pre]["effect"].astype(float)
    assert abs(pre_eff.mean()) < 1e-3


def test_event_study_pushdown_and_plan(spark):
    """The window predicate reaches the parquet scan as a pushed
    filter (literal timestamp bounds — a derived-month BETWEEN would
    filter post-scan); the customer join is keyed, windows ride the
    7-row frame."""
    from tests.test_plans import plan

    p = plan(orders_event_study_did(spark, SF_SMOKE))
    assert "PushedFilters" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p
    assert "windowspecdefinition" in p, p
    assert "CartesianProduct" not in p, p


# --- graph_bipartite_hits ---------------------------------------------------------


def test_hits_python_recompute(spark):
    """Pure-python HITS with the SAME per-iteration quantization (the
    pagerank recompute precedent: the quantization points are part of
    the algorithm's contract, the graph algebra is recomputed from
    scratch)."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = {
        (int(r.o_custkey), int(r.l_partkey))
        for r in m.itertuples(index=False)
    }
    h = {c: 10**12 for c, _ in edges}
    a = None
    for i in range(1, _HITS_ITERS + 1):
        a_raw = {}
        for cst, p in edges:
            a_raw[p] = a_raw.get(p, 0) + h[cst]
        tot = float(sum(a_raw.values()))
        a = {
            p: math.floor(float(s) / tot * 1e12)
            for p, s in a_raw.items()
        }
        if i < _HITS_ITERS:
            h_raw = {}
            for cst, p in edges:
                h_raw[cst] = h_raw.get(cst, 0) + a[p]
            tot_h = float(sum(h_raw.values()))
            h = {
                cst: math.floor(float(s) / tot_h * 1e12)
                for cst, s in h_raw.items()
            }
    deg = {}
    for _, p in edges:
        deg[p] = deg.get(p, 0) + 1
    top = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOPK]
    got = graph_bipartite_hits(spark, SF_SMOKE).toPandas()
    assert len(got) == _HITS_TOPK
    for (p, s), row in zip(top, got.itertuples(index=False)):
        assert int(row.partkey) == p, (top[:3], got.head(3))
        assert abs(float(row.authority) - s / 1e12) < 1e-12
        assert int(row.degree) == deg[p]
    # L1 normalization: the full authority vector sums to ~1
    assert abs(sum(a.values()) / 1e12 - 1.0) < 1e-6


def test_hits_plan_shape(spark):
    """The distinct edge table is cached (built once, reused 2x per
    iteration); per iteration the plan is keyed join + keyed agg +
    1-row normalizer broadcast; top-k folds into
    TakeOrderedAndProject; no cartesian beyond the 1-row attaches."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(graph_bipartite_hits(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p  # orders+lineitem
    assert "InMemoryTableScan" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
