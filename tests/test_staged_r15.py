"""r15-staged keys, batch 1 — parked UNregistered (the r15 lot opens
with 5, following the r12→r14 early-staging precedent; the r14 lot is
at its 20-key cap and flips first):

  ts_variance_ratio_test — Lo-MacKinlay VR(3): completes the
                           stationarity triple (DF / KPSS / VR)
  ts_turning_points_test — local-extrema randomness z-test
  orders_page_hinkley    — sequential drift monitor (running-mean
                           deviation walk with alarm threshold)
  agg_cochran_q          — k-sample McNemar on the customer × quarter
                           presence matrix (exact integer statistic)
  sim_ann_recall_eval    — the ANN family's referee: measured recall@5
                           of IVF vs the exact top-5 (ROWS-ONLY at
                           flip; truth side is the oracled l7)

Same contract set as the other staging files: driver-style oracle
parity at the smoke AND grading scales (where oracled), an independent
recompute, a plan-shape pin, layout invariance, fixture-assumption
pins, and a registration-consistency guard valid on both sides of the
flip.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _COCHRAN_CRIT,
    _COCHRAN_K,
    _COCHRAN_ORACLE,
    _COCHRAN_YEAR,
    agg_cochran_q,
)
from trireme_spark.queries.llm_sim import sim_ann_recall_eval
from trireme_spark.queries.timeseries import (
    _PH_DELTA,
    _PH_LAMBDA,
    _PH_ORACLE,
    _TP_CRIT,
    _TP_ORACLE,
    _VR_CRIT,
    _VR_ORACLE,
    _VR_Q,
    orders_page_hinkley,
    ts_turning_points_test,
    ts_variance_ratio_test,
)

ORACLED = {
    "ts_variance_ratio_test": (ts_variance_ratio_test, _VR_ORACLE),
    "ts_turning_points_test": (ts_turning_points_test, _TP_ORACLE),
    "orders_page_hinkley": (orders_page_hinkley, _PH_ORACLE),
    "agg_cochran_q": (agg_cochran_q, _COCHRAN_ORACLE),
}
STAGED = dict(ORACLED)
STAGED["sim_ann_recall_eval"] = (sim_ann_recall_eval, None)


@pytest.mark.parametrize("key", sorted(ORACLED))
def test_staged_oracle_parity_smoke(spark, key):
    fn, oracle = ORACLED[key]
    assert_matches_oracle(fn(spark, SF_SMOKE), oracle, SF_SMOKE)


@pytest.mark.parametrize("key", sorted(ORACLED))
def test_staged_oracle_parity_grading_scale(spark, key):
    fn, oracle = ORACLED[key]
    assert_matches_oracle(fn(spark, SF_FULL), oracle, SF_FULL)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_registration_consistency(key):
    """sim_ann_recall_eval registers oracle-less (sampled k-means
    quantizer) and must then be in the rows_only manifest."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        if oracle is not None:
            assert registry.ORACLES.get(key) == oracle
        else:
            assert key not in registry.ORACLES
            from trireme_spark.rows_only import ROWS_ONLY

            assert key in ROWS_ONLY
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


def _monthly(sf_dir: str) -> np.ndarray:
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    return o.groupby(m)["o_totalprice"].sum().sort_index().to_numpy()


# --- ts_variance_ratio_test -------------------------------------------------------


def test_vr_numpy_recompute(spark):
    """The pinned estimator form in raw numpy: population variances,
    overlapping q-sums, homoskedastic z."""
    y = _monthly(SF_SMOKE)
    r = np.diff(np.log(y))
    nr = len(r)
    mu = r.mean()
    ss1 = float(((r - mu) ** 2).sum())
    sq = np.convolve(r, np.ones(_VR_Q), mode="valid")
    nq = len(sq)
    ssq = float(((sq - _VR_Q * mu) ** 2).sum())
    vr = (ssq / (nq * _VR_Q)) / (ss1 / nr)
    z = (vr - 1) * math.sqrt(
        3 * _VR_Q * nr / (2 * (2 * _VR_Q - 1) * (_VR_Q - 1))
    )
    got = ts_variance_ratio_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_returns) == nr
    assert abs(float(got.variance_ratio) - vr) < 1e-5
    assert abs(float(got.z_stat) - z) < 1e-4
    assert bool(got.rejects_random_walk) == (
        abs(float(got.z_stat)) > _VR_CRIT
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_vr_fixture_assumptions(sf_dir):
    """Positive revenue every month (log defined) and enough returns
    for a q=3 overlapping sum."""
    y = _monthly(sf_dir)
    assert (y > 0).all()
    assert len(y) - 1 >= _VR_Q + 1


def test_vr_plan_shape(spark):
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_variance_ratio_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- ts_turning_points_test -------------------------------------------------------


def test_tp_numpy_recompute(spark):
    y = _monthly(SF_SMOKE)
    n = len(y)
    t = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    exp = 2 * (n - 2) / 3
    z = (t - exp) / math.sqrt((16 * n - 29) / 90)
    got = ts_turning_points_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months) == n
    assert int(got.n_turning_points) == t
    assert abs(float(got.expected) - exp) < 2e-6
    assert abs(float(got.z_stat) - z) < 1e-5
    assert bool(got.rejects_randomness) == (
        abs(float(got.z_stat)) > _TP_CRIT
    )


def test_tp_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(ts_turning_points_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- orders_page_hinkley ----------------------------------------------------------


def test_ph_pandas_recompute(spark):
    """Raw-float day walk in pandas: running mean, deviation walk,
    running-min excursion, first alarm."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    daily = (
        o.groupby(o.o_orderdate.dt.floor("D"))["o_totalprice"]
        .sum()
        .sort_index()
    )
    v = (daily / daily.mean()).to_numpy()
    ph = 0.0
    cum = 0.0
    mn = math.inf
    max_exc = -math.inf
    alarm = None
    for i, x in enumerate(v, 1):
        cum += x
        ph += x - cum / i - _PH_DELTA
        mn = min(mn, ph)
        exc = ph - mn
        max_exc = max(max_exc, exc)
        if alarm is None and exc > _PH_LAMBDA:
            alarm = daily.index[i - 1].strftime("%Y-%m-%d")
    got = orders_page_hinkley(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_days) == len(v)
    assert abs(float(got.max_excursion) - max_exc) < 1e-4
    assert got.alarm_day == alarm
    assert bool(got.drift_detected) == (alarm is not None)


def test_ph_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(orders_page_hinkley(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- agg_cochran_q ----------------------------------------------------------------


def test_cochran_python_recompute(spark):
    """Exact-integer recompute on the pandas pivot."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    oy = o[o.o_orderdate.dt.year == _COCHRAN_YEAR].copy()
    oy["qtr"] = oy.o_orderdate.dt.quarter
    mat = pd.DataFrame(index=c.c_custkey.astype(int))
    for q in range(1, 5):
        active = set(oy.loc[oy.qtr == q, "o_custkey"].astype(int))
        mat[f"q{q}"] = [int(k in active) for k in mat.index]
    cj = [int(mat[f"q{q}"].sum()) for q in range(1, 5)]
    r = mat.sum(axis=1).astype(int)
    num = (_COCHRAN_K - 1) * (
        _COCHRAN_K * sum(x * x for x in cj) - sum(cj) ** 2
    )
    den = _COCHRAN_K * int(r.sum()) - int((r * r).sum())
    got = agg_cochran_q(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_customers) == len(c)
    for q in range(1, 5):
        assert int(got[f"n_q{q}"]) == cj[q - 1]
    assert abs(float(got.q_stat) - num / den) < 1e-5
    assert bool(got.significant) == (float(got.q_stat) > _COCHRAN_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_cochran_fixture_assumptions(sf_dir):
    """The denominator k·ΣR − ΣR² is positive: at least one customer
    with a PARTIAL quarter pattern exists (not all rows are 0/k)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    oy = o[o.o_orderdate.dt.year == _COCHRAN_YEAR]
    r = (
        oy.assign(qtr=oy.o_orderdate.dt.quarter)
        .groupby("o_custkey")["qtr"]
        .nunique()
    )
    assert ((r > 0) & (r < _COCHRAN_K)).any()


def test_cochran_plan_shape(spark):
    """One corpus rollup through a customer-keyed LEFT join (BY KEY —
    the dim is corpus-sized), one integer fold; no window, no Python."""
    from tests.test_plans import plan

    p = plan(agg_cochran_q(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# --- sim_ann_recall_eval ----------------------------------------------------------


def test_ann_eval_truth_side_matches_duckdb(spark, duck):
    """The half of the referee that CAN be oracled, is: the exact
    neighbor sets equal the already-registered l7 oracle's."""
    from trireme_spark.queries.llm_sim import _L7_ORACLE

    exact = (
        registry.QUERIES["sim_knn_per_query"](spark, SF_SMOKE)
        .select("query_id", "neighbor_id")
        .toPandas()
    )
    oracle = duck.sql(_L7_ORACLE).df()[["query_id", "neighbor_id"]]
    a = sorted(map(tuple, exact.to_numpy().tolist()))
    b = sorted(map(tuple, oracle.to_numpy().tolist()))
    assert a == b


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_ann_eval_identities_and_floor(spark, sf_dir):
    """Structural pins: caught ≤ exact per query; the micro recall is
    the printed counts' ratio; and the IVF recall floor the quality
    suite asserts (≥ 0.8) holds through the referee."""
    got = sim_ann_recall_eval(spark, sf_dir).toPandas()
    assert len(got) == 5
    assert (got.n_exact == 5).all()
    assert ((got.n_caught >= 0) & (got.n_caught <= got.n_exact)).all()
    micro = got.n_caught.sum() / got.n_exact.sum()
    assert abs(float(got.micro_recall.iloc[0]) - micro) < 2e-6
    assert got.micro_recall.nunique() == 1
    assert float(got.micro_recall.iloc[0]) >= 0.8


def test_ann_eval_deterministic(spark):
    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    assert canon(sim_ann_recall_eval(spark, SF_SMOKE)) == canon(
        sim_ann_recall_eval(spark, SF_SMOKE)
    )


def test_ann_eval_plan_shape(spark):
    """No cartesian anywhere: the referee joins two keyed top-5 frames
    (≤ k·|Q| rows each)."""
    from tests.test_plans import plan

    p = plan(sim_ann_recall_eval(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
