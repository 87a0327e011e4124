"""r13-staged keys, batch 4 — parked UNregistered (r13 lot now 14):

  events_ab_jackknife_ratio — delete-one-bucket jackknife CI for the
                              delta-method key's exact estimand
  events_capture_recapture  — Chapman population estimate of the
                              active-(user, day) universe
  agg_confusion_mcc         — binary-classifier scorecard with Matthews
                              correlation

Same contract set as the other staging files: driver-style oracle
parity at the smoke AND grading scales, an independent recompute (pure
python / pandas — no Spark expressions, no DuckDB), a plan-shape pin,
layout invariance, fixture-assumption pins, and a
registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import _MCC_ORACLE, agg_confusion_mcc
from trireme_spark.queries.timeseries import (
    _CAPTURE_ORACLE,
    _JACKKNIFE_ORACLE,
    _JK_BUCKETS,
    events_ab_jackknife_ratio,
    events_capture_recapture,
)

STAGED = {
    "events_ab_jackknife_ratio": (
        events_ab_jackknife_ratio,
        _JACKKNIFE_ORACLE,
    ),
    "events_capture_recapture": (
        events_capture_recapture,
        _CAPTURE_ORACLE,
    ),
    "agg_confusion_mcc": (agg_confusion_mcc, _MCC_ORACLE),
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


def _md5_bucket(uid: int, seed: str, mod: int) -> int:
    return int(hashlib.md5(f"{uid}{seed}".encode()).hexdigest()[:8], 16) % mod


# --- events_ab_jackknife_ratio ----------------------------------------------------


def _jackknife_ref(sf_dir):
    """Textbook delete-one-bucket jackknife in pure python over exact
    integer micro-unit sums — no Spark expressions, no DuckDB."""
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    users = {}
    for r in ev.itertuples(index=False):
        uid = int(r.user_id)
        rec = users.setdefault(uid, [Decimal(0), 0])
        if r.event_type == "purchase":
            rec[0] += _dec6(r.value)
        if r.event_type in ("click", "view"):
            rec[1] += 1
    # (arm, bucket) cells of exact integer sums
    cells = {}
    for uid, (x, y) in users.items():
        arm = _md5_bucket(uid, "|delta", 2)
        bucket = _md5_bucket(uid, "|jkbucket", _JK_BUCKETS)
        c = cells.setdefault((arm, bucket), [0, 0, 0])
        c[0] += int(math.floor(x * Decimal(10**6)))
        c[1] += y
        c[2] += 1
    out = {}
    for arm in (0, 1):
        mine = {b: c for (a, b), c in cells.items() if a == arm}
        sx = sum(c[0] for c in mine.values())
        sy = sum(c[1] for c in mine.values())
        n = sum(c[2] for c in mine.values())
        b = len(mine)
        rq = [
            math.floor((sx - c[0]) / 1e6 / (sy - c[1]) * 1e9)
            for c in mine.values()
        ]
        rbar = sum(rq) / b / 1e9
        var = (
            (b - 1)
            / b
            * sum(math.floor((q / 1e9 - rbar) ** 2 * 1e12) for q in rq)
            / 1e12
        )
        out[arm] = (n, b, sx / 1e6 / sy, var)
    return out


def test_jackknife_python_recompute(spark):
    ref = _jackknife_ref(SF_SMOKE)
    got = events_ab_jackknife_ratio(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_a) == ref[0][0] and int(got.n_b) == ref[1][0]
    assert int(got.buckets_a) == ref[0][1]
    assert int(got.buckets_b) == ref[1][1]
    assert abs(float(got.ratio_a) - ref[0][2]) < 2e-6
    assert abs(float(got.ratio_b) - ref[1][2]) < 2e-6
    se = math.sqrt(ref[0][3] + ref[1][3])
    assert abs(float(got.se_jackknife) - se) < 2e-6
    z = (ref[1][2] - ref[0][2]) / se
    assert abs(float(got.z) - z) < 4e-6
    assert bool(got.significant) == (abs(float(got.z)) > 1.96)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_jackknife_arms_have_two_buckets(sf_dir):
    """Pinned fixture assumption: every arm has >= 2 occupied buckets
    (else a LOO denominator vanishes). The PSM/PPS pin precedent."""
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    arms = {0: set(), 1: set()}
    for uid in ev["user_id"].unique():
        uid = int(uid)
        arms[_md5_bucket(uid, "|delta", 2)].add(
            _md5_bucket(uid, "|jkbucket", _JK_BUCKETS)
        )
    assert len(arms[0]) >= 2 and len(arms[1]) >= 2, arms


def test_jackknife_plan_shape(spark):
    """One corpus scan; ALL post-rollup algebra (arm totals, LOO
    ratios, jackknife mean) rides arm-partitioned windows over 2·B
    metadata rows — no self-join, no cartesian. (The first draft's
    cell/arm join rescanned the corpus; caught by this pin.)"""
    from tests.test_plans import plan

    p = plan(events_ab_jackknife_ratio(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "windowspecdefinition" in p, p
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p


# --- events_capture_recapture -----------------------------------------------------


def test_capture_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ud = {}
    for r in ev.itertuples(index=False):
        key = (int(r.user_id), pd.Timestamp(r.ts).date())
        f = ud.setdefault(key, [0, 0])
        if r.event_type == "click":
            f[0] = 1
        if r.event_type == "view":
            f[1] = 1
    pop = len(ud)
    n1 = sum(f[0] for f in ud.values())
    n2 = sum(f[1] for f in ud.values())
    m = sum(f[0] * f[1] for f in ud.values())
    n_hat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    var = (
        (n1 + 1)
        * (n2 + 1)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1) ** 2 * (m + 2))
    )
    got = events_capture_recapture(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.pop_observed) == pop
    assert int(got.n1) == n1 and int(got.n2) == n2
    assert int(got.m_both) == m
    assert abs(float(got.n_hat) - n_hat) < 2e-6
    assert abs(float(got.se) - math.sqrt(var)) < 2e-6
    assert abs(float(got.coverage) - pop / n_hat) < 2e-6
    # the estimator is a sane universe size: at least what we saw
    assert float(got.n_hat) >= float(got.pop_observed) * 0.5
    assert 0.0 < float(got.coverage) <= 1.5


def test_capture_plan_shape(spark):
    """One corpus scan to (user, day) grain, then a 1-row fold — no
    join, no window, nothing at corpus grain downstream."""
    from tests.test_plans import plan

    p = plan(events_capture_recapture(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p


# --- agg_confusion_mcc ------------------------------------------------------------


def test_mcc_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    pred = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    label = o["o_orderstatus"] == "F"
    tp = int((pred & label).sum())
    fp = int((pred & ~label).sum())
    fn = int((~pred & label).sum())
    tn = int((~pred & ~label).sum())
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    got = agg_confusion_mcc(spark, SF_SMOKE).toPandas().iloc[0]
    assert (int(got.tp), int(got.fp), int(got.fn), int(got.tn)) == (
        tp,
        fp,
        fn,
        tn,
    )
    n = tp + fp + fn + tn
    assert abs(float(got.accuracy) - (tp + tn) / n) < 2e-6
    assert abs(float(got.precision_) - tp / (tp + fp)) < 2e-6
    assert abs(float(got.recall_) - tp / (tp + fn)) < 2e-6
    assert abs(float(got.f1) - 2 * tp / (2 * tp + fp + fn)) < 2e-6
    assert abs(float(got.mcc) - mcc) < 2e-6
    assert -1.0 <= float(got.mcc) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_mcc_cells_all_positive(sf_dir):
    """Pinned fixture assumption: all four confusion cells are
    populated, so precision/recall denominators never vanish (the MCC
    zero-marginal guard is engine-mirrored; the ratio columns rely on
    this pin)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    pred = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    label = o["o_orderstatus"] == "F"
    assert (pred & label).any() and (pred & ~label).any()
    assert (~pred & label).any() and (~pred & ~label).any()


def test_mcc_plan_shape(spark):
    """ONE map-side-combinable aggregation over one scan — the minimal
    plan: no join, no window, no exchange beyond the 1-row fold."""
    from tests.test_plans import plan

    p = plan(agg_confusion_mcc(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "HashAggregate" in p, p
