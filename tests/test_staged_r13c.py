"""r13-staged keys, batch 3 — parked UNregistered (r13 lot now 11):

  events_attribution_shapley — exact Shapley over the channel lattice
  orders_hill_tail_index     — EVT tail index from top-k order stats
  sample_pps_systematic      — deterministic midpoint-anchor PPS draw

Same contract set as the other staging files.
"""

from __future__ import annotations

import math
from decimal import Decimal
from itertools import combinations

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.timeseries import (
    _HILL_K,
    _HILL_ORACLE,
    _PPS_ORACLE,
    _PPS_TAKE,
    _SHAP_CHANNELS,
    _SHAPLEY_ORACLE,
    events_attribution_shapley,
    orders_hill_tail_index,
    sample_pps_systematic,
)

STAGED = {
    "events_attribution_shapley": (
        events_attribution_shapley,
        _SHAPLEY_ORACLE,
    ),
    "orders_hill_tail_index": (orders_hill_tail_index, _HILL_ORACLE),
    "sample_pps_systematic": (sample_pps_systematic, _PPS_ORACLE),
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


# --- events_attribution_shapley --------------------------------------------------


def _shapley_ref():
    """Exact Shapley from the textbook subset formula with Fraction
    weights — no bitmask tricks shared with the implementation."""
    from fractions import Fraction

    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    chans = [c for c, _ in _SHAP_CHANNELS]
    first_p = {}
    for r in ev.itertuples(index=False):
        if r.event_type == "purchase":
            uid = int(r.user_id)
            if uid not in first_p or r.ts < first_p[uid]:
                first_p[uid] = r.ts
    coalitions = {}
    for uid in first_p:
        coalitions[uid] = set()
    for r in ev.itertuples(index=False):
        uid = int(r.user_id)
        if (
            uid in first_p
            and r.ts < first_p[uid]
            and r.event_type in chans
        ):
            coalitions[uid].add(r.event_type)

    def v(S):
        S = set(S)
        return sum(1 for cs in coalitions.values() if cs <= S)

    n = len(chans)
    phi = {}
    for ch in chans:
        others = [c for c in chans if c != ch]
        total = Fraction(0)
        for size in range(n):
            for S in combinations(others, size):
                w = Fraction(
                    math.factorial(size) * math.factorial(n - 1 - size),
                    math.factorial(n),
                )
                total += w * (v(set(S) | {ch}) - v(S))
        phi[ch] = total
    return phi, v(set(chans)), v(set())


def test_shapley_python_recompute(spark):
    phi, v_grand, v_empty = _shapley_ref()
    got = events_attribution_shapley(spark, SF_SMOKE).toPandas()
    assert len(got) == len(phi)
    for r in got.itertuples(index=False):
        ref = phi[r.channel]
        assert (
            abs(float(r.shapley_conversions) - float(ref)) < 2e-6
        ), r.channel
        assert int(r.v_grand) == v_grand and int(r.v_empty) == v_empty
    # efficiency — THE Shapley axiom: credits sum to v(C) - v(empty)
    assert (
        abs(sum(float(v) for v in phi.values()) - (v_grand - v_empty))
        < 1e-12
    )
    assert (
        abs(
            float(got.shapley_conversions.sum()) - (v_grand - v_empty)
        )
        < 1e-5
    )


def test_shapley_plan_shape(spark):
    """Two corpus passes (first purchases; touch marking) reduce to a
    <=16-row mask table; the lattice and weight spines broadcast — no
    cartesian against the corpus, no window."""
    from tests.test_plans import plan

    p = plan(events_attribution_shapley(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition" not in p, p


# --- orders_hill_tail_index ------------------------------------------------------


def test_hill_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    top = o.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(_HILL_K + 1)
    xs = top.o_totalprice.tolist()
    x_k1 = xs[_HILL_K]
    units = sum(
        math.floor(math.log(x / x_k1) * 1e9) for x in xs[:_HILL_K]
    )
    h = units / 1e9 / _HILL_K
    got = orders_hill_tail_index(spark, SF_SMOKE).toPandas()
    row = got.iloc[0]
    assert int(row.k) == _HILL_K
    assert float(row.threshold) == math.floor(x_k1 * 100) / 100
    assert abs(float(row.hill_h) - h) < 2e-6
    assert abs(float(row.tail_alpha) - 1 / h) < 2e-6


def test_hill_plan_shape(spark):
    """The k+1 order statistics come from TakeOrderedAndProject —
    never a global sort of the corpus."""
    from tests.test_plans import plan

    p = plan(orders_hill_tail_index(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p


# --- sample_pps_systematic -------------------------------------------------------


def test_pps_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ref = {}
    for seg, sub in df.groupby("c_mktsegment"):
        spend = {}
        for r in sub.itertuples(index=False):
            cents = int(
                (
                    Decimal(repr(r.o_totalprice)) * 100
                ).quantize(Decimal("1"))
            )
            spend[int(r.c_custkey)] = (
                spend.get(int(r.c_custkey), 0) + cents
            )
        total = sum(spend.values())
        cum = 0
        for cust in sorted(spend):
            w = spend[cust]
            lo, hi = cum, cum + w
            cum = hi
            hits = (2 * _PPS_TAKE * hi + total) // (2 * total) - (
                2 * _PPS_TAKE * lo + total
            ) // (2 * total)
            if hits > 0:
                ref[(seg, cust)] = (w, hits)
    got = sample_pps_systematic(spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    seg_hits = {}
    for r in got.itertuples(index=False):
        w, hits = ref[(r.seg, int(r.c_custkey))]
        assert int(r.n_hits) == hits, (r.seg, r.c_custkey)
        assert abs(float(r.spend) - w / 100) < 1e-9
        seg_hits[r.seg] = seg_hits.get(r.seg, 0) + int(r.n_hits)
    # fixed take: exactly n selection points land per segment
    assert all(v == _PPS_TAKE for v in seg_hits.values()), seg_hits


def test_pps_plan_shape(spark):
    """One keyed rollup to customer grain, per-segment cumulative
    windows — no corpus-grain global window, no join after the
    rollup."""
    from tests.test_plans import plan

    p = plan(sample_pps_systematic(spark, SF_SMOKE))
    assert "windowspecdefinition" in p, p
    assert "SinglePartition" not in p, p


# --- layout invariance -----------------------------------------------------------


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
