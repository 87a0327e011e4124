"""r12-staged keys — built and verified this round ahead of the r12
registration (the post-428 cadence; SURVEY round-11 log). Two keys are
fully implemented and oracle-verified NOW so the r12 resumption is a
one-line decorator flip each plus a _SWEEP_PRIORITY slot:

  stream_session_dynamic_gap — per-event-gap session windows
                               (F.session_window with a gap EXPRESSION)
  etl_bitemporal_as_of       — two-axis (valid, system) AS-OF state
                               reconstruction

These tests carry each key's full contract in the meantime: driver-style
oracle parity at the smoke AND grading scales, an independent recompute
from the raw parquet (no Spark expressions, no DuckDB), a plan-shape
pin, and a registration-consistency guard that holds before AND after
the flip.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.streaming import (
    _DYN_GAP_ORACLE,
    stream_session_dynamic_gap,
)
from trireme_spark.queries.timeseries import (
    _BITEMPORAL_ORACLE,
    etl_bitemporal_as_of,
)

STAGED = {
    "stream_session_dynamic_gap": (
        stream_session_dynamic_gap,
        _DYN_GAP_ORACLE,
    ),
    "etl_bitemporal_as_of": (etl_bitemporal_as_of, _BITEMPORAL_ORACLE),
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
    constant and it must own a sweep slot (a half-applied flip fails
    here, not as a wasted graded slot)."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


# --- stream_session_dynamic_gap ----------------------------------------------


def test_dynamic_gap_python_recompute(spark):
    """Pure-python merging-session replay: per user in (ts, event_id)
    order, a session continues while ts < running max(ts + gap) of the
    prior events; an event AT the running end starts a new session."""
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    ref = {}
    for uid, sub in ev.groupby("user_id"):
        sessions = []
        cur = None
        for r in sub.itertuples(index=False):
            gap = pd.Timedelta(
                minutes=5 if r.event_type == "error" else 30
            )
            end = r.ts + gap
            if cur is None or r.ts >= cur["end"]:
                cur = {
                    "start": r.ts,
                    "end": end,
                    "n": 1,
                    "err": int(r.event_type == "error"),
                }
                sessions.append(cur)
            else:
                cur["end"] = max(cur["end"], end)
                cur["n"] += 1
                cur["err"] += int(r.event_type == "error")
        for s in sessions:
            ref[(int(uid), s["start"])] = s
    got = stream_session_dynamic_gap(spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    for row in got.itertuples(index=False):
        key = (int(row.user_id), pd.Timestamp(row.session_start))
        assert key in ref, key
        s = ref[key]
        assert pd.Timestamp(row.session_end) == s["end"], key
        assert int(row.n_events) == s["n"], key
        assert int(row.n_errors) == s["err"], key


def test_dynamic_gap_plan_shape(spark):
    """ONE native session-window aggregation on the user key — no
    self-join, no window-then-agg double shuffle."""
    from tests.test_plans import plan

    p = plan(stream_session_dynamic_gap(spark, SF_SMOKE))
    assert "session_window" in p, p
    assert "Join" not in p, p
    assert "MergingSessions" in p or "HashAggregate" in p, p


# --- etl_bitemporal_as_of -----------------------------------------------------


def test_bitemporal_python_recompute(spark):
    V = pd.Timestamp("1996-06-01")
    S = pd.Timestamp("1996-07-01")
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderkey", "o_totalprice", "o_orderdate"]
    ]
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")[
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"]
    ]
    best = {}

    def offer(okey, vf, sf, vn, amt):
        if vf > V or sf > S:
            return
        tup = (vf, sf, vn, amt)
        if okey not in best or tup > best[okey]:
            best[okey] = tup

    for r in o.itertuples(index=False):
        offer(
            int(r.o_orderkey),
            r.o_orderdate,
            r.o_orderdate + pd.Timedelta(days=2),
            0,
            float(r.o_totalprice),
        )
    for r in li.itertuples(index=False):
        offer(
            int(r.l_orderkey),
            r.l_shipdate,
            r.l_shipdate + pd.Timedelta(days=int(r.l_linenumber)),
            int(r.l_linenumber),
            float(r.l_extendedprice),
        )
    got = etl_bitemporal_as_of(spark, SF_SMOKE).toPandas()
    assert len(got) == len(best)
    for row in got.itertuples(index=False):
        vf, sf, vn, amt = best[int(row.o_orderkey)]
        assert pd.Timestamp(row.valid_from) == vf, row.o_orderkey
        assert pd.Timestamp(row.system_from) == sf, row.o_orderkey
        assert int(row.version_no) == vn, row.o_orderkey
        assert float(row.amount) == amt, row.o_orderkey


def test_bitemporal_plan_shape(spark):
    """Both cutoff predicates reach the parquet scans; the winner is a
    map-side-combined struct-max aggregation — no window, no join."""
    from tests.test_plans import plan

    p = plan(etl_bitemporal_as_of(spark, SF_SMOKE))
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "partial_max" in p, p
    assert "PushedFilters: [IsNotNull" in p or "LessThanOrEqual" in p, p


# --- layout invariance --------------------------------------------------------


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
