"""r11-staged keys — built and verified ahead of registration resumption.

Registration is PAUSED until the never-swept backlog is under 50 (round-9
verdict; resumes r11). Four keys are fully implemented and oracle-verified
NOW so the r11 resumption is a one-line decorator flip each plus a
_SWEEP_PRIORITY slot:

  fn_json_variant        — variant scalar-leaf type introspection rollup
  fn_variant_nested_paths— variant OBJECT/ARRAY shape + nested-path rollup
  graph_label_propagation— 2-iteration synchronous LPA communities
  ts_theil_sen_trend     — robust median-of-pairwise-slopes monthly trend

These tests carry each key's full contract in the meantime: driver-style
oracle parity at the smoke AND grading scales, an independent recompute
from the raw parquet (no Spark, no DuckDB), a plan-shape pin, and a
registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import json
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.functions_scalar import (
    _FN_JSON_VARIANT_ORACLE,
    _FN_VARIANT_NESTED_ORACLE,
    fn_json_variant,
    fn_variant_nested_paths,
)
from trireme_spark.queries.joins import _LPA_ORACLE, graph_label_propagation
from trireme_spark.queries.timeseries import (
    _THEIL_SEN_ORACLE,
    ts_theil_sen_trend,
)

STAGED = {
    "fn_json_variant": (fn_json_variant, _FN_JSON_VARIANT_ORACLE),
    "fn_variant_nested_paths": (
        fn_variant_nested_paths,
        _FN_VARIANT_NESTED_ORACLE,
    ),
    "graph_label_propagation": (graph_label_propagation, _LPA_ORACLE),
    "ts_theil_sen_trend": (ts_theil_sen_trend, _THEIL_SEN_ORACLE),
}


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_oracle_parity_smoke(spark, key):
    fn, oracle = STAGED[key]
    assert_matches_oracle(fn(spark, SF_SMOKE), oracle, SF_SMOKE)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_oracle_parity_grading_scale(spark, key):
    """The driver grades at sf0.01 — pre-verify at exactly that scale so
    the r11 registration inherits a proven contract, not a smoke-only one."""
    fn, oracle = STAGED[key]
    assert_matches_oracle(fn(spark, SF_FULL), oracle, SF_FULL)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_registration_consistency(key):
    """Holds on both sides of the r11 flip: while registration is paused
    the key must NOT be registered (pause discipline); once it registers,
    its oracle must be the staged constant and it must own a sweep slot."""
    _, oracle = STAGED[key]
    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        from trireme_spark.queries import _SWEEP_PRIORITY

        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        # a HALF-applied flip (priority slot added, decorator not
        # flipped) must fail here, not surface as a wasted graded slot
        from trireme_spark.queries import _SWEEP_PRIORITY

        assert key not in _SWEEP_PRIORITY


# --- fn_json_variant -------------------------------------------------------


def test_fn_json_variant_independent_recompute(spark):
    """Third-way audit (audit-lattice style): recompute the rollup with
    pandas straight off the parquet — no Spark expressions, no DuckDB JSON
    functions — from the documented doc-builder contract:
    event_id%4 -> 0: int k | 1: "s<k>" | 2: bool (k even) | 3: JSON null."""
    raw = pd.read_parquet(SF_SMOKE + "/events.parquet")
    k = raw["props"].map(lambda s: int(json.loads(s)["k"]))
    m = (raw["event_id"] % 4).astype(int)
    expected = {
        "int": {
            "n_events": int((m == 0).sum()),
            "sum_int": int(k[m == 0].sum()),
            "n_true": 0,
            "str_len_sum": None,
        },
        "string": {
            "n_events": int((m == 1).sum()),
            "sum_int": None,
            "n_true": 0,
            "str_len_sum": sum(len("s" + str(x)) for x in k[m == 1]),
        },
        "bool": {
            "n_events": int((m == 2).sum()),
            "sum_int": None,
            "n_true": int((k[m == 2] % 2 == 0).sum()),
            "str_len_sum": None,
        },
        "null": {
            "n_events": int((m == 3).sum()),
            "sum_int": None,
            "n_true": 0,
            "str_len_sum": None,
        },
    }
    got = fn_json_variant(spark, SF_SMOKE).toPandas()
    assert sorted(got["vtype"]) == sorted(expected)
    for row in got.itertuples(index=False):
        exp = expected[row.vtype]
        assert int(row.n_events) == exp["n_events"], row.vtype
        si = None if pd.isna(row.sum_int) else int(row.sum_int)
        assert si == exp["sum_int"], row.vtype
        assert int(row.n_true) == exp["n_true"], row.vtype
        sl = None if pd.isna(row.str_len_sum) else int(row.str_len_sum)
        assert sl == exp["str_len_sum"], row.vtype


def test_fn_json_variant_plan_shape(spark):
    """The only shuffle is the 4-group HASH aggregate with a partial
    map-side combine (every agg buffer is a long BY DESIGN — a string
    buffer would demote the plan to SortAggregate, an O(n log n)
    per-partition sort at 100 TB); the variant work stays row-local.
    No cartesian anything, no window, no second exchange."""
    from tests.test_plans import plan

    p = plan(fn_json_variant(spark, SF_SMOKE))
    # formatted explain names each node on a tree line + a detail line
    assert p.count(" Exchange") == 2, p
    assert p.count("hashpartitioning(vtype") == 1, p
    assert "HashAggregate" in p and "SortAggregate" not in p, p
    assert "partial_count" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


# --- fn_variant_nested_paths -----------------------------------------------


def test_fn_variant_nested_paths_independent_recompute(spark):
    """Pandas recompute from the documented doc-builder contract:
    event_id%3 -> 0: {"b": k} object | 1: [k, k+1] array | 2: scalar k."""
    raw = pd.read_parquet(SF_SMOKE + "/events.parquet")
    k = raw["props"].map(lambda s: int(json.loads(s)["k"]))
    m = (raw["event_id"] % 3).astype(int)
    expected = {
        "object": {
            "n_events": int((m == 0).sum()),
            "sum_obj_b": int(k[m == 0].sum()),
            "sum_arr_1": None,
            "sum_scalar": None,
        },
        "array": {
            "n_events": int((m == 1).sum()),
            "sum_obj_b": None,
            "sum_arr_1": int((k[m == 1] + 1).sum()),
            "sum_scalar": None,
        },
        "scalar": {
            "n_events": int((m == 2).sum()),
            "sum_obj_b": None,
            "sum_arr_1": None,
            "sum_scalar": int(k[m == 2].sum()),
        },
    }
    got = fn_variant_nested_paths(spark, SF_SMOKE).toPandas()
    assert sorted(got["kind"]) == sorted(expected)
    for row in got.itertuples(index=False):
        exp = expected[row.kind]
        assert int(row.n_events) == exp["n_events"], row.kind
        for col in ("sum_obj_b", "sum_arr_1", "sum_scalar"):
            v = getattr(row, col)
            v = None if pd.isna(v) else int(v)
            assert v == exp[col], (row.kind, col)


def test_fn_variant_nested_paths_plan_shape(spark):
    """Same single-shuffle all-long-buffer shape as fn_json_variant."""
    from tests.test_plans import plan

    p = plan(fn_variant_nested_paths(spark, SF_SMOKE))
    assert p.count(" Exchange") == 2, p
    assert p.count("hashpartitioning(kind") == 1, p
    assert "HashAggregate" in p and "SortAggregate" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


# --- graph_label_propagation -----------------------------------------------


def test_graph_label_propagation_independent_recompute(spark):
    """Pure-python synchronous LPA from raw lineitem parquet: co-purchase
    edges (distinct order-part pairs, same-order part pairs, count
    weights), L0 = node id, two iterations of edge-weight-majority with
    min-label tie-break. Integer arithmetic end to end — any divergence
    is a logic bug, never float drift."""
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import defaultdict

    edges = defaultdict(int)  # (src, dst) -> w
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i, u in enumerate(parts):
            for v_ in parts[i + 1:]:
                if u != v_:
                    edges[(u, v_)] += 1
                    edges[(v_, u)] += 1
    lab = {n: n for n in {s for s, _ in edges}}
    for _ in range(2):
        votes = defaultdict(int)  # (dst, lab) -> wsum
        for (s, d), w in edges.items():
            votes[(d, lab[s])] += w
        nxt = {}
        for (d, lb), w in votes.items():
            cur = nxt.get(d)
            if cur is None or (w, -lb) > (cur[0], -cur[1]):
                nxt[d] = (w, lb)
        lab = {d: lb for d, (w, lb) in nxt.items()}
    sizes = defaultdict(int)
    for lb in lab.values():
        sizes[lb] += 1
    got = graph_label_propagation(spark, SF_SMOKE).toPandas()
    assert len(got) == len(lab)
    for row in got.itertuples(index=False):
        assert lab[row.node] == row.label, row.node
        assert sizes[row.label] == int(row.comm_size), row.node


def test_graph_label_propagation_plan_shape(spark):
    """Keyed joins + PARTITIONED windows only: no cartesian anything and
    no corpus-global window (the RRF-pin property); the weighted edge
    list is materialized once — since the r15 localCheckpoint barriers
    the final plan reads the checkpointed label RDD (Scan ExistingRDD)
    instead of replaying the cached-edge iteration pipeline."""
    import re

    from tests.test_plans import plan

    p = plan(graph_label_propagation(spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert (
        "InMemoryTableScan" in p
        or "InMemoryRelation" in p
        or "ExistingRDD" in p
    ), p
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        head = spec.split(",")[0].strip()
        assert head and not head.startswith("0"), (
            f"corpus-global window: {spec}"
        )


# --- ts_theil_sen_trend ----------------------------------------------------


def test_ts_theil_sen_trend_independent_recompute(spark):
    """Pandas/Decimal recompute from raw orders parquet: dsum's
    DECIMAL(27,6) mirror for daily revenue, IEEE pairwise slopes, the
    documented explicit median rank rule, floor-quantize at 1e-6."""
    import math

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    q = Decimal("0.000001")
    daily = {}
    for d, v in zip(o["o_orderdate"], o["o_totalprice"]):
        key = (d.year, d.month, d.day)
        daily[key] = daily.get(key, Decimal(0)) + Decimal(
            repr(float(v))
        ).quantize(q, ROUND_HALF_UP)
    months = {}
    for (y, mo, dy), rev in daily.items():
        months.setdefault((y, mo), []).append((dy, float(rev)))
    # a month with a single order day has zero pairs -> no output row
    months = {k: v for k, v in months.items() if len(v) >= 2}
    got = ts_theil_sen_trend(spark, SF_SMOKE).toPandas()
    assert len(got) == len(months)
    for row in got.itertuples(index=False):
        t = pd.Timestamp(row.month)
        days = sorted(months[(t.year, t.month)])
        slopes = sorted(
            (rj - ri) / float(dj - di)
            for i, (di, ri) in enumerate(days)
            for dj, rj in days[i + 1:]
        )
        n = len(slopes)
        lo, hi = (n + 1) // 2, (n + 2) // 2
        if lo == hi:
            med = slopes[lo - 1]
        else:
            med = (slopes[lo - 1] + slopes[hi - 1]) / 2.0
        exp = math.floor(med * 1e6) / 1e6
        assert int(row.n_pairs) == n, t
        assert float(row.theil_sen_slope) == exp, (t, row.theil_sen_slope)


def test_ts_theil_sen_trend_plan_shape(spark):
    """The corpus-sized stage is ONE partial-aggregated daily rollup; the
    pairwise self-join and the rank window run on the day-levelled table
    and are keyed/partitioned by month — never cartesian, never global."""
    import re

    from tests.test_plans import plan

    p = plan(ts_theil_sen_trend(spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "partial_sum" in p, p
    # the corpus-sized daily rollup must materialize ONCE (cached) and
    # feed both self-join sides — uncached it compiles into the plan
    # twice and the only at-scale stage runs twice
    assert "InMemoryRelation" in p, p
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", p):
        head = spec.split(",")[0].strip()
        assert head.startswith("month"), f"non-month window: {spec}"


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_layout_invariance(spark, key, monkeypatch):
    """Mirror of tests/test_partition_invariance.py for the staged keys:
    identical rows at the pinned layout and under a hostile one (7
    shuffle partitions, 64 KB scan splits, immutable-conf prep path).
    Pre-flip the staged callables are unwrapped (prep never runs, the
    guard sits idle); post-flip @register rebinds these module symbols
    to their prep()-wrapped forms and the guard exercises the same
    immutable-conf tolerance the registered keys claim."""
    fn, _ = STAGED[key]

    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    base = canon(fn(spark, SF_SMOKE))

    from tests.conftest import hostile_layout

    hostile = hostile_layout(
        spark, monkeypatch, lambda: canon(fn(spark, SF_SMOKE))
    )

    assert hostile == base, (
        f"{key}: rows differ between the pinned layout and a hostile one"
    )
