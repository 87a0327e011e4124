"""r11-staged keys — built and verified ahead of registration resumption.

Registration is PAUSED until the never-swept backlog is under 50 (round-9
verdict; resumes r11). ``fn_json_variant`` is fully implemented and
oracle-verified NOW so the r11 resumption is a one-line decorator flip in
trireme_spark/queries/functions_scalar.py plus a slot in _SWEEP_PRIORITY.
These tests carry the key's full contract in the meantime: driver-style
oracle parity at the smoke AND grading scales, an independent pandas
recompute from the raw parquet (no Spark, no DuckDB), a plan-shape pin,
and a registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import json

import pandas as pd

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.functions_scalar import (
    _FN_JSON_VARIANT_ORACLE,
    fn_json_variant,
)


def test_fn_json_variant_oracle_parity_smoke(spark):
    assert_matches_oracle(
        fn_json_variant(spark, SF_SMOKE), _FN_JSON_VARIANT_ORACLE, SF_SMOKE
    )


def test_fn_json_variant_oracle_parity_grading_scale(spark):
    """The driver grades at sf0.01 — pre-verify at exactly that scale so
    the r11 registration inherits a proven contract, not a smoke-only one."""
    assert_matches_oracle(
        fn_json_variant(spark, SF_FULL), _FN_JSON_VARIANT_ORACLE, SF_FULL
    )


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


def test_fn_json_variant_registration_consistency():
    """Holds on both sides of the r11 flip: while registration is paused
    the key must NOT be registered (pause discipline); once it registers,
    its oracle must be the staged constant and it must own a sweep slot."""
    if "fn_json_variant" in registry.QUERIES:
        assert registry.ORACLES.get("fn_json_variant") == (
            _FN_JSON_VARIANT_ORACLE
        )
        from trireme_spark.queries import _SWEEP_PRIORITY

        assert "fn_json_variant" in _SWEEP_PRIORITY
    else:
        assert "fn_json_variant" not in registry.ORACLES
