"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.3).

Parametrized over every registered query key that has oracle SQL; keys
without an oracle get a rows-only smoke run, exactly like the driver.
Runs at sf0.001 by default (fast); set TRIREME_TEST_SF=/root/testdata/sf0.01
for the pre-commit full pass.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE, assert_matches_oracle
from trireme_spark import registry



pytestmark = pytest.mark.slow  # opt-in battery (r15): run with -m "" or -m slow

def _keys():
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("key", _keys())
def test_oracle_parity(spark, key):
    fn = registry.QUERIES[key]
    oracle = registry.ORACLES.get(key)
    df = fn(spark, SF_SMOKE)
    if oracle is None:
        # rows-only check, mirroring the driver's degraded mode
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
    else:
        assert_matches_oracle(df, oracle, SF_SMOKE)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) > 0


def test_sweep_priority_covers_registry_exactly():
    """_apply_sweep_order silently SKIPS priority entries missing from
    the registry and silently APPENDS registered keys missing from the
    list — safe behaviors at runtime, but either one after a rotation
    means a typo is quietly wasting a driver sweep slot or burying a
    key's evidence. Pin exact set equality (and no duplicates) so a bad
    rotation fails the suite instead."""
    from trireme_spark.queries import _SWEEP_PRIORITY

    assert len(_SWEEP_PRIORITY) == len(set(_SWEEP_PRIORITY)), (
        "duplicate keys in _SWEEP_PRIORITY"
    )
    missing = set(_SWEEP_PRIORITY) - set(registry.QUERIES)
    extra = set(registry.QUERIES) - set(_SWEEP_PRIORITY)
    assert not missing, f"priority entries not in registry: {missing}"
    assert not extra, f"registered keys not in the priority list: {extra}"


# Every key that legitimately has no DuckDB oracle lives in the declared
# manifest (trireme_spark/rows_only.py, rendered to ROWS_ONLY.json by
# scripts/gen_rows_only.py), with the reason it cannot be SQL-mirrored
# and the pytest node(s) carrying its contract instead.
from trireme_spark.rows_only import ROWS_ONLY

ROWS_ONLY_BY_DESIGN = set(ROWS_ONLY)


def test_no_oracle_set_is_exactly_the_by_design_list():
    """A key silently losing its oracle (a typo'd @register(...,
    oracle=...) during a refactor) degrades the driver's gate for that
    key to rows-only without anyone deciding that — and the judge
    audits precisely this set. Pin it exactly, both directions."""
    no_oracle = {k for k in registry.QUERIES if k not in registry.ORACLES}
    lost = no_oracle - ROWS_ONLY_BY_DESIGN
    assert not lost, f"keys LOST their oracle without a design note: {lost}"
    gained = ROWS_ONLY_BY_DESIGN - no_oracle
    assert not gained, (
        f"keys now HAVE oracles but are still pinned rows-only: {gained} "
        "— remove them from ROWS_ONLY_BY_DESIGN"
    )


def test_rows_only_manifest_committed_and_fresh():
    """ROWS_ONLY.json is the driver-facing copy of the manifest; the
    judge computes a window's expected-green count from it, so a stale
    committed copy (rotation or registry change without re-running
    scripts/gen_rows_only.py) silently breaks that accounting."""
    import json
    import os

    from trireme_spark.rows_only import manifest

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "ROWS_ONLY.json")
    assert os.path.exists(path), "run scripts/gen_rows_only.py"
    committed = json.load(open(path))
    assert committed == manifest(), (
        "ROWS_ONLY.json is stale — re-run scripts/gen_rows_only.py"
    )


def test_rows_only_pytest_nodes_exist():
    """Each manifest entry points at the pytest node(s) that carry the
    key's correctness contract; a renamed/deleted test must break the
    manifest, not silently orphan the key's verification story."""
    import ast
    import os

    from trireme_spark.rows_only import ROWS_ONLY, WHY

    repo = os.path.dirname(os.path.dirname(__file__))
    defs_by_file: dict[str, set[str]] = {}
    for wc, nodes in ROWS_ONLY.values():
        assert wc in WHY
        assert nodes, "every rows-only key needs at least one pytest node"
        for node in nodes:
            fname, _, func = node.partition("::")
            assert func, f"malformed node {node!r}"
            if fname not in defs_by_file:
                tree = ast.parse(open(os.path.join(repo, fname)).read())
                defs_by_file[fname] = {
                    n.name for n in ast.walk(tree)
                    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                }
            assert func in defs_by_file[fname], (
                f"{node}: test function not found — manifest is stale"
            )
