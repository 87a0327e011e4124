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
