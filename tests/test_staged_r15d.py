"""r15-staged keys, batch 4 — parked UNregistered (r15 lot now 10,
matching the r12→r14 early-staging depth):

  agg_fisher_exact_2x2 — Fisher's exact test on the (BUILDING ×
                         deep-delinquent) 2×2 via log-factorial
                         PREFIX SUMS (no lgamma builtin in either
                         engine) — the exact-inference member of the
                         proportion family

Same contract set as the other staging files.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _FISHER_BAL,
    _FISHER_ORACLE,
    _FISHER_SEG,
    agg_fisher_exact_2x2,
)

STAGED = {
    "agg_fisher_exact_2x2": (agg_fisher_exact_2x2, _FISHER_ORACLE),
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


def _margins(sf_dir: str):
    c = pd.read_parquet(sf_dir + "/customer.parquet")
    n = len(c)
    r1 = int((c.c_mktsegment == _FISHER_SEG).sum())
    c1 = int((c.c_acctbal < _FISHER_BAL).sum())
    a = int(
        ((c.c_mktsegment == _FISHER_SEG) & (c.c_acctbal < _FISHER_BAL)).sum()
    )
    return n, r1, c1, a


def test_fisher_lgamma_recompute(spark):
    """Genuinely independent arithmetic: math.lgamma hypergeometric
    PMF (the implementation builds log-factorials from a prefix-summed
    ln spine — no shared code path, no shared rounding)."""

    def lnC(nn, kk):
        return (
            math.lgamma(nn + 1)
            - math.lgamma(kk + 1)
            - math.lgamma(nn - kk + 1)
        )

    n, r1, c1, a = _margins(SF_SMOKE)
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    lnden = lnC(n, c1)
    lps = {
        k: lnC(r1, k) + lnC(n - r1, c1 - k) - lnden
        for k in range(kmin, kmax + 1)
    }
    p_two = sum(
        math.exp(v) for v in lps.values() if v <= lps[a] + 1e-9
    )
    got = agg_fisher_exact_2x2(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n) == n
    assert int(got.n_exposed) == r1
    assert int(got.n_outcome) == c1
    assert int(got.n_both) == a
    assert abs(float(got.p_two_sided) - p_two) < 1e-5
    assert 0.0 < float(got.p_two_sided) <= 1.0
    assert bool(got.significant) == (float(got.p_two_sided) < 0.05)


def test_fisher_pmf_sums_to_one(spark):
    """Sanity on the spine algebra: the FULL support's probabilities
    (recomputed with lgamma) sum to 1 — the hypergeometric is a
    distribution, so the two-sided p can never exceed it."""

    def lnC(nn, kk):
        return (
            math.lgamma(nn + 1)
            - math.lgamma(kk + 1)
            - math.lgamma(nn - kk + 1)
        )

    n, r1, c1, a = _margins(SF_FULL)
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    total = sum(
        math.exp(lnC(r1, k) + lnC(n - r1, c1 - k) - lnC(n, c1))
        for k in range(kmin, kmax + 1)
    )
    assert abs(total - 1.0) < 1e-9
    got = agg_fisher_exact_2x2(spark, SF_FULL).toPandas().iloc[0]
    assert float(got.p_two_sided) <= 1.0 + 1e-9


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_fisher_fixture_assumptions(sf_dir):
    """Non-degenerate support (kmax > kmin — there is something to
    test) and the observed cell sits inside it."""
    n, r1, c1, a = _margins(sf_dir)
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    assert kmax > kmin, (kmin, kmax)
    assert kmin <= a <= kmax


def test_fisher_plan_shape(spark):
    """ONE corpus scan (the cached 1-row margin frame feeds the spine,
    the support and the attach); everything downstream is bounded
    sequence algebra — no cartesian beyond 1-row broadcasts."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(agg_fisher_exact_2x2(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
    assert "EvalPython" not in p, p
