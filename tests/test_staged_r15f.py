"""r15-staged keys, batch 6 — parked UNregistered (r15 lot now 15):

  text_mattr_diversity — moving-average type-token ratio at a fixed
                         window (the length-robust lexical-diversity
                         referee; raw TTR length-confounds)
  sample_bottomk_hash  — consistent bottom-k hash sample (reproducible
                         across runs, engines, layouts AND corpus
                         growth — the cross-snapshot A/A primitive)

Same contract set as the other staging files.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.llm_text import (
    _MATTR_ORACLE,
    _MATTR_W,
    text_mattr_diversity,
)
from trireme_spark.queries.timeseries import (
    _BOTTOMK_K,
    _BOTTOMK_ORACLE,
    _BOTTOMK_SALT,
    sample_bottomk_hash,
)

STAGED = {
    "text_mattr_diversity": (text_mattr_diversity, _MATTR_ORACLE),
    "sample_bottomk_hash": (sample_bottomk_hash, _BOTTOMK_ORACLE),
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


# --- text_mattr_diversity ---------------------------------------------------------


def test_mattr_python_recompute(spark):
    """Sliding-window set arithmetic in pure python, per-language
    aggregation with exact micro-unit means."""
    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    import re

    per_lang = {}
    for r in d.itertuples(index=False):
        toks = re.split(r"\s+", r.text.lower())
        if len(toks) < _MATTR_W:
            continue
        total = sum(
            len(set(toks[i : i + _MATTR_W]))
            for i in range(len(toks) - _MATTR_W + 1)
        )
        mattr = (
            int(
                total
                / (_MATTR_W * (len(toks) - _MATTR_W + 1))
                * 1e6
            )
            / 1e6
        )
        per_lang.setdefault(r.lang, []).append(mattr)
    got = text_mattr_diversity(spark, SF_SMOKE).toPandas()
    assert set(got.lang) == set(per_lang)
    for row in got.itertuples(index=False):
        vals = per_lang[row.lang]
        assert int(row.n_docs) == len(vals)
        assert abs(float(row.mean_mattr) - sum(vals) / len(vals)) < 2e-6
        assert abs(float(row.min_mattr) - min(vals)) < 2e-6
        assert abs(float(row.max_mattr) - max(vals)) < 2e-6
        assert 0.0 < float(row.min_mattr) <= float(row.max_mattr) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_mattr_fixture_assumptions(sf_dir):
    """Every fixture doc reaches the pinned window length (no docs
    silently dropped) — the min-token probe that sized W."""
    d = pd.read_parquet(sf_dir + "/documents.parquet", columns=["text"])
    assert int(d.text.str.split().str.len().min()) >= _MATTR_W


def test_mattr_plan_shape(spark):
    """ONE scan, one codegen'd array projection, one keyed language
    rollup — no explode at token grain, no Python, no window."""
    from tests.test_plans import plan

    p = plan(text_mattr_diversity(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "Generate" not in p, p  # no token-grain explode


# --- sample_bottomk_hash ----------------------------------------------------------


def _hash(k: int) -> int:
    return int(
        hashlib.md5(f"{k}{_BOTTOMK_SALT}".encode()).hexdigest()[:8], 16
    )


def test_bottomk_python_recompute(spark):
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    ranked = sorted(
        ((_hash(int(k)), int(k)) for k in c.c_custkey)
    )[:_BOTTOMK_K]
    got = (
        sample_bottomk_hash(spark, SF_SMOKE)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(got) == min(_BOTTOMK_K, len(c))
    for i, (h, k) in enumerate(ranked):
        assert int(got.iloc[i]["rank"]) == i + 1
        assert int(got.iloc[i].c_custkey) == k
        assert int(got.iloc[i].hash_key) == h


def test_bottomk_consistency_across_corpus_growth(spark):
    """The consistency THEOREM the sampler exists for: the fixture
    custkeys nest (sf0.001 ⊆ sf0.01), so any sampled element of the
    SUPERSET that exists in the subset must also be sampled in the
    subset (an element's hash rank can only improve as competitors
    shrink)."""
    small = set(
        pd.read_parquet(
            SF_SMOKE + "/customer.parquet", columns=["c_custkey"]
        ).c_custkey.astype(int)
    )
    big_sample = set(
        sample_bottomk_hash(spark, SF_FULL)
        .toPandas()
        .c_custkey.astype(int)
    )
    small_sample = set(
        sample_bottomk_hash(spark, SF_SMOKE)
        .toPandas()
        .c_custkey.astype(int)
    )
    assert (big_sample & small) <= small_sample


def test_bottomk_plan_shape(spark):
    """The global-top-k shape: TakeOrderedAndProject, one scan, no
    shuffle-everything sort."""
    from tests.test_plans import plan

    p = plan(sample_bottomk_hash(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "TakeOrderedAndProject" in p, p
    assert "Join" not in p, p
