"""r14-staged keys, batch 2 — parked UNregistered (r14 lot now 8):

  agg_friedman_test        — blocked rank test (complete months × the
                             five priorities) + Kendall's W
  orders_auc_roc           — exact tie-corrected ROC AUC via the
                             rank-sum identity (+ Gini, Hanley-McNeil CI)
  text_compression_quality — zlib compressibility curation signal
                             (Arrow pandas UDF; ROWS-ONLY at flip — the
                             pytest zlib identity is the oracle)

Same contract set as the other staging files.
"""

from __future__ import annotations

import math
import zlib
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _AUC_ORACLE,
    _FRIEDMAN_CHI2_CRIT,
    _FRIEDMAN_K,
    _FRIEDMAN_ORACLE,
    agg_friedman_test,
    orders_auc_roc,
)
from trireme_spark.queries.llm_text import (
    _COMP_BOILERPLATE,
    _COMP_LEVEL,
    text_compression_quality,
)

ORACLED = {
    "agg_friedman_test": (agg_friedman_test, _FRIEDMAN_ORACLE),
    "orders_auc_roc": (orders_auc_roc, _AUC_ORACLE),
}
STAGED = dict(ORACLED)
STAGED["text_compression_quality"] = (text_compression_quality, None)


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
    """Holds on BOTH sides of the flip; text_compression_quality
    registers oracle-less (DuckDB has no zlib) and must then be in the
    rows_only manifest."""
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


def _dec6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- agg_friedman_test ------------------------------------------------------------


def test_friedman_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    cells = {}
    for r in o.itertuples(index=False):
        ts = pd.Timestamp(r.o_orderdate)
        key = (ts.year * 12 + ts.month, r.o_orderpriority)
        s, n = cells.get(key, (Decimal(0), 0))
        cells[key] = (s + _dec6(r.o_totalprice), n + 1)
    by_blk = {}
    for (blk, trt), (s, n) in cells.items():
        by_blk.setdefault(blk, {})[trt] = math.floor(
            float(s) / n * 1e6
        ) / 1e6
    complete = {
        b: t for b, t in by_blk.items() if len(t) == _FRIEDMAN_K
    }
    r_sum = {}
    for blk, t in complete.items():
        order = sorted(t.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (trt, _) in enumerate(order, start=1):
            r_sum[trt] = r_sum.get(trt, 0) + rank
    n = len(complete)
    k = _FRIEDMAN_K
    srr = sum(v * v for v in r_sum.values())
    chi2 = 12 / (n * k * (k + 1)) * srr - 3 * n * (k + 1)
    got = agg_friedman_test(spark, SF_SMOKE).toPandas()
    assert len(got) == k
    for trt, rs in r_sum.items():
        row = got[got.priority == trt].iloc[0]
        assert abs(float(row.mean_rank) - rs / n) < 2e-6
        assert abs(float(row.chi2_f) - chi2) < 2e-6
        assert abs(float(row.kendall_w) - chi2 / (n * (k - 1))) < 2e-6
        assert bool(row.significant) == (
            float(row.chi2_f) > _FRIEDMAN_CHI2_CRIT
        )
    # rank-sum conservation: sum of all rank sums = n * k(k+1)/2
    assert sum(r_sum.values()) == n * k * (k + 1) // 2
    # Kendall's W lives in [0, 1]
    assert 0.0 <= float(got.kendall_w.iloc[0]) <= 1.0


def test_friedman_plan_shape(spark):
    """One corpus scan to the (month, priority) cell grain — the
    bounded cell frame is cached and reused by the completeness
    filter, the ranking and the stat fold; ranks ride the calendar
    frame; nothing corpus-grain after the rollup."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(agg_friedman_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "windowspecdefinition" in p, p
    assert "CartesianProduct" not in p, p


# --- orders_auc_roc ---------------------------------------------------------------


def test_auc_python_recompute(spark):
    """Brute-force pairwise AUC (positives x negatives, ties count
    half) — the definition the rank-sum identity must reproduce."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    urgent = set(
        o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"].astype(int)
    )
    pos, neg = [], []
    for r in c.itertuples(index=False):
        (pos if int(r.c_custkey) in urgent else neg).append(
            float(r.c_acctbal)
        )
    wins = ties = 0
    for p_ in pos:
        for n_ in neg:
            if p_ > n_:
                wins += 1
            elif p_ == n_:
                ties += 1
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    got = orders_auc_roc(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_pos) == len(pos) and int(got.n_neg) == len(neg)
    assert abs(float(got.auc) - auc) < 2e-6
    assert abs(float(got.gini) - (2 * auc - 1)) < 4e-6
    q1 = auc / (2 - auc)
    q2 = 2 * auc * auc / (1 + auc)
    se = math.sqrt(
        (
            auc * (1 - auc)
            + (len(pos) - 1) * (q1 - auc * auc)
            + (len(neg) - 1) * (q2 - auc * auc)
        )
        / (len(pos) * len(neg))
    )
    assert abs(float(got.ci_lo) - (auc - 1.96 * se)) < 4e-6
    assert abs(float(got.ci_hi) - (auc + 1.96 * se)) < 4e-6
    assert bool(got.better_than_coin) == (float(got.ci_lo) > 0.5)
    assert 0.0 <= float(got.auc) <= 1.0


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_auc_both_classes_present(sf_dir):
    """Pinned fixture assumption: both classes populated (AUC needs
    n_pos > 0 and n_neg > 0)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    c = pd.read_parquet(sf_dir + "/customer.parquet")
    urgent = set(
        o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"].astype(int)
    )
    n_pos = sum(1 for k in c["c_custkey"].astype(int) if k in urgent)
    assert 0 < n_pos < len(c)


def test_auc_plan_shape(spark):
    """The corpus is never windowed at row grain: the value-grain
    rollup precedes the cumulative window (the spearman/kruskal
    ladder); the customer join is keyed, not broadcast-forced."""
    from tests.test_plans import plan

    p = plan(orders_auc_roc(spark, SF_SMOKE))
    assert "windowspecdefinition" in p, p
    assert "CartesianProduct" not in p, p


# --- text_compression_quality -----------------------------------------------------


def test_compression_python_zlib_identity(spark):
    """The rows-only oracle: recompute every (lang, source) cell with
    Python's zlib directly — SAME library, so equality is exact (the
    quantized per-doc ratios and integer micro-unit sums leave no
    tolerance gap)."""
    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    cells = {}
    for r in d.itertuples(index=False):
        raw = str(r.text).encode("utf-8")
        ratio = (
            len(zlib.compress(raw, _COMP_LEVEL)) / len(raw)
            if raw
            else 1.0
        )
        rq = math.floor(ratio * 1e6) / 1e6
        cell = cells.setdefault((r.lang, r.source), [0, 0, [], 0])
        cell[0] += 1
        cell[1] += math.floor(rq * 1e6)
        cell[2].append(rq)
        cell[3] += int(rq < _COMP_BOILERPLATE)
    got = text_compression_quality(spark, SF_SMOKE).toPandas()
    assert len(got) == len(cells)
    for (lang, source), (n, msum, ratios, nb) in cells.items():
        row = got[(got.lang == lang) & (got.source == source)].iloc[0]
        assert int(row.n_docs) == n
        assert (
            float(row.mean_ratio)
            == math.floor(msum / 1e6 / n * 1e6) / 1e6
        )
        assert float(row.min_ratio) == math.floor(min(ratios) * 1e6) / 1e6
        assert (
            float(row.boilerplate_share)
            == math.floor(nb / n * 1e6) / 1e6
        )


def test_compression_deterministic_and_bounded(spark):
    a = text_compression_quality(spark, SF_SMOKE).toPandas()
    b = text_compression_quality(spark, SF_SMOKE).toPandas()
    ka = sorted(repr(tuple(r)) for r in a.itertuples(index=False))
    kb = sorted(repr(tuple(r)) for r in b.itertuples(index=False))
    assert ka == kb
    # deflate of short natural text can exceed 1.0 slightly (header
    # overhead) but stays near it; ratios are positive
    assert (a["min_ratio"] > 0).all()
    assert (a["mean_ratio"] < 1.2).all()
    assert ((a["boilerplate_share"] >= 0) & (a["boilerplate_share"] <= 1)).all()


def test_compression_plan_shape(spark):
    """ONE Arrow-batched pandas UDF projection (ArrowEvalPython — the
    vectorized path, never row-at-a-time BatchEvalPython) over one
    scan, then a keyed rollup — no join, no window."""
    from tests.test_plans import plan

    p = plan(text_compression_quality(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "ArrowEvalPython" in p, p
    assert "BatchEvalPython" not in p, p
    assert "Join" not in p, p
