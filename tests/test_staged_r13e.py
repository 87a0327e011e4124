"""r13-staged keys, batch 5 — parked UNregistered (r13 lot now 17):

  orders_score_lift_table — gains/lift table over fixed-width score bands
  orders_permutation_test — md5 hash-randomization test for a mean diff
  search_ndcg_eval        — NDCG@10 / MRR@10 / precision@10 referee for
                            the BM25 ranking

Same contract set as the other staging files.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _LIFT_BANDS,
    _LIFT_ORACLE,
    _PERM_B,
    _PERM_ORACLE,
    orders_permutation_test,
    orders_score_lift_table,
)
from trireme_spark.queries.search import (
    _NDCG_K,
    _NDCG_ORACLE,
    _QUERY_TERMS,
    _REL_GRADE,
    search_ndcg_eval,
)

STAGED = {
    "orders_score_lift_table": (orders_score_lift_table, _LIFT_ORACLE),
    "orders_permutation_test": (orders_permutation_test, _PERM_ORACLE),
    "search_ndcg_eval": (search_ndcg_eval, _NDCG_ORACLE),
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


# --- orders_score_lift_table ------------------------------------------------------


def test_lift_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    urgent = set(
        o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"].astype(int)
    )
    lo, hi = float(c["c_acctbal"].min()), float(c["c_acctbal"].max())
    cells = {}
    for r in c.itertuples(index=False):
        band = min(
            _LIFT_BANDS - 1,
            math.floor((float(r.c_acctbal) - lo) * _LIFT_BANDS / (hi - lo)),
        )
        cell = cells.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += int(int(r.c_custkey) in urgent)
    n_tot = sum(v[0] for v in cells.values())
    pos_tot = sum(v[1] for v in cells.values())
    got = orders_score_lift_table(spark, SF_SMOKE).toPandas()
    assert len(got) == len(cells)
    cum_n = cum_pos = 0
    for band in sorted(cells, reverse=True):
        n, pos = cells[band]
        cum_n += n
        cum_pos += pos
        row = got[got.band == band].iloc[0]
        assert int(row.n) == n and int(row.n_pos) == pos
        assert abs(float(row.pos_rate) - pos / n) < 2e-6
        assert (
            abs(float(row.lift) - (pos / n) / (pos_tot / n_tot)) < 2e-6
        )
        assert abs(float(row.cum_capture) - cum_pos / pos_tot) < 2e-6
        assert abs(float(row.cum_share) - cum_n / n_tot) < 2e-6
    # gains-curve invariants: capture is monotone in share and ends at 1
    srt = got.sort_values("band", ascending=False)
    caps = list(srt.cum_capture)
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 2e-6


def test_lift_plan_shape(spark):
    """Orders scanned once; customer twice (range + join) — both
    column-pruned; the customer/label join is NOT an explicit
    broadcast (customer grows with the corpus — the planner may
    broadcast the fixture, a cluster plans by stats); windows ride the
    10-row band frame; no cartesian."""
    from tests.test_plans import plan

    p = plan(orders_score_lift_table(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 3, p
    assert "windowspecdefinition" in p, p
    assert "CartesianProduct" not in p, p


# --- orders_permutation_test ------------------------------------------------------


def _perm_u(k: int, b: int) -> float:
    # replicate b reads 8-hex window b%4 of digest b//4 (the
    # 4-uniforms-per-digest scheme; see the key's docstring)
    h = hashlib.md5(f"{k}|perm{b // 4}".encode()).hexdigest()
    w = h[8 * (b % 4): 8 * (b % 4) + 8]
    return int(w, 16) / 4294967296.0


def test_perm_python_recompute(spark):
    """Brute-force the B pseudo-randomizations in pure python (decimal
    sums via cents-exact floats are avoided: plain float sums over the
    DECIMAL(27,6)-quantized values match the production sums within the
    comparison tolerance at smoke scale)."""
    from decimal import ROUND_HALF_UP, Decimal

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    rows = [
        (
            int(r.o_orderkey),
            Decimal(repr(float(r.o_totalprice))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            ),
            r.o_orderpriority == "1-URGENT",
        )
        for r in o.itertuples(index=False)
    ]
    n = len(rows)
    n_a = sum(1 for _, _, a in rows if a)
    s_a = sum((v for _, v, a in rows if a), Decimal(0))
    s_r = sum((v for _, v, a in rows if not a), Decimal(0))
    d_obs = math.floor(
        (float(s_a) / n_a - float(s_r) / (n - n_a)) * 1e6
    )
    thr = n_a / n
    extreme = 0
    n_valid = 0
    for b in range(_PERM_B):
        pa = [(k, v) for k, v, _ in rows if _perm_u(k, b) < thr]
        if not pa or len(pa) == n:
            continue
        n_valid += 1
        # the production plan derives the rest side from the observed
        # totals (s_r = tot - s_a in double); the recompute derives all
        # INPUTS independently and evaluates the same algebra shape so
        # the floor boundary agrees
        s_a_b = float(sum(v for _, v in pa))
        d = math.floor(
            (
                s_a_b / len(pa)
                - (float(s_a) + float(s_r) - s_a_b) / (n - len(pa))
            )
            * 1e6
        )
        if abs(d) >= abs(d_obs):
            extreme += 1
    got = orders_permutation_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == n and int(got.n_urgent) == n_a
    assert abs(float(got.diff_obs) - d_obs / 1e6) < 2e-6
    assert int(got.n_permutations) == _PERM_B
    assert int(got.n_extreme) == extreme
    p_ref = (1.0 + extreme) / (_PERM_B + 1.0)
    assert abs(float(got.p_value) - p_ref) < 2e-6
    assert n_valid == _PERM_B  # no degenerate replicate on the fixture
    # randomization-test sanity: p in (0, 1]
    assert 0.0 < float(got.p_value) <= 1.0


def test_perm_plan_shape(spark):
    """Exactly two corpus scans (observed stats + the fan-out, with the
    observed stats riding the broadcast INTO the fan); the x64
    replicate spine is a Generate (explode), map-side-combined to 2B
    cells — no cartesian, no corpus self-join."""
    from tests.test_plans import plan

    p = plan(orders_permutation_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "Generate" in p, p
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p


# --- search_ndcg_eval -------------------------------------------------------------


def _ndcg_ref(sf_dir):
    """Textbook NDCG/MRR/precision from scratch: python BM25 (same
    constants), gains by set membership, discounts via math.log2 —
    NOT the pinned literal tables the implementation uses."""
    d = pd.read_parquet(sf_dir + "/documents.parquet")
    toks = {
        int(r.doc_id): re.split(r"\s+", str(r.text).lower())
        for r in d.itertuples(index=False)
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {}
    for doc, ts in toks.items():
        for t in ts:
            if t in _QUERY_TERMS:
                tf[(doc, t)] = tf.get((doc, t), 0) + 1
    df = {}
    for (_, t), _c in tf.items():
        df[t] = df.get(t, 0) + 1
    from decimal import ROUND_HALF_UP, Decimal

    scores = {}
    for (doc, t), c in tf.items():
        idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        dl = len(toks[doc])
        s = idf * (c * 2.2) / (c + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        scores[doc] = scores.get(doc, Decimal(0)) + Decimal(
            repr(s)
        ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    ranked = sorted(
        ((round(float(s), 4), doc) for doc, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )[:_NDCG_K]
    gains = {}
    for doc, _ in scores.items():
        gains[doc] = len(
            {t for t in _QUERY_TERMS if (doc, t) in tf}
        )
    dcg = 0.0
    first_rel = None
    n_rel = 0
    for i, (_, doc) in enumerate(ranked, start=1):
        g = gains.get(doc, 0)
        dcg += (2**g - 1) / math.log2(i + 1)
        if g >= _REL_GRADE:
            n_rel += 1
            if first_rel is None:
                first_rel = i
    ideal = sorted(gains.values(), reverse=True)[:_NDCG_K]
    idcg = sum(
        (2**g - 1) / math.log2(i + 1)
        for i, g in enumerate(ideal, start=1)
    )
    return (
        dcg,
        idcg,
        dcg / idcg,
        (1.0 / first_rel) if first_rel else 0.0,
        n_rel / _NDCG_K,
    )


def test_ndcg_python_recompute(spark):
    dcg, idcg, ndcg, mrr, prec = _ndcg_ref(SF_SMOKE)
    got = search_ndcg_eval(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.k) == _NDCG_K
    assert abs(float(got.dcg_k) - dcg) < 5e-6
    assert abs(float(got.idcg_k) - idcg) < 5e-6
    assert abs(float(got.ndcg) - ndcg) < 5e-6
    assert abs(float(got.mrr) - mrr) < 2e-6
    assert abs(float(got.precision_k) - prec) < 2e-6
    # referee sanity: all metrics in [0, 1], dcg <= idcg
    assert 0.0 <= float(got.ndcg) <= 1.0
    assert float(got.dcg_k) <= float(got.idcg_k) + 1e-9
    assert 0.0 <= float(got.mrr) <= 1.0


def test_ndcg_plan_shape(spark):
    """Exactly two parquet scans (corpus stats + the postings build);
    the cached postings frame serves the ranking, the gain join and
    the histogram (InMemoryTableScan present); top-k folds into
    TakeOrderedAndProject; no cartesian."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(search_ndcg_eval(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 2, p
    assert "InMemoryTableScan" in p, p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p, p
