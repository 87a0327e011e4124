"""r16-staged keys, batch 5 — parked UNregistered (r16 lot at the
FULL 20-key cap):

  graph_katz_truncated    — 3-step β-walk centrality, top-20 (exact
                            integer walk counts)
  text_kneser_ney_bigram  — interpolated KN bigram LM score per doc
                            (continuation-count backoff; sums to 1)
  embed_cka_linear        — linear CKA between the 64-d space and its
                            32-d matryoshka prefix, from d×d moments
  lineitem_bullwhip_ratio — CV²(ordered)/CV²(shipped) variance
                            amplification

Same contract set as the other staging files.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.joins import (
    _KATZ_B1,
    _KATZ_B2,
    _KATZ_B3,
    _KATZ_ORACLE,
    _KATZ_TOPN,
    graph_katz_truncated,
)
from trireme_spark.queries.llm_sim import (
    _CKA_D,
    _CKA_H,
    _CKA_ORACLE,
    embed_cka_linear,
)
from trireme_spark.queries.llm_text import (
    _KN_D,
    _KN_ORACLE,
    text_kneser_ney_bigram,
)
from trireme_spark.queries.timeseries import (
    _BW_ORACLE,
    lineitem_bullwhip_ratio,
)

STAGED = {
    "graph_katz_truncated": (graph_katz_truncated, _KATZ_ORACLE),
    "text_kneser_ney_bigram": (text_kneser_ney_bigram, _KN_ORACLE),
    "embed_cka_linear": (embed_cka_linear, _CKA_ORACLE),
    "lineitem_bullwhip_ratio": (lineitem_bullwhip_ratio, _BW_ORACLE),
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


# --- graph_katz_truncated -------------------------------------------------------


def _katz_graph(sf_dir: str):
    li = pd.read_parquet(sf_dir + "/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    pair_counts = Counter()
    for _, sub in li.groupby("l_orderkey"):
        parts = sorted(sub.l_partkey.unique())
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_counts[(parts[i], parts[j])] += 1
    adj = defaultdict(list)
    for (x, y), c in pair_counts.items():
        if c >= 2:
            adj[x].append(y)
            adj[y].append(x)
    return adj


def test_katz_python_recompute(spark):
    adj = _katz_graph(SF_SMOKE)
    w1 = {v: len(nbrs) for v, nbrs in adj.items()}
    w2 = {v: sum(w1[u] for u in nbrs) for v, nbrs in adj.items()}
    w3 = {v: sum(w2[u] for u in nbrs) for v, nbrs in adj.items()}
    katz = {
        v: math.floor(
            (w1[v] * _KATZ_B1 + w2[v] * _KATZ_B2 + w3[v] * _KATZ_B3)
            * 1e6
        )
        / 1e6
        for v in adj
    }
    top = sorted(katz.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_KATZ_TOPN
    ]
    got = (
        graph_katz_truncated(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["katz", "part_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(got) == min(_KATZ_TOPN, len(adj))
    for row, (v, c) in zip(got.itertuples(index=False), top):
        assert row.part_id == v
        assert row.walks1 == w1[v]
        assert row.walks2 == w2[v]
        assert row.walks3 == w3[v]
        assert float(row.katz) == c


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_katz_fixture_assumptions(sf_dir):
    """The edge-gated graph keeps ≥ 20 nodes (a full top-N) at both
    scales."""
    adj = _katz_graph(sf_dir)
    assert len(adj) >= _KATZ_TOPN


def test_katz_walk_monotonicity(spark):
    """Walk counts are exact integers and walks₂(v) = Σ_nbr deg(nbr) ≥
    deg(v) on a graph with min degree 1 — and the top-N ordering is
    strictly consistent with the emitted score."""
    got = graph_katz_truncated(spark, SF_SMOKE).toPandas()
    assert (got.walks1 >= 1).all()
    assert (got.walks2 >= got.walks1).all()
    ks = got.katz.tolist()
    assert ks == sorted(ks, reverse=True)


def test_katz_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(graph_katz_truncated(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p


# --- text_kneser_ney_bigram -----------------------------------------------------


def _kn_model(sf_dir: str):
    docs = pd.read_parquet(sf_dir + "/documents.parquet")
    import re

    bigrams_by_doc = {}
    cbg = Counter()
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [t for t in re.split(r"\s+", text.lower()) if t != ""]
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            bigrams_by_doc[doc_id] = bgs
            cbg.update(bgs)
    c1 = Counter()
    fw = Counter()
    bw = Counter()
    for (w1, w2), c in cbg.items():
        c1[w1] += c
        fw[w1] += 1
        bw[w2] += 1
    nb = len(cbg)
    return bigrams_by_doc, cbg, c1, fw, bw, nb


def _kn_p(pair, cbg, c1, fw, bw, nb):
    w1, w2 = pair
    return (
        max(cbg.get(pair, 0) - _KN_D, 0)
        + _KN_D * fw[w1] * (bw.get(w2, 0) / nb)
    ) / c1[w1]


def test_kn_python_recompute(spark):
    bigrams_by_doc, cbg, c1, fw, bw, nb = _kn_model(SF_SMOKE)
    got = (
        text_kneser_ney_bigram(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
    )
    assert set(got.index) == set(bigrams_by_doc)
    for doc_id in list(bigrams_by_doc)[:50]:
        bgs = bigrams_by_doc[doc_id]
        avg = sum(
            math.log(_kn_p(p, cbg, c1, fw, bw, nb)) for p in bgs
        ) / len(bgs)
        row = got.loc[doc_id]
        assert int(row.n_bigrams) == len(bgs)
        assert abs(float(row.avg_kn_logprob) - avg) < 2e-4


@pytest.mark.parametrize("sf_dir", [SF_SMOKE])
def test_kn_sums_to_one_per_context(sf_dir):
    """Interpolated KN with every observed c₁₂ ≥ 1 > D sums to EXACTLY
    1 over the seen vocabulary for any context — the normalization
    identity, checked on the three highest-frequency contexts."""
    _, cbg, c1, fw, bw, nb = _kn_model(sf_dir)
    vocab = set(bw)
    for w1, _ in Counter(c1).most_common(3):
        total = sum(
            _kn_p((w1, w2), cbg, c1, fw, bw, nb) for w2 in vocab
        )
        assert abs(total - 1.0) < 1e-9, (w1, total)


def test_kn_rewards_collocations_vs_addone(spark):
    """KN's continuation backoff must separate from add-one: the two
    scores are NOT a monotone transform of each other on the fixture
    (rank correlation < 0.999), while both remain finite/negative."""
    from trireme_spark.queries.llm_text import text_bigram_logprob

    kn = (
        text_kneser_ney_bigram(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
        .avg_kn_logprob
    )
    ao = (
        text_bigram_logprob(spark, SF_SMOKE)
        .toPandas()
        .set_index("doc_id")
        .avg_bigram_logprob
    )
    joined = pd.concat([kn, ao], axis=1).dropna()
    # spearman = pearson of midranks (pandas' spearman needs scipy)
    rho = (
        joined.avg_kn_logprob.rank()
        .corr(joined.avg_bigram_logprob.rank())
    )
    assert (kn < 0).all()
    assert rho < 0.999
    assert rho > 0.2  # same broad quality signal, different smoothing


def test_kn_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(text_kneser_ney_bigram(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition" not in p, p


# --- embed_cka_linear -----------------------------------------------------------


def _cka_numpy(sf_dir: str, h: int):
    e = pd.read_parquet(sf_dir + "/embeddings.parquet")
    x = np.stack(e.embedding.to_numpy()).astype(np.float64)
    n = len(x)
    c = x.T @ x / n - np.outer(x.mean(0), x.mean(0))
    fxx = (c * c).sum()
    fyy = (c[:h, :h] * c[:h, :h]).sum()
    fxy = (c[:, :h] * c[:, :h]).sum()
    return n, fxy / (math.sqrt(fxx) * math.sqrt(fyy))


def test_cka_numpy_recompute(spark):
    n, cka = _cka_numpy(SF_SMOKE, _CKA_H)
    got = embed_cka_linear(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_vectors) == n
    assert int(got.dim_full) == _CKA_D
    assert int(got.dim_half) == _CKA_H
    assert abs(float(got.cka) - cka) < 1e-4


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_cka_bounds_and_self_identity(sf_dir):
    """0 < CKA ≤ 1 (Cauchy-Schwarz on the Frobenius inner product),
    and the same formula with h = d gives exactly 1 — the
    self-similarity identity, verified in numpy."""
    _, cka = _cka_numpy(sf_dir, _CKA_H)
    assert 0 < cka <= 1 + 1e-12
    _, self_cka = _cka_numpy(sf_dir, _CKA_D)
    assert abs(self_cka - 1.0) < 1e-12


def test_cka_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(embed_cka_linear(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p
    assert "windowspecdefinition" not in p, p


# --- lineitem_bullwhip_ratio ------------------------------------------------------


def _q6(x) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _bw_recompute(sf_dir: str):
    li = pd.read_parquet(sf_dir + "/lineitem.parquet")
    o = pd.read_parquet(sf_dir + "/orders.parquet")[
        ["o_orderkey", "o_orderdate"]
    ]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")

    def series_cv2(frame, datecol):
        m = frame[datecol].dt.year * 12 + frame[datecol].dt.month
        g = frame.groupby(m).l_quantity.agg(
            lambda s: float(sum(_q6(v) for v in s))
        )
        mean = float(sum(_q6(v) for v in g)) / len(g)
        x = g / mean
        return len(g), float(((x - 1) ** 2).sum()) / (len(g) - 1)

    n_o, cv2_o = series_cv2(j, "o_orderdate")
    n_s, cv2_s = series_cv2(li, "l_shipdate")
    return n_o, n_s, cv2_o, cv2_s


def test_bw_python_recompute(spark):
    n_o, n_s, cv2_o, cv2_s = _bw_recompute(SF_SMOKE)
    got = lineitem_bullwhip_ratio(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_months_ordered) == n_o
    assert int(got.n_months_shipped) == n_s
    assert abs(float(got.cv2_ordered) - cv2_o) < 2e-6
    assert abs(float(got.cv2_shipped) - cv2_s) < 2e-6
    assert abs(float(got.bullwhip_ratio) - cv2_o / cv2_s) < 1e-5
    assert bool(got.amplifying) == (float(got.bullwhip_ratio) > 1)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_bw_fixture_assumptions(sf_dir):
    """Both monthly series span ≥ 60 months with positive variance at
    both scales (the ship-date tail extends past the last order
    month)."""
    n_o, n_s, cv2_o, cv2_s = _bw_recompute(sf_dir)
    assert n_o >= 60 and n_s >= 60
    assert cv2_o > 0 and cv2_s > 0


def test_bw_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(lineitem_bullwhip_ratio(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "CartesianProduct" not in p, p
