"""r13-staged keys, batch 2 — parked UNregistered for the r13 cadence
batch (8 r13-staged total with tests/test_staged_r13.py):

  ts_granger_f_test   — directed predictive causality (lag-1 F-test)
  agg_kruskal_wallis  — k-group rank ANOVA (tie-corrected H)
  agg_brown_forsythe  — median-based variance-homogeneity test
  embed_knn_label_eval — leave-one-out 5-NN label accuracy

Same contract set as the other staging files: driver-style oracle parity
at the smoke AND grading scales, an independent recompute, a plan-shape
pin, layout invariance, and a registration-consistency guard.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _BROWN_FORSYTHE_ORACLE,
    _KRUSKAL_ORACLE,
    agg_brown_forsythe,
    agg_kruskal_wallis,
)
from trireme_spark.queries.llm_sim import (
    _KNN_EVAL_ORACLE,
    embed_knn_label_eval,
)
from trireme_spark.queries.timeseries import (
    _GRANGER_ORACLE,
    ts_granger_f_test,
)

STAGED = {
    "ts_granger_f_test": (ts_granger_f_test, _GRANGER_ORACLE),
    "agg_kruskal_wallis": (agg_kruskal_wallis, _KRUSKAL_ORACLE),
    "agg_brown_forsythe": (agg_brown_forsythe, _BROWN_FORSYTHE_ORACLE),
    "embed_knn_label_eval": (embed_knn_label_eval, _KNN_EVAL_ORACLE),
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


def _dec6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _daily_xy():
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["dd"] = (
        df.o_orderdate - pd.Timestamp("1990-01-01")
    ).dt.days.astype(int)
    daily = {}
    for r in df.itertuples(index=False):
        x, y = daily.setdefault(int(r.dd), [Decimal(0), Decimal(0)])
        if r.c_mktsegment == "BUILDING":
            daily[int(r.dd)][0] = x + _dec6(r.o_totalprice)
        if r.c_mktsegment == "MACHINERY":
            daily[int(r.dd)][1] = y + _dec6(r.o_totalprice)
    return {d: (float(x), float(y)) for d, (x, y) in daily.items()}


# --- ts_granger_f_test ----------------------------------------------------------


def test_granger_python_recompute(spark):
    """numpy lstsq residuals for the restricted/unrestricted fits —
    validates the Cramer's-rule sufficient-statistic algebra against
    an entirely different solver."""
    import numpy as np

    series = _daily_xy()
    rows = [
        (series[d][1], series[d - 1][1], series[d - 1][0])
        for d in sorted(series)
        if d - 1 in series
    ]
    y = np.array([r[0] for r in rows])
    yl = np.array([r[1] for r in rows])
    xl = np.array([r[2] for r in rows])
    ones = np.ones_like(y)

    def ssr(X):
        beta, *_ = np.linalg.lstsq(X.T, y, rcond=None)
        resid = y - X.T @ beta
        return float(resid @ resid)

    ssr_r = ssr(np.vstack([ones, yl]))
    ssr_u = ssr(np.vstack([ones, yl, xl]))
    n = len(rows)
    f_ref = (ssr_r - ssr_u) / (ssr_u / (n - 3))
    got = ts_granger_f_test(spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_days) == n
    assert abs(float(row.f_stat) - f_ref) < 1e-3
    assert bool(row.x_granger_causes_y) == (float(row.f_stat) > 3.84)
    assert 0 <= float(row.r2_restricted) <= float(row.r2_unrestricted)


def test_granger_plan_shape(spark):
    """One day-grain rollup, one keyed lag self-join on the bounded
    series, one 1-row moment aggregation — no corpus-scale window."""
    from tests.test_plans import plan

    p = plan(ts_granger_f_test(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition" not in p, p


# --- agg_kruskal_wallis ---------------------------------------------------------


def test_kruskal_python_recompute(spark):
    """pandas average ranks (an entirely different rank path than the
    value-grain ladder) + the textbook H and tie correction."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    ranks = o.o_totalprice.rank(method="average")
    n = len(o)
    srr = 0.0
    for _, idx in o.groupby("o_orderpriority").groups.items():
        r_g = float(ranks.loc[idx].sum())
        srr += r_g * r_g / len(idx)
    h = 12.0 / (n * (n + 1)) * srr - 3 * (n + 1)
    t = o.o_totalprice.value_counts()
    c = 1 - float((t**3 - t).sum()) / (n**3 - n)
    got = agg_kruskal_wallis(spark, SF_SMOKE).toPandas()
    row = got.iloc[0]
    assert int(row.n_rows) == n and int(row.n_groups) == 5
    assert abs(float(row.h) - h) < 1e-4
    assert abs(float(row.h_tie_corrected) - h / c) < 1e-4
    assert bool(row.significant) == (float(row.h_tie_corrected) > 9.488)


def test_kruskal_plan_shape(spark):
    """Value-grain cumulative window under a meta_part spec (the
    spearman ladder) — ranks never materialize at row grain."""
    from tests.test_plans import plan

    p = plan(agg_kruskal_wallis(spark, SF_SMOKE))
    assert "windowspecdefinition" in p, p
    assert "shiftright" in p, p
    assert "CartesianProduct" not in p, p


# --- agg_brown_forsythe ---------------------------------------------------------


def test_brown_forsythe_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    groups = {
        p_: sorted(sub.o_totalprice.tolist())
        for p_, sub in o.groupby("o_orderpriority")
    }
    meds = {
        p_: vals[math.ceil(len(vals) / 2) - 1]
        for p_, vals in groups.items()
    }
    z = {
        p_: [abs(v - meds[p_]) for v in vals]
        for p_, vals in groups.items()
    }
    k = len(z)
    nt = sum(len(v) for v in z.values())
    means = {p_: sum(v) / len(v) for p_, v in z.items()}
    gmean = sum(sum(v) for v in z.values()) / nt
    ssb = sum(
        len(v) * (means[p_] - gmean) ** 2 for p_, v in z.items()
    )
    ssw = sum(
        sum((x - means[p_]) ** 2 for x in v) for p_, v in z.items()
    )
    f_ref = (ssb / (k - 1)) / (ssw / (nt - k))
    got = agg_brown_forsythe(spark, SF_SMOKE).toPandas()
    row = got.iloc[0]
    assert int(row.n_rows) == nt and int(row.n_groups) == k
    assert abs(float(row.f_stat) - f_ref) < 1e-3
    assert bool(row.heteroscedastic) == (float(row.f_stat) > 2.372)


def test_brown_forsythe_plan_shape(spark):
    """Within-group cumulative window finds the medians at value grain;
    the z pass re-scans once with the 5-row median table broadcast."""
    from tests.test_plans import plan

    p = plan(agg_brown_forsythe(spark, SF_SMOKE))
    assert "windowspecdefinition" in p, p
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


# --- embed_knn_label_eval -------------------------------------------------------


def test_knn_label_eval_python_recompute(spark):
    """Brute-force python cosine 5-NN + majority vote with the
    (count desc, label asc) tie rule — exact count agreement."""
    import numpy as np

    e = pd.read_parquet(SF_SMOKE + "/embeddings.parquet")
    ids = e.vec_id.to_numpy()
    labels = {int(i): int(l) for i, l in zip(e.vec_id, e.label)}
    M = np.stack(e.embedding.to_numpy()).astype("float64")
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    per_label = {}
    for r, i in enumerate(ids):
        order = sorted(
            ((-S[r, c], ids[c]) for c in range(len(ids)) if c != r)
        )[:5]
        votes = {}
        for _, nid in order:
            votes[labels[int(nid)]] = votes.get(labels[int(nid)], 0) + 1
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        n, good = per_label.setdefault(labels[int(i)], [0, 0])
        per_label[labels[int(i)]] = [
            n + 1,
            good + (pred == labels[int(i)]),
        ]
    got = embed_knn_label_eval(spark, SF_SMOKE).toPandas()
    assert len(got) == len(per_label)
    for r in got.itertuples(index=False):
        n, good = per_label[int(r.label)]
        assert int(r.n_vectors) == n, r.label
        assert int(r.n_correct) == good, r.label
        assert float(r.accuracy) == math.floor(good / n * 1e6) / 1e6


def test_knn_label_eval_plan_shape(spark):
    """The graph comes from the Arrow-batched block-pair GEMM (no
    driver corpus, no row-python UDF); the vote is a keyed count plus
    a bounded argmax window."""
    from tests.test_plans import plan

    p = plan(embed_knn_label_eval(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in p, p
    assert "BatchEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# --- layout invariance -----------------------------------------------------------


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
