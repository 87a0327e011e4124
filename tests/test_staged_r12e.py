"""r12-staged keys, batch 5 — built and verified this round ahead of the
r12 registration (the post-428 cadence; SURVEY round-11 log). Five more
keys, parked UNregistered for the r12 flip:

  text_mcnemar_test          — paired disagreement-direction test
  text_log_odds_dirichlet    — Fightin' Words corpus comparison
  agg_tukey_hsd              — studentized-range post-hoc after ANOVA
  lineitem_fe_within_regression — two-way fixed-effects within estimator
  ts_dtw_distance            — elastic seasonal-shape distance
                               (ROWS-ONLY at flip: iterative DP state —
                               the graph_kcore precedent; its rows_only.py
                               entry cites test_dtw_python_recompute here)

Same contract set as tests/test_staged_r12.py (oracle parity at the smoke
AND grading scales for the four oracled keys; DTW carries a
first-principles recompute plus structural invariants instead), an
independent recompute per key, a plan-shape pin, layout invariance, and a
registration-consistency guard that holds before AND after the flip.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _FE_WITHIN_ORACLE,
    _TUKEY_ORACLE,
    agg_tukey_hsd,
    lineitem_fe_within_regression,
)
from trireme_spark.queries.llm_text import (
    _LOGODDS_A0,
    _LOGODDS_ORACLE,
    _MCNEMAR_ORACLE,
    text_log_odds_dirichlet,
    text_mcnemar_test,
)
from trireme_spark.queries.timeseries import ts_dtw_distance

ORACLED = {
    "text_mcnemar_test": (text_mcnemar_test, _MCNEMAR_ORACLE),
    "text_log_odds_dirichlet": (
        text_log_odds_dirichlet,
        _LOGODDS_ORACLE,
    ),
    "agg_tukey_hsd": (agg_tukey_hsd, _TUKEY_ORACLE),
    "lineitem_fe_within_regression": (
        lineitem_fe_within_regression,
        _FE_WITHIN_ORACLE,
    ),
}
STAGED = dict(ORACLED)
STAGED["ts_dtw_distance"] = (ts_dtw_distance, None)


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
    """Holds on both sides of the r12 flip: while staged the key must
    NOT be registered; once it registers, its oracle must be the staged
    constant (None for the rows-only DTW — which must then appear in
    the rows_only manifest) and it must own a sweep slot."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
        if oracle is None:
            from trireme_spark.rows_only import ROWS_ONLY

            assert key in ROWS_ONLY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


def _dec6(v) -> Decimal:
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- text_mcnemar_test ----------------------------------------------------------


def test_mcnemar_python_recompute(spark):
    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    got = text_mcnemar_test(spark, SF_SMOKE).toPandas()
    for lang, sub in d.groupby("lang"):
        a = sub.n_chars >= 380
        btok = sub.text.str.strip().str.split().str.len() >= 64
        b = int((a & ~btok).sum())
        c = int((btok & ~a).sum())
        stat = (
            0.0
            if b + c == 0
            else math.floor(
                (abs(b - c) - 1) ** 2 / (b + c) * 1e6
            )
            / 1e6
        )
        row = got[got.lang == lang].iloc[0]
        assert int(row.a_only) == b and int(row.b_only) == c, lang
        assert abs(float(row.mcnemar_chi2) - stat) < 2e-6, lang
        assert bool(row.asymmetric) == (stat > 3.841), lang


def test_mcnemar_plan_shape(spark):
    """One corpus pass to per-language cells; no join, no window."""
    from tests.test_plans import plan

    p = plan(text_mcnemar_test(spark, SF_SMOKE))
    assert "Join" not in p, p
    assert p.count("Location: InMemoryFileIndex") == 1, p


# --- text_log_odds_dirichlet ----------------------------------------------------


def test_log_odds_python_recompute(spark):
    """First-principles Monroe/Colaresi/Quinn z-scores from raw token
    counts; both leaderboards re-derived with the same tie rule."""
    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    d = d[d.lang.isin(["en", "fr"])]
    counts = {}
    for r in d.itertuples(index=False):
        for tok in str(r.text).lower().split():
            ye, yf = counts.setdefault(tok, [0, 0])
            if r.lang == "en":
                counts[tok][0] = ye + 1
            else:
                counts[tok][1] = yf + 1
    n_en = sum(v[0] for v in counts.values())
    n_fr = sum(v[1] for v in counts.values())
    z = {}
    for tok, (ye, yf) in counts.items():
        alpha = _LOGODDS_A0 * (ye + yf) / (n_en + n_fr)
        lo_en = math.log(
            (ye + alpha) / (n_en + _LOGODDS_A0 - ye - alpha)
        )
        lo_fr = math.log(
            (yf + alpha) / (n_fr + _LOGODDS_A0 - yf - alpha)
        )
        var = 1.0 / (ye + alpha) + 1.0 / (yf + alpha)
        z[tok] = math.floor(
            (lo_en - lo_fr) / math.sqrt(var) * 1e6
        ) / 1e6
    top_en = sorted(z.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_fr = sorted(z.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    got = text_log_odds_dirichlet(spark, SF_SMOKE).toPandas()
    ge = got[got.leans == "en"].sort_values(
        ["z", "token"], ascending=[False, True]
    )
    gf = got[got.leans == "fr"].sort_values(["z", "token"])
    assert [
        (r.token, float(r.z)) for r in ge.itertuples(index=False)
    ] == [(t, v) for t, v in top_en]
    assert [
        (r.token, float(r.z)) for r in gf.itertuples(index=False)
    ] == [(t, v) for t, v in top_fr]
    for r in got.itertuples(index=False):
        assert (int(r.y_en), int(r.y_fr)) == tuple(counts[r.token])


def test_log_odds_plan_shape(spark):
    """One tokenize-explode scan, conditional per-corpus counts (no
    per-corpus passes); totals/ranks are windows on the same lineage and
    the two leaderboards leave through one explode — so the corpus scan
    appears EXACTLY once and there is no join at all."""
    from tests.test_plans import plan

    p = plan(text_log_odds_dirichlet(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Generate" in p, p
    assert "Join" not in p, p
    assert "windowspecdefinition" in p, p


# --- agg_tukey_hsd --------------------------------------------------------------


def test_tukey_hsd_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    groups = {
        p: sub.o_totalprice.to_numpy()
        for p, sub in o.groupby("o_orderpriority")
    }
    means = {
        p: float(sum(_dec6(v) for v in vals)) / len(vals)
        for p, vals in groups.items()
    }
    ssw = sum(
        float(
            sum(
                Decimal(repr(round((v - means[p]) ** 2, 4))).quantize(
                    Decimal("0.0001")
                )
                for v in vals
            )
        )
        for p, vals in groups.items()
    )
    nt = sum(len(v) for v in groups.values())
    msw = ssw / (nt - 5)
    got = agg_tukey_hsd(spark, SF_SMOKE).toPandas()
    prios = sorted(groups)
    assert len(got) == 10
    for r in got.itertuples(index=False):
        na, nb = len(groups[r.prio_a]), len(groups[r.prio_b])
        diff = abs(means[r.prio_a] - means[r.prio_b])
        q = diff / math.sqrt(msw / 2 * (1 / na + 1 / nb))
        assert (int(r.n_a), int(r.n_b)) == (na, nb)
        assert abs(float(r.mean_diff) - diff) < 1e-3
        assert abs(float(r.q_stat) - q) < 1e-4
        assert bool(r.significant) == (float(r.q_stat) > 3.858)
    assert [
        (r.prio_a, r.prio_b) for r in got.sort_values(
            ["prio_a", "prio_b"]
        ).itertuples(index=False)
    ] == [(a, b) for i, a in enumerate(prios) for b in prios[i + 1 :]]


def test_tukey_hsd_plan_shape(spark):
    """ANOVA's two-pass shape: means pass + centered SSW pass with the
    5-row means broadcast; the pair lattice is metadata."""
    from tests.test_plans import plan

    p = plan(agg_tukey_hsd(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "windowspecdefinition" not in p, p


# --- lineitem_fe_within_regression ----------------------------------------------


def test_fe_within_python_recompute(spark):
    """First-principles within-estimator via pandas demeaning (float
    means, NOT the decimal ladder) — agreement within quantization
    tolerance validates the algebra, not just the ladder."""
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    li["t"] = li.l_shipdate.values.astype("datetime64[M]")
    x = li.l_discount.astype(float)
    y = li.l_quantity.astype(float)
    xi = x.groupby(li.l_partkey).transform("mean")
    yi = y.groupby(li.l_partkey).transform("mean")
    xt = x.groupby(li.t).transform("mean")
    yt = y.groupby(li.t).transform("mean")
    xd = x - xi - xt + x.mean()
    yd = y - yi - yt + y.mean()
    slope = float((xd * yd).sum() / (xd * xd).sum())
    r2 = float(
        (xd * yd).sum() ** 2 / ((xd * xd).sum() * (yd * yd).sum())
    )
    got = lineitem_fe_within_regression(spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_rows) == len(li)
    assert abs(float(row.slope) - slope) < 1e-4
    assert abs(float(row.r2_within) - r2) < 1e-4


def test_fe_within_plan_shape(spark):
    """Two-pass within estimator: the part-mean table joins by KEY
    (never broadcast — it is corpus-dimension), month/global means
    broadcast; the output is one sufficient-statistics row."""
    from tests.test_plans import plan

    p = plan(lineitem_fe_within_regression(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # 1-row global means


# --- ts_dtw_distance ------------------------------------------------------------


def test_dtw_python_recompute(spark):
    """Full-equality recompute: profiles from raw parquet (decimal
    shares), textbook DTW DP, exact float comparison (single python
    evaluator — no cross-engine ladder needed)."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["m"] = df.o_orderdate.dt.month
    profs = {}
    for seg, sub in df.groupby("c_mktsegment"):
        tot = {}
        for r in sub.itertuples(index=False):
            tot[int(r.m)] = tot.get(int(r.m), Decimal(0)) + _dec6(
                r.o_totalprice
            )
        s = sum(tot.values())
        profs[seg] = [
            float(tot.get(m, Decimal(0))) / float(s)
            if s
            else 0.0
            for m in range(1, 13)
        ]
    # mirror the Spark side's double division rev/sum at decimal inputs
    got = ts_dtw_distance(spark, SF_SMOKE).toPandas()
    segs = sorted(profs)
    assert len(got) == len(segs) * (len(segs) - 1) // 2

    def dtw(va, vb):
        n = len(va)
        inf = float("inf")
        D = [[inf] * (n + 1) for _ in range(n + 1)]
        D[0][0] = 0.0
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                cost = abs(va[i - 1] - vb[j - 1])
                D[i][j] = cost + min(
                    D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
                )
        return D[n][n]

    for r in got.itertuples(index=False):
        va, vb = profs[r.seg_a], profs[r.seg_b]
        assert abs(float(r.dtw_distance) - dtw(va, vb)) < 1e-12, (
            r.seg_a,
            r.seg_b,
        )
        l1 = sum(abs(a - b) for a, b in zip(va, vb))
        assert abs(float(r.lockstep_l1) - l1) < 1e-12
        # the elastic relaxation can only help: dtw <= lock-step L1
        assert float(r.dtw_distance) <= float(r.lockstep_l1) + 1e-12


def test_dtw_nonnegative_and_deterministic(spark):
    """Structural invariants carried by the rows-only contract:
    distances are non-negative, and two independent evaluations of the
    Arrow-batched DP agree bit-for-bit (no nondeterministic state in
    the pandas stage)."""
    from pyspark.sql import functions as F

    spark_df = ts_dtw_distance(spark, SF_SMOKE)
    assert spark_df.where(F.col("dtw_distance") < 0).count() == 0
    first = spark_df.toPandas()
    again = ts_dtw_distance(spark, SF_SMOKE).toPandas()
    m1 = {(r.seg_a, r.seg_b): r.dtw_distance for r in first.itertuples()}
    m2 = {(r.seg_a, r.seg_b): r.dtw_distance for r in again.itertuples()}
    assert m1 == m2


def test_dtw_plan_shape(spark):
    """Corpus reduces once to (segment, month); the DP is an
    Arrow-batched stage over the bounded pair frame — no row-python
    UDF, no cartesian over the corpus."""
    from tests.test_plans import plan

    p = plan(ts_dtw_distance(spark, SF_SMOKE))
    assert "ArrowEvalPython" in p or "MapInPandas" in p, p
    assert "BatchEvalPython" not in p, p
    assert "BroadcastHashJoin" in p, p  # customer dim broadcast


# --- layout invariance ----------------------------------------------------------


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
