"""Second r11 cadence batch — full contracts for the six keys registered
after the nine-key batch (SURVEY round-11 log).

Driver-style oracle parity at both scales is carried automatically by
tests/test_oracle.py (the keys are registered). This module adds the rest
of the cadence discipline: an INDEPENDENT recompute per key (pandas/
numpy/pure-python straight off the parquet — no Spark expressions, no
DuckDB), a plan-shape pin per key, and layout invariance under the
hostile configuration.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE, hostile_layout
from tests.test_cadence_r11 import _by_month, _daily
from trireme_spark import registry

CADENCE2_KEYS = [
    "agg_hodges_lehmann",
    "text_annotator_agreement",
    "orders_mom_revenue_bridge",
    "graph_two_hop_recs",
    "ts_ljung_box",
    "ts_pettitt_changepoint",
    "agg_fleiss_kappa",
    "ts_seasonal_mann_kendall",
    "agg_theil_decomposition",
    "win_topk_with_ties",
    "events_odds_ratio_2x2",
]

Q6 = Decimal("0.000001")


def _d6(x: float) -> Decimal:
    """DSCALE mirror: double -> DECIMAL(27,6) (half-up on shortest repr)."""
    return Decimal(repr(float(x))).quantize(Q6, ROUND_HALF_UP)


def test_registration_and_slots():
    """Every cadence-2 key is registered WITH an oracle and owns a
    sweep slot. Post-GRADED invariant (see test_cadence_r11's
    lifecycle): registered, oracled, still swept, r12 driver row
    green on disk."""
    import json
    import os

    from trireme_spark.queries import _SWEEP_PRIORITY

    r12 = json.load(
        open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "CORRECTNESS_r12.json",
            )
        )
    )
    for k in CADENCE2_KEYS:
        assert k in registry.QUERIES, k
        assert k in registry.ORACLES, k
        assert k in _SWEEP_PRIORITY, k
        row = r12[k]
        assert row["rows_match"] and row["schema_match"], (k, row)
        assert row["hash_match"] and row["err"] is None, (k, row)


# --- agg_hodges_lehmann -------------------------------------------------


def test_hodges_lehmann_python_recompute(spark):
    months = _by_month(_daily(["o_orderdate", "o_totalprice"]))
    got = registry.QUERIES["agg_hodges_lehmann"](spark, SF_SMOKE).toPandas()
    assert len(got) == len(months)
    for row in got.itertuples(index=False):
        t = pd.Timestamp(row.month)
        days = sorted(months[(t.year, t.month)])
        ys = [r for _, _, r in days]
        walsh = sorted(
            (ys[i] + ys[j]) / 2
            for i in range(len(ys))
            for j in range(i, len(ys))
        )
        m = len(walsh)
        lo, hi = (m + 1) // 2, m // 2 + 1
        sel = [walsh[lo - 1]] if lo == hi else [walsh[lo - 1], walsh[hi - 1]]
        hl = float(sum(_d6(v) for v in sel)) / len(sel)
        hl = math.floor(hl * 1e6) / 1e6
        assert int(row.n_days) == len(ys), t
        assert float(row.hl_revenue) == hl, (t, row.hl_revenue, hl)


def test_hodges_lehmann_plan_shape(spark):
    """Cached daily rollup; the pair window is month-partitioned (no
    global ordered frame); nothing cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["agg_hodges_lehmann"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "InMemoryRelation" in p, p
    assert "row_number" in p, p
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs, p
    for spec in specs:
        head = spec.split(",")[0]
        assert "ASC" not in head and "DESC" not in head, spec


# --- text_annotator_agreement -------------------------------------------


def test_annotator_agreement_python_recompute(spark):
    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")[
        ["lang", "text", "n_chars"]
    ]
    la = np.where(
        d["n_chars"] >= 380, "long", np.where(d["n_chars"] >= 210, "mid", "short")
    )
    nw = d["text"].str.strip().str.split(r"\s+").map(len)
    lb = np.where(nw >= 64, "long", np.where(nw >= 35, "mid", "short"))
    df = pd.DataFrame({"lang": d["lang"], "la": la, "lb": lb})
    got = (
        registry.QUERIES["text_annotator_agreement"](spark, SF_SMOKE)
        .toPandas()
        .set_index("lang")
    )
    assert len(got) == df["lang"].nunique()
    for lang, sub in df.groupby("lang"):
        n = len(sub)
        diag = int((sub["la"] == sub["lb"]).sum())
        pe_num = sum(
            int((sub["la"] == v).sum()) * int((sub["lb"] == v).sum())
            for v in ("long", "mid", "short")
        )
        row = got.loc[lang]
        assert int(row.n_docs) == n, lang
        assert float(row.po) == math.floor(diag / n * 1e6) / 1e6, lang
        assert float(row.pe) == math.floor(pe_num / n**2 * 1e6) / 1e6, lang
        if n * n == pe_num:
            assert float(row.kappa) == 0.0, lang
        else:
            exp = math.floor((diag * n - pe_num) / (n * n - pe_num) * 1e6) / 1e6
            assert float(row.kappa) == exp, (lang, row.kappa, exp)


def test_annotator_agreement_plan_shape(spark):
    """One corpus pass to cells (cached, three consumers); everything
    downstream alphabet-sized; no cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["text_annotator_agreement"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "InMemoryRelation" in p, p
    assert "partial_count" in p or "partial_sum" in p, p


# --- orders_mom_revenue_bridge ------------------------------------------


def _month_cust():
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderdate", "o_custkey", "o_totalprice"]
    ]
    mc = {}
    for d, ck, v in zip(o["o_orderdate"], o["o_custkey"], o["o_totalprice"]):
        key = ((d.year, d.month), int(ck))
        mc[key] = mc.get(key, Decimal(0)) + _d6(v)
    return mc


def _next_month(ym):
    y, m = ym
    return (y + 1, 1) if m == 12 else (y, m + 1)


def test_mom_revenue_bridge_python_recompute(spark):
    mc = _month_cust()
    months = sorted({ym for ym, _ in mc})
    ref = {}
    for m in months:
        ref[m] = dict(
            n_new=0, n_churned=0, n_expanded=0, n_contracted=0,
            new_rev=Decimal(0), expansion_rev=Decimal(0),
            contraction_rev=Decimal(0), churned_rev=Decimal(0),
            net_change=Decimal(0),
        )
    for (ym, ck), rev in mc.items():
        # as the CURRENT side of month ym: find prev-month revenue
        py, pmo = (ym[0] - 1, 12) if ym[1] == 1 else (ym[0], ym[1] - 1)
        rp = mc.get(((py, pmo), ck))
        r = ref[ym]
        if rp is None:
            r["n_new"] += 1
            r["new_rev"] += rev
            r["net_change"] += rev
        elif rev > rp:
            r["n_expanded"] += 1
            r["expansion_rev"] += rev - rp
            r["net_change"] += rev - rp
        elif rev < rp:
            r["n_contracted"] += 1
            r["contraction_rev"] += rev - rp
            r["net_change"] += rev - rp
        # as the PRIOR side: churn lands at next month (if in horizon)
        nm = _next_month(ym)
        if nm in ref and ((nm, ck)) not in mc:
            ref[nm]["n_churned"] += 1
            ref[nm]["churned_rev"] -= rev
            ref[nm]["net_change"] -= rev
    got = registry.QUERIES["orders_mom_revenue_bridge"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == len(months)
    tot = {}
    for (ym, _), rev in mc.items():
        tot[ym] = tot.get(ym, Decimal(0)) + rev
    for row in got.itertuples(index=False):
        t = pd.Timestamp(row.month)
        m = (t.year, t.month)
        r = ref[m]
        for c in ("n_new", "n_churned", "n_expanded", "n_contracted"):
            assert int(getattr(row, c)) == r[c], (m, c)
        for c in (
            "new_rev", "expansion_rev", "contraction_rev", "churned_rev",
            "net_change",
        ):
            assert float(getattr(row, c)) == float(r[c]), (m, c)
        # the waterfall identity: net = revenue(m) - revenue(m-1)
        py, pmo = (m[0] - 1, 12) if m[1] == 1 else (m[0], m[1] - 1)
        ident = tot.get(m, Decimal(0)) - tot.get((py, pmo), Decimal(0))
        assert float(r["net_change"]) == float(ident), m


def test_mom_revenue_bridge_plan_shape(spark):
    """ONE full-outer self-join at rollup grain, a semi-join month
    spine, cached rollup; nothing cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["orders_mom_revenue_bridge"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "FullOuter" in p, p
    assert "LeftSemi" in p, p
    assert "InMemoryRelation" in p, p


# --- graph_two_hop_recs ---------------------------------------------------


def test_two_hop_recs_python_recompute(spark):
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import Counter, defaultdict

    w = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].astype(int))
        for i in parts:
            for j in parts:
                if i != j:
                    w[(i, j)] += 1
    out_edges = defaultdict(list)
    for (s, d), c in w.items():
        out_edges[s].append((d, c))
    hop1 = {
        s: sorted(es, key=lambda e: (-e[1], e[0]))[:3]
        for s, es in out_edges.items()
    }
    scores = defaultdict(lambda: [0, 0])
    for s, nbrs in hop1.items():
        for m, w1 in nbrs:
            for r, w2 in hop1.get(m, []):
                if r != s and (s, r) not in w:
                    sc = scores[(s, r)]
                    sc[0] += min(w1, w2)
                    sc[1] += 1
    per_src = defaultdict(list)
    for (s, r), (sc, np_) in scores.items():
        per_src[s].append((r, sc, np_))
    ref = {}
    for s, cands in per_src.items():
        top = sorted(cands, key=lambda c: (-c[1], c[0]))[:3]
        for rank, (r, sc, np_) in enumerate(top, 1):
            ref[(s, r)] = (rank, sc, np_)
    got = registry.QUERIES["graph_two_hop_recs"](spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    for row in got.itertuples(index=False):
        key = (int(row.src), int(row.rec))
        assert key in ref, key
        rank, sc, np_ = ref[key]
        assert int(row.rec_rank) == rank, key
        assert int(row.score) == sc, key
        assert int(row.n_paths) == np_, key


def test_two_hop_recs_plan_shape(spark):
    """Bounded-fanout walk: keyed joins + LeftAnti exclusion + top-k
    windows; cached edges; never cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["graph_two_hop_recs"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "LeftAnti" in p, p
    assert "InMemoryRelation" in p, p
    assert "row_number" in p, p


# --- ts_ljung_box ---------------------------------------------------------


def test_ljung_box_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[["ts", "value"]]
    hidx = ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)).astype(int)
    hourly = {}
    for h, v in zip(hidx, ev["value"]):
        hourly[h] = hourly.get(h, Decimal(0)) + _d6(v)
    hs = {h: float(v) for h, v in hourly.items()}
    n = len(hs)
    sx = float(sum(_d6(v) for v in hs.values()))
    sxx = float(sum(_d6(v * v) for v in hs.values()))
    mean = sx / n
    den = sxx - sx * sx / n
    crit = [
        3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067, 15.507,
        16.919, 18.307, 19.675, 21.026, 22.362, 23.685, 24.996, 26.296,
        27.587, 28.869, 30.144, 31.410, 32.671, 33.924, 35.172, 36.415,
    ]
    got = (
        registry.QUERIES["ts_ljung_box"](spark, SF_SMOKE)
        .toPandas()
        .set_index("lag")
        .sort_index()
    )
    assert list(got.index) == list(range(1, 25))
    cum = 0
    for k in range(1, 25):
        num = float(
            sum(
                Decimal(repr((hs[a] - mean) * (hs[a + k] - mean))).quantize(
                    Q6, ROUND_HALF_UP
                )
                for a in hs
                if a + k in hs
            )
        )
        rho = math.floor(num / den * 1e6) / 1e6
        cum += math.floor(rho * rho / (n - k) * 1e12)
        q = math.floor(n * (n + 2) * (cum / 1e12) * 1e6) / 1e6
        row = got.loc[k]
        assert float(row.acf) == rho, k
        assert float(row.q_stat) == q, (k, row.q_stat, q)
        assert bool(row.reject_white_noise) == (q > crit[k - 1]), k


def test_ljung_box_plan_shape(spark):
    """ACF machinery (bounded broadcast moment/lag frames) + 24-row
    meta-partitioned cumulative window (shiftright key)."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["ts_ljung_box"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "shiftright" in p, p
    assert "HashAggregate" in p, p


# --- ts_pettitt_changepoint -------------------------------------------------


def test_pettitt_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    monthly = {}
    for d, v in zip(o["o_orderdate"], o["o_totalprice"]):
        key = (d.year, d.month)
        monthly[key] = monthly.get(key, Decimal(0)) + _d6(v)
    ms = sorted(monthly)
    ys = [float(monthly[m]) for m in ms]
    n = len(ys)
    best = None
    for t in range(n - 1):  # t indexes months; exclude the last
        u = sum(
            int(np.sign(ys[j] - ys[i]))
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        au = abs(u)
        if best is None or au > best[0]:
            best = (au, t)
    k_stat, t_idx = best
    p_ref = min(
        math.floor(
            2 * math.exp(-6 * k_stat**2 / (n**3 + n**2)) * 1e6
        )
        / 1e6,
        1.0,
    )
    got = registry.QUERIES["ts_pettitt_changepoint"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    cp = pd.Timestamp(row.changepoint_month)
    assert int(row.n_months) == n
    assert int(row.k_stat) == k_stat
    assert (cp.year, cp.month) == ms[t_idx]
    # exp() may differ by an ulp across libms; the floor can swing 1e-6
    assert abs(float(row.p_approx) - p_ref) <= 2e-6
    assert bool(row.significant) == (float(row.p_approx) < 0.05)


def test_pettitt_plan_shape(spark):
    """Calendar-bounded broadcast pair lattice + difference-array agg +
    meta-partitioned prefix-sum window; cached monthly rollup."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["ts_pettitt_changepoint"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # the bounded pair lattice
    assert "shiftright" in p, p
    assert "InMemoryRelation" in p, p
    assert "Union" in p, p  # the +s/-s difference-array contribution


# --- agg_fleiss_kappa ---------------------------------------------------


def test_fleiss_kappa_python_recompute(spark):
    import re

    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")[
        ["lang", "text", "n_chars"]
    ]

    def lab3(row):
        toks = re.split(r"\s+", row["text"].strip())
        nw, nu, nc = len(toks), len(set(toks)), row["n_chars"]
        la = 0 if nc >= 380 else (1 if nc >= 210 else 2)
        lb = 0 if nw >= 64 else (1 if nw >= 35 else 2)
        lc = 0 if nu >= 55 else (1 if nu >= 30 else 2)
        return la, lb, lc

    got = (
        registry.QUERIES["agg_fleiss_kappa"](spark, SF_SMOKE)
        .toPandas()
        .set_index("lang")
    )
    assert len(got) == d["lang"].nunique()
    for lang, sub in d.groupby("lang"):
        n = len(sub)
        s2 = 0
        cj = [0, 0, 0]
        for _, row in sub.iterrows():
            labs = lab3(row)
            nij = [labs.count(j) for j in range(3)]
            s2 += sum(v * v for v in nij)
            for j in range(3):
                cj[j] += nij[j]
        csq = sum(c * c for c in cj)
        tn = 3 * n
        p_bar = math.floor((s2 - tn) / (2 * tn) * 1e6) / 1e6
        p_e = math.floor(csq / tn**2 * 1e6) / 1e6
        num = (s2 - tn) * tn * tn - 2 * tn * csq
        den = 2 * tn * (tn * tn - csq)
        row = got.loc[lang]
        assert int(row.n_docs) == n, lang
        assert float(row.p_bar) == p_bar, lang
        assert float(row.p_e) == p_e, lang
        if den == 0:
            assert float(row.fleiss_kappa) == 0.0, lang
        else:
            exp = math.floor(num / den * 1e6) / 1e6
            assert float(row.fleiss_kappa) == exp, (lang, row.fleiss_kappa)


def test_fleiss_kappa_plan_shape(spark):
    """All three labels fold row-locally; ONE keyed aggregation, no
    joins or windows anywhere."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["agg_fleiss_kappa"](spark, SF_SMOKE))
    assert "Join" not in p, p
    assert p.count("hashpartitioning(lang") == 1, p
    assert "HashAggregate" in p, p


# --- ts_seasonal_mann_kendall ---------------------------------------------


def test_seasonal_mann_kendall_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderdate", "o_totalprice"]
    ]
    monthly = {}
    for d, v in zip(o["o_orderdate"], o["o_totalprice"]):
        key = (d.year, d.month)
        monthly[key] = monthly.get(key, Decimal(0)) + _d6(v)
    strata = {}
    for (y, m), rev in monthly.items():
        strata.setdefault(m, []).append((y, float(rev)))
    s_total, bsum, tsum = 0, 0, 0
    for m, rows in strata.items():
        rows.sort()
        ys = [r for _, r in rows]
        n = len(ys)
        s_total += sum(
            int(np.sign(ys[j] - ys[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        bsum += n * (n - 1) * (2 * n + 5)
        ties = pd.Series(ys).value_counts()
        tsum += int(sum(t * (t - 1) * (2 * t + 5) for t in ties))
    var_num = bsum - tsum
    var_s = math.floor(var_num / 18 * 1e6) / 1e6
    if var_num <= 0 or s_total == 0:
        z = 0.0
    elif s_total > 0:
        z = math.floor((s_total - 1) / math.sqrt(var_num / 18) * 1e6) / 1e6
    else:
        z = math.floor((s_total + 1) / math.sqrt(var_num / 18) * 1e6) / 1e6
    trend = (
        "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "no_trend"
    )
    got = registry.QUERIES["ts_seasonal_mann_kendall"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_strata) == len(strata)
    assert int(row.s_total) == s_total
    assert float(row.var_s) == var_s
    assert float(row.z) == z
    assert str(row.trend) == trend


def test_seasonal_mann_kendall_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(registry.QUERIES["ts_seasonal_mann_kendall"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "InMemoryRelation" in p, p
    assert "partial_sum" in p, p


# --- agg_theil_decomposition ------------------------------------------------


def test_theil_decomposition_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_orderpriority", "o_totalprice"]
    ]
    got = (
        registry.QUERIES["agg_theil_decomposition"](spark, SF_SMOKE)
        .toPandas()
        .set_index("o_orderpriority")
    )
    n_tot = len(o)
    mu = float(sum(_d6(v) for v in o["o_totalprice"])) / n_tot
    assert len(got) == o["o_orderpriority"].nunique()
    within_sum, between_sum = Decimal(0), Decimal(0)
    for pri, sub in o.groupby("o_orderpriority"):
        n_g = len(sub)
        mu_g = float(sum(_d6(v) for v in sub["o_totalprice"])) / n_g
        terms = sum(
            Decimal(
                repr((float(x) / mu_g) * math.log(float(x) / mu_g))
            ).quantize(Q6, ROUND_HALF_UP)
            for x in sub["o_totalprice"]
        )
        t_g_raw = float(terms) / n_g
        w = (n_g / n_tot) * (mu_g / mu)
        row = got.loc[pri]
        assert int(row.n_orders) == n_g, pri
        assert float(row.mu_g) == math.floor(mu_g * 1e6) / 1e6, pri
        assert float(row.t_g) == math.floor(t_g_raw * 1e6) / 1e6, pri
        bt = math.floor(w * math.log(mu_g / mu) * 1e6) / 1e6
        wc = math.floor(w * t_g_raw * 1e6) / 1e6
        assert float(row.between_term) == bt, pri
        assert float(row.within_contrib) == wc, pri
        within_sum += Decimal(repr(wc))
        between_sum += Decimal(repr(bt))
    # decomposition identity vs a directly computed global Theil T
    gterms = sum(
        Decimal(repr((float(x) / mu) * math.log(float(x) / mu))).quantize(
            Q6, ROUND_HALF_UP
        )
        for x in o["o_totalprice"]
    )
    t_total = float(gterms) / n_tot
    assert abs(float(within_sum + between_sum) - t_total) < 1e-4


def test_theil_decomposition_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(registry.QUERIES["agg_theil_decomposition"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p  # group means attach by hash
    assert "partial_sum" in p, p


# --- win_topk_with_ties -----------------------------------------------------


def test_topk_with_ties_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[["o_custkey"]]
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    cnt = (
        o.groupby("o_custkey")
        .size()
        .reset_index(name="n_orders")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    )
    cnt["rnk"] = (
        cnt.groupby("c_mktsegment")["n_orders"]
        .rank(method="min", ascending=False)
        .astype(int)
    )
    ref = cnt[cnt["rnk"] <= 3]
    got = registry.QUERIES["win_topk_with_ties"](spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    refset = {
        (r.c_mktsegment, int(r.o_custkey), int(r.n_orders), int(r.rnk))
        for r in ref.itertuples(index=False)
    }
    gotset = {
        (r.c_mktsegment, int(r.o_custkey), int(r.n_orders), int(r.rnk))
        for r in got.itertuples(index=False)
    }
    assert gotset == refset
    # WITH TIES means at least one segment may exceed 3 rows; assert the
    # semantics is exercised whenever the fixture has a boundary tie
    sizes = got.groupby("c_mktsegment").size()
    assert (sizes >= 3).all()


def test_topk_with_ties_plan_shape(spark):
    """The corpus-grain rollup is never windowed: no rank/row_number in
    the plan — the rank-start is a running SUM over the value-grain
    frame, then a hash join back."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["win_topk_with_ties"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "row_number" not in p and "rank(" not in p, p
    assert "windowspecdefinition" in p, p


# --- events_odds_ratio_2x2 ----------------------------------------------------


def test_odds_ratio_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[
        ["user_id", "event_type"]
    ]
    g = ev.groupby("user_id")["event_type"]
    clicks = g.apply(lambda s: int((s == "click").sum()))
    purch = g.apply(lambda s: int((s == "purchase").sum()))
    exposed, outcome = clicks >= 14, purch >= 14
    a = int((exposed & outcome).sum())
    b = int((exposed & ~outcome).sum())
    c = int((~exposed & outcome).sum())
    d = int((~exposed & ~outcome).sum())
    got = registry.QUERIES["events_odds_ratio_2x2"](spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert (int(row.a), int(row.b), int(row.c), int(row.d)) == (a, b, c, d)
    if min(a, b, c, d) == 0:
        assert float(row.odds_ratio) == 0.0
        assert not bool(row.significant)
    else:
        orr = a * d / (b * c)
        se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        assert float(row.odds_ratio) == math.floor(orr * 1e6) / 1e6
        # ln/exp may differ by an ulp across libms
        assert abs(float(row.ci_lo) - math.exp(math.log(orr) - 1.96 * se)) \
            <= 2e-6
        assert abs(float(row.ci_hi) - math.exp(math.log(orr) + 1.96 * se)) \
            <= 2e-6
        assert bool(row.significant) == (
            float(row.ci_lo) > 1.0 or float(row.ci_hi) < 1.0
        )


def test_odds_ratio_plan_shape(spark):
    """Two stacked aggregations, no joins anywhere."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["events_odds_ratio_2x2"](spark, SF_SMOKE))
    assert "Join" not in p, p
    assert "HashAggregate" in p, p


# --- layout invariance ------------------------------------------------------


@pytest.mark.parametrize("key", CADENCE2_KEYS)
def test_cadence2_layout_invariance(spark, key, monkeypatch):
    fn = registry.QUERIES[key]

    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    base = canon(fn(spark, SF_SMOKE))
    hostile = hostile_layout(
        spark, monkeypatch, lambda: canon(fn(spark, SF_SMOKE))
    )
    assert hostile == base, (
        f"{key}: rows differ between the pinned layout and a hostile one"
    )
