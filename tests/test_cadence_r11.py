"""r11 cadence-batch keys — full contracts for the nine keys registered
under the post-428 cadence (SURVEY round-11 log).

Driver-style oracle parity at both scales is carried automatically by
tests/test_oracle.py (the keys are registered). This module adds the rest
of the staged-key discipline: an INDEPENDENT recompute per math-bearing
key (pandas/numpy straight off the parquet — no Spark expressions, no
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
from trireme_spark import registry

CADENCE_KEYS = [
    "join_existence_mark",
    "agg_kendall_tau",
    "ts_mann_kendall_trend",
    "agg_benjamini_hochberg",
    "fn_variant_explode",
    "fn_variant_schema_union",
    "stream_chained_time_windows",
    "stream_windowed_distinct_users",
    "geo_nearest_facility",
]

Q = Decimal("0.000001")


def _daily(cols):
    """dsum-mirrored daily rollup: {(y,m,d): (n_orders, float(rev))}."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[cols]
    out = {}
    for d, v in zip(o["o_orderdate"], o["o_totalprice"]):
        key = (d.year, d.month, d.day)
        n, rev = out.get(key, (0, Decimal(0)))
        out[key] = (
            n + 1,
            rev + Decimal(repr(float(v))).quantize(Q, ROUND_HALF_UP),
        )
    return {k: (n, float(rev)) for k, (n, rev) in out.items()}


def _by_month(daily):
    months = {}
    for (y, mo, dy), v in daily.items():
        months.setdefault((y, mo), []).append((dy, *v))
    return months


def test_registration_and_slots():
    """Every cadence key is registered WITH an oracle and owns a sweep
    slot. Lifecycle: r11 = parked BEHIND the pinned window; r12 = the
    rotation pulled all 20 INTO slots 1-50 and the driver GRADED them
    (CORRECTNESS_r12: 20/20 hash-green); r13 = the rotation moved the
    graded window to the staleness tail — so the standing invariant is
    the POST-GRADED one: registered, oracled, still swept, and the r12
    driver row is green on disk."""
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
    for k in CADENCE_KEYS:
        assert k in registry.QUERIES, k
        assert k in registry.ORACLES, k
        assert k in _SWEEP_PRIORITY, k
        row = r12[k]
        assert row["rows_match"] and row["schema_match"], (k, row)
        assert row["hash_match"] and row["err"] is None, (k, row)


# --- join_existence_mark ----------------------------------------------------


def test_existence_mark_python_recompute(spark):
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")[
        ["o_custkey", "o_orderpriority"]
    ]
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ]
    any_set = set(o["o_custkey"].astype(int))
    urg_set = set(
        o.loc[o["o_orderpriority"] == "1-URGENT", "o_custkey"].astype(int)
    )
    got = (
        registry.QUERIES["join_existence_mark"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
    )
    assert len(got) == len(c)
    for ck in c["c_custkey"].astype(int):
        row = got.loc[ck]
        assert bool(row.has_order) == (ck in any_set), ck
        assert bool(row.has_urgent) == (ck in urg_set), ck


def test_existence_mark_plan_shape(spark):
    """One aggregated build side + ONE outer join — never a join per
    mark, never anything cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["join_existence_mark"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "partial_max" in p, p  # map-side-combined boolean marks
    import re

    joins = re.findall(
        r"\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", p
    )
    assert len(joins) == 1, p


# --- agg_kendall_tau --------------------------------------------------------


def test_kendall_tau_python_recompute(spark):
    months = _by_month(_daily(["o_orderdate", "o_totalprice"]))
    got = registry.QUERIES["agg_kendall_tau"](spark, SF_SMOKE).toPandas()
    assert len(got) == len(months)
    for row in got.itertuples(index=False):
        t = pd.Timestamp(row.month)
        days = sorted(months[(t.year, t.month)])
        xs = [n for _, n, _ in days]
        ys = [r for _, _, r in days]
        n = len(days)
        cd = sum(
            int(np.sign(xs[j] - xs[i])) * int(np.sign(ys[j] - ys[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        n0 = n * (n - 1) // 2

        def tie_pairs(vals):
            c = pd.Series(vals).value_counts()
            return int(sum(t * (t - 1) // 2 for t in c))

        n1, n2 = tie_pairs(xs), tie_pairs(ys)
        assert int(row.n_days) == n, t
        assert int(row.conc_minus_disc) == cd, t
        denom2 = (n0 - n1) * (n0 - n2)
        if denom2 <= 0:
            assert float(row.tau_b) == 0.0, t
        else:
            exp = math.floor(cd / math.sqrt(denom2) * 1e6) / 1e6
            assert float(row.tau_b) == exp, (t, row.tau_b, exp)


def test_kendall_tau_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(registry.QUERIES["agg_kendall_tau"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "InMemoryRelation" in p, p  # cached daily rollup, 4 consumers
    assert "partial_sum" in p or "partial_count" in p, p


# --- ts_mann_kendall_trend --------------------------------------------------


def test_mann_kendall_python_recompute(spark):
    months = _by_month(_daily(["o_orderdate", "o_totalprice"]))
    got = registry.QUERIES["ts_mann_kendall_trend"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == len(months)
    for row in got.itertuples(index=False):
        t = pd.Timestamp(row.month)
        days = sorted(months[(t.year, t.month)])
        ys = [r for _, _, r in days]
        n = len(ys)
        s = sum(
            int(np.sign(ys[j] - ys[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = pd.Series(ys).value_counts()
        tc = int(sum(t_ * (t_ - 1) * (2 * t_ + 5) for t_ in ties))
        var_s = (n * (n - 1) * (2 * n + 5) - tc) / 18.0
        if var_s <= 0 or s == 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / math.sqrt(var_s)
        else:
            z = (s + 1) / math.sqrt(var_s)
        z = math.floor(z * 1e6) / 1e6
        trend = (
            "increasing"
            if z > 1.96
            else "decreasing" if z < -1.96 else "no_trend"
        )
        assert int(row.n_days) == n, t
        assert int(row.s_stat) == s, t
        assert float(row.var_s) == math.floor(var_s * 1e6) / 1e6, t
        assert float(row.z) == z, (t, row.z, z)
        assert str(row.trend) == trend, t


def test_mann_kendall_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(registry.QUERIES["ts_mann_kendall_trend"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "InMemoryRelation" in p, p
    assert "partial_sum" in p, p


# --- agg_benjamini_hochberg -------------------------------------------------


def test_benjamini_hochberg_python_recompute(spark):
    """Recompute cells, q exactly; p/p_adj within an exp() ulp; the BH
    rejection set from the recomputed p (boundary-tie-free fixture)."""
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[["ts", "event_type"]]
    hod = (
        (ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1) % 24
    ).astype(int)
    dow = (
        ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(days=1) + 3) % 7
    ).astype(int)  # 1970-01-01 is a Thursday; Monday = 0
    df = pd.DataFrame(
        {"et": ev["event_type"], "dow": dow, "b": (hod // 8).astype(int)}
    )
    cells = {}
    for (et, d), sub in df.groupby(["et", "dow"]):
        n = len(sub)
        b = [int((sub["b"] == i).sum()) for i in range(3)]
        e = n / 3.0
        q = (
            (b[0] - e) ** 2 / e + (b[1] - e) ** 2 / e + (b[2] - e) ** 2 / e
        )
        qq = math.floor(q * 1e6) / 1e6
        cells[(et, int(d))] = (n, qq, math.exp(-qq / 2))
    m = len(cells)
    order = sorted(cells, key=lambda k: (cells[k][2], k[0], k[1]))
    ranks = {k: i + 1 for i, k in enumerate(order)}
    k_max = max(
        (ranks[k] for k in order if cells[k][2] <= ranks[k] / m * 0.05),
        default=0,
    )
    got = registry.QUERIES["agg_benjamini_hochberg"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == m
    for row in got.itertuples(index=False):
        key = (row.event_type, int(row.dow))
        n, qq, p = cells[key]
        assert int(row.n) == n, key
        assert float(row.q) == qq, key
        assert abs(float(row.p) - p) <= 2e-9, key
        assert int(row.k) == ranks[key], key
        assert bool(row.rejected) == (ranks[key] <= k_max), key
        adj = min(
            m / ranks[kk] * cells[kk][2]
            for kk in order[ranks[key] - 1 :]
        )
        assert abs(float(row.p_adj) - min(adj, 1.0)) <= 1e-7, key


def test_benjamini_hochberg_plan_shape(spark):
    """One corpus-sized conditional-count agg; every BH window runs on
    the hypothesis table under the meta partition key (shiftright) —
    no corpus-global ordered frame."""
    import re

    from tests.test_plans import plan

    p = plan(registry.QUERIES["agg_benjamini_hochberg"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "partial_count" in p, p
    # the meta partition key projects to a _wN attribute before the
    # window, so assert (a) every spec leads with a PARTITION column
    # (no ASC/DESC in the head token — the RRF-pin rule) and (b) the
    # shiftright meta key exists in the plan feeding those attributes
    specs = re.findall(r"windowspecdefinition\(([^)]*)", p)
    assert specs, p
    for spec in specs:
        head = spec.split(",")[0]
        assert "ASC" not in head and "DESC" not in head, spec
    assert "shiftright" in p, p


# --- variant keys -----------------------------------------------------------


def _events_k(sf):
    import json

    raw = pd.read_parquet(sf + "/events.parquet")[["event_id", "props"]]
    k = raw["props"].map(lambda s: int(json.loads(s)["k"]))
    return raw["event_id"].astype(int), k


def test_variant_explode_python_recompute(spark):
    eid, k = _events_k(SF_SMOKE)
    exp = {
        t: [0, 0, 0, 0, 0]  # n, pos_sum, sum_int, str_len, n_true
        for t in ("BIGINT", "STRING", "BOOLEAN", "EMPTY")
    }
    for e, kk in zip(eid, k):
        L = e % 4
        if L == 0:
            exp["EMPTY"][0] += 1
            continue
        for i in range(L):
            m = (kk + i) % 3
            t = ["BIGINT", "STRING", "BOOLEAN"][m]
            exp[t][0] += 1
            exp[t][1] += i
            if m == 0:
                exp[t][2] += kk + i
            elif m == 1:
                exp[t][3] += len("s" + str(kk + i))
            elif (kk + i) % 2 == 0:
                exp[t][4] += 1
    got = registry.QUERIES["fn_variant_explode"](spark, SF_SMOKE).toPandas()
    assert sorted(got["el_type"]) == sorted(exp)
    for row in got.itertuples(index=False):
        n, ps, si, sl, nt = exp[row.el_type]
        assert int(row.n) == n, row.el_type
        assert int(row.pos_sum) == ps, row.el_type
        for val, ref, has in (
            (row.sum_int, si, row.el_type == "BIGINT"),
            (row.str_len_sum, sl, row.el_type == "STRING"),
        ):
            if has:
                assert int(val) == ref, row.el_type
            else:
                assert pd.isna(val), row.el_type
        assert int(row.n_true) == nt, row.el_type


def test_variant_explode_plan_shape(spark):
    """Row-local fan-out + ONE hash-agg shuffle, all-long buffers."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["fn_variant_explode"](spark, SF_SMOKE))
    assert p.count("hashpartitioning(el_type") == 1, p
    assert "HashAggregate" in p and "SortAggregate" not in p, p
    assert "Generate" in p, p  # the posexplode
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_variant_schema_union_python_recompute(spark):
    eid, k = _events_k(SF_SMOKE)
    exp = {}
    for e, kk in zip(eid, k):
        g = e % 4
        if g == 0 or kk % 2 == 0:
            rs = "OBJECT<v: BIGINT>"
        elif g == 1:
            rs = f"OBJECT<v: DECIMAL({len(str(kk)) + 1},1)>"
        elif g == 2:
            rs = "OBJECT<v: STRING>"
        else:
            rs = "OBJECT<v: VOID>"
        n, nn = exp.get((g, rs), (0, 0))
        exp[(g, rs)] = (n + 1, nn + (1 if g == 3 and kk % 2 == 1 else 0))
    merged = {
        0: "OBJECT<v: BIGINT>",
        1: "OBJECT<v: DECIMAL(21,1)>",
        2: "OBJECT<v: VARIANT>",
        3: "OBJECT<v: BIGINT>",
    }
    got = registry.QUERIES["fn_variant_schema_union"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == len(exp)
    for row in got.itertuples(index=False):
        key = (int(row.g), row.row_schema)
        assert key in exp, key
        n, nn = exp[key]
        assert int(row.n_docs) == n, key
        assert int(row.n_null_v) == nn, key
        assert row.merged_schema == merged[int(row.g)], key


def test_variant_schema_union_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(registry.QUERIES["fn_variant_schema_union"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "BroadcastHashJoin" in p, p  # 4-row merged side attaches by hash
    assert "HashAggregate" in p, p


# --- streaming cadence keys (batch forms; real streams run in
# tests/test_streaming.py) ---------------------------------------------------


def test_chained_windows_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[["ts", "event_type"]]
    b15 = ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(seconds=900)).astype(
        int
    )
    s1 = (
        pd.DataFrame({"b15": b15, "et": ev["event_type"]})
        .groupby(["b15", "et"])
        .size()
        .reset_index(name="n15")
    )
    s1["hr"] = s1["b15"] * 900 // 3600
    s2 = s1.groupby(["hr", "et"]).agg(
        n_subwindows=("n15", "size"),
        peak_15m=("n15", "max"),
        total=("n15", "sum"),
    )
    got = registry.QUERIES["stream_chained_time_windows"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == len(s2)
    for row in got.itertuples(index=False):
        hr = int(
            (pd.Timestamp(row.window_start) - pd.Timestamp(0))
            // pd.Timedelta(hours=1)
        )
        ref = s2.loc[(hr, row.event_type)]
        assert int(row.n_subwindows) == int(ref.n_subwindows), (hr, row)
        assert int(row.peak_15m) == int(ref.peak_15m), (hr, row)
        assert int(row.total) == int(ref.total), (hr, row)


def test_windowed_distinct_users_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")[["ts", "user_id"]]
    hr = ((ev["ts"] - pd.Timestamp(0)) // pd.Timedelta(hours=1)).astype(int)
    ref = (
        pd.DataFrame({"hr": hr, "u": ev["user_id"]})
        .groupby("hr")["u"]
        .nunique()
    )
    got = registry.QUERIES["stream_windowed_distinct_users"](
        spark, SF_SMOKE
    ).toPandas()
    assert len(got) == len(ref)
    for row in got.itertuples(index=False):
        h = int(
            (pd.Timestamp(row.window_start) - pd.Timestamp(0))
            // pd.Timedelta(hours=1)
        )
        assert int(row.n_users) == int(ref.loc[h]), h


def test_chained_windows_plan_shape(spark):
    """Two stacked hash aggregations (15-min then hour), no Expand (the
    windows are tumbling), nothing cartesian."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["stream_chained_time_windows"](spark, SF_SMOKE))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert p.count("HashAggregate") >= 4, p  # two partial/final pairs
    assert "Expand" not in p, p


def test_windowed_distinct_users_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(
        registry.QUERIES["stream_windowed_distinct_users"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "HashAggregate" in p, p


# --- geo_nearest_facility ---------------------------------------------------

_KNUTH = 2654435761
_M31 = 2147483648
_M32 = 4294967296


def _coords(keys, salt_lat, salt_lon):
    h1 = ((keys + salt_lat) % _M31 * _KNUTH) % _M32 / _M32
    h2 = ((keys + salt_lon) % _M31 * _KNUTH) % _M32 / _M32
    return h1 * 120 - 60, h2 * 240 - 120


def test_nearest_facility_python_recompute(spark):
    """numpy brute-force argmin over planted coordinates. Trig libm vs
    JVM can differ by an ulp, so the winner id is asserted exactly only
    when the runner-up gap exceeds 2e-6 km; distances compare at 2e-6."""
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")["c_custkey"].astype(
        np.int64
    )
    s = pd.read_parquet(SF_SMOKE + "/supplier.parquet")["s_suppkey"].astype(
        np.int64
    )
    clat, clon = _coords(c.to_numpy(), 1, 2)
    slat, slon = _coords(s.to_numpy(), 3, 4)

    def hav(lat1, lon1, lat2, lon2):
        a = (
            np.sin(np.radians(lat2 - lat1) / 2) ** 2
            + np.cos(np.radians(lat1))
            * np.cos(np.radians(lat2))
            * np.sin(np.radians(lon2 - lon1) / 2) ** 2
        )
        return 2 * 6371.0088 * np.arcsin(np.sqrt(a))

    d = hav(
        clat[:, None], clon[:, None], slat[None, :], slon[None, :]
    )
    d = np.floor(d * 1e6) / 1e6
    skeys = s.to_numpy()
    got = (
        registry.QUERIES["geo_nearest_facility"](spark, SF_SMOKE)
        .toPandas()
        .set_index("c_custkey")
    )
    assert len(got) == len(c)
    for i, ck in enumerate(c.to_numpy()):
        row = got.loc[int(ck)]
        # deterministic argmin: (dist, suppkey) lexicographic
        j = min(range(len(skeys)), key=lambda j: (d[i, j], skeys[j]))
        gap = np.partition(d[i], 1)[1] - d[i, j]
        assert abs(float(row.dist_km) - d[i, j]) <= 2e-6, ck
        if gap > 2e-6:
            assert int(row.nearest_suppkey) == int(skeys[j]), ck


def test_nearest_facility_plan_shape(spark):
    """The broadcast nested-loop over the DIMENSION side is the point:
    facilities broadcast, the probe side never shuffles pre-argmin, and
    the argmin is a map-side-combined struct-min."""
    from tests.test_plans import plan

    p = plan(registry.QUERIES["geo_nearest_facility"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "partial_min" in p, p


def test_nearest_facility_chord_band_soundness():
    """The prune-then-verify band (r14 follow-up): every candidate whose
    FLOORED distance could tie the per-customer minimum must fall inside
    chord² ≤ min_chord² + 5e-10, or the prune would silently drop the
    oracle's winner. Verified two ways on real fixture geometry:

    1. the analytic step bound — chord²(d) = 4 sin²(d/2R) moves at most
       (2/R)·1e-6 ≈ 3.139e-10 over a 1e-6 km step (|dchord²/dd| =
       (2/R)|sin(d/R)| ≤ 2/R) — checked numerically over the full
       distance range. This pin CAUGHT a dropped factor of 2 in the
       first derivation (1/R would under-cover by half);
    2. at SF_SMOKE, every supplier within 1e-6 km of each customer's
       true min distance sits inside the band (empirical, all pairs).
    """
    R = 6371.0088
    # 1 — analytic: chord²(d) = 4 sin²(d/2R); step of 1e-6 km
    d = np.linspace(0.0, np.pi * R, 2_000_001)
    c2 = 4 * np.sin(d / (2 * R)) ** 2
    step = np.abs(4 * np.sin((d + 1e-6) / (2 * R)) ** 2 - c2)
    assert step.max() <= 3.2e-10  # 2e-6/R = 3.1392e-10, + fp slack
    assert step.max() >= 3.0e-10  # the bound is TIGHT — 1/R is wrong

    # 2 — empirical on fixture coordinates
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")["c_custkey"].astype(
        np.int64
    )
    s = pd.read_parquet(SF_SMOKE + "/supplier.parquet")["s_suppkey"].astype(
        np.int64
    )
    clat, clon = _coords(c.to_numpy(), 1, 2)
    slat, slon = _coords(s.to_numpy(), 3, 4)

    def xyz(lat, lon):
        rl, rn = np.radians(lat), np.radians(lon)
        return np.stack(
            [np.cos(rl) * np.cos(rn), np.cos(rl) * np.sin(rn), np.sin(rl)],
            axis=-1,
        )

    cu, su = xyz(clat, clon), xyz(slat, slon)
    chord2 = ((cu[:, None, :] - su[None, :, :]) ** 2).sum(-1)

    a = (
        np.sin(np.radians(slat[None, :] - clat[:, None]) / 2) ** 2
        + np.cos(np.radians(clat))[:, None]
        * np.cos(np.radians(slat))[None, :]
        * np.sin(np.radians(slon[None, :] - clon[:, None]) / 2) ** 2
    )
    dist = 2 * R * np.arcsin(np.sqrt(a))

    dmin = dist.min(axis=1, keepdims=True)
    near = dist <= dmin + 1e-6  # any possible floor-tie candidate
    band = chord2 <= chord2.min(axis=1, keepdims=True) + 5e-10
    assert (near & ~band).sum() == 0


# --- layout invariance ------------------------------------------------------


@pytest.mark.parametrize("key", CADENCE_KEYS)
def test_cadence_layout_invariance(spark, key, monkeypatch):
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
