"""Independent recomputation audits for math-heavy keys.

The DuckDB hash oracle catches every divergence between the two
ENGINES, but not the one failure mode where the Spark query and its
oracle SQL encode the SAME wrong formula (agreement-by-construction).
These tests recompute selected r8-window keys a THIRD way — pure
pandas/numpy straight from the raw parquet, written from each key's
documented mathematical contract rather than from its query code — and
require agreement. The MMR full-chain numpy oracle
(tests/test_quality.py) is the same idea for the greedy rerank; this
module extends it to the classical-decomposition and graph-diagnostic
keys graded this round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from trireme_spark import registry


def test_decompose_additive_matches_pandas_recompute(spark):
    """value = trend (centered 25-hour MA, partial at the edges) +
    seasonal (hour-of-day mean of the detrended series) + residual,
    recomputed independently with pandas rolling/groupby."""
    got = (
        registry.QUERIES["ts_decompose_additive"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("hr")
        .reset_index(drop=True)
    )

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["ts", "value"]]
    ev["hr"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    h = (
        ev.groupby("hr", as_index=False)["value"]
        .sum()
        .rename(columns={"value": "v"})
        .sort_values("hr")
        .reset_index(drop=True)
    )
    # centered 25-row MA with partial windows at the edges (rowsBetween
    # -12..12 divides by the actual frame count)
    trend = (
        h["v"].rolling(window=25, center=True, min_periods=1).mean()
    ).round(6)
    det = (h["v"] - trend).round(6)
    hod = h["hr"].dt.hour
    seasonal = det.groupby(hod).transform("mean").round(6)
    residual = (det - seasonal).round(6)

    assert len(got) == len(h)
    key = got["hr"].astype(str).str[:19].tolist()
    ours = h["hr"].dt.strftime("%Y-%m-%d %H:%M:%S").tolist()
    assert key == ours
    # F.round (half-up on shortest repr) vs numpy round (half-even) can
    # differ by 1 ulp-of-quantum on exact .5 boundaries; compare at 2e-6
    for col, ref in (
        ("v", h["v"]),
        ("trend", trend),
        ("seasonal", seasonal),
        ("residual", residual),
    ):
        diff = np.abs(got[col].to_numpy(dtype=float) - ref.to_numpy())
        assert diff.max() <= 2e-6, (col, float(diff.max()))
    # and the decomposition identity holds row-wise on the Spark output
    recon = got["trend"] + got["seasonal"] + got["residual"]
    assert np.abs(recon - got["v"]).max() <= 5e-6


def test_degree_distribution_matches_pandas_recompute(spark):
    """Co-purchase degree histogram recomputed independently: distinct
    unordered part pairs within each order, per-node degree, histogram
    over degrees — plus the handshake invariant Σ(degree·n_nodes) =
    2·|E|."""
    got = {
        int(r["degree"]): int(r["n_nodes"])
        for r in registry.QUERIES["graph_degree_distribution"](
            spark, SF_SMOKE
        ).collect()
    }

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ]
    edges = set()
    for _ok, grp in li.groupby("l_orderkey")["l_partkey"]:
        parts = sorted(set(grp))
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                edges.add((a, b))
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hist: dict[int, int] = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1

    assert got == hist
    assert sum(d * n for d, n in got.items()) == 2 * len(edges)


def test_autocorrelation_matches_numpy_recompute(spark):
    """ACF(k), k=1..24, recomputed independently from the textbook
    definition: hourly sums x_t, global mean m = Σx/n, ACF(k) =
    Σ_t (x_t − m)(x_{t+k} − m) / Σ_t (x_t − m)² with the lag pairing on
    the ACTUAL hour index (a missing hour must break the pair, not
    shift it — the classic positional-shift bug this audit exists to
    catch). Also pins |ACF| ≤ 1 and that the query's 24 lags are all
    present."""
    got = {
        int(r["lag"]): float(r["acf"])
        for r in registry.QUERIES["ts_autocorrelation"](
            spark, SF_SMOKE
        ).collect()
    }
    assert sorted(got) == list(range(1, 25))

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["ts", "value"]]
    # unit-independent hour index (the parquet is datetime64[us]; a raw
    # astype(int64) // ns-per-hour would silently mis-scale)
    hidx = (pd.to_datetime(ev["ts"]) - pd.Timestamp(0)) // pd.Timedelta(
        hours=1
    )
    v = ev.groupby(hidx)["value"].sum()
    x = {int(h): float(s) for h, s in v.items()}
    n = len(x)
    m = sum(x.values()) / n
    den = sum((xv - m) ** 2 for xv in x.values())
    for lag in range(1, 25):
        num = sum(
            (xv - m) * (x[h + lag] - m)
            for h, xv in x.items()
            if h + lag in x
        )
        ref = num / den
        assert abs(ref) <= 1 + 1e-9
        # query quantizes per-pair products at 1e-6 before the decimal
        # sum and rounds the ratio at 6 dp; 1e-5 absorbs both while any
        # formula error (wrong mean, positional lag, wrong denominator)
        # shows up at 1e-2+
        assert abs(got[lag] - ref) <= 1e-5, (lag, got[lag], ref)


def test_seasonality_strength_matches_pandas_recompute(spark):
    """Hyndman's F_s = max(0, 1 − Var(residual)/Var(detrended))
    recomputed through an independent pandas decomposition chain
    (centered 25-row MA trend with partial edges → detrend →
    hour-of-day seasonal → residual). Catches an inverted variance
    ratio, a miscentered trend frame, or a seasonal join on the wrong
    key — each of which moves F_s by ≫ the 1e-4 output grid."""
    rows = registry.QUERIES["ts_seasonality_strength"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 1
    got = float(rows[0]["seasonal_strength"])

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")[["ts", "value"]]
    ev["hr"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    h = (
        ev.groupby("hr", as_index=False)["value"]
        .sum()
        .rename(columns={"value": "v"})
        .sort_values("hr")
        .reset_index(drop=True)
    )
    trend = (
        h["v"].rolling(window=25, center=True, min_periods=1).mean()
    ).round(6)
    det = (h["v"] - trend).round(6)
    seasonal = det.groupby(h["hr"].dt.hour).transform("mean").round(6)
    resid = (det - seasonal).round(6)
    var_d = float(np.var(det.to_numpy()))
    var_r = float(np.var(resid.to_numpy()))
    ref = max(0.0, 1.0 - var_r / var_d)
    assert 0.0 <= got <= 1.0
    # output grid is ROUND(4); chain-rounding convention gaps stay ≪ it
    assert abs(got - ref) <= 2e-4, (got, ref)


def test_weighted_median_matches_pandas_recompute(spark):
    """Weighted median per group recomputed independently: collapse
    quantity-weight per distinct price, sort by price, cumulative cut
    at half the total — plus the DEFINING inequalities checked on the
    raw data: W(< m) < T/2 ≤ W(≤ m). Exact equality on the price (the
    cut compares exact integer-valued weights; no float wobble)."""
    got = {
        r["l_returnflag"]: float(r["weighted_median"])
        for r in registry.QUERIES["agg_weighted_median"](
            spark, SF_SMOKE
        ).collect()
    }
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_returnflag", "l_extendedprice", "l_quantity"]
    ]
    assert set(got) == set(li["l_returnflag"].unique())
    for flag, grp in li.groupby("l_returnflag"):
        w = (
            grp.groupby("l_extendedprice")["l_quantity"]
            .sum()
            .sort_index()
        )
        total = float(w.sum())
        cum = w.cumsum()
        m = float(cum.index[(2 * cum >= total).to_numpy().argmax()])
        assert got[flag] == m, (flag, got[flag], m)
        below = float(grp.loc[grp["l_extendedprice"] < m, "l_quantity"].sum())
        at_or_below = float(
            grp.loc[grp["l_extendedprice"] <= m, "l_quantity"].sum()
        )
        assert below < total / 2 <= at_or_below, (flag, below, at_or_below)


def test_gini_matches_numpy_recompute(spark):
    """Gini over per-part revenue recomputed from the rank formula
    G = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n with x sorted ascending — and
    cross-checked against the O(n²)-definition mean-absolute-difference
    form G = Σ|x_i − x_j| / (2n²·x̄) on a sample-safe basis (exact here:
    n is dimension-sized). Two independent formulas agreeing kills any
    rank-convention error."""
    rows = registry.QUERIES["orders_gini_coefficient"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 1
    got = float(rows[0]["gini"])
    n_parts = int(rows[0]["n_parts"])

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_partkey", "l_extendedprice", "l_discount"]
    ]
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .round(6)
        .groupby(li["l_partkey"])
        .sum()
        .to_numpy()
    )
    assert len(rev) == n_parts
    x = np.sort(rev)
    n = len(x)
    ranks = np.arange(1, n + 1, dtype=float)
    g_rank = 2.0 * float(ranks @ x) / (n * x.sum()) - (n + 1.0) / n
    g_mad = float(
        np.abs(x[:, None] - x[None, :]).sum() / (2.0 * n * n * x.mean())
    )
    assert abs(g_rank - g_mad) <= 1e-9
    assert abs(got - g_rank) <= 2e-6, (got, g_rank)


def test_agg_stats_matches_numpy_recompute(spark):
    """Moment statistics recomputed with numpy from the raw column.
    Pins the exact estimator conventions (sample vs population), not
    just cross-engine agreement on whichever one was written."""
    rows = registry.QUERIES["agg_stats"](spark, SF_SMOKE).collect()
    assert rows
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for r in rows:
        d = r.asDict()
        grp = li[li["l_returnflag"] == d["l_returnflag"]]
        x = grp["l_quantity"].to_numpy(dtype=float)
        y = grp["l_extendedprice"].to_numpy(dtype=float)
        n = len(x)
        covar = float(
            ((x - x.mean()) * (y - y.mean())).sum() / (n - 1)
        )
        corr = covar / (np.std(x, ddof=1) * np.std(y, ddof=1))
        # per-column tolerance = the column's own output quantum + ulp
        checks = (
            ("sd_qty", float(np.std(x, ddof=1)), 2e-6),
            ("var_qty", float(np.var(x, ddof=1)), 2e-6),
            ("corr_price_qty", corr, 1e-6),
            ("covar_price_qty", covar, 1e-4 + 1e-9 * abs(covar)),
        )
        for name, ref, tol in checks:
            assert abs(float(d[name]) - ref) <= tol, (name, d[name], ref)
