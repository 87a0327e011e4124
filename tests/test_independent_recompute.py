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
