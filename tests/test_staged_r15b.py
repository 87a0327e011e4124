"""r15-staged keys, batch 2 — parked UNregistered (r15 lot now 8):

  orders_rank_biserial     — effect size for the MWU rank test (the
                             is-it-real / is-it-big pairing for ranks)
  ts_hurst_exponent        — R/S long-memory diagnostic beside the
                             DF / KPSS / VR stationarity triple
  events_littles_law_check — L = λ·W measured from both sides, with
                             the minute-sampling bias printed

Same contract set as the other staging files.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _RB_ORACLE,
    _RB_THRESHOLDS,
    orders_rank_biserial,
)
from trireme_spark.queries.timeseries import (
    _HURST_ORACLE,
    _HURST_SIZES,
    _LITTLE_GAP_MIN,
    _LITTLE_ORACLE,
    events_littles_law_check,
    orders_page_hinkley,  # noqa: F401 (same-lot sibling, keeps import graph flat)
    ts_hurst_exponent,
)

STAGED = {
    "orders_rank_biserial": (orders_rank_biserial, _RB_ORACLE),
    "ts_hurst_exponent": (ts_hurst_exponent, _HURST_ORACLE),
    "events_littles_law_check": (
        events_littles_law_check,
        _LITTLE_ORACLE,
    ),
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


# --- orders_rank_biserial ---------------------------------------------------------


def test_rank_biserial_python_recompute(spark):
    """Midrank recompute in scipy-free python: full rank assignment
    with midranks (NOT the value ladder), U from the rank sum."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(int)
    wknd = o.o_orderdate.dt.dayofweek.isin([5, 6])
    df = pd.DataFrame({"c": cents, "w": wknd})
    df["rank"] = df.c.rank(method="average")
    n1 = int(df.w.sum())
    n2 = len(df) - n1
    r1 = float(df.loc[df.w, "rank"].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    cl = u1 / (n1 * n2)
    rb = 2 * cl - 1
    got = orders_rank_biserial(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_weekend) == n1 and int(got.n_weekday) == n2
    assert abs(float(got.common_language) - cl) < 2e-6
    assert abs(float(got.rank_biserial) - rb) < 2e-6
    a = abs(float(got.rank_biserial))
    s, m, l = _RB_THRESHOLDS
    expect = (
        "negligible" if a < s else "small" if a < m else
        "medium" if a < l else "large"
    )
    assert got.magnitude == expect


def test_rank_biserial_agrees_with_mwu_direction(spark):
    """On the same split, the effect sign must agree with the MWU z
    sign (both read 'weekend higher' the same way)."""
    rb = float(
        orders_rank_biserial(spark, SF_SMOKE).toPandas().iloc[0].rank_biserial
    )
    z = float(
        registry.QUERIES["orders_mannwhitney_u"](spark, SF_SMOKE)
        .toPandas()
        .iloc[0]
        .z
    )
    assert rb == 0 or z == 0 or (rb > 0) == (z > 0)


def test_rank_biserial_plan_shape(spark):
    """The MWU plan: one value-grain rollup, one meta-scale prefix
    window, one fold — ranks never materialize per row."""
    from tests.test_plans import plan

    p = plan(orders_rank_biserial(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- ts_hurst_exponent ------------------------------------------------------------


def test_hurst_numpy_recompute(spark):
    """Textbook R/S in numpy on the raw series (no normalization —
    R/S is scale-invariant, so the answers must agree)."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    mm = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(mm)["o_totalprice"].sum().sort_index().to_numpy()
    pts = []
    per_size = {}
    for sz in _HURST_SIZES:
        nb = len(y) // sz
        rss = []
        for b in range(nb):
            blk = y[b * sz : (b + 1) * sz]
            d = blk - blk.mean()
            c = np.cumsum(d)
            rss.append((c.max() - c.min()) / blk.std(ddof=0))
        per_size[sz] = (nb, float(np.mean(rss)))
        pts.append((math.log(sz), math.log(np.mean(rss))))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    h = float(
        ((xs * ys).sum() - xs.sum() * ys.sum() / len(xs))
        / ((xs * xs).sum() - xs.sum() ** 2 / len(xs))
    )
    got = (
        ts_hurst_exponent(spark, SF_SMOKE)
        .toPandas()
        .sort_values("block_size")
        .reset_index(drop=True)
    )
    assert [int(x) for x in got.block_size] == sorted(_HURST_SIZES)
    for _, row in got.iterrows():
        nb, avg = per_size[int(row.block_size)]
        assert int(row.n_blocks) == nb
        assert abs(float(row.avg_rescaled_range) - avg) < 1e-4
        assert abs(float(row.hurst_h) - h) < 1e-4
    assert got.hurst_h.nunique() == 1
    assert 0.0 < float(got.hurst_h.iloc[0]) < 1.5  # sane H range


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_hurst_fixture_assumptions(sf_dir):
    """Every pinned block size yields ≥ 2 full blocks with
    non-degenerate within-block spread (S > 0)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    mm = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month
    y = o.groupby(mm)["o_totalprice"].sum().sort_index().to_numpy()
    for sz in _HURST_SIZES:
        nb = len(y) // sz
        assert nb >= 2, (sz, len(y))
        for b in range(nb):
            assert y[b * sz : (b + 1) * sz].std(ddof=0) > 0


def test_hurst_plan_shape(spark):
    """One corpus scan (cached monthly frame); the size spine is a
    3-element literal explode; every window is (size, block)-keyed or
    over the 3-row fit frame."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(ts_hurst_exponent(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p


# --- events_littles_law_check -----------------------------------------------------


def _sessions(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(sf_dir + "/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    gap = pd.Timedelta(minutes=_LITTLE_GAP_MIN)
    rows = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for t in g.ts:
            if prev is None or t - prev >= gap:
                if start is not None:
                    rows.append((start, prev))
                start = t
            prev = t
        rows.append((start, prev))
    return pd.DataFrame(rows, columns=["s", "e"])


def test_littles_law_python_recompute(spark):
    """Session walk + exact integer occupancy in pure python."""
    s = _sessions(SF_SMOKE)
    s["m0"] = s.s.astype("int64") // (60 * 10**9)
    s["m1"] = s.e.astype("int64") // (60 * 10**9)
    s["dur_us"] = (s.e.astype("int64") - s.s.astype("int64")) // 1000
    lo, hi = int(s.m0.min()), int(s.m1.max()) + 1
    occ = 0
    deltas = {}
    for r in s.itertuples(index=False):
        deltas[r.m0] = deltas.get(r.m0, 0) + 1
        deltas[r.m1 + 1] = deltas.get(r.m1 + 1, 0) - 1
    conc = 0
    ms = sorted(deltas)
    for i, mnt in enumerate(ms):
        conc += deltas[mnt]
        nxt = ms[i + 1] if i + 1 < len(ms) else mnt
        occ += conc * (nxt - mnt)
    span = hi - lo
    n = len(s)
    sum_dur = int(s.dur_us.sum())
    got = events_littles_law_check(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_sessions) == n
    assert int(got.span_minutes) == span
    assert abs(float(got.w_mean_minutes) - sum_dur / n / 6e7) < 2e-6
    assert abs(float(got.lambda_per_minute) - n / span) < 2e-6
    assert abs(float(got.l_littles) - sum_dur / 6e7 / span) < 2e-6
    assert abs(float(got.l_sampled) - occ / span) < 2e-6
    # identity: the printed bias IS the two L readouts' gap, and the
    # minute-sampled occupancy can only OVERcount (sessions occupy
    # whole minutes)
    assert float(got.sampling_bias) >= -1e-6
    assert (
        abs(
            float(got.sampling_bias)
            - (float(got.l_sampled) - float(got.l_littles))
        )
        < 3e-6
    )


def test_littles_law_plan_shape(spark):
    """Sessionization is ONE user-keyed window pass; the cached
    session frame feeds the fold, the boundary sweep and the totals;
    no cartesian beyond the 1-row attach."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(events_littles_law_check(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "InMemoryTableScan" in p, p
    assert "CartesianProduct" not in p, p
