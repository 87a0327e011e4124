"""r12-staged keys, batch 2 — built and verified this round ahead of the
r12 registration (the post-428 cadence; SURVEY round-11 log). Four more
keys are fully implemented and oracle-verified NOW so the r12 resumption
is a one-line decorator flip each plus a _SWEEP_PRIORITY slot:

  events_ab_delta_method    — ratio-of-sums A/B readout, delta-method Var
  ts_cross_correlation_leadlag — lead-lag CCF between two daily series
  agg_woe_information_value — WoE / IV binary-label feature screening
  geo_geohash_encode        — bit-interleaved base32 spatial bucketing

Same contract set as tests/test_staged_r12.py: driver-style oracle parity
at the smoke AND grading scales, an independent recompute (pure python /
pandas — no Spark expressions, no DuckDB), a plan-shape pin, layout
invariance, and a registration-consistency guard that holds before AND
after the flip.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _WOE_IV_ORACLE,
    agg_woe_information_value,
)
from trireme_spark.queries.geo import _GEOHASH_ORACLE, geo_geohash_encode
from trireme_spark.queries.timeseries import (
    _CCF_ORACLE,
    _DELTA_METHOD_ORACLE,
    events_ab_delta_method,
    ts_cross_correlation_leadlag,
)

STAGED = {
    "events_ab_delta_method": (events_ab_delta_method, _DELTA_METHOD_ORACLE),
    "ts_cross_correlation_leadlag": (
        ts_cross_correlation_leadlag,
        _CCF_ORACLE,
    ),
    "agg_woe_information_value": (
        agg_woe_information_value,
        _WOE_IV_ORACLE,
    ),
    "geo_geohash_encode": (geo_geohash_encode, _GEOHASH_ORACLE),
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
    """Holds on both sides of the r12 flip: while staged the key must
    NOT be registered; once it registers, its oracle must be the staged
    constant and it must own a sweep slot (a half-applied flip fails
    here, not as a wasted graded slot)."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


def _arm(user_id: int, seed: str) -> int:
    h = hashlib.md5(f"{user_id}|{seed}".encode()).hexdigest()[:8]
    return int(h, 16) % 2


def _dec6(v: float) -> Decimal:
    """Mirror of the DECIMAL(27,6) round-trip both engines apply."""
    return Decimal(repr(float(v))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


# --- events_ab_delta_method ---------------------------------------------------


def test_delta_method_python_recompute(spark):
    """First-principles delta method over per-user (X, Y) from the raw
    parquet: ratio = ΣX/ΣY per arm, Var via sample moments, z on the
    pooled SE — matches the key within quantization tolerance."""
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    users = {}
    for r in ev.itertuples(index=False):
        uid = int(r.user_id)
        x, y = users.setdefault(uid, [Decimal(0), 0])
        if r.event_type == "purchase":
            users[uid][0] = x + _dec6(r.value)
        if r.event_type in ("click", "view"):
            users[uid][1] = y + 1
    arms = {0: [], 1: []}
    for uid, (x, y) in users.items():
        arms[_arm(uid, "delta")].append((float(x), float(y)))
    stats = {}
    for a, rows in arms.items():
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        ratio = sx / sy
        vx = sum((x - sx / n) ** 2 for x, _ in rows) / (n - 1)
        vy = sum((y - sy / n) ** 2 for _, y in rows) / (n - 1)
        cxy = sum(
            (x - sx / n) * (y - sy / n) for x, y in rows
        ) / (n - 1)
        var_r = (vx - 2 * ratio * cxy + ratio * ratio * vy) / (
            n * (sy / n) ** 2
        )
        stats[a] = (n, ratio, var_r)
    got = events_ab_delta_method(spark, SF_SMOKE).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert int(row.n_a) == stats[0][0]
    assert int(row.n_b) == stats[1][0]
    assert abs(float(row.ratio_a) - stats[0][1]) < 2e-6
    assert abs(float(row.ratio_b) - stats[1][1]) < 2e-6
    se = math.sqrt(stats[0][2] + stats[1][2])
    z = (stats[1][1] - stats[0][1]) / se
    assert abs(float(row.se) - se) < 2e-6
    assert abs(float(row.z) - z) < 2e-6
    assert bool(row.significant) == (abs(float(row.z)) > 1.96)


def test_delta_method_plan_shape(spark):
    """Pure aggregation pipeline — user rollup, 2-row arm moments,
    1-row fold: no join anywhere."""
    from tests.test_plans import plan

    p = plan(events_ab_delta_method(spark, SF_SMOKE))
    assert "Join" not in p, p
    # one scan: formatted plans print a scan twice (tree + detail header)
    assert p.count("Location: InMemoryFileIndex") == 1, p


# --- ts_cross_correlation_leadlag ----------------------------------------------


def test_ccf_python_recompute(spark):
    """Pandas recompute: daily conditional revenue rollup, per-lag
    Pearson over matched days, peak = max |ccf| with smallest lag."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["dd"] = (
        df["o_orderdate"] - pd.Timestamp("1990-01-01")
    ).dt.days.astype(int)
    daily = {}
    for r in df.itertuples(index=False):
        x, y = daily.setdefault(int(r.dd), [Decimal(0), Decimal(0)])
        if r.c_mktsegment == "BUILDING":
            daily[int(r.dd)][0] = x + _dec6(r.o_totalprice)
        if r.c_mktsegment == "MACHINERY":
            daily[int(r.dd)][1] = y + _dec6(r.o_totalprice)
    series = {d: (float(x), float(y)) for d, (x, y) in daily.items()}
    ref = {}
    for lag in range(-7, 8):
        pairs = [
            (series[d][0], series[d + lag][1])
            for d in series
            if d + lag in series
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        ccf = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        ref[lag] = (n, ccf)
    got = ts_cross_correlation_leadlag(spark, SF_SMOKE).toPandas()
    assert len(got) == 15
    peak = max(ref, key=lambda k: (abs(ref[k][1]), -k))
    for r in got.itertuples(index=False):
        n, ccf = ref[int(r.lag)]
        assert int(r.n_pairs) == n, r.lag
        assert abs(float(r.ccf) - ccf) < 1e-5, r.lag
        assert bool(r.is_peak) == (int(r.lag) == peak), r.lag


def test_ccf_plan_shape(spark):
    """Customer dim broadcasts into the fact rollup; the lag spine is a
    broadcast onto the DAY-grain series; the peak rank window keeps a
    partition spec (meta_part) — never an empty OVER ()."""
    from tests.test_plans import plan

    p = plan(ts_cross_correlation_leadlag(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "windowspecdefinition" in p, p
    assert "SinglePartition" not in p, p


# --- agg_woe_information_value --------------------------------------------------


def test_woe_iv_python_recompute(spark):
    """First-principles WoE/IV with Haldane +0.5 on every cell; the
    per-feature IV is re-derived from exact integer micro-units."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    o = o.assign(bad=(o.o_orderstatus == "F").astype(int))
    cells = {}
    for r in o.itertuples(index=False):
        for feature, bin_ in (
            ("priority", r.o_orderpriority),
            ("price_band", f"band_{int(r.o_totalprice // 100000)}"),
        ):
            g, b = cells.setdefault((feature, bin_), [0, 0])
            cells[(feature, bin_)][0] = g + (1 - r.bad)
            cells[(feature, bin_)][1] = b + r.bad
    tot = {}
    for (feature, _), (g, b) in cells.items():
        tg, tb = tot.setdefault(feature, [0, 0])
        tot[feature] = [tg + g, tb + b]
    ref = {}
    iv_micro = {}
    for (feature, bin_), (g, b) in cells.items():
        G, B = tot[feature]
        gs = (g + 0.5) / (G + 0.5)
        bs = (b + 0.5) / (B + 0.5)
        woe = math.log(gs / bs)
        ref[(feature, bin_)] = (g, b, woe, (gs - bs) * woe)
        iv_micro[feature] = iv_micro.get(feature, 0) + math.floor(
            (gs - bs) * woe * 1e6
        )
    got = agg_woe_information_value(spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    for r in got.itertuples(index=False):
        g, b, woe, term = ref[(r.feature, r.bin)]
        assert int(r.n_good) == g and int(r.n_bad) == b, (r.feature, r.bin)
        assert abs(float(r.woe) - woe) < 2e-6, (r.feature, r.bin)
        assert abs(float(r.iv_term) - term) < 2e-6, (r.feature, r.bin)
        assert float(r.feature_iv) == iv_micro[r.feature] / 1e6, r.feature


def test_woe_iv_plan_shape(spark):
    """The two-feature unpivot is an inline explode over ONE scan — F
    features never cost F passes — and the share denominators are a
    dimension-sized window, not a re-aggregation join."""
    from tests.test_plans import plan

    p = plan(agg_woe_information_value(spark, SF_SMOKE))
    # one scan: formatted plans print a scan twice (tree + detail header)
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Generate" in p, p
    assert "windowspecdefinition" in p, p
    assert "Join" not in p, p


# --- geo_geohash_encode ---------------------------------------------------------


def _textbook_geohash(lat: float, lon: float, precision: int = 4) -> str:
    """Independent reference: Niemeyer's interval-bisection encoding,
    written the way every geohash library writes it (no shared code
    with the key's FLOOR-div bit arithmetic)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for bit in bits[i * 5 : i * 5 + 5]:
            v = v * 2 + bit
        out.append(alphabet[v])
    return "".join(out)


def _plant_py(key: int, salt: int) -> float:
    return ((key + salt) % 2147483648) * 2654435761 % 4294967296 / 4294967296


def test_geohash_matches_textbook_encoder(spark):
    """Every customer's cell from the key's generated bit arithmetic
    equals the textbook interval-bisection geohash of the same planted
    coordinates — then the rollup is re-derived from those cells."""
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    counts = {}
    for k in c.c_custkey:
        lat = _plant_py(int(k), 1) * 120 - 60
        lon = _plant_py(int(k), 2) * 240 - 120
        gh = _textbook_geohash(lat, lon)
        counts[gh] = counts.get(gh, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = geo_geohash_encode(spark, SF_SMOKE).toPandas()
    assert len(got) == len(top)
    for r, (gh, n) in zip(got.itertuples(index=False), top):
        assert r.geohash4 == gh
        assert int(r.n_customers) == n


def test_geohash_plan_shape(spark):
    """Per-row column algebra + one cell rollup + TakeOrdered — no UDF,
    no join, no window."""
    from tests.test_plans import plan

    p = plan(geo_geohash_encode(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p, p
    assert "Join" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


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
