"""Property-based contracts for the r12-staged GENERATED-EXPRESSION
helpers — the fixture-driven parity tests exercise only the planted
coordinate/ACF values, so these pin the shared SQL against the canonical
algorithm over the whole documented domain (hypothesis + DuckDB; no
SparkSession needed — both engines execute the same generated string, so
one engine suffices to check the string against first principles).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trireme_spark.queries.geo import (
    _GH_ALPHABET,
    _gh_interleave_sql,
    _gh_str_sql,
)
from trireme_spark.queries.timeseries import _PACF_MAXLAG, _dl_levels



pytestmark = pytest.mark.slow  # opt-in battery (r15): run with -m "" or -m slow

def _textbook_geohash(lat: float, lon: float, precision: int = 4) -> str:
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
        out.append(_GH_ALPHABET[v])
    return "".join(out)


@settings(max_examples=80, deadline=None)
@given(
    lat_cell=st.integers(min_value=0, max_value=1023),
    lon_cell=st.integers(min_value=0, max_value=1023),
    lat_f=st.floats(min_value=0.05, max_value=0.95, allow_nan=False),
    lon_f=st.floats(min_value=0.05, max_value=0.95, allow_nan=False),
)
def test_geohash_expression_matches_textbook_off_boundaries(
    lat_cell, lon_cell, lat_f, lon_f
):
    """The generated FLOOR-div interleave equals Niemeyer's
    interval-bisection geohash for any in-domain coordinate AWAY from
    cell boundaries — points are generated cell-INTERIOR by
    construction (cell index + interior fraction) rather than filtered,
    because hypothesis's boundary-loving floats otherwise trip its
    filter-health check. Within a few ulps of a boundary the
    scaled-multiply quantizer and exact-midpoint bisection can assign
    adjacent cells (hypothesis found lon = 45 - 1.4e-14 → cells 639 vs
    640) — a disagreement every pair of fixed-precision geohash
    implementations exhibits, and irrelevant to the product contract,
    which is CROSS-ENGINE determinism of one shared expression."""
    lat = -90.0 + (lat_cell + lat_f) * 180.0 / 1024.0
    lon = -180.0 + (lon_cell + lon_f) * 360.0 / 1024.0
    con = duckdb.connect()
    try:
        # cast BEFORE any arithmetic: DuckDB types bare float literals
        # as DECIMAL, which is not the production path (the planted
        # lat/lon are DOUBLE columns in both engines)
        sql = f"""
        WITH c AS (
          SELECT CAST({lat!r} AS DOUBLE) AS lat,
                 CAST({lon!r} AS DOUBLE) AS lon
        ), q AS (
          SELECT CAST(FLOOR((lat + 90.0) / 180.0 * 1024.0)
                      AS BIGINT) AS lat_q,
                 CAST(FLOOR((lon + 180.0) / 360.0 * 1024.0)
                      AS BIGINT) AS lon_q
          FROM c
        )
        SELECT {_gh_str_sql(_gh_interleave_sql())} AS gh FROM q
        """
        got = con.sql(sql).fetchone()[0]
    finally:
        con.close()
    assert got == _textbook_geohash(lat, lon), (lat, lon)


def _dl_textbook(r: dict[int, float], maxlag: int):
    """Mirrors the chain's NULLIF(den, 0) semantics: a zero denominator
    (possible for NON-ACF inputs like r = [0.5, -0.5, ...] where the
    recursion walks to the |phi| = 1 boundary — hypothesis found it)
    makes that and every dependent phi None, exactly as NULL propagates
    through the generated SQL."""

    def q(v):
        return None if v is None else math.floor(v * 1e9) / 1e9

    def mul(a, b):
        return None if a is None or b is None else a * b

    phi = {(1, 1): q(r[1])}
    for k in range(2, maxlag + 1):
        terms_n = [mul(phi[(k - 1, j)], r[k - j]) for j in range(1, k)]
        terms_d = [mul(phi[(k - 1, j)], r[j]) for j in range(1, k)]
        if any(t is None for t in terms_n + terms_d):
            num = den = None
        else:
            num = r[k] - sum(terms_n)
            den = 1 - sum(terms_d)
        if num is None or den is None or den == 0:
            phi[(k, k)] = None
        else:
            phi[(k, k)] = q(num / den)
        for j in range(1, k):
            prod = mul(phi[(k, k)], phi[(k - 1, k - j)])
            if phi[(k - 1, j)] is None or prod is None:
                phi[(k, j)] = None
            else:
                phi[(k, j)] = q(phi[(k - 1, j)] - prod)
    return {k: phi[(k, k)] for k in range(1, maxlag + 1)}


@settings(max_examples=80, deadline=None)
@given(
    rs=st.lists(
        st.floats(min_value=-0.9, max_value=0.9, allow_nan=False),
        min_size=_PACF_MAXLAG,
        max_size=_PACF_MAXLAG,
    )
)
def test_durbin_levinson_chain_matches_textbook_loop(rs):
    """The generated closed-form DL chain equals the textbook loop for
    arbitrary quantized ACF inputs in (-0.9, 0.9) — including sign
    mixes the fixture series never produces. Inputs pre-quantize at
    1e-6 (the ACF ladder), so the chain sees exactly what production
    feeds it. Degenerate den = 0 inputs (reachable for NON-ACF vectors
    that walk the recursion to the |phi| = 1 boundary — hypothesis
    found r = [0.5, -0.5, 0...]) are NULLIF-guarded in the chain and
    mirrored as None-propagation in the reference loop."""
    r = {
        k: math.floor(v * 1e6) / 1e6
        for k, v in zip(range(1, _PACF_MAXLAG + 1), rs)
    }
    sel = ", ".join(f"CAST({r[k]!r} AS DOUBLE) AS r{k}" for k in r)
    inner = f"(SELECT {sel})"
    for exprs in _dl_levels():
        inner = f"(SELECT *, {', '.join(exprs)} FROM {inner})"
    cols = ", ".join(
        f"phi_{k}_{k}" for k in range(1, _PACF_MAXLAG + 1)
    )
    con = duckdb.connect()
    try:
        got = con.sql(f"SELECT {cols} FROM {inner}").fetchone()
    finally:
        con.close()
    ref = _dl_textbook(r, _PACF_MAXLAG)
    for k, g in zip(range(1, _PACF_MAXLAG + 1), got):
        if ref[k] is None:
            assert g is None, (k, g)
            continue
        if abs(ref[k]) >= 1.5:
            # |phi| >= 1.5 means the ACF sequence is far outside any
            # stationary series' domain; the recursion is still
            # deterministic but ill-conditioned — skip the comparison
            continue
        assert g is not None
        assert abs(g - ref[k]) < 1e-8, (k, g, ref[k])


def _dtw_dp(va, vb):
    n, m = len(va), len(vb)
    inf = float("inf")
    D = [[inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = abs(va[i - 1] - vb[j - 1])
            D[i][j] = cost + min(
                D[i - 1][j], D[i][j - 1], D[i - 1][j - 1]
            )
    return D[n][m]


def _dtw_brute(va, vb):
    """Exponential enumeration of all monotone alignment paths — only
    viable for tiny vectors, which is the point: an implementation so
    simple it cannot share a bug with the DP."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def go(i, j):
        cost = abs(va[i] - vb[j])
        if i == 0 and j == 0:
            return cost
        best = math.inf
        if i > 0:
            best = min(best, go(i - 1, j))
        if j > 0:
            best = min(best, go(i, j - 1))
        if i > 0 and j > 0:
            best = min(best, go(i - 1, j - 1))
        return cost + best

    return go(len(va) - 1, len(vb) - 1)


@settings(max_examples=120, deadline=None)
@given(
    va=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=5,
    ),
    vb=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=2,
        max_size=5,
    ),
)
def test_dtw_dp_matches_brute_force_enumeration(va, vb):
    va, vb = tuple(va), tuple(vb)
    dp = _dtw_dp(va, vb)
    brute = _dtw_brute(va, vb)
    assert math.isclose(dp, brute, rel_tol=0, abs_tol=1e-12)
    if len(va) == len(vb):
        l1 = sum(abs(a - b) for a, b in zip(va, vb))
        assert dp <= l1 + 1e-12


# --- sample_pps_systematic: the hit-count closed form ---------------------------


@settings(max_examples=150, deadline=None)
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=40,
    ),
    n=st.integers(min_value=1, max_value=50),
)
def test_pps_closed_form_places_exactly_n_points(weights, n):
    """f(c) = (2n·c + T) // (2T) differenced over intervals must place
    EXACTLY n selection points for any positive integer weights — the
    fixed-take guarantee the key pins on the fixture, here proved over
    arbitrary weight vectors; and no unit may receive more hits than
    its weight mathematically allows (ceil(w·n/T) + 1 bound)."""
    T = sum(weights)

    def f(c):
        return (2 * n * c + T) // (2 * T)

    cum = 0
    total_hits = 0
    for w in weights:
        lo, hi = cum, cum + w
        cum = hi
        hits = f(hi) - f(lo)
        assert hits >= 0
        assert hits <= -(-w * n // T) + 1, (w, n, T, hits)
        total_hits += hits
    assert total_hits == n, (weights, n)


# --- events_attribution_shapley: weights and efficiency -------------------------


def test_shapley_weight_rows_sum_to_unity():
    """The unrolled (channel, subset) weight table must satisfy
    Σ_S s!(n−1−s)! = n! per channel — the normalization that makes the
    credits a probability-weighted average of marginal contributions."""
    from trireme_spark.queries.timeseries import (
        _SHAP_N,
        _shap_weight_rows,
    )

    per_channel = {}
    for ch, _bit, _mask, wnum in _shap_weight_rows():
        per_channel[ch] = per_channel.get(ch, 0) + wnum
    assert len(per_channel) == _SHAP_N
    assert all(
        v == math.factorial(_SHAP_N) for v in per_channel.values()
    ), per_channel


@settings(max_examples=100, deadline=None)
@given(
    masks=st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=60
    )
)
def test_shapley_lattice_efficiency_for_any_coalition_multiset(masks):
    """For ANY multiset of user coalition bitmasks, the lattice-form
    Shapley credits (integer numerators over n!) sum exactly to
    v(full) − v(∅) — efficiency holds as an integer identity, not just
    on the fixture."""
    from trireme_spark.queries.timeseries import (
        _SHAP_N,
        _shap_weight_rows,
    )

    def v(s_mask):
        return sum(1 for m in masks if m & s_mask == m)

    num24 = {}
    for ch, bit, smask, wnum in _shap_weight_rows():
        num24[ch] = num24.get(ch, 0) + wnum * (
            v(smask | bit) - v(smask)
        )
    total = sum(num24.values())
    assert total == math.factorial(_SHAP_N) * (
        v((1 << _SHAP_N) - 1) - v(0)
    ), (masks, num24)


# --- search_ndcg_eval: greedy slot-arithmetic IDCG ≡ sorted-ideal DCG ------


@given(
    c3=st.integers(min_value=0, max_value=40),
    c2=st.integers(min_value=0, max_value=40),
    c1=st.integers(min_value=0, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_ndcg_greedy_idcg_matches_sorted_ideal(c3, c2, c1):
    """The implementation computes IDCG without sorting: the corpus
    gain histogram fills the top-k slots greedily via pinned discount
    PREFIX sums. Property: for ANY histogram, that slot arithmetic
    equals the textbook 'sort all gains desc, take k, sum discounted'
    definition — including every under-full edge (fewer than k docs,
    zero c3, all-zero gains)."""
    from trireme_spark.queries.search import _NDCG_K, _NDCG_PREFIX

    t3 = min(c3, _NDCG_K)
    t2 = min(c2, _NDCG_K - t3)
    t1 = min(c1, _NDCG_K - t3 - t2)
    greedy = (
        7 * (_NDCG_PREFIX[t3] - _NDCG_PREFIX[0])
        + 3 * (_NDCG_PREFIX[t3 + t2] - _NDCG_PREFIX[t3])
        + 1 * (_NDCG_PREFIX[t3 + t2 + t1] - _NDCG_PREFIX[t3 + t2])
    )
    ideal = sorted([3] * c3 + [2] * c2 + [1] * c1, reverse=True)[:_NDCG_K]
    brute = sum(
        (2**g - 1) / math.log2(i + 1) for i, g in enumerate(ideal, start=1)
    )
    assert abs(greedy - brute) < 1e-9


# --- ts_dickey_fuller_unit_root: closed form ≡ least squares ---------------


@given(
    ys=st.lists(
        st.floats(
            min_value=1.0, max_value=1e6, allow_nan=False,
            allow_infinity=False,
        ),
        min_size=8,
        max_size=60,
    )
)
@settings(max_examples=150, deadline=None)
def test_df_sufficient_stat_ols_matches_lstsq(ys):
    """The DF key fits Δy_t = α + ρ·y_{t−1} in closed form from
    centered sufficient statistics. Property: for ANY level series
    with a non-degenerate lag (Sxx > 0), ρ̂ and the t-stat equal a
    numpy least-squares fit of the same regression."""
    import numpy as np

    yl = np.array(ys[:-1])
    dy = np.array(ys[1:]) - yl
    n = len(dy)
    sxx = float(((yl - yl.mean()) ** 2).sum())
    if sxx < 1e-6:  # constant series: ρ undefined, key's n>2 real data
        return
    sxy = float(((yl - yl.mean()) * (dy - dy.mean())).sum())
    syy = float(((dy - dy.mean()) ** 2).sum())
    rho = sxy / sxx
    ssr = syy - sxy * sxy / sxx
    X = np.column_stack([np.ones(n), yl])
    beta, *_ = np.linalg.lstsq(X, dy, rcond=None)
    resid = dy - X @ beta
    assert abs(rho - beta[1]) < 1e-6 * max(1.0, abs(beta[1]))
    # tolerance scales with the PRE-cancellation magnitude: the closed
    # form computes ssr = syy − sxy²/sxx, whose float error is
    # O(eps · max(syy, sxy²/sxx)) — on adversarial series (hypothesis
    # found one: huge levels, near-zero residual variance) that dwarfs
    # any fixed fraction of the post-cancellation ssr itself
    cancel_mag = max(1.0, syy, sxy * sxy / sxx)
    assert abs(ssr - float(resid @ resid)) < 1e-9 * cancel_mag + 1e-6


# --- events_ab_jackknife_ratio: LOO algebra ≡ brute recomputation ----------


@given(
    cells=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**7),  # sx (micro)
            st.integers(min_value=1, max_value=10**4),  # sy
        ),
        min_size=2,
        max_size=16,
    )
)
@settings(max_examples=200, deadline=None)
def test_jackknife_loo_algebra_matches_brute_recomputation(cells):
    """The key computes every leave-one-bucket-out ratio as algebra on
    cell sums (Sx − sx_b)/(Sy − sy_b). Property: for ANY cell
    structure, that equals literally re-summing the remaining buckets
    — the identity that lets B pseudo-replicates cost B metadata rows
    instead of B corpus passes."""
    sx_tot = sum(c[0] for c in cells)
    sy_tot = sum(c[1] for c in cells)
    for i, (sx_b, sy_b) in enumerate(cells):
        rest_x = sum(c[0] for j, c in enumerate(cells) if j != i)
        rest_y = sum(c[1] for j, c in enumerate(cells) if j != i)
        if rest_y == 0:
            continue  # the key's pinned >=2-occupied-buckets assumption
        algebra = (sx_tot - sx_b) / 1e6 / (sy_tot - sy_b)
        brute = rest_x / 1e6 / rest_y
        assert algebra == brute  # exact: integer subtraction both ways
