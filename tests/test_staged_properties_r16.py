"""Property-based contracts for the r16-staged statistical machinery —
the fixture parity tests exercise one planted dataset; these pin the
CLOSED FORMS both engines execute against first principles over the
whole documented domain (hypothesis; no SparkSession needed — both
engines evaluate the same fixed-order expression, so checking the
expression against the textbook algorithm checks both).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Jonckheere-Terpstra: the one-pass ladder formula
# 2·JT = Σ_v Σ_{i<j} c_j(v)·(2·below_i(v) + c_i(v)) must equal the
# textbook pair count Σ_{i<j} #{x_i < x_j} + ½·#{ties} for ANY data.
# ---------------------------------------------------------------------------



pytestmark = pytest.mark.slow  # opt-in battery (r15): run with -m "" or -m slow

def _jt_ladder(groups: list[list[int]]) -> float:
    values = sorted({v for g in groups for v in g})
    cnt = [Counter(g) for g in groups]
    below = [0] * len(groups)
    jt2 = 0
    for v in values:
        c = [cnt[i].get(v, 0) for i in range(len(groups))]
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                jt2 += c[j] * (2 * below[i] + c[i])
        for i in range(len(groups)):
            below[i] += c[i]
    return jt2 / 2


def _jt_brute(groups: list[list[int]]) -> float:
    jt = 0.0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for a in groups[i]:
                for b in groups[j]:
                    if a < b:
                        jt += 1
                    elif a == b:
                        jt += 0.5
    return jt


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=12),
        min_size=2,
        max_size=5,
    )
)
def test_jt_ladder_equals_brute_force_pairs(groups):
    assert _jt_ladder(groups) == _jt_brute(groups)


# ---------------------------------------------------------------------------
# Mood's median test is invariant under ANY strictly monotone transform
# (it only consumes order relative to the grand LOWER median).
# ---------------------------------------------------------------------------


def _mood_chi2(values: list[int], labels: list[int]):
    n = len(values)
    med = sorted(values)[math.ceil(n / 2) - 1]
    groups = sorted(set(labels))
    atot = sum(1 for v in values if v > med)
    chi2 = 0.0
    for g in groups:
        ng = sum(1 for x in labels if x == g)
        ag = sum(1 for v, x in zip(values, labels) if x == g and v > med)
        e1 = ng * (atot / n)
        d = ag - e1
        if e1 > 0 and ng - e1 > 0:
            chi2 += d * d / e1 + d * d / (ng - e1)
    return med, atot, chi2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=8,
        max_size=60,
    )
)
def test_mood_invariant_under_monotone_transform(rows):
    values = [v for v, _ in rows]
    labels = [g for _, g in rows]
    med1, a1, c1 = _mood_chi2(values, labels)
    transformed = [v * v * v + 7 for v in values]  # strictly monotone on ≥0
    med2, a2, c2 = _mood_chi2(transformed, labels)
    assert med2 == med1 * med1 * med1 + 7
    assert a2 == a1
    assert abs(c2 - c1) < 1e-9


# ---------------------------------------------------------------------------
# Welch ANOVA at k=2 collapses to the Welch t-test: F* = t² and
# df2 = the Welch-Satterthwaite df. Checked over generated 2-group
# moment sets (the same closed forms the engines evaluate).
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(1.0, 100.0), min_size=4, max_size=30),
    st.lists(st.floats(1.0, 100.0), min_size=4, max_size=30),
)
def test_welch_anova_k2_equals_welch_ttest_squared(xs, ys):
    g = []
    for vals in (xs, ys):
        a = np.asarray(vals)
        n, m, s2 = len(a), a.mean(), a.var(ddof=1)
        if s2 <= 1e-12:
            return  # degenerate group — outside the test's domain
        g.append((n, m, s2))
    k = 2
    w = [n / s2 for n, _, s2 in g]
    bigw = sum(w)
    xw = sum(wi * m for wi, (_, m, _) in zip(w, g)) / bigw
    a_num = sum(wi * (m - xw) ** 2 for wi, (_, m, _) in zip(w, g))
    h = sum(
        (1 - wi / bigw) ** 2 / (n - 1) for wi, (n, _, _) in zip(w, g)
    )
    f_star = (a_num / (k - 1)) / (1 + 2.0 * (k - 2) / (k * k - 1) * h)
    # welch t
    (n1, m1, v1), (n2, m2, v2) = g
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    df_ws = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert abs(f_star - t * t) < 1e-7 * max(1.0, t * t)
    df2 = (k * k - 1.0) / (3 * h)
    assert abs(df2 - df_ws) < 1e-7 * df_ws


# ---------------------------------------------------------------------------
# CMH with a SINGLE stratum equals (n−1)/n × the Pearson χ² of the 2×2
# (the conditional-hypergeometric variance's well-known relation).
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.tuples(
        st.integers(1, 30),
        st.integers(1, 30),
        st.integers(1, 30),
        st.integers(1, 30),
    )
)
def test_cmh_single_stratum_is_scaled_pearson(cells):
    a, b, c, d = cells
    n = a + b + c + d
    e = (a + b) * (a + c) / n
    var = (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    if var == 0:
        return
    cmh = (a - e) ** 2 / var
    pearson = (
        n
        * (a * d - b * c) ** 2
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    assert abs(cmh - (n - 1) / n * pearson) < 1e-9 * max(1.0, pearson)


# ---------------------------------------------------------------------------
# Kneser-Ney normalization: for ANY corpus, Σ_{w2 ∈ seen vocab}
# P_KN(w2|w1) = 1 exactly when every observed count ≥ 1 > D.
# ---------------------------------------------------------------------------


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=5), min_size=2, max_size=12
        ),
        min_size=1,
        max_size=8,
    )
)
def test_kn_sums_to_one_for_any_corpus(docs):
    d_disc = 0.75
    cbg = Counter()
    for toks in docs:
        cbg.update(zip(toks, toks[1:]))
    if not cbg:
        return
    c1, fw, bw = Counter(), Counter(), Counter()
    for (w1, w2), c in cbg.items():
        c1[w1] += c
        fw[w1] += 1
        bw[w2] += 1
    nb = len(cbg)
    vocab = set(bw)
    for w1 in c1:
        total = sum(
            (
                max(cbg.get((w1, w2), 0) - d_disc, 0)
                + d_disc * fw[w1] * (bw[w2] / nb)
            )
            / c1[w1]
            for w2 in vocab
        )
        assert abs(total - 1.0) < 1e-9, (w1, total)


# ---------------------------------------------------------------------------
# Theta method: the unrolled geometric SES weights equal the recursion
# L_t = αz_t + (1−α)L_{t−1} (L_1 = z_1) for any series, any α ∈ (0,1).
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-10.0, 10.0), min_size=2, max_size=40),
    st.sampled_from([0.25, 0.5, 0.75]),
)
def test_ses_geometric_weights_equal_recursion(z, alpha):
    n = len(z)
    level = z[0]
    for i in range(1, n):
        level = alpha * z[i] + (1 - alpha) * level
    unrolled = z[0] * (1 - alpha) ** (n - 1) + sum(
        alpha * (1 - alpha) ** (n - i - 1) * z[i] for i in range(1, n)
    )
    assert abs(level - unrolled) < 1e-9 * max(
        1.0, max(abs(v) for v in z)
    )


# ---------------------------------------------------------------------------
# Goh-Barabási burstiness bounds: B ∈ (−1, 1) for any non-degenerate
# positive gap multiset, and B = −1 exactly for a metronome (σ = 0).
# ---------------------------------------------------------------------------


def _burstiness(gaps):
    n = len(gaps)
    sg = sum(gaps)
    sgg = sum(g * g for g in gaps)
    mu = sg / n
    sd = math.sqrt(max(0.0, (sgg - sg * sg / n) / (n - 1)))
    return (sd - mu) / (sd + mu)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=2, max_size=50)
)
def test_burstiness_bounds(gaps):
    b = _burstiness(gaps)
    assert -1 <= b < 1
    if len(set(gaps)) == 1:
        assert b == -1.0


# ---------------------------------------------------------------------------
# Bartlett scale invariance: T(c·x) = T(x) up to float noise for any
# positive scale — the property that justifies the engines' mean
# normalization.
# ---------------------------------------------------------------------------


def _bartlett_t(groups):
    k = len(groups)
    ns = np.array([len(g) for g in groups], dtype=float)
    vs = np.array([np.var(g, ddof=1) for g in groups])
    if (vs <= 0).any():
        return None
    nt = ns.sum()
    sp2 = ((ns - 1) * vs).sum() / (nt - k)
    c = 1 + ((1 / (ns - 1)).sum() - 1 / (nt - k)) / (3 * (k - 1))
    return ((nt - k) * math.log(sp2) - ((ns - 1) * np.log(vs)).sum()) / c


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(1.0, 50.0), min_size=3, max_size=20),
        min_size=2,
        max_size=5,
    ),
    st.floats(0.001, 1000.0),
)
def test_bartlett_scale_invariant(groups, scale):
    arrays = [np.asarray(g) for g in groups]
    t1 = _bartlett_t(arrays)
    if t1 is None:
        return
    t2 = _bartlett_t([a * scale for a in arrays])
    assert t2 is not None
    assert abs(t2 - t1) < 1e-6 * max(1.0, abs(t1))
