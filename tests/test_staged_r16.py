"""r16-staged keys, batch 1 — parked UNregistered (r16 lot opens at 4):

  agg_bartlett_test       — classical (normal-theory) variance-
                            homogeneity χ², the powerful sibling of
                            the robust agg_brown_forsythe
  agg_welch_anova         — heteroscedasticity-robust one-way ANOVA,
                            the k-sample welch_ttest
  agg_mood_median_test    — above/below-grand-median χ², the
                            assumption-free member of the location
                            family beside kruskal
  agg_partial_correlation — first-order partial r (price ~ quantity
                            | discount) + Fisher z, one-scan moments

Same contract set as the r14/r15 staging files: two-scale DuckDB
parity, independent python recompute, fixture-assumption pins, plan
pins, layout invariance, registration/slot guards valid on both sides
of the flip; hostile-TZ + ANSI-off replays ride
scripts/staged_replay.py at closing.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _BARTLETT_CHI2_CRIT,
    _BARTLETT_ORACLE,
    _MOOD_CHI2_CRIT,
    _MOOD_ORACLE,
    _PCORR_ORACLE,
    _PCORR_Z_CRIT,
    _WELCH_ANOVA_F_CRIT,
    _WELCH_ANOVA_ORACLE,
    agg_bartlett_test,
    agg_mood_median_test,
    agg_partial_correlation,
    agg_welch_anova,
)

STAGED = {
    "agg_bartlett_test": (agg_bartlett_test, _BARTLETT_ORACLE),
    "agg_welch_anova": (agg_welch_anova, _WELCH_ANOVA_ORACLE),
    "agg_mood_median_test": (agg_mood_median_test, _MOOD_ORACLE),
    "agg_partial_correlation": (
        agg_partial_correlation,
        _PCORR_ORACLE,
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


# --- shared moment helpers ---------------------------------------------------


def _q6(x: float) -> Decimal:
    """Mirror of the DECIMAL(27,6) per-row cast both engines apply."""
    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _group_moments(sf_dir: str):
    """(n_i, sx_i, qx_i) per priority of x = price / exact-global-mean,
    mirroring the engines' quantized two-pass."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    mu = float(sum(_q6(v) for v in o.o_totalprice)) / len(o)
    out = {}
    for g, sub in o.groupby("o_orderpriority"):
        x = [float(v) / mu for v in sub.o_totalprice]
        out[g] = (
            len(x),
            float(sum(_q6(v) for v in x)),
            float(sum(_q6(v * v) for v in x)),
        )
    return out


# --- agg_bartlett_test --------------------------------------------------------


def test_bartlett_python_recompute(spark):
    mom = _group_moments(SF_SMOKE)
    k = len(mom)
    nt = sum(n for n, _, _ in mom.values())
    s2 = {
        g: (qx - sx * sx / n) / (n - 1) for g, (n, sx, qx) in mom.items()
    }
    ssw = sum((mom[g][0] - 1) * s2[g] for g in mom)
    sln = sum((mom[g][0] - 1) * math.log(s2[g]) for g in mom)
    sinv = sum(1.0 / (mom[g][0] - 1) for g in mom)
    c = 1 + (sinv - 1 / (nt - k)) / (3 * (k - 1))
    t = ((nt - k) * math.log(ssw / (nt - k)) - sln) / c
    got = agg_bartlett_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == nt
    assert int(got.n_groups) == k
    assert abs(float(got.bartlett_t) - t) < 1e-5
    assert bool(got.heteroscedastic) == (
        float(got.bartlett_t) > _BARTLETT_CHI2_CRIT
    )


def test_bartlett_scale_invariance_raw_vs_normalized(spark):
    """The normalization is exactness plumbing, not semantics: the raw
    un-normalized numpy Bartlett statistic agrees to ~quantization
    error."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    groups = [
        sub.o_totalprice.to_numpy(dtype=float)
        for _, sub in o.groupby("o_orderpriority")
    ]
    k = len(groups)
    ns = np.array([len(g) for g in groups], dtype=float)
    vs = np.array([g.var(ddof=1) for g in groups])
    nt = ns.sum()
    sp2 = ((ns - 1) * vs).sum() / (nt - k)
    t = ((nt - k) * math.log(sp2) - ((ns - 1) * np.log(vs)).sum()) / (
        1 + ((1 / (ns - 1)).sum() - 1 / (nt - k)) / (3 * (k - 1))
    )
    got = float(
        agg_bartlett_test(spark, SF_SMOKE).toPandas().iloc[0].bartlett_t
    )
    assert abs(got - t) / max(abs(t), 1.0) < 5e-3


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_bartlett_fixture_assumptions(sf_dir):
    """Every priority keeps n ≥ 30 and a strictly positive variance at
    both scales (ln's domain; the χ²(4) approximation's comfort
    zone)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    for _, sub in o.groupby("o_orderpriority"):
        assert len(sub) >= 30
        assert sub.o_totalprice.var(ddof=1) > 0


def test_bartlett_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_bartlett_test(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "SortMergeJoin" not in p, p
    # 1-row mean pass + the group-moment pass
    assert p.count("Location: InMemoryFileIndex") == 2, p


# --- agg_welch_anova ----------------------------------------------------------


def test_welch_anova_python_recompute(spark):
    mom = _group_moments(SF_SMOKE)
    k = len(mom)
    nt = sum(n for n, _, _ in mom.values())
    m = {g: sx / n for g, (n, sx, _) in mom.items()}
    w = {
        g: n / ((qx - sx * sx / n) / (n - 1))
        for g, (n, sx, qx) in mom.items()
    }
    bigw = sum(w.values())
    xw = sum(w[g] * m[g] for g in mom) / bigw
    a_num = sum(w[g] * (m[g] - xw) ** 2 for g in mom)
    h = sum((1 - w[g] / bigw) ** 2 / (mom[g][0] - 1) for g in mom)
    f = (a_num / (k - 1)) / (1 + 2.0 * (k - 2) / (k * k - 1) * h)
    df2 = (k * k - 1.0) / (3 * h)
    got = agg_welch_anova(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == nt
    assert int(got.n_groups) == k
    assert abs(float(got.welch_f) - f) < 1e-5
    assert abs(float(got.df2) - df2) / df2 < 1e-6
    assert bool(got.significant) == (
        float(got.welch_f) > _WELCH_ANOVA_F_CRIT
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_welch_anova_fixture_assumptions(sf_dir):
    """Positive within-group variance (w's denominator) and df2 large
    enough that the pinned F(4, ∞) critical value is honest (df2 ≥
    200 ⇒ F crit within ~2% of the asymptote)."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    for _, sub in o.groupby("o_orderpriority"):
        assert sub.o_totalprice.var(ddof=1) > 0
        assert len(sub) >= 30


def test_welch_anova_df2_large(spark):
    got = agg_welch_anova(spark, SF_SMOKE).toPandas().iloc[0]
    assert float(got.df2) >= 200


def test_welch_anova_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_welch_anova(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "SortMergeJoin" not in p, p


# --- agg_mood_median_test -----------------------------------------------------


def _mood_recompute(sf_dir: str):
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype(int)
    med = int(np.sort(cents.to_numpy())[math.ceil(len(o) / 2) - 1])
    nt = float(len(o))
    df = pd.DataFrame({"g": o.o_orderpriority, "above": cents > med})
    grp = df.groupby("g").agg(n=("above", "size"), a=("above", "sum"))
    atot = int(grp.a.sum())
    chi2 = 0.0
    for _, row in grp.iterrows():
        e1 = row.n * (atot / nt)
        d = row.a - e1
        chi2 += d * d / e1 + d * d / (row.n - e1)
    return med, nt, atot, grp, chi2


def test_mood_python_recompute(spark):
    med, nt, atot, grp, chi2 = _mood_recompute(SF_SMOKE)
    got = agg_mood_median_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == int(nt)
    assert int(got.n_groups) == len(grp)
    assert float(got.grand_median) == med / 100.0
    assert int(got.n_above) == atot
    assert abs(float(got.chi2) - chi2) < 2e-6
    assert bool(got.significant) == (float(got.chi2) > _MOOD_CHI2_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_mood_fixture_assumptions(sf_dir):
    """Non-degenerate contingency at both scales: the above-share sits
    inside (0.3, 0.7) — the LOWER median guarantees ≤ 0.5 exactly —
    and every expected cell clears the χ² rule-of-thumb floor of 5."""
    med, nt, atot, grp, _ = _mood_recompute(sf_dir)
    assert 0.3 < atot / nt < 0.7
    for _, row in grp.iterrows():
        e1 = row.n * (atot / nt)
        assert e1 >= 5 and (row.n - e1) >= 5


def test_mood_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_mood_median_test(spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "SortMergeJoin" not in p, p
    # the ladder is the only window, and it runs on the distinct-value
    # frame under meta_part — never on corpus rows
    assert p.count("Window") <= 2, p


# --- agg_partial_correlation ----------------------------------------------------


def test_pcorr_python_recompute(spark):
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    x = li.l_extendedprice.astype(float)
    y = li.l_quantity.astype(float)
    z = li.l_discount.astype(float)
    n = len(li)

    def s(v):
        return float(sum(_q6(t) for t in v))

    sx, sy, sz = s(x), s(y), s(z)
    sxx, syy, szz = s(x * x), s(y * y), s(z * z)
    sxy, sxz, syz = s(x * y), s(x * z), s(y * z)

    def corr(spq, sp, sq, spp, sqq):
        return (n * spq - sp * sq) / math.sqrt(
            (n * spp - sp * sp) * (n * sqq - sq * sq)
        )

    rxy = corr(sxy, sx, sy, sxx, syy)
    rxz = corr(sxz, sx, sz, sxx, szz)
    ryz = corr(syz, sy, sz, syy, szz)
    rp = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    fz = math.log((1 + rp) / (1 - rp)) / 2
    got = agg_partial_correlation(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_rows) == n
    assert abs(float(got.r_xy) - rxy) < 2e-6
    assert abs(float(got.r_xz) - rxz) < 2e-6
    assert abs(float(got.r_yz) - ryz) < 2e-6
    assert abs(float(got.r_xy_given_z) - rp) < 2e-6
    assert abs(float(got.fisher_z) - fz) < 2e-6
    assert abs(
        float(got.z_stat) - fz * math.sqrt(n - 4)
    ) < 1e-3  # √n amplifies the 1e-6 quantization
    assert bool(got.significant) == (
        abs(float(got.z_stat)) > _PCORR_Z_CRIT
    )


def test_pcorr_matches_pandas_marginals(spark):
    """The marginal r columns agree with pandas' own corr() — a fully
    independent (unquantized) path."""
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")
    got = agg_partial_correlation(spark, SF_SMOKE).toPandas().iloc[0]
    assert (
        abs(
            float(got.r_xy)
            - li.l_extendedprice.corr(li.l_quantity)
        )
        < 1e-4
    )
    assert (
        abs(float(got.r_xz) - li.l_extendedprice.corr(li.l_discount))
        < 1e-4
    )
    assert (
        abs(float(got.r_yz) - li.l_quantity.corr(li.l_discount))
        < 1e-4
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_pcorr_fixture_assumptions(sf_dir):
    """The partial's denominator stays sane: |r_xz|, |r_yz| < 0.9 at
    both scales, and n clears the Fisher-z small-sample floor."""
    li = pd.read_parquet(sf_dir + "/lineitem.parquet")
    assert len(li) > 100
    assert abs(li.l_extendedprice.corr(li.l_discount)) < 0.9
    assert abs(li.l_quantity.corr(li.l_discount)) < 0.9


def test_pcorr_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(agg_partial_correlation(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p
