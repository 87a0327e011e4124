"""r16-staged keys, batch 2 — parked UNregistered (r16 lot now 8):

  events_cmh_test               — stratified 2×2 association (CMH χ² +
                                  MH common OR), the confounding-aware
                                  partner of events_odds_ratio_2x2
  events_cochran_armitage_trend — ordered dose-response z over click
                                  bands (exact-integer sufficient stats)
  events_burstiness_goh         — (σ−μ)/(σ+μ) inter-event burstiness
                                  per type over per-user streams
  sample_horvitz_thompson       — HT total + variance + CI coverage
                                  under deterministic PPS Poisson
                                  sampling

Same contract set as the other staging files.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.timeseries import (
    _BURSTINESS_ORACLE,
    _CA_ORACLE,
    _CA_Z_CRIT,
    _CMH_BAND_HI,
    _CMH_BAND_LO,
    _CMH_CHI2_CRIT,
    _CMH_ORACLE,
    _HT_ORACLE,
    events_burstiness_goh,
    events_cmh_test,
    events_cochran_armitage_trend,
    sample_horvitz_thompson,
)

STAGED = {
    "events_cmh_test": (events_cmh_test, _CMH_ORACLE),
    "events_cochran_armitage_trend": (
        events_cochran_armitage_trend,
        _CA_ORACLE,
    ),
    "events_burstiness_goh": (events_burstiness_goh, _BURSTINESS_ORACLE),
    "sample_horvitz_thompson": (sample_horvitz_thompson, _HT_ORACLE),
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


# --- events_cmh_test ---------------------------------------------------------


def _user_frame(sf_dir: str) -> pd.DataFrame:
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    return ev.groupby("user_id").agg(
        n_ev=("event_type", "size"),
        clicks=("event_type", lambda s: int((s == "click").sum())),
        purch=("event_type", lambda s: int((s == "purchase").sum())),
    )


def _cmh_recompute(sf_dir: str):
    u = _user_frame(sf_dir)
    u["e"] = u.clicks >= 14
    u["o"] = u.purch >= 14
    u["stratum"] = u.n_ev.map(
        lambda n: 0 if n <= _CMH_BAND_LO else (1 if n <= _CMH_BAND_HI else 2)
    )
    num = var = s_ad = s_bc = 0.0
    strata = []
    for _, sub in u.groupby("stratum"):
        a = int((sub.e & sub.o).sum())
        b = int((sub.e & ~sub.o).sum())
        c = int((~sub.e & sub.o).sum())
        d = int((~sub.e & ~sub.o).sum())
        n = len(sub)
        strata.append((a, b, c, d, n))
        num += a - (a + b) * (a + c) / n
        var += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        s_ad += a * d / n
        s_bc += b * c / n
    chi2 = num * num / var
    or_mh = 0.0 if s_bc == 0 else s_ad / s_bc
    return strata, chi2, or_mh


def test_cmh_python_recompute(spark):
    strata, chi2, or_mh = _cmh_recompute(SF_SMOKE)
    got = events_cmh_test(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_strata) == len(strata)
    assert int(got.n_users) == sum(s[4] for s in strata)
    assert abs(float(got.cmh_chi2) - chi2) < 2e-6
    assert abs(float(got.or_mh) - or_mh) < 2e-6
    assert bool(got.significant) == (float(got.cmh_chi2) > _CMH_CHI2_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_cmh_fixture_assumptions(sf_dir):
    """Three strata at both scales, each with ≥ 5 users and a positive
    pooled variance (the χ² denominator)."""
    strata, _, _ = _cmh_recompute(sf_dir)
    assert len(strata) == 3
    assert all(s[4] >= 5 for s in strata)
    var = sum(
        (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        for a, b, c, d, n in strata
    )
    assert var > 0


def test_cmh_adjustment_direction(spark):
    """The marginal OR (events_odds_ratio_2x2's own cells) exceeds the
    activity-adjusted MH OR on the fixture — activity inflates the
    marginal association; CMH is the key that shows it."""
    u = _user_frame(SF_FULL)
    e, o = u.clicks >= 14, u.purch >= 14
    a = int((e & o).sum())
    b = int((e & ~o).sum())
    c = int((~e & o).sum())
    d = int((~e & ~o).sum())
    marginal = a * d / (b * c)
    got = events_cmh_test(spark, SF_FULL).toPandas().iloc[0]
    assert float(got.or_mh) < marginal


def test_cmh_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_cmh_test(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p


# --- events_cochran_armitage_trend ---------------------------------------------


def _ca_recompute(sf_dir: str):
    u = _user_frame(sf_dir)
    s = u.clicks.map(lambda c: min(3, c // 5))
    o = (u.purch >= 14).astype(int)
    n, r = len(u), int(o.sum())
    ss, ss2, sos = int(s.sum()), int((s * s).sum()), int((o * s).sum())
    t = sos - r * ss / n
    var = r / n * (1 - r / n) * (ss2 - ss * ss / n)
    return n, r, s.nunique(), t / math.sqrt(var)


def test_ca_python_recompute(spark):
    n, r, bands, z = _ca_recompute(SF_SMOKE)
    got = events_cochran_armitage_trend(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_users) == n
    assert int(got.n_success) == r
    assert int(got.n_bands) == bands
    assert abs(float(got.z_trend) - z) < 2e-6
    assert bool(got.significant) == (abs(float(got.z_trend)) > _CA_Z_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_ca_fixture_assumptions(sf_dir):
    """≥ 2 score bands with members and a strictly positive variance
    term at both scales (z's denominator)."""
    u = _user_frame(sf_dir)
    s = u.clicks.map(lambda c: min(3, c // 5))
    n, ss, ss2 = len(u), int(s.sum()), int((s * s).sum())
    assert s.nunique() >= 2
    assert ss2 - ss * ss / n > 0
    r = int((u.purch >= 14).sum())
    assert 0 < r < n


def test_ca_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_cochran_armitage_trend(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "windowspecdefinition" not in p, p
    assert "EvalPython" not in p, p


# --- events_burstiness_goh -----------------------------------------------------


def _burstiness_recompute(sf_dir: str) -> dict:
    ev = pd.read_parquet(sf_dir + "/events.parquet")
    # pandas reads the fixture as datetime64[us] — int64 IS microseconds
    ev = ev.assign(us=ev.ts.astype("int64"))
    out = {}
    gaps = {}
    for (uid, et), sub in ev.groupby(["user_id", "event_type"]):
        s = sub.sort_values(["us", "event_id"]).us.tolist()
        gaps.setdefault(et, []).extend(
            b - a for a, b in zip(s, s[1:])
        )
    for et, g in gaps.items():
        n = len(g)
        sg, sgg = float(sum(g)), float(sum(x * x for x in g))
        sd = math.sqrt((sgg - sg * sg / n) / (n - 1))
        mu = sg / n
        out[et] = (n, mu / 1e6, sd / mu, (sd - mu) / (sd + mu))
    return out


def test_burstiness_python_recompute(spark):
    exp = _burstiness_recompute(SF_SMOKE)
    got = events_burstiness_goh(spark, SF_SMOKE).toPandas()
    assert set(got.event_type) == set(exp)
    for _, row in got.iterrows():
        n, mean_s, cv, b = exp[row.event_type]
        assert int(row.n_gaps) == n
        assert abs(float(row.mean_gap_s) - mean_s) < 2e-6
        assert abs(float(row.cv) - cv) < 2e-6
        assert abs(float(row.burstiness) - b) < 2e-6


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_burstiness_fixture_assumptions_and_bounds(sf_dir):
    """All five types present with ≥ 30 gaps; B strictly inside
    (−1, 1) — a theorem for positive μ, σ."""
    exp = _burstiness_recompute(sf_dir)
    assert len(exp) == 5
    for n, mean_s, cv, b in exp.values():
        assert n >= 30
        assert mean_s > 0 and cv > 0
        assert -1 < b < 1


def test_burstiness_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_burstiness_goh(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "EvalPython" not in p, p
    # the lag window rides the (user, type) grain — no meta_part, no
    # single-partition global sort
    assert "windowspecdefinition(user_id" in p, p


# --- sample_horvitz_thompson ----------------------------------------------------


def _q6(x) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )


def _ht_recompute(sf_dir: str):
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    y = {
        ck: float(sum(_q6(v) for v in sub.o_totalprice))
        for ck, sub in o.groupby("o_custkey")
    }
    n_pop = len(y)
    tt = float(sum(_q6(v) for v in y.values()))
    ht = vht = Decimal(0)
    n_samp = 0
    for ck, yi in y.items():
        pi = min(1.0, yi * n_pop / (10 * tt))
        u = (
            int(
                hashlib.md5(f"{ck}|ht".encode()).hexdigest()[:8], 16
            )
            / 4294967296
        )
        if u < pi:
            n_samp += 1
            ht += _q6(yi / pi)
            vht += _q6((1 - pi) * ((yi / pi) * (yi / pi)))
    return n_pop, n_samp, tt, float(ht), math.sqrt(float(vht))


def test_ht_python_recompute(spark):
    n_pop, n_samp, tt, ht, se = _ht_recompute(SF_SMOKE)
    got = sample_horvitz_thompson(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_pop) == n_pop
    assert int(got.n_sampled) == n_samp
    assert float(got.true_total) == tt
    assert abs(float(got.ht_total) - ht) < 2e-6
    assert abs(float(got.ht_se) - se) < 2e-4  # sqrt halves the quantum
    assert abs(float(got.rel_err) - abs(ht - tt) / tt) < 2e-6
    assert bool(got.ci_covers) == (
        abs(float(got.ht_total) - tt) <= 1.96 * float(got.ht_se)
    )


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_ht_fixture_assumptions(sf_dir):
    """The design is non-degenerate at both scales: the sample lands
    between 2% and 40% of the population and the HT estimate stays
    within 50% of the truth (Poisson-design noise, not bias)."""
    n_pop, n_samp, tt, ht, _ = _ht_recompute(sf_dir)
    assert 0.02 * n_pop <= n_samp <= 0.40 * n_pop
    assert abs(ht - tt) / tt < 0.5


def test_ht_unbiasedness_structure(spark):
    """π ∝ y uncapped makes y/π constant, so HT = n_samp · 10T/N for
    uncapped draws — verify the estimator's PPS structure on the
    uncapped subset (capped customers contribute y exactly)."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    y = {
        ck: float(sum(_q6(v) for v in sub.o_totalprice))
        for ck, sub in o.groupby("o_custkey")
    }
    n_pop = len(y)
    tt = float(sum(_q6(v) for v in y.values()))
    got = sample_horvitz_thompson(spark, SF_SMOKE).toPandas().iloc[0]
    capped_exists = any(
        yi * n_pop / (10 * tt) >= 1.0 for yi in y.values()
    )
    if not capped_exists:
        base = 10 * tt / n_pop
        ratio = float(got.ht_total) / base
        assert abs(ratio - round(ratio)) < 1e-6
        assert int(round(ratio)) == int(got.n_sampled)


def test_ht_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(sample_horvitz_thompson(spark, SF_SMOKE))
    assert "SortMergeJoin" not in p, p
    assert "EvalPython" not in p, p
    assert "windowspecdefinition" not in p, p
