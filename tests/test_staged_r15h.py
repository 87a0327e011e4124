"""r15-staged keys, batch 8 — parked UNregistered (r15 lot now 20, the
FULL cadence cap):

  agg_wilcoxon_signed_rank — the PAIRED rank test (within-customer
                             H1-vs-H2 spend) the inference family
                             lacked beside the unpaired MWU
  events_slo_burn_rate     — multi-window SLO burn-rate alerting
                             policy (fast page / slow ticket pairs)

Same contract set as the other staging files.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.aggregates import (
    _WSR_CRIT,
    _WSR_ORACLE,
    _WSR_YEAR,
    agg_wilcoxon_signed_rank,
)
from trireme_spark.queries.timeseries import (
    _BURN_BUDGET,
    _BURN_ORACLE,
    _BURN_PAGE,
    _BURN_TICKET,
    events_slo_burn_rate,
)

STAGED = {
    "agg_wilcoxon_signed_rank": (
        agg_wilcoxon_signed_rank,
        _WSR_ORACLE,
    ),
    "events_slo_burn_rate": (events_slo_burn_rate, _BURN_ORACLE),
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


# --- agg_wilcoxon_signed_rank -----------------------------------------------------


def test_wsr_python_recompute(spark):
    """Full midrank assignment in pandas (NOT the value ladder) on the
    decimal-exact pair sums."""
    from decimal import ROUND_HALF_UP, Decimal

    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    oy = o[o.o_orderdate.dt.year == _WSR_YEAR].copy()
    oy["h"] = (oy.o_orderdate.dt.month > 6).astype(int)
    oy["v"] = oy.o_totalprice.map(
        lambda x: Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    g = oy.groupby(["o_custkey", "h"])["v"].sum().unstack().dropna()
    cents = ((g[1] - g[0]).map(float) * 100).round().astype(int)
    cents = cents[cents != 0]
    df = pd.DataFrame({"a": cents.abs(), "pos": cents > 0})
    df["rank"] = df.a.rank(method="average")
    n = len(df)
    w_plus = float(df.loc[df.pos, "rank"].sum())
    tie_term = sum(
        t**3 - t for t in df.a.value_counts().tolist()
    )
    var = n * (n + 1) * (2 * n + 1) / 24 - tie_term / 48
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(var)
    got = agg_wilcoxon_signed_rank(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_pairs) == n
    assert abs(float(got.w_plus) - w_plus) < 2e-6
    assert abs(float(got.z_stat) - z) < 1e-5
    assert bool(got.significant) == (abs(float(got.z_stat)) > _WSR_CRIT)


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_FULL])
def test_wsr_fixture_assumptions(sf_dir):
    """≥ 10 nonzero pairs (the normal approximation's usual floor) so
    z is meaningful at both scales."""
    o = pd.read_parquet(sf_dir + "/orders.parquet")
    oy = o[o.o_orderdate.dt.year == _WSR_YEAR].copy()
    oy["h"] = (oy.o_orderdate.dt.month > 6).astype(int)
    g = (
        oy.groupby(["o_custkey", "h"])["o_totalprice"]
        .sum()
        .unstack()
        .dropna()
    )
    assert int(((g[1] - g[0]).abs() > 1e-9).sum()) >= 10


def test_wsr_plan_shape(spark):
    """The MWU shape: filtered rollup, value ladder, prefix window,
    fold — ranks never materialize per row."""
    from tests.test_plans import plan

    p = plan(agg_wilcoxon_signed_rank(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]


# --- events_slo_burn_rate ---------------------------------------------------------


def test_burn_python_recompute(spark):
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.floor("D")
    d = (
        ev.groupby("day")
        .agg(
            n=("event_type", "size"),
            x=("event_type", lambda s: int((s == "error").sum())),
        )
        .sort_index()
    )
    got = (
        events_slo_burn_rate(spark, SF_SMOKE)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ns, xs = d.n.tolist(), d.x.tolist()
    for i in range(len(d)):
        burns = {}
        for w in (1, 3, 7):
            lo = max(0, i - w + 1)
            burns[w] = (
                int(
                    sum(xs[lo : i + 1])
                    / sum(ns[lo : i + 1])
                    / _BURN_BUDGET
                    * 1e6
                )
                / 1e6
            )
        g = got.iloc[i]
        assert abs(float(g.burn_1d) - burns[1]) < 2e-6
        assert abs(float(g.burn_3d) - burns[3]) < 2e-6
        assert abs(float(g.burn_7d) - burns[7]) < 2e-6
        if burns[1] > _BURN_PAGE and burns[3] > _BURN_PAGE:
            sev = "page"
        elif burns[3] > _BURN_TICKET and burns[7] > _BURN_TICKET:
            sev = "ticket"
        else:
            sev = "ok"
        assert g.severity == sev, (g.day, burns, g.severity)


def test_burn_severity_is_exercised(spark):
    """The pinned operating point is non-degenerate on the fixture:
    at least two severity classes appear at the smoke scale (the
    ~0.20 error share oscillates around the 0.21 budget)."""
    got = events_slo_burn_rate(spark, SF_SMOKE).toPandas()
    assert got.severity.nunique() >= 2


def test_burn_plan_shape(spark):
    from tests.test_plans import plan

    p = plan(events_slo_burn_rate(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    scan_at = p.index("Scan parquet")
    first_agg = p.index("HashAggregate")
    assert "Window" not in p[scan_at:first_agg], p[scan_at:first_agg]
