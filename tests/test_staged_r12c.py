"""r12-staged keys, batch 3 — built and verified this round ahead of the
r12 registration (the post-428 cadence; SURVEY round-11 log). Four more
keys, parked UNregistered for the r12 flip:

  graph_adamic_adar        — 1/ln(deg) weighted link prediction
  dedup_sorted_neighborhood — SNM blocking (sort + sliding window)
  fn_ipv4_cidr             — IPv4 octet math + longest-prefix-match
  ts_spectral_entropy      — per-segment forecastability from DFT power

Same contract set as tests/test_staged_r12.py: driver-style oracle parity
at the smoke AND grading scales, an independent recompute (pure python /
pandas — no Spark expressions, no DuckDB), a plan-shape pin, layout
invariance, and a registration-consistency guard that holds before AND
after the flip.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.functions_scalar import (
    _CIDR_BLOCKS,
    _IPV4_CIDR_ORACLE,
    _IPV4_SALT,
    fn_ipv4_cidr,
)
from trireme_spark.queries.joins import _ADAMIC_ADAR_ORACLE, graph_adamic_adar
from trireme_spark.queries.llm_sim import (
    _SNM_ORACLE,
    _SNM_RADIUS,
    dedup_sorted_neighborhood,
)
from trireme_spark.queries.timeseries import (
    _SPECTRAL_ENTROPY_ORACLE,
    ts_spectral_entropy,
)

STAGED = {
    "graph_adamic_adar": (graph_adamic_adar, _ADAMIC_ADAR_ORACLE),
    "dedup_sorted_neighborhood": (
        dedup_sorted_neighborhood,
        _SNM_ORACLE,
    ),
    "fn_ipv4_cidr": (fn_ipv4_cidr, _IPV4_CIDR_ORACLE),
    "ts_spectral_entropy": (ts_spectral_entropy, _SPECTRAL_ENTROPY_ORACLE),
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
    constant and it must own a sweep slot."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        assert registry.ORACLES.get(key) == oracle
        assert key in _SWEEP_PRIORITY
    else:
        assert key not in registry.ORACLES
        assert key not in _SWEEP_PRIORITY


# --- graph_adamic_adar --------------------------------------------------------


def test_adamic_adar_python_recompute(spark):
    """Brute-force AA from first principles: build the >=2-order
    copurchase edge set in python, enumerate common neighbors per
    non-adjacent pair, sum floor(1e6/ln(deg)) exactly."""
    li = pd.read_parquet(SF_SMOKE + "/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    from collections import defaultdict

    orders = defaultdict(set)
    for r in li.itertuples(index=False):
        orders[int(r.l_orderkey)].add(int(r.l_partkey))
    pair_count = defaultdict(int)
    for parts in orders.values():
        ps = sorted(parts)
        for i, x in enumerate(ps):
            for y in ps[i + 1 :]:
                pair_count[(x, y)] += 1
    edges = {p for p, c in pair_count.items() if c >= 2}
    nbrs = defaultdict(set)
    for x, y in edges:
        nbrs[x].add(y)
        nbrs[y].add(x)
    scores = {}
    nodes = sorted(nbrs)
    for i, x in enumerate(nodes):
        for z in nodes[i + 1 :]:
            if (x, z) in edges:
                continue
            common = nbrs[x] & nbrs[z]
            if not common:
                continue
            aa = sum(
                math.floor(1e6 / math.log(len(nbrs[m]))) for m in common
            )
            scores[(x, z)] = (len(common), aa)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    got = graph_adamic_adar(spark, SF_SMOKE).toPandas()
    assert len(got) == len(top)
    for r, ((x, z), (common, aa)) in zip(got.itertuples(index=False), top):
        assert (int(r.part_a), int(r.part_b)) == (x, z)
        assert int(r.common_neighbors) == common
        assert float(r.adamic_adar) == aa / 1e6


def test_adamic_adar_plan_shape(spark):
    """Wedge-join family shape: keyed joins only, existing edges leave
    via LeftAnti, top-20 folds into TakeOrderedAndProject — and no
    cartesian anywhere."""
    from tests.test_plans import plan

    p = plan(graph_adamic_adar(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p, p
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p


# --- dedup_sorted_neighborhood -------------------------------------------------


def test_snm_python_recompute(spark):
    """Replay SNM in python: per lang, sort by (24-char key, doc_id),
    pair each record with the next 2, verify with a textbook
    Wagner-Fischer edit distance over the 80-char probes."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    d = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    ref = {}
    for lang, sub in d.groupby("lang"):
        recs = sorted(
            (str(t)[:24], int(i), str(t)[:80])
            for i, t in zip(sub.doc_id, sub.text)
        )
        for i, (_, doc_a, probe_a) in enumerate(recs):
            for _, doc_b, probe_b in recs[i + 1 : i + 3]:
                ref[(lang, doc_a, doc_b)] = lev(probe_a, probe_b)
    got = dedup_sorted_neighborhood(spark, SF_SMOKE).toPandas()
    assert len(got) == len(ref)
    for r in got.itertuples(index=False):
        d_ref = ref[(r.lang, int(r.doc_a), int(r.doc_b))]
        assert int(r.lev) == d_ref, (r.lang, r.doc_a, r.doc_b)
        assert bool(r.is_dup) == (d_ref <= _SNM_RADIUS)


def test_snm_plan_shape(spark):
    """The Spark side NEVER self-joins: one window pass per language
    partition, lead() fan-out, explode — no join operator at all."""
    from tests.test_plans import plan

    p = plan(dedup_sorted_neighborhood(spark, SF_SMOKE))
    assert "Join" not in p, p
    assert "windowspecdefinition" in p, p
    assert "Generate" in p, p


# --- fn_ipv4_cidr --------------------------------------------------------------


def test_ipv4_cidr_python_recompute(spark):
    """Plant the same addresses in python (ipaddress-module semantics
    for containment), LPM per address, re-derive the rollup."""
    import ipaddress

    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    users = sorted(set(int(u) for u in ev.user_id))
    nets = [
        (c, ipaddress.ip_network(c)) for c, _, _ in _CIDR_BLOCKS
    ]
    roll = {}
    for u in users:
        ipn = (u + _IPV4_SALT) % 2147483648 * 2654435761 % 4294967296
        addr = ipaddress.ip_address(ipn)
        matches = [(n.prefixlen, c) for c, n in nets if addr in n]
        assert matches, u  # /0 always matches
        plen, cidr = max(matches)
        lo, hi, n, _, _ = roll.get(
            cidr, (None, None, 0, None, None)
        )
        if lo is None or ipn < lo[0]:
            lo = (ipn, str(addr))
        if hi is None or ipn > hi[0]:
            hi = (ipn, str(addr))
        roll[cidr] = (lo, hi, n + 1, plen, str(addr))
    got = fn_ipv4_cidr(spark, SF_SMOKE).toPandas()
    assert len(got) == len(roll)
    for r in got.itertuples(index=False):
        lo, hi, n, plen, _ = roll[r.cidr]
        assert int(r.plen) == plen and int(r.n_users) == n, r.cidr
        assert r.lowest_ip == lo[1] and r.highest_ip == hi[1], r.cidr


def test_ipv4_cidr_plan_shape(spark):
    """The rule table is bounded model state: a broadcast nested-loop
    join against 10 literal rows — the corpus never shuffles for the
    membership test."""
    from tests.test_plans import plan

    p = plan(fn_ipv4_cidr(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p


# --- ts_spectral_entropy --------------------------------------------------------


def test_spectral_entropy_python_recompute(spark):
    """First-principles per-segment recompute with the SAME
    quantization ladder (the contract is exactness, so the ladder is
    part of the definition): mean-removed DFT at 16 harmonics, power
    in integer cents, entropy from exact nano-unit terms."""
    o = pd.read_parquet(SF_SMOKE + "/orders.parquet")
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["day"] = df.o_orderdate.dt.date
    got = ts_spectral_entropy(spark, SF_SMOKE).toPandas()
    assert set(got.segment) == set(df.c_mktsegment.unique())
    for seg, sub in df.groupby("c_mktsegment"):
        daily = {}
        for r in sub.itertuples(index=False):
            cur = daily.get(r.day, Decimal(0))
            daily[r.day] = cur + Decimal(repr(r.o_totalprice)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        days = sorted(daily)
        rev = [float(daily[d]) for d in days]
        n = len(rev)
        mu = float(
            sum(
                Decimal(repr(v)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
                for v in rev
            )
        ) / n
        cents = []
        for k in range(1, 17):
            sc = ss = 0
            for t, v in enumerate(rev):
                ang = 2 * math.pi * k * t / n
                qc = math.floor(math.cos(ang) * 1e8) / 1e8
                qs = math.floor(math.sin(ang) * 1e8) / 1e8
                sc += math.floor((v - mu) * qc * 1e6)
                ss += math.floor((v - mu) * qs * 1e6)
            sc, ss = sc / 1e6, ss / 1e6
            cents.append(math.floor((sc * sc + ss * ss) / n * 100))
        s_cents = sum(cents)
        h_nano = sum(
            0
            if pc == 0
            else math.floor(
                -(pc / s_cents) * math.log(pc / s_cents) * 1e9
            )
            for pc in cents
        )
        H = math.floor(h_nano / 1e9 / math.log(16.0) * 1e6) / 1e6
        dom = max(range(16), key=lambda i: (cents[i], -i)) + 1
        row = got[got.segment == seg].iloc[0]
        assert int(row.n_days) == n, seg
        assert abs(float(row.spectral_entropy) - H) < 2e-6, seg
        assert int(row.dominant_harmonic) == dom, seg


def test_spectral_entropy_plan_shape(spark):
    """Customer dim broadcasts into the fact rollup; the frequency
    spine broadcasts onto the day-grain series; per-segment windows
    keep their partition spec (no SinglePartition exchange)."""
    from tests.test_plans import plan

    p = plan(ts_spectral_entropy(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in p, p
    assert "SinglePartition" not in p, p
    assert "windowspecdefinition" in p, p


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
