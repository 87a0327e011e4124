"""Property-based spot checks (SURVEY.md §5.5) — hypothesis generates the
inputs, Spark evaluates the engine expression, plain Python computes the
reference. Low example counts keep Spark round-trips affordable; the
deadline is disabled because a Spark job is never sub-200ms.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


pytestmark = pytest.mark.slow  # opt-in battery (r15): run with -m "" or -m slow

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.sampled_from("ab c"),  # tiny alphabet → dense collisions
    min_size=0,
    max_size=24,
)


@given(text=texts)
@SETTINGS
def test_char_ngrams_matches_python(spark, text):
    from trireme_spark.functions.text import char_ngrams

    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(char_ngrams(F.col("t"), 3).alias("g")).first()["g"]
    low = text.lower()
    want = list(dict.fromkeys(low[i : i + 3] for i in range(len(low) - 2)))
    assert got == want


@given(
    a=st.lists(st.sampled_from("pqrs"), max_size=8),
    b=st.lists(st.sampled_from("pqrs"), max_size=8),
)
@SETTINGS
def test_jaccard_matches_python_sets(spark, a, b):
    from trireme_spark.operators.similarity import jaccard

    df = spark.createDataFrame(
        [(list(set(a)), list(set(b)))], "a array<string>, b array<string>"
    )
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first()["j"]
    sa, sb = set(a), set(b)
    if not sa | sb:
        assert got is None  # 0/0 — NULL in SQL, same on both engines
    else:
        assert got is not None
        assert math.isclose(got, len(sa & sb) / len(sa | sb))


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_dsum_is_order_independent_and_exact(spark, vals):
    """parity.dsum must equal the decimal-exact sum regardless of
    partitioning/accumulation order — the invariant the oracle hashing
    relies on."""
    from decimal import ROUND_HALF_UP, Decimal

    from trireme_spark.parity import dsum

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.select(dsum("v").alias("s")).first()["s"]
    # dsum quantizes at DECIMAL(27,6) with HALF_UP (Spark's cast rounding)
    want = float(
        sum(
            Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            for v in vals
        )
    )
    assert math.isclose(got, want, rel_tol=0, abs_tol=0.0)


@given(seed=st.integers(min_value=0, max_value=3))
@SETTINGS
def test_minhash_contains_includes_identical_docs(spark, seed):
    """Two identical shingle sets must collide in EVERY band — MinHash
    soundness on exact duplicates."""
    from trireme_spark.operators.similarity import (
        candidate_pairs_lsh,
        minhash_signatures,
    )

    words = ["w%d" % ((seed + i) % 7) for i in range(6)]
    sh = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    df = spark.createDataFrame(
        [(1, sh), (2, sh)], "doc_id long, sset array<string>"
    )
    sigs = minhash_signatures(df, "doc_id", "sset")
    pairs = candidate_pairs_lsh(sigs, "doc_id", "sig").collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


@given(
    width=st.sampled_from([1.0, 500.0, 12345.6, 100000.0, 1e9]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_global_range_frame_sum_matches_window(spark, width):
    """Property: the distributed two-pass range-frame operator equals the
    plain (one-reducer) global window for arbitrary frame widths —
    including a width spanning the whole domain (every row sums the full
    prefix) and a tiny width (mostly self-sums)."""
    from tests.conftest import SF_SMOKE
    from trireme_spark.operators.winframes import global_range_frame_sum
    from trireme_spark.parity import DSCALE
    from trireme_spark.sources.io import table

    o = table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    ).limit(400)
    dist = global_range_frame_sum(
        o, "o_orderkey", "o_totalprice", width, out_col="s"
    )
    # the PySpark rangeBetween API only takes integer bounds; the SQL
    # form accepts a double literal width
    ref = o.selectExpr(
        "o_orderkey",
        f"CAST(SUM(CAST(o_totalprice AS {DSCALE})) OVER ("
        f"  ORDER BY o_totalprice"
        f"  RANGE BETWEEN {width!r} PRECEDING AND CURRENT ROW"
        f") AS DOUBLE) AS s",
    )
    got = {r["o_orderkey"]: r["s"] for r in dist.collect()}
    want = {r["o_orderkey"]: r["s"] for r in ref.collect()}
    assert got == want


# --- round-3 invariants ------------------------------------------------------

def test_shuffle_deterministic_is_permutation(spark):
    """Positions are exactly 1..N (a permutation — no gaps, no dups) and a
    rerun is bit-identical (the reproducibility contract)."""
    from trireme_spark import registry

    df = registry.QUERIES["shuffle_deterministic"](spark, SF_SMOKE)
    rows = df.collect()
    n = len(rows)
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(1, n + 1))
    rows2 = registry.QUERIES["shuffle_deterministic"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_scd2_effectivity_chain(spark):
    """SCD2 invariants: per-key versions are 1..k, intervals chain exactly
    (valid_to == next valid_from), and precisely one row is current."""
    from collections import defaultdict

    from trireme_spark import registry

    rows = registry.QUERIES["etl_scd2_dimension"](spark, SF_SMOKE).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r["is_current"] for r in rs) == 1
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to"] == b["valid_from"], user
        assert rs[-1]["valid_to"] is None


def test_decontaminate_flags_are_consistent(spark):
    """Ratio ∈ [0,1], n_overlap ≤ n_grams, flag ⇔ overlap, and no
    benchmark doc leaks into the output."""
    from trireme_spark import registry

    rows = registry.QUERIES["text_decontaminate"](spark, SF_SMOKE).collect()
    assert rows, "empty decontamination output"
    for r in rows:
        assert r["doc_id"] % 50 != 0
        assert 0 <= r["n_overlap"] <= max(r["n_grams"], 1)
        assert 0.0 <= r["contamination_ratio"] <= 1.0
        assert r["is_contaminated"] == (r["n_overlap"] >= 1)


def test_minhash_cluster_partition(spark):
    """Cluster output is a partition of the corpus: every doc exactly once,
    cluster id = min member, one canonical per cluster, sizes consistent."""
    from collections import defaultdict

    from trireme_spark import registry
    from trireme_spark.sources.io import table

    rows = registry.QUERIES["dedup_minhash_clusters"](spark, SF_SMOKE).collect()
    n_docs = table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    clusters = defaultdict(list)
    for r in rows:
        clusters[r["cluster_id"]].append(r)
    for cid, members in clusters.items():
        assert cid == min(m["doc_id"] for m in members)
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)


def test_compact_small_files_contract(spark):
    """etl_compact_small_files: the rewrite actually reduces file count and
    loses no rows (the content identity is driver-oracled; the file-count
    contract lives here)."""
    import os
    import tempfile

    from tests.conftest import SF_SMOKE
    from trireme_spark import registry
    from trireme_spark.queries.scans import _tmp

    out_df = registry.QUERIES["etl_compact_small_files"](spark, SF_SMOKE)
    frag, out = _tmp("compact_in", SF_SMOKE), _tmp("compact_out", SF_SMOKE)
    n_frag = sum(f.endswith(".parquet") for f in os.listdir(frag))
    n_out = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_frag == 64, n_frag
    assert n_out <= 4, f"compaction produced {n_out} files"
    assert out_df.count() == spark.read.parquet(frag).count()


def test_backfill_touches_only_target_partition(spark):
    """etl_backfill_partition_overwrite: dynamic overwrite must rewrite
    ONLY the corrected day's files — every other partition's files predate
    the backfill write (the content math is driver-oracled; the
    no-churn physical contract lives here)."""
    import os

    from tests.conftest import SF_SMOKE
    from trireme_spark import registry
    from trireme_spark.queries.scans import _tmp

    registry.QUERIES["etl_backfill_partition_overwrite"](
        spark, SF_SMOKE
    ).count()
    out = _tmp("backfill", SF_SMOKE)
    target, others = [], []
    for d in os.listdir(out):
        if not d.startswith("day="):
            continue
        for f in os.listdir(os.path.join(out, d)):
            if f.endswith(".parquet"):
                ns = os.stat(os.path.join(out, d, f)).st_mtime_ns
                (target if d == "day=2024-01-15" else others).append(ns)
    assert target and others
    assert min(target) > max(others), (
        "backfill rewrote files outside the target partition"
    )


def test_zorder_layout_clusters_both_dimensions(spark):
    """etl_zorder_layout: the Z-curve must make file-level min/max stats
    TIGHT on both filter dimensions — the selective customer-range read
    must touch a strict subset of the files (a random layout puts hits
    in every file; single-column sort would pass for custkey but fail a
    date-range probe)."""
    from pyspark.sql import functions as F

    from trireme_spark.queries.scans import _tmp
    from trireme_spark import registry

    registry.QUERIES["etl_zorder_layout"](spark, SF_SMOKE).collect()
    out = _tmp("zorder", SF_SMOKE)
    full = spark.read.parquet(out).withColumn(
        "f", F.input_file_name()
    )
    n_files = full.select("f").distinct().count()
    assert n_files >= 4, "layout degenerated to too few files to test"
    # domain-relative ~12% slices of EACH dimension: a random layout puts
    # hits in every file; single-column sort passes one dim, fails the other
    b = full.agg(
        F.min("o_custkey").alias("c_lo"), F.max("o_custkey").alias("c_hi"),
        F.min("o_orderdate").alias("d_lo"), F.max("o_orderdate").alias("d_hi"),
    ).first()
    c_cut = b["c_lo"] + (b["c_hi"] - b["c_lo"]) // 8
    d_cut = b["d_lo"] + (b["d_hi"] - b["d_lo"]) / 8
    for pred in (
        F.col("o_custkey") <= c_cut,
        F.col("o_orderdate") <= F.lit(d_cut),
    ):
        touched = full.where(pred).select("f").distinct().count()
        assert touched < n_files, (
            f"selective read touched all {n_files} files — no clustering"
        )


def test_fquant_tri_engine_agreement_fuzz(spark):
    """parity.fquant's whole claim is that FLOOR(x*1e6)/1e6 is
    cross-engine deterministic for every double (multiply, floor,
    divide are single IEEE ops on identical operands) — unlike
    ROUND(x,6), whose Spark shortest-repr-half-up vs DuckDB
    exact-binary tie handling genuinely diverges. Fuzz the claim
    tri-engine: 4000 adversarial doubles (uniform, many-decimal
    chains, values engineered to sit just under/over 1e-6 boundaries,
    negatives, denormal-ish magnitudes) through Python, Spark, and
    DuckDB; all three must agree bit-for-bit at digits=6 and 8."""
    import math
    import random

    import duckdb

    from trireme_spark.parity import fquant, oracle_fquant
    from trireme_spark.session import prep

    prep(spark)
    rng = random.Random(20260815)
    vals: list[float] = []
    for _ in range(1000):
        vals.append(rng.uniform(-1e6, 1e6))
    for _ in range(1000):
        # recursive-chain-like values: short-decimal combos that ROUND
        # ties on (the observed ewma class)
        vals.append(0.3 * rng.randint(0, 10_000) / 100
                    + 0.7 * rng.randint(0, 10_000) / 100)
    for _ in range(1000):
        # engineered boundary-adjacent: k/1e6 ± tiny
        k = rng.randint(-10**9, 10**9)
        vals.append(k / 1e6 + rng.choice([-1e-13, 0.0, 1e-13]))
    for _ in range(1000):
        vals.append(rng.uniform(-1e-3, 1e-3))
    assert all(abs(v) * 1e8 < 2**53 for v in vals)  # doctrine precondition

    for digits in (6, 8):
        py = [math.floor(v * 10**digits) / 10**digits for v in vals]
        sdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, x double"
        )
        srows = sdf.select("i", fquant("x", digits).alias("q")).collect()
        sq = [r["q"] for r in sorted(srows, key=lambda r: r["i"])]
        con = duckdb.connect()
        dq = [
            r[0]
            for r in con.execute(
                f"SELECT {oracle_fquant('x', digits)} FROM "
                "(SELECT unnest(?) AS x)",
                [vals],
            ).fetchall()
        ]
        con.close()
        assert sq == py, f"Spark != Python at digits={digits}"
        assert dq == py, f"DuckDB != Python at digits={digits}"
