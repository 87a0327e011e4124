"""r14-staged keys, batch 3 — parked UNregistered (r14 lot now 10):

  dedup_lsh_eval — the dedup family's referee: measured recall /
                   candidate-precision / verification-cost operating
                   curve of MinHash-LSH vs the exact-Jaccard truth set
                   (ROWS-ONLY at flip: xxhash64 has no DuckDB mirror)
  fn_iban_mod97  — ISO 7064 MOD-97-10 check digits via the chunkwise
                   residue fold (no big-int type in either engine)

Same contract set as the other staging files; the LSH referee's truth
side IS DuckDB-verifiable (exact Jaccard in SQL) even though the
signature side is not — the pytest pins both that and the nested-bands
monotonicity theorem.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_FULL, SF_SMOKE, assert_matches_oracle
from trireme_spark import registry
from trireme_spark.queries.functions_scalar import (
    _IBAN_DE,
    _IBAN_ORACLE,
    _IBAN_P6_MOD,
    fn_iban_mod97,
)
from trireme_spark.queries.llm_sim import (
    _LSH_EVAL_SHAPES,
    _LSH_EVAL_THRESHOLD,
    dedup_lsh_eval,
)

ORACLED = {"fn_iban_mod97": (fn_iban_mod97, _IBAN_ORACLE)}
STAGED = dict(ORACLED)
STAGED["dedup_lsh_eval"] = (dedup_lsh_eval, None)


@pytest.mark.parametrize("key", sorted(ORACLED))
def test_staged_oracle_parity_smoke(spark, key):
    fn, oracle = ORACLED[key]
    assert_matches_oracle(fn(spark, SF_SMOKE), oracle, SF_SMOKE)


@pytest.mark.parametrize("key", sorted(ORACLED))
def test_staged_oracle_parity_grading_scale(spark, key):
    fn, oracle = ORACLED[key]
    assert_matches_oracle(fn(spark, SF_FULL), oracle, SF_FULL)


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_registration_consistency(key):
    """dedup_lsh_eval registers oracle-less (xxhash64 signatures) and
    must then be in the rows_only manifest."""
    _, oracle = STAGED[key]
    from trireme_spark.queries import _SWEEP_PRIORITY

    if key in registry.QUERIES:
        if oracle is not None:
            assert registry.ORACLES.get(key) == oracle
        else:
            assert key not in registry.ORACLES
            from trireme_spark.rows_only import ROWS_ONLY

            assert key in ROWS_ONLY
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


# --- dedup_lsh_eval ---------------------------------------------------------------


def _exact_truth_count(sf_dir: str) -> int:
    """The truth side of the referee IS SQL-verifiable: exact
    word-3-shingle Jaccard >= threshold, counted in DuckDB."""
    con = duckdb.connect()
    n = con.sql(
        f"""
        WITH t AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') toks
          FROM '{sf_dir}/documents.parquet'
        ), g AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(toks) - 2),
                   i -> toks[CAST(i AS INT) + 1] || ' ' ||
                        toks[CAST(i AS INT) + 2] || ' ' ||
                        toks[CAST(i AS INT) + 3])) gset
          FROM t WHERE len(toks) >= 3
        ), e AS (SELECT doc_id, unnest(gset) AS tk FROM g),
        sz AS (SELECT doc_id, len(gset) AS sz FROM g),
        inter AS (
          SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM e a JOIN e b ON a.tk = b.tk AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT COUNT(*) FROM inter
        JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)
              >= {_LSH_EVAL_THRESHOLD}
        """
    ).fetchone()[0]
    return int(n)


def test_lsh_eval_truth_side_matches_duckdb(spark):
    """The half of the referee that CAN be oracled, is: n_truth_pairs
    equals DuckDB's brute-force exact-Jaccard pair count."""
    got = dedup_lsh_eval(spark, SF_SMOKE).toPandas()
    expected = _exact_truth_count(SF_SMOKE)
    assert (got["n_truth_pairs"] == expected).all(), (
        got["n_truth_pairs"].tolist(),
        expected,
    )


def test_lsh_eval_identities_and_nested_band_monotonicity(spark):
    """Structural pins: per row caught <= min(truth, candidates) and
    the ratios are the printed counts' ratios; ACROSS rows the nested-
    bands theorem — contiguous band slicing makes C(2,32) a subset of
    C(4,16) a subset of C(8,8) (matching a full 32-run implies matching
    both its 16-halves), so candidates and caught are monotone in the
    band count. The S-curve ordering is a THEOREM here, not a sample."""
    got = (
        dedup_lsh_eval(spark, SF_SMOKE)
        .toPandas()
        .sort_values("bands", ascending=False)
        .reset_index(drop=True)
    )
    assert [tuple(x) for x in got[["bands", "rows_per_band"]].values] == [
        (b, r) for b, r in sorted(_LSH_EVAL_SHAPES, key=lambda s: -s[0])
    ]
    for row in got.itertuples(index=False):
        assert 0 <= row.n_caught <= min(
            row.n_truth_pairs, row.n_candidate_pairs
        )
        assert (
            abs(row.recall - math.floor(
                row.n_caught / row.n_truth_pairs * 1e6) / 1e6) < 1e-9
        )
        assert 0.0 <= row.recall <= 1.0
        assert 0.0 <= row.candidate_precision <= 1.0
    cands = got["n_candidate_pairs"].tolist()
    caught = got["n_caught"].tolist()
    assert cands == sorted(cands, reverse=True), cands
    assert caught == sorted(caught, reverse=True), caught


def test_lsh_eval_deterministic(spark):
    def canon(df):
        return sorted(repr(tuple(r)) for r in df.collect())

    a = canon(dedup_lsh_eval(spark, SF_SMOKE))
    b = canon(dedup_lsh_eval(spark, SF_SMOKE))
    assert a == b


def test_lsh_eval_plan_shape(spark):
    """Signatures and shingle sets are cached (one scan); candidate
    joins are band-keyed equi-joins — no cartesian, no corpus-grain
    window."""
    from tests.test_plans import plan

    spark.catalog.clearCache()
    p = plan(dedup_lsh_eval(spark, SF_SMOKE))
    assert "CartesianProduct" not in p, p
    assert "windowspecdefinition" not in p, p


# --- fn_iban_mod97 ----------------------------------------------------------------


def test_iban_python_bigint_recompute(spark):
    """The genuinely independent check of the chunkwise fold: build the
    REAL 22-digit rearranged string per account and take Python's
    arbitrary-precision int mod 97 — no residue algebra shared with the
    implementation."""
    c = pd.read_parquet(SF_SMOKE + "/customer.parquet")
    n_valid = n_false_accept = n_false_reject = 0
    n = len(c)
    for k in c["c_custkey"].astype(int):
        bban = k % 10**16
        # correct check: 98 - int(BBAN || '1314' || '00') mod 97
        rem = int(f"{bban}{_IBAN_DE}00") % 97
        check_ok = 98 - rem
        corrupted = k % 2 == 1
        check_used = (check_ok + 50) % 100 if corrupted else check_ok
        is_valid = int(f"{bban}{_IBAN_DE}{check_used:02d}") % 97 == 1
        n_valid += int(is_valid)
        n_false_accept += int(is_valid and corrupted)
        n_false_reject += int(not is_valid and not corrupted)
    got = fn_iban_mod97(spark, SF_SMOKE).toPandas().iloc[0]
    assert int(got.n_accounts) == n
    assert int(got.n_valid) == n_valid
    assert int(got.n_invalid) == n - n_valid
    assert int(got.n_false_accept) == n_false_accept == 0
    assert int(got.n_false_reject) == n_false_reject == 0
    assert abs(float(got.valid_share) - n_valid / n) < 2e-6


def test_iban_chunk_constant_is_correct():
    """The pinned fold constant is what it claims: 10^6 mod 97."""
    assert _IBAN_P6_MOD == 10**6 % 97 == 27


def test_iban_plan_shape(spark):
    """One codegen'd integer projection over one scan + a 1-row fold —
    no shuffle beyond the fold, no join, no Python."""
    from tests.test_plans import plan

    p = plan(fn_iban_mod97(spark, SF_SMOKE))
    assert p.count("Location: InMemoryFileIndex") == 1, p
    assert "Join" not in p, p
    assert "EvalPython" not in p, p
