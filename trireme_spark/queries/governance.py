"""Data-governance keys — policy-based row/column security and
crypto-shredding erasure. A migration/analytics engine that feeds a
search sink (SURVEY.md §1.1) is exactly where governance rewrites live:
the policy applies at EXPORT time, before data leaves the lake.

Scale shapes: both keys are pure projection/filter algebra (policy
predicates push into the scan; masking is codegen'd expression work) —
governance must cost a WHERE clause, not a pipeline stage. The
crypto-shred keyring join is keyed on the entity id like any dimension
join and broadcasts while small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.registry import register
from trireme_spark.sources.io import table

# ---------------------------------------------------------------------------
# etl_row_column_security — policy-rewritten export view
# ---------------------------------------------------------------------------

_RLS_ORACLE = """
SELECT c_custkey,
       regexp_replace(c_name, '#[0-9]{6}', '#XXXXXX') AS name_masked,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS acctbal_band,
       n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND c_mktsegment <> 'MACHINERY'
"""


@register("etl_row_column_security", oracle=_RLS_ORACLE)
def etl_row_column_security(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-based row- and column-level security as a view rewrite —
    the governance layer every warehouse bolts onto exports: ROW
    policies (tenant sees only EUROPE customers, a segment is excluded)
    compile to predicates; COLUMN policies compile to masking
    expressions (names keep only their last 3 id digits, balances
    coarsen to bands — k-anonymity-style generalization instead of
    redaction).

    Scale design: this is the whole point — governance applied as plan
    REWRITE costs nothing at runtime. The row predicates push into the
    scan (region via the broadcast dim join, segment via
    PushedFilters), masks are codegen'd projections, and the engine
    never materializes an unmasked intermediate: the policy holds for
    free at any scale because it IS the plan, not a post-filter."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    masked_name = F.regexp_replace(
        "c_name", r"#[0-9]{6}", "#XXXXXX"
    )
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.where(F.col("c_mktsegment") != "MACHINERY")
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select(
            "c_custkey",
            masked_name.alias("name_masked"),
            band.alias("acctbal_band"),
            "n_name",
        )
    )


# ---------------------------------------------------------------------------
# etl_gdpr_crypto_shred — erasure by key deletion
# ---------------------------------------------------------------------------

_SHRED_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_name END
           AS name_recovered,
       CAST(c_custkey % 10 = 0 AS BOOLEAN) AS erased
FROM customer
"""


@register("etl_gdpr_crypto_shred", oracle=_SHRED_ORACLE)
def etl_gdpr_crypto_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crypto-shredding — the erasure mechanism for immutable storage:
    PII encrypts at ingest under a PER-ENTITY key; "right to be
    forgotten" deletes the KEY, not the data, so petabytes of parquet
    stay untouched while the ciphertext becomes unrecoverable. The key
    demonstrates the full cycle: envelope-encrypt each customer's name
    under their own derived key, drop every 10th customer's key from
    the keyring (the planted erasure set), then run the read path —
    decryption succeeds only where a key survives.

    Scale design: encryption/decryption are codegen'd JVM crypto
    projections (the fn_aes_roundtrip surface, per-row keys); the
    keyring is an entity-keyed dimension that broadcasts while small
    and hash-joins at scale — reads cost one dimension join, erasure
    costs one keyring delete. try_aes_decrypt (not aes_decrypt) is
    load-bearing: reads over a shredded row must yield NULL, not kill
    the job (the ANSI try_* doctrine). The oracle pins the end state:
    erased entities unrecoverable, everyone else intact.

    Key hygiene (r5 ADVICE applied): per-entity keys derive from an
    EPHEMERAL per-job master secret (``secrets.token_hex``, lives only
    in this closure, never stored in any row or output), so a holder of
    the data — custkey included — cannot recompute a key; once the job
    ends, each key exists ONLY in its keyring row and deleting that row
    genuinely destroys it. Mode is GCM (random IV per row —
    semantically secure, no ECB equality leakage) with NONE padding;
    ciphertexts are non-deterministic but the oracle-compared output is
    the recovered PLAINTEXT, which is. The keyring join carries no
    broadcast hint: AQE broadcasts while it is small and hash-joins at
    scale."""
    import secrets

    c = table(spark, sf_dir, "customer")
    # ephemeral KMS master secret — discarded with the job; per-entity
    # data keys are HKDF-style derivations under it (sha2 prefix = 32
    # hex chars = 32 bytes → AES-256), recoverable from the keyring only
    master = secrets.token_hex(16)
    keyring_full = c.select(
        "c_custkey",
        F.substring(
            F.sha2(
                F.concat(F.col("c_custkey").cast("string"), F.lit(master)),
                256,
            ),
            1,
            32,
        ).alias("dk"),
    )
    # ingest side: every row encrypts under ITS OWN key from the keyring
    enc = c.join(keyring_full, "c_custkey").select(
        "c_custkey",
        F.aes_encrypt(
            F.col("c_name"), F.col("dk"), F.lit("GCM"), F.lit("NONE")
        ).alias("name_ct"),
    )
    # keyring AFTER erasure: every 10th customer's key is deleted
    keyring = keyring_full.where(F.col("c_custkey") % 10 != 0)
    joined = enc.join(keyring, "c_custkey", "left")
    return joined.select(
        "c_custkey",
        F.try_aes_decrypt(
            F.col("name_ct"), F.col("dk"), F.lit("GCM"), F.lit("NONE")
        )
        .cast("string")
        .alias("name_recovered"),
        F.col("dk").isNull().alias("erased"),
    )
