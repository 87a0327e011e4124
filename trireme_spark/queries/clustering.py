"""Clustering / quantization query keys (round 3 — training-data
pipeline: corpus clustering for mixture balancing, PQ compression for
ANN index storage).

``cluster_assign`` is fully oracle-checked (data-derived centroids both
engines can name: the k smallest vec_ids). ``cluster_kmeans_fit`` and
``embed_pq_quantize`` are rows-only by design — iterative training has
no SQL expression — with invariants (WCSS monotonicity, determinism,
PQ distortion bounds) asserted in tests/test_quality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from trireme_spark.operators.clustering import (
    kmeans_fit,
    pq_encode,
    pq_train_codebooks,
)
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_K = 8

# DuckDB mirror: double-cast embeddings, squared-L2 to each of the k
# centroid rows, argmin with (dist, cid) tie-break. list_sum iterates in
# list order = Spark's sequential aggregate fold (parity established by
# embed_normalize_quantize); ROUND(…, 6) absorbs any residual ulp.
_DIST_SQL = (
    "ROUND(list_sum(list_transform(range(len(vemb)), i -> "
    "(vemb[CAST(i AS INT) + 1] - cemb[CAST(i AS INT) + 1]) * "
    "(vemb[CAST(i AS INT) + 1] - cemb[CAST(i AS INT) + 1]))), 6)"
)

_ASSIGN_ORACLE = f"""
WITH c AS (
    SELECT vec_id AS cid,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
    FROM embeddings ORDER BY vec_id LIMIT {_K}
), v AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vemb
    FROM embeddings
), d AS (
    SELECT vec_id, cid, {_DIST_SQL} AS dist_sq
    FROM v CROSS JOIN c
)
SELECT vec_id, cid AS cluster_id, dist_sq
FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY dist_sq, cid) = 1
"""


@register("cluster_assign", oracle=_ASSIGN_ORACLE)
def cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment with data-derived centroids (the k
    smallest vec_ids' embeddings) — the oracle-checkable half of k-means.

    Scale design: centroids are a k-row broadcast; the corpus streams
    through a codegen'd distance fold (k·d multiply-adds per row, no
    Python, no shuffle until the per-vector window — which is keyed on
    vec_id and could be replaced by min_by in a single agg; the window
    form keeps the deterministic (dist, cid) tie-break explicit)."""
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cents = (
        e.orderBy("vec_id")
        .limit(_K)
        .select(F.col("vec_id").alias("cid"), emb_d.alias("cemb"))
    )
    v = e.select("vec_id", emb_d.alias("vemb"))
    dist = F.round(
        F.aggregate(
            F.zip_with("vemb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, t: s + t,
        ),
        6,
    )
    d = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", F.col("cid").alias("cluster_id"), dist.alias("dist_sq")
    )
    w = Window.partitionBy("vec_id").orderBy("dist_sq", "cluster_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "dist_sq")
    )


@register("cluster_kmeans_fit")
def cluster_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus (k=8, 4
    iterations, deterministic init = k smallest vec_ids). Rows-only by
    design (iterative — no SQL form); invariants in tests/test_quality.py:
    WCSS non-increasing, bit-identical reruns, assignment = nearest final
    centroid.

    Scale design (operators/clustering.py): per-iteration state leaving
    the executors is exactly k×d decimal sums + k counts; assignment is
    Arrow-vectorized GEMM against broadcast centroids."""
    e = table(spark, sf_dir, "embeddings")
    assigned, _cents, _hist = kmeans_fit(
        e, k=_K, iters=4, id_col="vec_id", emb_col="embedding"
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "cluster_id").select(
        "vec_id", "cluster_id", "cluster_size"
    )


@register("embed_pq_quantize")
def embed_pq_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 8 subspaces × 8 dims, 16 codes each — 64-d
    float32 compressed to 8 bytes (32×). Codebooks trained on a bounded
    deterministic sample (512 rows by vec_id), encoding is one
    Arrow-vectorized pass against broadcast codebooks. Rows-only by
    design; tests assert determinism, code range, and that PQ distortion
    beats the one-code-per-subspace (mean-only) quantizer.

    Serialized code string keeps driver-side hashing scalar (the
    agg_collect lesson)."""
    e = table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(
        e, m=8, codes=16, iters=5, id_col="vec_id", emb_col="embedding"
    )
    enc = pq_encode(e, books, id_col="vec_id", emb_col="embedding")
    return enc.select(
        "vec_id",
        F.array_join(F.col("codes").cast("array<string>"), ",").alias(
            "pq_codes"
        ),
        F.round("recon_mse", 6).alias("recon_mse"),
    )
