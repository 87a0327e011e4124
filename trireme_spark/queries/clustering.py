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


# ---------------------------------------------------------------------------
# cluster_dbscan_grid — density clustering, grid-bucketed (no all-pairs)
# ---------------------------------------------------------------------------

_EPS = 0.04
_MINPTS = 5

_DBSCAN_ORACLE = f"""
WITH RECURSIVE
p AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
),
pair AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM p a JOIN p b ON a.vec_id <> b.vec_id
  WHERE FLOOR(((a.x - b.x) ^ 2 + (a.y - b.y) ^ 2) * 1e12) / 1e12
        <= {_EPS * _EPS}
),
deg AS (
  SELECT p.vec_id,
         1 + COALESCE((SELECT COUNT(*) FROM pair
                       WHERE pair.a = p.vec_id), 0) AS n_eps
  FROM p
),
core AS (SELECT vec_id FROM deg WHERE n_eps >= {_MINPTS}),
ce AS (
  SELECT pair.a AS src, pair.b AS dst FROM pair
  JOIN core ca ON ca.vec_id = pair.a
  JOIN core cb ON cb.vec_id = pair.b
),
reach(v, c) AS (
  SELECT vec_id, vec_id FROM core
  UNION
  SELECT ce.dst, r.c FROM reach r JOIN ce ON ce.src = r.v
),
core_lbl AS (SELECT v AS vec_id, MIN(c) AS cluster FROM reach GROUP BY v),
border AS (
  SELECT pair.a AS vec_id, MIN(cl.cluster) AS cluster
  FROM pair
  JOIN core_lbl cl ON cl.vec_id = pair.b
  WHERE pair.a NOT IN (SELECT vec_id FROM core)
  GROUP BY pair.a
)
SELECT p.vec_id,
       CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
            WHEN bo.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(cl.cluster, bo.cluster) AS cluster
FROM p
LEFT JOIN core_lbl cl ON cl.vec_id = p.vec_id
LEFT JOIN border bo ON bo.vec_id = p.vec_id
"""


@register("cluster_dbscan_grid", oracle=_DBSCAN_ORACLE)
def cluster_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering over the embedding plane (first two
    dims), grid-bucketed: core points have ≥ minPts neighbors within
    eps (self included), clusters are connected components of the
    core-core eps-graph, borders adopt their smallest core neighbor's
    cluster, the rest is noise — the density family (cluster count
    emerges from the data) beside k-means' fixed-k, and THE standard
    spatial clustering for outlier-aware grouping.

    Scale design — the same bucket-then-verify doctrine as geo/MinHash:
    points map to eps-sized grid cells (pure expression), each point
    probes its 3×3 cell neighborhood (bounded ×9 fan-out), exact
    distances evaluate ONLY on co-cell candidates — an eps-ball can
    never cross more cells, so candidates are complete and all-pairs
    never happens. Neighbor counting is one keyed agg; clustering
    reuses the distributed min-label CC operator (keyed shuffles,
    loud non-convergence). Squared distances floor-quantize at 1e-12
    before the eps² compare (geo doctrine — identical doubles both
    engines, no boundary ulp). The brute-force recursive-CTE oracle
    value-checks grid completeness AND the full role/label assignment."""
    from trireme_spark.operators.graph import connected_components

    e = table(spark, sf_dir, "embeddings")
    p = e.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    inv = 1.0 / _EPS
    cell = (
        (F.floor(F.col("x") * inv) + 1000) * 100000
        + (F.floor(F.col("y") * inv) + 1000)
    ).cast("long")
    pts = p.withColumn("cell", cell)
    offsets = F.array(
        *[F.lit(dx * 100000 + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    )
    probe = pts.select(
        F.col("vec_id").alias("a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(
            F.transform(offsets, lambda o: o + F.col("cell"))
        ).alias("cell"),
    )
    build = pts.select(
        F.col("vec_id").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        "cell",
    )
    d2 = (
        F.floor(
            (
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            )
            * 1e12
        )
        / 1e12
    )
    pair = (
        probe.join(build, "cell")
        .where(F.col("a") != F.col("b"))
        .where(d2 <= _EPS * _EPS)
        .select("a", "b")
    )
    # Staged: pairs feed degree counting, the core-core edge filter, and
    # border attachment (3 consumers) — tmp parquet, no cache leak
    from trireme_spark.sources.io import staging_dir

    stage = staging_dir("dbscan_pairs", sf_dir)
    pair.write.mode("overwrite").parquet(stage)
    pair = spark.read.parquet(stage)
    deg = pair.groupBy("a").agg((F.count(F.lit(1)) + 1).alias("n_eps"))
    core = (
        deg.where(F.col("n_eps") >= _MINPTS)
        .select(F.col("a").alias("vec_id"))
    )
    ca = core.select(F.col("vec_id").alias("a"))
    cb = core.select(F.col("vec_id").alias("b"))
    ce = pair.join(ca, "a", "left_semi").join(cb, "b", "left_semi")
    cc = connected_components(
        core, ce, id_col="vec_id", src_col="a", dst_col="b"
    )
    core_lbl = cc.select(
        "vec_id", F.col("component").alias("cluster")
    )
    border = (
        pair.join(ca.withColumnRenamed("a", "a_"),
                  pair["a"] == F.col("a_"), "left_anti")
        .join(
            core_lbl.withColumnRenamed("vec_id", "b"),
            "b",
        )
        .groupBy("a")
        .agg(F.min("cluster").alias("cluster"))
        .withColumnRenamed("a", "vec_id")
    )
    out = (
        p.select("vec_id")
        .join(
            core_lbl.withColumnRenamed("cluster", "core_cluster"),
            "vec_id",
            "left",
        )
        .join(
            border.withColumnRenamed("cluster", "border_cluster"),
            "vec_id",
            "left",
        )
    )
    return out.select(
        "vec_id",
        F.when(F.col("core_cluster").isNotNull(), "core")
        .when(F.col("border_cluster").isNotNull(), "border")
        .otherwise("noise")
        .alias("role"),
        F.coalesce("core_cluster", "border_cluster").alias("cluster"),
    )


# ---------------------------------------------------------------------------
# cluster_silhouette — simplified (centroid-based) silhouette score
# ---------------------------------------------------------------------------

_SIL_ORACLE = f"""
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
), ranked AS (
    SELECT vec_id, cid, sqrt(dist_sq) AS dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist_sq, cid) AS rn
    FROM d
), ab AS (
    SELECT a.vec_id, a.cid AS cluster_id,
           ROUND(CASE WHEN greatest(a.dist, b.dist) = 0 THEN 0
                 ELSE (b.dist - a.dist) / greatest(a.dist, b.dist)
                 END, 6) AS s
    FROM ranked a JOIN ranked b
      ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
)
SELECT cluster_id,
       ROUND(CAST(SUM(CAST(s AS DECIMAL(27,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_silhouette,
       COUNT(*) AS n_points
FROM ab GROUP BY cluster_id
"""


@register("cluster_silhouette", oracle=_SIL_ORACLE)
def cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster — the standard
    clustering-quality score, in the centroid form that scales: a = the
    point's distance to its own (nearest) centroid, b = distance to the
    second-nearest, s = (b−a)/max(a,b). The full silhouette's
    all-pairs-within-cluster term is O(n²) and is exactly what the
    centroid form replaces (sklearn's davies-bouldin/simplified
    tradition); with cluster_assign's deterministic data-derived
    centroids both engines can name the same clustering, making the
    score value-checkable.

    Scale design: k-row broadcast of centroids, codegen'd distance
    fold per (row, centroid), vec-keyed window to rank the k distances,
    then a dimension-sized keyed aggregation — one shuffle of n·k
    id+distance rows, no pairwise joins. Parity: per-row s ROUND(6)
    before the order-independent decimal mean (ln/sqrt drift absorbed
    per row, the parity.py doctrine)."""
    e = table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cents = (
        e.orderBy("vec_id")
        .limit(_K)
        .select(F.col("vec_id").alias("cid"), emb_d.alias("cemb"))
    )
    v = e.select("vec_id", emb_d.alias("vemb"))
    dist_sq = F.round(
        F.aggregate(
            F.zip_with("vemb", "cemb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, t: s + t,
        ),
        6,
    )
    d = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", dist_sq.alias("dist_sq")
    )
    w = Window.partitionBy("vec_id").orderBy("dist_sq", "cid")
    ranked = d.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 2
    )
    a = ranked.where(F.col("rn") == 1).select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.sqrt("dist_sq").alias("dist_a"),
    )
    b = ranked.where(F.col("rn") == 2).select(
        "vec_id", F.sqrt("dist_sq").alias("dist_b")
    )
    s = F.round(
        F.when(F.greatest("dist_a", "dist_b") == 0, F.lit(0.0)).otherwise(
            (F.col("dist_b") - F.col("dist_a"))
            / F.greatest("dist_a", "dist_b")
        ),
        6,
    )
    from trireme_spark.parity import DSCALE

    return (
        a.join(b, "vec_id")
        .select("cluster_id", s.alias("s"))
        .groupBy("cluster_id")
        .agg(
            F.round(
                F.sum(F.col("s").cast(DSCALE)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_silhouette"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
