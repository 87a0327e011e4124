"""Distributed clustering + product quantization over embedding columns.

Both operators follow the bounded-driver-state rule that governs every
similarity/indexing operator in this engine: the ONLY thing that ever
leaves the executors is model state whose size is a function of k and d
(centroids: k×d doubles; PQ codebooks: m×k×(d/m) doubles) — never a
function of the corpus. Assignment/encoding passes are Arrow-vectorized
numpy over broadcast model state, so the per-row cost is a GEMM row, not
a Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _emb_matrix(pdf_col: pd.Series) -> np.ndarray:
    return np.stack(pdf_col.to_numpy()).astype("float64")


def _assign(batch: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Vectorized nearest-centroid: ||x-c||² = ||x||² - 2x·c + ||c||²;
    the ||x||² term is constant per row, so argmin over (-2x·c + ||c||²)
    suffices. np.argmin takes the FIRST minimum — deterministic ties."""
    d2 = -2.0 * (batch @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1)


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "emb",
):
    """Distributed Lloyd's k-means. Returns (assignments DataFrame,
    final centroids ndarray (k, d), per-iteration WCSS history list).

    Init is the k smallest-``id_col`` vectors (deterministic, no RNG).
    Each iteration is two distributed passes — (1) assignment: broadcast
    centroids into an Arrow-vectorized UDF; (2) new means: posexplode +
    ONE keyed aggregation on (cluster, dim) with map-side combine — and
    one driver collect of exactly k×d means + k counts (model state,
    bounded regardless of corpus size). Empty clusters keep their
    previous centroid. WCSS is computed from the same aggregation pass
    (sum of ||x||²) plus centroid algebra — no extra scan.
    """
    spark = vectors.sparkSession
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(emb_col), lambda x: x.cast("double")).alias("emb"),
    )
    v = v.persist()
    cents = np.stack(
        [
            np.asarray(r["emb"], dtype="float64")
            for r in v.orderBy("vec_id").limit(k).collect()
        ]
    )
    d = cents.shape[1]
    history = []

    def assigned_df(cent_arr: np.ndarray) -> DataFrame:
        bc = spark.sparkContext.broadcast(cent_arr)

        def _a(it):
            for pdf in it:
                m = _emb_matrix(pdf["emb"])
                out = pdf[["vec_id"]].copy()
                out["cluster_id"] = _assign(m, bc.value).astype("int32")
                out["emb"] = pdf["emb"]
                yield out

        return v.mapInPandas(
            _a, "vec_id long, cluster_id int, emb array<double>"
        )

    def partial_stats(cent_arr: np.ndarray):
        """One Arrow pass: assign AND pre-aggregate per-partition k×d
        partial sums in numpy (map-side combine without the 64× posexplode
        row blowup — the shuffle carries k·d rows per partition, never
        n·d). Partition membership and in-partition row order are
        deterministic for a given input, so the float64 partials are too;
        the cross-partition merge is an order-independent decimal sum —
        centroids stay bit-identical across reruns."""
        bc = spark.sparkContext.broadcast(cent_arr)

        def _p(it):
            bks = bc.value
            tot = np.zeros((k, d))
            cnt = np.zeros(k, dtype="int64")
            sq_local = 0.0
            for pdf in it:
                m = _emb_matrix(pdf["emb"])
                lab = _assign(m, bks)
                for ci in range(k):
                    mask = lab == ci
                    if mask.any():
                        tot[ci] += m[mask].sum(axis=0)
                        cnt[ci] += int(mask.sum())
                sq_local += float((m * m).sum())
            rows = {
                "cluster_id": np.repeat(np.arange(k, dtype="int32"), d),
                "pos": np.tile(np.arange(d, dtype="int32"), k),
                "s": tot.ravel(),
                "n": np.repeat(cnt, d),
                "ss": np.full(k * d, sq_local / (k * d)),
            }
            yield pd.DataFrame(rows)

        return v.mapInPandas(
            _p, "cluster_id int, pos int, s double, n long, ss double"
        )

    for _ in range(iters):
        stats = (
            partial_stats(cents)
            .groupBy("cluster_id", "pos")
            .agg(
                # decimal merge of the per-partition partials:
                # order-independent, so reruns are bit-identical
                F.sum(F.col("s").cast("decimal(30,12)")).alias("s"),
                F.sum("n").alias("n"),
                F.sum(F.col("ss").cast("decimal(30,12)")).alias("ss"),
            )
            .collect()
        )
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype="int64")
        sq = 0.0
        for r in stats:
            sums[r["cluster_id"], r["pos"]] = float(r["s"])
            counts[r["cluster_id"]] = r["n"]
            sq += float(r["ss"])
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        # WCSS under the NEW means: Σ||x||² − Σ_c n_c·||μ_c||²
        wcss = sq - float((counts * (new * new).sum(axis=1)).sum())
        history.append(wcss)
        cents = new

    # v stays cached: the RETURNED assignment plan reads it lazily — an
    # eager unpersist here made the caller's first action recompute the
    # whole projection subtree (measured as most of a 313 s stress run).
    # LRU eviction reclaims it under memory pressure.
    final = assigned_df(cents).select("vec_id", "cluster_id")
    return final, cents, history


def pq_train_codebooks(
    vectors: DataFrame,
    m: int = 8,
    codes: int = 16,
    iters: int = 5,
    sample_cap: int = 512,
    id_col: str = "vec_id",
    emb_col: str = "emb",
) -> np.ndarray:
    """Train product-quantization codebooks: (m, codes, d/m) ndarray.

    Per-subspace k-means on a BOUNDED deterministic sample (first
    ``sample_cap`` rows by id — ordered here, not at the caller, per the
    sample_kmeans_centroids determinism rule). Sample size is independent
    of corpus size; training is local numpy (the sample is k·d tiny)."""
    pdf = (
        vectors.select(id_col, emb_col)
        .orderBy(id_col)
        .limit(sample_cap)
        .select(emb_col)
        .toPandas()
    )
    x = _emb_matrix(pdf[emb_col])
    d = x.shape[1]
    assert d % m == 0, "dim must divide into m subspaces"
    sub = d // m
    books = np.zeros((m, codes, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        c = xs[:codes].copy()  # deterministic init: first rows
        for _ in range(iters):
            lab = _assign(xs, c)
            for ci in range(codes):
                mask = lab == ci
                if mask.any():
                    c[ci] = xs[mask].mean(axis=0)
        books[j] = c
    return books


def pq_encode(
    vectors: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "emb",
) -> DataFrame:
    """Encode each vector as m codebook indices + reconstruction MSE.

    One Arrow-vectorized pass; codebooks broadcast (m·codes·sub doubles).
    Returns (vec_id, codes array<int>, recon_mse double)."""
    spark = vectors.sparkSession
    m, n_codes, sub = books.shape
    bc = spark.sparkContext.broadcast(books)

    def _enc(it):
        bks = bc.value
        for pdf in it:
            x = _emb_matrix(pdf[emb_col])
            n = x.shape[0]
            code_cols = np.zeros((n, m), dtype="int32")
            recon = np.zeros_like(x)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                lab = _assign(xs, bks[j])
                code_cols[:, j] = lab
                recon[:, j * sub : (j + 1) * sub] = bks[j][lab]
            mse = ((x - recon) ** 2).mean(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "codes": list(code_cols),
                    "recon_mse": mse,
                }
            )

    v = vectors.select(
        F.col(id_col).alias(id_col),
        F.transform(F.col(emb_col), lambda x: x.cast("double")).alias(
            emb_col
        ),
    )
    return v.mapInPandas(
        _enc, f"{id_col} long, codes array<int>, recon_mse double"
    )
