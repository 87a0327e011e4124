"""Multimodal pipeline query keys (SURVEY.md §2.11; see
operators/multimodal.py for the decode-stub design)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trireme_spark.operators.multimodal import (
    decode_features_stub,
    frame_sample,
)
from trireme_spark.registry import register
from trireme_spark.sources.io import table

_MMD_ORACLE = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
       CAST(octet_length(CAST(text AS BLOB)) % 256 AS INTEGER)
           AS pseudo_width,
       CAST((ascii(substr(text, 1, 1)) * 7) % 256 AS INTEGER)
           AS pseudo_height,
       CAST(octet_length(CAST(text AS BLOB)) % 10 + 1 AS INTEGER)
           AS n_frames,
       sha256(text) AS digest
FROM documents
"""


@register("multimodal_decode", oracle=_MMD_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (stub decoder).

    The payload is the document text encoded to bytes (the container has
    no media fixtures); every feature the stub derives is mirrored exactly
    in the SQL oracle, so the full Arrow round-trip — binary column out,
    typed features back — is value-checked, not just smoke-checked."""
    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_features_stub(binary_df)


_MMF_ORACLE = """
WITH b AS (SELECT doc_id, CAST(text AS BLOB) AS payload FROM documents)
SELECT doc_id,
       CAST(UNNEST(range(CAST(ceil(octet_length(payload) / 64.0) AS BIGINT)))
            AS INTEGER) AS frame_no,
       CAST(octet_length(payload) AS INTEGER) AS total_bytes
FROM b
"""


@register("multimodal_frame_sample", oracle=_MMF_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque bytes: one row per 64-byte chunk, JVM-side
    explode (Python never touches the payload). Output is the frame index
    plus total size; the chunk bytes themselves stay internal (binary
    column — exercised, not hash-compared)."""
    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = frame_sample(binary_df, stride=64)
    totals = binary_df.select(
        "doc_id", F.length("payload").alias("total_bytes")
    )
    return frames.join(totals, "doc_id").select(
        "doc_id", "frame_no", "total_bytes"
    )


_MMR_ORACLE = """
WITH pos AS (
  SELECT doc_id, text,
         CAST(unnest(range(CAST(ceil(length(text) / 4.0) AS BIGINT)))
              AS BIGINT) AS i
  FROM documents
)
SELECT doc_id,
       CAST(ceil(length(text) / 4.0) AS INTEGER) AS resized_len,
       md5(string_agg(substr(text, CAST(i * 4 + 1 AS INT), 1),
                      '' ORDER BY i)) AS resized_digest
FROM pos GROUP BY doc_id, text
"""


@register("multimodal_resize", oracle=_MMR_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize over opaque bytes: stride-4 downsample (the 1-D stand-in for
    nearest-neighbor image scaling) through the same Arrow mapInPandas
    plumbing a real PIL resize would use. The fixture payload is ASCII
    text-as-bytes, so the oracle reconstructs the same downsample with
    character positions and both sides md5 the result — the byte
    round-trip is value-checked end to end."""
    from trireme_spark.operators.multimodal import resize_stub

    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return resize_stub(binary_df, factor=4)


_MMA_ORACLE = """
WITH b AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
  FROM documents
)
SELECT doc_id,
       CAST(f.frame_no AS INTEGER) AS frame_no,
       CAST(least(n - f.frame_no * 160, 400) AS INTEGER) AS n_samples,
       CAST(list_sum(list_transform(
           range(CAST(least(n - f.frame_no * 160, 400) AS BIGINT)),
           i -> ascii(substr(text,
                CAST(f.frame_no * 160 + i AS INT) + 1, 1)) ^ 2
       )) AS BIGINT) AS energy
FROM b, LATERAL (
  SELECT UNNEST(range(
      CAST(greatest(n - 400, 0) // 160 AS BIGINT) + 1)) AS frame_no
) f
"""


@register("multimodal_audio_frames", oracle=_MMA_ORACLE)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing — overlapping analysis windows (400-sample frames,
    160-sample hop: the standard 25 ms/10 ms speech framing) with
    per-frame energy, over an opaque byte payload: the first step of
    every audio featurizer (STFT, MFCC, VAD).

    The payload is the doc text's UTF-8 bytes (no media fixtures in the
    container — the multimodal_decode planting pattern), so the per-
    frame integer energies are mirrored exactly by the oracle via char
    codes and the ENTIRE Arrow pipeline is value-checked: binary column
    → mapInPandas → numpy frombuffer → strided framing → typed rows
    back. A real PCM decoder drops in at the frombuffer line.

    Scale design: framing is embarrassingly parallel per row; the UDF
    emits (doc, frame) rows — ~n/hop per doc, bounded fan-out — and the
    heavy bytes never leave the executor (only frame STATS return).
    Arrow batches amortize the Python hop; no shuffle anywhere."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def frames(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "n_samples": [],
                   "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(x)
                n_frames = max(n - 400, 0) // 160 + 1
                for k in range(n_frames):
                    seg = x[k * 160 : k * 160 + 400]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(k)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int((seg * seg).sum()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(
        frames,
        "doc_id long, frame_no int, n_samples int, energy long",
    )


# ---------------------------------------------------------------------------
# multimodal_image_patches — ViT-style patch extraction over opaque bytes
# ---------------------------------------------------------------------------

_MMP_ORACLE = """
WITH b AS (
  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n
  FROM documents
),
grid AS (
  SELECT doc_id, text, n, pr.pr, pc.pc
  FROM b,
       (SELECT UNNEST(range(2)) AS pr) pr,
       (SELECT UNNEST(range(2)) AS pc) pc
)
SELECT doc_id,
       CAST(pr AS INTEGER) AS patch_row,
       CAST(pc AS INTEGER) AS patch_col,
       CAST(list_sum(list_transform(range(256), i ->
           CASE WHEN (pr * 16 + i // 16) * 32 + pc * 16 + i % 16 < n
                THEN ascii(substr(text,
                     CAST((pr * 16 + i // 16) * 32
                          + pc * 16 + i % 16 AS INT) + 1, 1))
                ELSE 0 END)) AS BIGINT) AS px_sum,
       CAST(list_sum(list_transform(range(256), i ->
           CASE WHEN (pr * 16 + i // 16) * 32 + pc * 16 + i % 16 < n
                THEN 1 ELSE 0 END)) AS BIGINT) AS px_valid
FROM grid
"""


@register("multimodal_image_patches", oracle=_MMP_ORACLE)
def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style image patching: a 32×32 single-channel "image" (the
    payload's first 1024 bytes, row-major; short payloads zero-pad)
    splits into four 16×16 patches with per-patch pixel sums — the
    tokenization step of every vision transformer, and the 2-D analog
    of multimodal_audio_frames' 1-D striding.

    The payload is the doc text's UTF-8 bytes (no image codecs in the
    container — the multimodal_decode planting doctrine), so per-patch
    integer sums mirror exactly via char codes and the whole Arrow
    pipeline is value-checked: binary → mapInPandas → numpy frombuffer
    → 2-D reshape → strided 16×16 blocks → typed rows. A real image
    decoder (PIL/cv2) drops in at the frombuffer line.

    Scale design: per-row bounded fan-out (exactly 4 patch rows/doc),
    bytes never leave the executor (only patch statistics return),
    Arrow batches amortize the Python hop, no shuffle. px_valid counts
    in-payload pixels so the zero-pad region is explicit in the
    contract rather than silently folded into the sums."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def patches(batches):
        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [],
                "patch_row": [],
                "patch_col": [],
                "px_sum": [],
                "px_valid": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(payload[:1024], dtype=np.uint8)
                n = len(raw)
                img = np.zeros(1024, dtype=np.int64)
                img[:n] = raw
                img = img.reshape(32, 32)
                valid = np.zeros(1024, dtype=np.int64)
                valid[:n] = 1
                valid = valid.reshape(32, 32)
                for pr in range(2):
                    for pc in range(2):
                        blk = img[pr * 16 : pr * 16 + 16,
                                  pc * 16 : pc * 16 + 16]
                        vblk = valid[pr * 16 : pr * 16 + 16,
                                     pc * 16 : pc * 16 + 16]
                        out["doc_id"].append(doc_id)
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["px_sum"].append(int(blk.sum()))
                        out["px_valid"].append(int(vblk.sum()))
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(
        patches,
        "doc_id long, patch_row int, patch_col int, "
        "px_sum long, px_valid long",
    )


# ---------------------------------------------------------------------------
# multimodal_audio_silence — VAD-style silence-run detection
# ---------------------------------------------------------------------------

_SIL_FRAME = 400  # non-overlapping frames for run semantics
_SIL_TH = 1_000_000  # frame energy below this = silence (spaces ≈ 409 600)

_SILENCE_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         substr(text, 1, 800) || repeat(' ', 700) ||
           substr(text, 801, 100000) AS t
  FROM documents
), sized AS (
  SELECT doc_id, t, octet_length(CAST(t AS BLOB)) AS n FROM b
), fr AS (
  SELECT doc_id, f.frame_no,
         CAST(list_sum(list_transform(
             range(CAST(least(n - f.frame_no * {_SIL_FRAME},
                              {_SIL_FRAME}) AS BIGINT)),
             i -> ascii(substr(t,
                  CAST(f.frame_no * {_SIL_FRAME} + i AS INT) + 1, 1)) ^ 2
         )) AS BIGINT) AS energy
  FROM sized, LATERAL (
    SELECT UNNEST(range(CAST((n + {_SIL_FRAME} - 1) // {_SIL_FRAME}
                             AS BIGINT))) AS frame_no
  ) f
), flagged AS (
  SELECT doc_id, frame_no, (energy < {_SIL_TH}) AS quiet,
         CASE WHEN (energy < {_SIL_TH}) <> COALESCE(
                LAG(energy < {_SIL_TH}) OVER (PARTITION BY doc_id
                                              ORDER BY frame_no), FALSE)
              THEN 1 ELSE 0 END AS brk
  FROM fr
), runs AS (
  SELECT doc_id, frame_no, quiet,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY frame_no
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
)
SELECT doc_id, CAST(MIN(frame_no) AS INTEGER) AS run_start,
       CAST(MAX(frame_no) AS INTEGER) AS run_end,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM runs WHERE quiet GROUP BY doc_id, run_id
HAVING COUNT(*) >= 1
"""


@register("multimodal_audio_silence", oracle=_SILENCE_ORACLE)
def multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style SILENCE detection: non-overlapping 400-sample frames
    classify quiet (energy < threshold), maximal quiet runs emit with
    exact frame boundaries — the voice-activity front end that decides
    what an ASR pipeline even transcribes, and the batch shape of
    every run-detection over framed media (black video segments, flat
    sensor spans).

    A 700-byte silence block is PLANTED mid-payload (spaces: energy
    409 600/frame vs ~4 M for text — same construction in the oracle),
    so run boundaries are value-checked, not assumed. Pipeline: the
    audio-frames Arrow pattern (bytes → mapInPandas → numpy framing,
    bytes never leave the executor) → gaps-and-islands per doc (ONE
    doc-keyed window chain — the alert-throttle machinery applied to
    frames).

    Scale: frame stats are the only shuffled rows (bounded n/400 per
    doc); runs aggregate on the same doc-keyed exchange."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    payload = F.concat(
        F.substring("text", 1, 800),
        F.lit(" " * 700),
        F.substring("text", 801, 100000),
    )
    binary_df = d.select(
        "doc_id", F.encode(payload, "UTF-8").alias("payload")
    )

    def frames(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "energy": []}
            for doc_id, pay in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(pay, dtype=np.uint8).astype(np.int64)
                n = len(x)
                n_frames = (n + _SIL_FRAME - 1) // _SIL_FRAME
                for k in range(n_frames):
                    seg = x[k * _SIL_FRAME : (k + 1) * _SIL_FRAME]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(k)
                    out["energy"].append(int((seg * seg).sum()))
            yield pd.DataFrame(out)

    fr = binary_df.mapInPandas(
        frames, "doc_id long, frame_no int, energy long"
    )
    from pyspark.sql.window import Window as W

    quiet = F.col("energy") < _SIL_TH
    w = W.partitionBy("doc_id").orderBy("frame_no")
    flagged = fr.select(
        "doc_id",
        "frame_no",
        quiet.alias("quiet"),
        (
            quiet
            != F.coalesce(F.lag(quiet).over(w), F.lit(False))
        )
        .cast("int")
        .alias("brk"),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("brk").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        runs.where("quiet")
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("frame_no").alias("run_start"),
            F.max("frame_no").alias("run_end"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .select("doc_id", "run_start", "run_end", "n_frames")
    )


# ---------------------------------------------------------------------------
# multimodal_scene_cuts — frame-difference shot-boundary detection
# ---------------------------------------------------------------------------

_CUT_FRAME = 400
_CUT_TH = 2_000_000  # |Δ energy| above this = cut

_SCENE_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, text AS t, octet_length(CAST(text AS BLOB)) AS n
  FROM documents
), fr AS (
  SELECT doc_id, f.frame_no,
         CAST(list_sum(list_transform(
             range(CAST(least(n - f.frame_no * {_CUT_FRAME},
                              {_CUT_FRAME}) AS BIGINT)),
             i -> ascii(substr(t,
                  CAST(f.frame_no * {_CUT_FRAME} + i AS INT) + 1, 1)) ^ 2
         )) AS BIGINT) AS energy
  FROM sized, LATERAL (
    SELECT UNNEST(range(CAST((n + {_CUT_FRAME} - 1) // {_CUT_FRAME}
                             AS BIGINT))) AS frame_no
  ) f
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS cut_at_frame,
       CAST(ABS(energy - LAG(energy) OVER (PARTITION BY doc_id
                                           ORDER BY frame_no))
            AS BIGINT) AS delta
FROM fr
QUALIFY LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_no)
          IS NOT NULL
    AND ABS(energy - LAG(energy) OVER (PARTITION BY doc_id
                                       ORDER BY frame_no)) > {_CUT_TH}
"""


@register("multimodal_scene_cuts", oracle=_SCENE_ORACLE)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOT-BOUNDARY detection — the video-segmentation primitive:
    frame-to-frame feature DELTA above a threshold marks a cut (here
    the per-frame energy over the byte payload; a real pipeline swaps
    in color-histogram or embedding distance at the same seam). The
    last partial frame's energy drop naturally trips the detector —
    the boundary every real cut-detector must handle; exact integer
    deltas make every flagged cut value-checked.

    Pipeline: the audio-frames Arrow pattern (non-overlapping frames,
    bytes never leave the executor) → ONE doc-keyed lag window on the
    frame stats. Silence runs (multimodal_audio_silence) detect
    sustained LOW state; cuts detect CHANGE — together they are the
    segmentation pair every media pipeline starts with."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    binary_df = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def frames(batches):
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "energy": []}
            for doc_id, pay in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(pay, dtype=np.uint8).astype(np.int64)
                n = len(x)
                n_frames = (n + _CUT_FRAME - 1) // _CUT_FRAME
                for k in range(n_frames):
                    seg = x[k * _CUT_FRAME : (k + 1) * _CUT_FRAME]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(k)
                    out["energy"].append(int((seg * seg).sum()))
            yield pd.DataFrame(out)

    fr = binary_df.mapInPandas(
        frames, "doc_id long, frame_no int, energy long"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("doc_id").orderBy("frame_no")
    out = fr.select(
        "doc_id",
        F.col("frame_no").alias("cut_at_frame"),
        F.abs(F.col("energy") - F.lag("energy").over(w)).alias("delta"),
        F.lag("energy").over(w).alias("prev"),
    )
    return out.where(
        F.col("prev").isNotNull() & (F.col("delta") > _CUT_TH)
    ).select("doc_id", "cut_at_frame", "delta")


# ---------------------------------------------------------------------------
# multimodal_phash_dedup — perceptual-hash (aHash) near-duplicate assets
# ---------------------------------------------------------------------------

# 64 sampled "pixels" -> mean-threshold bits -> two 32-bit halves.
# Shared bit algebra, mirrored verbatim in the oracle.

_PHASH_ORACLE = """
WITH px AS (
  SELECT doc_id,
         list_transform(range(64), i ->
             ascii(substr(text,
                 CAST(1 + (i * len(text)) // 64 AS INT), 1))) AS pix
  FROM documents WHERE len(text) >= 1
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(32), i ->
             CASE WHEN pix[CAST(i AS INT) + 1] * 64 >
                       list_sum(pix) THEN CAST(2 ** i AS BIGINT)
                  ELSE 0 END)) AS BIGINT) AS h1,
         CAST(list_sum(list_transform(range(32), i ->
             CASE WHEN pix[CAST(i AS INT) + 33] * 64 >
                       list_sum(pix) THEN CAST(2 ** i AS BIGINT)
                  ELSE 0 END)) AS BIGINT) AS h2
  FROM px
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
            AS INT) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2)) <= 7
"""


@register("multimodal_phash_dedup", oracle=_PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (average-hash) near-duplicate detection over
    binary assets: 64 pixels sampled evenly across the payload,
    mean-thresholded into a 64-bit signature (two 32-bit halves — no
    sign-bit traps), candidates blocked by 8-bit signature chunks
    (Hamming <= 7 pigeonholes at least one IDENTICAL chunk among 8, so
    the blocking is provably complete at this threshold — the SimHash
    doctrine), exact Hamming verify on candidates only. The asset-level
    analogue of text near-dup: thumbnails, re-encoded images and
    crops collide in aHash space while exact digests differ. Pseudo
    pixels derive from the payload bytes (stub-decode doctrine: the
    real decoder drops into the same pipeline).

    The brute-force oracle value-checks the BLOCKED plan's
    completeness, exactly like geo_distance_join's radius join.

    Scale design: signatures are per-row column algebra; candidate
    generation is a keyed equi-join on (chunk_idx, chunk_value) —
    never all-pairs; verify runs bit_count on candidate pairs only."""
    d = table(spark, sf_dir, "documents").where(F.length("text") >= 1)
    pix = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.ascii(
            F.substring(
                F.col("text"),
                (1 + (i * F.length("text")).cast("long") / 64).cast("int"),
                1,
            )
        ),
    )
    px = d.select("doc_id", pix.alias("pix")).withColumn(
        "psum", F.aggregate("pix", F.lit(0), lambda a, x: a + x)
    )
    def half(lo):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.element_at("pix", (i + lo + 1).cast("int")) * 64
                > F.col("psum"),
                F.pow(F.lit(2.0), i).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    # One signature pass, not two: the a/b self-join below otherwise
    # evaluates this whole subtree once per side (the build side rides a
    # BroadcastExchange, which plan reuse cannot dedupe the way a shuffle
    # Exchange can — the candidate_pairs_prefix lesson). The cached frame
    # is bounded: (doc_id, h1, h2) = 3 longs per document.
    from trireme_spark.operators.hints import cache_once

    h = cache_once(
        px.select(
            "doc_id", half(F.lit(0)).alias("h1"), half(F.lit(32)).alias("h2")
        )
    )
    # chunk blocking: 8 x 8-bit chunks (complete for Hamming <= 7)
    chunks = h.select(
        "doc_id",
        "h1",
        "h2",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("ck"),
                        (
                            F.shiftrightunsigned(
                                F.col("h1") if k < 4 else F.col("h2"),
                                8 * (k % 4),
                            )
                            % 256
                        ).alias("cv"),
                    )
                    for k in range(8)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "h1", "h2", F.col("c.ck").alias("ck"), F.col("c.cv").alias("cv"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.h1").alias("h1a"),
            F.col("a.h2").alias("h2a"),
            F.col("b.h1").alias("h1b"),
            F.col("b.h2").alias("h2b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = (
        F.bit_count(F.col("h1a").bitwiseXOR(F.col("h1b")))
        + F.bit_count(F.col("h2a").bitwiseXOR(F.col("h2b")))
    )
    return cand.select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    ).where(F.col("hamming") <= 7)
