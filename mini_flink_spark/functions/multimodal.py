"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The container has no image/audio codecs, so the *decode* steps are stubbed
(NotImplementedError or a deterministic fake, clearly marked), while the
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF signatures —
is real and tested:

- media records: struct(payload binary, meta struct(kind, byte_len, sha256))
- decode_*: mapInPandas over Arrow batches (the shape a real libjpeg/ffmpeg
  UDF would use: iterator of pandas batches, never per-row Python)
- fake_image_features: deterministic md5-derived vector standing in for a
  CNN/CLIP embedding so downstream similarity plumbing is exercisable.

At scale: binary payloads ride Parquet binary columns; size-aware
repartitioning (`repartition_by_bytes`) keeps Arrow batches bounded —
`maxRecordsPerBatch` alone misjudges wide binary rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

MEDIA_META_SCHEMA = "kind string, byte_len bigint, sha256 string"


def to_media(payload: Column, kind: str) -> Column:
    """Wrap a binary payload with typed metadata."""
    return F.struct(
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(payload).cast("bigint").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def text_as_media(df: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Test fixture builder: encode a text column as the binary payload (the
    codec-free stand-in for real image bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("media", to_media(payload, kind))


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real decode is unavailable in this container.

    The implementation below is the exact mapInPandas skeleton a PIL/libjpeg
    decode would use; it raises at first batch to make the stub explicit.
    """

    out_schema = "doc_id bigint, width int, height int, pixels binary"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _ in batches:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "plug PIL.Image.open over media.payload here"
            )

    return df.mapInPandas(decode, out_schema)


def fake_image_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", dim: int = 16
) -> DataFrame:
    """Deterministic fake feature extractor (CLIP-embedding stand-in).

    feature[d] = (md5(payload_hex || '#d') mod 2001 - 1000) / 1000 — stable
    across engines/runs, so downstream ANN plumbing is testable. Arrow-batched
    mapInPandas: the real model inference would swap the body, keep the shape.
    """
    import hashlib

    out_schema = f"{id_col} bigint, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                h0 = hashlib.md5(bytes(payload)).hexdigest()
                feats.append(
                    [
                        (int(hashlib.md5(f"{h0}#{d}".encode()).hexdigest()[:14], 16) % 2001 - 1000)
                        / 1000.0
                        for d in range(dim)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    flat = df.select(F.col(id_col), F.col(f"{media_col}.payload").alias("payload"))
    return flat.mapInPandas(extract, out_schema)


def frame_sample_stub(
    df: DataFrame,
    media_col: str = "media",
    every_n: int = 30,
    bytes_per_frame: int = 1024,
) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_no) rows 0..k per
    video based on byte_len as a deterministic duration proxy (1 'frame' per
    `bytes_per_frame` bytes). Real ffmpeg sampling would replace the
    arithmetic, keep the 1→N mapInPandas shape."""

    out_schema = "doc_id bigint, frame_no int"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": []}
            for doc_id, blen in zip(pdf["doc_id"], pdf["byte_len"]):
                n_frames = max(1, int(blen) // bytes_per_frame)
                for f_no in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(f_no)
            yield pd.DataFrame(rows)

    flat = df.select("doc_id", F.col(f"{media_col}.meta.byte_len").alias("byte_len"))
    return flat.mapInPandas(sample, out_schema)


def audio_chunk_stub(
    df: DataFrame,
    media_col: str = "media",
    window: int = 400,
    hop: int = 160,
) -> DataFrame:
    """Audio framing plumbing (the ASR front-end shape): each audio payload
    fans out to overlapping byte windows (`window` bytes every `hop` — the
    25ms/10ms framing ratio) as (doc_id, chunk_no, start_byte, n_bytes).
    Real PCM decode would replace the byte arithmetic; the 1→N mapInPandas
    fan-out, schema, and batch alignment are the production shape."""

    out_schema = "doc_id bigint, chunk_no int, start_byte bigint, n_bytes bigint"

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "chunk_no": [], "start_byte": [], "n_bytes": []}
            for doc_id, blen in zip(pdf["doc_id"], pdf["byte_len"]):
                for i, start in enumerate(range(0, int(blen), hop)):
                    rows["doc_id"].append(doc_id)
                    rows["chunk_no"].append(i)
                    rows["start_byte"].append(start)
                    rows["n_bytes"].append(min(window, int(blen) - start))
            yield pd.DataFrame(rows)

    flat = df.select("doc_id", F.col(f"{media_col}.meta.byte_len").alias("byte_len"))
    return flat.mapInPandas(chunk, out_schema)


def resize_stub(
    df: DataFrame,
    media_col: str = "media",
    out_w: int = 224,
    out_h: int = 224,
    thumb_bytes: int = 256,
) -> DataFrame:
    """Image-resize plumbing (the thumbnail/model-input-normalization step):
    (doc_id, out_w, out_h, thumb binary, thumb_len). The deterministic fake
    'resample' takes the payload's first `thumb_bytes` bytes; a real
    PIL/libvips resize swaps the body, keeps the Arrow batch shape and
    binary-out schema.

    Scale: 1→1 mapInPandas projection — linear, no shuffle; pair with
    repartition_by_bytes upstream so wide binary rows keep Arrow batches
    bounded."""

    out_schema = "doc_id bigint, out_w int, out_h int, thumb binary, thumb_len bigint"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [bytes(p)[:thumb_bytes] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "thumb": thumbs,
                    "thumb_len": [len(t) for t in thumbs],
                }
            )

    flat = df.select("doc_id", F.col(f"{media_col}.payload").alias("payload"))
    return flat.mapInPandas(resize, out_schema)


def media_meta_table(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Pure-expression metadata projection (no Python): the query-able face of
    the multimodal column."""
    return df.select(
        F.col(id_col),
        F.col(f"{media_col}.meta.kind").alias("kind"),
        F.col(f"{media_col}.meta.byte_len").alias("byte_len"),
        F.col(f"{media_col}.meta.sha256").alias("sha256"),
    )


# ------------------------------------------------------- perceptual hashing

PHASH_GRAM = 8  # fixed-width payload gram (the "block" of the stand-in hash)
PHASH_STRIDE = 4  # sample every 4th gram start: 4x fewer hash-fold elements
# per payload at the same discrimination (pair sets verified stable against
# stride 1 on the planted corpus) — the fold is the whole per-row cost


def phash_table(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", n: int = PHASH_GRAM
) -> DataFrame:
    """56-bit perceptual hash per media payload — deterministic stand-in.

    A real image pHash is decode → resize 32×32 → DCT → low-frequency 8×8 →
    median threshold → 64 bits (public algorithm, pHash.org / Blockhash.io);
    decode needs codecs this container lacks (`decode_image` raises). The
    stand-in hashes the RAW payload instead: a majority-parity sketch
    (`dedup.parity_fold56`) over the payload's distinct fixed-width byte
    grams — content-sensitive, fixed-width, engine-portable. Everything
    downstream of the hash — pigeonhole Hamming band blocking, XOR/bit_count
    verification, near-dup pair output — is the production pipeline this
    function exists to exercise; swap the sketch for a DCT pHash UDF over
    decoded pixels and nothing downstream changes.

    Zero shuffle: per-row projection (whole-stage codegen; the fixture
    payloads are ASCII so byte grams == char grams via a decode roundtrip).
    """
    from mini_flink_spark.functions.dedup import parity_fold56
    from mini_flink_spark.functions.hashing import portable_hash64

    # Generate barrier: bind the decoded payload to an attribute BEFORE the
    # gram lambda consumes it — CollapseProject would otherwise inline
    # decode(payload) into the transform and re-decode once per gram
    # (the higher-order-lambda re-evaluation trap, SCALE_NOTES round 3).
    flat = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(F.decode(F.col(f"{media_col}.payload"), "UTF-8"))
        ).alias("_pay"),
    )
    grams = F.expr(
        f"if(length(_pay) >= {n}, "
        f"transform(sequence(1, length(_pay) - {n - 1}, {PHASH_STRIDE}), "
        f"i -> substr(_pay, i, {n})), "
        f"cast(array() as array<string>))"
    )
    hashes = F.transform(F.array_distinct(grams), lambda g: portable_hash64(g))
    return flat.select("id", parity_fold56(hashes).alias("phash"))


def phash_sql(
    id_col: str = "doc_id", text_col: str = "text", table: str = "documents", n: int = PHASH_GRAM
) -> str:
    """DuckDB twin of `phash_table` (payload == utf-8 of `text_col` under the
    `text_as_media` fixture, so the oracle grams the text directly)."""
    from mini_flink_spark.functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("g")
    return f"""
WITH grams AS (
  SELECT {id_col} AS id,
         unnest(list_distinct(list_transform(
           range(1, greatest(length({text_col}) - {n - 2}, 1), {PHASH_STRIDE}),
           i -> substr({text_col}, i, {n})))) AS g
  FROM {table}
),
hashed AS (SELECT id, {h} AS h FROM grams),
bits AS (
  SELECT id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS contrib
  FROM hashed, range(0, 56) r(b)
),
per_bit AS (SELECT id, b, sum(contrib) AS s FROM bits GROUP BY id, b),
agg AS (
  SELECT id, (sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS phash
  FROM per_bit GROUP BY id
)
SELECT d.{id_col} AS id, coalesce(a.phash, 0)::BIGINT AS phash
FROM {table} d LEFT JOIN agg a ON a.id = d.{id_col}
"""
