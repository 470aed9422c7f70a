"""Multimodal columns (SURVEY.md 2.K row K6).

Images/audio/video ride through the engine as opaque `binary` columns
with a typed metadata struct - exactly how the sync engine's blob
bridge works (CQL blob <-> ES base64, SURVEY.md 1.2). The corpus has
no real media, so the payload is the document text encoded as bytes;
the *plumbing* (schema, base64 bridge, Arrow-batched decode UDF,
frame-sample explode) is real and tested.

The decode step is a clearly-marked STUB: the container has no image/
audio libraries, so `decode_image_batch` computes a deterministic fake
"decode" from the raw bytes (and documents the one-line swap to a real
PIL/ffmpeg call). Spark-side mechanics - mapInPandas with an explicit
output schema, Arrow batching, per-partition iteration - are the real
production shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.registry import register

FRAME_BYTES = 100  # fake "frame" stride for the frame-sample operator


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> a multimodal table: binary payload + typed metadata."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").alias("n_bytes_declared"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@register("k6_binary_bridge", "K6", """
SELECT doc_id,
       OCTET_LENGTH(ENCODE(text)) AS n_bytes,
       BASE64(ENCODE(text)) AS payload_b64,
       SUBSTR(BASE64(ENCODE(text)), 1, 12) AS b64_head
FROM documents
""", "Binary column carriage + base64 bridge (the CQL blob <-> ES "
     "base64 projection, SURVEY.md 1.2)")
def k6_binary_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    # Spark's base64 emits MIME \r\n line breaks every 76 chars;
    # DuckDB's (and ES's _source) is unchunked - normalize.
    b64 = F.regexp_replace(F.base64("payload"), "\r\n", "")
    return m.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        b64.alias("payload_b64"),
        F.substring(b64, 1, 12).alias("b64_head"),
    )


@register("k6_frame_sample", "K6", f"""
SELECT doc_id,
       CAST(UNNEST(RANGE(n_chars // {FRAME_BYTES} + 1)) AS INT) AS frame_idx,
       CAST(UNNEST(RANGE(n_chars // {FRAME_BYTES} + 1)) * {FRAME_BYTES} AS BIGINT)
         AS byte_offset
FROM documents
""", "Frame sampling: one row per fixed-stride frame of the payload "
     "(video keyframe extraction shape: explode, never a driver loop)")
def k6_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"n_chars div {FRAME_BYTES}"))
            ).alias("frame_idx_raw"),
        )
        .select(
            "doc_id",
            F.col("frame_idx_raw").cast("int").alias("frame_idx"),
            (F.col("frame_idx_raw").cast("bigint") * FRAME_BYTES).alias("byte_offset"),
        )
    )


# ---------------------------------------------------------------------------
# Arrow-batched decode stub (rows-only verification: the decode itself is
# fake, but the mapInPandas plumbing is the production shape)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)

USE_REAL_DECODER = False  # flip when PIL/ffmpeg are available


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode'.

    STUB: real deployment replaces the body of `_decode_one` with e.g.
    ``PIL.Image.open(io.BytesIO(raw)).size`` - the signature, schema,
    and batching stay identical. The fake is deterministic so tests can
    assert on it.
    """

    def _decode_one(raw: bytes) -> tuple[int, int, int, int]:
        if USE_REAL_DECODER:
            raise NotImplementedError("no image library in this container")
        n = len(raw)
        w = n % 640 + 1
        h = n % 480 + 1
        checksum = sum(raw[:64]) if n else 0
        return n, w, h, checksum

    for pdf in batches:
        decoded = [_decode_one(r) for r in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [d[0] for d in decoded],
                "fake_width": [d[1] for d in decoded],
                "fake_height": [d[2] for d in decoded],
                "checksum": [d[3] for d in decoded],
            }
        )


@register("k6_decode_stub", "K6", None,
          "mapInPandas Arrow-batched media decode (stubbed decoder; "
          "rows-only check - the plumbing is the verified part)")
def k6_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).select("doc_id", "payload")
    return m.mapInPandas(decode_image_batch, DECODED_SCHEMA)


@register("k6b_struct_metadata", "K6", """
SELECT doc_id,
       'image/fake' AS mime,
       n_chars AS n_bytes_declared,
       source AS origin
FROM documents
WHERE source IN ('src1', 'src2') AND n_chars > 200
""", "Typed-metadata predicate on the multimodal table: filter and "
     "project nested struct fields (Catalyst flattens the struct "
     "accesses; on parquet-born structs the filter pushes to the scan)")
def k6b_struct_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return (
        m.filter(
            F.col("meta.origin").isin("src1", "src2")
            & (F.col("meta.n_bytes_declared") > 200)
        )
        .select(
            "doc_id",
            F.col("meta.mime").alias("mime"),
            F.col("meta.n_bytes_declared").alias("n_bytes_declared"),
            F.col("meta.origin").alias("origin"),
        )
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB 'audio featurizer': treats the payload bytes as a fake
    PCM-ish waveform (centered at 128) and computes deterministic
    features. Real deployment: soundfile/librosa decode with identical
    signature and schema."""
    for pdf in batches:
        feats = []
        for raw in pdf["payload"]:
            wave = [b - 128 for b in raw]
            n = len(wave)
            mean_amp = round(sum(abs(w) for w in wave) / n, 6) if n else 0.0
            zc = sum(
                1 for i in range(1, n) if (wave[i - 1] < 0) != (wave[i] < 0)
            )
            feats.append((n, mean_amp, zc))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_samples": [f[0] for f in feats],
                "mean_amp": [f[1] for f in feats],
                "zero_crossings": [f[2] for f in feats],
            }
        )


@register("k6c_audio_features_stub", "K6", None,
          "mapInPandas audio featurizer stub (deterministic fake PCM "
          "features from the binary payload; rows-only - the Arrow "
          "plumbing and schema are the verified parts)")
def k6c_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).select("doc_id", "payload")
    return m.mapInPandas(audio_features_batch, AUDIO_SCHEMA)
