"""Multimodal columns (SURVEY.md 2.K row K6).

Images/audio/video ride through the engine as opaque `binary` columns
with a typed metadata struct - exactly how the sync engine's blob
bridge works (CQL blob <-> ES base64, SURVEY.md 1.2). The corpus has
no real media, so image payloads are SYNTHESIZED: deterministic, valid
PNG/JPEG/GIF files with planted dimensions (pipeline/imaging.py), and
the decode operator parses format/width/height back OUT OF THE BYTES
with a pure-python header parser - a real decode, oracle-checked
against the planted ground truth (k6_image_decode). The mapInPandas
mechanics - explicit output schema, Arrow batching, per-partition
iteration - are the production shape; swapping the header parser for a
full PIL/ffmpeg pixel decode changes one function body.

Beyond header parsing, the REAL pixel/sample codecs live in
pipeline/imaging.py and pipeline/jpeg_codec.py: PNG (all filters,
grey/RGB/palette), baseline + progressive JPEG (gray and 4:2:0
chroma, DRI/RSTn restarts), GIF LZW, WAV PCM, MP4 box walk, EXIF -
each oracle-checked below against planted bytes.
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
        F.octet_length("payload").cast("long").alias("n_bytes"),
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
# Arrow-batched REAL image decode: synthesized valid PNG/JPEG/GIF payloads,
# header-parsed back to (format, width, height) from the bytes alone
# ---------------------------------------------------------------------------

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload) where payload is a VALID minimal
    PNG/JPEG/GIF file with dimensions planted deterministically from
    doc_id (pipeline/imaging.py). Synthesis runs as an Arrow-batched
    pandas UDF - the ingest-side shape of any binary-column builder."""
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import synth_image

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: synth_image(int(d)))

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", synth("doc_id").alias("payload"))


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image decode: parses format/width/height out of
    the payload BYTES (PNG IHDR / JPEG SOF marker scan / GIF LSD) with
    the pure-python header parser. Unparseable payloads yield NULLs -
    the skip-don't-crash behavior a 100 TB media crawl needs. A full
    pixel decode (PIL/ffmpeg) swaps in here with the same signature,
    schema, and batching."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_image

    for pdf in batches:
        decoded = [parse_image(r) for r in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "format": [d[0] if d else None for d in decoded],
                "width": [d[1] if d else None for d in decoded],
                "height": [d[2] if d else None for d in decoded],
                "n_bytes": [len(r) if r is not None else None for r in pdf["payload"]],
            }
        )


@register("k6_image_decode", "K6", """
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
            WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
       CAST(doc_id % 640 + 1 AS INT) AS width,
       CAST((doc_id * 7) % 480 + 16 AS INT) AS height
FROM documents
""", "REAL image decode over binary columns: payloads are valid "
     "minimal PNG/JPEG/GIF files (correct CRCs / marker segments) "
     "synthesized with dimensions planted from doc_id, and the "
     "operator recovers format+width+height FROM THE BYTES with a "
     "pure-python header parser inside an Arrow-batched mapInPandas. "
     "The oracle recomputes the planted dimensions relationally, so a "
     "hash match proves the parser actually decoded the bytes. "
     "Scale: stays Arrow-batched end to end, no driver collect; a "
     "full pixel decoder swaps into the same batch function.")
def k6_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = image_table(spark, sf_dir)
    return m.mapInPandas(decode_image_batch, DECODED_SCHEMA).select(
        "doc_id", "format", "width", "height"
    )


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


AUDIO_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_us", T.LongType()),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_abs_amp", T.LongType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload) where payload is a VALID PCM WAV
    file (stdlib ``wave`` opens it) with planted sample-rate/channels/
    frame-count from doc_id (pipeline/imaging.py synth_wav)."""
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import synth_wav

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: synth_wav(int(d)))

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", synth("doc_id").alias("payload"))


def decode_audio_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched audio decode: walks the RIFF chunk list in the
    payload BYTES (pure-python parse_wav) for sample rate / channels /
    bit depth / frame count; unparseable payloads yield NULLs. A full
    sample decoder (soundfile/librosa) swaps in with the same
    signature, schema, and batching."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_wav

    for pdf in batches:
        decoded = [parse_wav(r) for r in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "format": ["wav" if d else None for d in decoded],
                "sample_rate": [d[0] if d else None for d in decoded],
                "channels": [d[1] if d else None for d in decoded],
                "bits": [d[2] if d else None for d in decoded],
                "n_frames": [d[3] if d else None for d in decoded],
                "duration_us": [
                    d[3] * 1000000 // d[0] if d else None for d in decoded
                ],
            }
        )


def audio_features_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio featurizer over the REAL decoded PCM stream: parses the
    WAV header, slices the data chunk at the parsed offsets, and
    computes amplitude/zero-crossing features from the actual 16-bit
    samples. A spectral featurizer (librosa) swaps in with the same
    signature and schema."""
    import struct as _struct

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_wav

    for pdf in batches:
        feats = []
        for raw in pdf["payload"]:
            parsed = parse_wav(raw)
            if parsed is None:
                feats.append((None, None, None))
                continue
            data_off = raw.find(b"data") + 8
            (data_size,) = _struct.unpack("<I", raw[data_off - 4:data_off])
            n = data_size // 2
            wave = _struct.unpack(f"<{n}h", raw[data_off:data_off + data_size])
            # the EXACT integer moments cross the UDF boundary; the
            # float mean is derived Spark-side (r6 pattern) so the
            # query is oracle-hash-checkable - Python's round() is
            # half-even, the engines' ROUND is half-away
            sum_abs = sum(abs(w) for w in wave)
            zc = sum(
                1 for i in range(1, n) if (wave[i - 1] < 0) != (wave[i] < 0)
            )
            feats.append((n, sum_abs, zc))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_samples": [f[0] for f in feats],
                "sum_abs_amp": [f[1] for f in feats],
                "zero_crossings": [f[2] for f in feats],
            }
        )


@register("k6c_audio_decode", "K6", """
SELECT doc_id,
       'wav' AS format,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
            WHEN 1 THEN 16000 ELSE 44100 END AS sample_rate,
       CAST(doc_id % 2 + 1 AS INT) AS channels,
       16 AS bits,
       CAST(doc_id % 100 + 10 AS INT) AS n_frames,
       CAST((doc_id % 100 + 10) * 1000000
            // (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
                     WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT)
         AS duration_us
FROM documents
""", "REAL audio decode over binary columns (the former stub, "
     "de-stubbed like k6_image_decode): payloads are valid PCM WAV "
     "files - stdlib wave.open accepts them, pinned in "
     "tests/test_imaging.py - synthesized with sample-rate/channels/"
     "frame-count planted from doc_id, and the operator walks the "
     "RIFF chunk list IN THE BYTES to recover them plus the derived "
     "duration. The oracle recomputes the planted parameters "
     "relationally, so a hash match proves the parser decoded the "
     "bytes. Arrow-batched mapInPandas end to end, no driver "
     "collect; a full sample decoder swaps into the same batch fn.")
def k6c_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = audio_table(spark, sf_dir)
    return a.mapInPandas(decode_audio_batch, AUDIO_DECODED_SCHEMA)


@register("k6d_audio_features", "K6", """
WITH dims AS (
  SELECT doc_id,
         CAST((doc_id % 100 + 10) * (doc_id % 2 + 1) AS INT) AS n
  FROM documents
),
s AS (
  SELECT d.doc_id, d.n, i.i,
         ((d.doc_id * 31 + i.i * 97) % 65536) - 32768 AS w,
         ((d.doc_id * 31 + (i.i - 1) * 97) % 65536) - 32768 AS wprev
  FROM dims d
  JOIN (SELECT UNNEST(RANGE(0, 218)) AS i) i ON i.i < d.n
)
SELECT doc_id, n AS n_samples,
       CAST(SUM(ABS(w)) AS BIGINT) AS sum_abs_amp,
       CAST(SUM(CASE WHEN i > 0 AND ((wprev < 0) <> (w < 0))
                     THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
       ROUND(CAST(SUM(ABS(w)) AS DOUBLE) / n, 6) AS mean_amp
FROM s GROUP BY doc_id, n
""", "Audio features from the REAL decoded PCM stream - upgraded "
     "from rows-only to ORACLE-HASH-CHECKED: the batch fn slices the "
     "WAV data chunk at parsed offsets and returns the EXACT integer "
     "moments (sum of |amplitude|, zero-crossing count); the float "
     "mean derives Spark-side under the r6 rule. The oracle "
     "re-derives the planted 16-bit samples relationally, so the "
     "hash match proves the featurizer read every sample. A "
     "spectral featurizer (librosa) swaps in with the same batch "
     "signature.")
def k6d_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = audio_table(spark, sf_dir).select("doc_id", "payload")
    out = a.mapInPandas(audio_features_batch, AUDIO_SCHEMA)
    return out.select(
        "doc_id", "n_samples", "sum_abs_amp", "zero_crossings",
        F.round(F.col("sum_abs_amp").cast("double") / F.col("n_samples"), 6)
        .alias("mean_amp"),
    )


PIXEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def decode_pixel_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched FULL pixel decode: zlib-inflate the IDAT stream,
    unfilter every scanline (all five PNG filter types), and reduce
    the recovered pixel array to per-channel means. Pure python +
    stdlib zlib - no PIL, no stub."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png_pixels,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_png_pixels(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            w, h, ch, px = d
            n = w * h
            means = [sum(px[c::ch]) / n for c in range(ch)]
            if ch == 1:
                means = means * 3
            rows.append((int(doc_id), w, h, *means))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height",
                           "mean_r", "mean_g", "mean_b"])


@register("k6e_png_pixel_decode", "K6", """
SELECT doc_id,
       16 AS width, 16 AS height,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_r,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_g,
       CAST(56.25 AS DOUBLE) AS mean_b
FROM documents
""", "FULL pixel-level image decode (K6 de-stubbed to the pixel "
     "level for PNG): payloads are real 8-bit RGB PNGs whose pixels "
     "are planted from doc_id and whose scanlines rotate through ALL "
     "FIVE PNG filter types; the operator inflates the IDAT stream "
     "(stdlib zlib IS the PNG codec), unfilters every scanline "
     "(Sub/Up/Average/Paeth math), and reduces the recovered pixels "
     "to channel means inside an Arrow-batched mapInPandas. The "
     "oracle recomputes the planted means analytically, so the hash "
     "match proves BYTE-EXACT pixel recovery - one wrong unfilter "
     "shifts every mean. Means are exact .25/.5 fractions (sums of "
     "ints / 256), so cross-engine float hashing is sound. JPEG "
     "pixel decode (DCT) remains out of scope, documented in "
     "NEXT_STEPS.")
def k6e_png_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        png_rgb_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: png_rgb_bytes(16, 16, int(d) % 200))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_pixel_batch, PIXEL_SCHEMA)


JPEG_PIXEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_gray", T.DoubleType()),
])


def decode_jpeg_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched baseline-JPEG pixel decode: marker parse, Huffman
    tables from the stream, entropy decode, dequant, 2D IDCT."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_gray_jpeg,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_gray_jpeg(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None))
                continue
            w, h, px = d
            rows.append((int(doc_id), w, h, sum(px) / (w * h)))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "mean_gray"])


@register("k6f_jpeg_pixel_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 176 AS DOUBLE) + 40.0 AS mean_gray
FROM documents
""", "FULL baseline-JPEG pixel decode, pure python (K6's last pixel "
     "gap closed for the sequential-grayscale profile): payloads are "
     "conforming SOF0 JPEGs - real DQT/DHT/SOS segments, canonical "
     "Huffman tables declared in the stream, byte-stuffed entropy "
     "data - with DC-only planted blocks (Q[0]=8 makes the constant "
     "block value round-trip BIT-EXACTLY through quantize/dequant/"
     "IDCT). The decoder is general (the AC run-length + ZRL + EOB "
     "path and the separable IDCT are verified against a reference "
     "O(n^4) DCT on random coefficient blocks in tests); the oracle "
     "recomputes the planted block means analytically, so the hash "
     "match proves the Huffman decode, dequantization, and IDCT "
     "scale are all exactly right. Progressive/chroma profiles are "
     "rejected, not guessed (documented).")
def k6f_jpeg_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_gray_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: planted_gray_jpeg(16, 16, int(d) % 176))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_batch, JPEG_PIXEL_SCHEMA)


@register("k6p_gif_interlaced_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 220 AS DOUBLE) + 15.0 AS mean_r,
       240.0 - CAST(doc_id % 220 AS DOUBLE) AS mean_g,
       CAST(doc_id % 220 AS DOUBLE) + 14.5 AS mean_b
FROM documents
""", "INTERLACED GIF pixel decode: the same genuinely-LZW-compressed "
     "planted frames as k6g but with the descriptor's interlace flag "
     "set and rows written in GIF's 4-pass order (0 mod 8, 4 mod 8, "
     "2 mod 4, odd) - the decoder must de-interlace after "
     "decompression or every row lands in the wrong place and all "
     "three analytic channel means move. Odd-height pass boundaries "
     "are pinned in test_imaging.py. Same batch plumbing as k6g; "
     "decode_gif_pixels handles the flag itself.")
def k6p_gif_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        gif_indexed_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: gif_indexed_bytes(16, 16, int(d) % 220,
                                        interlaced=True))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_gif_batch, PIXEL_SCHEMA)


@register("k6o_png_interlaced_decode", "K6", """
SELECT doc_id,
       16 AS width, 16 AS height,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_r,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_g,
       CAST(56.25 AS DOUBLE) AS mean_b
FROM documents
""", "Adam7-INTERLACED PNG pixel decode - the web's progressive-PNG "
     "profile, previously rejected. Payloads carry the same planted "
     "pixels as k6e but split across the seven Adam7 passes, each "
     "pass independently filtered (rotating all five types within "
     "the pass), so the decoder must walk every pass geometry, "
     "unfilter each sub-image against its OWN previous row, and "
     "de-interlace - a single wrong pass origin leaves pixels "
     "uncovered and every channel mean moves. Odd geometries (empty "
     "and single-pixel passes) are pinned in test_imaging.py. Same "
     "Arrow-batched plumbing + channel-mean reducer as k6e; "
     "decode_png_pixels dispatches interlace=1 itself.")
def k6o_png_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        png_interlaced_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: png_interlaced_bytes(16, 16, int(d) % 200))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_pixel_batch, PIXEL_SCHEMA)


@register("k6m_jpeg_progressive_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 176 AS DOUBLE) + 40.0 AS mean_gray
FROM documents
""", "PROGRESSIVE (SOF2) JPEG pixel decode - the profile VERDICT r4 "
     "named the K6 decoder's most visible remaining gap. Payloads "
     "are conforming 5-scan progressive streams (DC first at point "
     "transform 1, DC successive-approximation refinement, two AC "
     "spectral-selection band scans, AC refinement) of the same "
     "DC-only planted blocks as k6f, so the analytic oracle mean "
     "only survives if shifted-DC accumulation, refinement-bit OR, "
     "and EOBRUN skipping across every scan are all exactly right. "
     "The AC insertion/correction machinery (non-zero bands) is "
     "cross-checked against the baseline decoder on random "
     "coefficient blocks in tests/test_imaging.py. Same mapInPandas "
     "plumbing as k6f; decode_gray_jpeg dispatches SOF2 itself.")
def k6m_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_gray_progressive_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: planted_gray_progressive_jpeg(16, 16, int(d) % 176))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_batch, JPEG_PIXEL_SCHEMA)


@register("k6l_png_palette_decode", "K6", """
WITH grid AS (SELECT x, y FROM RANGE(16) r1(x), RANGE(16) r2(y)),
m AS (
  SELECT d.doc_id, (d.doc_id % 210) + g.x + 2 * g.y AS p
  FROM documents d CROSS JOIN grid g
)
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(SUM(p) AS DOUBLE) / 256 AS mean_r,
       CAST(SUM(255 - p) AS DOUBLE) / 256 AS mean_g,
       CAST(SUM(p // 2) AS DOUBLE) / 256 AS mean_b
FROM m GROUP BY doc_id
""", "Palette (indexed-color, type 3) PNG pixel decode - the common "
     "web-PNG profile k6e's grey/RGB decoder still rejected. "
     "Payloads are real palette PNGs: PLTE entry p = (p, 255-p, "
     "p//2), planted index seed+x+2y (seed = doc_id % 210 keeps "
     "every index wrap-free), scanlines rotating all five filters "
     "over the INDEX stream (per spec, filtering precedes palette "
     "mapping - decoding in the wrong order corrupts every non-None "
     "filter row). The oracle recomputes the exact channel means "
     "over the planted 16x16 grid (sums of ints / 256 - dyadic, "
     "bit-exact on both engines). Same Arrow-batched mapInPandas "
     "plumbing + generic channel-mean reducer as k6e.")
def k6l_png_palette_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        png_palette_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: png_palette_bytes(16, 16, int(d) % 210))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_pixel_batch, PIXEL_SCHEMA)


@register("k6k_jpeg_restart_decode", "K6", """
SELECT doc_id, 24 AS width, 24 AS height,
       CAST(doc_id % 130 AS DOUBLE) + 60.0 AS mean_gray
FROM documents
""", "Baseline-JPEG decode of DRI/RSTn restart-marker streams - the "
     "most common real-world camera-JPEG feature the r4 decoder "
     "still rejected (VERDICT r4 #7). Payloads are conforming 24x24 "
     "grayscale JPEGs declaring DRI=2: RST0..RSTn markers sit every "
     "2 MCUs, so the decoder must byte-realign, check the marker "
     "index sequence, and RESET the DC predictor at each one. The "
     "planted per-block values ramp by +8 per block, so a decoder "
     "that kept the predictor across a marker (or mis-aligned by "
     "even one bit) shifts every post-marker block and the analytic "
     "mean_gray = doc_id % 130 + 60 hash fails. Same Arrow-batched "
     "mapInPandas plumbing as k6f; cites jpeg_codec.decode_gray_jpeg "
     "restart handling.")
def k6k_jpeg_restart_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_gray_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: planted_gray_jpeg(24, 24, int(d) % 130,
                                        restart_interval=2))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_batch, JPEG_PIXEL_SCHEMA)


def decode_gif_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched FULL GIF pixel decode: sub-block walk, real LZW
    decompression (string-table reconstruction, KwKwK, CLEAR resets,
    growing code widths), palette mapping, channel-mean reduction.
    Pure python - no PIL, no stub."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_gif_pixels,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_gif_pixels(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            w, h, px = d
            n = w * h
            rows.append((int(doc_id), w, h,
                         sum(px[0::3]) / n, sum(px[1::3]) / n,
                         sum(px[2::3]) / n))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height",
                           "mean_r", "mean_g", "mean_b"])


@register("k6g_gif_pixel_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 220 AS DOUBLE) + 15.0 AS mean_r,
       240.0 - CAST(doc_id % 220 AS DOUBLE) AS mean_g,
       CAST(doc_id % 220 AS DOUBLE) + 14.5 AS mean_b
FROM documents
""", "FULL GIF pixel decode (the third real image codec beside PNG "
     "and baseline JPEG): payloads are conforming GIF89a files whose "
     "index stream is GENUINELY LZW-compressed (variable-width "
     "codes, CLEAR/EOI, table growth - not the uncompressed-GIF "
     "shortcut), so recovering the planted channel means requires a "
     "working decompressor with string-table reconstruction "
     "including the KwKwK case (tested round-trip on random streams "
     "past the 12-bit reset). Palette entry i = (i, 255-i, i&~1) "
     "makes the means analytic in the seed; mean_b's exact .5 "
     "offset comes from the half-odd-index parity of the planted "
     "grid - one wrong LZW entry shifts all three. Interlaced and "
     "local-palette frames are rejected, not guessed.")
def k6g_gif_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        gif_indexed_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: gif_indexed_bytes(16, 16, int(d) % 220))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_gif_batch, PIXEL_SCHEMA)


MP4_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("timescale", T.IntegerType()),
    T.StructField("duration_s", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def parse_mp4_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched ISO-BMFF box walk (ftyp/moov/trak recursion,
    32/64-bit size forms, version 0/1 full boxes)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_mp4

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            p = parse_mp4(raw)
            if p is None:
                rows.append((int(doc_id), None, None, None, None))
                continue
            ts, dur, w, h = p
            rows.append((int(doc_id), ts, dur // ts if ts else None, w, h))
        yield pd.DataFrame(
            rows, columns=["doc_id", "timescale", "duration_s",
                           "width", "height"])


@register("k6h_mp4_box_parse", "K6", """
SELECT doc_id,
       CAST(1000 + doc_id % 9000 AS INT) AS timescale,
       CAST(doc_id % 120 + 1 AS BIGINT) AS duration_s,
       CAST(320 + (doc_id % 5) * 320 AS INT) AS width,
       CAST(180 + (doc_id % 5) * 180 AS INT) AS height
FROM documents
""", "Video-container metadata tier (K6): payloads are conforming "
     "ISO-BMFF (MP4) files - correct box-size chains, moov/trak "
     "recursion, version-0 mvhd/tkhd per ISO/IEC 14496-12 - and the "
     "operator walks the box tree in an Arrow-batched mapInPandas "
     "(32- and 64-bit size forms, malformed chains rejected), "
     "recovering the planted movie timescale, duration, and 16.16 "
     "fixed-point track dimensions. The oracle recomputes the "
     "planted values analytically, so the hash match proves the "
     "walker reads the BYTES - same proof pattern as the image "
     "codecs. Frame-level decode stays out of scope (no codec libs "
     "in the container), exactly as NEXT_STEPS documents.")
def k6h_mp4_box_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import mp4_bytes

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            return mp4_bytes(1000 + d % 9000, d % 120 + 1,
                             320 + (d % 5) * 320, 180 + (d % 5) * 180)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(parse_mp4_batch, MP4_SCHEMA)


EXIF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("orientation", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("make", T.StringType()),
    T.StructField("byte_order", T.StringType()),
])


def parse_exif_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched EXIF read: JPEG marker scan -> APP1 -> TIFF
    byte-order dispatch -> IFD0 walk (inline + offset values)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import parse_exif

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            p = parse_exif(raw)
            if p is None:
                rows.append((int(doc_id), None, None, None, None))
                continue
            o, w, make, bo = p
            rows.append((int(doc_id), o, w, make, bo))
        yield pd.DataFrame(
            rows, columns=["doc_id", "orientation", "width", "make",
                           "byte_order"])


@register("k6i_exif_parse", "K6", """
SELECT doc_id,
       CAST(doc_id % 8 + 1 AS INT) AS orientation,
       CAST(640 + doc_id % 1280 AS INT) AS width,
       'CAM' || CAST(doc_id % 10 AS VARCHAR) AS make,
       CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END AS byte_order
FROM documents
""", "EXIF metadata read (the strip-or-read-EXIF step of every image "
     "ingest pipeline): payloads are JPEGs whose APP1 segment carries "
     "a conforming TIFF block per EXIF 2.3, and the corpus ALTERNATES "
     "byte order (II little / MM big by doc parity) so the IFD walker "
     "must genuinely dispatch on the byte-order mark - orientation "
     "lives in the endianness-sensitive first two value bytes of a "
     "SHORT entry, Make resolves through a data-pointer offset, "
     "ImageWidth is an inline LONG. The oracle recomputes the "
     "planted values analytically; a single-endianness shortcut "
     "fails half the corpus.")
def k6i_exif_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        exif_jpeg_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            return exif_jpeg_bytes(d % 8 + 1, 640 + d % 1280,
                                   f"CAM{d % 10}", bool(d % 2))
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(parse_exif_batch, EXIF_SCHEMA)


def decode_jpeg_color_batch(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched full-color baseline-JPEG decode (4:2:0 MCUs,
    per-component tables, chroma upsample, BT.601)."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_ycbcr420_jpeg,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_ycbcr420_jpeg(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            w, h, px = d
            n = w * h
            rows.append((int(doc_id), w, h,
                         sum(px[0::3]) / n, sum(px[1::3]) / n,
                         sum(px[2::3]) / n))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height",
                           "mean_r", "mean_g", "mean_b"])


@register("k6j_jpeg_chroma_decode", "K6", """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 180 + 38 AS DOUBLE) AS y0,
         CAST(doc_id % 120 + 68 AS DOUBLE) - 128.0 AS cb,
         CAST(doc_id % 140 + 58 AS DOUBLE) - 128.0 AS cr
  FROM documents
)
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.402 * cr + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_r,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 - 0.344136 * cb - 0.714136 * cr + 0.5)
                 AS BIGINT))) AS DOUBLE) AS mean_g,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.772 * cb + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_b
FROM p
""", "FULL-COLOR baseline-JPEG decode - the 4:2:0 chroma profile "
     "NEXT_STEPS had documented as rejected is now decoded for real: "
     "interleaved MCUs (4 luma + Cb + Cr), SEPARATE Huffman table "
     "slots per component (the stream declares luma in slot 0 and "
     "chroma in slot 1, so a single-table shortcut cannot decode "
     "it), per-component DC predictors and quant tables, chroma "
     "upsampling, and BT.601 YCbCr->RGB with half-up rounding "
     "pinned identically in the oracle's FLOOR(x+0.5). Planted "
     "constants make every recovered pixel analytic - one wrong "
     "table dispatch, predictor, or color coefficient shifts all "
     "three channel means. Progressive color streams dispatch to the SOF2 decoder (k6n).")
def k6j_jpeg_chroma_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_ycbcr420_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            return planted_ycbcr420_jpeg(
                16, 16, d % 180 + 38, d % 120 + 68, d % 140 + 58)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_color_batch, PIXEL_SCHEMA)


@register("k6n_jpeg_progressive_chroma_decode", "K6", """
WITH p AS (
  SELECT doc_id,
         CAST(doc_id % 180 + 38 AS DOUBLE) AS y0,
         CAST(doc_id % 120 + 68 AS DOUBLE) - 128.0 AS cb,
         CAST(doc_id % 140 + 58 AS DOUBLE) - 128.0 AS cr
  FROM documents
)
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.402 * cr + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_r,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 - 0.344136 * cb - 0.714136 * cr + 0.5)
                 AS BIGINT))) AS DOUBLE) AS mean_g,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.772 * cb + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_b
FROM p
""", "PROGRESSIVE COLOR JPEG decode: the same planted 4:2:0 constants "
     "as k6j shipped as a 7-scan SOF2 stream - interleaved DC first "
     "scan in MCU order with per-component predictors AND Huffman "
     "slots, interleaved DC refinement bits, then per-component AC "
     "band scans and a Y refinement. The analytic oracle means only "
     "survive if the multi-component progressive machinery composes "
     "exactly with the 4:2:0 upsample + BT.601 path; dense-AC color "
     "streams are cross-checked against the baseline color decoder "
     "in tests/test_imaging.py. decode_ycbcr420_jpeg dispatches SOF2 "
     "itself - one decode entry point per profile family.")
def k6n_jpeg_progressive_chroma_decode(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_ycbcr420_progressive_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            return planted_ycbcr420_progressive_jpeg(
                16, 16, d % 180 + 38, d % 120 + 68, d % 140 + 58)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_color_batch, PIXEL_SCHEMA)


BMP_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def decode_bmp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched BMP pixel decode: DIB header walk, bottom-up row
    order, 4-byte row padding, BI_RGB 24-bit AND BI_RLE8 8-bit with
    both RLE modes and both escape codes (pipeline/imaging.py)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_bmp_pixels,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_bmp_pixels(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            w, h, px = d
            n = w * h
            rows.append((int(doc_id), w, h,
                         sum(p[0] for p in px) / n,
                         sum(p[1] for p in px) / n,
                         sum(p[2] for p in px) / n))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "width", "height", "mean_r", "mean_g", "mean_b"])


@register("k6q_bmp_pixel_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_r,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_g,
       CASE WHEN doc_id % 2 = 0 THEN 112.5
            ELSE CAST(doc_id % 200 AS DOUBLE) + 7.5 END AS mean_b
FROM documents
""", "BMP pixel decode, BOTH storage profiles: even docs are 24-bit "
     "BI_RGB (bottom-up rows, 4-byte padding, BGR byte order), odd "
     "docs are 8-bit BI_RLE8 over a grayscale palette with each row "
     "split between ABSOLUTE mode (word-aligned literal blocks) and "
     "unit runs plus both escape codes - the complete RLE8 state "
     "machine. Pixels are planted from doc_id; the oracle recomputes "
     "the channel means analytically, so one wrong pad byte, row "
     "flip, or RLE mode shifts a mean and breaks the hash. Means "
     "are exact .5 fractions (sums of ints / 256) - cross-engine "
     "float-safe. Arrow-batched mapInPandas, no driver round-trip.")
def k6q_bmp_pixel_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        bmp_rgb_bytes, bmp_rle8_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: bmp_rgb_bytes(16, 16, int(d) % 200) if d % 2 == 0
            else bmp_rle8_bytes(16, 16, int(d) % 200))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_bmp_batch, BMP_SCHEMA)


G711_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("codec", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sum_pcm", T.LongType()),
    T.StructField("min_pcm", T.IntegerType()),
    T.StructField("max_pcm", T.IntegerType()),
])


def decode_g711_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched G.711 expand: RIFF walk, audio_format dispatch
    (7 = mu-law, 6 = A-law), per-code-word segment/mantissa expansion
    to linear PCM (pipeline/imaging.py)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_g711_wav,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_g711_wav(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            name, pcm = d
            rows.append((int(doc_id), name, len(pcm), sum(pcm),
                         min(pcm), max(pcm)))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "codec", "n_samples", "sum_pcm",
            "min_pcm", "max_pcm"])


@register("k6r_g711_audio_decode", "K6", """
WITH i AS (SELECT UNNEST(RANGE(0, 200)) AS i),
codes AS (
  SELECT d.doc_id, CAST((d.doc_id + i.i * 7 + 3) % 256 AS INT) AS b
  FROM documents d, i
),
dec AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN
           CASE WHEN ((255 - b) & 128) = 128
             THEN 132 - ((((255 - b) & 15) * 8 + 132)
                         * (1 << (((255 - b) & 112) // 16)))
             ELSE ((((255 - b) & 15) * 8 + 132)
                   * (1 << (((255 - b) & 112) // 16))) - 132
           END
         ELSE
           CASE WHEN (xor(b, 85) & 128) = 128 THEN 1 ELSE -1 END *
           CASE (xor(b, 85) & 112) // 16
             WHEN 0 THEN (xor(b, 85) & 15) * 16 + 8
             WHEN 1 THEN (xor(b, 85) & 15) * 16 + 264
             ELSE ((xor(b, 85) & 15) * 16 + 264)
                  * (1 << ((xor(b, 85) & 112) // 16 - 1))
           END
         END AS pcm
  FROM codes
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
       200 AS n_samples,
       CAST(SUM(pcm) AS BIGINT) AS sum_pcm,
       CAST(MIN(pcm) AS INT) AS min_pcm,
       CAST(MAX(pcm) AS INT) AS max_pcm
FROM dec GROUP BY doc_id
""", "G.711 mu-law/A-law audio decode - the telephony companding "
     "codecs (WAV audio_format 7/6) expanded to linear PCM with the "
     "public-spec segment/mantissa integer arithmetic. Even docs "
     "carry mu-law, odd docs A-law; 200 code words per doc planted "
     "from doc_id. The ORACLE RE-DERIVES THE EXPANSION FORMULAS IN "
     "SQL (bit ops over the planted code stream), so the hash match "
     "proves the decoder implements exactly the G.711 transfer "
     "function - sum/min/max of the PCM are pure integers, no float "
     "hazard at all. Decode runs in Arrow-batched mapInPandas over "
     "the RIFF container, same shape as every K6 codec.")
def k6r_g711_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        g711_wav_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            codes = bytes((d + i * 7 + 3) % 256 for i in range(200))
            return g711_wav_bytes(7 if d % 2 == 0 else 6, 8000, codes)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_g711_batch, G711_SCHEMA)


TIFF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_order", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_strips", T.IntegerType()),
    T.StructField("mean_gray", T.DoubleType()),
])


def decode_tiff_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched baseline-TIFF decode: IFD walk in either byte
    order, strip offset/count array resolution, raster reassembly
    (pipeline/imaging.py)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_tiff_gray,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_tiff_gray(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            bo, w, h, n_strips, px = d
            rows.append((int(doc_id), bo, w, h, n_strips,
                         sum(px) / (w * h)))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "byte_order", "width", "height", "n_strips",
            "mean_gray"])


@register("k6s_tiff_strip_decode", "K6", """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
       16 AS width, 16 AS height, 4 AS n_strips,
       CAST(doc_id % 200 AS DOUBLE) + 7.5 AS mean_gray
FROM documents
""", "Baseline TIFF decode with MULTI-STRIP reassembly in BOTH byte "
     "orders: even docs little-endian (II), odd big-endian (MM); "
     "each file stores the 16x16 gray raster as four 4-row strips "
     "whose StripOffsets/StripByteCounts live in out-of-line LONG "
     "arrays the IFD entries point at - the part of TIFF that EXIF "
     "walking (k6i) never touches. Pixels planted from doc_id; the "
     "oracle recomputes the mean analytically, so a byte-order slip "
     "or mis-ordered strip breaks the hash. Means are exact .5 "
     "fractions; Arrow-batched mapInPandas.")
def k6s_tiff_strip_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        tiff_gray_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: tiff_gray_bytes(16, 16, int(d) % 200,
                                      big_endian=bool(d % 2)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_tiff_batch, TIFF_SCHEMA)


IMA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sum_pcm", T.LongType()),
    T.StructField("min_pcm", T.IntegerType()),
    T.StructField("max_pcm", T.IntegerType()),
])


def decode_ima_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched IMA ADPCM decode: RIFF walk, format-0x11 block
    parse (header predictor + step index), one integer IMA step per
    nibble (pipeline/imaging.py)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_ima_adpcm_wav,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            pcm = decode_ima_adpcm_wav(raw)
            if pcm is None:
                rows.append((int(doc_id), None, None, None, None))
                continue
            rows.append((int(doc_id), len(pcm), sum(pcm),
                         min(pcm), max(pcm)))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "n_samples", "sum_pcm", "min_pcm", "max_pcm"])


def _ima_oracle_sql() -> str:
    """The IMA decode re-derived as a DuckDB RECURSIVE CTE: the
    (predictor, step_index) state machine advances one sample per
    recursion level across ALL docs at once, joined to the 89-entry
    step table; the planted nibble stream is a closed-form expression
    of (doc_id, i) on both sides. A hash match therefore proves the
    mapInPandas decoder implements the exact IMA transfer function -
    including both clamps, which the planted stream saturates."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        IMA_STEP_TABLE,
    )

    steptab = ",".join(f"({i},{s})" for i, s in enumerate(IMA_STEP_TABLE))
    nib = "((d.doc_id + 5 * d.i + 1) % 16)"
    diff = (f"((s.step >> 3)"
            f" + CASE WHEN ({nib} & 4) > 0 THEN s.step ELSE 0 END"
            f" + CASE WHEN ({nib} & 2) > 0 THEN (s.step >> 1) ELSE 0 END"
            f" + CASE WHEN ({nib} & 1) > 0 THEN (s.step >> 2) ELSE 0 END)")
    pred = (f"LEAST(GREATEST(CASE WHEN ({nib} & 8) > 0"
            f" THEN d.pred - {diff} ELSE d.pred + {diff} END,"
            f" -32768), 32767)")
    idx = (f"LEAST(GREATEST(d.idx + CASE ({nib} & 7)"
           f" WHEN 4 THEN 2 WHEN 5 THEN 4 WHEN 6 THEN 6 WHEN 7 THEN 8"
           f" ELSE -1 END, 0), 88)")
    return f"""
WITH RECURSIVE steptab(idx, step) AS (VALUES {steptab}),
init AS (
  SELECT doc_id,
         CAST((doc_id * 37) % 4001 - 2000 AS INT) AS pred,
         CAST(doc_id % 89 AS INT) AS idx
  FROM documents
),
dec AS (
  SELECT doc_id, 0 AS i, pred, idx FROM init
  UNION ALL
  SELECT d.doc_id, d.i + 1, {pred} AS pred, {idx} AS idx
  FROM dec d JOIN steptab s ON s.idx = d.idx
  WHERE d.i < 64
)
SELECT doc_id, COUNT(*) AS n_samples, CAST(SUM(pred) AS BIGINT) AS sum_pcm,
       CAST(MIN(pred) AS INT) AS min_pcm, CAST(MAX(pred) AS INT) AS max_pcm
FROM dec GROUP BY doc_id
"""


@register("k6s_ima_adpcm_decode", "K6", _ima_oracle_sql(),
          "IMA ADPCM audio decode (WAV format tag 0x11) - the first "
          "STATEFUL codec in the K6 tier: every sample depends on the "
          "(predictor, step_index) carried from the previous one, so "
          "unlike G.711 the transfer function cannot be expressed "
          "per-code-word. Each doc plants a 64-nibble stream + block "
          "header derived from doc_id; the decoder parses the real "
          "RIFF container (fmt extension, fact chunk, block header, "
          "low-nibble-first packing) in Arrow-batched mapInPandas. "
          "The oracle re-derives the whole state machine as a "
          "RECURSIVE CTE over the step table - 65 levels, all docs "
          "advanced per level - so the hash match proves bit-exact "
          "IMA semantics including both saturation clamps. "
          "Per-blob decode parallelizes embarrassingly at 100 TB; "
          "state never crosses a blob boundary.")
def k6s_ima_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        ima_adpcm_wav_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            nibbles = bytes((d + 5 * i + 1) % 16 for i in range(64))
            return ima_adpcm_wav_bytes(
                8000, (d * 37) % 4001 - 2000, d % 89, nibbles)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_ima_batch, IMA_SCHEMA)


PNG16_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sum_sample", T.LongType()),
    T.StructField("min_sample", T.IntegerType()),
    T.StructField("max_sample", T.IntegerType()),
])


def decode_png16_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 16-bit PNG decode: inflate, byte-wise unfilter
    with bpp=2, big-endian sample reassembly (pipeline/imaging.py)."""
    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        decode_png16_pixels,
    )

    for pdf in batches:
        rows = []
        for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
            d = decode_png16_pixels(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None, None, None))
                continue
            w, h, samples = d
            rows.append((int(doc_id), w, h, sum(samples),
                         min(samples), max(samples)))
        yield pd.DataFrame(rows, columns=[
            "doc_id", "width", "height", "sum_sample",
            "min_sample", "max_sample"])


@register("k6t_png16_decode", "K6", """
WITH dims AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS INT) AS width,
         CAST(6 + doc_id % 4 AS INT) AS height
  FROM documents
),
px AS (
  SELECT d.doc_id, d.width, d.height,
         (d.doc_id * 7919 + y.y * d.width + x.x * 31) % 65536 AS s
  FROM dims d
  JOIN (SELECT UNNEST(RANGE(0, 12)) AS y) y ON y.y < d.height
  JOIN (SELECT UNNEST(RANGE(0, 13)) AS x) x ON x.x < d.width
)
SELECT doc_id, width, height,
       CAST(SUM(s) AS BIGINT) AS sum_sample,
       CAST(MIN(s) AS INT) AS min_sample,
       CAST(MAX(s) AS INT) AS max_sample
FROM px GROUP BY doc_id, width, height
""", "16-bit grayscale PNG decode (bit depth 16, color 0) - closing "
     "a previously rejected-not-guessed PNG profile. Depth 16 is the "
     "profile where byte-level filtering and SAMPLE width diverge: "
     "the five scanline filters run over BYTES with a 2-byte pixel "
     "offset and the u16 samples reassemble big-endian only AFTER "
     "unfiltering - an implementation that filtered per-sample would "
     "decode garbage. Each doc plants width/height/samples from "
     "doc_id with row filter (seed+y)%5 (all five filters exercised "
     "against the 2-byte unit); the oracle re-derives the planted "
     "samples relationally, so the hash match proves the decoder "
     "recovered every 16-bit value bit-exactly. Arrow-batched "
     "mapInPandas like every K6 codec.")
def k6t_png16_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.imaging import (
        png_gray16_bytes,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(lambda d: png_gray16_bytes(
            8 + int(d) % 5, 6 + int(d) % 4, int(d)))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_png16_batch, PNG16_SCHEMA)


SAMPLING_PIXEL_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sampling", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def decode_jpeg_sampling_batch(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched general-sampling baseline-JPEG decode: the
    decoder reads the SOF sampling factors from the stream and
    dispatches (4:4:4 / 4:2:2 / 4:4:0 inline; 4:2:0 to the dedicated
    profile decoder)."""
    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        decode_ycbcr_jpeg,
    )

    names = {(1, 1): "4:4:4", (2, 1): "4:2:2", (1, 2): "4:4:0",
             (2, 2): "4:2:0"}
    for pdf in batches:
        rows = []
        for doc_id, samp, raw in zip(pdf["doc_id"], pdf["samp"],
                                     pdf["payload"]):
            d = decode_ycbcr_jpeg(raw)
            if d is None:
                rows.append((int(doc_id), None, None, None,
                             None, None, None))
                continue
            w, h, px = d
            n = w * h
            hv = tuple(int(x) for x in samp.split(","))
            rows.append((int(doc_id), names[hv], w, h,
                         sum(px[0::3]) / n, sum(px[1::3]) / n,
                         sum(px[2::3]) / n))
        yield pd.DataFrame(
            rows, columns=["doc_id", "sampling", "width", "height",
                           "mean_r", "mean_g", "mean_b"])


@register("k6u_jpeg_subsampling_decode", "K6", """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN '4:4:4' WHEN 1 THEN '4:2:2'
              ELSE '4:4:0' END AS sampling,
         CAST(doc_id % 180 + 38 AS DOUBLE) AS y0,
         CAST(doc_id % 120 + 68 AS DOUBLE) - 128.0 AS cb,
         CAST(doc_id % 140 + 58 AS DOUBLE) - 128.0 AS cr
  FROM documents
)
SELECT doc_id, sampling, 16 AS width, 16 AS height,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.402 * cr + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_r,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 - 0.344136 * cb - 0.714136 * cr + 0.5)
                 AS BIGINT))) AS DOUBLE) AS mean_g,
       CAST(LEAST(255, GREATEST(0,
            CAST(FLOOR(y0 + 1.772 * cb + 0.5) AS BIGINT))) AS DOUBLE)
         AS mean_b
FROM p
""", "Baseline JPEG at the OTHER subsamplings - the gap k6j had "
     "documented as rejected: the corpus rotates through 4:4:4 (no "
     "subsampling), 4:2:2 (horizontal-only - the video/broadcast "
     "frame profile), and 4:4:0 (vertical-only) by doc parity, and "
     "ONE decoder reads the SOF sampling factors and adapts MCU "
     "geometry (h*v luma blocks + Cb + Cr), chroma plane dims, and "
     "the (h,v) upsampling - a hardcoded-4:2:0 shortcut decodes "
     "garbage on every stream here. Planted DC constants keep every "
     "recovered pixel analytic; the general decoder is additionally "
     "cross-checked bit-exact against the dedicated 4:2:0 path on "
     "its shared profile (test_imaging.py). Remaining rejected, not "
     "guessed: arithmetic coding, restarts inside progressive "
     "scans.")
def k6u_jpeg_subsampling_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_ycbcr_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        def mk(d: int) -> bytes:
            h, v = ((1, 1), (2, 1), (1, 2))[d % 3]
            return planted_ycbcr_jpeg(
                16, 16, h, v, d % 180 + 38, d % 120 + 68, d % 140 + 58)
        return doc_ids.map(lambda d: mk(int(d)))

    d = load_table(spark, sf_dir, "documents")
    samp = F.element_at(
        F.array(F.lit("1,1"), F.lit("2,1"), F.lit("1,2")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    payloads = d.select("doc_id", samp.alias("samp"),
                        synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_sampling_batch,
                                SAMPLING_PIXEL_SCHEMA)


@register("k6w_jpeg_progressive_restart_decode", "K6", """
SELECT doc_id, 16 AS width, 16 AS height,
       CAST(doc_id % 176 AS DOUBLE) + 40.0 AS mean_gray
FROM documents
""", "Restart markers INSIDE progressive scans - the last K6 "
     "rejection with a tractable spec (T.81: a DRI'd SOF2 stream "
     "carries RSTn every `interval` blocks in EVERY scan, each "
     "restart byte-realigning the entropy stream, resetting the DC "
     "predictor, and terminating any open EOB run, marker indexes "
     "cycling 0-7 per scan). Payloads are the same planted "
     "progressive streams as k6m but encoded with restart interval "
     "varying by doc parity (1, 2, or 3 blocks), so a decoder that "
     "ignores DRI in progressive mode desyncs immediately and one "
     "that forgets the EOBRUN reset mis-skips whole bands. The "
     "analytic oracle mean is k6m's; the restart path is additionally "
     "round-tripped against the no-restart decode on random "
     "coefficient blocks and checked for out-of-sequence-marker "
     "rejection in tests/test_imaging.py. Remaining rejected, not "
     "guessed: arithmetic coding.")
def k6w_jpeg_progressive_restart_decode(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from cassandra_elasticsearch_sync_spark.pipeline.jpeg_codec import (
        planted_gray_progressive_jpeg,
    )

    @pandas_udf(T.BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        return doc_ids.map(
            lambda d: planted_gray_progressive_jpeg(
                16, 16, int(d) % 176, restart_interval=int(d) % 3 + 1))

    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", synth("doc_id").alias("payload"))
    return payloads.mapInPandas(decode_jpeg_batch, JPEG_PIXEL_SCHEMA)
