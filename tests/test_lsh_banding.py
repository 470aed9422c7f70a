"""Parametric LSH banding on a PLANTED near-threshold corpus.

The corpus the driver checks has dup families at J>=0.9, where the
default 16x4 banding is effectively exact (miss prob 4e-8). This test
removes that corpus luck: it plants pairs at J~0.74 - right above the
0.7 threshold, where 16x4's per-pair recall is only ~0.997 - and shows
the b/r knob restores the exactness guarantee (32x2: miss prob ~1e-11
per pair).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.pipeline.dedup import (
    JACCARD_THRESHOLD,
    minhash_lsh_pairs,
)

# Planted geometry: |A| = |B| = 40 shingles, overlap 34
# -> J = 34 / (80 - 34) = 0.7391 (just above the 0.7 threshold).
SET_SIZE = 40
OVERLAP = 34
N_PAIRS = 60
N_NOISE = 80


def _planted_corpus(spark):
    rows = []
    tok = itertools.count()

    def fresh(n):
        return [f"s{next(tok)}" for _ in range(n)]

    for i in range(N_PAIRS):
        shared = fresh(OVERLAP)
        a_only = fresh(SET_SIZE - OVERLAP)
        b_only = fresh(SET_SIZE - OVERLAP)
        rows.append((2 * i, shared + a_only))
        rows.append((2 * i + 1, shared + b_only))
    for i in range(N_NOISE):
        rows.append((10_000 + i, fresh(SET_SIZE)))
    return spark.createDataFrame(rows, "doc_id bigint, sh array<string>")


def _brute_force(spark, sh):
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "j",
            F.col("i").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("i")),
        )
        .filter(F.col("j") >= JACCARD_THRESHOLD)
    )
    return {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}


def test_wide_banding_is_exact_at_near_threshold_jaccard(spark):
    sh = _planted_corpus(spark)
    want = _brute_force(spark, sh)
    assert len(want) == N_PAIRS  # the plant worked: exactly the 60 pairs

    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(sh, n_bands=32, rows_per_band=2).collect()
    }
    assert got == want


def test_verification_keeps_precision_under_any_banding(spark):
    """Even an aggressive banding (8 bands x 1 row: huge candidate
    volume) never emits a below-threshold pair - verification owns
    precision, banding only owns recall."""
    sh = _planted_corpus(spark)
    got = minhash_lsh_pairs(sh, n_bands=8, rows_per_band=1)
    assert got.filter(F.col("jaccard") < JACCARD_THRESHOLD).count() == 0
    # And every emitted pair really is a planted pair.
    planted = {(2 * i, 2 * i + 1) for i in range(N_PAIRS)}
    assert {(r["doc_a"], r["doc_b"]) for r in got.collect()} <= planted
