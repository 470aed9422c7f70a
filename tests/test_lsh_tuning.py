"""LSH tuning rule as code (pipeline/lsh_tuning.py, VERDICT r4 #5):
band width grows with log2(n), band count from the recall target, and
the derived params hold the candidate volume linear on a 200k-vector
planted corpus while keeping planted-pair recall exact."""

from __future__ import annotations

import math

import numpy as np
import pytest

from cassandra_elasticsearch_sync_spark.pipeline.lsh_tuning import (
    LshParams,
    minhash_lsh_params,
    recall_at,
    rp_lsh_params,
)
from cassandra_elasticsearch_sync_spark.pipeline.similarity import (
    _RP_SEED,
)

P_BIT_PLANTED = 1.0 - math.acos(0.994987) / math.pi  # ~0.96816


def test_width_grows_with_corpus_size():
    widths = [rp_lsh_params(n).width
              for n in (2_000, 200_000, 10_000_000, 10**9)]
    assert widths == sorted(widths) and widths[0] < widths[-1]
    rows = [minhash_lsh_params(n).width
            for n in (5_000, 100_000, 10_000_000, 10**9)]
    assert rows == sorted(rows) and rows[0] < rows[-1]


def test_recall_target_met_at_every_scale():
    for n in (2_000, 40_000, 400_000, 10**7):
        p = rp_lsh_params(n)
        assert recall_at(p, P_BIT_PLANTED) >= 1.0 - 1e-8
    for n in (5_000, 10**6, 10**9):
        p = minhash_lsh_params(n)
        assert recall_at(p, 0.9) >= 1.0 - 1e-6


def test_candidate_budget_held_at_every_scale():
    for n in (2_000, 400_000, 10**7, 10**9):
        p = rp_lsh_params(n)
        assert (n - 1) / 2 * p.bands * 0.5 ** p.width <= 0.5
    for n in (5_000, 10**7, 10**9):
        p = minhash_lsh_params(n)
        assert (n - 1) / 2 * p.bands * 0.05 ** p.width <= 0.5


def test_solver_reproduces_measured_operating_points():
    """The r4 decade probes measured 24-bit x ~30-band linear at a
    400k corpus (BENCH_NOTES); the shipped MinHash config is 16x4 at
    the 5k-doc corpus. The solver must land on the same operating
    points (within one band-count step) - i.e. it derives what was
    previously pinned by measurement."""
    rp = rp_lsh_params(400_000)
    assert rp.width == 24 and 28 <= rp.bands <= 34
    mh = minhash_lsh_params(5_000)
    assert mh.width == 4 and 12 <= mh.bands <= 18


def test_rejects_impossible_budget():
    with pytest.raises(ValueError):
        rp_lsh_params(10**9, candidate_budget=1e-12, max_bits=14)


def test_200k_vector_planted_corpus_linear_and_exact_recall():
    """VERDICT r4 #5 'done' criterion. 100k random 64-dim vectors plus
    100k planted near-dups (w = v + 0.1*rotate(v), cos >= 0.994987 by
    construction); with rp_lsh_params(200_000)-derived banding the
    band-bucket candidate volume must stay a vanishing fraction of
    all-pairs (<2% is the gate; the expectation is ~1e-4) AND linear
    in n, while EVERY planted pair still shares at least one band."""
    n = 100_000
    params = rp_lsh_params(2 * n)
    rng = np.random.RandomState(7)
    V = rng.standard_normal((n, 64))
    W = V + 0.1 * np.roll(V, -1, axis=1)
    X = np.vstack([V, W])
    H = np.random.RandomState(_RP_SEED).standard_normal(
        (params.total_hashes, 64))
    weights = (1 << np.arange(params.width)).astype(np.int64)
    sigs = np.empty((2 * n, params.bands), dtype=np.int64)
    for lo in range(0, 2 * n, 20_000):
        hi = min(lo + 20_000, 2 * n)
        bits = (X[lo:hi] @ H.T) >= 0.0
        sigs[lo:hi] = (
            bits.reshape(hi - lo, params.bands, params.width) * weights
        ).sum(axis=2)

    # exact planted-pair recall: originals vs their perturbed twins
    shared = (sigs[:n] == sigs[n:]).any(axis=1)
    assert shared.all(), f"{(~shared).sum()} planted pairs missed"

    # candidate volume (band-duplicated upper bound, as the equi-join
    # would see before dedup): sum of C(bucket, 2) over every band
    cand = 0
    for b in range(params.bands):
        _, counts = np.unique(sigs[:, b], return_counts=True)
        cand += int((counts * (counts - 1) // 2).sum())
    all_pairs = (2 * n) * (2 * n - 1) // 2
    assert cand < 0.02 * all_pairs, (cand, all_pairs)
    # linear-in-n: planted pairs collide in ~bands * p_band^1 bands
    # each; random noise adds <= budget * n. Generous 1.5x headroom.
    p_band = P_BIT_PLANTED ** params.width
    linear_bound = 1.5 * (params.bands * p_band * n + 0.5 * 2 * n)
    assert cand < linear_bound, (cand, linear_bound)


def test_tuned_params_match_fixed_config_output_on_corpus(spark):
    """Spark integration: minhash_lsh_pairs with SOLVER-derived
    (bands, rows) emits the same verified pair set as the shipped
    fixed config on the sf0.001 corpus - recall differences live far
    below the corpus's J>=0.9 duplicate band, and the exact-Jaccard
    verify makes precision identical by construction."""
    from cassandra_elasticsearch_sync_spark.pipeline.dedup import (
        _shingled,
        minhash_lsh_pairs,
    )

    sh = _shingled(spark, "/root/testdata/sf0.001")
    tuned = minhash_lsh_params(500, threshold_jaccard=0.7)
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_pairs(
               sh, tuned.bands, tuned.width).collect()}
    fixed = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(sh).collect()}
    assert got == fixed and len(fixed) > 0
