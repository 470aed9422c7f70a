"""LSH parameter tuning as code (VERDICT r4 #5).

BENCH_NOTES pinned the widen-again horizons for the fixed band
configs in prose (RP-LSH 32x24 linear to ~10M vectors; MinHash 16x4
sized for the 5k-doc corpus). This module encodes the standard tuning
rule so the scale path is a function of corpus size, not a comment:

- **Band width (bits / rows-per-band) controls random collisions.**
  A random pair collides in one RP band with ~0.5^bits (independent
  sign agreement per hyperplane), in one MinHash band with ~j0^rows
  (j0 = background Jaccard of unrelated docs). Total expected random
  candidates ~ C(n,2) * bands * that rate, so holding candidates
  LINEAR in n needs width ~ log2(n) + margin - any fixed width
  eventually goes quadratic (measured in the r4 decade probes:
  8-bit bands saturated at 40k vectors).
- **Band count controls recall.** A qualifying pair (per-bit
  agreement p = 1 - arccos(cos_target)/pi for RP; per-row agreement
  J for MinHash) survives with 1 - (1 - p^width)^bands; bands is
  solved from the target recall at the chosen width.

Both solvers iterate width upward from a floor until the candidate
budget holds with the recall-implied band count - convergence is
guaranteed because the collision rate decays geometrically in width
(factor 2 resp. 1/j0) while the recall-implied band count grows only
like (1/p)^width with 1/p barely above 1.

The REGISTERED queries keep their fixed seeds and fixed (bands,
width) so oracle hashes stay bit-stable across rounds; these
functions are the documented scale path, exercised by
tests/test_lsh_tuning.py up to a 200k-vector planted corpus.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class LshParams:
    bands: int
    width: int  # bits per band (RP) / minhash rows per band (MinHash)

    @property
    def total_hashes(self) -> int:
        return self.bands * self.width


def _solve(n_items: int, per_unit_agreement: float, random_rate_base: float,
           target_recall: float, candidate_budget: float,
           min_width: int, max_width: int) -> LshParams:
    """Smallest width >= min_width whose recall-implied band count
    keeps expected random candidates <= candidate_budget * n_items."""
    if not 0.0 < per_unit_agreement < 1.0:
        raise ValueError("agreement probability must be in (0, 1)")
    n = max(int(n_items), 2)
    for width in range(min_width, max_width + 1):
        p_band = per_unit_agreement ** width
        if p_band >= 1.0:
            continue
        bands = max(1, math.ceil(
            math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
        # E[random candidate pairs] ~ C(n,2) * bands * rate^width
        exp_random = (n * (n - 1) / 2.0) * bands * (random_rate_base ** width)
        if exp_random <= candidate_budget * n:
            return LshParams(bands=bands, width=width)
    raise ValueError(
        f"no width <= {max_width} satisfies the candidate budget at n={n}")


def rp_lsh_params(n_vectors: int, recall_at_cos: float = 0.994987,
                  target_recall: float = 1.0 - 1e-8,
                  candidate_budget: float = 0.5,
                  min_bits: int = 12, max_bits: int = 48) -> LshParams:
    """(bands, bits) for signed-random-projection LSH.

    ``recall_at_cos`` is the cosine at which the recall guarantee must
    hold (for the k3l planted corpus: the construction's floor
    sqrt(0.99) ~ 0.994987, NOT the 0.98 report cut - recall is
    guaranteed at the pairs that must survive, precision comes free
    from the exact verify). ``candidate_budget`` is expected random
    candidates PER VECTOR - 0.5 keeps verify cost at parity with the
    planted-pair volume. At n=400k this solver lands on 24-26 bits
    and ~30 bands: the same operating point the r4 decade probes
    measured linear (BENCH_NOTES), now derived instead of pinned.
    """
    p_bit = 1.0 - math.acos(max(-1.0, min(1.0, recall_at_cos))) / math.pi
    # Random 64-dim pairs agree per hyperplane with p ~ 0.5 (exact for
    # orthogonal pairs; the empirical mean over i.i.d. Gaussian vectors).
    return _solve(n_vectors, p_bit, 0.5, target_recall, candidate_budget,
                  min_bits, max_bits)


def minhash_lsh_params(n_docs: int, threshold_jaccard: float = 0.9,
                       target_recall: float = 1.0 - 1e-6,
                       candidate_budget: float = 0.5,
                       background_jaccard: float = 0.05,
                       min_rows: int = 2, max_rows: int = 32) -> LshParams:
    """(bands, rows_per_band) for MinHash-LSH.

    ``background_jaccard`` is the typical Jaccard of UNRELATED docs in
    the corpus (shingle collisions from shared boilerplate); random
    band collisions scale as background_jaccard^rows. At the 5k-doc
    corpus and threshold 0.9 this lands within one step of the
    shipped 16x4; at web scale (1e9 docs) it widens to ~8-9 rows and
    ~40 bands - the config a fixed 16x4 could never reach.
    """
    return _solve(n_docs, threshold_jaccard, background_jaccard,
                  target_recall, candidate_budget, min_rows, max_rows)


def recall_at(params: LshParams, per_unit_agreement: float) -> float:
    """Survival probability of a pair with the given per-unit
    (per-bit / per-row) agreement under (bands, width) banding."""
    return 1.0 - (1.0 - per_unit_agreement ** params.width) ** params.bands
