"""Semantic property test for k1d_substring_dup_spans: on random
corpora, the emitted spans must be exactly the maximal runs of
positions whose 8-token window also occurs in another document -
checked against the DEFINITION (window containment + maximality +
completeness), not a re-implementation."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.pipeline.dedup import (
    _K1D_K,
    k1d_substring_dup_spans,
)

VOCAB = ["a", "b", "c"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=_K1D_K, max_size=20),
    min_size=2,
    max_size=6,
)


def _windows(tokens: list[str]) -> list[tuple[int, str]]:
    """1-based start positions of every k-token window."""
    return [
        (i + 1, " ".join(tokens[i:i + _K1D_K]))
        for i in range(len(tokens) - _K1D_K + 1)
    ]


def _expected_dup_positions(docs: list[list[str]]) -> dict[int, set[int]]:
    owners: dict[str, set[int]] = {}
    for d, toks in enumerate(docs):
        for _, w in _windows(toks):
            owners.setdefault(w, set()).add(d)
    out: dict[int, set[int]] = {}
    for d, toks in enumerate(docs):
        out[d] = {
            p for p, w in _windows(toks) if len(owners[w]) >= 2
        }
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=doc_strategy)
def test_spans_match_definition(spark, docs):
    # materialize the corpus in the documents.parquet layout
    scratch = tempfile.mkdtemp(prefix="ces_k1d_prop_")
    try:
        rows = [
            (d, " ".join(toks), "en", "src1", len(" ".join(toks)))
            for d, toks in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, "
                  "source string, n_chars bigint")
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(scratch, "documents.parquet"))

        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in k1d_substring_dup_spans(spark, scratch).collect()
        }
        dup_pos = _expected_dup_positions(docs)

        # completeness + maximality: islands of duplicated window
        # starts, per doc, must equal the emitted spans
        expected = set()
        for d, positions in dup_pos.items():
            if not positions:
                continue
            ordered = sorted(positions)
            start = prev = ordered[0]
            for p in ordered[1:]:
                if p == prev + 1:
                    prev = p
                    continue
                expected.add((d, start, prev + _K1D_K - 1))
                start = prev = p
            expected.add((d, start, prev + _K1D_K - 1))
        assert got == expected, (sorted(got), sorted(expected))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
