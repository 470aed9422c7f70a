"""Differential tests for the round-7 ES search APIs: random tiny
corpora scored through the Spark implementations must match
INDEPENDENT pure-Python references (a StupidBackoff bigram LM for the
phrase suggester; a TF-IDF selection + weighted-match scorer for
more_like_this). Catches candidate-ranking, backoff-branch, gating,
and tie-break bugs the hand-picked demo phrases never exercise."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.sources.es_query import (
    es_more_like_this,
    es_phrase_suggest,
)

_WORDS = ["red", "fox", "fog", "dog", "dig", "run", "ran", "the"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6),
    min_size=2, max_size=8,
)


def _ref_phrase_suggest(docs, phrase, max_edits, per_slot, size):
    """Independent reference: vocabulary + bigram counts + candidate
    ranking + StupidBackoff scoring, all in plain Python."""

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    vocab: dict[str, int] = {}
    bigrams: dict[tuple[str, str], int] = {}
    total = 0
    for doc in docs:
        for i, w in enumerate(doc):
            vocab[w] = vocab.get(w, 0) + 1
            total += 1
            if i + 1 < len(doc):
                key = (w, doc[i + 1])
                bigrams[key] = bigrams.get(key, 0) + 1
    slots = phrase.split()
    per_slot_cands = []
    for t in slots:
        cands = sorted(
            ((lev(w, t), -c, w) for w, c in vocab.items()
             if lev(w, t) <= max_edits),
        )[:per_slot]
        if not cands:
            return []
        per_slot_cands.append([(w, -negc) for _, negc, w in cands])
    phrases = [([], 0.0)]
    results = []

    def expand(idx, words):
        if idx == len(slots):
            score = math.log(vocab[words[0]] / total)
            for i in range(1, len(words)):
                c12 = bigrams.get((words[i - 1], words[i]))
                if c12:
                    score += math.log(c12 / vocab[words[i - 1]])
                else:
                    score += math.log(0.4 * vocab[words[i]] / total)
            results.append((" ".join(words), round(score, 6), score))
            return
        for w, _ in per_slot_cands[idx]:
            expand(idx + 1, words + [w])

    expand(0, [])
    results.sort(key=lambda r: (-r[2], r[0]))
    return [(s, r) for s, r, _ in results[:size]]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=corpus_strategy,
       phrase=st.lists(st.sampled_from(["rd", "fx", "rn", "teh", "dog"]),
                       min_size=1, max_size=3).map(" ".join),
       per_slot=st.integers(1, 3))
def test_phrase_suggester_matches_reference(spark, docs, phrase, per_slot):
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string")
    got = [(r["suggestion"], r["score"]) for r in
           es_phrase_suggest(df, "text", phrase, max_edits=1,
                             per_slot=per_slot, size=5).collect()]
    want = _ref_phrase_suggest(docs, phrase, 1, per_slot, 5)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gs, gv), (ws, wv) in zip(got, want):
        assert abs(gv - wv) < 1e-9, (gs, gv, wv)


def _ref_mlt(docs, like_id, max_terms, min_tf, min_df, msm, size):
    n = len(docs)
    tf: dict[tuple[int, str], int] = {}
    df_: dict[str, set] = {}
    for i, doc in enumerate(docs):
        for w in doc:
            tf[(i, w)] = tf.get((i, w), 0) + 1
            df_.setdefault(w, set()).add(i)
    seed = [
        (w, math.floor(tf[(like_id, w)] * math.log(n / len(df_[w]))
                       * 1048576))
        for w in {w for (i, w) in tf if i == like_id}
        if tf[(like_id, w)] >= min_tf and len(df_[w]) >= min_df
    ]
    seed.sort(key=lambda t: (-t[1], t[0]))
    sel = dict(seed[:max_terms])
    if not sel:
        return []
    need = max(1, math.floor(len(sel) * msm))
    out = []
    for i, doc in enumerate(docs):
        if i == like_id:
            continue
        matched = {w for w in doc if w in sel}
        if len(matched) >= need:
            sq = sum(sel[w] for w in matched)
            out.append((i, len(matched), round(sq / 1048576, 6), sq))
    out.sort(key=lambda t: (-t[3], t[0]))
    return [(i, m, s) for i, m, s, _ in out[:size]]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=corpus_strategy, max_terms=st.integers(1, 6))
def test_more_like_this_matches_reference(spark, docs, max_terms):
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string")
    got = [(r["doc_id"], r["matched_terms"], r["_score"]) for r in
           es_more_like_this(df, "text", "doc_id", 0,
                             max_query_terms=max_terms, min_term_freq=1,
                             min_doc_freq=1, minimum_should_match=0.3,
                             size=10).collect()]
    want = _ref_mlt(docs, 0, max_terms, 1, 1, 0.3, 10)
    assert got == want
