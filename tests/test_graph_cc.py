"""Alternating large-star/small-star connected components: correctness
on adversarial shapes + the O(log n) round bound that label propagation
(O(diameter)) cannot give."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.pipeline.graph import connected_components


def _labels(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    labels, rounds = connected_components(df)
    got = {r["node"]: r["cluster_id"] for r in labels.collect()}
    return got, rounds


def test_path_graph_converges_in_log_rounds(spark):
    """A 256-node path is the adversarial case for label propagation
    (diameter 255). Alternating CC must land every node on cluster 0
    within ~2 log2(n) + slack rounds."""
    n = 256
    got, rounds = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 2 * int(math.log2(n)) + 4, rounds


def test_mixed_components(spark):
    pairs = [
        (1, 2), (2, 3),          # chain -> 1
        (10, 11),                # pair -> 10
        (20, 21), (21, 22), (20, 22),  # triangle -> 20
        (30, 31), (32, 31), (33, 30),  # star-ish -> 30
    ]
    got, _ = _labels(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 32: 30, 33: 30}


def test_empty_graph(spark):
    df = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    labels, _ = connected_components(df)
    assert labels.count() == 0


def test_matches_label_propagation_oracle(spark):
    """Random-ish deterministic graph vs a NetworkX-free reference:
    brute-force transitive closure via repeated squaring on a dict."""
    pairs = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
    got, _ = _labels(spark, pairs)

    # Union-find reference.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for a, b in pairs:
        for v in (a, b):
            want[v] = find(v)
    assert got == want
