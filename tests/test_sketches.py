"""Count-Min sketch accuracy contract: estimates never undercount and
overcount by at most ~2N/W (the eps*N bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.pipeline.sketches import (
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cms_upper_bounds_and_error(spark):
    d = load_table(spark, SF_DIR, "documents")
    tokens = d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    truth = {r["token"]: r["n"] for r in
             tokens.groupBy("token").agg(F.count("*").alias("n")).collect()}
    n_total = sum(truth.values())
    sketch = cms_build(tokens).persist()
    for tok in list(truth)[:10]:
        est = cms_estimate(spark, sketch, tok)
        assert est >= truth[tok], (tok, est, truth[tok])
        assert est <= truth[tok] + 2 * n_total / CMS_WIDTH * 2, (tok, est, truth[tok])


def test_cms_merge_is_cellwise_sum(spark):
    d = load_table(spark, SF_DIR, "documents")
    tokens = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    half_a = tokens.filter(F.col("doc_id") % 2 == 0).select("token")
    half_b = tokens.filter(F.col("doc_id") % 2 == 1).select("token")
    merged = (
        cms_build(half_a).unionByName(cms_build(half_b))
        .groupBy("depth", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(tokens.select("token"))
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in whole.collect())
    assert got == want
