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


def test_hll_merge_is_registerwise_max(spark):
    """The HLL mergeability contract: sketching two disjoint shards
    and MAXing registers must equal sketching the union - the reason
    the estimate is computable per-partition/per-day at 100 TB."""
    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.pipeline.hashing import (
        portable_hash60,
    )
    from cassandra_elasticsearch_sync_spark.pipeline.sketches import (
        HLL_M,
        _rho_col,
    )

    df = spark.range(0, 5000).select(
        F.col("id").cast("string").alias("k"))
    hv = portable_hash60(F.col("k"))
    v = F.expr(f"CAST(CONV(SUBSTR(MD5(k), 1, 15), 16, 10) AS BIGINT) DIV {HLL_M}")
    regs = lambda d: (d.select((hv % HLL_M).alias("bucket"),
                               _rho_col(v).alias("rho"))
                      .groupBy("bucket").agg(F.max("rho").alias("m")))
    whole = {r.bucket: r.m for r in regs(df).collect()}
    a = {r.bucket: r.m
         for r in regs(df.filter(F.col("id") % 2 == 0)).collect()}
    b = {r.bucket: r.m
         for r in regs(df.filter(F.col("id") % 2 == 1)).collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole


def test_hll_estimate_within_theory_bound(spark):
    """Realized error on a 5k-distinct corpus must sit well inside
    ~3 sigma of the 1.04/sqrt(m) standard error."""
    import __spark_entry__  # noqa: F401  (registry load)
    from cassandra_elasticsearch_sync_spark import registry

    row = registry.all_specs()["d4b_hll_sketch_exact"].fn(
        spark, "/root/testdata/sf0.01").collect()[0]
    assert abs(row.rel_error) < 3 * 1.04 / (256 ** 0.5)
    assert row.n_registers == 256
