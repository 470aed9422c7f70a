"""The Arrow/numpy ANN path must agree with the JVM higher-order-function
path: same per-query neighbor sets, cosines within float tolerance
(BLAS vs sequential fold summation order)."""

from __future__ import annotations

from cassandra_elasticsearch_sync_spark.pipeline.similarity import (
    k3_cosine_topk,
    k3_cosine_topk_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


def test_arrow_topk_matches_jvm_topk(spark):
    jvm = {(r["qid"], r["cid"]): r["cos_sim"]
           for r in k3_cosine_topk(spark, SF_DIR).collect()}
    arrow = {(r["qid"], r["cid"]): r["cos_sim"]
             for r in k3_cosine_topk_arrow(spark, SF_DIR).collect()}
    assert set(jvm) == set(arrow)
    for k in jvm:
        assert abs(jvm[k] - arrow[k]) <= 1e-6, (k, jvm[k], arrow[k])
