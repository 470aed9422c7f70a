"""DSv2 Python DataSource surfaces: the CDC feed source (split
scheduling, executor-side reads) and the ES _bulk sink (task-local
write + driver-side two-phase commit)."""

from __future__ import annotations

import glob
import json
import tempfile

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.python_source import (
    register_bulk_sink,
    register_cdc_source,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_source_split_scheduling(spark):
    register_cdc_source(spark)
    feed = (
        spark.read.format("cdc_feed").option("n", 1000).option("splits", 5).load()
    )
    assert feed.rdd.getNumPartitions() == 5
    assert feed.count() == 1000
    # Deterministic content: seq 0 is a delete of key 0.
    first = feed.filter(F.col("seq") == 0).first()
    assert (first.key, first.op) == (0, "D")


def test_es_bulk_sink_two_phase_commit(spark):
    register_bulk_sink(spark)
    out = tempfile.mkdtemp(prefix="bulk_sink_")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    n_docs = docs.count()
    (
        docs.write.format("es_bulk_sink")
        .option("path", out)
        .option("index", "documents")
        .option("id_col", "doc_id")
        .mode("append")
        .save()
    )
    files = glob.glob(f"{out}/part_*.bulk")
    assert files, "commit() published no files"
    assert not glob.glob(f"{out}/_tmp_*.bulk"), "uncommitted temp files leaked"
    actions, sources = [], []
    for path in files:
        with open(path) as f:
            for i, line in enumerate(f):
                (actions if i % 2 == 0 else sources).append(json.loads(line))
    assert len(actions) == len(sources) == n_docs
    assert all(a["index"]["_index"] == "documents" for a in actions)
    ids = sorted(int(a["index"]["_id"]) for a in actions)
    want = sorted(r.doc_id for r in docs.select("doc_id").collect())
    assert ids == want


def test_stream_source_offset_resume_exactly_once(spark):
    """Stop/extend/restart on the custom Python streaming source: run
    to offset N/2, stop, raise the available end to N, restart on the
    SAME checkpoint - the resumed query must emit exactly the second
    half (committed offsets skip the first), and the union must be the
    complete feed with no duplicates."""
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.python_source import (
        N_EVENTS,
        register_cdc_stream_source,
    )
    from cassandra_elasticsearch_sync_spark.streaming.control import (
        await_bounded,
    )

    register_cdc_stream_source(spark)
    ckpt = tempfile.mkdtemp(prefix="ces_a11_resume_ckpt_")
    outdir = tempfile.mkdtemp(prefix="ces_a11_resume_out_")

    def run(end):
        q = (
            spark.readStream.format("cdc_feed_stream")
            .option("end", end).option("splits", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q, 300)

    try:
        run(N_EVENTS // 2)
        first = spark.read.parquet(outdir).count()
        assert first == N_EVENTS // 2
        run(N_EVENTS)
        seqs = [r["seq"] for r in
                spark.read.parquet(outdir).select("seq").collect()]
        assert len(seqs) == N_EVENTS == len(set(seqs))
        assert min(seqs) == 0 and max(seqs) == N_EVENTS - 1
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(outdir, ignore_errors=True)
