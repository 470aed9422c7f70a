"""Custom Python DataSource (Spark 4 DataSource-V2 Python API): the
engine's pluggable-connector surface, demonstrated end-to-end.

A production deployment points this API at Cassandra (token-range
splits) or ES (slice-scroll splits); neither server exists in this
container, so the registered demo source is a DETERMINISTIC CDC feed
generator - but the mechanics are the real connector mechanics:

- ``partitions()`` returns the split set; Spark schedules ONE TASK PER
  SPLIT, exactly how the Cassandra connector maps token ranges and the
  ES connector maps index slices to input partitions (a2b shows the
  token math itself);
- each ``read(partition)`` runs executor-side, yielding only its
  split's rows - the driver never materializes the feed;
- the source declares its schema up front (schema-on-connect, like a
  CQL table or ES mapping).

The demo feed is pure arithmetic on the sequence number, so every
engine/run agrees row-for-row and the DuckDB oracle can reconstruct
the identical feed relationally (RANGE + the same expressions) -
giving a HASH-checked custom source, not just a smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from cassandra_elasticsearch_sync_spark.registry import register

N_EVENTS = 10000
N_KEYS = 1000
N_SPLITS = 8


class _CdcFeedReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", N_EVENTS))
        self.splits = int(options.get("splits", N_SPLITS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.splits)]

    def read(self, partition):
        # Executor-side: yield only this split's slice of the feed.
        for seq in range(partition.value, self.n, self.splits):
            op = "D" if seq % 7 == 0 else "U"
            price = float((seq * 31) % 9973) / 100.0
            yield (seq, seq % N_KEYS, op, price)


class CdcFeedSource(DataSource):
    """spark.read.format("cdc_feed").option("n", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "cdc_feed"

    def schema(self) -> str:
        return "seq bigint, key bigint, op string, price double"

    def reader(self, schema):
        return _CdcFeedReader(self.options)


def register_cdc_source(spark: SparkSession) -> None:
    # Re-registration under the same name is an overwrite, but stay
    # defensive for driver sessions that pre-registered it.
    try:
        spark.dataSource.register(CdcFeedSource)
    except Exception:
        pass


@register("a10_python_datasource_cdc", "A2+L4", f"""
WITH seqs AS (SELECT UNNEST(RANGE(0, {N_EVENTS})) AS seq),
cdc AS (
  SELECT seq, seq % {N_KEYS} AS key,
         CASE WHEN seq % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST((seq * 31) % 9973 AS DOUBLE) / 100.0 AS price
  FROM seqs
),
latest AS (
  SELECT key, ARG_MAX(op, seq) AS op, ARG_MAX(price, seq) AS price
  FROM cdc GROUP BY key
)
SELECT COUNT(*) AS n_live,
       CAST(CAST(SUM(CAST(price AS DECIMAL(38,10))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_price
FROM latest WHERE op = 'U'
""", "Custom connector end-to-end: a Python DataSource (Spark 4 "
     "DSv2 API - the socket a real Cassandra/ES connector plugs "
     "into) emits a deterministic CDC feed across 8 executor-side "
     "splits; the engine folds it to final state with the L-tier "
     "semantics (latest op per key wins via max_by on the sequence, "
     "deletes drop the key) and the DuckDB oracle reconstructs the "
     "identical feed relationally - so the custom source is "
     "HASH-verified, not just smoke-tested. One narrow scan (one "
     "task per split, no driver materialization) + one partial-agg "
     "shuffle on the key.")
def a10_python_datasource_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cdc_source(spark)
    feed = (
        spark.read.format("cdc_feed")
        .option("n", N_EVENTS)
        .option("splits", N_SPLITS)
        .load()
    )
    latest = feed.groupBy("key").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("price", "seq").alias("price"),
    )
    from cassandra_elasticsearch_sync_spark.parity import dsum

    return (
        latest.filter(F.col("op") == "U")
        .agg(F.count("*").alias("n_live"), dsum("price", 2).alias("total_price"))
    )


# ---------------------------------------------------------------------------
# Write side: an ES _bulk sink through the same DSv2 Python API
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


class _BulkCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path, self.n = path, n


class _EsBulkWriter(DataSourceWriter):
    """Renders each task's rows as the ES _bulk wire format (action
    line + source line) into a task-private temp file; the DRIVER-side
    commit() renames every temp file at once - the same two-phase
    all-or-nothing contract a real bulk-HTTP sink needs for exactly-
    once batches (write task-local, publish on global commit, delete
    on abort). In production write() would POST its batch and return
    the item statuses; the file form keeps it verifiable offline."""

    def __init__(self, options):
        self.dir = options["path"]
        self.index = options.get("index", "docs")
        self.id_col = options.get("id_col", "id")
        # Optional delete-action routing (the other half of the _bulk
        # vocabulary): rows whose `op_col` equals `delete_op` render as
        # a bare {"delete": ...} action line (no source line), exactly
        # the wire form ES expects for bulk deletions.
        self.op_col = options.get("op_col")
        self.delete_op = options.get("delete_op", "D")

    def write(self, rows):
        _os.makedirs(self.dir, exist_ok=True)
        tmp = _os.path.join(self.dir, f"_tmp_{_uuid.uuid4().hex}.bulk")
        n = 0
        with open(tmp, "w") as f:
            for row in rows:
                d = row.asDict()
                meta = {"_index": self.index, "_id": str(d[self.id_col])}
                if self.op_col and d.get(self.op_col) == self.delete_op:
                    f.write(_json.dumps({"delete": meta}, sort_keys=True) + "\n")
                else:
                    f.write(_json.dumps({"index": meta}, sort_keys=True) + "\n")
                    f.write(_json.dumps(d, default=str, sort_keys=True) + "\n")
                n += 1
        return _BulkCommit(tmp, n)

    def commit(self, messages):
        for m in messages:
            _os.rename(m.path, m.path.replace("_tmp_", "part_"))

    def abort(self, messages):
        for m in messages:
            try:
                _os.remove(m.path)
            except OSError:
                pass


class EsBulkSink(DataSource):
    """df.write.format("es_bulk_sink").option("path", dir)
    .option("index", name).option("id_col", key).mode("append").save()"""

    @classmethod
    def name(cls) -> str:
        return "es_bulk_sink"

    def writer(self, schema, overwrite):
        return _EsBulkWriter(self.options)


def register_bulk_sink(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(EsBulkSink)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# Streaming side: the same feed as a custom Python STREAMING source
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class _SeqRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _CdcFeedStreamReader(DataSourceStreamReader):
    """Micro-batch offsets over the deterministic CDC sequence: the
    offset is just {'seq': next_unread}, latestOffset exposes what the
    upstream has durably available (the 'end' option - a Cassandra CDC
    commitlog reader or an ES scroll cursor report the same shape),
    and partitions(start, end) splits each batch's range into
    executor-side slices. Spark checkpoints the committed offset, so
    a restarted query resumes EXACTLY after the last committed batch -
    the property test_python_datasource.py pins across a stop/extend/
    restart cycle."""

    def __init__(self, options):
        self.splits = int(options.get("splits", N_SPLITS))
        self.end = int(options.get("end", N_EVENTS))
        self.batch = int(options.get("batch", max(1, self.end // 4)))

    def initialOffset(self):
        return {"seq": 0}

    def latestOffset(self):
        return {"seq": self.end}

    def partitions(self, start, end):
        s, e = int(start["seq"]), int(end["seq"])
        if e <= s:
            return [_SeqRange(s, s)]
        step = max(1, (e - s + self.splits - 1) // self.splits)
        return [_SeqRange(lo, min(lo + step, e))
                for lo in range(s, e, step)]

    def read(self, partition):
        for seq in range(partition.start, partition.end):
            op = "D" if seq % 7 == 0 else "U"
            price = float((seq * 31) % 9973) / 100.0
            yield (seq, seq % N_KEYS, op, price)

    def commit(self, end):
        pass  # offsets live in Spark's checkpoint, nothing external


class CdcFeedStreamSource(DataSource):
    """spark.readStream.format("cdc_feed_stream").option("end", N)"""

    @classmethod
    def name(cls) -> str:
        return "cdc_feed_stream"

    def schema(self) -> str:
        return "seq bigint, key bigint, op string, price double"

    def streamReader(self, schema):
        return _CdcFeedStreamReader(self.options)


def register_cdc_stream_source(spark: SparkSession) -> None:
    try:
        spark.dataSource.register(CdcFeedStreamSource)
    except Exception:
        pass


@register("a11_python_stream_source", "A5+A2", f"""
WITH seqs AS (SELECT UNNEST(RANGE(0, {N_EVENTS})) AS seq),
cdc AS (
  SELECT seq, seq % {N_KEYS} AS key,
         CASE WHEN seq % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST((seq * 31) % 9973 AS DOUBLE) / 100.0 AS price
  FROM seqs
)
SELECT op, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(price AS DECIMAL(38,10))) AS DECIMAL(38,2))
            AS DOUBLE) AS total_price
FROM cdc GROUP BY op
""", "Custom Python STREAMING source (DSv2 DataSourceStreamReader): "
     "the CDC feed arrives as micro-batches with real offset "
     "tracking - initialOffset/latestOffset bound each batch, "
     "partitions(start, end) fans the range out to executor-side "
     "slices, and Spark's checkpoint makes the committed offset "
     "durable (stop/extend/restart resumes exactly-once - pinned in "
     "tests/test_python_datasource.py). This is the socket a "
     "Cassandra CDC commitlog tailer or an ES scroll poller plugs "
     "into. The streamed rows land in a parquet sink and their "
     "per-op rollup hash-matches the relational reconstruction - "
     "offset arithmetic proven lossless and duplicate-free, not "
     "just smoke-tested.")
def a11_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as _shutil
    import tempfile as _tempfile

    from cassandra_elasticsearch_sync_spark.parity import dsum
    from cassandra_elasticsearch_sync_spark.streaming.control import (
        await_bounded,
    )

    register_cdc_stream_source(spark)
    ckpt = _tempfile.mkdtemp(prefix="ces_a11_ckpt_")
    outdir = _tempfile.mkdtemp(prefix="ces_a11_out_")
    try:
        q = (
            spark.readStream.format("cdc_feed_stream")
            .option("end", N_EVENTS)
            .option("splits", N_SPLITS)
            .load()
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_bounded(q, 300)
        return (
            spark.read.parquet(outdir)
            .groupBy("op")
            .agg(F.count("*").alias("n"), dsum("price", 2).alias("total_price"))
            .localCheckpoint(eager=True)
        )
    finally:
        _shutil.rmtree(ckpt, ignore_errors=True)
        _shutil.rmtree(outdir, ignore_errors=True)
