"""The sync engine's main loop - the reference's program, Spark-first.

Reconstructed reference lifecycle (SURVEY.md 3.1): connect to both
stores; FULL SYNC (scan both, compare per key+version, LWW, upsert
both ways); then an INCREMENTAL LOOP reading records changed since the
last sync point and applying them to the other side.

This module is that program over DataFrame stores:

    engine = SyncEngine(spark, store_a, store_b, state_dir)
    engine.full_sync()          # bootstrap: both stores converge
    ...
    engine.incremental_cycle()  # ship only deltas since the watermark

Differences from the 2013-era script, by design:
- The per-record compare loop is one distributed LWW merge (union +
  per-key top-1 window): no driver-side iteration, linear scaling.
- The sync point is a persisted watermark table (sources/storage.py);
  crash between cycles -> the next cycle re-reads from the old
  watermark and re-applies; applies are idempotent (L4 property
  tests), so at-least-once is safe.
- Stores here are snapshot-swap parquet directories; production swaps
  in the Cassandra/ES connectors (sources/readers.py) and an ACID
  MERGE for the apply step. The cycle logic does not change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sources.storage import (
    extract_delta_since,
    load_watermark,
    save_watermark,
)
from cassandra_elasticsearch_sync_spark.sync.ops import lww_merge


class ParquetStore:
    """A keyed store on snapshot-swap parquet (schema: key, price,
    version, side). Production: Cassandra table / ES index."""

    def __init__(self, spark: SparkSession, root: str, init: DataFrame | None = None):
        self.spark = spark
        self.root = root
        self.version = 0
        if init is not None:
            init.write.mode("overwrite").parquet(self._path(0))

    def _path(self, v: int) -> str:
        return os.path.join(self.root, f"v{v}")

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._path(self.version))

    def overwrite(self, df: DataFrame) -> None:
        self.version += 1
        df.write.mode("overwrite").parquet(self._path(self.version))


class SyncEngine:
    """Bidirectional LWW synchronizer between two keyed stores."""

    def __init__(self, spark: SparkSession, store_a: ParquetStore,
                 store_b: ParquetStore, state_dir: str):
        self.spark = spark
        self.a = store_a
        self.b = store_b
        self.state_dir = state_dir

    # -- L6: bootstrap ----------------------------------------------------
    def full_sync(self) -> None:
        """Scan both stores, resolve every key by LWW, write the
        converged snapshot to both sides, persist the watermark."""
        merged = lww_merge(self.a.read(), self.b.read()).persist()
        self.a.overwrite(merged)
        self.b.overwrite(merged)
        self._advance_watermark(merged)
        merged.unpersist()

    # -- L7: one incremental cycle ---------------------------------------
    def incremental_cycle(self) -> int:
        """Read rows changed at-or-after the watermark on each side,
        apply the ones the other side is missing (LWW), advance the
        watermark. Returns the number of rows shipped (0 => in sync).

        The watermark boundary is INCLUSIVE (extract_delta_since uses
        >=): the watermark is max(version) of the rows seen, so a
        concurrent write landing later with version exactly equal to it
        must still be picked up next cycle. Inclusive extraction would
        re-ship the boundary rows forever, so each delta is anti-joined
        on the full payload (every column but the provenance `side`)
        against the other store: `n` counts only rows the other side
        actually lacks, which keeps 0 an honest convergence signal AND
        skips the no-op overwrite on quiet cycles.
        """
        wm = load_watermark(self.spark, self.state_dir)
        delta_a = extract_delta_since(self.a.read(), wm).persist()
        delta_b = extract_delta_since(self.b.read(), wm).persist()
        cols = [c for c in delta_a.columns if c != "side"]
        ship_a = delta_a.join(self.b.read(), cols, "left_anti").persist()
        ship_b = delta_b.join(self.a.read(), cols, "left_anti").persist()
        # One job for both counts (a union-count instead of two
        # count() actions): the quiet-cycle hot path pays a single
        # scheduling round trip per cycle.
        n = (
            ship_a.select(F.lit(1).alias("one"))
            .unionAll(ship_b.select(F.lit(1).alias("one")))
            .count()
        )
        if n:
            new_b = lww_merge(self.b.read(), ship_a)
            new_a = lww_merge(self.a.read(), ship_b)
            self.a.overwrite(new_a)
            self.b.overwrite(new_b)
        # Advance over everything SEEN, not just shipped: rows present
        # on both sides up to v are already synced, and the inclusive
        # boundary still catches a straggler landing at exactly v.
        self._advance_watermark(delta_a.unionByName(delta_b))
        for df in (ship_a, ship_b, delta_a, delta_b):
            df.unpersist()
        return n

    def _advance_watermark(self, applied: DataFrame) -> None:
        row = applied.agg(F.max("version").alias("m")).collect()[0]
        if row["m"] is not None:
            save_watermark(self.spark, self.state_dir, row["m"])

    # -- invariant helpers (used by tests) --------------------------------
    def in_sync(self) -> bool:
        a = self.a.read().select("key", "price", "version")
        b = self.b.read().select("key", "price", "version")
        return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
