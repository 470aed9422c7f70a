"""ACID MERGE INTO over plain parquet: manifests + conditional-put commits.

The A7 upsert sink's production form is an ACID table format (Delta /
Iceberg ``MERGE INTO``). No such jars exist in this container, so this
module implements the same transactional design from first principles -
the three ideas every lakehouse format shares:

1. **Immutable data files + a manifest.** Data lives in
   ``data/<uuid>.parquet`` files that are never modified in place. A
   commit is a JSON manifest (``_manifests/v{N}.json``) listing the
   exact files of that snapshot. Readers resolve the highest manifest
   -> file list once at planning time and then read only immutable
   files, so a concurrent writer can NEVER make a reader see a torn
   snapshot (snapshot isolation for free).
2. **O(1) atomic commit via conditional put.** The commit point is
   the exclusive creation (``O_CREAT|O_EXCL``) of manifest
   ``v{base+1}`` - exactly S3's conditional PUT (If-None-Match) or a
   commit service's compare-and-swap, so the protocol ports to an
   object store UNCHANGED, no lock files, no flock. Two writers based
   on the same snapshot race to create the same manifest name; the
   filesystem picks exactly one winner, the loser gets
   ``CommitConflict`` and retries on the fresh snapshot (optimistic
   concurrency). The current version is the highest manifest on disk;
   base+1 claiming keeps the chain contiguous by construction. Crash
   before the manifest create leaves only invisible orphan data files
   (reclaimed by vacuum); crash after it IS a completed commit - the
   data files were durable first.
3. **Copy-on-write MERGE.** ``merge_into`` rewrites ONLY the data
   files that actually contain matched keys (found by joining the
   source keys against the target WITH ``input_file_name`` - a
   files-not-rows sized driver list, same as a format's file-skipping
   index). Untouched files are carried into the new manifest verbatim.
   A merge touching 1% of a 100 TB table rewrites 1% of it, not 100% -
   the property the round-2 snapshot-swap store lacked.

MERGE semantics (ANSI-ish, the subset the sync engine needs):
  WHEN MATCHED [AND matched_condition] THEN UPDATE SET * (source row)
  WHEN MATCHED AND delete_condition    THEN DELETE
  WHEN NOT MATCHED                     THEN INSERT *
Source must have at most one row per key (classic MERGE precondition;
validated cheaply because the check is a per-key count on the source,
which is the small side of any sane merge).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_DATA = "data"
_MANIFESTS = "_manifests"


class CommitConflict(RuntimeError):
    """Another writer committed since this transaction's snapshot was
    read. Re-read and retry (merges here are idempotent, L4)."""


class AcidParquetTable:
    """A transactional keyed table: snapshot reads, atomic commits,
    copy-on-write MERGE INTO."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, _DATA), exist_ok=True)
        os.makedirs(os.path.join(root, _MANIFESTS), exist_ok=True)

    # -- snapshot resolution ----------------------------------------------

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.root, _MANIFESTS, f"v{v}.json")

    def current_version(self) -> int:
        """Highest committed manifest; 0 = empty table (no commit yet).
        A manifest file IS a commit (creation is the atomic commit
        point), so a directory listing is the source of truth - the
        same LIST-then-max a format's catalog does on an object store."""
        versions = [
            int(f[1:-5])
            for f in os.listdir(os.path.join(self.root, _MANIFESTS))
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def _manifest(self, v: int) -> dict:
        with open(self._manifest_path(v)) as fh:
            return json.load(fh)

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: the file list is resolved NOW; later commits
        do not change what this DataFrame scans (time travel via
        ``version=``)."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise ValueError("table has no committed snapshot yet")
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        if not m["files"]:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*m["files"])

    # -- write paths -------------------------------------------------------

    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable data files, return their paths.
        Each Spark task writes its own part file; we keep the directory
        as the manifest unit to stay file-count-frugal at small scale
        (a real format tracks part files individually - same protocol)."""
        d = os.path.join(self.root, _DATA, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(d)
        return [d]

    # -- column statistics (the file-skipping index) ------------------------

    _STATS_TYPES = ("integer", "long", "short", "byte", "float", "double",
                    "string", "date", "timestamp", "timestamp_ntz")

    def _collect_stats(self, files: list[str], schema: StructType) -> dict:
        """Per-manifest-entry min/max for every stats-eligible column -
        one tiny aggregate job per new entry, written into the manifest
        exactly like a format's file-level column stats. Values are
        JSON-encoded: numerics native, temporal/decimal as ISO/plain
        strings (ISO compares lexicographically, so pruning needs no
        type reconstruction)."""
        stats: dict[str, dict] = {}
        cols = []
        for f in schema.fields:
            t = f.dataType.typeName()
            if t in self._STATS_TYPES or t.startswith("decimal"):
                cols.append(f.name)
        if not cols:
            return stats
        for d in files:
            row = (
                self.spark.read.schema(schema).parquet(d)
                .agg(*[F.min(c).alias(f"__min_{c}") for c in cols],
                     *[F.max(c).alias(f"__max_{c}") for c in cols])
                .collect()[0]
            )

            def enc(v):
                if v is None or isinstance(v, (int, float)):
                    return v
                return str(v)  # Decimal / datetime / date / str

            stats[d] = {
                c: [enc(row[f"__min_{c}"]), enc(row[f"__max_{c}"])] for c in cols
            }
        return stats

    @staticmethod
    def _range_may_overlap(file_range, lo, hi) -> bool:
        """Conservative intersection test; missing stats keep the file."""
        fmin, fmax = file_range
        if fmin is None or fmax is None:
            return True

        def cmp_ge(a, b):  # a >= b with mixed-but-consistent encodings
            return str(a) >= str(b) if isinstance(a, str) or isinstance(b, str) else a >= b

        if lo is not None and not cmp_ge(fmax, lo):
            return False
        if hi is not None and not cmp_ge(hi, fmin):
            return False
        return True

    def candidate_files(self, col: str, lo=None, hi=None,
                        version: int | None = None) -> list[str]:
        """Manifest entries whose [min, max] for ``col`` may intersect
        [lo, hi] (inclusive; None = unbounded). Entries without stats
        are kept - pruning is always sound, never required."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        stats = m.get("stats", {})
        out = []
        for d in m["files"]:
            s = stats.get(d, {}).get(col)
            if s is None or self._range_may_overlap(s, lo, hi):
                out.append(d)
        return out

    def read_where(self, col: str, lo=None, hi=None,
                   version: int | None = None) -> DataFrame:
        """Stats-pruned snapshot read: skip manifest entries whose
        column range cannot match, then apply the residual filter -
        rows equal a full read + filter, bytes scanned do not. This is
        the planning step a real format runs on its file-level stats;
        at 100 TB on a time- or key-clustered table it is the
        difference between scanning a day and scanning a decade."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        cand = self.candidate_files(col, lo, hi, version=v)
        if not cand:
            return self.spark.createDataFrame([], schema)
        df = self.spark.read.schema(schema).parquet(*cand)
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def _commit(self, base_version: int, files: list[str], schema: StructType,
                stats: dict | None = None) -> int:
        """Conditional-put commit: atomically create manifest
        ``v{base+1}``. Creation succeeding IS the commit; creation
        failing means another writer committed on the same base first -
        the optimistic-concurrency loser raises ``CommitConflict``.
        To make the claim itself atomic-with-content, the manifest body
        is written to a private temp file first and ``os.link``ed into
        the claimed name (link fails with EEXIST exactly like a
        conditional put; readers can never observe a half-written
        manifest)."""
        next_v = base_version + 1
        manifest = {
            "version": next_v,
            "base": base_version,
            "files": files,
            "stats": stats or {},
            "schema": schema.jsonValue(),
        }
        tmp = os.path.join(self.root, _MANIFESTS,
                           f".tmp.{os.getpid()}.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, self._manifest_path(next_v))  # THE commit point
        except FileExistsError:
            raise CommitConflict(
                f"table advanced past v{base_version}; retry merge"
            ) from None
        finally:
            os.unlink(tmp)
        return next_v

    def init(self, df: DataFrame) -> int:
        """Create the first snapshot (or append a full overwrite)."""
        files = self._write_data_files(df)
        stats = self._collect_stats(files, df.schema)
        return self._commit(self.current_version(), files, df.schema, stats)

    # -- MERGE INTO --------------------------------------------------------

    def merge_into(
        self,
        source: DataFrame,
        keys: list[str],
        matched_condition: Column | None = None,
        delete_condition: Column | None = None,
    ) -> int:
        """ANSI-style MERGE with copy-on-write file rewrites.

        ``matched_condition`` / ``delete_condition`` see the matched
        pair as ``src`` / ``tgt`` aliases (e.g.
        ``F.col("src.version") > F.col("tgt.version")``). A matched row
        is deleted when ``delete_condition`` holds, else updated to the
        source row when ``matched_condition`` holds (always, if None),
        else kept. Unmatched source rows are inserted (unless they
        satisfy ``delete_condition`` with tgt NULL - deletes of absent
        keys are no-ops, tombstone-friendly).
        """
        base = self.current_version()
        manifest = self._manifest(base)
        schema = StructType.fromJson(manifest["schema"])
        target = self.read(base)

        dup = source.groupBy(*keys).count().filter(F.col("count") > 1)
        if not dup.isEmpty():
            raise ValueError(
                "MERGE source has multiple rows per key; aggregate it "
                "first (e.g. LWW top-1) - ANSI MERGE requires <=1"
            )

        # File-level pruning: which data files hold matched keys?
        # Two stages, like a real format: (1) STATS pruning - skip
        # manifest entries whose key range cannot intersect the
        # source's key range without reading them at all; (2) a
        # semi-join probe over the survivors (files-not-rows sized
        # collect - the skipping index for entries stats can't rule
        # out).
        probe_dirs = list(manifest["files"])
        if len(keys) == 1 and manifest.get("stats"):
            kb = source.agg(
                F.min(keys[0]).alias("lo"), F.max(keys[0]).alias("hi")
            ).collect()[0]
            stats = manifest["stats"]
            probe_dirs = [
                d for d in probe_dirs
                if stats.get(d, {}).get(keys[0]) is None
                or self._range_may_overlap(
                    stats[d][keys[0]],
                    kb["lo"] if isinstance(kb["lo"], (int, float)) else str(kb["lo"]),
                    kb["hi"] if isinstance(kb["hi"], (int, float)) else str(kb["hi"]),
                )
            ]
        if probe_dirs:
            probe = self.spark.read.schema(schema).parquet(*probe_dirs)
        else:
            probe = self.spark.createDataFrame([], schema)
        with_file = probe.withColumn("__f", F.input_file_name())
        skeys = source.select(*keys).distinct()
        hit_rows = (
            with_file.join(F.broadcast(skeys), keys, "left_semi")
            .select("__f").distinct().collect()
        )
        def _strip_scheme(p: str) -> str:
            return p[7:] if p.startswith("file://") else p

        hit_files = {_strip_scheme(r["__f"]) for r in hit_rows}
        all_files = list(manifest["files"])
        # A manifest entry is a directory; it is "affected" if any of
        # its part files got a hit.
        affected = [
            d for d in all_files
            if any(h.startswith(d.rstrip("/") + "/") for h in hit_files)
        ]
        untouched = [d for d in all_files if d not in affected]

        tgt_aff = (
            self.spark.read.schema(schema).parquet(*affected)
            if affected
            else self.spark.createDataFrame([], schema)
        )
        src, tgt = source.alias("src"), tgt_aff.alias("tgt")
        # Explicit join condition (a USING-style name list would coalesce
        # the key columns and break src./tgt. references below).
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(f"tgt.`{k}`") == F.col(f"src.`{k}`"))
        joined = tgt.join(src, cond, "full_outer")
        t_key = F.col(f"tgt.{keys[0]}")
        s_key = F.col(f"src.{keys[0]}")

        upd = matched_condition if matched_condition is not None else F.lit(True)
        dele = delete_condition if delete_condition is not None else F.lit(False)
        take_src = (
            # INSERT: no target row
            t_key.isNull()
            # UPDATE: matched and condition holds
            | (s_key.isNotNull() & upd)
        )
        keep = ~(s_key.isNotNull() & t_key.isNotNull() & dele) & ~(
            t_key.isNull() & dele
        )
        cols = [
            F.when(take_src, F.col(f"src.{c}")).otherwise(F.col(f"tgt.{c}")).alias(c)
            if c not in keys
            else F.coalesce(F.col(f"tgt.{c}"), F.col(f"src.{c}")).alias(c)
            for c in schema.names
        ]
        rewritten = joined.filter(keep).select(*cols)

        new_files = list(untouched)
        fresh: list[str] = []
        if not rewritten.isEmpty():
            fresh = self._write_data_files(rewritten)
            new_files += fresh
        # Stats carry over verbatim for untouched entries (their bytes
        # did not change - the CoW payoff extends to the index) and are
        # recomputed only for the rewritten entries.
        base_stats = manifest.get("stats", {})
        stats = {d: base_stats[d] for d in untouched if d in base_stats}
        stats.update(self._collect_stats(fresh, schema))
        return self._commit(base, new_files, schema, stats)

    # -- schema evolution --------------------------------------------------

    def add_columns(self, new_fields) -> int:
        """Metadata-only schema evolution: commit a new manifest with
        the SAME data files and a widened schema. No byte is rewritten
        - existing files simply read NULL for the new columns (the
        schema-specified parquet read fills missing columns), and
        every later MERGE writes them - exactly the ALTER TABLE ADD
        COLUMNS contract of a real table format. O(1) regardless of
        table size; time travel still reads old versions with their
        own schema."""
        v = self.current_version()
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        names = {f.name for f in schema.fields}
        for f in new_fields:
            if f.name in names:
                raise ValueError(f"column {f.name!r} already exists")
            schema = schema.add(f)
        return self._commit(v, m["files"], schema, m.get("stats", {}))

    # -- maintenance -------------------------------------------------------

    def vacuum(self, retain_last: int = 2) -> list[str]:
        """Drop manifests older than the last ``retain_last`` committed
        versions and delete data directories no retained manifest
        references. Standard lakehouse retention tradeoff: a reader
        pinned to a vacuumed snapshot fails (same as Delta VACUUM)."""
        import shutil

        cur = self.current_version()
        keep_versions = {v for v in range(max(1, cur - retain_last + 1), cur + 1)
                         if os.path.exists(self._manifest_path(v))}
        referenced: set[str] = set()
        for v in keep_versions:
            referenced.update(self._manifest(v)["files"])
        removed = []
        data_root = os.path.join(self.root, _DATA)
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            if full not in referenced:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        for f in os.listdir(os.path.join(self.root, _MANIFESTS)):
            v = int(f[1:-5])
            if v not in keep_versions:
                os.unlink(os.path.join(self.root, _MANIFESTS, f))
        return removed

    # -- OPTIMIZE: compaction + clustering ---------------------------------

    def _zvalue(self, df: DataFrame, cols: list[str]) -> Column:
        """Z-order (Morton) key over two numeric columns: each value is
        min-max quantized to 16 bits (one tiny bounds aggregate), then
        the bits interleave so a RANGE of z-values stays tight in BOTH
        dimensions - the property that makes one clustering layout
        prune reads on either column. Bit math only; no UDF."""
        assert len(cols) == 2, "z-order here is 2-D (extendable)"
        bounds = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        ).collect()[0]
        quant = []
        for c in cols:
            lo, hi = float(bounds[f"lo_{c}"]), float(bounds[f"hi_{c}"])
            span = (hi - lo) or 1.0
            quant.append(
                F.least(
                    F.lit(65535),
                    F.floor((F.col(c).cast("double") - F.lit(lo))
                            / F.lit(span) * 65535).cast("long"),
                )
            )
        z = F.lit(0).cast("long")
        for b in range(16):
            z = (z
                 + F.shiftleft(F.shiftright(quant[0], b) % 2, 2 * b + 1)
                 + F.shiftleft(F.shiftright(quant[1], b) % 2, 2 * b))
        return z

    def optimize(self, cluster_by: list[str], n_slices: int = 8,
                 zorder: bool = False) -> int:
        """OPTIMIZE: rewrite the current snapshot into ``n_slices``
        range-clustered manifest entries with tight per-entry column
        statistics - table contents unchanged, reads get file
        skipping. ``zorder=True`` clusters on the Morton interleave of
        two columns so range probes on EITHER prune; linear clustering
        only serves its leading column (the classic trade, asserted in
        tests). One distributed job: range repartition on the cluster
        key, Hive-style slice write, per-entry stats, one
        conditional-put commit (concurrent writers conflict like any
        other transaction). The rewrite is the lakehouse OPTIMIZE /
        ZORDER BY maintenance operation - at 100 TB it runs
        incrementally per partition; the protocol is identical."""
        df = self.read()
        base = self.current_version()
        schema = df.schema
        sort_key = (self._zvalue(df, cluster_by) if zorder
                    else F.col(cluster_by[0]))
        d = os.path.join(self.root, _DATA, uuid.uuid4().hex)
        (
            df.withColumn("__zk", sort_key)
            .repartitionByRange(n_slices, F.col("__zk"))
            .sortWithinPartitions("__zk")
            .withColumn("__slice", F.spark_partition_id())
            .drop("__zk")
            .write.partitionBy("__slice")
            .parquet(d)
        )
        files = sorted(
            os.path.join(d, sub)
            for sub in os.listdir(d) if sub.startswith("__slice=")
        )
        stats = self._collect_stats(files, schema)
        return self._commit(base, files, schema, stats)
