"""Cassandra materialized views over the ACID table format.

``CREATE MATERIALIZED VIEW v AS SELECT ... FROM base WHERE <pk> IS NOT
NULL ... PRIMARY KEY ((p), c, ...)`` - the server-maintained re-keyed
copy of a base table that Cassandra keeps in step with every base
write. The semantics kept here are Cassandra's own CREATE rules
(all of them rejected loudly when violated, matching the house
discipline):

  * the view primary key must contain EVERY base primary key column;
  * at most ONE non-primary-key base column may join the view key
    ("Cannot include more than one non primary key column");
  * every view primary key column must carry an explicit ``IS NOT
    NULL`` restriction in the WHERE clause, and rows where any view
    key column is null are EXCLUDED from the view (Cassandra's null
    rule - a base update that nulls the view key column REMOVES the
    row from the view);
  * the SELECT list must include every view primary key column
    (Cassandra auto-requires the base key; we require the full view
    key for the same reason - the view rows must be addressable);
  * the view is READ-ONLY - all writes go to the base table
    ("Cannot directly modify a materialized view").

Maintenance is Spark-first INCREMENTAL refresh rather than Cassandra's
per-mutation co-write: ``refresh()`` diffs the base table's current
ACID snapshot against the last-synced snapshot (time travel makes the
pre-image free) with ONE full-outer join on the base key, derives the
view delta - upserts for new/changed rows, deletes for removed rows
and for OLD view keys when the re-key column moved (Cassandra's
delete-then-insert view shadowing) - and applies it as ONE atomic
merge commit on the view table. The join is key-partitioned and the
delta is proportional to the CHANGED rows, not the table: at 100 TB a
refresh after a 1k-row batch shuffles 1k-row deltas plus one
co-partitioned diff join, never a view rebuild.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, functions as F

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable
from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError

_MV_RE = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>\w+)\s+AS\s+"
    r"SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<base>\w+)\s+"
    r"WHERE\s+(?P<where>.+?)\s+"
    r"PRIMARY\s+KEY\s*\((?P<pk>.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_NOT_NULL_RE = re.compile(r"^\s*(?P<col>\w+)\s+IS\s+NOT\s+NULL\s*$",
                          re.IGNORECASE)


def _parse_view_pk(raw: str) -> tuple[list[str], list[str]]:
    """``(a, b)`` / ``((a, b), c)`` -> (partition cols, clustering)."""
    raw = raw.strip()
    m = re.match(r"^\(\s*(?P<part>[^)]+)\)\s*(?:,\s*(?P<rest>.+))?$", raw)
    if m:  # composite partition key form ((a, b), c, ...)
        part = [c.strip().lower() for c in m.group("part").split(",")]
        rest = [c.strip().lower()
                for c in (m.group("rest") or "").split(",") if c.strip()]
        return part, rest
    cols = [c.strip().lower() for c in raw.split(",") if c.strip()]
    return cols[:1], cols[1:]


class MaterializedView:
    """One Cassandra materialized view: parse + validate the DDL,
    build the initial view table, and keep it in step with the base
    via incremental ``refresh()``."""

    def __init__(self, spark, base: AcidParquetTable,
                 base_key: list[str], ddl: str, root: str):
        m = _MV_RE.match(ddl)
        if not m:
            raise CqlError(f"unsupported CREATE MATERIALIZED VIEW "
                           f"statement: {ddl!r}")
        self.spark = spark
        self.base = base
        self.base_key = [c.lower() for c in base_key]
        self.name = m.group("name").lower()

        part, clust = _parse_view_pk(m.group("pk"))
        self.view_key = part + clust
        base_schema = base.read().schema
        base_cols = [f.name for f in base_schema.fields]
        unknown = [c for c in self.view_key if c not in base_cols]
        if unknown:
            raise CqlError(f"view PRIMARY KEY references unknown "
                           f"columns {unknown}")
        missing = [c for c in self.base_key if c not in self.view_key]
        if missing:
            raise CqlError(
                f"view PRIMARY KEY must include every base primary "
                f"key column; missing {missing} (Cassandra's rule)")
        extra = [c for c in self.view_key if c not in self.base_key]
        if len(extra) > 1:
            raise CqlError(
                f"cannot include more than one non-primary-key column "
                f"in the view PRIMARY KEY, got {extra} (Cassandra's "
                "rule)")

        restricted = set()
        for term in re.split(r"\s+AND\s+", m.group("where"),
                             flags=re.IGNORECASE):
            t = _NOT_NULL_RE.match(term)
            if not t:
                raise CqlError(
                    f"materialized-view WHERE supports only `col IS "
                    f"NOT NULL` restrictions, got {term!r}")
            restricted.add(t.group("col").lower())
        unrestricted = [c for c in self.view_key if c not in restricted]
        if unrestricted:
            raise CqlError(
                f"every view primary key column needs an IS NOT NULL "
                f"restriction; missing {unrestricted} (Cassandra's "
                "rule)")

        cols = m.group("cols").strip()
        if cols == "*":
            self.columns = list(base_cols)
        else:
            self.columns = [c.strip().lower() for c in cols.split(",")]
            bad = [c for c in self.columns if c not in base_cols]
            if bad:
                raise CqlError(f"view SELECT references unknown "
                               f"columns {bad}")
            missing = [c for c in self.view_key if c not in self.columns]
            if missing:
                raise CqlError(
                    f"view SELECT must include every view primary key "
                    f"column; missing {missing}")

        self.view = AcidParquetTable(spark, root)
        self._synced = base.current_version()
        self.view.init(self._project(base.read(self._synced)))

    # -- read side ---------------------------------------------------------

    def read(self) -> DataFrame:
        return self.view.read()

    def _project(self, df: DataFrame) -> DataFrame:
        """The view's row set for one base snapshot: null view keys
        drop (Cassandra's exclusion rule), view-key-first column
        order (the view's declared layout)."""
        cond = reduce(lambda a, b: a & b,
                      [F.col(c).isNotNull() for c in self.view_key])
        ordered = self.view_key + [c for c in self.columns
                                   if c not in self.view_key]
        return df.filter(cond).select(*ordered)

    # -- maintenance -------------------------------------------------------

    @staticmethod
    def _changed_dirs(mo: dict, mn: dict) -> tuple[list[str], list[str]]:
        """The data entries whose EFFECTIVE rows differ between two
        manifests. Copy-on-write rewrites mean a changed row's old
        version lives in a dropped/rewritten entry and its new version
        in an added one - so entries present in both manifests hold
        identical rows UNLESS their applicable merge-on-read delete
        set differs (a later MoR delete changes a file's effective
        rows without rewriting it; the seq rule decides
        applicability). Diffing only these entries is therefore EXACT,
        and refresh cost scales with the CHANGED data, not the
        table."""
        def dmap(m: dict) -> dict:
            seqs = m.get("seq", {})
            dels = m.get("deletes", [])
            return {d: tuple(sorted(
                        e["path"] for e in dels
                        if e["seq"] > int(seqs.get(d, 0))))
                    for d in m["files"]}
        om, nm = dmap(mo), dmap(mn)
        old_changed = [d for d in om if om[d] != nm.get(d)]
        new_changed = [d for d in nm if nm[d] != om.get(d)]
        return old_changed, new_changed

    def refresh(self) -> int:
        """Bring the view up to the base table's current version with
        one diff join + one merge commit; returns the view version.
        The diff reads ONLY the data entries that changed between the
        two snapshots (manifest set difference, MoR-delete-aware), so
        a refresh after a 1k-row batch joins 1k-row file slices, not
        the table."""
        cur = self.base.current_version()
        if cur == self._synced:
            return self.view.current_version()
        mo = self.base._manifest(self._synced)
        mn = self.base._manifest(cur)
        do, dn = self._changed_dirs(mo, mn)
        old = self._project(
            self.base._read_entries(mo, do)).alias("o")
        new = self._project(
            self.base._read_entries(mn, dn)).alias("n")
        on = reduce(lambda a, b: a & b,
                    [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
                     for k in self.base_key])
        j = old.join(new, on, "full")
        o_present = F.col(f"o.{self.base_key[0]}").isNotNull()
        n_present = F.col(f"n.{self.base_key[0]}").isNotNull()
        rekey = [c for c in self.view_key if c not in self.base_key]
        moved = reduce(lambda a, b: a | b,
                       [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
                        for c in rekey], F.lit(False))
        ordered = self.view_key + [c for c in self.columns
                                   if c not in self.view_key]
        # old view keys to shadow: base row gone, or re-key col moved
        deletes = (j.filter(o_present & (~n_present | moved))
                    .select(*[F.col(f"o.{c}").alias(c) for c in ordered])
                    .withColumn("__op", F.lit("D")))
        upserts = (j.filter(n_present)
                    .select(*[F.col(f"n.{c}").alias(c) for c in ordered])
                    .withColumn("__op", F.lit("W")))
        src = deletes.unionByName(upserts)
        v = self.view.merge_into(
            src, self.view_key,
            delete_condition=F.col("src.__op") == F.lit("D"),
            assume_unique_keys=True)
        self._synced = cur
        return v


# -- registered, oracle-verified query --------------------------------------

from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402


@register("a2aj_cql_materialized_view", "A2+A7+L2", """
WITH side_a AS (
  SELECT o_orderkey AS key, o_totalprice AS price, o_orderdate AS version
  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
), base AS (
  SELECT key,
         CASE WHEN key % 13 = 0 THEN NULL ELSE key % 7 END AS band,
         price, version
  FROM side_a
), after AS (
  SELECT key,
         CASE WHEN key % 97 = 6 THEN NULL
              WHEN key % 97 = 3 THEN 9
              ELSE band END AS band,
         price, version
  FROM base WHERE key % 97 <> 4
  UNION ALL
  SELECT 90000000 + seq AS key, 9 AS band, CAST(seq AS DOUBLE) AS price,
         TIMESTAMP '2004-01-01 00:00:00' AS version
  FROM (SELECT UNNEST(RANGE(0, 25)) AS seq)
)
SELECT CAST(band AS BIGINT) AS band, key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S')
         AS version_s
FROM after WHERE band IS NOT NULL
""", "Cassandra materialized view end-to-end: CREATE MATERIALIZED "
     "VIEW re-keys the base table by a regular column (PRIMARY KEY "
     "((band), key) - Cassandra's one-extra-column rule, IS NOT NULL "
     "restrictions required and enforced), the initial build excludes "
     "null-view-key rows, and INCREMENTAL refresh() keeps the view in "
     "step with CQL DML on the base: band updates MOVE rows between "
     "view partitions (the old view key is shadow-deleted, Cassandra's "
     "delete-then-insert), row deletes leave the view, inserts join "
     "it, and a cell delete that nulls the view key column REMOVES "
     "the row from the view. Maintenance is one snapshot-diff join "
     "(the base's time travel gives the pre-image) + one merge "
     "commit, delta-sized - never a rebuild; the hash pins the final "
     "view row set after two refresh cycles.")
def a2aj_cql_materialized_view(spark, sf_dir):
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.parity import fmt_ts
    from cassandra_elasticsearch_sync_spark.sources.cql_write import (
        apply_cql_writes,
    )
    from cassandra_elasticsearch_sync_spark.sync.ops import side_a

    broot = tempfile.mkdtemp(prefix="ces_mv_base_")
    vroot = tempfile.mkdtemp(prefix="ces_mv_view_")
    try:
        base_df = side_a(spark, sf_dir).select(
            "key",
            F.when(F.col("key") % 13 == 0, F.lit(None).cast("long"))
             .otherwise(F.col("key") % 7).alias("band"),
            "price", "version")
        t = AcidParquetTable(spark, broot)
        t.init(base_df)
        mv = MaterializedView(spark, t, ["key"], """
            CREATE MATERIALIZED VIEW kv_by_band AS
            SELECT band, key, price, version FROM kv
            WHERE band IS NOT NULL AND key IS NOT NULL
            PRIMARY KEY ((band), key)
        """, vroot)
        mods = (base_df.select("key", (F.col("key") % 97).alias("m"))
                .filter(F.col("m").isin(3, 4, 6)).collect())
        moved = sorted(r["key"] for r in mods if r["m"] == 3)
        gone = sorted(r["key"] for r in mods if r["m"] == 4)
        nulled = sorted(r["key"] for r in mods if r["m"] == 6)
        apply_cql_writes(t, ["key"], [
            f"UPDATE kv SET band = 9 WHERE key = {k}" for k in moved
        ] + [f"DELETE FROM kv WHERE key = {k}" for k in gone])
        mv.refresh()
        apply_cql_writes(t, ["key"], [
            f"DELETE band FROM kv WHERE key = {k}" for k in nulled
        ] + [f"INSERT INTO kv (key, band, price, version) VALUES "
             f"({90_000_000 + i}, 9, {float(i)}, '2004-01-01 00:00:00')"
             for i in range(25)])
        mv.refresh()
        return mv.read().select(
            "band", "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(broot, ignore_errors=True)
        shutil.rmtree(vroot, ignore_errors=True)
