"""Sync operators L1-L6: diff / delta / LWW / upsert / deletes / full sync.

Semantics reconstructed from the driver contract (SURVEY.md 0.2): each
record carries a key and a version timestamp; a sync cycle classifies
keys across the two store snapshots, resolves concurrent edits by
last-write-wins on version (deterministic side tiebreak), and applies
an idempotent upsert set to each side.

Test fixture (FIXTURES.md "two-snapshot recipe", plus a deterministic
deletion set so L5 is non-trivial):

- side A ("Cassandra"): orders with o_orderdate <  2000-01-01
- side B ("ES"):        orders with o_orderdate >= 1997-01-01,
    minus keys with o_orderkey % 97 = 0   (simulated deletes on B),
    and a local edit where o_orderkey % 10 = 0: price * 1.1 and
    version bumped by one day (these win LWW in the overlap).
- key = o_orderkey, version = o_orderdate, payload = price.

Scale notes: the diff is one full-outer sort-merge join on the key -
the canonical shape for a 100 TB two-store reconciliation (both sides
shuffle-partitioned by key once; AQE splits skewed keys). The LWW
merge is a per-key top-1 window after a union - a single shuffle, no
join blowup. At 100 TB the upsert apply would target an ACID table
format; on plain parquet it is a full-snapshot rewrite (apply_upserts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.parity import fmt_ts
from cassandra_elasticsearch_sync_spark.registry import register
from cassandra_elasticsearch_sync_spark.localdata import tiny_df

# DuckDB twins of the snapshot builders; prepended to every L oracle.
_SIDES_SQL = """
WITH side_a AS (
  SELECT o_orderkey AS key, o_totalprice AS price, o_orderdate AS version
  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
),
side_b AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey % 10 = 0 THEN o_orderdate + INTERVAL 1 DAY
              ELSE o_orderdate END AS version
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND o_orderkey % 97 <> 0
)
"""


def side_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "Cassandra" snapshot: key/price/version."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.expr("o_orderdate < TIMESTAMP_NTZ '2000-01-01 00:00:00'")).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("version"),
    )


def side_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "ES" snapshot: overlapping window + local edits + deletes."""
    o = load_table(spark, sf_dir, "orders")
    edited = F.col("o_orderkey") % 10 == 0
    return (
        o.filter(F.expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        .filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(edited, F.col("o_totalprice") * 1.1)
             .otherwise(F.col("o_totalprice")).alias("price"),
            F.when(edited, F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
             .otherwise(F.col("o_orderdate")).alias("version"),
        )
    )


# --------------------------------------------------------------------------
# L1: snapshot diff
# --------------------------------------------------------------------------

@register("l1_snapshot_diff", "L1", _SIDES_SQL + """
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN b.key IS NULL THEN 'only_a'
            WHEN a.key IS NULL THEN 'only_b'
            WHEN a.version = b.version AND a.price = b.price THEN 'equal'
            ELSE 'conflict' END AS label,
       STRFTIME(DATE_TRUNC('second', a.version), '%Y-%m-%d %H:%M:%S') AS version_a,
       STRFTIME(DATE_TRUNC('second', b.version), '%Y-%m-%d %H:%M:%S') AS version_b,
       a.price AS price_a,
       b.price AS price_b
FROM side_a a FULL OUTER JOIN side_b b ON a.key = b.key
""", "Snapshot diff: classify every key as only_a/only_b/equal/conflict "
     "(one full-outer join on the sync key)")
def l1_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).alias("a")
    b = side_b(spark, sf_dir).alias("b")
    ak, bk = F.col("a.key"), F.col("b.key")
    return a.join(b, ak == bk, "full").select(
        F.coalesce(ak, bk).alias("key"),
        F.when(bk.isNull(), "only_a")
         .when(ak.isNull(), "only_b")
         .when((F.col("a.version") == F.col("b.version"))
               & (F.col("a.price") == F.col("b.price")), "equal")
         .otherwise("conflict").alias("label"),
        fmt_ts(F.col("a.version")).alias("version_a"),
        fmt_ts(F.col("b.version")).alias("version_b"),
        F.col("a.price").alias("price_a"),
        F.col("b.price").alias("price_b"),
    )


# --------------------------------------------------------------------------
# L2: delta extraction (the batch form of the incremental sync read)
# --------------------------------------------------------------------------

@register("l2_delta_extraction", "L2", _SIDES_SQL + """
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_b
WHERE version > TIMESTAMP '1999-06-01 00:00:00'
""", "Rows changed since the last sync watermark (predicate pushes to scan; "
     "streaming twin is the watermark in streaming/incremental.py)")
def l2_delta_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = side_b(spark, sf_dir)
    return b.filter(F.expr("version > TIMESTAMP_NTZ '1999-06-01 00:00:00'")).select(
        "key", "price", fmt_ts("version").alias("version_s")
    )


# --------------------------------------------------------------------------
# L3 / L6: LWW merge (union + per-key top-1) = the synced final state
# --------------------------------------------------------------------------

def lww_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Resolve two keyed+versioned snapshots to one: per key, keep the
    row with the greatest version; tie -> side 'b' wins (deterministic).

    If an input already carries a ``side`` column it is preserved - the
    incremental loop (L7) folds batches into an accumulated store whose
    rows must keep their original provenance, not be re-stamped per
    merge.

    The resolution order is (version DESC, side DESC, payload DESC):
    after folds both inputs can carry the SAME preserved side, so rows
    tying on (version, side) with different payloads would otherwise
    resolve arbitrarily - the payload columns (every column except
    key/version/side, in name order) are the final deterministic
    tiebreak.

    Physical shape: union + ONE aggregation on key, where the winner
    is max(struct(version, side, payload...)) - structs compare
    lexicographically by field order, so the max IS the top-1 of the
    resolution order. Struct max compiles to a SortAggregate (struct
    buffers aren't hash-aggregable), but the property that scales is
    the PARTIAL max before the exchange: unlike a window top-1
    (shuffle every raw row, then sort each key group), the shuffle
    carries one candidate per (task, key) and a hot key collapses
    map-side - strictly less shuffle at 100 TB, and measurably faster
    at bench scale (l3 0.63 -> 0.31 s).
    """
    if "side" not in a.columns:
        a = a.withColumn("side", F.lit("a"))
    if "side" not in b.columns:
        b = b.withColumn("side", F.lit("b"))
    u = a.unionByName(b)
    payload = sorted(c for c in u.columns if c not in ("key", "version", "side"))
    ordcols = ["version", "side", *payload]
    winner = u.groupBy("key").agg(F.max(F.struct(*ordcols)).alias("_w"))
    return winner.select(
        "key", *[F.col(f"_w.{c}").alias(c) for c in ordcols]
    ).select(*u.columns)


_L3_ORACLE = _SIDES_SQL + """
, u AS (
  SELECT key, price, version, 'a' AS side FROM side_a
  UNION ALL
  SELECT key, price, version, 'b' AS side FROM side_b
)
SELECT key, side, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                   ORDER BY version DESC, side DESC, price DESC) AS rn
      FROM u)
WHERE rn = 1
"""


@register("l3_lww_merge", "L3", _L3_ORACLE,
          "Last-write-wins conflict resolution across both snapshots; "
          "the output IS the converged store state (full-sync result, L6)")
def l3_lww_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = lww_merge(side_a(spark, sf_dir), side_b(spark, sf_dir))
    return merged.select("key", "side", "price", fmt_ts("version").alias("version_s"))


@register("l6_full_sync_stats", "L6", _L3_ORACLE.replace(
    """SELECT key, side, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM""", """SELECT side, COUNT(*) AS n_rows,
       CAST(CAST(SUM(CAST(price AS DECIMAL(38,10))) AS DECIMAL(38,6)) AS DOUBLE) AS total_price
FROM""") + " GROUP BY side",
    "Full-sync bootstrap summary: which side won how many keys, and the "
    "converged total (scan -> type bridge -> merge -> stats)")
def l6_full_sync_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    merged = lww_merge(side_a(spark, sf_dir), side_b(spark, sf_dir))
    return merged.groupBy("side").agg(
        F.count("*").alias("n_rows"),
        # Scale 6: the % 10 = 0 edits multiply 2-dp prices by 1.1, so the
        # summed content has >2 dp; 6 is lossless and fits 2^53 here.
        F.sum(F.col("price").cast("decimal(38,10)"))
         .cast("decimal(38,6)").cast("double").alias("total_price"),
    )


# --------------------------------------------------------------------------
# L4: idempotent upsert set
# --------------------------------------------------------------------------

_L4_ORACLE = _SIDES_SQL + """
, u AS (
  SELECT key, price, version, 'a' AS side FROM side_a
  UNION ALL
  SELECT key, price, version, 'b' AS side FROM side_b
),
final AS (
  SELECT key, price, version FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY version DESC, side DESC, price DESC) AS rn FROM u)
  WHERE rn = 1
)
SELECT f.key, f.price,
       STRFTIME(DATE_TRUNC('second', f.version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM final f LEFT JOIN side_a a ON f.key = a.key
WHERE a.key IS NULL OR f.version <> a.version OR f.price <> a.price
"""


@register("l4_upsert_set", "L4", _L4_ORACLE,
          "The exact row set to apply to store A so it converges; "
          "re-application is a no-op (idempotence property-tested)")
def l4_upsert_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir)
    merged = lww_merge(a, side_b(spark, sf_dir)).select("key", "price", "version")
    f, aa = merged.alias("f"), a.alias("a")
    return (
        f.join(aa, F.col("f.key") == F.col("a.key"), "left")
        .filter(
            F.col("a.key").isNull()
            | (F.col("f.version") != F.col("a.version"))
            | (F.col("f.price") != F.col("a.price"))
        )
        .select(
            F.col("f.key").alias("key"),
            F.col("f.price").alias("price"),
            fmt_ts(F.col("f.version")).alias("version_s"),
        )
    )


def apply_upserts(target: DataFrame, upserts: DataFrame) -> DataFrame:
    """Apply a keyed upsert set: replace matching keys, add new ones.

    On plain parquet this is the honest merge (anti join + union); on an
    ACID table format at 100 TB it becomes MERGE INTO. Idempotent by
    construction: applying the same set twice is a no-op.
    """
    keep = target.join(upserts.select("key"), "key", "left_anti")
    return keep.unionByName(upserts)


# --------------------------------------------------------------------------
# L5: deletion propagation
# --------------------------------------------------------------------------

@register("l5_deletion_propagation", "L5", _SIDES_SQL + """
SELECT a.key,
       STRFTIME(DATE_TRUNC('second', a.version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a a LEFT JOIN side_b b ON a.key = b.key
WHERE b.key IS NULL
  AND a.version >= TIMESTAMP '1997-01-01 00:00:00'
""", "Keys to delete from A: absent on B although inside B's covered "
     "window (=> deleted there, not merely unsynced). Interpretation "
     "flagged in SURVEY.md 2.L row L5.")
def l5_deletion_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).alias("a")
    b = side_b(spark, sf_dir).alias("b")
    return (
        a.join(b, F.col("a.key") == F.col("b.key"), "left_anti")
        .filter(F.expr("version >= TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        .select(F.col("key"), fmt_ts("version").alias("version_s"))
    )


# --------------------------------------------------------------------------
# L3b: FIELD-level LWW (per-column winners - the Cassandra cell model)
# --------------------------------------------------------------------------

_FIELD_SIDES_SQL = _SIDES_SQL + """
, fa AS (
  SELECT key, price, o.o_orderstatus AS status,
         version AS price_version,
         version + (key % 3 - 1) * INTERVAL 1 DAY AS status_version
  FROM side_a JOIN orders o ON side_a.key = o.o_orderkey
),
fb AS (
  SELECT key, price, o.o_orderstatus AS status,
         version AS price_version,
         version + (key % 5 - 2) * INTERVAL 1 DAY AS status_version
  FROM side_b JOIN orders o ON side_b.key = o.o_orderkey
)
"""


@register("l3b_field_lww_merge", "L3", _FIELD_SIDES_SQL + """
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN a.key IS NULL THEN b.price
            WHEN b.key IS NULL THEN a.price
            WHEN b.price_version >= a.price_version THEN b.price
            ELSE a.price END AS price,
       CASE WHEN a.key IS NULL THEN b.status
            WHEN b.key IS NULL THEN a.status
            WHEN b.status_version >= a.status_version THEN b.status
            ELSE a.status END AS status,
       CASE WHEN a.key IS NULL THEN 'b' WHEN b.key IS NULL THEN 'a'
            WHEN b.price_version >= a.price_version THEN 'b' ELSE 'a' END AS price_from,
       CASE WHEN a.key IS NULL THEN 'b' WHEN b.key IS NULL THEN 'a'
            WHEN b.status_version >= a.status_version THEN 'b' ELSE 'a' END AS status_from
FROM fa a FULL OUTER JOIN fb b ON a.key = b.key
""", "FIELD-level LWW: each column resolves independently by its own "
     "write timestamp (Cassandra's cell-level reconciliation) - a "
     "merged row can mix fields from both stores. Per-field versions "
     "derived deterministically from the fixture.")
def l3b_field_lww_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_orderstatus"
    )

    def with_fields(side: DataFrame, mod: int, shift: int) -> DataFrame:
        return side.join(o, "key").select(
            "key",
            "price",
            F.col("o_orderstatus").alias("status"),
            F.col("version").alias("price_version"),
            (F.col("version")
             + ((F.col("key") % mod - shift)) * F.expr("INTERVAL 1 DAY")
             ).alias("status_version"),
        )

    a = with_fields(side_a(spark, sf_dir), 3, 1).alias("a")
    b = with_fields(side_b(spark, sf_dir), 5, 2).alias("b")
    ak, bk = F.col("a.key"), F.col("b.key")
    j = a.join(b, ak == bk, "full")

    def pick(field: str, version: str):
        return (
            F.when(ak.isNull(), F.col(f"b.{field}"))
            .when(bk.isNull(), F.col(f"a.{field}"))
            .when(F.col(f"b.{version}") >= F.col(f"a.{version}"), F.col(f"b.{field}"))
            .otherwise(F.col(f"a.{field}"))
        )

    def origin(version: str):
        return (
            F.when(ak.isNull(), "b").when(bk.isNull(), "a")
            .when(F.col(f"b.{version}") >= F.col(f"a.{version}"), "b")
            .otherwise("a")
        )

    return j.select(
        F.coalesce(ak, bk).alias("key"),
        pick("price", "price_version").alias("price"),
        pick("status", "status_version").alias("status"),
        origin("price_version").alias("price_from"),
        origin("status_version").alias("status_from"),
    )


# --------------------------------------------------------------------------
# L5b: tombstone deletes (the modern deletion-propagation semantics)
# --------------------------------------------------------------------------

_TOMBSTONE_SQL = _SIDES_SQL + """
, ta AS (SELECT key, price, version, FALSE AS deleted FROM side_a),
tb AS (
  SELECT key, price,
         CASE WHEN key % 50 = 0 THEN version + INTERVAL 30 DAY ELSE version END AS version,
         (key % 50 = 0) AS deleted
  FROM side_b
),
u AS (
  SELECT key, price, version, deleted, 'a' AS side FROM ta
  UNION ALL
  SELECT key, price, version, deleted, 'b' AS side FROM tb
),
winner AS (
  SELECT key, price, version, deleted FROM
    (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                  ORDER BY version DESC, side DESC, deleted DESC, price DESC) AS rn FROM u)
  WHERE rn = 1
)
"""


@register("l5b_tombstone_merge", "L5", _TOMBSTONE_SQL + """
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM winner WHERE NOT deleted
""", "Tombstone deletion propagation: deletes are versioned rows that "
     "compete in LWW like any write (the Cassandra tombstone model); "
     "a key vanishes from the converged state only if the tombstone is "
     "the newest version. Subsumes the anti-join heuristic of L5.")
def l5b_tombstone_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).withColumn("deleted", F.lit(False))
    b = side_b(spark, sf_dir).withColumn("deleted", F.col("key") % 50 == 0).withColumn(
        "version",
        F.when(F.col("key") % 50 == 0,
               F.col("version") + F.expr("INTERVAL 30 DAY")).otherwise(F.col("version")),
    )
    merged = lww_merge(a, b)
    return merged.filter(~F.col("deleted")).select(
        "key", "price", fmt_ts("version").alias("version_s")
    )


# --------------------------------------------------------------------------
# L5c: gc_grace tombstone compaction (when is a delete safe to forget?)
# --------------------------------------------------------------------------

@register("l5c_gc_grace_purge", "L5", _TOMBSTONE_SQL + """
, now_t AS (SELECT MAX(version) AS now FROM winner)
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s,
       CASE WHEN deleted THEN 'tombstone_retained' ELSE 'live' END AS status
FROM winner, now_t
WHERE NOT deleted OR version >= now - INTERVAL 400 DAY
""", "gc_grace_seconds compaction semantics: tombstones must OUTLIVE "
     "the repair window (so every replica/follower hears about the "
     "delete) and only then may be forgotten - purging early "
     "resurrects deleted rows from a lagging replica, keeping them "
     "forever bloats every scan. The compacted state = live rows + "
     "tombstones younger than now - grace (400 days against the "
     "corpus max version, deterministic); older tombstones vanish. "
     "One broadcast 1-row 'now' against the merged state - the same "
     "plan shape at any scale. Complements l5b (which proves deletes "
     "WIN the merge) with the lifecycle end (when the marker itself "
     "may die).")
def l5c_gc_grace_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).withColumn("deleted", F.lit(False))
    b = side_b(spark, sf_dir).withColumn("deleted", F.col("key") % 50 == 0).withColumn(
        "version",
        F.when(F.col("key") % 50 == 0,
               F.col("version") + F.expr("INTERVAL 30 DAY")).otherwise(F.col("version")),
    )
    merged = lww_merge(a, b)
    now = merged.agg(F.max("version").alias("now"))
    return (
        merged.crossJoin(F.broadcast(now))
        .filter(~F.col("deleted")
                | (F.col("version") >= F.col("now") - F.expr("INTERVAL 400 DAY")))
        .select(
            "key", "price", fmt_ts("version").alias("version_s"),
            F.when(F.col("deleted"), "tombstone_retained")
             .otherwise("live").alias("status"),
        )
    )


# --------------------------------------------------------------------------
# L8: changefeed derivation (snapshot pair -> CDC events)
# --------------------------------------------------------------------------

@register("l8_changefeed", "L1+L4", _SIDES_SQL + """
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN a.key IS NULL THEN 'insert'
            WHEN b.key IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       b.price AS new_price,
       a.price AS old_price,
       STRFTIME(DATE_TRUNC('second', COALESCE(b.version, a.version)),
                '%Y-%m-%d %H:%M:%S') AS change_version
FROM side_a a FULL OUTER JOIN side_b b ON a.key = b.key
WHERE a.key IS NULL OR b.key IS NULL
   OR a.version <> b.version OR a.price <> b.price
""", "Changefeed derivation: the CDC event stream that transforms "
     "snapshot A into snapshot B (insert/update/delete with old+new "
     "values) - the inverse of apply_upserts, and what a 2013-era "
     "Cassandra without CDC must reconstruct by diffing. One full-outer "
     "join; at 100 TB both sides bucket on the key so the diff is "
     "shuffle-free (sources/storage.py bucketing).")
def l8_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).alias("a")
    b = side_b(spark, sf_dir).alias("b")
    ak, bk = F.col("a.key"), F.col("b.key")
    return (
        a.join(b, ak == bk, "full")
        .filter(
            ak.isNull() | bk.isNull()
            | (F.col("a.version") != F.col("b.version"))
            | (F.col("a.price") != F.col("b.price"))
        )
        .select(
            F.coalesce(ak, bk).alias("key"),
            F.when(ak.isNull(), "insert")
             .when(bk.isNull(), "delete")
             .otherwise("update").alias("op"),
            F.col("b.price").alias("new_price"),
            F.col("a.price").alias("old_price"),
            fmt_ts(F.coalesce(F.col("b.version"), F.col("a.version")))
             .alias("change_version"),
        )
    )


@register("l9_conflict_audit", "L1+L3", _SIDES_SQL + """
SELECT key,
       a.price AS price_a, b.price AS price_b,
       STRFTIME(DATE_TRUNC('second', a.version), '%Y-%m-%d %H:%M:%S') AS version_a_s,
       STRFTIME(DATE_TRUNC('second', b.version), '%Y-%m-%d %H:%M:%S') AS version_b_s,
       CASE WHEN a.version > b.version THEN 'a'
            WHEN b.version > a.version THEN 'b'
            ELSE 'tie' END AS newer_side
FROM side_a a JOIN side_b b USING (key)
WHERE a.price <> b.price OR a.version <> b.version
""", "Conflict audit log: keys BOTH stores hold with diverging payload "
     "or version, with which side is newer - the reconciliation report "
     "an operator reviews before trusting an LWW run (the reference "
     "syncs silently; an audit trail is what production adds first). "
     "One inner join on the key, same shuffle shape as the L1 diff.")
def l9_conflict_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = side_a(spark, sf_dir).alias("a")
    b = side_b(spark, sf_dir).alias("b")
    av, bv = F.col("a.version"), F.col("b.version")
    return (
        a.join(b, F.col("a.key") == F.col("b.key"))
        .filter((F.col("a.price") != F.col("b.price")) | (av != bv))
        .select(
            F.col("a.key").alias("key"),
            F.col("a.price").alias("price_a"),
            F.col("b.price").alias("price_b"),
            fmt_ts(av).alias("version_a_s"),
            fmt_ts(bv).alias("version_b_s"),
            F.when(av > bv, "a").when(bv > av, "b").otherwise("tie")
             .alias("newer_side"),
        )
    )


@register("l10_three_way_merge", "L3+L6", _SIDES_SQL + """
, side_c AS (
  SELECT o_orderkey AS key,
         o_totalprice * 0.9 AS price,
         o_orderdate + INTERVAL 2 DAY AS version
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND o_orderkey % 5 = 0
),
u AS (
  SELECT key, price, version, 'a' AS side FROM side_a
  UNION ALL SELECT key, price, version, 'b' AS side FROM side_b
  UNION ALL SELECT key, price, version, 'c' AS side FROM side_c
)
SELECT key, side, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                   ORDER BY version DESC, side DESC, price DESC) AS rn
      FROM u)
WHERE rn = 1
""", "Three-store LWW convergence: the reference syncs exactly two "
     "stores; a third replica (side_c: a late bulk re-price feed) folds "
     "in through the SAME associative max(struct) merge - lww_merge "
     "composes n-way because last-write-wins is a semilattice join. "
     "Still one union + one hash aggregation, shuffling each store once.")
def l10_three_way_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c_side = (
        o.filter(F.expr("o_orderdate >= TIMESTAMP_NTZ '1999-01-01 00:00:00'"))
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice") * 0.9).alias("price"),
            (F.col("o_orderdate") + F.expr("INTERVAL 2 DAY")).alias("version"),
        )
        .withColumn("side", F.lit("c"))
    )
    merged = lww_merge(lww_merge(side_a(spark, sf_dir), side_b(spark, sf_dir)), c_side)
    return merged.select("key", "side", "price", fmt_ts("version").alias("version_s"))


@register("l11_sync_lag_percentiles", "L7+D6", """
WITH gaps AS (
  SELECT event_type,
         EPOCH_US(ts) - LAG(EPOCH_US(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(gap_us) AS n_gaps,
       ROUND(QUANTILE_CONT(gap_us, 0.5) / 1000000.0, 6) AS p50_s,
       ROUND(QUANTILE_CONT(gap_us, 0.95) / 1000000.0, 6) AS p95_s,
       ROUND(MAX(gap_us) / 1000000.0, 6) AS max_s
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY event_type
""", "Sync-health monitoring: inter-arrival gap percentiles per "
     "change-stream partition (event_type stands in for the "
     "token-range/shard) - the p95 lag panel every replication "
     "pipeline alarms on. LAG over a window PARTITIONED by the "
     "stream key (bounded per-key history), gaps in exact integer "
     "microseconds (unix_micros/EPOCH_US agree because the session "
     "TZ is pinned UTC), percentile interpolation on integers, one "
     "final divide to seconds - every number bit-reproducible. "
     "Same exact-percentile scale caveat as k_mad_outliers: per-key "
     "multisets at the reducer; swap approx_percentile at 100 TB.")
def l11_sync_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1000000.0, 6).alias("p50_s"),
        F.round(F.percentile("gap_us", F.lit(0.95)) / 1000000.0, 6).alias("p95_s"),
        F.round(F.max("gap_us") / 1000000.0, 6).alias("max_s"),
    )


@register("l12_time_travel_read", "L1+A7", """
WITH v1 AS (
  SELECT o_orderkey AS key, o_orderpriority AS pri, o_totalprice AS price
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
),
ins2 AS (
  SELECT o_orderkey AS key, o_orderpriority AS pri, o_totalprice AS price
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
),
v2 AS (
  SELECT key, pri,
         CASE WHEN key % 100 = 0 THEN price * 1.1 ELSE price END AS price
  FROM v1
  UNION ALL
  SELECT key, pri, price FROM ins2
)
SELECT pri, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(price AS DECIMAL(38,10))) AS DECIMAL(38,4))
            AS DOUBLE) AS revenue
FROM v2
GROUP BY pri
""", "Snapshot-versioned time travel: the store keeps every sync "
     "cycle's full snapshot as an immutable version directory "
     "(v1: pre-1995 orders; v2: + 1995-96 inserts and a 10% reprice "
     "of every key%100==0 row; v3: everything) and a reader pins "
     "version 2 - 'the table as of cycle 2', the audit/debug/"
     "reproducibility read a lakehouse MERGE sink gives via Delta/"
     "Iceberg snapshot IDs and this engine gives via its "
     "snapshot-swap store layout (A7). The query round-trips v2 "
     "through parquet and aggregates; the oracle reconstructs v2 "
     "relationally - equality proves version isolation (no v3 rows "
     "leak, updates-in-place at v2 visible). Writes are immutable "
     "and version selection is planning-time directory choice, so "
     "time travel costs nothing at read scale.")
def l12_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("price"),
        "o_orderdate",
    )
    v1 = base.filter(F.expr("o_orderdate < TIMESTAMP_NTZ '1995-01-01 00:00:00'"))
    ins2 = base.filter(
        F.expr("o_orderdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'")
        & F.expr("o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'")
    )
    v2 = v1.withColumn(
        "price",
        F.when(F.col("key") % 100 == 0, F.col("price") * 1.1).otherwise(
            F.col("price")
        ),
    ).unionByName(ins2)
    v3 = v2.unionByName(
        base.filter(F.expr("o_orderdate >= TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    root = tempfile.mkdtemp(prefix="ces_timetravel_")
    try:
        for ver, df in (("v1", v1), ("v2", v2), ("v3", v3)):
            df.select("key", "pri", "price").write.mode("overwrite").parquet(
                os.path.join(root, ver)
            )
        pinned = spark.read.parquet(os.path.join(root, "v2"))  # time travel
        from cassandra_elasticsearch_sync_spark.parity import dsum

        out = (
            pinned.groupBy("pri")
            .agg(F.count("*").alias("n"), dsum("price", 4).alias("revenue"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@register("l13_checksum_reconciliation", "L1+H7", _SIDES_SQL + """
, ha AS (
  SELECT key % 64 AS bucket,
         CAST(('0x' || SUBSTR(MD5(
             CAST(key AS VARCHAR) || '|' ||
             CAST(CAST(price AS DECIMAL(14,2)) AS VARCHAR) || '|' ||
             STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S')
           ), 1, 15)) AS BIGINT) AS rh
  FROM side_a
),
hb AS (
  SELECT key % 64 AS bucket,
         CAST(('0x' || SUBSTR(MD5(
             CAST(key AS VARCHAR) || '|' ||
             CAST(CAST(price AS DECIMAL(14,2)) AS VARCHAR) || '|' ||
             STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S')
           ), 1, 15)) AS BIGINT) AS rh
  FROM side_b
),
ca AS (SELECT bucket, BIT_XOR(rh) AS sig, COUNT(*) AS n FROM ha GROUP BY bucket),
cb AS (SELECT bucket, BIT_XOR(rh) AS sig, COUNT(*) AS n FROM hb GROUP BY bucket)
SELECT COALESCE(ca.bucket, cb.bucket) AS bucket,
       COALESCE(ca.n, 0) AS n_a, COALESCE(cb.n, 0) AS n_b,
       (ca.sig IS NOT NULL AND cb.sig IS NOT NULL AND ca.sig = cb.sig
        AND ca.n = cb.n) AS in_sync
FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
""", "Checksum reconciliation (anti-entropy): instead of shipping "
     "both stores to compare row-by-row, each side reduces every "
     "key bucket to an order-independent XOR of portable row "
     "hashes; only the per-bucket (signature, count) pairs - 64 "
     "tiny rows per store, whatever the data size - cross the "
     "network, and a signature mismatch marks the bucket for "
     "targeted repair. This is Cassandra's Merkle-tree repair / "
     "DynamoDB anti-entropy shape, one level deep; nesting the "
     "same reduction gives the full tree. The row hash covers "
     "key, 2-dp price and second-truncated version through the "
     "engine's portable md5-60 (identical in both engines); XOR "
     "is commutative so no ordering is ever needed.")
def l13_checksum_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.pipeline.hashing import portable_hash60

    def bucketed_sig(df: DataFrame) -> DataFrame:
        payload = F.concat_ws(
            "|",
            F.col("key").cast("string"),
            F.col("price").cast("decimal(14,2)").cast("string"),
            fmt_ts("version"),
        )
        return (
            df.select((F.col("key") % 64).alias("bucket"),
                      portable_hash60(payload).alias("rh"))
            .groupBy("bucket")
            .agg(F.expr("bit_xor(rh)").alias("sig"), F.count("*").alias("n"))
        )
    ca = bucketed_sig(side_a(spark, sf_dir)).alias("ca")
    cb = bucketed_sig(side_b(spark, sf_dir)).alias("cb")
    j = ca.join(cb, F.col("ca.bucket") == F.col("cb.bucket"), "full_outer")
    return j.select(
        F.coalesce(F.col("ca.bucket"), F.col("cb.bucket")).alias("bucket"),
        F.coalesce(F.col("ca.n"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("cb.n"), F.lit(0)).alias("n_b"),
        (
            F.col("ca.sig").isNotNull()
            & F.col("cb.sig").isNotNull()
            & (F.col("ca.sig") == F.col("cb.sig"))
            & (F.col("ca.n") == F.col("cb.n"))
        ).alias("in_sync"),
    )


@register("l14_acid_merge_upsert", "A7+L4", _SIDES_SQL + """
SELECT key, price, version_s FROM (
  SELECT COALESCE(t.key, s.key) AS key,
         CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
              THEN s.price ELSE t.price END AS price,
         STRFTIME(DATE_TRUNC('second',
           CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
                THEN s.version ELSE t.version END), '%Y-%m-%d %H:%M:%S') AS version_s,
         CASE WHEN s.key IS NOT NULL AND s.key % 100 = 0 THEN 1 ELSE 0 END AS deleted
  FROM side_a t FULL OUTER JOIN side_b s ON t.key = s.key
) WHERE deleted = 0
""", "ACID MERGE INTO (sources/acid.py): side_a is committed as a "
     "manifest-backed transactional table, then side_b merges in with "
     "WHEN MATCHED AND src.version > tgt.version THEN UPDATE (LWW), "
     "WHEN MATCHED AND src.key % 100 = 0 THEN DELETE, WHEN NOT "
     "MATCHED THEN INSERT (deletes of absent keys are no-ops). The "
     "read-back snapshot hash-matches the relational oracle - MERGE "
     "semantics, not just convergence. Scale shape: copy-on-write "
     "rewrites only data files containing matched keys (file-pruned "
     "via a broadcast semi-join on source keys), the commit is one "
     "conditional put, and concurrent readers keep their snapshot "
     "- the Delta/Iceberg upsert path the A7 sink upgrades to at "
     "100 TB, demonstrated and tested (tests/test_acid_merge.py), "
     "not just documented.")
def l14_acid_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_merge_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        t.merge_into(
            side_b(spark, sf_dir),
            ["key"],
            matched_condition=F.col("src.version") > F.col("tgt.version"),
            delete_condition=F.col("src.key") % 100 == 0,
        )
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l15_acid_stats_pruned_read", "A7+A1", """
SELECT o_orderkey AS key, o_totalprice AS price
FROM orders
WHERE o_orderkey > (SELECT MAX(o_orderkey) // 2 FROM orders)
""", "Stats-pruned read of the ACID table (sources/acid.py "
     "read_where): orders commit in two key-range-clustered data "
     "directories (lower half, then upper half via a pure-insert "
     "MERGE), and the range read key > max/2 plans against the "
     "manifest's per-entry min/max column statistics - the lower "
     "directory is skipped WITHOUT being opened, which at 100 TB on "
     "a key- or time-clustered table is the difference between "
     "scanning a day and scanning a decade. The pruned result "
     "hash-matches the plain relational filter; candidate-set "
     "correctness and soundness-without-stats are pinned in "
     "tests/test_acid_merge.py.")
def l15_acid_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    half = o.agg((F.max("key") / 2).cast("bigint").alias("h")).collect()[0]["h"]
    root = tempfile.mkdtemp(prefix="ces_acid_prune_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(o.filter(F.col("key") <= half))
        t.merge_into(o.filter(F.col("key") > half), ["key"])
        cand = t.candidate_files("key", lo=int(half) + 1)
        total = len(t._manifest(t.current_version())["files"])
        if not (len(cand) < total):
            raise AssertionError("stats pruning did not skip the lower dir")
        return t.read_where("key", lo=int(half) + 1).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l18_acid_delete_where", "A7+L5", """
SELECT o_orderkey AS key, o_totalprice AS price
FROM orders
WHERE NOT (o_orderkey > (SELECT MAX(o_orderkey) // 2 FROM orders)
           AND o_orderkey % 7 = 0)
""", "Copy-on-write DELETE (sources/acid.py delete_where): orders "
     "commit as two key-range entries, then DELETE WHERE key > max/2 "
     "AND key % 7 = 0 rewrites ONLY the upper entry - the query "
     "asserts the lower entry is carried into the new manifest "
     "byte-for-byte before hash-matching the relational anti-filter. "
     "The affected-file probe is one input_file_name job with a "
     "files-not-rows collect, so a predicate touching 1% of a 100 TB "
     "table rewrites 1% of it - the DELETE/UPDATE contract of a real "
     "lakehouse format (tests/test_acid_merge.py covers NULL-predicate "
     "SQL semantics and UPDATE SET).")
def l18_acid_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    half = o.agg((F.max("key") / 2).cast("bigint").alias("h")).collect()[0]["h"]
    root = tempfile.mkdtemp(prefix="ces_acid_delete_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(o.filter(F.col("key") <= half))
        t.merge_into(o.filter(F.col("key") > half), ["key"])
        before = set(t._manifest(t.current_version())["files"])
        t.delete_where((F.col("key") > half) & (F.col("key") % 7 == 0))
        after = set(t._manifest(t.current_version())["files"])
        if not (before & after):
            raise AssertionError("CoW delete rewrote the untouched entry")
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l19_acid_mor_delete", "A7+L5", """
SELECT o_orderkey AS key, o_totalprice AS price
FROM orders
WHERE o_orderkey % 13 <> 0
""", "Merge-on-read equality deletes (sources/acid.py delete_keys_mor "
     "+ compact_deletes): deleting every 13th order commits an "
     "O(deleted-keys) DELETE FILE - the query asserts ZERO data files "
     "were rewritten - and the snapshot read applies it as a broadcast "
     "anti-join scoped by per-entry sequence numbers (a later "
     "re-insert of a deleted key survives; Iceberg v2 / Delta deletion "
     "vectors). compact_deletes then materializes the mask using the "
     "manifest key statistics and the compacted table hash-matches the "
     "same oracle - write path O(deletes), maintenance path O(affected "
     "files), never O(table), which is the only delete design that "
     "works when the table is 100 TB and the delete is 1000 rows.")
def l19_acid_mor_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), F.col("o_totalprice").alias("price")
    )
    root = tempfile.mkdtemp(prefix="ces_acid_mor_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(o)
        before = t._manifest(t.current_version())["files"]
        t.delete_keys_mor(o.filter(F.col("key") % 13 == 0).select("key"), ["key"])
        m = t._manifest(t.current_version())
        if m["files"] != before or not m["deletes"]:
            raise AssertionError("MoR delete must not rewrite data files")
        t.compact_deletes()
        if t._manifest(t.current_version())["deletes"]:
            raise AssertionError("compaction left delete files behind")
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l11b_sync_lag_percentiles_approx", "L7+D6", None,
          "Sync-lag monitoring with approx_percentile - the scale form "
          "of l11 for when the stream key is a real shard id with "
          "millions of values. The LAG window stays per-key (bounded "
          "history); the gap quantiles come from mergeable sketches, "
          "so the aggregation is map-side partial + merge regardless "
          "of key cardinality. Rows-only by design; l11 is the exact "
          "hash-checked twin.")
def l11b_sync_lag_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.approx_percentile("gap_us", F.lit(0.5), F.lit(10000)) / 1000000.0, 6)
         .alias("p50_s"),
        F.round(F.approx_percentile("gap_us", F.lit(0.95), F.lit(10000)) / 1000000.0, 6)
         .alias("p95_s"),
        F.round(F.max("gap_us") / 1000000.0, 6).alias("max_s"),
    )


@register("l16_acid_zorder_pruned_scan", "A7+A1", """
WITH b AS (SELECT CAST(FLOOR(MAX(o_custkey) * 0.25) AS BIGINT) AS lo,
                  CAST(FLOOR(MAX(o_custkey) * 0.5)  AS BIGINT) AS hi
           FROM orders)
SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price
FROM orders, b
WHERE o_custkey >= b.lo AND o_custkey <= b.hi
""", "Z-order-clustered ACID scan: the table is rewritten once by "
     "OPTIMIZE ZORDER BY (okey, ckey) - Morton-interleaved range "
     "slices with per-entry min/max statistics - and then a range "
     "probe on the SECOND clustering column (the one a linear sort "
     "cannot serve) still skips manifest entries without opening "
     "them; the query asserts the skip happened. This is the "
     "multi-dimensional pruning story at 100 TB: one layout serving "
     "range reads on several columns at once. Contents are "
     "rewrite-invariant - the pruned result hash-matches the plain "
     "relational filter; the linear-vs-zorder pruning contrast is "
     "pinned in tests/test_acid_merge.py.")
def l16_acid_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        F.col("o_totalprice").alias("price"),
    )
    mx = o.agg(F.max("ckey").alias("m")).collect()[0]["m"]
    lo, hi = int(mx * 0.25), int(mx * 0.5)
    root = tempfile.mkdtemp(prefix="ces_acid_zorder_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(o)
        t.optimize(["okey", "ckey"], n_slices=8, zorder=True)
        cand = t.candidate_files("ckey", lo=lo, hi=hi)
        total = len(t._manifest(t.current_version())["files"])
        if not (len(cand) < total):
            raise AssertionError(
                "z-order stats pruning skipped nothing on the 2nd column")
        return t.read_where("ckey", lo=lo, hi=hi).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l17_acid_schema_evolution", "A7+A4", """
WITH half AS (SELECT MAX(o_orderkey) // 2 AS h FROM orders)
SELECT o_orderkey AS key, o_totalprice AS price,
       CASE WHEN o_orderkey > (SELECT h FROM half)
            THEN o_orderpriority END AS priority
FROM orders
""", "ACID schema evolution end-to-end: the table commits WITHOUT the "
     "priority column, ALTER TABLE ADD COLUMNS widens the schema as a "
     "metadata-only commit (zero bytes rewritten, O(1) at any table "
     "size), and a subsequent MERGE writes the column for the rows it "
     "touches - old untouched files read NULL through the widened "
     "schema, exactly a real format's contract. The result "
     "hash-matches the relational CASE twin; time travel to the "
     "pre-evolution snapshot keeps the narrow schema "
     "(tests/test_acid_merge.py).")
def l17_acid_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql.types import StringType, StructField

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    o = load_table(spark, sf_dir, "orders")
    half = o.agg((F.max("o_orderkey") / 2).cast("bigint").alias("h")) \
        .collect()[0]["h"]
    narrow = o.select(F.col("o_orderkey").alias("key"),
                      F.col("o_totalprice").alias("price"))
    wide_upper = o.filter(F.col("o_orderkey") > half).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    root = tempfile.mkdtemp(prefix="ces_acid_evo_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(narrow)
        t.add_columns([StructField("priority", StringType())])
        t.merge_into(wide_upper, ["key"])
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_L20_RH = """CAST(('0x' || SUBSTR(MD5(
             CAST(key AS VARCHAR) || '|' ||
             CAST(CAST(price AS DECIMAL(14,2)) AS VARCHAR) || '|' ||
             STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S')
           ), 1, 15)) AS BIGINT)"""


@register("l20_merkle_repair_protocol", "L1+H7", _SIDES_SQL + f"""
, ha AS (SELECT key % 512 AS leaf, {_L20_RH} AS rh FROM side_a),
hb AS (SELECT key % 512 AS leaf, {_L20_RH} AS rh FROM side_b),
la3 AS (SELECT leaf AS node, BIT_XOR(rh) AS sig, COUNT(*) AS n FROM ha GROUP BY 1),
lb3 AS (SELECT leaf AS node, BIT_XOR(rh) AS sig, COUNT(*) AS n FROM hb GROUP BY 1),
la2 AS (SELECT node // 8 AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM la3 GROUP BY 1),
lb2 AS (SELECT node // 8 AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM lb3 GROUP BY 1),
la1 AS (SELECT node // 8 AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM la2 GROUP BY 1),
lb1 AS (SELECT node // 8 AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM lb2 GROUP BY 1),
la0 AS (SELECT CAST(0 AS BIGINT) AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM la1),
lb0 AS (SELECT CAST(0 AS BIGINT) AS node, BIT_XOR(sig) AS sig, SUM(n) AS n FROM lb1),
m0 AS (SELECT COALESCE(a.node, b.node) AS node,
              (a.sig IS DISTINCT FROM b.sig OR a.n IS DISTINCT FROM b.n) AS mm
       FROM la0 a FULL OUTER JOIN lb0 b ON a.node = b.node),
m1 AS (SELECT COALESCE(a.node, b.node) AS node,
              (a.sig IS DISTINCT FROM b.sig OR a.n IS DISTINCT FROM b.n) AS mm
       FROM la1 a FULL OUTER JOIN lb1 b ON a.node = b.node),
m2 AS (SELECT COALESCE(a.node, b.node) AS node,
              (a.sig IS DISTINCT FROM b.sig OR a.n IS DISTINCT FROM b.n) AS mm
       FROM la2 a FULL OUTER JOIN lb2 b ON a.node = b.node),
m3 AS (SELECT COALESCE(a.node, b.node) AS node,
              (a.sig IS DISTINCT FROM b.sig OR a.n IS DISTINCT FROM b.n) AS mm
       FROM la3 a FULL OUTER JOIN lb3 b ON a.node = b.node),
c1 AS (SELECT m1.node, m1.mm, m0.mm AS compared
       FROM m1 CROSS JOIN m0),
c2 AS (SELECT m2.node, m2.mm, (c1.mm AND c1.compared) AS compared
       FROM m2 JOIN c1 ON m2.node // 8 = c1.node),
c3 AS (SELECT m3.node, m3.mm, (c2.mm AND c2.compared) AS compared
       FROM m3 JOIN c2 ON m3.node // 8 = c2.node)
SELECT 0 AS level, COUNT(*) AS n_nodes, COUNT(*) AS n_compared,
       CAST(SUM(CASE WHEN mm THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched
FROM m0
UNION ALL
SELECT 1, COUNT(*),
       CAST(SUM(CASE WHEN compared THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN mm AND compared THEN 1 ELSE 0 END) AS BIGINT)
FROM c1
UNION ALL
SELECT 2, COUNT(*),
       CAST(SUM(CASE WHEN compared THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN mm AND compared THEN 1 ELSE 0 END) AS BIGINT)
FROM c2
UNION ALL
SELECT 3, COUNT(*),
       CAST(SUM(CASE WHEN compared THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN mm AND compared THEN 1 ELSE 0 END) AS BIGINT)
FROM c3
""", "Full Merkle-tree anti-entropy protocol (the multi-level form "
     "l13 points at): 512 leaf buckets roll up through fanout-8 "
     "levels to a root signature per store; repair descends ONLY "
     "into mismatched nodes, and the output is the protocol trace - "
     "per level, how many nodes exist, how many were actually "
     "compared (children of mismatched parents), how many of those "
     "mismatched. Signatures are order-independent XORs of portable "
     "row hashes, so every level is one map-side-partial aggregate "
     "of the level below (leaf agg scans the stores once; upper "
     "levels aggregate 512/64/8 rows). At 100 TB the bytes on the "
     "wire are root + 8*mismatched-path nodes instead of the full "
     "key space - log-depth narrowing, Cassandra repair's exact "
     "shape, with the descend-only-on-mismatch rule computed in the "
     "query itself.")
def l20_merkle_repair_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_elasticsearch_sync_spark.pipeline.hashing import portable_hash60

    def leaf_sig(df: DataFrame) -> DataFrame:
        payload = F.concat_ws(
            "|",
            F.col("key").cast("string"),
            F.col("price").cast("decimal(14,2)").cast("string"),
            fmt_ts("version"),
        )
        return (
            df.select((F.col("key") % 512).alias("node"),
                      portable_hash60(payload).alias("rh"))
            .groupBy("node")
            .agg(F.expr("bit_xor(rh)").alias("sig"), F.count("*").alias("n"))
        )

    def roll(level_df: DataFrame) -> DataFrame:
        return (
            level_df.groupBy(
                F.floor(F.col("node") / 8).cast("bigint").alias("node"))
            .agg(F.expr("bit_xor(sig)").alias("sig"), F.sum("n").alias("n"))
        )

    def mm_join(a: DataFrame, b: DataFrame) -> DataFrame:
        a, b = a.alias("a"), b.alias("b")
        j = a.join(b, F.col("a.node") == F.col("b.node"), "full_outer")
        mm = (~F.col("a.sig").eqNullSafe(F.col("b.sig"))
              | ~F.col("a.n").eqNullSafe(F.col("b.n")))
        return j.select(
            F.coalesce(F.col("a.node"), F.col("b.node")).alias("node"),
            mm.alias("mm"),
        )

    la3 = leaf_sig(side_a(spark, sf_dir))
    lb3 = leaf_sig(side_b(spark, sf_dir))
    la2, lb2 = roll(la3), roll(lb3)
    la1, lb1 = roll(la2), roll(lb2)
    la0 = la1.agg(F.expr("bit_xor(sig)").alias("sig"), F.sum("n").alias("n")) \
             .select(F.lit(0).cast("bigint").alias("node"), "sig", "n")
    lb0 = lb1.agg(F.expr("bit_xor(sig)").alias("sig"), F.sum("n").alias("n")) \
             .select(F.lit(0).cast("bigint").alias("node"), "sig", "n")

    m0, m1, m2, m3 = (mm_join(la0, lb0), mm_join(la1, lb1),
                      mm_join(la2, lb2), mm_join(la3, lb3))
    c1 = m1.crossJoin(
        F.broadcast(m0.select(F.col("mm").alias("compared"))))
    c2 = (
        m2.alias("m")
        .join(F.broadcast(c1.select(
            F.col("node").alias("pnode"),
            (F.col("mm") & F.col("compared")).alias("pmm"))),
            F.floor(F.col("m.node") / 8).cast("bigint") == F.col("pnode"))
        .select("m.node", "m.mm", F.col("pmm").alias("compared"))
    )
    c3 = (
        m3.alias("m")
        .join(F.broadcast(c2.select(
            F.col("node").alias("pnode"),
            (F.col("mm") & F.col("compared")).alias("pmm"))),
            F.floor(F.col("m.node") / 8).cast("bigint") == F.col("pnode"))
        .select("m.node", "m.mm", F.col("pmm").alias("compared"))
    )

    def level_row(level: int, df: DataFrame, all_compared: bool = False):
        comp = F.lit(1) if all_compared else F.when(F.col("compared"), 1).otherwise(0)
        mmc = (F.when(F.col("mm"), 1).otherwise(0) if all_compared
               else F.when(F.col("mm") & F.col("compared"), 1).otherwise(0))
        return df.agg(
            F.lit(level).alias("level"),
            F.count("*").alias("n_nodes"),
            F.sum(comp).cast("bigint").alias("n_compared"),
            F.sum(mmc).cast("bigint").alias("n_mismatched"),
        ).select("level", "n_nodes", "n_compared", "n_mismatched")

    return (
        level_row(0, m0, all_compared=True)
        .unionByName(level_row(1, c1))
        .unionByName(level_row(2, c2))
        .unionByName(level_row(3, c3))
    )


@register("l21_acid_change_feed", "A7+L2", _SIDES_SQL + """
, v2 AS (
  SELECT key, price, version FROM (
    SELECT COALESCE(t.key, s.key) AS key,
           CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
                THEN s.price ELSE t.price END AS price,
           CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
                THEN s.version ELSE t.version END AS version,
           CASE WHEN s.key IS NOT NULL AND s.key % 100 = 0 THEN 1 ELSE 0 END AS deleted
    FROM side_a t FULL OUTER JOIN side_b s ON t.key = s.key
  ) WHERE deleted = 0
)
SELECT * FROM (
  SELECT COALESCE(o.key, n.key) AS key,
         CASE WHEN o.key IS NULL THEN 'insert'
              WHEN n.key IS NULL THEN 'delete'
              WHEN o.price IS DISTINCT FROM n.price
                   OR o.version IS DISTINCT FROM n.version THEN 'update'
         END AS change_type,
         o.price AS price_old,
         STRFTIME(DATE_TRUNC('second', o.version), '%Y-%m-%d %H:%M:%S') AS version_s_old,
         n.price AS price_new,
         STRFTIME(DATE_TRUNC('second', n.version), '%Y-%m-%d %H:%M:%S') AS version_s_new
  FROM side_a o FULL OUTER JOIN v2 n ON o.key = n.key
) WHERE change_type IS NOT NULL
""", "Change data feed between ACID snapshots (Delta CDF / "
     "table_changes): side_a commits as v1, the LWW+delete MERGE "
     "produces v2, and AcidParquetTable.changes(v1, v2) emits one "
     "row per changed key labeled insert/update/delete with old and "
     "new payloads side by side - the downstream-sync primitive that "
     "lets a consumer replicate a table without rescanning it. ONE "
     "full-outer join of the two snapshot reads on the key (the L1 "
     "diff shape; both sides shuffle once, unchanged keys dropped "
     "via null-safe comparison over every non-key column). "
     "Hash-matched against the relational reconstruction of both "
     "versions - the feed is proven, not inferred from write-path "
     "bookkeeping.")
def l21_acid_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_cdf_")
    try:
        t = AcidParquetTable(spark, root)
        v1 = t.init(side_a(spark, sf_dir))
        v2 = t.merge_into(
            side_b(spark, sf_dir),
            ["key"],
            matched_condition=F.col("src.version") > F.col("tgt.version"),
            delete_condition=F.col("src.key") % 100 == 0,
        )
        feed = t.changes(["key"], v1, v2)
        return feed.select(
            "key", "change_type",
            "price_old", fmt_ts("version_old").alias("version_s_old"),
            "price_new", fmt_ts("version_new").alias("version_s_new"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l22_cdc_changes_only", "L2+E2", _SIDES_SQL + """
, h AS (
  SELECT key % 97 AS entity, key AS seq, price
  FROM side_b
),
flagged AS (
  SELECT entity, seq, price,
         LAG(price) OVER (PARTITION BY entity ORDER BY seq) AS prev_price
  FROM h
)
SELECT entity, seq, price
FROM flagged
WHERE prev_price IS NULL OR price IS DISTINCT FROM prev_price
""", "CDC changes-only compression: collapse consecutive identical "
     "values per entity, keeping only rows where the payload actually "
     "changed from its predecessor - the dedup every change-feed "
     "consumer wants before applying writes (Kafka compacted-topic / "
     "Debezium 'skip unchanged' behavior). One per-entity LAG window "
     "(entity-sized groups, never global) + a null-safe "
     "value-distinctness filter; at 100 TB the emitted feed shrinks "
     "to the true change rate and the plan is one shuffle on the "
     "entity key.")
def l22_cdc_changes_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = side_b(spark, sf_dir).select(
        (F.col("key") % 97).alias("entity"),
        F.col("key").alias("seq"),
        "price",
    )
    w = Window.partitionBy("entity").orderBy("seq")
    flagged = h.withColumn("prev_price", F.lag("price").over(w))
    return flagged.filter(
        F.col("prev_price").isNull()
        | ~F.col("price").eqNullSafe(F.col("prev_price"))
    ).select("entity", "seq", "price")


@register("l23_acid_wap_publish", "A7+L4", _SIDES_SQL + """
SELECT key, price, version_s FROM (
  SELECT COALESCE(t.key, s.key) AS key,
         CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
              THEN s.price ELSE t.price END AS price,
         STRFTIME(DATE_TRUNC('second',
           CASE WHEN s.key IS NOT NULL AND (t.key IS NULL OR s.version > t.version)
                THEN s.version ELSE t.version END), '%Y-%m-%d %H:%M:%S') AS version_s,
         CASE WHEN s.key IS NOT NULL AND s.key % 100 = 0 THEN 1 ELSE 0 END AS deleted
  FROM side_a t FULL OUTER JOIN side_b s ON t.key = s.key
) WHERE deleted = 0
""", "Write-audit-publish on the ACID store (sources/acid.py "
     "merge_branch/publish): the sync batch stages its MERGE on an "
     "isolated branch - main readers CANNOT see it - the audit step "
     "validates the staged snapshot (here: no duplicate keys, "
     "non-empty, checked in-query), and publish promotes it to main "
     "with one atomic conditional-put commit that REFUSES if main "
     "advanced since the branch was cut (stale-audit protection, "
     "tested with a concurrent writer in tests/test_acid_merge.py). "
     "The Iceberg WAP pattern, which is how a production pipeline "
     "gates bad loads out of a 100 TB table; published contents "
     "hash-match the relational merge oracle, and the pre-publish "
     "main survives as a time-travel version.")
def l23_acid_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_wap_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        t.merge_branch(
            "load_audit",
            side_b(spark, sf_dir),
            ["key"],
            matched_condition=F.col("src.version") > F.col("tgt.version"),
            delete_condition=F.col("src.key") % 100 == 0,
        )
        staged = t.read_branch("load_audit")
        n = staged.count()
        n_keys = staged.select("key").distinct().count()
        if n == 0 or n != n_keys:
            raise AssertionError("audit failed: empty or duplicate keys")
        main_before = t.current_version()
        # Content check, not a count check: the merge both deletes and
        # inserts, so staged/main row counts can coincide at some scale
        # factor - assert the staged snapshot actually differs.
        if staged.exceptAll(t.read(main_before)).isEmpty():
            raise AssertionError("staged merge invisible change?")
        t.publish("load_audit")
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l24_cdc_to_acid_e2e", "A2+L4+A7", """
WITH seqs AS (SELECT UNNEST(RANGE(0, 10000)) AS seq),
cdc AS (
  SELECT seq, seq % 1000 AS key,
         CASE WHEN seq % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST((seq * 31) % 9973 AS DOUBLE) / 100.0 AS price
  FROM seqs
),
latest AS (
  SELECT key, ARG_MAX(op, seq) AS op, ARG_MAX(price, seq) AS price,
         MAX(seq) AS seq
  FROM cdc GROUP BY key
)
SELECT key, price, seq
FROM latest WHERE op = 'U'
""", "The full ingestion path in one verified flow: the custom Python "
     "DataSource CDC feed (a10's connector socket) folds to final "
     "per-key state (LWW on the sequence, max_by aggregate), MERGEs "
     "into the transactional table (copy-on-write upsert + delete "
     "clause for 'D' records), and the committed SNAPSHOT - not the "
     "fold - hash-matches the relational oracle. This is the "
     "source -> resolve -> ACID-sink composition every component "
     "query proves in isolation, exercised as one pipeline: exactly "
     "what the reference's sync cycle does end to end, on the "
     "lakehouse path it upgrades to at 100 TB.")
def l24_cdc_to_acid_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable
    from cassandra_elasticsearch_sync_spark.sources.python_source import (
        N_EVENTS,
        N_SPLITS,
        register_cdc_source,
    )

    register_cdc_source(spark)
    feed = (
        spark.read.format("cdc_feed")
        .option("n", N_EVENTS).option("splits", N_SPLITS)
        .load()
    )
    latest = feed.groupBy("key").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("price", "seq").alias("price"),
        F.max("seq").alias("seq"),
    )
    root = tempfile.mkdtemp(prefix="ces_cdc_acid_")
    try:
        t = AcidParquetTable(spark, root)
        # seed the table with stale versions of half the keys so the
        # MERGE exercises update + insert + delete, not just insert
        t.init(latest.filter(F.col("key") % 2 == 0)
               .select("key", (F.col("price") * 0 - 1.0).alias("price"),
                       F.lit(-1).cast("bigint").alias("seq")))
        t.merge_into(
            latest,
            ["key"],
            matched_condition=F.col("src.seq") > F.col("tgt.seq"),
            delete_condition=F.col("src.op") == "D",
        )
        return t.read().select("key", "price", "seq").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l25_three_way_lww", "L3+L6", _SIDES_SQL + """
, side_c AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 0.9
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey % 13 = 0 THEN o_orderdate + INTERVAL 2 DAY
              ELSE o_orderdate END AS version
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'
),
u AS (
  SELECT key, price, version, 'a' AS side FROM side_a
  UNION ALL SELECT key, price, version, 'b' FROM side_b
  UNION ALL SELECT key, price, version, 'c' FROM side_c
)
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s,
       side
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                                   ORDER BY version DESC, side DESC,
                                            price DESC) AS rn
      FROM u)
WHERE rn = 1
""", "N-way sync convergence (three stores): the LWW merge "
     "generalizes from the 2-store fixture to any replica count by "
     "the same union + per-key max(struct) aggregate - one shuffle "
     "total regardless of N, hot keys collapsing map-side, with the "
     "(version, side, payload) composite keeping ties deterministic "
     "across ALL replicas. side_c models a third store with its own "
     "local edits (2-day-newer versions on every 13th key, which WIN "
     "over both a and b). This is the multi-datacenter reconciliation "
     "the 2-store reference topology grows into; the winner table "
     "hash-matches the relational 3-way resolution.")
def l25_three_way_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    edited = F.col("o_orderkey") % 13 == 0
    side_c = (
        o.filter(F.expr("o_orderdate >= TIMESTAMP_NTZ '1998-06-01 00:00:00'"))
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(edited, F.col("o_totalprice") * 0.9)
             .otherwise(F.col("o_totalprice")).alias("price"),
            F.when(edited, F.col("o_orderdate") + F.expr("INTERVAL 2 DAY"))
             .otherwise(F.col("o_orderdate")).alias("version"),
        )
        .withColumn("side", F.lit("c"))
    )
    merged = lww_merge(lww_merge(side_a(spark, sf_dir),
                                 side_b(spark, sf_dir)), side_c)
    return merged.select(
        "key", "price", fmt_ts("version").alias("version_s"), "side")


@register("l26_sync_cycle_on_acid", "L7+A7", _SIDES_SQL + """
, u AS (
  SELECT key, price, version, 'a' AS side FROM side_a
  UNION ALL
  SELECT key, price, version, 'b' AS side FROM side_b
),
m AS (
  SELECT key, side, price, version FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY key
              ORDER BY version DESC, side DESC, price DESC) AS rn
    FROM u) WHERE rn = 1
)
SELECT key, side,
       CASE WHEN key % 97 = 3 THEN price + 1000 ELSE price END AS price,
       STRFTIME(DATE_TRUNC('second',
         CASE WHEN key % 97 = 3 THEN TIMESTAMP '2005-01-01 00:00:00'
              ELSE version END), '%Y-%m-%d %H:%M:%S') AS version_s
FROM m
""", "The SyncEngine's whole program ON the ACID store (VERDICT r3 "
     "#1): bootstrap both sides onto AcidStores (full_sync = LWW "
     "merge + range-clustered OPTIMIZE), edit a key slice on side B "
     "through a copy-on-write UPDATE stamped newer than the "
     "watermark, then run one incremental_cycle whose apply step is "
     "a CoW MERGE INTO keyed on the sync key - only the manifest "
     "entries whose key stats intersect the shipped delta are "
     "rewritten, so a 1%-delta cycle costs ~1% of the table instead "
     "of the snapshot-swap store's 100%. The returned side-A state "
     "hash-matches the relational twin: LWW(merge) with the edit "
     "overlaid - proving the engine loop, the watermark inclusive "
     "boundary, and the ACID apply compose end-to-end.")
def l26_sync_cycle_on_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sync.engine import (
        AcidStore,
        SyncEngine,
    )

    root = tempfile.mkdtemp(prefix="ces_acid_sync_")
    try:
        # Seed via a plain init commit (full_sync's overwrite will
        # range-cluster both stores right after; clustering the
        # pre-bootstrap state too would be wasted work).
        a = AcidStore(spark, f"{root}/a")
        a.table.init(side_a(spark, sf_dir).withColumn("side", F.lit("a")))
        b = AcidStore(spark, f"{root}/b")
        b.table.init(side_b(spark, sf_dir).withColumn("side", F.lit("b")))
        eng = SyncEngine(spark, a, b, f"{root}/state")
        eng.full_sync()
        b.table.update_where(
            F.col("key") % 97 == 3,
            {"price": F.col("price") + 1000.0,
             "version": F.lit("2005-01-01 00:00:00").cast("timestamp")},
        )
        shipped = eng.incremental_cycle()
        if shipped == 0:
            raise AssertionError("edited rows did not ship")
        if not eng.in_sync():
            raise AssertionError("stores diverged after cycle")
        return a.read().select(
            "key", "side", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l27_acid_replace_where", "A7+L5", _SIDES_SQL + """
SELECT key,
       CASE WHEN version >= TIMESTAMP '1997-01-01 00:00:00'
            THEN price * 0.5 ELSE price END AS price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a
""", "Delta-style replaceWhere on the ACID store: restate the "
     "'1997-and-later' slice of the table (recomputed with corrected "
     "prices) in ONE atomic commit that deletes the old slice and "
     "inserts the restatement - the idempotent partition-recompute "
     "pattern every batch pipeline uses to re-run a day. Only entries "
     "containing matching rows are rewritten (CoW file pruning), and "
     "rows violating the replace predicate fail the commit IN-PLAN "
     "(assert_true) instead of leaking outside the slice - Delta's "
     "contract. The post-commit table hash-matches the relational "
     "restatement; concurrent snapshot readers keep the pre-replace "
     "version (tests/test_acid_merge.py).")
def l27_acid_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    root = tempfile.mkdtemp(prefix="ces_acid_rw_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        restated = (
            side_a(spark, sf_dir)
            .filter(F.col("version") >= cutoff)
            .select("key", (F.col("price") * 0.5).alias("price"),
                    "version")
        )
        t.replace_where(F.col("version") >= cutoff, restated)
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l28_acid_compact_small", "A7+A6", _SIDES_SQL + """
SELECT key, price, version_s FROM (
  SELECT key, price,
         STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
  FROM side_a
  UNION ALL
  SELECT 90000000 + seq AS key, CAST(seq AS DOUBLE) AS price,
         '2004-01-01 00:00:00' AS version_s
  FROM (SELECT UNNEST(RANGE(0, 8)) AS seq)
)
""", "Small-file compaction on the ACID store: 8 micro-commits (the "
     "CDC-ingest pattern - every micro-batch lands one tiny manifest "
     "entry) are bin-packed by compact_small into target-sized "
     "entries in one atomic commit. The hash check proves compaction "
     "is content-neutral (table = base snapshot + the 8 appended "
     "rows, byte-identical values); the entry count drops from 9+ to "
     "1 (asserted in-query). Without this maintenance op, manifest "
     "size and scan task count grow with COMMIT COUNT, not data size "
     "- the failure mode that kills streaming sinks at 100 TB.")
def l28_acid_compact_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_pack_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        for seq in range(8):
            t.merge_into(
                tiny_df(
                    spark,
                    [(90_000_000 + seq, float(seq), "2004-01-01 00:00:00")],
                    "key bigint, price double, version string",
                ).select("key", "price",
                         F.col("version").cast("timestamp").alias("version")),
                ["key"], assume_unique_keys=True)
        n_before = len(t._manifest(t.current_version())["files"])
        t.compact_small()
        n_after = len(t._manifest(t.current_version())["files"])
        if not (n_after < n_before):
            raise AssertionError(
                f"compaction did not shrink the manifest ({n_before} -> {n_after})")
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               attr: str, ts: str, delta_only: bool = False) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 apply: given the current
    history table (key, attr, valid_from, valid_to, is_current) and a
    batch of updates (key, attr, ts), CLOSE the current row of every
    key whose attribute actually changed (valid_to = update ts,
    is_current = false) and OPEN a new current row; unchanged keys and
    closed history rows pass through untouched; brand-new keys open
    their first row. Pure DataFrame algebra: one join of updates
    against current rows + unions - every piece keyed on the dimension
    key, no windows, no collect. The composite business key of the
    history table is (key, valid_from), which is exactly the merge key
    the ACID store applies this with (see l29)."""
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    u = updates.alias("u")
    c = cur.alias("c")
    j = u.join(c, F.col(f"u.{key}") == F.col(f"c.{key}"), "left")
    changed = j.filter(
        F.col(f"c.{key}").isNotNull()
        & ~F.col(f"u.{attr}").eqNullSafe(F.col(f"c.{attr}"))
        & (F.col(f"u.{ts}") > F.col("c.valid_from"))
    )
    closed = changed.select(
        F.col(f"c.{key}").alias(key), F.col(f"c.{attr}").alias(attr),
        F.col("c.valid_from").alias("valid_from"),
        F.col(f"u.{ts}").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        F.col(f"u.{key}").alias(key), F.col(f"u.{attr}").alias(attr),
        F.col(f"u.{ts}").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    fresh = j.filter(F.col(f"c.{key}").isNull()).select(
        F.col(f"u.{key}").alias(key), F.col(f"u.{attr}").alias(attr),
        F.col(f"u.{ts}").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if delta_only:
        # Just the rows an apply must WRITE (closes + opens + first
        # rows) - the merge source a CoW store wants, so an update
        # batch touching 1% of keys rewrites ~1% of the history table
        # instead of re-shipping the whole dimension.
        return closed.unionByName(opened).unionByName(fresh)
    untouched_cur = cur.join(
        closed.select(key, "valid_from"), [key, "valid_from"], "left_anti")
    return (hist.unionByName(untouched_cur).unionByName(closed)
            .unionByName(opened).unionByName(fresh))


@register("l29_scd2_dimension_history", "A7+L3+L2", _SIDES_SQL + """
, cur AS (
  SELECT key, price, version AS valid_from FROM side_a
),
upd AS (
  SELECT b.key, b.price, b.version
  FROM side_b b LEFT JOIN side_a a ON b.key = a.key
  WHERE a.key IS NULL OR (b.price <> a.price AND b.version > a.version)
),
closed AS (
  SELECT c.key, c.price, c.valid_from, u.version AS valid_to,
         FALSE AS is_current
  FROM cur c JOIN upd u ON c.key = u.key
),
untouched AS (
  SELECT c.key, c.price, c.valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM cur c LEFT JOIN upd u ON c.key = u.key WHERE u.key IS NULL
),
opened AS (
  SELECT key, price, version AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM upd
)
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', valid_from), '%Y-%m-%d %H:%M:%S') AS valid_from_s,
       STRFTIME(DATE_TRUNC('second', valid_to), '%Y-%m-%d %H:%M:%S') AS valid_to_s,
       is_current
FROM (SELECT * FROM closed UNION ALL SELECT * FROM untouched
      UNION ALL SELECT * FROM opened)
""", "Slowly-Changing-Dimension Type 2 on the ACID store: the "
     "dimension keeps FULL HISTORY (valid_from/valid_to/is_current), "
     "and an update batch closes each changed key's current row and "
     "opens a new one - the warehouse pattern every dimension table "
     "at 100 TB uses for point-in-time joins. The apply is pure "
     "keyed DataFrame algebra (scd2_apply: one join + unions, no "
     "windows), and it lands on the ACID table as ONE atomic MERGE "
     "keyed on the composite (key, valid_from) - closes are updates, "
     "opens are inserts, history rows untouched (CoW file pruning "
     "applies). Hash-matched against the relational history twin.")
def l29_scd2_dimension_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_scd2_")
    try:
        dim0 = side_a(spark, sf_dir).select(
            "key", "price", F.col("version").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        t = AcidParquetTable(spark, root)
        t.init(dim0)
        a = side_a(spark, sf_dir).alias("a")
        upd = (
            side_b(spark, sf_dir).alias("b")
            .join(a, F.col("b.key") == F.col("a.key"), "left")
            .filter(F.col("a.key").isNull()
                    | ((F.col("b.price") != F.col("a.price"))
                       & (F.col("b.version") > F.col("a.version"))))
            .select(F.col("b.key").alias("key"),
                    F.col("b.price").alias("price"),
                    F.col("b.version").alias("version"))
        )
        delta = scd2_apply(t.read(), upd, "key", "price", "version",
                           delta_only=True)
        # ONE atomic merge of ONLY the changed history rows on the
        # composite key: closes update in place, opens/fresh insert,
        # untouched history never ships - CoW file pruning applies.
        t.merge_into(delta, ["key", "valid_from"],
                     assume_unique_keys=True)
        return t.read().select(
            "key", "price",
            fmt_ts("valid_from").alias("valid_from_s"),
            fmt_ts("valid_to").alias("valid_to_s"),
            "is_current",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l30_ivm_join_delta", "L2+C1", """
WITH o AS (SELECT o_orderkey, o_orderdate FROM orders),
l AS (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem)
SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice,
       STRFTIME(DATE_TRUNC('second', o.o_orderdate),
                '%Y-%m-%d %H:%M:%S') AS order_date_s
FROM o JOIN l ON o.o_orderkey = l.l_orderkey
""", "Incremental view maintenance for a JOIN view - the delta "
     "algebra every CDC pipeline needs: with base partitions O0/L0 "
     "and deltas dO/dL, the view advances by "
     "dV = dO><L0 + O0><dL + dO><dL, appended to V0, instead of "
     "re-joining the full inputs. At 100 TB the three delta joins "
     "are delta-x-base sized (broadcast the delta side), a tiny "
     "fraction of the full O><L re-join the naive refresh pays. The "
     "registered result IS the maintained view; the oracle is the "
     "full recompute, so the hash match proves the delta algebra "
     "covers the join EXACTLY - no lost pair, no double-count.")
def l30_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice")
    # deterministic base/delta split (the CDC arrival boundary)
    d_o = o.filter(F.col("o_orderkey") % 10 == 0)
    o0 = o.filter(F.col("o_orderkey") % 10 != 0)
    d_l = li.filter(F.col("l_linenumber") >= 5)
    l0 = li.filter(F.col("l_linenumber") < 5)

    def j(a, b):
        return a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_linenumber", "l_extendedprice",
            fmt_ts("o_orderdate").alias("order_date_s"))

    v0 = j(o0, l0)
    dv = j(d_o, l0).unionByName(j(o0, d_l)).unionByName(j(d_o, d_l))
    return v0.unionByName(dv)


@register("l31_acid_restore", "A7+L1", _SIDES_SQL + """
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a
""", "RESTORE TABLE TO VERSION AS OF on the ACID store: after a bad "
     "deploy corrupts prices (a merge that zeroes every 10th key), "
     "one metadata-only commit re-points the table at the good "
     "snapshot - zero bytes rewritten regardless of table size "
     "(asserted in-query: the restored manifest's file set IS the "
     "good version's), history preserved (the corrupted head stays "
     "time-travelable for the post-mortem), and the rollback itself "
     "is an optimistic-concurrency commit so it cannot silently race "
     "a concurrent writer. The read hash-matches the pre-corruption "
     "relational content exactly.")
def l31_acid_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_restore_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        v_good = t.current_version()
        corrupted = (side_a(spark, sf_dir)
                     .filter(F.col("key") % 10 == 0)
                     .withColumn("price", F.lit(0.0)))
        t.merge_into(corrupted, ["key"], assume_unique_keys=True)
        v_bad = t.current_version()
        v_restored = t.restore(v_good)
        if set(t._manifest(v_restored)["files"]) != set(
                t._manifest(v_good)["files"]):
            raise AssertionError("restore was not metadata-only")
        if not (v_restored == v_bad + 1):
            raise AssertionError("restore must append to history, not erase it")
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l32_acid_check_constraint", "A7+B3", _SIDES_SQL + """
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a WHERE key % 10 <> 0
UNION ALL
SELECT key, price * 2 AS price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a WHERE key % 10 = 0
""", "ALTER TABLE ADD CONSTRAINT CHECK on the ACID store: with "
     "price > 0 declared, a merge that would write negative prices "
     "FAILS INSIDE the write job (the check is folded into the write "
     "plan - no extra validation scan per commit) and commits nothing "
     "(version asserted unchanged); a clean merge (doubling every "
     "10th key's price) then passes. Delta's CHECK-constraint "
     "contract including the SQL NULL rule and validate-existing-"
     "data-on-ADD; enforcement cost at 100 TB is zero extra jobs - "
     "the guard rides the same tasks that write the parquet.")
def l32_acid_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_chk_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        t.add_constraint("price_positive", "price > 0")
        v = t.current_version()
        bad = (side_a(spark, sf_dir)
               .filter(F.col("key") % 10 == 0)
               .withColumn("price", -F.col("price")))
        try:
            t.merge_into(bad, ["key"], assume_unique_keys=True)
            raise AssertionError("violating merge must fail the commit")
        except AssertionError:
            raise
        except Exception:
            pass  # the constraint fired inside the write job
        if t.current_version() != v:
            raise AssertionError("failed write must commit nothing")
        good = (side_a(spark, sf_dir)
                .filter(F.col("key") % 10 == 0)
                .withColumn("price", F.col("price") * 2))
        t.merge_into(good, ["key"], assume_unique_keys=True)
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l33_acid_shallow_clone", "A7+L1", _SIDES_SQL + """
SELECT key,
       CASE WHEN key % 10 = 0 THEN price * 0.5 ELSE price END AS price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a
""", "SHALLOW CLONE on the ACID store: a zero-copy dev table whose "
     "v1 manifest re-points at the production snapshot's data files "
     "(asserted in-query: the clone's entry set IS the source's - no "
     "byte copied at ANY table size), then a what-if merge runs ON "
     "THE CLONE while the production table stays bit-identical "
     "(asserted via its unchanged version). The dev-experiment "
     "pattern every lakehouse ships; CoW on the clone rewrites "
     "affected entries into clone-owned files, so divergence costs "
     "only the touched slices.")
def l33_acid_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_src_")
    clone_root = tempfile.mkdtemp(prefix="ces_acid_clone_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        v_src = t.current_version()
        shutil.rmtree(clone_root, ignore_errors=True)
        c = t.shallow_clone(clone_root)
        if set(c._manifest(1)["files"]) != set(t._manifest(v_src)["files"]):
            raise AssertionError("clone must re-point, not copy")
        what_if = (side_a(spark, sf_dir)
                   .filter(F.col("key") % 10 == 0)
                   .withColumn("price", F.col("price") * 0.5))
        c.merge_into(what_if, ["key"], assume_unique_keys=True)
        if t.current_version() != v_src:
            raise AssertionError("source must not advance on a clone write")
        return c.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(clone_root, ignore_errors=True)


@register("l34_acid_generated_column", "A7+B4", _SIDES_SQL + """
SELECT key, price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s,
       STRFTIME(CAST(version AS DATE), '%Y-%m-%d') AS day_s
FROM side_a WHERE key % 10 <> 0
UNION ALL
SELECT key, price * 2 AS price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s,
       STRFTIME(CAST(version AS DATE), '%Y-%m-%d') AS day_s
FROM side_a WHERE key % 10 = 0
""", "GENERATED ALWAYS AS columns on the ACID store (the Delta "
     "feature behind partition-derivation columns): `day` is declared "
     "generated from CAST(version AS DATE); the bootstrap write and "
     "every later MERGE compute it automatically (the merge source "
     "omits it entirely), a write supplying a contradicting value "
     "fails inside the write job, and the definition can never drift "
     "because validation rides every write plan at zero extra jobs - "
     "the oracle recomputes the column relationally, so the hash "
     "proves writer-side materialization equals the declared "
     "expression on every row.")
def l34_acid_generated_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_gen_")
    try:
        t = AcidParquetTable(spark, root)
        t.add_generated_column("day", "CAST(version AS DATE)")
        t.init(side_a(spark, sf_dir))
        restated = (side_a(spark, sf_dir)
                    .filter(F.col("key") % 10 == 0)
                    .withColumn("price", F.col("price") * 2))
        t.merge_into(restated, ["key"], assume_unique_keys=True)
        return t.read().select(
            "key", "price", fmt_ts("version").alias("version_s"),
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l35_merge_not_matched_by_source", "A7+L5", """
WITH half AS (SELECT MAX(o_orderkey) // 2 AS h FROM orders),
tgt AS (
  SELECT o_orderkey AS key, o_totalprice AS price,
         'active' AS status
  FROM orders
),
src AS (
  SELECT o_orderkey AS key, o_totalprice * 2 AS price
  FROM orders, half WHERE o_orderkey <= h
)
SELECT t.key,
       CASE WHEN s.key IS NOT NULL THEN s.price ELSE t.price END AS price,
       CASE WHEN s.key IS NOT NULL THEN 'active' ELSE 'archived' END
         AS status
FROM tgt t LEFT JOIN src s ON t.key = s.key
WHERE s.key IS NOT NULL OR t.key % 3 <> 0
""", "MERGE ... WHEN NOT MATCHED BY SOURCE (SQL:2023 / Delta) - the "
     "branch classic MERGE cannot express: TARGET rows absent from "
     "the source get their own action. One merge commit does all "
     "three things here: matched keys (lower half) update to the "
     "source price, unmatched target rows divisible by 3 are "
     "DELETED (the retention sweep), and the remaining unmatched "
     "rows are UPDATED to status='archived' in a second merge - "
     "sync's full-snapshot reconciliation in two commits, no full "
     "diff pass. File pruning inverts for this branch (matched keys "
     "no longer bound the affected set): candidates are pruned by "
     "the branch CONDITION when given, all files otherwise - the "
     "same trade Delta documents. sources/acid.py merge_into "
     "not_matched_by_source_*.")
def l35_merge_not_matched_by_source(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import (
        AcidParquetTable,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.lit("active").alias("status"))
    half = o.agg((F.max("key") / 2).cast("bigint").alias("h")) \
        .collect()[0]["h"]
    src = (o.filter(F.col("key") <= half)
           .select("key", (F.col("price") * 2).alias("price"),
                   F.lit("active").alias("status")))
    root = tempfile.mkdtemp(prefix="ces_acid_nmbs_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(o)
        # branch 1: archive-sweep DELETE of every unmatched key%3==0
        t.merge_into(
            src, ["key"], assume_unique_keys=True,
            not_matched_by_source_action="delete",
            not_matched_by_source_condition=F.col("tgt.key") % 3 == 0)
        # branch 2: UPDATE the surviving unmatched rows to 'archived'
        t.merge_into(
            src, ["key"], assume_unique_keys=True,
            not_matched_by_source_action="update",
            not_matched_by_source_assignments={
                "status": F.lit("archived")})
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l36_cdc_to_es_roundtrip", "A2+L3+A3", """
WITH seqs AS (SELECT UNNEST(RANGE(0, 10000)) AS seq),
cdc AS (
  SELECT seq, seq % 1000 AS key,
         CASE WHEN seq % 7 = 0 THEN 'D' ELSE 'U' END AS op,
         CAST((seq * 31) % 9973 AS DOUBLE) / 100.0 AS price
  FROM seqs
),
latest AS (
  SELECT key, ARG_MAX(op, seq) AS op, ARG_MAX(price, seq) AS price,
         MAX(seq) AS seq
  FROM cdc GROUP BY key
)
SELECT key,
       CASE WHEN op = 'D' THEN 'delete' ELSE 'index' END AS action,
       CASE WHEN op = 'D' THEN NULL ELSE price END AS price,
       CAST(CASE WHEN op = 'D' THEN NULL ELSE seq END AS BIGINT) AS seq
FROM latest
""", "The bidirectional loop the reference's topology implies, closed "
     "as one verified flow: the CDC source (a10's connector socket) "
     "folds to final per-key state (LWW on the sequence), renders "
     "through the ES `_bulk` two-phase-commit sink - upserts as "
     "index-action + source-line pairs, deletions as bare delete "
     "actions, task-private temp files published atomically on driver "
     "commit - and the verification READS THE WIRE FORMAT BACK "
     "(wholetext per bulk file, action/source lines re-paired by "
     "line position, delete actions standing alone) and reconstructs "
     "the applied index state. The reconstruction - not the fold - "
     "hash-matches the relational oracle, so the round trip proves "
     "fold, render, 2PC publish, and parse agree end to end. "
     "Everything scales: the fold is one partial-agg shuffle, the "
     "sink writes task-local, the read-back is one scan of the "
     "published files.")
def l36_cdc_to_es_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.python_source import (
        N_EVENTS,
        N_SPLITS,
        register_bulk_sink,
        register_cdc_source,
    )

    register_cdc_source(spark)
    register_bulk_sink(spark)
    feed = (
        spark.read.format("cdc_feed")
        .option("n", N_EVENTS).option("splits", N_SPLITS)
        .load()
    )
    latest = feed.groupBy("key").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("price", "seq").alias("price"),
        F.max("seq").alias("seq"),
    )
    out = tempfile.mkdtemp(prefix="ces_cdc_es_")
    try:
        (latest.write.format("es_bulk_sink")
         .option("path", out).option("index", "orders")
         .option("id_col", "key").option("op_col", "op")
         .option("delete_op", "D").mode("append").save())

        # Read the published wire format back and reconstruct the
        # applied index state. wholetext keeps each bulk file's line
        # order, so action line at position p pairs with its source
        # line at p+1; delete actions carry no source line.
        files = (
            spark.read.format("text").option("wholetext", "true")
            .load(os.path.join(out, "part_*.bulk"))
            .select(F.input_file_name().alias("f"), "value")
        )
        lines = files.select(
            "f", F.posexplode(F.split("value", "\n")).alias("pos", "line")
        ).filter(F.col("line") != "")
        act_schema = ("struct<index:struct<_index:string,_id:string>,"
                      "delete:struct<_index:string,_id:string>>")
        src_schema = "struct<key:bigint,op:string,price:double,seq:bigint>"
        parsed = lines.select(
            "f", "pos", "line", F.from_json("line", act_schema).alias("a")
        )
        idx_acts = parsed.filter(F.col("a.index").isNotNull()).select(
            "f", "pos", F.col("a.index._id").alias("_id"))
        deletes = parsed.filter(F.col("a.delete").isNotNull()).select(
            F.col("a.delete._id").cast("bigint").alias("key"),
            F.lit("delete").alias("action"),
            F.lit(None).cast("double").alias("price"),
            F.lit(None).cast("bigint").alias("seq"),
        )
        srcs = parsed.select("f", (F.col("pos") - 1).alias("pos"),
                             F.from_json("line", src_schema).alias("s"))
        indexed = idx_acts.join(srcs, ["f", "pos"]).select(
            F.col("s.key").alias("key"),
            F.lit("index").alias("action"),
            F.col("s.price").alias("price"),
            F.col("s.seq").alias("seq"),
        )
        return indexed.unionByName(deletes).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register("l37_merge_schema_evolution", "A7+A4", """
WITH tgt AS (
  SELECT o_orderkey AS key, o_totalprice AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
m1 AS (
  SELECT o_orderkey AS key, o_totalprice * 2 AS price,
         o_orderpriority AS segment
  FROM orders WHERE o_orderkey % 3 = 0
),
m2 AS (
  SELECT o_orderkey AS key, o_totalprice + 100000 AS price
  FROM orders WHERE o_orderkey % 5 = 0
),
keys AS (
  SELECT key FROM tgt UNION SELECT key FROM m1 UNION SELECT key FROM m2
)
SELECT k.key,
       CASE WHEN m2.key IS NOT NULL THEN m2.price
            WHEN m1.key IS NOT NULL THEN m1.price
            ELSE t.price END AS price,
       m1.segment AS segment
FROM keys k
LEFT JOIN tgt t ON k.key = t.key
LEFT JOIN m1 ON k.key = m1.key
LEFT JOIN m2 ON k.key = m2.key
""", "MERGE with AUTOMATIC SCHEMA EVOLUTION (Delta's mergeSchema): "
     "the first merge's source carries a column the table has never "
     "seen (`segment`) and widens the schema AS PART OF THE SAME "
     "MERGE COMMIT - rewritten files carry it, untouched files are "
     "carried byte-for-byte and read NULL for it, time travel keeps "
     "per-version schemas. The second merge is a NARROW source (the "
     "norm after evolution - old writers don't know the new column) "
     "and follows Delta's UPDATE SET * / INSERT * contract: the "
     "evolved column keeps its target value on update and reads NULL "
     "on insert, never nulled out by the narrow writer. Without the "
     "flag an unknown source column is IGNORED - written per the "
     "target schema, never widening it (test-pinned; the contract "
     "the CQL write path's helper columns rely on). The committed "
     "SNAPSHOT, not the fold, hash-matches the three-way relational "
     "reconstruction. sources/acid.py merge_into(schema_evolution=).")
def l37_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import (
        AcidParquetTable,
    )

    o = load_table(spark, sf_dir, "orders")
    tgt = (o.filter(F.col("o_orderkey") % 2 == 0)
           .select(F.col("o_orderkey").alias("key"),
                   F.col("o_totalprice").alias("price")))
    m1 = (o.filter(F.col("o_orderkey") % 3 == 0)
          .select(F.col("o_orderkey").alias("key"),
                  (F.col("o_totalprice") * 2).alias("price"),
                  F.col("o_orderpriority").alias("segment")))
    m2 = (o.filter(F.col("o_orderkey") % 5 == 0)
          .select(F.col("o_orderkey").alias("key"),
                  (F.col("o_totalprice") + 100000).alias("price")))
    root = tempfile.mkdtemp(prefix="ces_acid_sevol_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(tgt)
        t.merge_into(m1, ["key"], assume_unique_keys=True,
                     schema_evolution=True)
        t.merge_into(m2, ["key"], assume_unique_keys=True)
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------------
# L38: the sync-lag SLO panel from the engine's own ledger
# --------------------------------------------------------------------------

_LWW_FOLD = """
  SELECT key, price, version, side FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY key
              ORDER BY version DESC, side DESC, price DESC) AS rn
    FROM ({src})) WHERE rn = 1
"""

_L38_SQL = _SIDES_SQL + """
, m0 AS (""" + _LWW_FOLD.format(src="""
      SELECT key, price, version, 'a' AS side FROM side_a
      UNION ALL
      SELECT key, price, version, 'b' AS side FROM side_b""") + """),
w0 AS (SELECT MAX(version) AS w FROM m0),
b1 AS (
  SELECT key,
         CASE WHEN key % 101 = 5 THEN price + 500 ELSE price END AS price,
         CASE WHEN key % 101 = 5 THEN version + INTERVAL 2557 DAY
              ELSE version END AS version,
         side
  FROM m0
),
da1 AS (SELECT m.* FROM m0 m, w0 WHERE m.version >= w0.w),
db1 AS (SELECT b.* FROM b1 b, w0 WHERE b.version >= w0.w),
sa1 AS (SELECT d.* FROM da1 d
        WHERE NOT EXISTS (SELECT 1 FROM b1 x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
sb1 AS (SELECT d.* FROM db1 d
        WHERE NOT EXISTS (SELECT 1 FROM m0 x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
w1 AS (SELECT MAX(version) AS w FROM
       (SELECT version FROM da1 UNION ALL SELECT version FROM db1)),
a1 AS (""" + _LWW_FOLD.format(
    src="SELECT * FROM m0 UNION ALL SELECT * FROM sb1") + """),
bf1 AS (""" + _LWW_FOLD.format(
    src="SELECT * FROM b1 UNION ALL SELECT * FROM sa1") + """),
a2e AS (
  SELECT key,
         CASE WHEN key % 103 = 7 THEN price + 111 ELSE price END AS price,
         CASE WHEN key % 103 = 7 THEN version + INTERVAL 2922 DAY
              ELSE version END AS version,
         side
  FROM a1
),
b2e AS (
  SELECT key,
         CASE WHEN key % 103 IN (7, 11) THEN price + 222
              ELSE price END AS price,
         CASE WHEN key % 103 IN (7, 11)
              THEN version + INTERVAL 2923 DAY ELSE version END AS version,
         side
  FROM bf1
),
da2 AS (SELECT a.* FROM a2e a, w1 WHERE a.version >= w1.w),
db2 AS (SELECT b.* FROM b2e b, w1 WHERE b.version >= w1.w),
sa2 AS (SELECT d.* FROM da2 d
        WHERE NOT EXISTS (SELECT 1 FROM b2e x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
sb2 AS (SELECT d.* FROM db2 d
        WHERE NOT EXISTS (SELECT 1 FROM a2e x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
w2 AS (SELECT MAX(version) AS w FROM
       (SELECT version FROM da2 UNION ALL SELECT version FROM db2)),
a2 AS (""" + _LWW_FOLD.format(
    src="SELECT * FROM a2e UNION ALL SELECT * FROM sb2") + """),
b2 AS (""" + _LWW_FOLD.format(
    src="SELECT * FROM b2e UNION ALL SELECT * FROM sa2") + """),
da3 AS (SELECT a.* FROM a2 a, w2 WHERE a.version >= w2.w),
db3 AS (SELECT b.* FROM b2 b, w2 WHERE b.version >= w2.w),
sa3 AS (SELECT d.* FROM da3 d
        WHERE NOT EXISTS (SELECT 1 FROM b2 x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
sb3 AS (SELECT d.* FROM db3 d
        WHERE NOT EXISTS (SELECT 1 FROM a2 x WHERE x.key = d.key
              AND x.price = d.price AND x.version = d.version)),
w3 AS (SELECT MAX(version) AS w FROM
       (SELECT version FROM da3 UNION ALL SELECT version FROM db3)),
led AS (
  SELECT CAST(1 AS BIGINT) AS cycle,
         (SELECT COUNT(*) FROM sa1) AS shipped_a,
         (SELECT COUNT(*) FROM sb1) AS shipped_b,
         (SELECT COUNT(*) FROM sa1 s JOIN sb1 t ON s.key = t.key)
           AS conflict_keys,
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w1))
                  - EPOCH_US(version), 0.5) / 1000000.0, 6)
          FROM (SELECT version FROM sa1
                UNION ALL SELECT version FROM sb1)) AS p50_lag_s,
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w1))
                  - EPOCH_US(version), 0.95) / 1000000.0, 6)
          FROM (SELECT version FROM sa1
                UNION ALL SELECT version FROM sb1)) AS p95_lag_s,
         (SELECT ROUND(MAX(EPOCH_US((SELECT w FROM w1))
                  - EPOCH_US(version)) / 1000000.0, 6)
          FROM (SELECT version FROM sa1
                UNION ALL SELECT version FROM sb1)) AS max_lag_s,
         (SELECT STRFTIME(DATE_TRUNC('second', w),
                          '%Y-%m-%d %H:%M:%S') FROM w1) AS watermark_s
  UNION ALL
  SELECT CAST(2 AS BIGINT),
         (SELECT COUNT(*) FROM sa2),
         (SELECT COUNT(*) FROM sb2),
         (SELECT COUNT(*) FROM sa2 s JOIN sb2 t ON s.key = t.key),
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w2))
                  - EPOCH_US(version), 0.5) / 1000000.0, 6)
          FROM (SELECT version FROM sa2
                UNION ALL SELECT version FROM sb2)),
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w2))
                  - EPOCH_US(version), 0.95) / 1000000.0, 6)
          FROM (SELECT version FROM sa2
                UNION ALL SELECT version FROM sb2)),
         (SELECT ROUND(MAX(EPOCH_US((SELECT w FROM w2))
                  - EPOCH_US(version)) / 1000000.0, 6)
          FROM (SELECT version FROM sa2
                UNION ALL SELECT version FROM sb2)),
         (SELECT STRFTIME(DATE_TRUNC('second', w),
                          '%Y-%m-%d %H:%M:%S') FROM w2)
  UNION ALL
  SELECT CAST(3 AS BIGINT),
         (SELECT COUNT(*) FROM sa3),
         (SELECT COUNT(*) FROM sb3),
         (SELECT COUNT(*) FROM sa3 s JOIN sb3 t ON s.key = t.key),
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w3))
                  - EPOCH_US(version), 0.5) / 1000000.0, 6)
          FROM (SELECT version FROM sa3
                UNION ALL SELECT version FROM sb3)),
         (SELECT ROUND(QUANTILE_CONT(EPOCH_US((SELECT w FROM w3))
                  - EPOCH_US(version), 0.95) / 1000000.0, 6)
          FROM (SELECT version FROM sa3
                UNION ALL SELECT version FROM sb3)),
         (SELECT ROUND(MAX(EPOCH_US((SELECT w FROM w3))
                  - EPOCH_US(version)) / 1000000.0, 6)
          FROM (SELECT version FROM sa3
                UNION ALL SELECT version FROM sb3)),
         (SELECT STRFTIME(DATE_TRUNC('second', w),
                          '%Y-%m-%d %H:%M:%S') FROM w3)
)
SELECT cycle, shipped_a, shipped_b, conflict_keys,
       CASE WHEN shipped_a + shipped_b - conflict_keys > 0
            THEN ROUND(CAST(conflict_keys AS DOUBLE)
                       / (shipped_a + shipped_b - conflict_keys), 6)
       END AS conflict_rate,
       p50_lag_s, p95_lag_s, max_lag_s, watermark_s
FROM led
"""


@register("l38_sync_lag_slo", "L7+D6", _L38_SQL,
          "The sync-lag SLO panel (VERDICT r6 #7): run the SyncEngine "
          "for THREE incremental cycles on ACID stores with its "
          "operational ledger on - cycle 1 a one-sided repricing "
          "burst on B, cycle 2 overlapping edits on BOTH sides (the "
          "%103=7 keys collide and LWW arbitrates - counted as "
          "conflicts: keys shipped in both directions), cycle 3 "
          "quiet (0/0, the convergence heartbeat). Each ledger row "
          "carries rows-applied per direction, conflict count+rate, "
          "and p50/p95/max DATA lag behind the cycle's version "
          "frontier (feed-time replication lag - wall-clock lag "
          "would not be oracle-checkable), plus the post-cycle "
          "watermark. The whole ledger hash-matches a pure "
          "relational reconstruction of all three cycles (deltas, "
          "payload anti-joins, LWW folds, exact integer-microsecond "
          "percentiles) - proving the engine's shipped metrics are "
          "the truth, not approximations. Ledger jobs touch only "
          "cycle-sized ship sets; the panel is O(cycles) rows.")
def l38_sync_lag_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sync.engine import (
        AcidStore,
        SyncEngine,
    )

    root = tempfile.mkdtemp(prefix="ces_sync_slo_")
    try:
        from cassandra_elasticsearch_sync_spark.sync.engine import (
            _overlap_commits,
        )

        # The two store bootstraps and cycle 2's two-side edit burst
        # are commits on independent roots - overlapped (guide §2.6,
        # same measurement as the engine-internal overlap).
        a = AcidStore(spark, f"{root}/a")
        b = AcidStore(spark, f"{root}/b")
        _overlap_commits(
            spark,
            lambda: a.table.init(
                side_a(spark, sf_dir).withColumn("side", F.lit("a"))),
            lambda: b.table.init(
                side_b(spark, sf_dir).withColumn("side", F.lit("b"))))
        eng = SyncEngine(spark, a, b, f"{root}/state", record_ledger=True)
        eng.full_sync()
        # cycle 1: one-sided repricing burst on B
        b.table.update_where(
            F.col("key") % 101 == 5,
            {"price": F.col("price") + 500.0,
             "version": F.col("version") + F.expr("INTERVAL 2557 DAYS")})
        eng.incremental_cycle()
        # cycle 2: overlapping edits on both sides (conflicts on %103=7)
        _overlap_commits(
            spark,
            lambda: a.table.update_where(
                F.col("key") % 103 == 7,
                {"price": F.col("price") + 111.0,
                 "version": F.col("version") + F.expr("INTERVAL 2922 DAYS")}),
            lambda: b.table.update_where(
                (F.col("key") % 103 == 7) | (F.col("key") % 103 == 11),
                {"price": F.col("price") + 222.0,
                 "version": F.col("version") + F.expr("INTERVAL 2923 DAYS")}))
        eng.incremental_cycle()
        # cycle 3: quiet - the convergence heartbeat row
        eng.incremental_cycle()
        return eng.ledger_df().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register("l39_acid_deep_clone", "A7+L1", _SIDES_SQL + """
SELECT key,
       CASE WHEN key % 10 = 0 THEN price * 0.5 ELSE price END AS price,
       STRFTIME(DATE_TRUNC('second', version), '%Y-%m-%d %H:%M:%S') AS version_s
FROM side_a
""", "DEEP CLONE on the ACID store - shallow's independent sibling: "
     "the clone COPIES every live entry under its own root (asserted "
     "in-query: its entry set is DISJOINT from the source's), so it "
     "owns its bytes and survives source vacuum/drop - the hazard "
     "shallow documents. The same what-if merge then runs on the "
     "clone after the SOURCE is vacuumed with a zero horizon; the "
     "read back proves full independence. Stats and the seq ledger "
     "remap to the copied paths, so pruning/merge behavior is "
     "byte-for-byte the source's.")
def l39_acid_deep_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_dsrc_")
    clone_root = tempfile.mkdtemp(prefix="ces_acid_deep_")
    try:
        t = AcidParquetTable(spark, root)
        t.init(side_a(spark, sf_dir))
        shutil.rmtree(clone_root, ignore_errors=True)
        c = t.deep_clone(clone_root)
        if set(c._manifest(1)["files"]) & set(t._manifest(1)["files"]):
            raise AssertionError("deep clone must copy, not re-point")
        # obliterate the source entirely - the deep clone must not care
        shutil.rmtree(root, ignore_errors=True)
        what_if = (side_a(spark, sf_dir)
                   .filter(F.col("key") % 10 == 0)
                   .withColumn("price", F.col("price") * 0.5))
        c.merge_into(what_if, ["key"], assume_unique_keys=True)
        return c.read().select(
            "key", "price", fmt_ts("version").alias("version_s")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(clone_root, ignore_errors=True)
