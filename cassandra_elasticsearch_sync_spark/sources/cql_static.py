"""Cassandra STATIC columns over the ACID table format.

``CREATE TABLE t (pk ..., ck ..., s text STATIC, v ..., PRIMARY KEY
(pk, ck))`` - a static cell is stored ONCE per partition and shared by
every row of that partition. The semantics kept here are Cassandra's:

  * a SELECT returns the partition's static value on EVERY row;
  * a static cell can be written with only the PARTITION key
    restricted (``UPDATE t SET s = 'x' WHERE pk = 1``) - restricting
    clustering columns for a static-only write is an error, and a
    partition-key-only write that touches a REGULAR column is the
    "Missing mandatory PRIMARY KEY part" error;
  * an INSERT naming only the partition key and static columns
    creates a STATIC ROW: the partition becomes visible (one row with
    null clustering/regular cells) even with no regular rows;
  * a partition delete (``DELETE FROM t WHERE pk = 1``) removes the
    partition's regular rows AND its static row;
  * one statement may write regular and static cells together (full
    primary key restricted) - it splits across both stores here.

Storage is Cassandra's own conceptual model made physical: REGULAR
rows live in a base ACID table keyed by the full primary key, and
static cells live in a side ACID table keyed by the partition key
alone (one static row per partition - exactly the cardinality
Cassandra stores). The read view is ONE full-outer join on the
partition key - full outer because a static-only partition must
surface (which also rules out a broadcast plan; Spark cannot
broadcast full-outer sides). Both stores hash-partition on the same
columns, so the join is co-partitioned: two key exchanges at worst,
zero if either store is bucketed by the partition key - the shape
that holds at 100 TB.

Atomicity divergence (documented, not hidden): a single Cassandra
statement writing regular + static cells commits atomically inside
one partition; here the split lands as one commit per store, so a
crash between the two can publish half a statement. Each store's
commit keeps its own all-or-nothing guarantee.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable
from cassandra_elasticsearch_sync_spark.sources.cql_query import CqlError
from cassandra_elasticsearch_sync_spark.sources.cql_write import (
    CqlWrite,
    apply_cql_writes,
    parse_cql_dml,
)


class StaticTable:
    """One static-column-bearing CQL table: a base store (full primary
    key) plus a static store (partition key), with statement routing
    and the joined read view."""

    def __init__(self, spark, root: str, *, partition: list[str],
                 clustering: list[str], statics: list[str],
                 base_df: DataFrame, static_df: DataFrame):
        self.spark = spark
        self.partition = [c.lower() for c in partition]
        self.clustering = [c.lower() for c in clustering]
        self.statics = [c.lower() for c in statics]
        self.full_key = self.partition + self.clustering
        base_cols = set(base_df.columns)
        overlap = [c for c in self.statics if c in base_cols]
        if overlap:
            raise CqlError(f"static columns {overlap} must not appear "
                           "in the base row schema")
        missing = [c for c in self.partition
                   if c not in set(static_df.columns)]
        if missing:
            raise CqlError(f"static store must be keyed by the "
                           f"partition key; missing {missing}")
        self.base = AcidParquetTable(spark, root + "/base")
        self.base.init(base_df)
        self.static = AcidParquetTable(spark, root + "/static")
        self.static.init(static_df)

    # -- write routing -----------------------------------------------------

    def apply(self, stmts: list[str] | str) -> None:
        """Route one client batch: full-primary-key statements split
        regular/static cells across the two stores; partition-key-only
        statements must touch only static columns (or be partition
        deletes). Each store gets ONE commit for its share."""
        if isinstance(stmts, str):
            stmts = [stmts]
        base_writes: list[CqlWrite] = []
        static_writes: list[CqlWrite] = []
        part_deletes: list[tuple] = []
        for s in stmts:
            try:
                ws = parse_cql_dml(s, self.full_key)
                scoped = "full"
            except CqlError:
                ws = parse_cql_dml(s, self.partition)
                scoped = "partition"
            for w in ws:
                if scoped == "full":
                    reg = {c: v for c, v in w.sets.items()
                           if c not in self.statics}
                    st = {c: v for c, v in w.sets.items()
                          if c in self.statics}
                    if w.kind == "D":
                        base_writes.append(w)
                        continue
                    # INSERT/UPDATE with the full key always lands a
                    # base row (Cassandra: the row exists even if only
                    # static cells were named alongside the full key)
                    base_writes.append(CqlWrite(
                        w.kind, w.table, w.key, reg, w.condition,
                        ttl_s=w.ttl_s, ts_us=w.ts_us,
                        json_default=w.json_default,
                        if_conds=w.if_conds))
                    if st:
                        pkey = w.key[:len(self.partition)]
                        static_writes.append(CqlWrite(
                            "W", w.table, pkey, st, w.condition,
                            ttl_s=w.ttl_s, ts_us=w.ts_us))
                else:
                    if w.kind == "D" and not w.sets:
                        # partition delete: drop the partition's
                        # regular rows AND its static row
                        part_deletes.append(w.key)
                        static_writes.append(w)
                        continue
                    bad = [c for c in w.sets if c not in self.statics]
                    if bad:
                        raise CqlError(
                            f"Missing mandatory PRIMARY KEY part "
                            f"{self.clustering}: non-static columns "
                            f"{bad} need the full primary key")
                    static_writes.append(w)
        if part_deletes:
            pred = reduce(lambda a, b: a | b, [
                reduce(lambda x, y: x & y,
                       [F.col(c) == F.lit(v)
                        for c, v in zip(self.partition, key)])
                for key in part_deletes])
            self.base.delete_where(pred)
        if base_writes:
            apply_cql_writes(self.base, self.full_key, [],
                             parsed=base_writes)
        if static_writes:
            apply_cql_writes(self.static, self.partition, [],
                             parsed=static_writes)

    # -- read view ---------------------------------------------------------

    def read(self) -> DataFrame:
        """The CQL view: every regular row carries its partition's
        static cells; a partition holding ONLY a static row surfaces
        once with null clustering/regular cells (Cassandra's static
        row). One full-outer join on the partition key."""
        b = self.base.read().alias("b")
        s = self.static.read().alias("s")
        on = reduce(lambda a, c: a & c,
                    [F.col(f"b.{k}").eqNullSafe(F.col(f"s.{k}"))
                     for k in self.partition])
        reg_cols = [c for c in self.base.read().columns
                    if c not in self.full_key]
        st_cols = [c for c in self.static.read().columns
                   if c not in self.partition]
        return (b.join(s, on, "full")
                .select(*[F.coalesce(F.col(f"b.{k}"), F.col(f"s.{k}"))
                          .alias(k) for k in self.partition],
                        *[F.col(f"b.{c}").alias(c)
                          for c in self.clustering + reg_cols],
                        *[F.col(f"s.{c}").alias(c) for c in st_cols]))


# -- registered, oracle-verified query --------------------------------------

from cassandra_elasticsearch_sync_spark.registry import register  # noqa: E402


@register("a2al_cql_static_columns", "A2+C3", """
WITH base AS (
  SELECT o_custkey AS cust_id, o_orderkey AS order_id,
         o_totalprice AS price
  FROM orders WHERE o_custkey <= 200
), st AS (
  SELECT c_custkey AS cust_id, c_mktsegment AS segment
  FROM customer WHERE c_custkey <= 200
), base2 AS (
  SELECT cust_id, order_id,
         CASE WHEN cust_id = 19 AND order_id =
                   (SELECT MIN(order_id) FROM base WHERE cust_id = 19)
              THEN -1.0 ELSE price END AS price
  FROM base WHERE cust_id <> 13
  UNION ALL
  SELECT 7, 91000001, 42.0
), st2 AS (
  SELECT cust_id,
         CASE WHEN cust_id = 7 THEN 'VIP' ELSE segment END AS segment
  FROM st WHERE cust_id <> 13
  UNION ALL
  SELECT 9901, 'NEWCO'
)
SELECT COALESCE(b.cust_id, s.cust_id) AS cust_id,
       b.order_id, b.price, s.segment
FROM base2 b FULL OUTER JOIN st2 s ON b.cust_id = s.cust_id
""", "Cassandra STATIC columns end-to-end (cql_static.StaticTable): "
     "regular order rows keyed (cust_id, order_id) plus a per-"
     "partition static segment cell stored ONCE per customer. The "
     "probes pin every static behavior: a partition-key-only UPDATE "
     "rewrites the shared cell so EVERY row of customer 7 reads "
     "'VIP' including a regular row inserted afterwards; an INSERT "
     "naming only (cust_id, segment) creates a STATIC ROW for "
     "customer 9901 - a customer with no orders - visible as one row "
     "with null order cells (TPC-H's customers-without-orders make "
     "the full-outer shape load-bearing, not decorative); a "
     "partition DELETE removes customer 13's orders AND its static "
     "row; and a full-key UPDATE still writes regular cells. Read "
     "view = ONE full-outer join co-partitioned on the partition "
     "key - broadcastable static side, no shuffle surprise at scale. "
     "The two-store commit split vs Cassandra's one-partition "
     "atomicity is documented in the module header.")
def a2al_cql_static_columns(spark, sf_dir):
    import shutil
    import tempfile

    from cassandra_elasticsearch_sync_spark.catalog import load_table

    root = tempfile.mkdtemp(prefix="ces_cql_static_")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        base_df = (o.filter(F.col("o_custkey") <= 200)
                   .select(F.col("o_custkey").alias("cust_id"),
                           F.col("o_orderkey").alias("order_id"),
                           F.col("o_totalprice").alias("price")))
        static_df = (c.filter(F.col("c_custkey") <= 200)
                     .select(F.col("c_custkey").alias("cust_id"),
                             F.col("c_mktsegment").alias("segment")))
        t = StaticTable(spark, root, partition=["cust_id"],
                        clustering=["order_id"], statics=["segment"],
                        base_df=base_df, static_df=static_df)
        probe = (base_df.filter(F.col("cust_id") == 19)
                 .agg(F.min("order_id")).collect()[0][0])
        t.apply([
            "UPDATE t SET segment = 'VIP' WHERE cust_id = 7",
            "INSERT INTO t (cust_id, segment) VALUES (9901, 'NEWCO')",
            "DELETE FROM t WHERE cust_id = 13",
            "INSERT INTO t (cust_id, order_id, price) VALUES "
            "(7, 91000001, 42.0)",
            f"UPDATE t SET price = -1.0 WHERE cust_id = 19 "
            f"AND order_id = {probe}",
        ])
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
