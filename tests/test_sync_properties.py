"""Property tests for the sync composites (SURVEY.md 5.3 rule 5):
idempotence, commutativity, and diff/patch round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.sync.ops import (
    apply_upserts,
    l4_upsert_set,
    lww_merge,
    side_a,
    side_b,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def _sides(spark):
    a = side_a(spark, SF_DIR).withColumn("side", F.lit("a"))
    b = side_b(spark, SF_DIR).withColumn("side", F.lit("b"))
    return a, b


def test_lww_merge_idempotent(spark):
    a, b = _sides(spark)
    once = lww_merge(a, b)
    twice = lww_merge(once, b)
    assert _norm(once) == _norm(twice)


def test_lww_merge_swap_sides_same_versions(spark):
    """Swapping argument order only changes the tie side; with this
    fixture's strictly-resolving versions the key->version map agrees."""
    a, b = _sides(spark)
    ab = lww_merge(a, b).select("key", "version")
    ba = lww_merge(b, a).select("key", "version")
    assert _norm(ab) == _norm(ba)


def test_upsert_apply_converges_and_is_idempotent(spark):
    a, b = _sides(spark)
    # Build the upsert set from the library pieces (l4_upsert_set is the
    # registered query form of the same computation):
    merged = lww_merge(a, b).select("key", "price", "version")
    target = a.select("key", "price", "version")
    f, aa = merged.alias("f"), target.alias("a")
    ups = (
        f.join(aa, F.col("f.key") == F.col("a.key"), "left")
        .filter(
            F.col("a.key").isNull()
            | (F.col("f.version") != F.col("a.version"))
            | (F.col("f.price") != F.col("a.price"))
        )
        .select(F.col("f.key").alias("key"), F.col("f.price").alias("price"),
                F.col("f.version").alias("version"))
    )
    applied = apply_upserts(target, ups)
    # Round-trip: applying the diff makes A equal to the merged state.
    assert _norm(applied) == _norm(merged)
    # Idempotence: applying the same set again changes nothing.
    again = apply_upserts(applied, ups)
    assert _norm(again) == _norm(applied)


def test_deletion_set_disjoint_from_upsert_keys(spark):
    from cassandra_elasticsearch_sync_spark.sync.ops import (
        l4_upsert_set as l4,
        l5_deletion_propagation as l5,
    )

    ups = {r["key"] for r in l4(spark, SF_DIR).collect()}
    dels = {r["key"] for r in l5(spark, SF_DIR).collect()}
    assert ups.isdisjoint(dels)


def test_three_way_merge_order_independent(spark):
    """Folding three snapshots converges to the same (key, version) map
    regardless of merge order - the associativity that makes L7's
    micro-batching and any multi-store topology safe."""
    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    parts = [
        o.filter(F.col("o_orderkey") % 3 == i).select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("version"),
        ).withColumn("side", F.lit(s))
        for i, s in ((0, "a"), (1, "b"), (2, "c"))
    ]
    # overlap: part c also contains %3==0 keys with bumped versions
    bump = parts[0].withColumn("version", F.col("version") + F.expr("INTERVAL 5 DAYS")) \
                   .withColumn("side", F.lit("c"))
    c = parts[2].unionByName(bump)

    left = lww_merge(lww_merge(parts[0], parts[1]), c)
    right = lww_merge(parts[0], lww_merge(parts[1], c))
    l = sorted((r["key"], r["version"]) for r in left.collect())
    r = sorted((r["key"], r["version"]) for r in right.collect())
    assert l == r
