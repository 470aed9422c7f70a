#!/usr/bin/env python3
"""Scale smoke: replicate sf0.1 into /tmp at two scale points and time
the headline operators at each - evidence that the scaling curve holds
across a decade, not a single point. Not part of the driver gate.

Point A (~sf1):  10x facts, 10x documents, base embeddings.
Point B (~sf6):  60x facts (36M-row lineitem), 30x documents, 100x
                 embeddings (50k vectors).

documents scale slower than facts on purpose: replication multiplies
DUP-FAMILY sizes, and k2's candidate-pair output grows quadratically in
family multiplicity - at 30x the pair count is ~9x the 10x point's by
construction, so the interesting signal is that RUNTIME grows like the
OUTPUT (the join is bounded by real work), not like corpus^2.
embeddings replicate with fresh vec_ids (real corpus growth, constant
dup structure), so k3 measures a genuinely 100x-larger ANN corpus.

Usage: python scale_smoke.py [--quick] [--only k1,k2,...]
  --quick        point A only
  --only LIST    run only the named PICKS (comma list) - for focused
                 new-operator second-decade runs; the corpus build and
                 point structure are identical to the full run
  --no-acid      skip the ACID-format probes (they are corpus-
                 independent; skip when a focused query run is wanted)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import pyspark.sql.functions as F

from cassandra_elasticsearch_sync_spark.registry import all_specs
from cassandra_elasticsearch_sync_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PICKS = ("flagship_pricing_summary", "q5_local_supplier_volume", "l3_lww_merge",
         "k1_exact_dedup", "k2_minhash_lsh_pairs", "k3_cosine_topk",
         "e9_decile_by_segment", "k7e_cumulative_users", "c7b_interval_overlap_join",
         # round-3 session additions with non-trivial shuffle shapes:
         # substring spans (shingle postings), span corruption (explode +
         # per-doc reassembly), perplexity terciles (bigram join + grouped
         # ntile), incremental dedup (hash anti-join probe)
         "k1d_substring_dup_spans", "k_span_corruption",
         "k_perplexity_buckets", "k1e_incremental_dedup",
         # second-continuation additions: Merkle tree (two store scans
         # + XOR rollups), hierarchy rollup (O(depth) join rounds),
         # CUSUM (day rollup + bounded windows), nearest as-of (union +
         # one user_id shuffle), change feed (snapshot full-outer diff)
         "l20_merkle_repair_protocol", "c11_hierarchy_rollup",
         "k7o_cusum_changepoint", "c8c_nearest_asof_join",
         # round-4 additions (VERDICT r3 #5): the growth-risky paths -
         # PQ ADC (codebook train + asymmetric distance scan), PQ with
         # exact rerank, MIPS (augmented-vector reduction), IVF probe
         "k3f_pq_adc_topk", "k3g_pq_rerank_topk", "k3i_mips_topk",
         "ann_ivf_topk",
         # round-4 continuation additions: RP-LSH (explode + band
         # equi-join over a 100x embedding corpus), Kaplan-Meier +
         # RFM (two-pass global-order primitives over per-user
         # aggregates), CUPED (per-user aggregate + 2-row reduce)
         "k3l_rp_lsh_near_pairs", "k7r_kaplan_meier_churn",
         "k_rfm_segmentation", "k_cuped_adjustment",
         # round-5 continuation additions: Mann-Whitney (distinct-value
         # cumulative ranks - cardinality grows with corpus), market
         # basket (per-order pair blowup), Zipf (corpus-sized token
         # count then top-1000), skyline (grouped-min + suffix window)
         "k_mann_whitney_u", "c14_market_basket_lift", "k_zipf_fit",
         "c13_skyline_per_group",
         # round-6 additions (VERDICT r5 #9): the sketch tier - HLL
         # (groupBy over (register), should be FLAT in corpus), the
         # grouped HLL, Count-Min (groupBy over (depth, bucket)),
         # feature hashing (token explode -> 64-bucket fold), plus
         # the ES kNN search (one scan + TakeOrdered gather) and the
         # CDC->ES round trip (fold + 2PC render + wire parse-back)
         "d4b_hll_sketch_exact", "d4c_hll_by_group", "k_cms_sketch",
         "k_feature_hashing", "a3as_es_knn_search",
         "l36_cdc_to_es_roundtrip",
         # round-11 additions (VERDICT r10 #7): a second decade for the
         # round-10/11 fact- and doc-sized shapes - reverse_nested
         # (child partial before the co-keyed parent join), PIT (ACID
         # store built in-query at corpus size, then a FIXED 6-page
         # walk: should grow like the build, never the walk), rank_eval
         # (request-stacked explode + WindowGroupLimit), _mget
         # (request-bounded broadcast against a 60x corpus - should be
         # FLAT), span_multi (one-split interval filter over 30x docs).
         # Dim-table shapes (geohex/ip_range/ip_prefix/terms_enum/
         # variable_width over customer/part) get their decade from
         # tools/decade_probe.py instead - SMALL dims don't replicate
         # here.
         "a3cz_es_reverse_nested", "a3dd_es_point_in_time",
         "a3dg_es_rank_eval", "a3dn_es_mget", "a3dp_es_span_multi",
         # round-12 additions (VERDICT r11 #7): second-decade points
         # for the round-11 wave-3/4 doc/fact-sized shapes -
         # _termvectors/_mtermvectors (corpus stats FILTERED by the
         # broadcast request vocabulary: should grow like the doc
         # scan), _analyze (one point-looked-up doc: FLAT),
         # categorize_text (map-side key + |categories|-bounded agg),
         # extended_stats_bucket (one fact aggregate then bucket-count
         # folds) - plus the round-12 shapes: the two write-by-query
         # paths (CoW rewrite of DSL-affected files over replicated
         # corpora), _explain (point-pruned: FLAT), terms_set-field
         # (one doc scan), parent agg (distinct pairs before the
         # co-keyed join over 60x facts), change_point (calendar-
         # bounded day windows: FLAT past the rollup), time_series
         # (|series|-bounded hash agg), span_field_masking (two-split
         # interval filter over 30x docs)
         "a3ds_es_termvectors", "a3dv_es_mtermvectors", "a3du_es_analyze",
         "a3dw_es_categorize_text", "a3dx_es_extended_stats_bucket",
         "a3dy_es_update_by_query", "a3dz_es_delete_by_query",
         "a3ea_es_explain", "a3eb_es_terms_set_field",
         "a3ec_es_parent_agg", "a3ed_es_change_point",
         "a3ee_es_time_series", "a3ef_es_span_field_masking",
         "a3eg_es_reindex", "a3eh_es_update_doc",
         "a2ai_cql_lwt_conditions", "a2aj_cql_materialized_view",
         "a2ak_cql_json_functions", "a2al_cql_static_columns",
         "a3ek_es_rule_query", "a3el_es_eql_event",
         "a3em_es_eql_sequence")

SMALL = ("region", "nation", "customer", "supplier", "part")


def build(spark, root: str, facts_x: int, docs_x: int, emb_x: int) -> float:
    """Materialize a replicated corpus; returns build seconds."""
    t0 = time.perf_counter()
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    for t in SMALL:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.parquet(f"{root}/{t}.parquet")
    # Facts: replicate via a range cross join (one wide scan, no
    # n-way union plan). The ORDER KEY is remapped per replica
    # (+rep*1e9, consistently on both orders and lineitem) so the
    # fact-fact join keeps base selectivity: replicating both sides
    # of a key join WITHOUT remapping multiplies matches by rep^2 -
    # the artifact behind q5's apparent 19x at the old 6x point, not
    # a plan property. Dimension FKs (custkey/suppkey/partkey,
    # user_id) stay in range of the unreplicated dims.
    rep = F.col("__rep")
    remap = {
        "orders": {"o_orderkey": F.col("o_orderkey") + rep * 1_000_000_000},
        "lineitem": {"l_orderkey": F.col("l_orderkey") + rep * 1_000_000_000},
        "events": {"event_id": F.col("event_id") + rep * 1_000_000_000},
    }
    for t in ("lineitem", "orders", "events"):
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        df = df.crossJoin(F.broadcast(
            spark.range(facts_x).select(F.col("id").alias("__rep"))))
        for c, expr in remap[t].items():
            df = df.withColumn(c, expr)
        df.drop("__rep").repartition(32).write.parquet(f"{root}/{t}.parquet")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    (
        d.crossJoin(F.broadcast(spark.range(docs_x).select(F.col("id").alias("__rep"))))
        .select(
            (F.col("doc_id") + F.col("__rep") * 1_000_000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .repartition(16)
        .write.parquet(f"{root}/documents.parquet")
    )
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    (
        e.crossJoin(F.broadcast(spark.range(emb_x).select(F.col("id").alias("__rep"))))
        .select(
            (F.col("vec_id") + F.col("__rep") * 1_000_000).alias("vec_id"),
            "embedding", "label",
        )
        .repartition(16)
        .write.parquet(f"{root}/embeddings.parquet")
    )
    return time.perf_counter() - t0


def run_point(spark, label: str, root: str,
              picks=PICKS) -> dict[str, float]:
    specs = all_specs()
    out: dict[str, float] = {}
    for name in picks:
        t0 = time.perf_counter()
        specs[name].fn(spark, root).write.mode("overwrite").format("noop").save()
        out[name] = time.perf_counter() - t0
        print(f"  {label} {name}: {out[name]:.1f}s", flush=True)
    return out


def acid_probe(spark, label: str, n_rows: int, n_slices: int) -> None:
    """ACID-format scale probe (VERDICT r3 #5): time MERGE / MoR delete
    / compaction / read with 10x the rows AND 10x the manifest entries,
    so both the data path and the MANIFEST path (stats pruning, entry
    carry-over, delete scoping) are exercised a decade up. The merge
    touches a fixed 1% key range: its cost should track affected
    entries, not table size."""
    import tempfile

    from cassandra_elasticsearch_sync_spark.sources.acid import AcidParquetTable

    root = tempfile.mkdtemp(prefix="ces_acid_scale_")
    try:
        t = AcidParquetTable(spark, root)
        df = spark.range(n_rows).select(
            F.col("id").alias("key"),
            (F.col("id") % 9973).cast("double").alias("price"),
            F.lit(1).alias("version"),
        )
        t0 = time.perf_counter()
        t.init_clustered(df, ["key"], n_slices=n_slices)
        t_init = time.perf_counter() - t0

        lo, hi = 0, n_rows // 100        # fixed 1% key slice
        src = spark.range(lo, hi).select(
            F.col("id").alias("key"),
            F.lit(-1.0).alias("price"),
            F.lit(2).alias("version"),
        )
        t0 = time.perf_counter()
        t.merge_into(src, ["key"], assume_unique_keys=True)
        t_merge = time.perf_counter() - t0
        n_after_merge = len(t._manifest(t.current_version())["files"])

        # Backfill-sized merge (round 5, VERDICT r4 #3): the source
        # spans EVERY key - beyond the broadcast probe cap - so the
        # file probe must take the shuffle semi-join path and the
        # merge rewrites all entries. The cost should track the full
        # rewrite (it IS one), with no executor-side broadcast of an
        # n_rows-sized key set.
        backfill = spark.range(n_rows).select(
            F.col("id").alias("key"),
            (F.col("id") % 7919).cast("double").alias("price"),
            F.lit(3).alias("version"),
        )
        t0 = time.perf_counter()
        t.merge_into(backfill, ["key"], assume_unique_keys=True)
        t_backfill = time.perf_counter() - t0

        dels = spark.range(n_rows).filter(F.col("id") % 1000 == 7).select(
            F.col("id").alias("key"))
        t0 = time.perf_counter()
        t.delete_keys_mor(dels, ["key"])
        t_mor = time.perf_counter() - t0

        t0 = time.perf_counter()
        t.compact_deletes()
        t_compact = time.perf_counter() - t0

        t0 = time.perf_counter()
        n = t.read().count()
        t_read = time.perf_counter() - t0
        m = t._manifest(t.current_version())
        print(f"  ACID {label}: rows={n_rows} slices={n_slices} -> "
              f"init {t_init:.1f}s, 1%-merge {t_merge:.1f}s "
              f"(entries {n_after_merge}), "
              f"backfill-merge(shuffle-probe) {t_backfill:.1f}s, "
              f"mor-delete {t_mor:.1f}s, "
              f"compact {t_compact:.1f}s, read {t_read:.1f}s "
              f"({n} rows, {len(m['files'])} entries after compact)",
              flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    quick = "--quick" in sys.argv
    picks = PICKS
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        unknown = [n for n in names if n not in PICKS]
        if unknown:
            raise SystemExit(f"--only names not in PICKS: {unknown}")
        picks = tuple(names)
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    points = [("A(~sf1)", "/tmp/ces_scale_A", 10, 10, 10)]
    if not quick:
        points.append(("B(~sf6)", "/tmp/ces_scale_B", 60, 30, 100))

    if "--no-acid" not in sys.argv:
        acid_probe(spark, "small", 1_500_000, 16)
        if not quick:
            acid_probe(spark, "10x", 15_000_000, 160)

    results = {}
    for label, root, fx, dx, ex in points:
        b = build(spark, root, fx, dx, ex)
        print(f"{label}: corpus built in {b:.0f}s "
              f"(facts x{fx}, docs x{dx}, embeddings x{ex})", flush=True)
        results[label] = run_point(spark, label, root, picks)
        shutil.rmtree(root, ignore_errors=True)

    if len(results) == 2:
        a, b = results["A(~sf1)"], results["B(~sf6)"]
        print("\nquery                              A(~sf1)  B(~sf6)  "
              "time-ratio (data-ratio 6x facts / 3x docs / 10x emb)")
        for n in picks:
            print(f"{n:34s} {a[n]:7.1f}  {b[n]:7.1f}  {b[n]/max(a[n],1e-9):5.1f}x")


if __name__ == "__main__":
    main()
