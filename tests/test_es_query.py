"""ES query-DSL translator: DSL results == equivalent native filters,
and the compiled predicate reaches the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_elasticsearch_sync_spark.catalog import load_table
from cassandra_elasticsearch_sync_spark.sources.es_query import compile_query, es_search

SF_DIR = "/root/testdata/sf0.001"


def test_term_terms_range_bool(spark):
    o = load_table(spark, SF_DIR, "orders")
    q = {
        "bool": {
            "must": [
                {"terms": {"o_orderstatus": ["F", "P"]}},
                {"range": {"o_totalprice": {"gte": 100000, "lt": 300000}}},
            ],
            "must_not": [{"term": {"o_orderpriority": "5-LOW"}}],
        }
    }
    got = es_search(o, q).count()
    want = o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & (F.col("o_totalprice") >= 100000)
        & (F.col("o_totalprice") < 300000)
        & (F.col("o_orderpriority") != "5-LOW")
    ).count()
    assert got == want and got > 0


def test_match_and_prefix(spark):
    d = load_table(spark, SF_DIR, "documents")
    got = es_search(d, {"match": {"text": "spark MERGE"}}).count()
    want = d.filter(
        F.array_contains(F.split(F.lower("text"), " "), "spark")
        | F.array_contains(F.split(F.lower("text"), " "), "merge")
    ).count()
    assert got == want and got > 0
    assert es_search(d, {"prefix": {"source": "src1"}}).count() == \
        d.filter(F.col("source").startswith("src1")).count()


def test_should_is_or(spark):
    c = load_table(spark, SF_DIR, "customer")
    q = {"bool": {"should": [{"term": {"c_mktsegment": "BUILDING"}},
                             {"term": {"c_mktsegment": "MACHINERY"}}]}}
    assert es_search(c, q).count() == c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).count()


def test_predicate_pushdown_reaches_scan(spark):
    o = load_table(spark, SF_DIR, "orders")
    filtered = es_search(o, {"term": {"o_orderstatus": "F"}}).select("o_orderkey")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan.split("DataFilters")[1][:200], plan[:1200]


def test_match_all_and_exists(spark):
    e = load_table(spark, SF_DIR, "events")
    assert es_search(e, {"match_all": {}}).count() == e.count()
    assert es_search(e, {"exists": {"field": "props"}}).count() == \
        e.filter(F.col("props").isNotNull()).count()


def test_unsupported_clause_errors_clearly():
    import pytest
    # `fuzzy` graduated to a supported clause; `more_like_this` needs a
    # scoring index and stays rejected-not-guessed.
    with pytest.raises(ValueError,
                       match="unsupported ES query clause: more_like_this"):
        compile_query({"more_like_this": {"fields": ["text"], "like": "x"}})
    with pytest.raises(ValueError, match="single-clause"):
        compile_query({"term": {"a": 1}, "range": {"b": {}}})


def test_empty_bool_matches_all(spark):
    o = load_table(spark, SF_DIR, "orders")
    assert es_search(o, {"bool": {}}).count() == o.count()


def test_es_bulk_lines_roundtrip(spark):
    import json

    from cassandra_elasticsearch_sync_spark.sources.readers import es_bulk_lines

    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(50)
    bulk = es_bulk_lines(o, "o_orderkey", "orders_idx").collect()
    assert len(bulk) == 50
    for r in bulk:
        action = json.loads(r["action_line"])
        assert action["index"]["_index"] == "orders_idx"
        assert action["index"]["_id"] == r["_id"]
        src = json.loads(r["source_line"])
        assert str(src["o_orderkey"]) == r["_id"]
        assert set(src) == {"o_orderkey", "o_orderstatus", "o_totalprice"}


def test_range_agg_overlapping_ranges(spark):
    """ES range-agg semantics: a doc lands in EVERY matching range when
    ranges overlap (ADVICE r2) - not just the first."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    df = spark.createDataFrame(
        [(50,), (150,), (250,), (350,)], "price int"
    )
    out = es_aggregate(df, {
        "bands": {
            "range": {
                "field": "price",
                "ranges": [
                    {"to": 200},                  # 50, 150
                    {"from": 100, "to": 300},     # 150, 250  (overlaps)
                    {"from": 300},                # 350
                ],
            },
        }
    })
    got = {r.key: r.doc_count for r in out.collect()}
    assert got == {"*-200": 2, "100-300": 2, "300-*": 1}


def test_multi_match_and_nested_bool_filter(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

    df = spark.createDataFrame(
        [("alpha beta", "news", 10), ("gamma delta", "blog", 99),
         ("beta gamma", "news", 5)],
        "body string, channel string, score int",
    )
    q = {
        "bool": {
            "must": [
                {"multi_match": {"query": "alpha gamma", "fields": ["body", "channel"]}}
            ],
            "filter": [{"range": {"score": {"gte": 6}}}],
        }
    }
    got = {r.body for r in es_search(df, q).collect()}
    assert got == {"alpha beta", "gamma delta"}


def test_significant_terms_needs_background(spark):
    import pytest as _pytest
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    df = spark.range(3).selectExpr("CAST(id AS STRING) AS lang")
    with _pytest.raises(ValueError, match="background"):
        es_aggregate(df, {"s": {"significant_terms": {"field": "lang"}}})


def test_significant_terms_jlh_scoring(spark):
    """Hand-checked JLH: fg = 3 'a' + 1 'b', bg = 4 'a' + 4 'b'.
    'a': fg%=0.75, bg%=0.5 -> (0.25)*(1.5)=0.375, positive.
    'b': fg%=0.25, bg%=0.5 -> negative, excluded."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    bg = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 4, "lang string"
    )
    fg = spark.createDataFrame([("a",)] * 3 + [("b",)], "lang string")
    out = es_aggregate(
        fg, {"s": {"significant_terms": {"field": "lang", "size": 5}}},
        background=bg,
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["key"] == "a" and row["doc_count"] == 3 and row["bg_count"] == 4
    assert abs(row["score"] - 0.375) < 1e-9


def test_search_after_direction_aware_cursor(spark):
    """Page 2 must start strictly after page 1's last row under a
    mixed-direction sort, with no overlap and no gap."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search_page

    df = spark.createDataFrame(
        [(i, float(100 - (i % 5))) for i in range(20)], "id long, score double"
    )
    sort = [("score", "desc"), ("id", "asc")]
    p1 = es_search_page(df, {"match_all": {}}, sort, size=7).collect()
    cursor = [p1[-1]["score"], p1[-1]["id"]]
    p2 = es_search_page(df, {"match_all": {}}, sort, search_after=cursor,
                        size=7).collect()
    everything = es_search_page(df, {"match_all": {}}, sort, size=14).collect()
    assert p1 + p2 == everything


def test_search_after_cursor_arity_checked(spark):
    import pytest as _pytest
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search_page

    df = spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS score")
    with _pytest.raises(ValueError, match="arity"):
        es_search_page(df, {"match_all": {}}, [("score", "desc"), ("id", "asc")],
                       search_after=[1.0], size=5)


def test_wildcard_escapes_sql_metachars(spark):
    """* and ? translate; literal % and _ in the pattern must NOT
    become SQL wildcards."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

    df = spark.createDataFrame(
        [("a_b",), ("axb",), ("50%",), ("50x",), ("a?b",)], "s string"
    )
    assert {r["s"] for r in es_search(df, {"wildcard": {"s": "a?b"}}).collect()} == {
        "a_b", "axb", "a?b"
    }
    assert {r["s"] for r in es_search(df, {"wildcard": {"s": "50%"}}).collect()} == {
        "50%"
    }
    assert {r["s"] for r in es_search(df, {"wildcard": {"s": "a_b"}}).collect()} == {
        "a_b"
    }


def test_function_score_multiply_mode(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_function_score

    df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id long, v double")
    out = es_function_score(
        df, {"match_all": {}},
        [
            {"field_value_factor": {"field": "v", "factor": 2.0}},
            {"filter": {"range": {"v": {"gte": 20}}}, "weight": 0.5},
        ],
        sort_tiebreak="id", score_mode="multiply", size=3,
    ).collect()
    # scores: v*2 * (0.5 if v>=20 else 0) -> 30: 30, 20: 20, 10: 0
    assert [(r["id"], r["score"]) for r in out] == [(3, 30.0), (2, 20.0), (1, 0.0)]


def test_bucket_script_selector_sort(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 30.0), ("b", 100.0), ("c", 1.0)],
        "grp string, v double")
    out = es_aggregate(df, {
        "by_grp": {
            "terms": {"field": "grp", "size": 10},
            "aggs": {
                "total": {"sum": {"field": "v"}},
                "per_doc": {"bucket_script": {
                    "buckets_path": {"t": "total", "n": "_count"},
                    "script": "params.t / params.n",
                }},
                "keep": {"bucket_selector": {
                    "buckets_path": {"p": "per_doc"},
                    "script": "params.p > 10.0",
                }},
                "page": {"bucket_sort": {
                    "sort": [{"per_doc": {"order": "desc"}}], "size": 1,
                }},
            },
        }
    }).collect()
    # a: 40/2=20, b: 100/1=100, c: 1/1=1 -> selector keeps a,b -> top1 = b
    assert [(r["key"], r["per_doc"]) for r in out] == [("b", 100.0)]


def test_bucket_sort_from_offset(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    df = spark.createDataFrame(
        [(g, 1.0) for g in "aaabbc"], "grp string, v double")
    out = es_aggregate(df, {
        "by_grp": {
            "terms": {"field": "grp", "size": 10},
            "aggs": {
                "page": {"bucket_sort": {
                    "sort": [{"doc_count": {"order": "desc"}}],
                    "from": 1, "size": 1,
                }},
            },
        }
    }).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("b", 2)]


def test_bucket_pipeline_rejected_outside_terms_or_histogram(spark):
    import pytest as _pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    df = spark.createDataFrame([("a", 1.0)], "grp string, v double")
    with _pytest.raises(ValueError, match="bucket_script"):
        es_aggregate(df, {
            "c": {
                "composite": {"sources": [{"g": {"terms": {"field": "grp"}}}]},
                "aggs": {"x": {"bucket_selector": {
                    "buckets_path": {"n": "_count"},
                    "script": "params.n > 0",
                }}},
            }
        })


def test_nested_query_same_element_semantics(spark):
    """nested must require ONE element to satisfy the whole inner
    query; two flattened top-level conditions would also match doc 2
    (different items satisfying each condition)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

    docs = spark.createDataFrame(
        [(1, [(10, 5.0), (2, 100.0)]),   # one item has qty>=10 AND price>=5
         (2, [(10, 1.0), (2, 100.0)]),   # conditions split across items
         (3, [(1, 1.0)])],
        "doc_id bigint, items array<struct<qty:int, price:double>>")
    q = {"nested": {"path": "items", "query": {"bool": {"must": [
        {"range": {"items.qty": {"gte": 10}}},
        {"range": {"items.price": {"gte": 5.0}}},
    ]}}}}
    got = sorted(r["doc_id"] for r in es_search(docs, q).collect())
    assert got == [1]


def test_nested_query_plan_has_no_explode_or_udf(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

    docs = spark.createDataFrame(
        [(1, [(10, 5.0)])],
        "doc_id bigint, items array<struct<qty:int, price:double>>")
    q = {"nested": {"path": "items",
                    "query": {"range": {"items.qty": {"gte": 10}}}}}
    plan = es_search(docs, q)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan          # no explode
    assert "BatchEvalPython" not in plan   # no python UDF
    assert "exists" in plan


def test_composite_sweep_tiles_bucket_space(spark):
    """Pages must tile the full bucket space: no gaps, no overlaps,
    compound-key ascending, last page short or the sweep ends on an
    empty page."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_composite_sweep,
    )

    df = spark.createDataFrame(
        [(chr(ord("a") + i % 5), i % 2, 1.0) for i in range(40)],
        "g string, h int, v double")
    out = es_composite_sweep(df, {
        "s": {"composite": {
            "sources": [{"g": {"terms": {"field": "g"}}},
                        {"h": {"terms": {"field": "h"}}}],
            "size": 4,
        }}
    }).collect()
    keys = [(r["g"], r["h"]) for r in out]
    assert keys == sorted(keys)                       # ascending, no overlap
    assert len(set(keys)) == len(keys) == 10          # all 5*2 buckets
    pages = [r["page"] for r in out]
    assert pages == sorted(pages)
    # size-4 pages over 10 buckets -> 3 pages (4, 4, 2)
    assert max(pages) == 2


def test_composite_sweep_respects_initial_after(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_composite_sweep,
    )

    df = spark.createDataFrame(
        [(chr(ord("a") + i % 5), 1.0) for i in range(20)],
        "g string, v double")
    out = es_composite_sweep(df, {
        "s": {"composite": {
            "sources": [{"g": {"terms": {"field": "g"}}}],
            "size": 2,
            "after": {"g": "b"},
        }}
    }).collect()
    assert [r["g"] for r in out] == ["c", "d", "e"]


def test_geo_distance_parsing_and_symmetry(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _haversine_m,
        _parse_distance_m,
    )

    assert _parse_distance_m("500km") == 500_000.0
    assert _parse_distance_m("10mi") == 10 * 1609.344
    assert _parse_distance_m("250m") == 250.0
    assert _parse_distance_m(42) == 42.0
    assert _parse_distance_m("1nmi") == 1852.0
    # haversine sanity: symmetric, zero at identity, ~111.19 km/degree
    df = spark.createDataFrame([(0.0, 0.0, 1.0, 0.0)], "a double, b double, c double, d double")
    r = df.select(
        _haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d1"),
        _haversine_m(F.col("c"), F.col("d"), F.col("a"), F.col("b")).alias("d2"),
        _haversine_m(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("z"),
    ).collect()[0]
    assert r["d1"] == r["d2"]
    assert r["z"] == 0.0
    assert abs(r["d1"] - 111_195.0) < 100  # one degree of arc


def test_geo_bounding_box_and_antimeridian_wrap(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 170.0), (2, 10.0, -170.0), (3, 10.0, 0.0),
         (4, 50.0, 170.0), (5, -50.0, -170.0)],
        "id int, lat double, lon double",
    ).select("id", F.struct(F.col("lat").alias("lat"),
                            F.col("lon").alias("lon")).alias("location"))
    # plain box: lat [0, 20], lon [-20, 20] -> only point 3
    plain = {"geo_bounding_box": {"location": {
        "top_left": {"lat": 20.0, "lon": -20.0},
        "bottom_right": {"lat": 0.0, "lon": 20.0}}}}
    assert [r["id"] for r in es_search(pts, plain).collect()] == [3]
    # wrapped box: lon [160, -160] crosses the antimeridian -> 1 and 2
    wrap = {"geo_bounding_box": {"location": {
        "top_left": {"lat": 20.0, "lon": 160.0},
        "bottom_right": {"lat": 0.0, "lon": -160.0}}}}
    got = sorted(r["id"] for r in es_search(pts, wrap).collect())
    assert got == [1, 2]


def test_filters_agg_empty_bucket_matches_es_shape(spark):
    """ES `filters` agg always returns every named bucket - an empty
    one carries doc_count 0 and NULL metrics (no sum of nothing).
    Also pins bucket order = spec order (ES keyed response order)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_aggregate

    o = load_table(spark, SF_DIR, "orders")
    out = es_aggregate(o, {
        "kpis": {
            "filters": {"filters": {
                "none": {"term": {"o_orderstatus": "ZZZ"}},
                "all": {"range": {"o_totalprice": {"gte": 0}}},
            }},
            "aggs": {
                "revenue": {"sum": {"field": "o_totalprice"}},
                "max_price": {"max": {"field": "o_totalprice"}},
            },
        }
    }).collect()
    assert [r["key"] for r in out] == ["none", "all"]
    none, all_ = out
    assert none["doc_count"] == 0
    assert none["revenue"] is None and none["max_price"] is None
    assert all_["doc_count"] == o.count()
    assert all_["max_price"] is not None


def test_percolate_single_scan_plan(spark):
    """N stored queries must compile to ONE scan + one generate -
    never a union of per-query scans."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _PERCOLATE_DEMO,
        es_percolate,
    )

    d = load_table(spark, SF_DIR, "documents")
    out = es_percolate(d, _PERCOLATE_DEMO)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 1, plan[:1500]
    assert "Union" not in plan


def test_percolate_doc_matches_expected_queries(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_percolate,
    )

    d = spark.createDataFrame(
        [(1, "i love apache spark", "en", 19),
         (2, "short", "de", 5),
         (3, "x" * 950, "en", 950)],
        "doc_id bigint, text string, lang string, n_chars bigint")
    stored = {
        "short_en": {"bool": {"must": [
            {"term": {"lang": "en"}},
            {"range": {"n_chars": {"lt": 200}}}]}},
        "spark": {"match": {"text": "spark"}},
        "long": {"range": {"n_chars": {"gte": 900}}},
    }
    got = {(r.doc_id, r.query_id)
           for r in es_percolate(d, stored).select("doc_id", "query_id").collect()}
    assert got == {(1, "short_en"), (1, "spark"), (3, "long")}


def test_match_bool_prefix_semantics(spark):
    """Completed terms at word boundaries, trailing term as a prefix
    on any token - and substring-in-the-middle must NOT match."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_search,
    )

    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "the brownie recipe"),
         (3, "foxtrot dance"), (4, "unrelated words")],
        "id bigint, text string")
    q = {"match_bool_prefix": {"text": "quick bro"}}
    got = {r.id for r in es_search(df, q).collect()}
    # 1: 'quick' term + 'bro' prefix of 'brown'; 2: 'bro' prefix of
    # 'brownie'; 3/4: neither ('foxtrot' has no 'quick' and no token
    # starts with 'bro')
    assert got == {1, 2}
    # empty query matches nothing
    assert es_search(df, {"match_bool_prefix": {"text": "  "}}).count() == 0


# ---------------------------------------------------------------------------
# ES kNN vector search (a3as / es_knn_search)
# ---------------------------------------------------------------------------

def _emb(spark):
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    return load_table(spark, "/root/testdata/sf0.001", "embeddings")


def _knn(qv, **over):
    spec = {"field": "embedding", "query_vector": qv, "k": 3,
            "num_candidates": 10, "similarity": "cosine"}
    spec.update(over)
    return spec


def test_knn_rejects_k_above_num_candidates(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_knn_search
    e = _emb(spark)
    qv = [float(x) for x in e.head()["embedding"]]
    with pytest.raises(ValueError, match="num_candidates"):
        es_knn_search(e, _knn(qv, k=50, num_candidates=10), id_col="vec_id")
    with pytest.raises(ValueError, match="positive"):
        es_knn_search(e, _knn(qv, k=0), id_col="vec_id")
    with pytest.raises(ValueError, match="similarity"):
        es_knn_search(e, _knn(qv, similarity="hamming"), id_col="vec_id")


def test_knn_filter_is_pre_filter(spark):
    """Every returned hit satisfies the DSL filter (ES pre-filter rule:
    k results AFTER filtering, not filtered-down-from-k)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_knn_search
    e = _emb(spark)
    qv = [float(x) for x in e.head()["embedding"]]
    flt = {"term": {"label": e.select("label").head()[0]}}
    out = es_knn_search(e, _knn(qv, k=5, num_candidates=20, filter=flt),
                        id_col="vec_id").collect()
    assert len(out) == 5
    allowed = {r[0] for r in
               e.filter(f"label = {e.select('label').head()[0]}")
               .select("vec_id").collect()}
    assert all(r["vec_id"] in allowed for r in out)


def test_knn_self_hit_scores_one_under_cosine(spark):
    """The query vector's own row must rank first with _score = 1.0."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_knn_search
    e = _emb(spark)
    row = e.orderBy("vec_id").head()
    out = es_knn_search(e, _knn([float(x) for x in row["embedding"]], k=1),
                        id_col="vec_id").collect()
    assert out[0]["vec_id"] == row[0]
    assert out[0]["_score"] == 1.0


def test_knn_plan_is_take_ordered(spark):
    """The gather/merge must compile to TakeOrderedAndProject - the
    shard-gather architecture, never a global sort."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_knn_search
    e = _emb(spark)
    qv = [float(x) for x in e.head()["embedding"]]
    plan = es_knn_search(e, _knn(qv), id_col="vec_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_knn_l2_and_dot_product_scores(spark):
    """l2_norm: identical vector -> 1.0; dot_product: (1+dot)/2."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_knn_search
    e = _emb(spark)
    row = e.orderBy("vec_id").head()
    qv = [float(x) for x in row["embedding"]]
    l2 = es_knn_search(e, _knn(qv, similarity="l2_norm"),
                       id_col="vec_id").collect()
    assert l2[0]["vec_id"] == row[0] and l2[0]["_score"] == 1.0
    dp = es_knn_search(e, _knn(qv, similarity="dot_product", k=1),
                       id_col="vec_id").head()
    expect = round((1.0 + sum(x * x for x in qv)) / 2, 6)
    got = es_knn_search(
        e.filter(f"vec_id = {row[0]}"),
        _knn(qv, similarity="dot_product", k=1), id_col="vec_id").head()
    assert abs(got["_score"] - expect) < 5e-7


def test_rescore_window_rule_and_plan(spark):
    """ES rescore: size > window_size rejected (ES's own rule); hits
    below the window can never enter the page even with a huge
    secondary boost; both phases are TakeOrderedAndProject."""
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_rescore

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    base_fns = [{"field_value_factor": {"field": "o_totalprice",
                                        "factor": 1.0}}]
    spec = {"window_size": 5,
            "query": {"rescore_query_functions": [
                # enormous boost for the LOWEST-priced orders: would
                # dominate if below-window hits could re-enter
                {"filter": {"range": {"o_totalprice": {"lt": 1000}}},
                 "weight": 1e12}],
                "query_weight": 1.0, "rescore_query_weight": 1.0}}
    with pytest.raises(ValueError, match="window_size"):
        es_rescore(o, {"term": {"o_orderstatus": "F"}}, base_fns,
                   spec, sort_tiebreak="o_orderkey", size=10)
    out = es_rescore(o, {"term": {"o_orderstatus": "F"}}, base_fns,
                     spec, sort_tiebreak="o_orderkey", size=5)
    rows = out.collect()
    window_keys = {r["o_orderkey"] for r in
                   o.filter("o_orderstatus = 'F'")
                   .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
                   .limit(5).collect()}
    assert {r["o_orderkey"] for r in rows} <= window_keys
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 2, plan[:2000]


def test_term_suggester_rules(spark):
    """ES term-suggester semantics: suggest_mode=missing never
    suggests for an in-vocabulary term; always does; max_edits
    validation matches ES (1 or 2 only); every suggestion is within
    max_edits of its input."""
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_term_suggest,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="max_edits"):
        es_term_suggest(d, "text", ["x"], max_edits=3)
    with pytest.raises(ValueError, match="suggest_mode"):
        es_term_suggest(d, "text", ["x"], suggest_mode="popular2")
    missing = es_term_suggest(d, "text", ["spark", "strem"],
                              suggest_mode="missing").collect()
    assert not [r for r in missing if r["input"] == "spark"]
    strem = [r for r in missing if r["input"] == "strem"]
    assert strem and all(1 <= r["distance"] <= 2 for r in strem)
    always = es_term_suggest(d, "text", ["spark"],
                             suggest_mode="always").collect()
    assert always  # in-vocab term still gets near neighbors
    assert all(r["suggestion"] != "spark" for r in always)


def test_highlight_semantics(spark):
    """Highlight: every hit's snippet contains exactly one tagged
    occurrence, the tagged token IS the term, snippet length respects
    the fragment budget, non-matching docs are absent, and multi-word
    terms are rejected."""
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_highlight,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="single token"):
        es_highlight(d, "text", "two words")
    out = es_highlight(d, "text", "merge", fragment_size=60).collect()
    n_match = d.filter(
        "text LIKE '% merge %' OR text LIKE 'merge %' "
        "OR text LIKE '% merge' OR text = 'merge'").count()
    assert len(out) == n_match > 0
    for r in out:
        assert r["snippet"].count("<em>merge</em>") == 1
        assert len(r["snippet"]) <= 60 + len("merge") + 2 \
            + len("<em></em>") + 2


def test_span_near_semantics(spark):
    """span_near: slop counts tokens BETWEEN the spans, in_order pins
    direction, unordered accepts either; invalid clause shapes are
    rejected."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [(1, "merge the spark job"),        # gap 1, in order
            (2, "merge a b c d spark"),        # gap 4
            (3, "spark then merge"),           # reversed, gap 1
            (4, "merge spark"),                # adjacent, gap 0
            (5, "no terms here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def hits(slop, in_order):
        q = {"span_near": {
            "clauses": [{"span_term": {"text": "merge"}},
                        {"span_term": {"text": "spark"}}],
            "slop": slop, "in_order": in_order}}
        return {r.doc_id for r in df.filter(compile_query(q)).collect()}

    assert hits(0, True) == {4}
    assert hits(1, True) == {1, 4}
    assert hits(4, True) == {1, 2, 4}
    assert hits(1, False) == {1, 3, 4}

    with pytest.raises(ValueError, match="exactly two clauses"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "a"}}], "slop": 1}})
    with pytest.raises(ValueError, match="share one field"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "a"}},
            {"span_term": {"lang": "b"}}], "slop": 1}})


def test_span_family_hand_built_layouts(spark):
    """span_or / span_first / span_not over hand-built token layouts:
    union, Lucene-exclusive end cap, pre/post exclusion neighborhood;
    plus composition (span_or inside span_near)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [(1, "merge a b spark x"),
            (2, "spark then merge"),
            (3, "merge spark"),
            (4, "nothing here"),
            (5, "x slow spark y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def hits(q):
        return {r.doc_id for r in df.filter(compile_query(q)).collect()}

    # span_or = union of the clause interval sets
    assert hits({"span_or": {"clauses": [
        {"span_term": {"text": "nothing"}},
        {"span_term": {"text": "then"}}]}}) == {2, 4}

    # span_first: end is the EXCLUSIVE Lucene end position - end=1
    # admits only a span ending at token 0
    assert hits({"span_first": {
        "match": {"span_term": {"text": "spark"}}, "end": 1}}) == {2}
    assert hits({"span_first": {
        "match": {"span_term": {"text": "spark"}}, "end": 2}}) == {2, 3}

    # span_not: exclude kills include spans within pre/post tokens.
    # doc3 'merge spark': merge@0 is within 1 of spark@1 -> excluded;
    # doc5 'x slow spark y': slow@1 within 1 of spark@2 -> excluded;
    # doc1 spark@3 vs merge@0 -> outside the neighborhood, kept.
    assert hits({"span_not": {
        "include": {"span_term": {"text": "spark"}},
        "exclude": {"span_or": {"clauses": [
            {"span_term": {"text": "merge"}},
            {"span_term": {"text": "slow"}}]}},
        "pre": 1, "post": 1}}) == {1, 2}
    # pre=post=0 (ES default) = overlap-only: nothing overlaps a
    # zero-length term span but itself -> all spark docs survive
    assert hits({"span_not": {
        "include": {"span_term": {"text": "spark"}},
        "exclude": {"span_term": {"text": "merge"}}}}) == {1, 2, 3, 5}

    # composition: span_near over a span_or sub-clause. doc1
    # merge@0..spark@3 (gap 2) and doc3 merge@0..spark@1 (gap 0)
    # fit slop=2 ordered; doc2's merge FOLLOWS then -> out.
    assert hits({"span_near": {"clauses": [
        {"span_term": {"text": "merge"}},
        {"span_or": {"clauses": [{"span_term": {"text": "spark"}},
                                 {"span_term": {"text": "then"}}]}},
    ], "slop": 2, "in_order": True}}) == {1, 3}


def test_intervals_hand_built_layouts(spark):
    """intervals: match gap/order budgets, any_of union, all_of
    containment with max_gaps; ordered flips; defaults (max_gaps=-1
    unlimited, unordered); rejections stay loud."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [(1, "a x b"),       # a..b gap 1
            (2, "b a"),         # reversed adjacent
            (3, "a b"),         # ordered adjacent
            (4, "a x x x x b"),  # gap 4
            (5, "c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def hits(rule):
        return {r.doc_id for r in
                df.filter(compile_query({"intervals": {"text": rule}})).collect()}

    assert hits({"match": {"query": "a b", "ordered": True,
                           "max_gaps": 0}}) == {3}
    assert hits({"match": {"query": "a b", "ordered": True,
                           "max_gaps": 1}}) == {1, 3}
    assert hits({"match": {"query": "a b", "max_gaps": 0}}) == {2, 3}
    # default max_gaps = -1 = unlimited
    assert hits({"match": {"query": "a b", "ordered": True}}) == {1, 3, 4}
    assert hits({"any_of": {"intervals": [
        {"match": {"query": "c"}}, {"match": {"query": "x"}}]}}) \
        == {1, 4, 5}
    # all_of: 'a' then any_of('x', 'd') within 0 gaps, ordered
    assert hits({"all_of": {"ordered": True, "max_gaps": 0, "intervals": [
        {"match": {"query": "a"}},
        {"any_of": {"intervals": [{"match": {"query": "x"}},
                                  {"match": {"query": "d"}}]}},
    ]}}) == {1, 4}

    with pytest.raises(ValueError, match="one or two terms"):
        compile_query({"intervals": {"text": {
            "match": {"query": "a b c"}}}})
    with pytest.raises(ValueError, match="exactly two sub-rules"):
        compile_query({"intervals": {"text": {"all_of": {"intervals": [
            {"match": {"query": "a"}}]}}}})
    with pytest.raises(ValueError, match="unsupported intervals rule"):
        compile_query({"intervals": {"text": {"fuzzy": {}}}})


def test_rrf_semantics_and_plan(spark):
    """RRF: hybrid agreement beats single-leg dominance; docs outside
    a leg's window contribute nothing; size <= window enforced; no
    WindowExec in the plan (per-leg ranks are TakeOrdered +
    broadcast self-join)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import es_rrf

    rows = [(1, 100.0, 10), (2, 90.0, 9), (3, 80.0, 100),
            (4, 1.0, 8), (5, 2.0, 7)]
    df = spark.createDataFrame(rows, "id long, a double, b int")
    with pytest.raises(ValueError, match="rank_window_size"):
        es_rrf(df, [[("a", False), ("id", True)],
                    [("b", False), ("id", True)]], "id",
               rank_window_size=3, size=5)
    with pytest.raises(ValueError, match="two retrievers"):
        es_rrf(df, [[("a", False), ("id", True)]], "id")
    out = es_rrf(df, [[("a", False), ("id", True)],
                      [("b", False), ("id", True)]], "id",
                 rank_window_size=3, rank_constant=60, size=3)
    got = out.collect()
    # doc 1: r1=1, r2=2 -> 1/61 + 1/62; doc 3: r1=3, r2=1 -> 1/63+1/61
    # doc 2: r1=2, r2=3 -> 1/62 + 1/63 ; docs 4,5 outside both windows
    expect_order = sorted(
        {1: 1 / 61 + 1 / 62, 3: 1 / 63 + 1 / 61, 2: 1 / 62 + 1 / 63}.items(),
        key=lambda kv: (-kv[1], kv[0]))
    assert [r["id"] for r in got] == [k for k, _ in expect_order]
    assert all(abs(r["_score"] - dict(expect_order)[r["id"]]) < 1e-6
               for r in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan


def test_more_like_this_semantics(spark):
    """MLT: param validation; seed exclusion; min_term_freq /
    minimum_should_match gates; scores are exact scaled-integer sums
    (hand-computed on a 4-doc corpus)."""
    import math

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_more_like_this,
    )

    rows = [(1, "apple banana apple cherry"),
            (2, "apple banana durian"),
            (3, "banana cherry cherry"),
            (4, "durian fig grape")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_query_terms"):
        es_more_like_this(df, "text", "doc_id", 1, max_query_terms=0)
    with pytest.raises(ValueError, match="minimum_should_match"):
        es_more_like_this(df, "text", "doc_id", 1,
                          minimum_should_match=1.5)
    # seed=1: terms apple(tf2,df2) cherry(tf1,df2) banana(tf1,df3);
    # min_term_freq=1, min_doc_freq=2 keeps all three; wq =
    # floor(tf*ln(4/df)*2^20)
    out = es_more_like_this(
        df, "text", "doc_id", 1, max_query_terms=25, min_term_freq=1,
        min_doc_freq=2, minimum_should_match=0.3, size=10).collect()
    w = {t: math.floor(tf * math.log(4 / df) * 1048576)
         for t, tf, df in
         [("apple", 2, 2), ("banana", 1, 3), ("cherry", 1, 2)]}
    # msm = max(1, floor(3*0.3)) = 1; doc2 matches apple+banana,
    # doc3 banana+cherry, doc4 nothing; seed doc1 excluded
    exp = {2: w["apple"] + w["banana"], 3: w["banana"] + w["cherry"]}
    assert {r["doc_id"]: round(v / 1048576, 6)
            for r, v in zip(out, [0, 0])} or True
    got = {r["doc_id"]: r["_score"] for r in out}
    assert set(got) == set(exp)
    assert all(abs(got[k] - round(exp[k] / 1048576, 6)) < 1e-9
               for k in exp)
    assert [r["doc_id"] for r in out] == sorted(
        exp, key=lambda k: (-exp[k], k))
    # matched_terms gate: msm on a 3-term selection at 0.67 -> 2
    out2 = es_more_like_this(
        df, "text", "doc_id", 1, max_query_terms=25, min_term_freq=1,
        min_doc_freq=2, minimum_should_match=0.67, size=10).collect()
    assert all(r["matched_terms"] >= 2 for r in out2)


def test_phrase_suggester_rules(spark):
    """Phrase suggester: ES validation rules (max_edits in [1,2],
    positive size/per_slot, non-empty phrase); candidate ranking;
    StupidBackoff scoring hand-checked; empty result when a slot has
    no vocabulary candidate."""
    import math

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_phrase_suggest,
    )

    rows = [(1, "red fox jumps"), (2, "red fox runs"),
            (3, "red dog jumps")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for bad in (dict(max_edits=0), dict(max_edits=3), dict(size=0),
                dict(per_slot=0)):
        with pytest.raises(ValueError):
            es_phrase_suggest(df, "text", "red fox", **bad)
    with pytest.raises(ValueError, match="at least one token"):
        es_phrase_suggest(df, "text", "   ")
    # 'rad fax' -> slot0 {red(1)}, slot1 {fox(1), fax? not in vocab}
    out = es_phrase_suggest(df, "text", "rad fax", max_edits=1,
                            per_slot=3, size=5).collect()
    # vocab: red3 fox2 jumps2 runs1 dog1; T=9; bigram red->fox c=2
    exp_top = math.log(3 / 9) + math.log(2 / 3)
    assert out[0]["suggestion"] == "red fox"
    assert abs(out[0]["score"] - round(exp_top, 6)) < 1e-9
    # a slot that matches nothing within 1 edit -> no phrases
    none = es_phrase_suggest(df, "text", "red zzzzz", max_edits=1,
                             per_slot=3, size=5).collect()
    assert none == []
    # distance-0 keeps the real word and outranks an edit at equal
    # frequency: 'fox' slot candidates must rank fox (d0) first
    out2 = es_phrase_suggest(df, "text", "fox", max_edits=1,
                             per_slot=3, size=5).collect()
    assert out2[0]["suggestion"] == "fox"


def test_rate_agg_and_other_bucket_semantics(spark):
    """rate: calendar-aware divisor hand-checked on a fixed February
    (28 days) vs July (31 days); unit != day rejected. other_bucket:
    named + catch-all doc_counts partition the corpus; a null-field
    row lands in the other bucket."""
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    rows = [(dt.datetime(2001, 2, 10), 280.0),
            (dt.datetime(2001, 2, 20), 280.0),
            (dt.datetime(2001, 7, 1), 310.0)]
    df = spark.createDataFrame(rows, "d timestamp, v double")
    out = {r["key"]: r["revenue_per_day"] for r in es_aggregate(df, {
        "m": {"date_histogram": {"field": "d",
                                 "calendar_interval": "month"},
              "aggs": {"revenue_per_day": {
                  "rate": {"field": "v", "unit": "day",
                           "date_field": "d"}}}}}).collect()}
    assert out["2001-02"] == 20.0    # 560 / 28
    assert out["2001-07"] == 10.0    # 310 / 31
    with pytest.raises(ValueError, match="unit='day'"):
        es_aggregate(df, {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"r": {"rate": {"field": "v", "unit": "month",
                                    "date_field": "d"}}}}}).collect()

    rows2 = [("a", 1.0), ("b", 2.0), (None, 4.0), ("c", 8.0)]
    df2 = spark.createDataFrame(rows2, "s string, v double")
    got = {r["key"]: (r["doc_count"], r["total"]) for r in es_aggregate(df2, {
        "k": {"filters": {"filters": {
                  "is_a": {"term": {"s": "a"}},
                  "is_b": {"term": {"s": "b"}}},
              "other_bucket": True, "other_bucket_key": "rest"},
              "aggs": {"total": {"sum": {"field": "v"}}}}}).collect()}
    assert got["is_a"] == (1, 1.0) and got["is_b"] == (1, 2.0)
    # the null-s row matches NO filter -> lands in the catch-all
    assert got["rest"] == (2, 12.0)
    assert sum(c for c, _ in got.values()) == 4  # partition, no loss


def test_rate_agg_requires_monthly_date_histogram(spark):
    """ES rejects rate without a date_histogram ancestor; the compiler
    mirrors that (a terms parent or a non-month interval would make
    the days-in-month divisor silently wrong)."""
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    rows = [(dt.datetime(2001, 2, 10), "x", 280.0)]
    df = spark.createDataFrame(rows, "d timestamp, s string, v double")
    rate = {"rate": {"field": "v", "unit": "day", "date_field": "d"}}
    with pytest.raises(ValueError, match="date_histogram"):
        es_aggregate(df, {"m": {"terms": {"field": "s"},
                                "aggs": {"r": rate}}})
    with pytest.raises(ValueError, match="calendar_interval"):
        es_aggregate(df, {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "day"},
            "aggs": {"r": rate}}})


def test_other_bucket_key_collision_rejected(spark):
    """other_bucket_key colliding with a named filter must raise, not
    silently replace the user's bucket with the catch-all."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    df = spark.createDataFrame([("a", 1.0)], "s string, v double")
    with pytest.raises(ValueError, match="collides"):
        es_aggregate(df, {"k": {"filters": {
            "filters": {"is_a": {"term": {"s": "a"}}},
            "other_bucket": True, "other_bucket_key": "is_a"}}})


def test_extended_bounds_extends_never_clips(spark):
    """extended_bounds must EXTEND the bucket range, never clip it:
    data-derived buckets outside [min, max] survive (clipping is
    hard_bounds); empty scaffold buckets read doc_count 0 with sum
    metrics 0 and min/max NULL, as ES responds."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    df = spark.createDataFrame([(5.0,), (25.0,), (95.0,)], "v double")
    out = {r["key"]: r for r in es_aggregate(df, {
        "h": {"histogram": {"field": "v", "interval": 10.0,
                            "min_doc_count": 0,
                            "extended_bounds": {"min": 0, "max": 30}},
              "aggs": {"s": {"sum": {"field": "v"}},
                       "mx": {"max": {"field": "v"}}}}}).collect()}
    # the 90-bucket is OUTSIDE extended_bounds and must survive
    assert out[90.0]["doc_count"] == 1 and out[90.0]["s"] == 95.0
    # scaffold-only bucket: doc_count 0, sum 0, max NULL
    assert out[10.0]["doc_count"] == 0
    assert out[10.0]["s"] == 0.0 and out[10.0]["mx"] is None
    assert set(out) == {0.0, 10.0, 20.0, 30.0, 90.0}


def test_has_child_semantics(spark):
    """has_child hand-checked on a tiny parent/child corpus: filter
    context (semi join), min/max_children cardinality windows, and
    every score fold."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_has_child,
    )

    parents = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (3, "p3")], "pid long, pname string")
    children = spark.createDataFrame(
        [(1, "x", 10.0), (1, "x", 30.0), (2, "x", 5.0), (3, "y", 7.0)],
        "ppid long, tag string, v double")
    q = {"term": {"tag": "x"}}

    # filter context: parents 1 and 2 have an x-child, 3 does not
    got = sorted(r["pid"] for r in es_has_child(
        parents, children, "pid", "ppid", q).collect())
    assert got == [1, 2]
    # min_children=2 keeps only parent 1
    got2 = [r["pid"] for r in es_has_child(
        parents, children, "pid", "ppid", q, min_children=2).collect()]
    assert got2 == [1]
    # max_children=1 keeps only parent 2
    got3 = [r["pid"] for r in es_has_child(
        parents, children, "pid", "ppid", q, max_children=1).collect()]
    assert got3 == [2]
    # score folds over the matching children's field_value_factor(v)
    fns = [{"field_value_factor": {"field": "v", "factor": 1.0}}]
    for mode, exp in (("sum", {1: 40.0, 2: 5.0}),
                      ("min", {1: 10.0, 2: 5.0}),
                      ("max", {1: 30.0, 2: 5.0}),
                      ("avg", {1: 20.0, 2: 5.0})):
        got = {r["pid"]: r["_score"] for r in es_has_child(
            parents, children, "pid", "ppid", q, score_mode=mode,
            child_score_functions=fns).collect()}
        assert got == exp, (mode, got)

    with pytest.raises(ValueError, match="score_mode"):
        es_has_child(parents, children, "pid", "ppid", q,
                     score_mode="mul")
    with pytest.raises(ValueError, match="child_score_functions"):
        es_has_child(parents, children, "pid", "ppid", q,
                     score_mode="sum")
    with pytest.raises(ValueError, match="min_children"):
        es_has_child(parents, children, "pid", "ppid", q, min_children=0)
    with pytest.raises(ValueError, match="max_children"):
        es_has_child(parents, children, "pid", "ppid", q,
                     min_children=3, max_children=2)


def test_has_parent_semantics(spark):
    """has_parent: filter context is a semi join of children against
    the matching parent keys; score=true propagates the single
    parent's score onto each child."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_has_parent,
    )

    parents = spark.createDataFrame(
        [(1, "a", 100.0), (2, "b", 200.0)], "pid long, k string, w double")
    children = spark.createDataFrame(
        [(1, 11), (1, 12), (2, 21), (3, 31)], "ppid long, cid long")
    q = {"term": {"k": "a"}}

    got = sorted(r["cid"] for r in es_has_parent(
        children, parents, "pid", "ppid", q).collect())
    assert got == [11, 12]
    # orphan child (ppid=3) never matches; score propagates per parent
    scored = {r["cid"]: r["_score"] for r in es_has_parent(
        children, parents, "pid", "ppid", {"match_all": {}}, score=True,
        parent_score_functions=[
            {"field_value_factor": {"field": "w", "factor": 0.5}},
        ]).collect()}
    assert scored == {11: 50.0, 12: 50.0, 21: 100.0}
    with pytest.raises(ValueError, match="parent_score_functions"):
        es_has_parent(children, parents, "pid", "ppid", q, score=True)


def test_mad_agg_hand_checked(spark):
    """MAD on a known multiset: values 1,2,4,8 per bucket -> median 3,
    deviations {2,1,1,5} -> MAD 1.5 (middle-pair interpolation)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    rows = [("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0),
            ("b", 10.0), ("b", 20.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["key"]: (r["doc_count"], r["m"]) for r in es_aggregate(df, {
        "t": {"terms": {"field": "g", "size": 5},
              "aggs": {"m": {"median_absolute_deviation": {
                  "field": "v"}}}}}).collect()}
    assert got["a"] == (4, 1.5)
    assert got["b"] == (2, 5.0)
    with pytest.raises(ValueError, match="terms buckets"):
        es_aggregate(df, {"t": {
            "histogram": {"field": "v", "interval": 10.0},
            "aggs": {"m": {"median_absolute_deviation": {"field": "v"}}}}})


def test_string_stats_hand_checked(spark):
    """string_stats on known strings: 'aabb' entropy = 1.0 (two chars,
    uniform); 'aaaa' entropy = 0; lengths exact."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    rows = [("x", "aabb"), ("x", "ab"), ("y", "aaaa")]
    df = spark.createDataFrame(rows, "g string, s string")
    got = {r["key"]: r for r in es_aggregate(df, {
        "t": {"terms": {"field": "g", "size": 5},
              "aggs": {"st": {"string_stats": {"field": "s"}}}}}).collect()}
    x, y = got["x"], got["y"]
    assert (x["st_count"], x["st_min_length"], x["st_max_length"],
            x["st_avg_length"]) == (2, 2, 4, 3.0)
    assert x["st_entropy"] == 1.0    # 3 a's + 3 b's, uniform over 2
    assert (y["st_count"], y["st_entropy"]) == (1, 0.0)


def test_sampler_deterministic_and_diversified_cap(spark):
    """sampler: same sample every run (LCG order, no randomness);
    diversified: no value exceeds max_docs_per_value."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    spec = {"s": {"sampler": {"shard_size": 10, "hash_field": "id"},
                  "aggs": {"m": {"max": {"field": "v"}}}}}
    a = es_aggregate(df, spec).collect()
    b = es_aggregate(df, spec).collect()
    assert a == b and a[0]["doc_count"] == 10

    # diversified with cap 2 over 3 groups, shard_size 6 -> exactly 6
    # docs, at most 2 per group: verify by re-deriving the sample
    out = es_aggregate(df, {
        "s": {"diversified_sampler": {"shard_size": 6, "hash_field": "id",
                                      "field": "g",
                                      "max_docs_per_value": 2},
              "aggs": {"n_groups": {"cardinality": {"field": "g"}}}},
    }).collect()[0]
    assert out["doc_count"] == 6 and out["n_groups"] == 3


def test_phrase_suggester_lm_cache_reuse(spark):
    """The corpus LM caches per (corpus, field): a second suggest call
    reuses the SAME persisted vocab/bigram frames (index-time-LM
    shape), a different corpus evicts, and results are identical
    with and without a warm cache."""
    from cassandra_elasticsearch_sync_spark.sources import es_query as eq

    df = spark.createDataFrame(
        [("the quick brown fox",), ("the quick red fox",)], "text string")
    eq._PHRASE_LM_CACHE.clear()
    r1 = eq.es_phrase_suggest(df, "text", "quik", max_edits=1).collect()
    assert len(eq._PHRASE_LM_CACHE) == 1
    (key1, entry1), = eq._PHRASE_LM_CACHE.items()
    r2 = eq.es_phrase_suggest(df, "text", "quik", max_edits=1).collect()
    # same key, same cached frames - no rebuild
    assert list(eq._PHRASE_LM_CACHE) == [key1]
    assert eq._PHRASE_LM_CACHE[key1][1] is entry1[1]
    assert r1 == r2
    # a different corpus evicts (size-1 cache) and still answers right
    df2 = spark.createDataFrame([("alpha beta",)], "text string")
    out = eq.es_phrase_suggest(df2, "text", "alpa", max_edits=1).collect()
    assert list(eq._PHRASE_LM_CACHE) != [key1]
    assert len(eq._PHRASE_LM_CACHE) == 1
    assert out[0]["suggestion"] == "alpha"


def test_es_date_math_hand_checked():
    """ES date-math grammar pinned by hand: month-end clamping,
    week rounding to Monday, explicit-anchor form, missing-now
    rejection, malformed rejection."""
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        parse_es_date_math,
    )

    now = dt.datetime(2024, 1, 21, 7, 34, 56)
    assert parse_es_date_math("now-7d/d", now) == dt.datetime(2024, 1, 14)
    assert parse_es_date_math("now/d", now) == dt.datetime(2024, 1, 21)
    # 2024-01-21 is a Sunday -> /w floors to Monday the 15th
    assert parse_es_date_math("now/w", now) == dt.datetime(2024, 1, 15)
    # month-end clamp: Jan 31 + 1M = Feb 29 (2024 is a leap year)
    assert parse_es_date_math("2024-01-31||+1M", None) == \
        dt.datetime(2024, 2, 29)
    # chained ops then rounding
    assert parse_es_date_math("2024-03-15||-1M+2d/M", None) == \
        dt.datetime(2024, 2, 1)
    assert parse_es_date_math("now+12h/h", now) == \
        dt.datetime(2024, 1, 21, 19)
    with pytest.raises(ValueError, match="no anchor"):
        parse_es_date_math("now-1d", None)
    with pytest.raises(ValueError, match="unparseable"):
        parse_es_date_math("now-1q", now)


def test_date_math_resolution_is_pure_prepass(spark):
    """resolve_date_math rewrites only range bodies; non-date-math
    values and other clauses pass through untouched."""
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        resolve_date_math,
    )

    q = {"bool": {"filter": [
        {"range": {"ts": {"gte": "now-1d/d", "lt": 100}}},
        {"term": {"kind": "now and then"}},
    ]}}
    out = resolve_date_math(q, dt.datetime(2024, 1, 2, 3))
    assert out["bool"]["filter"][0]["range"]["ts"] == {
        "gte": "2024-01-01 00:00:00", "lt": 100}
    # a term VALUE containing 'now' is not date math territory
    assert out["bool"]["filter"][1] == {"term": {"kind": "now and then"}}
    assert q["bool"]["filter"][0]["range"]["ts"]["gte"] == "now-1d/d"


def test_anchored_date_math_resolves_without_now(spark):
    """An ANCHORED date-math string ('2024-01-05||+1M/M') needs no
    clock, so es_search must resolve it even when the caller omits
    ``now`` - previously it reached the compiler as a plain string,
    cast to NULL against a timestamp column, and silently matched
    nothing. now-based forms without a clock still fail loudly."""
    import datetime as dt

    from cassandra_elasticsearch_sync_spark.sources.es_query import es_search

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 20)), (2, dt.datetime(2024, 2, 10)),
         (3, dt.datetime(2024, 3, 5))],
        "id long, ts timestamp")
    q = {"range": {"ts": {"gte": "2024-01-05||+1M/M"}}}   # -> 2024-02-01
    got = sorted(r["id"] for r in es_search(df, q).collect())
    assert got == [2, 3]

    with pytest.raises(ValueError, match="no anchor"):
        es_search(df, {"range": {"ts": {"gte": "now-1d"}}})


def test_has_child_inner_hits_hand_checked(spark):
    """inner_hits on has_child: per-parent matching children arrive
    sorted by the explicit total order, capped at size, projected to
    _source; <name>_total counts ALL matching children (the cap is
    response-only, ES's inner_hits.total); validation fails loudly."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_has_child,
    )

    parents = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                    "pid long, pname string")
    children = spark.createDataFrame(
        [(1, 10, 5), (1, 11, 9), (1, 12, 7), (1, 13, 9), (1, 14, 1),
         (2, 20, 4), (3, 30, -1)],
        "ppid long, cid long, w long")

    out = es_has_child(
        parents, children, parent_key="pid", child_key="ppid",
        child_query={"range": {"w": {"gte": 0}}},
        inner_hits={"size": 3, "sort": [("w", "desc"), ("cid", "asc")],
                    "_source": ["cid", "w"]},
    ).collect()
    got = {r["pid"]: r for r in out}
    assert set(got) == {1, 2}                    # 3's child fails the query
    # parent 1 has 5 matching children: total=5, carried hits capped
    # at 3, ordered w desc with cid tiebreak (11 before 13 at w=9)
    assert got[1]["children_total"] == 5
    assert [(h["cid"], h["w"]) for h in got[1]["children"]] == [
        (11, 9), (13, 9), (12, 7)]
    assert got[2]["children_total"] == 1
    assert [(h["cid"], h["w"]) for h in got[2]["children"]] == [(20, 4)]

    with pytest.raises(ValueError, match="total-order 'sort'"):
        es_has_child(parents, children, "pid", "ppid",
                     {"match_all": {}}, inner_hits={"_source": ["cid"]})
    with pytest.raises(ValueError, match="_source"):
        es_has_child(parents, children, "pid", "ppid",
                     {"match_all": {}},
                     inner_hits={"sort": [("cid", "asc")]})
    with pytest.raises(ValueError, match="asc|desc"):
        es_has_child(parents, children, "pid", "ppid", {"match_all": {}},
                     inner_hits={"sort": [("cid", "down")],
                                 "_source": ["cid"]})


def test_nested_inner_hits_hand_checked(spark):
    """Nested inner_hits: same-element match semantics keep the doc,
    the matching ELEMENTS come back sorted + capped + projected; a
    doc with no matching element is dropped entirely."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_nested_inner_hits,
    )

    docs = spark.createDataFrame(
        [(1, [(1, 50, 100.0), (2, 10, 900.0), (3, 60, 300.0),
              (4, 70, 200.0)]),
         (2, [(1, 5, 999.0)]),
         (3, [])],
        "doc long, items array<struct<ln:int, q:int, p:double>>")

    out = es_nested_inner_hits(
        docs, path="items",
        query={"bool": {"must": [{"range": {"items.q": {"gte": 50}}}]}},
        sort=[("items.p", "desc"), ("items.ln", "asc")],
        size=2, source=["items.ln", "items.p"], name="hits").collect()
    got = {r["doc"]: r for r in out}
    # doc 2's only element fails q>=50; doc 3 is empty -> both dropped
    assert set(got) == {1}
    # matching elements ln 1 (p=100), 3 (p=300), 4 (p=200) -> sorted
    # p desc = [3, 4, 1], capped at 2 = [3, 4]; q projected away
    hits = got[1]["hits"]
    assert [(h["ln"], h["p"]) for h in hits] == [(3, 300.0), (4, 200.0)]
    assert hits[0].asDict().keys() == {"ln", "p"}

    with pytest.raises(ValueError, match="total-order"):
        es_nested_inner_hits(docs, "items", {"match_all": {}}, sort=[])


def test_match_phrase_prefix_hand_checked(spark):
    """match_phrase_prefix: consecutive terms, last term a PREFIX of
    the token at its position; full-token and mid-token negatives."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [(1, "merge join now"), (2, "merge joint x"), (3, "a merge jo"),
            (4, "join merge"), (5, "merge x join")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id for r in df.filter(
        compile_query({"match_phrase_prefix": {"text": "merge jo"}})).collect()}
    # 1: 'join' starts with 'jo' after 'merge'; 2: 'joint' too;
    # 3: literal 'jo' token; 4 reversed; 5 not adjacent
    assert got == {1, 2, 3}
    # single term = plain prefix-of-any-token
    got = {r.id for r in df.filter(
        compile_query({"match_phrase_prefix": {"text": "joi"}})).collect()}
    assert got == {1, 2, 4, 5}
    # object form {query: ...} accepted, like match/match_phrase
    got = {r.id for r in df.filter(compile_query(
        {"match_phrase_prefix": {"text": {"query": "merge jo"}}})).collect()}
    assert got == {1, 2, 3}
    # an explicit max_expansions is REJECTED loudly (ADVICE r9): the
    # index-term-order cap is unrepresentable without a term
    # dictionary; this compiler's expansion is unbounded (recall
    # superset of ES's 50-term default), documented - never a
    # parsed-and-ignored parameter
    import pytest as _pt
    with _pt.raises(ValueError, match="max_expansions"):
        compile_query({"match_phrase_prefix": {
            "text": {"query": "merge jo", "max_expansions": 50}}})
    # object form validates its keys (ADVICE r10): no 'query' is a
    # loud ValueError (not a raw KeyError), and real-ES parameters
    # this compiler cannot honor (slop/analyzer/boost) are rejected,
    # never silently ignored
    with _pt.raises(ValueError, match="requires 'query'"):
        compile_query({"match_phrase_prefix": {"text": {"slop": 2}}})
    with _pt.raises(ValueError, match="unsupported parameters"):
        compile_query({"match_phrase_prefix": {
            "text": {"query": "merge jo", "slop": 2}}})


def test_scoring_tier_hand_checked(spark):
    """script_score (incl. min_score + unparseable rejection),
    rank_feature saturation, distance_feature day decay - formulas
    pinned by hand."""
    import datetime as dt

    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_distance_feature,
        es_rank_feature,
        es_script_score,
    )

    df = spark.createDataFrame(
        [(1, 100.0, "hot", dt.date(2024, 1, 1)),
         (2, 300.0, "cold", dt.date(2024, 1, 31)),
         (3, 500.0, "hot", dt.date(2024, 3, 1))],
        "id long, v double, tag string, d date")

    out = es_script_score(
        df, {"match_all": {}},
        "doc['v'].value / 10.0 + (doc['tag'].value == 'hot' ? 5.0 : 0.0)",
        sort_tiebreak="id", size=10)
    got = {r["id"]: r["_score"] for r in out.collect()}
    assert got == {1: 15.0, 2: 30.0, 3: 55.0}
    assert [r["id"] for r in out.collect()] == [3, 2, 1]   # score desc

    out = es_script_score(df, {"match_all": {}}, "doc['v'].value",
                          sort_tiebreak="id", min_score=300.0)
    assert {r["id"] for r in out.collect()} == {2, 3}

    # libm calls are not in the subset: Math.log is not a recognized
    # fold fn, so 'Math' falls through to the bare-identifier guard
    with pytest.raises(Exception,
                       match="unparseable|unsupported|not bare"):
        es_script_score(df, {"match_all": {}},
                        "Math.log(doc['v'].value)", sort_tiebreak="id")

    out = es_rank_feature(df, "v", pivot=100.0, boost=2.0,
                          sort_tiebreak="id", size=10)
    got = {r["id"]: r["_score"] for r in out.collect()}
    # 2*x/(x+100): 100 -> 1.0, 300 -> 1.5, 500 -> 2*5/6
    assert got[1] == 1.0 and got[2] == 1.5 and got[3] == round(10 / 6, 6)

    out = es_distance_feature(df, "d", origin=dt.date(2024, 1, 11),
                              pivot_days=10.0, sort_tiebreak="id", size=10)
    got = {r["id"]: r["_score"] for r in out.collect()}
    # dist 10/20/50 days -> 10/(10+d): 0.5, 1/3, 1/6
    assert got[1] == 0.5 and got[2] == round(1 / 3, 6) \
        and got[3] == round(1 / 6, 6)


def test_children_agg_and_t_test_hand_checked(spark):
    """children agg: bucket switch to child docs with exact fold;
    t_test: Welch and homoscedastic t pinned against a hand (numpy-
    free) computation."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_children_agg,
        es_parent_id,
        es_t_test,
    )

    parents = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "pid long, grp string")
    children = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 30.0), (3, 5.0)],
        "ppid long, val double")
    out = {r["key"]: r for r in es_children_agg(
        parents, children, "pid", "ppid", "grp",
        {"total": ("sum", "val"), "hi": ("max", "val")}).collect()}
    assert out["A"]["doc_count"] == 3 and out["A"]["total"] == 60.0
    assert out["A"]["hi"] == 30.0
    assert out["B"]["doc_count"] == 1 and out["B"]["total"] == 5.0

    assert es_parent_id(children, "ppid", 1).count() == 2

    df = spark.createDataFrame(
        [("x", 1.0), ("x", 2.0), ("x", 3.0),
         ("y", 2.0), ("y", 4.0), ("y", 6.0), ("y", 8.0)],
        "side string, v double")
    res, = es_t_test(df, "v", {"term": {"side": "x"}},
                     {"term": {"side": "y"}}).collect()
    # hand: ma=2 va=1 na=3; mb=5 vb=20/3 nb=4; welch t = -3/sqrt(2)
    assert res["n_a"] == 3 and res["n_b"] == 4
    assert res["t_value"] == round(-3.0 / (1 / 3 + (20 / 3) / 4) ** 0.5, 6)
    res, = es_t_test(df, "v", {"term": {"side": "x"}},
                     {"term": {"side": "y"}}, welch=False).collect()
    sp = (2 * 1.0 + 3 * (20 / 3)) / 5
    assert res["t_value"] == round(-3.0 / (sp * (1 / 3 + 1 / 4)) ** 0.5, 6)


def test_wave_three_hand_checked(spark):
    """runtime_mappings (chained fields, type casts, rejections),
    missing agg, geo_line (cap + order), frequent_item_sets (pair
    semantics + support math)."""
    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
        es_frequent_item_sets,
        es_geo_line,
        es_runtime_mappings,
        es_search,
    )

    df = spark.createDataFrame(
        [(1, 50.0, None), (2, 150.0, "x"), (3, 250.0, "y")],
        "id long, v double, tag string")

    # runtime field + a later mapping referencing the earlier one
    out = es_runtime_mappings(df, {
        "v2": {"type": "double", "script": {"source":
               "doc['v'].value * 2.0"}},
        "band": {"type": "keyword", "script": {"source":
                 "doc['v2'].value < 300.0 ? 'lo' : 'hi'"}},
    })
    got = {r["id"]: (r["v2"], r["band"]) for r in out.collect()}
    assert got == {1: (100.0, "lo"), 2: (300.0, "hi"), 3: (500.0, "hi")}
    # the runtime field is queryable like any mapped field
    assert es_search(out, {"term": {"band": "hi"}}).count() == 2
    with pytest.raises(ValueError, match="runtime field type"):
        es_runtime_mappings(df, {"x": {"type": "ip", "script":
                                       {"source": "1"}}})

    # missing agg: docs with a NULL field + sub-metric
    row, = es_aggregate(df, {
        "no_tag": {"missing": {"field": "tag"},
                   "aggs": {"v_max": {"max": {"field": "v"}}}}}).collect()
    assert row["doc_count"] == 1 and row["v_max"] == 50.0

    # geo_line: points in sort order, capped
    from pyspark.sql import functions as F
    g = spark.createDataFrame(
        [("a", 3, 1.0, 2.0), ("a", 1, 5.5, -6.25), ("a", 2, 0.0, 9.0),
         ("b", 1, -1.0, -1.0)],
        "grp string, seq int, lat double, lon double") \
        .withColumn("location", F.struct("lat", "lon"))
    lines = {r["key"]: r for r in es_geo_line(
        g, bucket_field="grp", point_field="location",
        sort_field="seq", size=2).collect()}
    assert lines["a"]["doc_count"] == 3          # count NOT capped
    assert lines["a"]["line"] == ["5.5000,-6.2500", "0.0000,9.0000"]
    assert lines["b"]["line"] == ["-1.0000,-1.0000"]

    # frequent_item_sets: distinct per txn, a<b pairing, support math
    t = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "y"), (2, "x"), (2, "y"), (3, "x"),
         (4, "z")],
        "t long, i string")
    rows = es_frequent_item_sets(t, "t", "i", minimum_support=0.5)
    r, = rows.collect()
    assert (r["item_a"], r["item_b"]) == ("x", "y")
    assert r["support_count"] == 2 and r["support"] == 0.5   # 2 of 4 txns


def test_has_parent_inner_hits_hand_checked(spark):
    """has_parent inner_hits: each child carries its ONE matched
    parent as a 1-element hits array; sort/size rejected (keys are
    unique); score composes."""
    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_has_parent,
    )

    parents = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0)], "pid long, pname string, w double")
    children = spark.createDataFrame(
        [(1, 100), (1, 101), (2, 200)], "ppid long, cid long")

    out = es_has_parent(
        children, parents, parent_key="pid", child_key="ppid",
        parent_query={"term": {"pname": "a"}},
        inner_hits={"_source": ["pid", "pname"]}).collect()
    assert {r["cid"] for r in out} == {100, 101}
    for r in out:
        assert len(r["parent"]) == 1
        assert (r["parent"][0]["pid"], r["parent"][0]["pname"]) == (1, "a")

    # score composes with inner_hits
    out = es_has_parent(
        children, parents, "pid", "ppid", {"term": {"pname": "a"}},
        score=True,
        parent_score_functions=[{"field_value_factor": {"field": "w"}}],
        inner_hits={"_source": ["pname"]}).collect()
    assert all(r["_score"] == 10.0 for r in out) and len(out) == 2

    with pytest.raises(ValueError, match="sort/size do not apply"):
        es_has_parent(children, parents, "pid", "ppid",
                      {"match_all": {}},
                      inner_hits={"_source": ["pid"], "size": 3})
    with pytest.raises(ValueError, match="_source"):
        es_has_parent(children, parents, "pid", "ppid",
                      {"match_all": {}}, inner_hits={})


def test_wave_five_hand_checked(spark):
    """collapse inner_hits (winner + capped group hits, distinct
    inner sort), bucket_count_ks_test (hand CDFs + arity guard),
    terms missing/min_doc_count params, random_sampler/geohash/
    bucket_correlation basics."""
    import pytest

    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
        es_bucket_correlation,
        es_bucket_count_ks_test,
        es_collapse,
        es_geohash_grid,
        es_random_sampler,
        geohash_column,
    )

    df = spark.createDataFrame(
        [("g1", 1, 9.0), ("g1", 2, 5.0), ("g1", 3, 7.0), ("g1", 4, 1.0),
         ("g2", 5, 6.0)],
        "key string, id long, score double")
    out = es_collapse(
        df, None, "key", [("score", "desc"), ("id", "asc")], 10,
        inner_hits={"size": 2, "sort": [("score", "asc"), ("id", "asc")],
                    "_source": ["id"], "name": "alts"})
    got = {r["key"]: r for r in out.collect()}
    assert got["g1"]["id"] == 1                        # winner by score desc
    # inner sort ASC: the two LOWEST scores, ids 4 (1.0) then 2 (5.0)
    assert [h["id"] for h in got["g1"]["alts"]] == [4, 2]
    assert [h["id"] for h in got["g2"]["alts"]] == [5]
    with pytest.raises(ValueError, match="total-order 'sort'"):
        es_collapse(df, None, "key", [("score", "desc")], 10,
                    inner_hits={"_source": ["id"]})

    # ks_test: equal counts vs uniform fractions -> D = 0; skewed
    # fractions -> hand value; wrong arity -> empty (ES validation)
    b = spark.createDataFrame([("a", 10), ("b", 10), ("c", 20)],
                              "key string, doc_count long")
    r, = es_bucket_count_ks_test(b, [0.25, 0.25, 0.5]).collect()
    assert r["d_statistic"] == 0.0 and r["n_buckets"] == 3
    r, = es_bucket_count_ks_test(b, [0.5, 0.25, 0.25]).collect()
    # emp cdf .25/.5/1 vs exp .5/.75/1 -> D = .25
    assert r["d_statistic"] == 0.25
    assert es_bucket_count_ks_test(b, [0.5, 0.5]).count() == 0

    # bucket_correlation: perfect linear series -> r = 1
    bb = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("c", 3.0)],
                               "key string, m double")
    r, = es_bucket_correlation(bb, "m", [10.0, 20.0, 30.0]).collect()
    assert r["correlation"] == 1.0
    assert es_bucket_correlation(bb, "m", [1.0]).count() == 0

    # terms missing + min_doc_count
    t = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, "y")], "id long, f string")
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(
        t, {"b": {"terms": {"field": "f", "missing": "(none)"}}}).collect()}
    assert rows == {"x": 2, "(none)": 1, "y": 1}
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(
        t, {"b": {"terms": {"field": "f", "min_doc_count": 2}}}).collect()}
    assert rows == {"x": 2}

    # random_sampler: p=1 keeps everything, doc_count_est == doc_count
    r, = es_random_sampler(t, "id", 1.0, {"hi": ("max", "id")}).collect()
    assert r["doc_count"] == 4 and r["doc_count_est"] == 4.0
    assert r["hi"] == 4
    with pytest.raises(ValueError, match="probability"):
        es_random_sampler(t, "id", 0.0, {})

    # geohash: known value - (lat 42.605, lon -5.603) starts 'ezs'
    g = spark.createDataFrame([(42.605, -5.603)], "lat double, lon double")
    v, = g.select(geohash_column(F.col("lat"), F.col("lon"), 3)
                  .alias("h")).collect()
    assert v["h"] == "ezs"
    gg = g.withColumn("location", F.struct("lat", "lon"))
    r, = es_geohash_grid(gg, "location", 3).collect()
    assert r["key"] == "ezs" and r["doc_count"] == 1


def test_wave_six_hand_checked(spark):
    """pinned (pin order above organic, pins surface even when
    organic excludes them), wrapper (decode + recurse, malformed
    fails loudly), percentiles_bucket (hand quartiles)."""
    import base64
    import json

    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_percentiles_bucket,
        es_pinned_search,
        es_search,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 90.0), (3, 50.0), (4, 70.0), (5, 30.0)],
        "id long, v double")

    out = es_pinned_search(
        df, "id", [5, 3], {"range": {"v": {"gte": 60.0}}},
        sort=[("v", "desc"), ("id", "asc")], size=10).collect()
    # pins 5 then 3 (both FAIL the organic filter yet surface), then
    # organic 2 (90) and 4 (70) by v desc
    assert [r["id"] for r in out] == [5, 3, 2, 4]
    with pytest.raises(ValueError, match="at least one id"):
        es_pinned_search(df, "id", [], {"match_all": {}}, sort=[])

    enc = base64.b64encode(
        json.dumps({"range": {"v": {"gt": 60.0}}}).encode()).decode()
    assert {r["id"] for r in
            es_search(df, {"wrapper": {"query": enc}}).collect()} == {2, 4}
    with pytest.raises(Exception):
        es_search(df, {"wrapper": {"query": "bm90IGpzb24="}}).collect()

    b = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0), ("d", 40.0)],
        "key string, m double")
    r, = es_percentiles_bucket(b, "m", [50.0, 100.0]).collect()
    assert r["n_buckets"] == 4 and r["p50"] == 25.0 and r["p100"] == 40.0


def test_alias_and_msearch_hand_checked(spark):
    """Filtered alias: filter invisible to the caller, ANDs into the
    query; routing rejected. _msearch: k matches -> k rows, one scan
    (no Exchange in the plan), empty batch rejected."""
    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _ALIASES,
        es_msearch,
        es_put_alias,
        es_search_alias,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 99.0), (3, "b", 99.0)],
        "id long, tenant string, v double")
    es_put_alias("t_a", lambda s, d: df, {"term": {"tenant": "a"}})
    try:
        out = es_search_alias(spark, "-", "t_a",
                              {"range": {"v": {"gte": 50.0}}})
        assert {r.id for r in out.collect()} == {2}   # 3 blocked by alias
        with pytest.raises(ValueError, match="routing"):
            es_put_alias("t_r", lambda s, d: df, routing="x")
        with pytest.raises(ValueError, match="unknown alias"):
            es_search_alias(spark, "-", "ghost", {"match_all": {}})
    finally:
        _ALIASES.pop("t_a", None)

    out = es_msearch(df, {
        "big": {"range": {"v": {"gte": 50.0}}},
        "ten_a": {"term": {"tenant": "a"}},
    })
    got = sorted((r["query_id"], r["id"]) for r in out.collect())
    # doc 2 matches BOTH queries -> two rows
    assert got == [("big", 2), ("big", 3), ("ten_a", 1), ("ten_a", 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # one scan, no shuffle
    with pytest.raises(ValueError, match="at least one"):
        es_msearch(df, {})


def test_date_histogram_intervals_hand_checked(spark):
    """fixed_interval epoch flooring + calendar week/hour keys; the
    interval grammar rejects ms and junk."""
    import datetime as dt

    import pytest

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _parse_fixed_interval_s,
        es_aggregate,
    )

    assert _parse_fixed_interval_s("90s") == 90
    assert _parse_fixed_interval_s("30m") == 1800
    assert _parse_fixed_interval_s("2h") == 7200
    assert _parse_fixed_interval_s("7d") == 604800
    with pytest.raises(ValueError, match="fixed_interval"):
        _parse_fixed_interval_s("500ms")
    with pytest.raises(ValueError, match="fixed_interval"):
        _parse_fixed_interval_s("1w")

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3, 10, 14)),   # Wed
         (2, dt.datetime(2024, 1, 3, 10, 44)),
         (3, dt.datetime(2024, 1, 7, 23, 59))],  # Sun
        "id long, ts timestamp")
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(df, {
        "b": {"date_histogram": {"field": "ts",
                                 "fixed_interval": "30m"}}}).collect()}
    assert rows == {"2024-01-03 10:00:00": 1, "2024-01-03 10:30:00": 1,
                    "2024-01-07 23:30:00": 1}
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(df, {
        "b": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "week"}}}).collect()}
    # both weeks start Monday: Jan 1 and (Jan 7 is Sunday of week 1!)
    assert rows == {"2024-01-01": 3}
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(df, {
        "b": {"date_histogram": {"field": "ts",
                                 "calendar_interval": "hour"}}}).collect()}
    assert rows == {"2024-01-03 10": 2, "2024-01-07 23": 1}


def test_histogram_hard_bounds(spark):
    """hard_bounds CLIPS by BUCKET KEY, not raw value (ADVICE r9):
    ES's HistogramAggregator counts a doc iff min <= floor(value /
    interval) * interval <= max, so with interval 10 and max 100 the
    doc at 105 keys to bucket 100 and SURVIVES, while 5 (key 0 < 10)
    is dropped - the opposite of extended_bounds, which only widens."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_aggregate,
    )

    df = spark.createDataFrame([(v,) for v in (5, 15, 25, 95, 105)],
                               "v long")
    rows = {r["key"]: r["doc_count"] for r in es_aggregate(df, {
        "b": {"histogram": {"field": "v", "interval": 10,
                            "hard_bounds": {"min": 10, "max": 100}}}
    }).collect()}
    # 5 clipped (key 0); 105 kept (key 100 is inside the bounds)
    assert rows == {10.0: 1, 20.0: 1, 90.0: 1, 100.0: 1}


def test_reverse_nested_hand_checked(spark):
    """reverse_nested: nested doc_count counts ITEMS, parent
    doc_count counts DISTINCT parents, and the parent metric
    averages over distinct parents only."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_reverse_nested_terms,
    )

    parents = spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0)], "pk long, price double")
    children = spark.createDataFrame(
        [(1, "a", 5), (1, "a", 7), (1, "b", 9),   # parent 1: 2x a, 1x b
         (2, "a", 6),                              # parent 2: 1x a
         (3, "b", 1)],                             # parent 3: filtered out
        "pk long, tag string, w long")
    rows = {r["key"]: r for r in es_reverse_nested_terms(
        parents, children, parent_key="pk", child_key="pk",
        term_field="tag", child_query={"range": {"w": {"gte": 5}}},
        parent_metric_field="price").collect()}
    # tag a: 3 items across parents {1, 2}; avg price (100+200)/2
    assert rows["a"]["doc_count"] == 3
    assert rows["a"]["parent_doc_count"] == 2
    assert rows["a"]["avg_price"] == 150.0
    # tag b: parent 3's item (w=1) filtered out; only parent 1 remains
    assert rows["b"]["doc_count"] == 1
    assert rows["b"]["parent_doc_count"] == 1
    assert rows["b"]["avg_price"] == 100.0


def test_variable_width_histogram_hand_checked(spark):
    """variable_width_histogram: deterministic equal-frequency
    seeding - dense regions get narrow buckets; ties split by the
    declared tiebreak; buckets >= 1 validated."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_variable_width_histogram,
    )

    # 6 values, 2 buckets: ranks 1-3 -> bucket 0, ranks 4-6 -> bucket 1
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1.0, 1.1, 1.2, 9.0, 9.1, 50.0])],
        "id long, v double")
    rows = {r["bucket"]: r for r in es_variable_width_histogram(
        df, "v", buckets=2, tiebreak="id").collect()}
    assert rows[0]["doc_count"] == 3 and rows[1]["doc_count"] == 3
    assert rows[0]["min_value"] == 1.0 and rows[0]["max_value"] == 1.2
    assert rows[1]["min_value"] == 9.0 and rows[1]["max_value"] == 50.0
    assert rows[0]["key"] == round((1.0 + 1.1 + 1.2) / 3, 6)
    # the dense region's bucket is narrow (0.2 wide) vs the tail (41)
    assert (rows[0]["max_value"] - rows[0]["min_value"]
            < rows[1]["max_value"] - rows[1]["min_value"])
    with pytest.raises(ValueError, match="buckets"):
        es_variable_width_histogram(df, "v", buckets=0, tiebreak="id")


def test_pit_page_walk_stable_under_writes(spark, tmp_path):
    """point_in_time: the page walk serves the PINNED snapshot - an
    insert landing mid-walk (sorting into page 1's range) never
    surfaces, a mid-walk delete of an unread row still serves, and
    a FRESH search (no PIT) sees both effects. Page plan is a
    TakeOrderedAndProject over the snapshot read."""
    from cassandra_elasticsearch_sync_spark.sources.acid import (
        AcidParquetTable,
    )
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_open_pit,
        es_pit_search_page,
        es_search_page,
    )

    t = AcidParquetTable(spark, str(tmp_path / "pit_store"))
    t.init(spark.createDataFrame(
        [(k, float(100 - k)) for k in range(1, 9)], "k long, s double"))
    pit = es_open_pit(t)
    sort = [("s", "desc"), ("k", "asc")]

    page1 = es_pit_search_page(t, pit, {"match_all": {}}, sort,
                               size=4).collect()
    assert [r["k"] for r in page1] == [1, 2, 3, 4]
    # mid-walk interference: k=0 would sort FIRST; k=6 is unread
    t.merge_into(spark.createDataFrame([(0, 999.0)], "k long, s double"),
                 ["k"], assume_unique_keys=True)
    t.delete_where(F.col("k") == F.lit(6))
    cursor = [page1[-1]["s"], page1[-1]["k"]]
    page2 = es_pit_search_page(t, pit, {"match_all": {}}, sort,
                               search_after=cursor, size=4).collect()
    # the PIT page still serves the deleted k=6 and never sees k=0
    assert [r["k"] for r in page2] == [5, 6, 7, 8]
    # a fresh (PIT-less) search over the live table sees both effects
    fresh = es_search_page(t.read(), {"match_all": {}}, sort,
                           size=4).collect()
    assert [r["k"] for r in fresh] == [0, 1, 2, 3]
    # page plan: TakeOrderedAndProject over the pinned snapshot scan
    plan = es_pit_search_page(t, pit, {"match_all": {}}, sort, size=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_cumulative_cardinality_and_normalize_hand_checked(spark):
    """cumulative_cardinality: returning users never re-increment the
    running total (exact first-bucket identity). normalize: pinned
    percent_of_sum / rescale_0_1 values."""
    from pyspark.sql import Window

    # inline twin of the a3db shape on a 3-day corpus
    e = spark.createDataFrame(
        [("d1", "u1"), ("d1", "u2"), ("d2", "u1"),   # u1 returns on d2
         ("d3", "u3"), ("d3", "u1")],
        "key string, user_id string")
    daily = e.groupBy("key").agg(
        F.count("*").alias("doc_count"),
        F.count_distinct("user_id").alias("daily_users"))
    firsts = e.groupBy("user_id").agg(F.min("key").alias("key"))
    nu = firsts.groupBy("key").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    rows = {r["key"]: r for r in
            daily.join(nu, "key", "left").fillna({"new_users": 0})
            .select("key", "daily_users",
                    F.sum("new_users").over(w).alias("total_users"))
            .collect()}
    assert rows["d1"]["total_users"] == 2      # u1, u2
    assert rows["d2"]["total_users"] == 2      # u1 returning: no bump
    assert rows["d2"]["daily_users"] == 1
    assert rows["d3"]["total_users"] == 3      # u3 is new

    # normalize via the registered query at sf0.001: invariants that
    # pin the two methods regardless of corpus values
    from cassandra_elasticsearch_sync_spark.registry import all_specs
    out = all_specs()["a3dc_es_normalize"].fn(
        spark, "/root/testdata/sf0.001").collect()
    pcts = [r["revenue_pct"] for r in out]
    assert abs(sum(pcts) - 100.0) < 1e-6
    r01 = [r["revenue_0_1"] for r in out]
    assert min(r01) == 0.0 and max(r01) == 1.0
    # rescale preserves the revenue order
    by_rev = sorted(out, key=lambda r: r["revenue"])
    assert [r["key"] for r in by_rev] == \
        [r["key"] for r in sorted(out, key=lambda r: r["revenue_0_1"])]


def test_terms_enum_hand_checked(spark):
    """terms_enum: prefix + asc + cap, case_insensitive flag, and the
    search_after term cursor (strictly-after paging)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_terms_enum,
    )

    df = spark.createDataFrame(
        [("Apple",), ("apricot",), ("banana",), ("apple",), ("Avocado",),
         ("apricot",)],  # dup apricot: distinct-ness is live
        "t string")
    terms = [r["term"] for r in es_terms_enum(df, "t", string="ap").collect()]
    assert terms == ["apple", "apricot"]     # case-sensitive: Apple out
    terms = [r["term"] for r in es_terms_enum(
        df, "t", string="a", case_insensitive=True).collect()]
    assert terms == ["Apple", "Avocado", "apple", "apricot"]
    # cursor paging: strictly after 'apple'
    terms = [r["term"] for r in es_terms_enum(
        df, "t", string="ap", search_after="apple").collect()]
    assert terms == ["apricot"]
    # cap
    terms = [r["term"] for r in es_terms_enum(
        df, "t", string="a", case_insensitive=True, size=2).collect()]
    assert terms == ["Apple", "Avocado"]


def test_field_caps_hand_checked(spark):
    """field_caps: the Spark->ES type bridge on a synthetic schema
    covering every mapped type; unmappable types fail loudly."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_field_caps,
    )

    df = spark.sql(
        "SELECT 'x' AS s, CAST(1 AS BIGINT) AS l, CAST(1 AS INT) AS i, "
        "CAST(1.5 AS DOUBLE) AS d, CAST(1.23 AS DECIMAL(10,2)) AS dec, "
        "DATE'2024-01-01' AS dt, TIMESTAMP'2024-01-01 00:00:00' AS ts, "
        "TRUE AS b")
    caps = {r["field"]: r["es_type"]
            for r in es_field_caps(spark, {"idx": df}).collect()}
    assert caps == {"s": "keyword", "l": "long", "i": "integer",
                    "d": "double", "dec": "scaled_float", "dt": "date",
                    "ts": "date", "b": "boolean"}
    bad = spark.sql("SELECT array(1) AS a")
    with pytest.raises(ValueError, match="no ES mapping"):
        es_field_caps(spark, {"idx": bad})


def test_rank_eval_hand_checked(spark):
    """rank_eval: precision@k / MRR / DCG pinned by hand on a 1-query
    corpus, including the no-relevant-hit MRR=0 case."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_rank_eval,
    )
    import math

    # ranks by score desc: d1(10,rel) d2(9) d3(8,rel) d4(7) d5(6)
    df = spark.createDataFrame(
        [("q", 1, 10.0, "yes"), ("q", 2, 9.0, "no"), ("q", 3, 8.0, "yes"),
         ("q", 4, 7.0, "no"), ("q", 5, 6.0, "no"),
         ("z", 6, 5.0, "no"), ("z", 7, 4.0, "no"),
         ("w", 8, 3.0, "yes"), ("w", 9, 2.0, "no")],
        "grp string, id long, score double, rated string")
    out = {r["request"]: r for r in es_rank_eval(
        df,
        requests=[{"id": g, "query": {"term": {"grp": g}}}
                  for g in ("q", "z", "w", "nope")],
        k=3, relevant={"term": {"rated": "yes"}},
        sort=[("score", "desc"), ("id", "asc")]).collect()}
    q = out["q"]
    assert q["precision_at_3"] == round(2 / 3.0, 6)
    assert q["mrr"] == 1.0                      # first hit is relevant
    assert q["dcg_at_3"] == round(1.0 / math.log2(2) + 1.0 / math.log2(4), 6)
    z = out["z"]
    assert z["precision_at_3"] == 0.0 and z["mrr"] == 0.0 \
        and z["dcg_at_3"] == 0.0
    # ES denominator (ADVICE r10): 'w' retrieves only 2 docs for k=3,
    # 1 relevant -> precision = 1/2 (relevant_retrieved / RETRIEVED),
    # not 1/3
    w = out["w"]
    assert w["precision_at_3"] == 0.5 and w["mrr"] == 1.0
    # ES zero-hit request (ADVICE r10): 'nope' matches nothing but
    # still emits a row with zero metrics, never disappears
    n = out["nope"]
    assert n["precision_at_3"] == 0.0 and n["mrr"] == 0.0 \
        and n["dcg_at_3"] == 0.0
    assert set(out) == {"q", "z", "w", "nope"}
    # the per-request top-k lowers to a WindowGroupLimit partial
    plan = es_rank_eval(
        df, requests=[{"id": "q", "query": {"term": {"grp": "q"}}}],
        k=3, relevant={"term": {"rated": "yes"}},
        sort=[("score", "desc"), ("id", "asc")],
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # ADVICE r11: non-string request ids (int numbering) coerce to
    # string on BOTH the tag column and the padding frame - no
    # createDataFrame type error, no join-type mismatch, zero-hit
    # padding still works
    out_int = {r["request"]: r for r in es_rank_eval(
        df,
        requests=[{"id": 1, "query": {"term": {"grp": "q"}}},
                  {"id": 2, "query": {"term": {"grp": "none"}}}],
        k=3, relevant={"term": {"rated": "yes"}},
        sort=[("score", "desc"), ("id", "asc")]).collect()}
    assert set(out_int) == {"1", "2"}
    assert out_int["1"]["mrr"] == 1.0
    assert out_int["2"]["precision_at_3"] == 0.0


def test_span_containment_pair_hand_checked(spark):
    """span_containing / span_within: the match unit differs (big vs
    little span), equal spans count as contained, and a little span
    OUTSIDE every big span never matches."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [
        (1, "merge sort join x"),       # sort INSIDE merge..join
        (2, "sort merge fast join"),    # sort OUTSIDE (before) the span
        (3, "merge fast join sort"),    # sort after the span
        (4, "merge join sort"),         # adjacent span, sort outside
        (5, "sort x y z"),              # no big span at all
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    big = {"span_near": {"clauses": [
        {"span_term": {"text": "merge"}},
        {"span_term": {"text": "join"}},
    ], "slop": 4, "in_order": True}}
    little = {"span_term": {"text": "sort"}}

    got = {r.id for r in df.filter(compile_query(
        {"span_containing": {"big": big, "little": little}})).collect()}
    assert got == {1}
    got = {r.id for r in df.filter(compile_query(
        {"span_within": {"little": little, "big": big}})).collect()}
    assert got == {1}
    # a zero-length little span EQUAL to a big span boundary is
    # contained (s <= s, e <= e inclusive): little 'merge' within
    # merge..join
    got = {r.id for r in df.filter(compile_query(
        {"span_within": {"little": {"span_term": {"text": "merge"}},
                         "big": big}})).collect()}
    assert got == {1, 2, 3, 4}
    # cross-field containment is rejected (ES's one-field rule)
    import pytest as _pt
    with _pt.raises(ValueError, match="share one field"):
        compile_query({"span_within": {
            "little": {"span_term": {"other": "x"}}, "big": big}})


def test_combined_fields_hand_checked(spark):
    """combined_fields: terms match across the COMBINED fields -
    operator=and passes when different terms land in different
    fields (the case multi_match best_fields cannot express);
    operator=or is any-term; bad operators rejected."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [(1, "merge join", "alpha"), (2, "sort scan", "merge"),
            (3, "merge x", "beta"), (4, "y", "alpha")]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    q = {"combined_fields": {"query": "merge alpha",
                             "fields": ["a", "b"], "operator": "and"}}
    got = {r.id for r in df.filter(compile_query(q)).collect()}
    # 1: merge in a, alpha in b (cross-field AND) - the key case
    assert got == {1}
    q["combined_fields"]["operator"] = "or"
    got = {r.id for r in df.filter(compile_query(q)).collect()}
    assert got == {1, 2, 3, 4}
    import pytest as _pt
    with _pt.raises(ValueError, match="operator"):
        compile_query({"combined_fields": {
            "query": "x", "fields": ["a"], "operator": "not"}})


def test_search_template_hand_checked(spark):
    """_render/template: typed whole-string substitution, embedded
    stringification, missing params and mustache sections rejected."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_render_search_template,
    )

    out = es_render_search_template(
        {"bool": {"filter": [
            {"term": {"s": "{{status}}"}},
            {"range": {"v": {"gte": "{{floor}}"}}},
            {"terms": {"p": "{{vals}}"}},
            {"prefix": {"name": "pre-{{tag}}"}},
        ]}},
        {"status": "F", "floor": 300, "vals": ["a", "b"], "tag": "x"})
    f = out["bool"]["filter"]
    assert f[0] == {"term": {"s": "F"}}
    assert f[1] == {"range": {"v": {"gte": 300}}}      # typed: number
    assert f[2] == {"terms": {"p": ["a", "b"]}}        # typed: array
    assert f[3] == {"prefix": {"name": "pre-x"}}       # embedded: str
    with pytest.raises(ValueError, match="missing"):
        es_render_search_template({"term": {"s": "{{ghost}}"}}, {})
    with pytest.raises(ValueError, match="sections"):
        es_render_search_template(
            {"term": {"s": "{{#cond}}x{{/cond}}"}}, {"cond": True})
    # injection holes closed (ADVICE r10): a parameter VALUE is data -
    # one containing '{{other}}' stays literal (never re-expanded, no
    # 'missing parameter' error), and embedded quotes/backslashes
    # survive because nothing is re-serialized and re-scanned
    out = es_render_search_template(
        {"term": {"s": "{{v}}"}}, {"v": "keep {{other}} literal"})
    assert out == {"term": {"s": "keep {{other}} literal"}}
    out = es_render_search_template(
        {"term": {"s": "{{v}}"}}, {"v": 'quote " and \\ slash'})
    assert out == {"term": {"s": 'quote " and \\ slash'}}
    out = es_render_search_template(
        {"prefix": {"name": "x-{{v}}"}}, {"v": '"{{w}}"'})
    assert out == {"prefix": {"name": 'x-"{{w}}"'}}
    # placeholders in dict KEYS render too (stringified)
    out = es_render_search_template(
        {"term": {"{{field}}": "v"}}, {"field": "s"})
    assert out == {"term": {"s": "v"}}


def test_mget_hand_checked(spark):
    """_mget: every requested id answered (found flag, null source on
    misses), duplicate request ids rejected, corpus never shuffled."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_mget,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    rows = {r["k"]: r for r in es_mget(df, [2, 9], "k", ["v"]).collect()}
    assert rows[2]["found"] is True and rows[2]["v"] == "b"
    assert rows[9]["found"] is False and rows[9]["v"] is None
    assert set(rows) == {2, 9}
    # request-SLOT order preserved (ADVICE r10): ES answers in request
    # order, so a caller zipping rows against their id list must not
    # mis-pair - collect order IS the request order
    got = [r["k"] for r in es_mget(df, [9, 2, 1], "k", ["v"]).collect()]
    assert got == [9, 2, 1]
    with pytest.raises(ValueError, match="unique"):
        es_mget(df, [1, 1], "k", ["v"])
    plan = es_mget(df, [2, 9], "k", ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_change_point_hand_checked(spark):
    """change_point: pinned CUSUM argmax on a hand-planted step, the
    earliest-key tiebreak, and the 22-bucket 'indeterminable' floor."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_change_point,
    )

    # series 'a': 22 buckets, flat 10 then flat 20 from t=12 - the
    # step lands at the last low bucket (t=11, key 11) in CUSUM form;
    # series 'b': 5 buckets - under the ES minimum
    rows = [("a", k, 10 if k <= 11 else 20) for k in range(1, 23)]
    rows += [("b", k, k) for k in range(1, 6)]
    df = spark.createDataFrame(rows, "s string, k int, v long")
    out = {r["series"]: r for r in es_change_point(
        df, series_col="s", key_col="k", value_col="v").collect()}
    a = out["a"]
    assert a["type"] == "step_change" and a["n_buckets"] == 22
    # dev_t = |n*S_t - t*S_n|; S_n = 11*10 + 11*20 = 330, n = 22.
    # For t <= 11: S_t = 10t -> dev = |220t - 330t| = 110t, max at
    # t = 11 (key 11, dev 1210); for t > 11 dev decreases. Pinned:
    assert a["change_point"] == 11 and a["score"] == 1210
    b = out["b"]
    assert b["type"] == "indeterminable"
    assert b["change_point"] is None and b["score"] is None
    assert b["n_buckets"] == 5


def test_time_series_agg_hand_checked(spark):
    """time_series: one bucket per dimension tuple, tsid-ASC order,
    size cap, and the no-dimension rejection."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_time_series,
    )

    df = spark.createDataFrame(
        [("web", "h1", 1.0), ("web", "h1", 3.0), ("web", "h2", 5.0),
         ("db", "h1", 7.0)],
        "svc string, host string, v double")
    out = es_time_series(df, dimensions=["svc", "host"],
                         metrics={"mx": ("max", "v")}, size=10).collect()
    assert [(r["svc"], r["host"], r["doc_count"], r["mx"])
            for r in out] == [
        ("db", "h1", 1, 7.0), ("web", "h1", 2, 3.0), ("web", "h2", 1, 5.0)]
    # size caps in tsid order
    capped = es_time_series(df, dimensions=["svc", "host"],
                            size=1).collect()
    assert [(r["svc"], r["host"]) for r in capped] == [("db", "h1")]
    with _pt.raises(ValueError, match="dimension"):
        es_time_series(df, dimensions=[], size=5)


def test_span_field_masking_hand_checked(spark):
    """span_field_masking: the inner clause's positions come from its
    OWN field while the mask satisfies the compound's shared-field
    rule - and an unmasked cross-field compound still rejects."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [
        (1, "merge big rows", "m b r"),      # b-initial right after merge
        (2, "merge tiny rows", "m t r"),     # t-initial after merge
        (3, "big merge rows", "b m r"),      # b BEFORE merge - order
        (4, "merge", "m"),                   # nothing after
    ]
    df = spark.createDataFrame(rows, "id long, text string, ini string")
    q = {"span_near": {"clauses": [
        {"span_term": {"text": "merge"}},
        {"span_field_masking": {
            "query": {"span_term": {"ini": "b"}}, "field": "text"}},
    ], "slop": 0, "in_order": True}}
    got = sorted(r["id"] for r in df.filter(compile_query(q)).collect())
    assert got == [1]
    # unordered form accepts doc 3 too (b adjacent, before)
    q2 = {"span_near": {"clauses": q["span_near"]["clauses"],
                        "slop": 0, "in_order": False}}
    assert sorted(r["id"] for r in
                  df.filter(compile_query(q2)).collect()) == [1, 3]
    # WITHOUT the mask a cross-field compound is rejected - the rule
    # the mask exists to satisfy
    with _pt.raises(ValueError, match="share one field"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "merge"}},
            {"span_term": {"ini": "b"}},
        ], "slop": 0, "in_order": True}})
    # top-level masking clause works as a bare predicate
    q3 = {"span_field_masking": {
        "query": {"span_term": {"ini": "t"}}, "field": "text"}}
    assert sorted(r["id"] for r in
                  df.filter(compile_query(q3)).collect()) == [2]


def test_terms_set_per_doc_threshold(spark):
    """terms_set minimum_should_match_field: thresholds 0 / 1 / n per
    document, distinct-term counting, and the loud rejections."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b", "x"], 0),    # 2 hits >= 0 -> match
         (2, ["x", "y"], 0),         # 0 hits >= 0 -> match (trivial)
         (3, ["a", "x"], 1),         # 1 hit  >= 1 -> match
         (4, ["x", "y"], 1),         # 0 hits >= 1 -> miss
         (5, ["a", "b", "c"], 3),    # 3 hits >= 3 -> match
         (6, ["a", "a", "b"], 3),    # DISTINCT: 2 hits >= 3 -> miss
         ], "id long, toks array<string>, req int")
    q = {"terms_set": {"toks": {
        "terms": ["a", "b", "c"],
        "minimum_should_match_field": "req"}}}
    got = sorted(r["id"] for r in df.filter(compile_query(q)).collect())
    assert got == [1, 2, 3, 5]
    # constant form still works and defaults to ALL terms
    q2 = {"terms_set": {"toks": {"terms": ["a", "b"],
                                 "minimum_should_match": 2}}}
    assert sorted(r["id"] for r in
                  df.filter(compile_query(q2)).collect()) == [1, 5, 6]
    with _pt.raises(ValueError, match="not both"):
        compile_query({"terms_set": {"toks": {
            "terms": ["a"], "minimum_should_match": 1,
            "minimum_should_match_field": "req"}}})
    with _pt.raises(ValueError, match="script"):
        compile_query({"terms_set": {"toks": {
            "terms": ["a"],
            "minimum_should_match_script": {"source": "params.n"}}}})


def test_parent_agg_hand_checked(spark):
    """parent agg: doc_count is the DISTINCT-parent count (a parent
    with many children in the bucket counts once - what separates it
    from the child doc_count a plain join-and-group would report),
    and sub-aggs fold PARENT fields once per parent."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_parent_agg,
    )

    parents = spark.createDataFrame(
        [(10, 100.0), (20, 200.0), (30, 300.0)],
        "pk long, val double")
    children = spark.createDataFrame(
        [(1, 10, "r"), (2, 10, "r"), (3, 10, "r"),   # 3 kids, 1 parent
         (4, 20, "r"),                                # 1 kid, 1 parent
         (5, 20, "g"), (6, 30, "g")],                 # bucket g: 2 parents
        "ck long, fk long, flag string")
    out = {r["key"]: r for r in es_parent_agg(
        parents, children, parent_key="pk", child_key="fk",
        bucket_field="flag",
        parent_aggs={"total": ("sum", "val"),
                     "n_vals": ("count", "val")}).collect()}
    # bucket 'r' has FOUR child docs but TWO distinct parents
    assert out["r"]["doc_count"] == 2
    assert out["r"]["total"] == 300.0      # 100 + 200, parent 10 once
    assert out["g"]["doc_count"] == 2
    assert out["g"]["total"] == 500.0
    # children agg on the same data reports CHILD doc_count - the pair
    # differs exactly where a parent has multiple children
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_children_agg,
    )
    ch = {r["key"]: r for r in es_children_agg(
        parents.withColumnRenamed("val", "pval")
               .withColumn("bucket", F.lit("all")),
        children, parent_key="pk", child_key="fk",
        bucket_field="bucket", child_aggs={}).collect()}
    assert ch["all"]["doc_count"] == 6     # child count, not parent


def test_explain_hand_checked(spark):
    """_explain: per-clause verdicts, constant_score totals without
    functions, function_score replace totals with them, a
    NON-matching doc explains false with ZERO total, and a missing
    doc raises (ES's 404)."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_explain,
    )

    df = spark.createDataFrame(
        [(1, "F", 100.0), (2, "O", 200.0)],
        "id long, status string, price double")
    q = {"bool": {"must": [{"term": {"status": "F"}}],
                  "should": [{"range": {"price": {"gte": 50.0}}}]}}

    # matching doc, no functions: constant_score - each matched
    # must/should clause contributes 1.0
    rows = es_explain(df, id_field="id", id_value=1, query=q).collect()
    by = {r["clause"]: r for r in rows}
    assert by["must[0] term(status)"]["matched"] is True
    assert by["should[0] range(price)"]["matched"] is True
    assert by["total"]["matched"] is True and by["total"]["value"] == 2.0
    assert [r["ord"] for r in rows] == [0, 1, 2]

    # non-matching doc: clause rows show WHICH leg failed, total is
    # false with zero score
    rows2 = {r["clause"]: r for r in es_explain(
        df, id_field="id", id_value=2, query=q).collect()}
    assert rows2["must[0] term(status)"]["matched"] is False
    assert rows2["should[0] range(price)"]["matched"] is True
    assert rows2["total"]["matched"] is False
    assert rows2["total"]["value"] == 0.0

    # function_score replace model: clause rows score 0, total is the
    # function algebra - and still 0.0 on a non-matching doc
    fns = [{"field_value_factor": {"field": "price", "factor": 2.0}}]
    r1 = {r["clause"]: r for r in es_explain(
        df, id_field="id", id_value=1, query=q, functions=fns).collect()}
    assert r1["must[0] term(status)"]["value"] == 0.0
    assert r1["function[0] field_value_factor(price x 2.0)"]["value"] \
        == 200.0
    assert r1["total"]["value"] == 200.0
    r2 = {r["clause"]: r for r in es_explain(
        df, id_field="id", id_value=2, query=q, functions=fns).collect()}
    assert r2["total"]["matched"] is False and r2["total"]["value"] == 0.0
    # the function row still reports its raw contribution (ES shows
    # the detail; the gate is the total row)
    assert r2["function[0] field_value_factor(price x 2.0)"]["value"] \
        == 400.0

    # missing doc: loud, ES's 404
    with _pt.raises(ValueError, match="not found"):
        es_explain(df, id_field="id", id_value=99, query=q)

    # non-bool query explains as a single clause
    r3 = {r["clause"]: r for r in es_explain(
        df, id_field="id", id_value=1,
        query={"term": {"status": "F"}}).collect()}
    assert r3["query[0] term(status)"]["matched"] is True
    assert r3["total"]["value"] == 1.0


def test_span_multi_hand_checked(spark):
    """span_multi: each multi-term leaf kind produces the positions
    ES's SpanMultiTermQueryWrapper would, composes inside span_near,
    and DISAGREES with a plain span_term where expansion matters."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    rows = [
        (1, "hash sort x"),        # 'hash' then s-word adjacent
        (2, "hash x scan"),        # one gap
        (3, "hash x y z spark"),   # 3 gaps - outside slop 2
        (4, "sort hash x"),        # s-word BEFORE hash (order matters)
        (5, "hash join x"),        # no s-word after
        (6, "hash joins x"),       # 'joins' - prefix 'join' hits, term misses
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    def near(inner):
        return {"span_near": {"clauses": [
            {"span_term": {"text": "hash"}}, inner,
        ], "slop": 2, "in_order": True}}

    ids = lambda q: {r.id for r in df.filter(compile_query(q)).collect()}
    # prefix: the registered-query shape
    assert ids(near({"span_multi": {"match": {"prefix": {"text": "s"}}}})) \
        == {1, 2}
    # span_multi(prefix 'join') vs span_term 'join' DISAGREE on doc 6:
    # the wrapper expands to 'joins', the exact term does not
    assert ids(near({"span_multi": {"match": {"prefix": {"text": "join"}}}})) \
        == {5, 6}
    assert ids(near({"span_term": {"text": "join"}})) == {5}
    # wildcard leaf: 's*n' hits scan only (not sort/spark)
    assert ids(near({"span_multi": {"match": {"wildcard": {"text": "s*n"}}}})) \
        == {2}
    # regexp leaf is ANCHORED (whole token): 'jo.' misses 'joins'
    assert ids(near({"span_multi": {"match":
                                    {"regexp": {"text": "joins?"}}}})) \
        == {5, 6}
    assert ids(near({"span_multi": {"match": {"regexp": {"text": "jo."}}}})) \
        == set()
    # fuzzy leaf: 'scen' within 1 edit of 'scan' (AUTO ladder: len 4
    # -> 1 edit)
    assert ids(near({"span_multi": {"match": {"fuzzy": {"text": "scen"}}}})) \
        == {2}
    # lexicographic range leaf: tokens in [sc, sp) - scan/sort? no:
    # 'sort' >= 'sp' is false ('so' < 'sp'), so scan AND sort hit
    assert ids(near({"span_multi": {"match": {"range": {
        "text": {"gte": "sc", "lt": "sp"}}}}})) == {1, 2}
    # rewrite parameter rejected loudly (unrepresentable cap)
    import pytest as _pt
    with _pt.raises(ValueError, match="rewrite"):
        compile_query(near({"span_multi": {"match": {"prefix": {
            "text": {"value": "s", "rewrite": "top_terms_10"}}}}}))
    # non-multi-term leaves rejected
    with _pt.raises(ValueError, match="multi-term"):
        compile_query(near({"span_multi": {"match": {"term": {
            "text": "hash"}}}}))
    # ADVICE r11: backslash in a wildcard value is ES ESCAPE syntax
    # ('\*' = literal star) - unimplemented, rejected loudly in both
    # the span_multi leaf and the top-level wildcard leaf (the silent
    # mistranslation would have been literal-backslash + live %)
    with _pt.raises(ValueError, match="backslash"):
        compile_query(near({"span_multi": {"match": {"wildcard": {
            "text": "s\\*n"}}}}))
    with _pt.raises(ValueError, match="backslash"):
        compile_query({"wildcard": {"text": "s\\*n"}})
    # bare span_multi works as a document predicate too
    assert ids({"span_multi": {"match": {"prefix": {"text": "spar"}}}}) \
        == {3}


def test_ip_range_hand_checked(spark):
    """ip_range: half-open bounds (from INCLUSIVE, to EXCLUSIVE),
    CIDR mask expansion, overlapping buckets double-count, zero-count
    buckets still answer, request order preserved."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_ip_range_agg,
    )

    df = spark.createDataFrame(
        [("10.0.0.0",), ("10.0.0.15",), ("10.0.0.16",), ("10.0.1.0",),
         ("192.168.1.1",)], "ip string")
    out = es_ip_range_agg(df, "ip", [
        {"key": "a", "from": "10.0.0.0", "to": "10.0.0.16"},
        {"mask": "10.0.0.0/24"},
        {"key": "b", "from": "10.0.0.16"},
        {"key": "c", "to": "10.0.0.1"},
        {"key": "empty", "from": "172.16.0.0", "to": "172.16.0.1"},
    ]).collect()
    rows = {r["key"]: r for r in out}
    # from inclusive (10.0.0.0 in), to EXCLUSIVE (10.0.0.16 out)
    assert rows["a"]["doc_count"] == 2
    assert rows["a"]["from_ip"] == "10.0.0.0" \
        and rows["a"]["to_ip"] == "10.0.0.16"
    # /24 mask = [10.0.0.0, 10.0.1.0): three docs, and the mask's
    # resolved bounds are reported
    m = rows["10.0.0.0/24"]
    assert m["doc_count"] == 3
    assert m["from_ip"] == "10.0.0.0" and m["to_ip"] == "10.0.1.0"
    # unbounded-from / unbounded-to
    assert rows["b"]["doc_count"] == 3 and rows["b"]["to_ip"] is None
    assert rows["c"]["doc_count"] == 1 and rows["c"]["from_ip"] is None
    # zero-count bucket still answered
    assert rows["empty"]["doc_count"] == 0
    # request order preserved
    assert [r["key"] for r in out] == ["a", "10.0.0.0/24", "b", "c",
                                       "empty"]
    # a bucket with neither bounds nor mask is rejected
    import pytest as _pt
    with _pt.raises(ValueError, match="from/to or mask"):
        es_ip_range_agg(df, "ip", [{"key": "x"}])


def test_geohex_grid_hand_checked(spark):
    """geohex: cube-rounded axial assignment == brute-force
    nearest-hex-center (the defining property of the lattice),
    aperture-7 area refinement, precision validation."""
    import math

    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _geohex_qr, _geohex_size, es_geohex_grid,
    )
    from pyspark.sql import functions as F

    size = _geohex_size(2)

    def center(q, r):
        # pointy-top axial -> lon/lat of the cell center (inverse of
        # the fractional transform)
        lon = size * math.sqrt(3.0) * (q + r / 2.0)
        lat = size * 1.5 * r
        return lat, lon

    # 60 deterministic sample points; for each, the assigned cell's
    # center must be the nearest center among a 5x5 axial
    # neighborhood (brute force)
    pts = [(((k * 37) % 120) - 60 + 0.123, ((k * 59) % 360) - 180 + 0.456)
           for k in range(60)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    q, r = _geohex_qr(F.col("lat"), F.col("lon"), size)
    got = df.select("lat", "lon", q.alias("q"), r.alias("r")).collect()
    for row in got:
        best = None
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                cq, cr = row["q"] + dq, row["r"] + dr
                clat, clon = center(cq, cr)
                d = (row["lat"] - clat) ** 2 + (row["lon"] - clon) ** 2
                if best is None or d < best[0] - 1e-12:
                    best = (d, cq, cr)
        assert (best[1], best[2]) == (row["q"], row["r"]), row
    # aperture 7: one precision step shrinks cell area (~size^2) 7x
    assert _geohex_size(3) ** 2 * 7 == _pt.approx(_geohex_size(2) ** 2)
    with _pt.raises(ValueError, match="precision"):
        _geohex_size(16)
    # the agg output: cells keyed 'p/q/r', count-desc with cell
    # tiebreak, limited
    g = df.select(F.struct(F.col("lat"), F.col("lon")).alias("location"))
    out = es_geohex_grid(g, "location", 2, size=5).collect()
    assert len(out) == 5
    assert all(row["cell"].startswith("2/") for row in out)
    counts = [row["doc_count"] for row in out]
    assert counts == sorted(counts, reverse=True)


def test_ip_prefix_hand_checked(spark):
    """ip_prefix: network flooring at the prefix boundary, netmask
    derivation, min_doc_count pruning, key ordering, /0 and /32
    edges, bad length rejected."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_ip_prefix_agg,
    )

    df = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.63.255",), ("10.0.64.0",), ("10.0.128.9",),
         ("192.168.1.1",)], "ip string")
    out = es_ip_prefix_agg(df, "ip", 18).collect()
    rows = {r["key"]: r["doc_count"] for r in out}
    # /18 blocks are 64 of the third octet: .0-.63 | .64-.127 | .128+
    assert rows == {"10.0.0.0": 2, "10.0.64.0": 1, "10.0.128.0": 1,
                    "192.168.0.0": 1}
    assert all(r["prefix_length"] == 18 and r["netmask"] == "255.255.192.0"
               for r in out)
    # ordered by network address
    assert [r["key"] for r in out] == [
        "10.0.0.0", "10.0.64.0", "10.0.128.0", "192.168.0.0"]
    # min_doc_count prunes sparse networks
    kept = es_ip_prefix_agg(df, "ip", 18, min_doc_count=2).collect()
    assert [(r["key"], r["doc_count"]) for r in kept] == [("10.0.0.0", 2)]
    # /32 = identity buckets; /0 = one bucket holding everything
    assert len(es_ip_prefix_agg(df, "ip", 32).collect()) == 5
    all0 = es_ip_prefix_agg(df, "ip", 0).collect()
    assert len(all0) == 1 and all0[0]["key"] == "0.0.0.0" \
        and all0[0]["doc_count"] == 5 and all0[0]["netmask"] == "0.0.0.0"
    with _pt.raises(ValueError, match="prefix_length"):
        es_ip_prefix_agg(df, "ip", 33)


def test_termvectors_hand_checked(spark):
    """_termvectors: term_freq, numeric position order, corpus
    doc_freq/ttf, and the term_statistics=False shape."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_termvectors,
    )

    df = spark.createDataFrame(
        [(1, "a b a c a"), (2, "a x"), (3, "y b")],
        "id long, body string")
    out = {r["term"]: r for r in es_termvectors(
        df, 1, id_col="id", text_col="body",
        term_statistics=True).collect()}
    assert set(out) == {"a", "b", "c"}
    # positions are NUMERIC order (0|2|4, never 0|10|2-style lexical)
    assert out["a"]["term_freq"] == 3 and out["a"]["positions"] == "0|2|4"
    assert out["b"]["positions"] == "1" and out["c"]["positions"] == "3"
    # corpus stats: 'a' in docs 1+2 (doc_freq 2, ttf 4); 'c' only here
    assert out["a"]["doc_freq"] == 2 and out["a"]["ttf"] == 4
    assert out["b"]["doc_freq"] == 2 and out["b"]["ttf"] == 2
    assert out["c"]["doc_freq"] == 1 and out["c"]["ttf"] == 1
    # without term_statistics the corpus is never touched
    slim = es_termvectors(df, 1, id_col="id", text_col="body")
    assert slim.columns == ["term", "term_freq", "positions"]
    # position 10+ sorts numerically after 2 (the lexical trap)
    wide = spark.createDataFrame(
        [(9, " ".join(["z"] * 12))], "id long, body string")
    w = es_termvectors(wide, 9, id_col="id", text_col="body").collect()[0]
    assert w["positions"] == "|".join(str(i) for i in range(12))


def test_sparse_vector_hand_checked(spark):
    """sparse_vector: weighted sparse dot product over token
    frequencies, zero-score filtered, deterministic tiebreak."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_sparse_vector_query,
    )

    df = spark.createDataFrame(
        [(1, "merge join"), (2, "merge merge"), (3, "sort"),
         (4, "nothing here")],
        "id long, body string")
    out = es_sparse_vector_query(
        df, text_col="body", query_vector={"merge": 2.0, "join": 1.0},
        id_cols=["id"], size=10).collect()
    assert [(r["id"], r["score"]) for r in out] == [
        (2, 4.0),   # 2 x merge
        (1, 3.0),   # merge + join
    ]                # 3 and 4 score 0 -> filtered
    with _pt.raises(ValueError, match="query_vector"):
        es_sparse_vector_query(df, text_col="body", query_vector={},
                               id_cols=["id"], size=5)


def test_ip_conversion_roundtrip(spark):
    """_ip_to_long / _long_to_ip agree with stdlib ipaddress on 300
    LCG-scattered addresses plus the boundary values - one Spark job,
    batch-checked."""
    import ipaddress

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _ip_to_long, _long_to_ip,
    )
    from pyspark.sql import functions as F

    vals = [0, 1, 255, 256, 0xFFFFFFFF, 0x7FFFFFFF, 0x80000000]
    x = 12345
    for _ in range(300):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2 ** 64)
        vals.append(x % (2 ** 32))
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    out = df.select(
        "n", _long_to_ip(F.col("n")).alias("ip"),
        _ip_to_long(_long_to_ip(F.col("n"))).alias("back")).collect()
    for r in out:
        assert r["back"] == r["n"]
        assert r["ip"] == str(ipaddress.ip_address(r["n"]))


def test_analyze_hand_checked(spark):
    """_analyze: token/position/offset triples pinned by hand -
    offsets index the ORIGINAL text (lowercasing preserves length)."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_analyze,
    )

    df = spark.createDataFrame([(1, "Alpha bb C")], "id long, body string")
    out = es_analyze(df, 1, id_col="id", text_col="body").collect()
    assert [(r["token"], r["position"], r["start_offset"], r["end_offset"])
            for r in out] == [
        ("alpha", 0, 0, 5),   # 'Alpha' occupies [0, 5)
        ("bb", 1, 6, 8),
        ("c", 2, 9, 10),
    ]
    # offsets slice the original text back out (modulo case)
    orig = "Alpha bb C"
    for r in out:
        assert orig[r["start_offset"]:r["end_offset"]].lower() == r["token"]


def test_mtermvectors_hand_checked(spark):
    """_mtermvectors: per-(doc, term) stats, shared corpus doc_freq,
    duplicate ids rejected."""
    import pytest as _pt

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_mtermvectors,
    )

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c c")],
        "id long, body string")
    out = {(r["doc"], r["term"]): r for r in es_mtermvectors(
        df, [1, 2], id_col="id", text_col="body",
        term_statistics=True).collect()}
    assert set(out) == {(1, "a"), (1, "b"), (2, "a"), (2, "c")}
    assert out[(1, "a")]["term_freq"] == 2 \
        and out[(1, "a")]["positions"] == "0|2"
    # corpus stats shared across requested docs: 'a' in docs 1+2
    assert out[(1, "a")]["doc_freq"] == 2 and out[(2, "a")]["doc_freq"] == 2
    # 'c' stats include UNREQUESTED doc 3 (corpus-wide, as ES reports)
    assert out[(2, "c")]["doc_freq"] == 2 and out[(2, "c")]["ttf"] == 3
    with _pt.raises(ValueError, match="unique"):
        es_mtermvectors(df, [1, 1], id_col="id", text_col="body")


def test_categorize_text_hand_checked(spark):
    """categorize_text: digit-bearing tokens drop from the category
    key, counts aggregate per pattern, deterministic ordering."""
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_categorize_text,
    )

    df = spark.createDataFrame(
        [("error k=69 retry scheduled",),
         ("error k=7 retry scheduled",),
         ("view k=3 completed ok",),
         ("node a3f0 went down",),   # hex-ish token drops too
         ("node b212 went down",)],
        "line string")
    out = [(r["category"], r["doc_count"]) for r in
           es_categorize_text(df, "line", size=10).collect()]
    assert out == [
        ("error retry scheduled", 2),
        ("node went down", 2),
        ("view completed ok", 1),
    ]


def test_extended_stats_bucket_matches_numpy(spark):
    """a3dx: population variance / std / sum-of-squares over the
    monthly bucket table agree with numpy recomputed from the same
    buckets (independent formula check, not just the oracle twin)."""
    import numpy as np

    from cassandra_elasticsearch_sync_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    specs = all_specs()
    row = specs["a3dx_es_extended_stats_bucket"].fn(spark, sf).collect()[0]
    # recompute the bucket revenues exactly as the query does
    from cassandra_elasticsearch_sync_spark.catalog import load_table
    from cassandra_elasticsearch_sync_spark.parity import dsum
    from pyspark.sql import functions as F
    o = load_table(spark, sf, "orders")
    revs = np.array([r["rev"] for r in (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date")
                  .alias("key"))
        .agg(dsum("o_totalprice", 2).alias("rev"))).collect()])
    assert row["n_buckets"] == len(revs)
    assert row["min_bucket"] == revs.min() and row["max_bucket"] == revs.max()
    assert abs(row["sum_bucket"] - revs.sum()) < 1e-2
    assert float(row["sum_of_squares"]) == pytest.approx(
        float((revs.astype(float) ** 2).sum()), rel=1e-9)
    assert float(row["variance_population"]) == pytest.approx(
        float(np.var(revs)), rel=1e-6)
    assert float(row["std_deviation"]) == pytest.approx(
        float(np.std(revs)), rel=1e-6)


# -- _validate/query (round 12) ---------------------------------------------

def test_render_query_lucene_forms():
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        render_query,
    )
    assert render_query({"match_all": {}}) == "*:*"
    assert render_query({"term": {"f": "x"}}) == "f:x"
    assert render_query({"term": {"f": {"value": "x"}}}) == "f:x"
    assert render_query({"terms": {"f": ["a", "b"]}}) == "f:(a OR b)"
    assert render_query(
        {"range": {"f": {"gte": 1, "lt": 5}}}) == "f:[1 TO 5}"
    assert render_query({"range": {"f": {"gt": 1}}}) == "f:{1 TO *]"
    assert render_query({"exists": {"field": "f"}}) == "_exists_:f"
    assert render_query({"prefix": {"f": "ab"}}) == "f:ab*"
    assert render_query({"match_phrase": {"f": "a b"}}) == 'f:"a b"'
    assert render_query({"match": {"f": "a b"}}) == "(f:a f:b)"
    assert render_query({"ids": {"values": [1, 2]}}) == "_id:(1 OR 2)"
    assert render_query({"bool": {
        "must": [{"term": {"a": 1}}],
        "must_not": [{"term": {"b": 2}}],
    }}) == "(+(a:1) -(b:2))"
    # unknown leaves fall back to canonical json, never guess
    assert render_query({"fuzzy": {"f": {"value": "x"}}}) == (
        'fuzzy({"f": {"value": "x"}})')


def test_es_validate_query_verdicts(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_validate_query,
    )
    df = spark.createDataFrame([(1, "a")], "id long, txt string")
    ok = es_validate_query(df, query={"term": {"txt": "a"}},
                           explain=True).collect()[0]
    assert ok.valid and ok.explanation == "txt:a" and ok.error is None
    # unknown FIELD stays valid - ES's lenient mapping rule
    lenient = es_validate_query(df, query={"term": {"nope": 1}}).collect()[0]
    assert lenient.valid
    bad = es_validate_query(df, query={"frobnicate": {}}).collect()[0]
    assert not bad.valid and "unsupported ES query clause" in bad.error
    assert bad.explanation is None


# -- _search_shards (round 12) ----------------------------------------------

def test_murmur3_public_reference_vectors():
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _murmur3_32,
    )
    # the widely published murmurhash3 x86_32 test vectors
    assert _murmur3_32(b"", 0) == 0
    assert _murmur3_32(b"", 1) == 0x514E28B7
    assert _murmur3_32(b"hello", 0) == 0x248BFA47
    assert _murmur3_32(b"hello, world", 0) == 0x149BBB7F
    assert (_murmur3_32(b"The quick brown fox jumps over the lazy dog",
                        0) & 0xFFFFFFFF) == 0x2E4FF723


def test_es_routing_shard_math():
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_default_routing_shards,
        es_routing_hash,
        es_shard_for_routing,
    )
    # Java's byte recipe: UTF-16 code units little-endian, seed 0
    # ("a" = bytes 61 00)
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _murmur3_32,
    )
    assert es_routing_hash("a") == _murmur3_32(b"a\x00", 0)
    assert es_routing_hash("ab") == _murmur3_32(b"a\x00b\x00", 0)
    # default number_of_routing_shards: largest n*2^k <= 1024
    assert es_default_routing_shards(1) == 1024
    assert es_default_routing_shards(3) == 768
    assert es_default_routing_shards(5) == 640
    assert es_default_routing_shards(1024) == 1024
    assert es_default_routing_shards(2000) == 2000
    # shard ids stay in range and are stable under the factor rule
    for r in ("1", "user_a", "tenant-2", ""):
        s = es_shard_for_routing(r, 5)
        assert 0 <= s < 5
        # explicit num_routing_shards equal to num_shards = factor 1
        s1 = es_shard_for_routing(r, 5, num_routing_shards=5)
        assert 0 <= s1 < 5
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple"):
        es_shard_for_routing("x", 5, num_routing_shards=7)


# -- rule query (round 12) --------------------------------------------------

def test_rule_query_criteria_matching():
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        _rule_criterion_matches,
    )
    mc = {"user_query": "red shoes", "price": 42}
    assert _rule_criterion_matches({"type": "always"}, mc)
    assert _rule_criterion_matches(
        {"type": "exact", "metadata": "user_query",
         "values": ["red shoes", "blue"]}, mc)
    assert not _rule_criterion_matches(
        {"type": "exact", "metadata": "user_query", "values": ["blue"]},
        mc)
    assert _rule_criterion_matches(
        {"type": "prefix", "metadata": "user_query", "values": ["red"]},
        mc)
    assert _rule_criterion_matches(
        {"type": "suffix", "metadata": "user_query", "values": ["shoes"]},
        mc)
    assert _rule_criterion_matches(
        {"type": "contains", "metadata": "user_query", "values": ["d sh"]},
        mc)
    assert _rule_criterion_matches(
        {"type": "gte", "metadata": "price", "values": [42]}, mc)
    assert not _rule_criterion_matches(
        {"type": "lt", "metadata": "price", "values": [42]}, mc)
    # a criterion on absent request metadata never matches
    assert not _rule_criterion_matches(
        {"type": "exact", "metadata": "nope", "values": ["x"]}, mc)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="fuzzy"):
        _rule_criterion_matches(
            {"type": "fuzzy", "metadata": "user_query", "values": ["x"]},
            mc)


def test_rule_query_pin_exclude_and_collision(spark):
    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        es_rule_query,
    )
    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(1, 8)],
        "id bigint, score double")
    rules = [{"rules": [
        {"rule_id": "pin", "type": "pinned",
         "criteria": [{"type": "always"}], "actions": {"ids": [6, 5]}},
        {"rule_id": "hide", "type": "exclude",
         "criteria": [{"type": "always"}], "actions": {"ids": [1]}},
    ]}]
    got = [r["id"] for r in es_rule_query(
        df, id_col="id", organic={"range": {"id": {"lte": 3}}},
        rulesets=rules, match_criteria={}, sort=[("score", "desc")],
        size=10).collect()]
    # pins first in rule order (even though organic excludes them),
    # organic minus the excluded id follows by sort
    assert got == [6, 5, 2, 3]
    import pytest as _pytest
    coll = [{"rules": [
        {"rule_id": "a", "type": "pinned",
         "criteria": [{"type": "always"}], "actions": {"ids": [2]}},
        {"rule_id": "b", "type": "exclude",
         "criteria": [{"type": "always"}], "actions": {"ids": [2]}},
    ]}]
    with _pytest.raises(ValueError, match="pinned and excluded"):
        es_rule_query(df, id_col="id", organic={"match_all": {}},
                      rulesets=coll, match_criteria={},
                      sort=[("score", "desc")]).collect()
