"""EQL parser + sequence-matcher semantics (sources/eql.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from cassandra_elasticsearch_sync_spark.sources.eql import (
    eql_search,
    parse_eql,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, c, v)
         for (i, s, u, c, v) in rows],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double")


def test_parse_event_and_pipes():
    s = parse_eql('error where value > 9.0 and not user_id == 3 | head 5')
    assert s["kind"] == "event" and s["category"] == "error"
    assert s["pipes"] == [("head", 5)]
    s = parse_eql("sequence by user_id with maxspan=2h "
                  "[a where true] [b where value in (1, 2)]")
    assert s["kind"] == "sequence" and s["by"] == ["user_id"]
    assert s["maxspan_s"] == 7200 and len(s["steps"]) == 2


def test_parse_rejections():
    with pytest.raises(ValueError, match="until"):
        parse_eql("sequence by u [a where true] [b where true] "
                  "until [c where true]")
    with pytest.raises(ValueError, match="at least two"):
        parse_eql("sequence by u [a where true]")
    with pytest.raises(ValueError, match="by"):
        parse_eql("sequence with maxspan=1h [a where true] [b where true]")
    with pytest.raises(ValueError, match="maxspan only"):
        parse_eql("sequence by u with runs=2 [a where true] "
                  "[b where true]")
    with pytest.raises(ValueError, match="head/tail"):
        parse_eql("a where true | sort value")
    with pytest.raises(ValueError, match="like"):
        parse_eql('a where name like "x*"')


def test_event_query_order_and_head(spark):
    df = _ev(spark, [(1, 10, 1, "error", 50.0), (2, 5, 1, "error", 60.0),
                     (3, 7, 2, "click", 1.0), (4, 20, 2, "error", 5.0)])
    got = [r["event_id"] for r in
           eql_search(df, "error where value > 4.0 | head 2").collect()]
    assert got == [2, 1], "stream order: timestamp then tiebreaker id"


def test_sequence_earliest_continuation_and_maxspan(spark):
    df = _ev(spark, [
        (1, 0, 1, "a", 0.0),     # start
        (2, 10, 1, "b", 0.0),    # earliest continuation
        (3, 20, 1, "b", 0.0),    # later b: not chosen
        (4, 0, 2, "a", 0.0),     # start for user 2
        (5, 5000, 2, "b", 0.0),  # beyond maxspan -> no match
    ])
    out = eql_search(df, "sequence by user_id with maxspan=1h "
                         "[a where true] [b where true]").collect()
    assert [(r["user_id"], r["e1_id"], r["e2_id"]) for r in out] == \
        [(1, 1, 2)]


def test_sequence_never_continues_with_itself(spark):
    # two steps over the SAME category: an event must not match both
    # steps of one chain at an identical (ts, id)
    df = _ev(spark, [(1, 0, 1, "a", 0.0), (2, 10, 1, "a", 0.0)])
    out = eql_search(df, "sequence by user_id "
                         "[a where true] [a where true]").collect()
    assert [(r["e1_id"], r["e2_id"]) for r in out] == [(1, 2)]


def test_sequence_three_steps_anchor_first(spark):
    # maxspan anchors at the FIRST step: e3 within 1h of e1, not e2
    df = _ev(spark, [
        (1, 0, 1, "a", 0.0), (2, 1800, 1, "b", 0.0),
        (3, 3500, 1, "c", 0.0),            # inside 1h of e1 -> match
        (4, 0, 2, "a", 0.0), (5, 1800, 2, "b", 0.0),
        (6, 4000, 2, "c", 0.0),            # beyond 1h of e1 -> no match
    ])
    out = eql_search(df, "sequence by user_id with maxspan=1h "
                         "[a where true] [b where true] [c where true]"
                     ).collect()
    assert [(r["user_id"], r["e3_id"]) for r in out] == [(1, 3)]
