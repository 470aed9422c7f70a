"""Differential test for the ES geo clauses: random geo_distance and
geo_bounding_box queries over the synthetic customer geo layer must
return the same customer set through the Spark compiler and through an
independent DuckDB rendering of the same predicate (same haversine
formula, same box semantics including the antimeridian wrap)."""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.sources.es_query import (
    _EARTH_RADIUS_M,
    _customer_geo,
    es_search,
)

SF_DIR = "/root/testdata/sf0.001"

# grid-snapped parameters keep every boundary comparison away from
# libm-ulp territory (the synthetic lat/lon are 1e-4-granular; probe
# values sit on .05 offsets so no point can land exactly on a cut)
_lat = st.integers(-50, 50).map(lambda v: v + 0.05)
_lon = st.integers(-179, 179).map(lambda v: v + 0.05)
_radius_km = st.integers(2, 120).map(lambda v: v * 100)

geo_distance_q = st.tuples(_lat, _lon, _radius_km).map(
    lambda t: {"geo_distance": {"distance": f"{t[2]}km",
                                "location": {"lat": t[0], "lon": t[1]}}})

geo_box_q = st.tuples(_lat, _lat, _lon, _lon).map(
    lambda t: {"geo_bounding_box": {"location": {
        "top_left": {"lat": max(t[0], t[1]), "lon": t[2]},
        "bottom_right": {"lat": min(t[0], t[1]), "lon": t[3]}}}})

query_strategy = st.one_of(geo_distance_q, geo_box_q)


def _sql(q) -> str:
    (kind, body), = q.items()
    if kind == "geo_distance":
        body = dict(body)
        dist_m = float(body.pop("distance")[:-2]) * 1000.0
        (_, o), = body.items()
        lat0, lon0 = o["lat"], o["lon"]
        return (f"2.0 * {_EARTH_RADIUS_M} * ASIN(SQRT("
                f"SIN(RADIANS({lat0} - lat)/2) * SIN(RADIANS({lat0} - lat)/2)"
                f" + COS(RADIANS(lat)) * COS(RADIANS({lat0}))"
                f" * SIN(RADIANS({lon0} - lon)/2)"
                f" * SIN(RADIANS({lon0} - lon)/2))) <= {dist_m}")
    (_, box), = body.items()
    tl, br = box["top_left"], box["bottom_right"]
    lat_sql = f"lat <= {tl['lat']} AND lat >= {br['lat']}"
    if tl["lon"] <= br["lon"]:
        return f"{lat_sql} AND lon >= {tl['lon']} AND lon <= {br['lon']}"
    return f"{lat_sql} AND (lon >= {tl['lon']} OR lon <= {br['lon']})"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW geo AS SELECT c_custkey, "
        "(c_custkey * 7919 % 1200000) / 10000.0 - 60.0 AS lat, "
        "(c_custkey * 104729 % 3600000) / 10000.0 - 180.0 AS lon "
        f"FROM '{SF_DIR}/customer.parquet'"
    )
    yield con
    con.close()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=query_strategy)
def test_geo_compiler_matches_independent_sql(spark, duck, q):
    g = _customer_geo(spark, SF_DIR)
    got = {r[0] for r in es_search(g, q).select("c_custkey").collect()}
    want = {r[0] for r in duck.sql(
        f"SELECT c_custkey FROM geo WHERE {_sql(q)}").fetchall()}
    assert got == want, (q, len(got), len(want))


def test_geo_shape_hand_checked(spark):
    """geo_shape semantics on hand-placed points: envelope (incl.
    dateline wrap), polygon with a hole (even-odd), relations
    intersects/within/disjoint, contains rejected, ring validation."""
    import pytest

    from pyspark.sql import functions as F

    from cassandra_elasticsearch_sync_spark.sources.es_query import (
        compile_query,
    )

    pts = [
        (1, 0.0, 0.0),      # inside the outer square, outside the hole
        (2, 0.0, 4.5),      # inside the hole
        (3, 0.0, 20.0),     # outside everything
        (4, 8.0, 0.0),      # north of the outer square
        (5, 0.0, 179.5),    # for the dateline envelope
        (6, 0.0, -179.5),   # for the dateline envelope
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double") \
        .withColumn("location", F.struct("lat", "lon"))

    # outer square lon/lat [-6,6]^2, hole [3,6]x[-2,2] (lon,lat)
    poly = {"type": "polygon", "coordinates": [
        [[-6.0, -6.0], [6.0, -6.0], [6.0, 6.0], [-6.0, 6.0],
         [-6.0, -6.0]],
        [[3.0, -2.0], [6.0, -2.0], [6.0, 2.0], [3.0, 2.0], [3.0, -2.0]],
    ]}

    def hits(spec):
        q = {"geo_shape": {"location": spec}}
        return {r.id for r in df.filter(compile_query(q)).collect()}

    assert hits({"shape": poly}) == {1}                      # hole bites
    assert hits({"shape": poly, "relation": "within"}) == {1}
    assert hits({"shape": poly, "relation": "disjoint"}) == \
        {2, 3, 4, 5, 6}

    env = {"type": "envelope", "coordinates": [[-6.0, 6.0], [6.0, -6.0]]}
    assert hits({"shape": env}) == {1, 2}                    # no hole

    # dateline-crossing envelope: left 179 > right -179 wraps
    wrap = {"type": "envelope",
            "coordinates": [[179.0, 6.0], [-179.0, -6.0]]}
    assert hits({"shape": wrap}) == {5, 6}

    with pytest.raises(ValueError, match="cannot contain"):
        hits({"shape": poly, "relation": "contains"})
    with pytest.raises(ValueError, match="closed"):
        hits({"shape": {"type": "polygon", "coordinates": [
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]]}})
    with pytest.raises(ValueError, match="envelope and polygon"):
        hits({"shape": {"type": "circle", "coordinates": [0, 0]}})
