"""Property tests for _terms_enum paging (hypothesis).

The invariant a pagination API lives or dies by: walking pages with
the search_after term cursor reconstructs EXACTLY the full distinct
term list, in order, with no duplicates and no gaps - for any corpus
and any page size.
"""


from __future__ import annotations

import pytest as _pytest_slowmark

pytestmark = _pytest_slowmark.mark.slow  # multi-minute tier (pytest.ini, round 13)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_elasticsearch_sync_spark.sources.es_query import (
    es_terms_enum,
)

_terms = st.lists(
    st.text(alphabet="abcxy", min_size=0, max_size=4),
    min_size=1, max_size=30)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(terms=_terms, page=st.integers(min_value=1, max_value=5),
       prefix=st.sampled_from(["", "a", "ab", "x"]))
def test_cursor_pages_reconstruct_the_term_list(spark, terms, page, prefix):
    df = spark.createDataFrame([(t,) for t in terms], "t string")
    expected = sorted({t for t in terms if t.startswith(prefix)})
    got, cursor = [], None
    for _ in range(len(terms) + 1):          # bounded walk
        rows = es_terms_enum(df, "t", string=prefix, size=page,
                             search_after=cursor).collect()
        if not rows:
            break
        got.extend(r["term"] for r in rows)
        cursor = rows[-1]["term"]
    assert got == expected
