#!/usr/bin/env python3
"""Regenerate COVERAGE.md's query table from the registry (the
test_coverage_doc_matches_registry gate keeps doc and code in sync;
run this after registering a new query)."""

from __future__ import annotations

import re

from cassandra_elasticsearch_sync_spark.registry import all_specs

PATH = "COVERAGE.md"


def main() -> None:
    specs = all_specs()
    n_total = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)

    rows = sorted(
        ((s.survey_id, name, "✔" if s.oracle is not None else "✖")
         for name, s in specs.items()),
        key=lambda r: (r[0], r[1]),
    )
    table = "\n".join(f"| {sid} | `{name}` | {mark} |" for sid, name, mark in rows)

    text = open(PATH).read()
    head, tail = text.split("| SURVEY §2 row | query name(s) | oracle |", 1)
    _, rest = tail.split("## Rows covered by library functions", 1)
    head = re.sub(r"\*\*\d+ registered queries\*\* \(\d+ oracle-checked\)",
                  f"**{n_total} registered queries** ({n_oracle} oracle-checked)",
                  head)
    out = (
        head
        + "| SURVEY §2 row | query name(s) | oracle |\n| --- | --- | --- |\n"
        + table
        + "\n\n## Rows covered by library functions"
        + rest
    )
    open(PATH, "w").write(out)
    print(f"COVERAGE.md regenerated: {n_total} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
