"""Sync-engine composite operators (SURVEY.md section 2.L).

The reference's entire purpose - bidirectional Cassandra <->
Elasticsearch synchronization (BASELINE.json:6) - decomposes into the
relational primitives in this package: snapshot diff (full outer
join), delta extraction (version filter), last-write-wins resolution
(per-key top-1 window), idempotent upsert-set computation, and
deletion propagation (anti join).
"""
