"""PySpark-native analytics/sync engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference project ``arthurprs/Cassandra-Elasticsearch-Sync`` (a
bidirectional Cassandra <-> Elasticsearch synchronizer; see SURVEY.md
section 0 -- the reference source tree was empty at survey time, so
semantics derive from the driver contract BASELINE.json:6 and public
knowledge, not from reference file:line citations), extended with the
large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) mandated by the task.

Design stance (SURVEY.md section 4 and 7):

- Pure DataFrame/SQL API: every operator declares a logical plan and
  lets Catalyst/Tungsten pick the physical strategy. Zero custom
  Catalyst rules, zero RDD code.
- Python is the slow path: the hot path is JVM whole-stage codegen;
  Arrow-batched pandas UDFs only where built-ins genuinely cannot
  express the semantics (multimodal decode stubs).
- Scale-first: broadcast hints for dimension tables, explicit
  partitioning knobs, deterministic seeded hashing (never rand()),
  AQE on for runtime skew handling. Tested at sf0.001-0.1 locally but
  every plan is written for a 1000-executor 100 TB deployment.
"""

from cassandra_elasticsearch_sync_spark.session import get_spark
from cassandra_elasticsearch_sync_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"
