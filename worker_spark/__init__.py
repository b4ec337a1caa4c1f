"""worker_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ordbokapi/worker (reference: /root/reference,
Rust). Not a port: the reference's semantics (incremental sync diff, nested
JSON extraction, enrichment joins, outbox dataflow, search-document build)
are re-expressed as declarative DataFrame/SQL plans that Catalyst optimizes,
plus Structured Streaming for the queue dataflow.

Layout:
  session      — SparkSession factory tuned for local[N] and cluster use
  schemas      — StructTypes for every table (SURVEY.md §1)
  sources      — readers for the landed data (S1-S6)
  functions    — scalar/string function layer (F1-F12)
  operators    — generic relational + training-data operators (dedup, ANN, text)
  plans        — end-to-end pipelines (sync diff, search-document build)
  streaming    — outbox/queue dataflow as Structured Streaming (T1-T12)
  queries      — the declared query inventory + DuckDB oracle SQL
"""

__version__ = "0.1.0"
