"""catme_etl_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline (waldfalke/catme-etl, see SURVEY.md), extended
with the relational query surface and LLM-data-pipeline operators the
driver contract mandates (BASELINE.json north_star).

Layout
------
- ``session``    : SparkSession factory tuned for local testing but
                   configured with scale-ready defaults (AQE, Arrow).
- ``sources``    : readers/writers — parquet star schema loader, CSV,
                   Excel bridge, JSON sink with merge/chunks modes.
- ``pipeline``   : reference-parity 4-stage pipeline
                   (prepare/validate/transform/finalize — see
                   unified_code.py:246-293 in the reference).
- ``operators``  : relational queries, dedup, similarity, text
                   analysis, multimodal plumbing.
- ``functions``  : reusable column expressions (vector math, hashing).
- ``streaming``  : Structured Streaming windows/watermark/stateful ops.
- ``plans``      : plan inspection helpers (pushdown/codegen checks).
"""

__version__ = "0.1.0"
