"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` draws differ per engine/partitioning, so reproducible
pipelines sample by CONTENT HASH instead: stable across reruns,
cluster sizes, and engines (the property a 100 TB data mix actually
needs — re-running the job selects the same documents), and
oracle-checkable for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texttools import hex_prefix_long, sql_hex_long
from ..sources.tables import load_table
from .registry import query

_STRATUM_K = 5


def hash_bucket(col, n_buckets: int = 10):
    """Deterministic bucket in [0, n): md5 of the key's string form →
    56-bit int → mod. Engine-independent (md5 is md5 everywhere)."""
    return hex_prefix_long(F.md5(col.cast("string")), 14, 1) % n_buckets


@query(
    "sample_hash_10pct",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM (SELECT doc_id, lang, source,
                 {sql_hex_long("md5(CAST(doc_id AS VARCHAR))", 14, 1)} % 10 AS bkt
          FROM documents) x
    WHERE bkt = 0
    """,
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of documents by id-hash bucket."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(hash_bucket(F.col("doc_id"), 10) == 0).select(
        "doc_id", "lang", "source"
    )


@query(
    "sample_stratified_per_source",
    oracle=f"""
    SELECT source, doc_id, lang
    FROM (
      SELECT source, doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {sql_hex_long("md5(CAST(doc_id AS VARCHAR))", 14, 1)}, doc_id
             ) AS rn
      FROM documents
    ) x
    WHERE rn <= {_STRATUM_K}
    """,
)
def sample_stratified_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K docs per source, chosen by hash order — the stratified 'data
    mixing' primitive (equal representation per stratum, deterministic
    membership). One shuffle on the stratum key."""
    d = load_table(spark, sf_dir, "documents")
    hkey = hex_prefix_long(F.md5(F.col("doc_id").cast("string")), 14, 1)
    w = Window.partitionBy("source").orderBy(hkey, F.col("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRATUM_K)
        .select("source", "doc_id", "lang")
    )
