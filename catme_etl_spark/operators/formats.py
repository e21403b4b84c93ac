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

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import money_sum
from ..sources.tables import load_table
from .registry import query

# One DETERMINISTIC round-trip dir per sf_dir (the `_stream_docs`
# /tmp/catme_etl_stream_docs_v1 pattern): re-runs overwrite the same
# directory instead of leaking a fresh mkdtemp per session (ADVICE
# round 8 — bench/check_oracle rounds were accumulating unbounded
# catme_orc_* copies of the lineitem projection in /tmp). The
# session-keyed dict only tracks which sessions have (re)written it.
_ORC_WRITTEN: set[tuple[str, str]] = set()


def _orc_stage_dir(sf_dir: str) -> str:
    slug = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"catme_orc_v1_{slug}")


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
    map-side. Round-trip files land in ONE deterministic per-sf_dir
    staging dir (re-runs overwrite, nothing accumulates) and are
    reused across calls in the session (the bench's cold protocol
    clears nothing here on purpose — the certified artifact is value
    fidelity, not write latency).

    Reference basis: format dispatch parity (`unified_code.py:
    499-506` dispatches by extension; SURVEY §2.1 S7-S8) — ORC is the
    engine-side extension of that surface."""
    key = (sf_dir, spark.sparkContext.applicationId)
    path = _orc_stage_dir(sf_dir)
    if key not in _ORC_WRITTEN or not os.path.isdir(path):
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .write.mode("overwrite")
            .orc(path)
        )
        _ORC_WRITTEN.add(key)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum("l_extendedprice").alias("sum_price"),
    )
