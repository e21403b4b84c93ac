"""Snapshot-maintenance operators: SCD1 upsert (MERGE INTO semantics)
and CDC changefeed application (latest-wins), composed from anti-join +
union — the Spark-first expression of MERGE without a table format.

The reference pipeline's closest analogue is the overwrite-by-chunk
checkpoint contract (idempotent re-publish, ``unified_code.py:96-148``);
these operators are the distributed generalization every warehouse
needs: apply a keyed changefeed to a big snapshot.

Scale shape (the part that matters at 100 TB): the base table only ever
participates in ONE hash-partitioned anti-join on the merge key, and
the changefeed — orders of magnitude smaller than the base in any real
CDC stream — is reduced FIRST (latest-wins window over the feed only),
never the base. With the base bucketed/partitioned by key, the
anti-join co-locates and the merge is a map-side operation per bucket;
output re-partitions by the same key for the next merge cycle. No
global sorts, no driver materialization, no O(base) state.

The changefeeds here are derived deterministically from ``orders``
(the fixtures ship no separate feed table); the derivation is plain
column logic mirrored exactly in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# Integer-cents price math (exact across engines): bump = +10%.
_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def apply_upsert(base: DataFrame, feed: DataFrame, key: str) -> DataFrame:
    """MERGE semantics on DataFrames: rows of ``feed`` with op 'D'
    delete, anything else replaces/inserts whole rows by ``key``.

    ``feed`` must carry the base schema plus an ``op`` column. The base
    is touched by exactly one anti-join on ``key``.
    """
    survivors = base.join(feed.select(key), key, "left_anti")
    replacements = feed.filter(F.col("op") != "D").drop("op")
    return survivors.unionByName(replacements)


def latest_wins(feed: DataFrame, key: str, seq: str) -> DataFrame:
    """Reduce a multi-op changefeed to one row per key (highest ``seq``
    wins). Window over the FEED only — never the base table."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq)
    )


@query(
    "merge_upsert_orders",
    oracle=f"""
    WITH feed AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             ({_CENTS} * 11) // 10 AS cents, 'U' AS op
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, {_CENTS}, 'D'
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N', {_CENTS}, 'I'
      FROM orders WHERE o_orderkey % 7 = 2
    ),
    survivors AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, {_CENTS} AS cents
      FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM feed)
    ),
    merged AS (
      SELECT * FROM survivors
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, cents
      FROM feed WHERE op <> 'D'
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(cents / 100.0, 2) AS price2
    FROM merged
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert (MERGE INTO without a table format): a derived
    changefeed updates every 7th order (+10%, integer-cents exact),
    deletes the next 7th, and inserts re-keyed new rows; the snapshot
    is rebuilt as anti-join survivors ∪ replacements. One shuffle of
    the base on the merge key — the plan a bucketed 100 TB snapshot
    wants."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select("o_orderkey", "o_custkey", "o_orderstatus", cents.alias("cents"))
    feed = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("cents", F.expr("(cents * 11) DIV 10"))
        .withColumn("op", F.lit("U"))
        .unionByName(
            base.filter(F.col("o_orderkey") % 7 == 1).withColumn("op", F.lit("D"))
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 7 == 2)
            .withColumn("o_orderkey", F.col("o_orderkey") + 100000000)
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("op", F.lit("I"))
        )
    )
    merged = apply_upsert(base, feed, "o_orderkey")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("cents") / 100.0, 2).alias("price2"),
    )


@query(
    "merge_cdc_latest_wins",
    oracle=f"""
    WITH feed AS (
      SELECT o_orderkey, 1 AS seq, 'U' AS op, {_CENTS} + 100 AS cents
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', {_CENTS} + 200
      FROM orders WHERE o_orderkey % 5 = 0
      UNION ALL
      SELECT o_orderkey, 1, 'U', {_CENTS} + 300
      FROM orders WHERE o_orderkey % 5 = 1
      UNION ALL
      SELECT o_orderkey, 2, 'D', {_CENTS}
      FROM orders WHERE o_orderkey % 5 = 1
    ),
    latest AS (
      SELECT o_orderkey, op, cents
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                         ORDER BY seq DESC) AS rn
            FROM feed)
      WHERE rn = 1
    ),
    survivors AS (
      SELECT o_orderkey, {_CENTS} AS cents FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    ),
    merged AS (
      SELECT * FROM survivors
      UNION ALL
      SELECT o_orderkey, cents FROM latest WHERE op <> 'D'
    )
    SELECT o_orderkey, ROUND(cents / 100.0, 2) AS price2 FROM merged
    """,
)
def merge_cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changefeed application: multiple ops per key arrive with a
    sequence number; the feed is reduced latest-wins (window over the
    FEED, never the base), then applied as upsert/delete. Every 5th
    order gets two updates (second wins); the next 5th gets an update
    then a delete (net delete). The base pays one anti-join; feed
    reduction cost scales with the feed, not the snapshot."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select("o_orderkey", cents.alias("cents"))

    def slice_(mod: int, seq: int, op: str, bump: int) -> DataFrame:
        return (
            base.filter(F.col("o_orderkey") % 5 == mod)
            .withColumn("seq", F.lit(seq))
            .withColumn("op", F.lit(op))
            .withColumn("cents", F.col("cents") + bump)
        )

    feed = (
        slice_(0, 1, "U", 100)
        .unionByName(slice_(0, 2, "U", 200))
        .unionByName(slice_(1, 1, "U", 300))
        .unionByName(slice_(1, 2, "D", 0))
    )
    latest = latest_wins(feed, "o_orderkey", "seq")
    merged = apply_upsert(base, latest, "o_orderkey")
    return merged.select(
        "o_orderkey", F.round(F.col("cents") / 100.0, 2).alias("price2")
    )
