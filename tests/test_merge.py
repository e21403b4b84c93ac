"""Merge/CDC operator invariants (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e
from catme_etl_spark.operators.merge import apply_upsert, latest_wins
from catme_etl_spark.sources.tables import load_table


def test_upsert_row_accounting(spark, sf_dir):
    """|merged| = |base| - |deletes| + |inserts|; merge key stays unique."""
    base_n = load_table(spark, sf_dir, "orders").count()
    merged = e.queries()["merge_upsert_orders"](spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    n_del = o.filter(F.col("o_orderkey") % 7 == 1).count()
    n_ins = o.filter(F.col("o_orderkey") % 7 == 2).count()
    assert merged.count() == base_n - n_del + n_ins
    assert merged.select("o_orderkey").distinct().count() == merged.count()


def test_latest_wins_picks_highest_seq(spark):
    feed = spark.createDataFrame(
        [(1, 1, "U", 10), (1, 2, "U", 20), (2, 1, "D", 0), (2, 2, "U", 5)],
        "k long, seq long, op string, v long",
    )
    out = {r["k"]: (r["op"], r["v"]) for r in latest_wins(feed, "k", "seq").collect()}
    assert out == {1: ("U", 20), 2: ("U", 5)}


def test_apply_upsert_semantics(spark):
    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    feed = spark.createDataFrame(
        [(2, 99, "U"), (3, 0, "D"), (4, 40, "I")], "k long, v long, op string"
    )
    out = {r["k"]: r["v"] for r in apply_upsert(base, feed, "k").collect()}
    assert out == {1: 10, 2: 99, 4: 40}
