"""Skew-salting correctness + bucketed-join shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catme_etl_spark.operators.skew import salted_join, write_bucketed
from catme_etl_spark.plans.explain import count_shuffles, executed_plan_str
from catme_etl_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, on="o_custkey", n_salt=4, salt_src="o_orderkey")
    salted = salted.select("o_orderkey", "c_name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    # one pathological key: 10_000 rows on key=1 vs 100 elsewhere
    big = spark.range(10_100).select(
        F.when(F.col("id") < 10_000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("rowid"),
    )
    small = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    out = salted_join(big, small, on="k", n_salt=8, salt_src="rowid")
    assert out.count() == 10_000  # only hot key 1 has a match in small
    # correctness vs plain join
    plain = big.join(small, "k")
    assert out.exceptAll(plain).count() == 0 and plain.exceptAll(out).count() == 0


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
        sort_col="o_orderkey",
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    li = spark.table(lt)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = li.join(o, "o_orderkey").groupBy("o_orderstatus").count()
        # co-located buckets: join AND aggregation-side partials read
        # pre-bucketed data; the only allowed exchange is for the final
        # small groupBy on o_orderstatus
        plan = executed_plan_str(j)
        n = count_shuffles(j)
        assert n <= 1, f"bucketed join should not shuffle the fact tables:\n{plan[:3000]}"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
