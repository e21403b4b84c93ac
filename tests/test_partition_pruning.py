"""Partition pruning: a date-partitioned layout must scan only the
partitions the filter names (the thing that keeps a 100 TB
date-partitioned lake queryable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from catme_etl_spark.plans.explain import plan_str
from catme_etl_spark.sources.tables import load_table


def test_partition_pruning_on_date_partitioned_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_month")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    o.write.partitionBy("order_month").mode("overwrite").parquet(out)

    part = spark.read.parquet(out)
    q = part.filter(F.col("order_month") == "1996-03").select("o_orderkey")
    plan = plan_str(q)
    # the month predicate must be a PartitionFilters entry on the scan
    # (directory-level pruning), not a post-scan row Filter
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "order_month" in m.group(1) and "1996-03" in m.group(1), plan[:2000]
    n_total = part.count()
    n_month = q.count()
    assert 0 < n_month < n_total
