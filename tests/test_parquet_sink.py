"""Partitioned parquet sink: layout, pruning, and row-group ordering."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from catme_etl_spark.sinks.parquet_sink import write_partitioned
from catme_etl_spark.sources.tables import load_table


def test_write_partitioned_layout_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    write_partitioned(
        o, out, partition_by=["o_orderstatus"], sort_within=["o_orderdate"]
    )
    # one directory per status value, one file per partition
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("o_orderstatus=")
    )
    statuses = sorted(r[0] for r in o.select("o_orderstatus").distinct().collect())
    assert dirs == [f"o_orderstatus={s}" for s in statuses]
    for d in dirs:
        files = glob.glob(os.path.join(out, d, "*.parquet"))
        assert len(files) == 1

    # a status filter becomes a PartitionFilters entry on the scan
    # (directory pruning, no data read outside the matching partition)
    import re

    from catme_etl_spark.plans.explain import plan_str

    rd = spark.read.parquet(out).filter(F.col("o_orderstatus") == statuses[0])
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan_str(rd))
    assert m and "o_orderstatus" in m.group(1), plan_str(rd)[:2000]
    assert rd.count() == o.filter(F.col("o_orderstatus") == statuses[0]).count()

    # round-trip preserves content (ignoring partition column position)
    back = spark.read.parquet(out)
    assert back.count() == o.count()


def test_sort_within_partitions_orders_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_sorted")
    o = load_table(spark, sf_dir, "orders")
    write_partitioned(
        o, out, partition_by=["o_orderstatus"], sort_within=["o_orderdate"]
    )
    files = glob.glob(os.path.join(out, "o_orderstatus=*", "*.parquet"))
    # rows inside each file are date-ordered → row-group min/max stats
    # form a usable coarse index
    import pyarrow.parquet as pq

    for f in files:
        col = pq.read_table(f, columns=["o_orderdate"])["o_orderdate"].to_pylist()
        assert col == sorted(col)
