"""The data-quality audit must DETECT problems, not just report zeros
on clean data: corrupt a copy of the dataset and assert the exact
violation surfaces."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from catme_etl_spark.operators.quality import quality_fk_audit
from catme_etl_spark.sources.tables import TABLES


def _corrupt_copy(spark, sf_dir, tmp_path):
    """Copy all tables; add one orphan order (no such customer) and one
    negative-quantity lineitem."""
    out = str(tmp_path / "corrupt_sf")
    os.makedirs(out)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        shutil.copy(src, os.path.join(out, f"{t}.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    bad_order = orders.limit(1).withColumn("o_custkey", F.lit(-999).cast("long"))
    orders.unionByName(bad_order).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders_tmp")
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    bad_li = li.limit(1).withColumn("l_quantity", F.lit(-5.0))
    li.unionByName(bad_li).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem_tmp")
    )
    # single-file layout like the originals
    for name, tmp in (("orders", "orders_tmp"), ("lineitem", "lineitem_tmp")):
        part = [
            f
            for f in os.listdir(tmp_path / tmp)
            if f.endswith(".parquet")
        ][0]
        os.replace(
            str(tmp_path / tmp / part), os.path.join(out, f"{name}.parquet")
        )
    return out


def test_fk_audit_detects_injected_violations(spark, sf_dir, tmp_path):
    corrupt = _corrupt_copy(spark, sf_dir, tmp_path)
    got = {r.check_name: r.violations for r in quality_fk_audit(spark, corrupt).collect()}
    assert got["orders.o_custkey->customer"] == 1
    assert got["lineitem.l_quantity > 0"] == 1
    # the injected orphan order does NOT orphan its lineitems (FK is on
    # orderkey), and every other constraint still holds
    assert got["lineitem.l_orderkey->orders"] == 0
    assert got["customer.c_nationkey->nation"] == 0


def test_fk_audit_clean_on_pristine_data(spark, sf_dir):
    got = {r.check_name: r.violations for r in quality_fk_audit(spark, sf_dir).collect()}
    assert set(got.values()) == {0}


def test_profile_legs_form_equals_fused_form(spark, sf_dir):
    """The single-split profile plan (independent crossJoined legs)
    computes byte-identical measures to the fused one-pass production
    form — each leg is the same aggregate over the same rows, and
    HLL++ register merges are partition-independent."""
    from catme_etl_spark.operators.quality import (
        _is_single_split,
        _profile_source,
        table_profile_wide_approx,
    )

    l = _profile_source(spark, sf_dir)
    assert _is_single_split(l)  # fixture arrives as one row group
    legs = table_profile_wide_approx(l).collect()[0].asDict()
    fanned = l.repartition(spark.sparkContext.defaultParallelism)
    assert not _is_single_split(fanned)
    fused = table_profile_wide_approx(fanned).collect()[0].asDict()
    assert legs == fused


def test_profile_distinct_leg_sketch_equals_raw_sketch(spark, sf_dir):
    """The single-split approx profile derives each column's exact
    count AND its HLL++ estimate from one distinct pass. That rests on
    HLL++ being duplicate-insensitive (register state is a max over
    value hashes): the sketch over distinct(col) must equal the sketch
    over the raw rows, and count(col) over the distinct set must equal
    countDistinct(col)."""
    from catme_etl_spark.operators.quality import (
        _PROFILE_NUM,
        _PROFILE_RSD,
        _PROFILE_STR,
        _profile_source,
    )

    l = _profile_source(spark, sf_dir)
    for _, col in _PROFILE_NUM + _PROFILE_STR:
        raw = l.agg(
            F.countDistinct(col).alias("nd"),
            F.approx_count_distinct(col, rsd=_PROFILE_RSD).alias("ad"),
        ).first()
        leg = (
            l.select(col)
            .distinct()
            .agg(
                F.count(col).cast("long").alias("nd"),
                F.approx_count_distinct(col, rsd=_PROFILE_RSD).alias("ad"),
            )
            .first()
        )
        assert (raw["nd"], raw["ad"]) == (leg["nd"], leg["ad"]), col
