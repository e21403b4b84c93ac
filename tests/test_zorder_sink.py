"""Z-order parquet layout: Morton-key correctness and the clustering
effect that makes row-group skipping work on either dimension."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from catme_etl_spark.sinks.parquet_sink import write_zordered, zorder_key


def test_zorder_key_interleaves_bits(spark):
    # (x=0b11, y=0b01) with 2 cols → bits interleave as y1 x1 y0 x0
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    got = df.select(zorder_key(["x", "y"], bits=2).alias("z")).first()["z"]
    # x0=1 -> pos0, y0=1 -> pos1, x1=1 -> pos2, y1=0 -> pos3
    assert got == 0b0111
    # order-sensitivity: swapping columns changes the key
    got2 = df.select(zorder_key(["y", "x"], bits=2).alias("z")).first()["z"]
    assert got2 == 0b1011


def test_zorder_key_rejects_out_of_contract_values(spark):
    """ADVICE r2: negative values and values >= 2^bits must raise, not
    silently miscluster (sign-extension / dropped high bits)."""
    import pytest

    for bad in [(-1, 1), (4, 1), (1, -7)]:
        df = spark.createDataFrame([bad], "x long, y long")
        with pytest.raises(Exception) as ei:
            df.select(zorder_key(["x", "y"], bits=2).alias("z")).collect()
        assert "zorder_key" in str(ei.value)
    # boundary value 2^bits - 1 is in contract
    ok = spark.createDataFrame([(3, 3)], "x long, y long")
    assert (
        ok.select(zorder_key(["x", "y"], bits=2).alias("z")).first()["z"]
        == 0b1111
    )


def test_zordered_files_cluster_both_dimensions(spark, tmp_path):
    # 64×64 uniform grid → 8 curve segments; every file should cover a
    # small sub-rectangle in BOTH x and y, unlike a plain sort which
    # clusters only its leading key.
    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    out = str(tmp_path / "z")
    write_zordered(grid, out, ["x", "y"], bits=6, n_files=16)
    spans_x, spans_y = [], []
    for f in glob.glob(out + "/part-*.parquet"):
        pf = spark.read.parquet(f)
        row = pf.agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).first()
        spans_x.append(row["sx"])
        spans_y.append(row["sy"])
    assert len(spans_x) >= 8
    # global span is 63; Z-order keeps the average per-file span of
    # BOTH dimensions well under it (plain sort would leave one at ~63)
    assert sum(spans_x) / len(spans_x) < 40
    assert sum(spans_y) / len(spans_y) < 40
    # and no rows were lost
    assert spark.read.parquet(out).count() == 64 * 64
