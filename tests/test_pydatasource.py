"""Custom Python DataSource (sheetdir): schema, partition-per-sheet
parallelism, and content round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from catme_etl_spark.sources.pydatasource import SheetDirDataSource


def _write_sheets(tmp_path):
    (tmp_path / "alpha.csv").write_text("id,name\n1,a\n2,b\n")
    (tmp_path / "beta.csv").write_text("id,name\n3,c\n")
    return str(tmp_path)


def test_sheetdir_reads_all_sheets_with_sheet_column(spark, tmp_path):
    d = _write_sheets(tmp_path)
    spark.dataSource.register(SheetDirDataSource)
    df = spark.read.format("sheetdir").load(d)
    assert df.columns == ["id", "name", "_sheet"]
    rows = {(r.id, r.name, r._sheet) for r in df.collect()}
    assert rows == {("1", "a", "alpha"), ("2", "b", "alpha"), ("3", "c", "beta")}


def test_sheetdir_partitions_by_sheet(spark, tmp_path):
    d = _write_sheets(tmp_path)
    spark.dataSource.register(SheetDirDataSource)
    df = spark.read.format("sheetdir").load(d)
    # one input partition per sheet file → per-sheet task parallelism,
    # the reference's per-sheet loop as Spark scheduling
    assert df.rdd.getNumPartitions() == 2
    per_sheet = {
        r._sheet: r.n
        for r in df.groupBy("_sheet").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_sheet == {"alpha": 2, "beta": 1}
