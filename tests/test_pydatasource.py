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


def test_sheetfeed_streams_one_sheet_per_batch(spark, tmp_path):
    """Streaming Python DataSource: each micro-batch delivers exactly
    one sheet; offsets advance deterministically so a restart replays
    committed ranges from the files themselves."""
    from catme_etl_spark.sources.pydatasource import SheetFeedDataSource

    import time

    d = _write_sheets(tmp_path)
    spark.dataSource.register(SheetFeedDataSource)
    q = (
        spark.readStream.format("sheetfeed")
        .load(d)
        .groupBy("_sheet")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("sheetfeed_counts")
        .outputMode("complete")
        .start()
    )
    # one sheet arrives per micro-batch (read() advances one file per
    # trigger), so completeness requires ≥2 batches — poll the sink
    expected = {"alpha": 2, "beta": 1}
    per_sheet: dict = {}
    deadline = time.time() + 120
    try:
        while time.time() < deadline and per_sheet != expected:
            per_sheet = {
                r._sheet: r.n
                for r in spark.table("sheetfeed_counts").collect()
            }
            time.sleep(0.5)
    finally:
        q.stop()
    assert per_sheet == expected


def test_xml_roundtrip_via_auto_dispatch(spark, tmp_path):
    from catme_etl_spark.sources.files import read_auto

    p = tmp_path / "t.xml"
    p.write_text(
        "<rows><row><a>1</a><b>x</b></row><row><a>2</a><b>y</b></row></rows>"
    )
    df = read_auto(spark, str(p))
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_sheetfeed_offsets_advance_and_replay_deterministically(tmp_path):
    """Offset contract without the streaming engine: read() advances
    one sheet per call and parks at the end; readBetweenOffsets
    replays exactly the committed range (crash recovery)."""
    from pyspark.sql.types import StructType

    from catme_etl_spark.sources.pydatasource import (
        SheetFeedDataSource,
        _SheetFeedStreamReader,
    )

    d = _write_sheets(tmp_path)
    ds = SheetFeedDataSource(options={"path": d})
    schema = StructType.fromDDL(ds.schema())
    r = _SheetFeedStreamReader(schema, {"path": d})

    o0 = r.initialOffset()
    batch1, o1 = r.read(o0)
    batch2, o2 = r.read(o1)
    batch1, batch2 = list(batch1), list(batch2)
    assert [o0, o1, o2] == [
        {"sheets": 0, "last": ""},
        {"sheets": 1, "last": "alpha.csv"},
        {"sheets": 2, "last": "beta.csv"},
    ]
    assert {t[-1] for t in batch1} == {"alpha"}
    assert {t[-1] for t in batch2} == {"beta"}

    empty, o3 = r.read(o2)
    assert list(empty) == [] and o3 == o2  # parked at end, no new data

    # recovery: a fresh reader replays the committed range identically
    r2 = _SheetFeedStreamReader(schema, {"path": d})
    assert list(r2.readBetweenOffsets(o0, o2)) == batch1 + batch2
    assert list(r2.readBetweenOffsets(o1, o2)) == batch2


def test_sheetfeed_rejects_non_monotonic_arrivals(tmp_path):
    """Content-addressed offsets: a file dropped in whose name sorts
    BEFORE an already-committed sheet must fail loudly (positional
    offsets would silently skip/re-read), and replay of a committed
    range whose WAL files changed must refuse rather than return
    different rows than were committed."""
    import pytest
    from pyspark.sql.types import StructType

    from catme_etl_spark.sources.pydatasource import (
        SheetFeedDataSource,
        _SheetFeedStreamReader,
    )

    d = _write_sheets(tmp_path)  # alpha.csv, beta.csv
    ds = SheetFeedDataSource(options={"path": d})
    schema = StructType.fromDDL(ds.schema())
    r = _SheetFeedStreamReader(schema, {"path": d})

    o0 = r.initialOffset()
    _, o1 = r.read(o0)
    _, o2 = r.read(o1)

    # later-sorting arrival is FINE: picked up as the next batch
    (tmp_path / "gamma.csv").write_text("id,name\n9,z\n")
    batch3, o3 = r.read(o2)
    assert {t[-1] for t in batch3} == {"gamma"} and o3["last"] == "gamma.csv"

    # earlier-sorting arrival under a committed offset: loud failure
    (tmp_path / "aardvark.csv").write_text("id,name\n0,zz\n")
    with pytest.raises(RuntimeError, match="out of name order"):
        r.read(o3)

    # replay of a committed range whose files mutated: loud failure
    with pytest.raises(RuntimeError, match="cannot replay"):
        list(r.readBetweenOffsets(o0, o1))  # aardvark now sits in ("", alpha]


def test_sheetfeed_dist_plans_partitions_and_replays(tmp_path):
    """Partition-planning tier contract without the engine: latestOffset
    advances over ALL pending sheets at once, partitions() maps the
    committed name range to one partition per sheet, read() parses a
    partition, and a mutated WAL fails loudly."""
    import pytest
    from pyspark.sql.types import StructType

    from catme_etl_spark.sources.pydatasource import (
        SheetFeedDistDataSource,
        _SheetFeedDistStreamReader,
    )

    d = _write_sheets(tmp_path)  # alpha.csv, beta.csv
    ds = SheetFeedDistDataSource(options={"path": d})
    schema = StructType.fromDDL(ds.schema())
    r = _SheetFeedDistStreamReader(schema, {"path": d})

    o0 = r.initialOffset()
    o1 = r.latestOffset()
    assert o1 == {"sheets": 2, "last": "beta.csv"}
    parts = r.partitions(o0, o1)
    assert [p.path.rsplit("/", 1)[-1] for p in parts] == ["alpha.csv", "beta.csv"]
    rows = [t for p in parts for t in r.read(p)]
    assert {t[-1] for t in rows} == {"alpha", "beta"} and len(rows) == 3
    r.commit(o1)

    # new later-sorting sheet → next batch plans exactly it
    (tmp_path / "gamma.csv").write_text("id,name\n9,z\n")
    o2 = r.latestOffset()
    parts2 = r.partitions(o1, o2)
    assert [p.path.rsplit("/", 1)[-1] for p in parts2] == ["gamma.csv"]
    r.commit(o2)

    # out-of-order arrival under the committed offset → loud failure
    (tmp_path / "aaa.csv").write_text("id,name\n0,zz\n")
    with pytest.raises(RuntimeError, match="out of name order"):
        r.latestOffset()

    # replay of a committed range whose files mutated → loud failure
    with pytest.raises(RuntimeError, match="cannot replay"):
        r.partitions(o0, o1)


def test_sheetfeed_dist_streams_all_pending_in_one_batch(spark, tmp_path):
    """Engine integration: the distributed tier delivers every pending
    sheet (parsed executor-side, one partition each) and drains in far
    fewer micro-batches than the one-sheet-per-trigger Simple tier."""
    import time

    from catme_etl_spark.sources.pydatasource import SheetFeedDistDataSource

    d = _write_sheets(tmp_path)
    spark.dataSource.register(SheetFeedDistDataSource)
    q = (
        spark.readStream.format("sheetfeed_dist")
        .load(d)
        .groupBy("_sheet")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("sheetfeed_dist_counts")
        .outputMode("complete")
        .start()
    )
    expected = {"alpha": 2, "beta": 1}
    per_sheet: dict = {}
    deadline = time.time() + 120
    try:
        while time.time() < deadline and per_sheet != expected:
            per_sheet = {
                r._sheet: r.n
                for r in spark.table("sheetfeed_dist_counts").collect()
            }
            time.sleep(0.5)
    finally:
        q.stop()
    assert per_sheet == expected


def test_sheetdir_writer_round_trip_and_manifest(spark, tmp_path):
    """Two-phase-commit sink: write → promoted part files + _SUCCESS
    manifest, no staging residue; reading back through the sheetdir
    source recovers every row (all-string round trip)."""
    import os

    from catme_etl_spark.sources.pydatasource import SheetDirDataSource

    spark.dataSource.register(SheetDirDataSource)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], "id string, name string"
    ).repartition(2)
    df.write.format("sheetdir").mode("overwrite").save(out)

    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part_") and f.endswith(".csv")]
    assert parts and "_SUCCESS" in files
    assert not [f for f in files if f.startswith("_wip_")], "staging residue"
    manifest = open(os.path.join(out, "_SUCCESS")).read().strip().splitlines()
    assert sorted(m.split(",")[0] for m in manifest) == parts
    assert sum(int(m.split(",")[1]) for m in manifest) == 3

    back = spark.read.format("sheetdir").load(out)
    assert {(r.id, r.name) for r in back.collect()} == {
        ("1", "a"), ("2", "b"), ("3", "c")
    }

    # append mode adds files without clobbering
    spark.createDataFrame([("9", "z")], "id string, name string").coalesce(
        1
    ).write.format("sheetdir").mode("append").save(out)
    assert spark.read.format("sheetdir").load(out).count() == 4

    # overwrite replaces everything
    spark.createDataFrame([("7", "q")], "id string, name string").coalesce(
        1
    ).write.format("sheetdir").mode("overwrite").save(out)
    assert {
        (r.id, r.name)
        for r in spark.read.format("sheetdir").load(out).collect()
    } == {("7", "q")}


def test_sheetdir_writer_abort_leaves_target_untouched(tmp_path):
    """abort() (driver-side, after task failure) must remove staging
    and never touch already-published files."""
    import os

    from pyspark.sql.types import StructType

    from catme_etl_spark.sources.pydatasource import _SheetDirWriter

    out = tmp_path / "out"
    out.mkdir()
    (out / "part_00000.csv").write_text("id,name\n1,a\n")

    schema = StructType.fromDDL("id string, name string")
    w = _SheetDirWriter(schema, {"path": str(out)}, overwrite=True)
    msg = w.write(iter([("2", "b")]))  # stages one task file
    assert os.path.exists(msg.staged)
    w.abort([msg, None])
    assert not [f for f in os.listdir(out) if f.startswith("_wip_")]
    assert (out / "part_00000.csv").read_text() == "id,name\n1,a\n"
