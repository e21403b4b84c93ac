"""Round-4 fixes pinned by tests: the incremental-dedup broadcast is
budget-ENFORCED (not assumed small), and an engine-less legacy-.xls
read surfaces as ImportError (missing dependency), never ValueError
(garbage input)."""

from __future__ import annotations

import pytest

import __spark_entry__ as e

SF0001 = "/root/testdata/sf0.001"


def test_incremental_dedup_over_budget_raises(spark, monkeypatch):
    """With the collect budget forced below the new batch's band-key
    count, the incremental path must fail loudly BEFORE broadcasting,
    naming the partitioned probe-join fallback — not OOM executors."""
    from catme_etl_spark.operators import _shared

    monkeypatch.setattr(_shared, "MAX_COLLECT_ROWS", 1)
    with pytest.raises(ValueError, match="partitioned shuffle join"):
        e.queries()["dedup_minhash_incremental"](spark, SF0001).collect()


def test_cc_labels_reliable_checkpoint_equals_local(spark, tmp_path):
    """The setCheckpointDir-backed label-propagation tier must produce
    exactly the localCheckpoint labels (same algorithm, durable
    commits), and must actually write reliable checkpoint state to
    disk — the restart-survivable artifact localCheckpoint lacks."""
    import os

    from catme_etl_spark.operators.dedup import cc_labels_reliable

    qs = e.queries()
    local = {
        (r.doc_id, r.component)
        for r in qs["dedup_connected_components"](spark, SF0001).collect()
    }
    ckdir = str(tmp_path / "cc_ck")
    durable = {
        (r.doc_id, r.component)
        for r in cc_labels_reliable(spark, SF0001, ckdir).collect()
    }
    assert durable == local
    on_disk = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckdir) for f in fs
    ]
    assert on_disk, "reliable checkpoint wrote no files to disk"


def test_engineless_non_zip_excel_raises_importerror(tmp_path, monkeypatch):
    """A non-zip workbook (legacy .xls layout) with no Excel engine
    must raise ImportError ('install an engine'): the stdlib fallback
    only parses zip/OOXML, so reporting ValueError would misclassify a
    perfectly valid file as garbage."""
    import pandas as pd

    from catme_etl_spark.sources import files

    xls = tmp_path / "legacy.xls"
    xls.write_bytes(b"\xd0\xcf\x11\xe0" + b"\x00" * 64)  # CFB magic, not zip

    def no_engine(*a, **k):
        raise ImportError("Missing optional dependency 'openpyxl'")

    monkeypatch.setattr(pd, "ExcelFile", no_engine)
    monkeypatch.setattr(pd, "read_excel", no_engine)

    with pytest.raises(ImportError, match="install openpyxl"):
        files.validate_excel(str(xls))
    with pytest.raises(ImportError, match="install openpyxl"):
        files._read_excel_pandas(str(xls))

    # a zip payload still reaches the stdlib fallback path
    import zipfile

    fake = tmp_path / "fake.xlsx"
    with zipfile.ZipFile(fake, "w") as z:
        z.writestr("dummy.txt", "not a real workbook")
    with pytest.raises(ValueError):  # fallback runs, rejects content
        files.validate_excel(str(fake))


def test_clear_shared_frees_localcheckpoint_blocks(spark):
    """DataFrame.unpersist() does not free localCheckpoint RDD blocks;
    the cache tracks the checkpointed RDD ids and must unpersist them
    on clear — otherwise repeated bench clears accumulate orphaned
    MEMORY_AND_DISK blocks for the session's lifetime."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators import _shared

    def build():
        return spark.range(1000).select(
            "id", F.md5(F.col("id").cast("string")).alias("h")
        )

    df = _shared.shared_df("ck_leak_probe", "x", spark, build, materialize=True)
    df.count()  # materialize the checkpoint blocks
    ids_before = _shared._persistent_rdd_ids(spark)
    tracked = set().union(*_shared._CK_RDD_IDS.values()) if _shared._CK_RDD_IDS else set()
    assert tracked & ids_before, "checkpointed RDD ids were not tracked"

    _shared.clear_shared()
    ids_after = _shared._persistent_rdd_ids(spark)
    assert not (tracked & ids_after), (
        "localCheckpoint blocks survived clear_shared(): "
        f"{sorted(tracked & ids_after)}"
    )
