"""Round-6 operator surface tests: the capstone training export
delivered through the two-phase-commit sheetdir sink (round-6 item
#6 — `pipeline_dedup_corpus` delivery was proven in round 5; the
artifact a user actually PUBLISHES is the packed-sequence export)."""

from __future__ import annotations

import os


def test_training_export_through_2pc_sink(spark, sf_dir, tmp_path):
    """Commit / append / abort round-trip for the packed-sequences
    deliverable: promoted parts + _SUCCESS manifest row counts equal
    the sequence count, the published table round-trips losslessly, an
    APPEND merges into the manifest without rewriting prior parts, and
    an ABORTED job leaves everything byte-identical."""
    from catme_etl_spark.operators.dedup import pipeline_training_export
    from catme_etl_spark.sources.pydatasource import (
        SheetDirDataSource,
        _SheetDirWriter,
    )

    spark.dataSource.register(SheetDirDataSource)
    out = str(tmp_path / "training_batches")
    export = pipeline_training_export(spark, sf_dir)
    n = export.count()
    assert n > 0
    export.write.format("sheetdir").mode("overwrite").save(out)

    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = [ln for ln in f.read().splitlines() if ln]
    assert sum(int(m.split(",")[1]) for m in manifest) == n

    back = spark.read.format("sheetdir").load(out)
    assert back.count() == n

    # append path: a second (tiny) publish merges into the manifest
    # and does NOT touch the previously promoted parts
    before = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f != "_SUCCESS"
    }
    extra = export.limit(3)
    n_extra = extra.count()
    extra.write.format("sheetdir").mode("append").save(out)
    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest2 = [ln for ln in f.read().splitlines() if ln]
    assert sum(int(m.split(",")[1]) for m in manifest2) == n + n_extra
    after = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    for f, mt in before.items():
        assert after[f] == mt, f"append rewrote published part {f}"
    assert spark.read.format("sheetdir").load(out).count() == n + n_extra

    # abort path: a staged-then-aborted job leaves the published
    # artifact (parts + manifest) byte-identical
    published = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    w = _SheetDirWriter(export.schema, {"path": out}, overwrite=False)
    msg = w.write(iter([tuple(export.first())]))
    assert os.path.exists(msg.staged)
    w.abort([msg, None])
    assert {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    } == published
