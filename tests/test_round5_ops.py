"""Round-5 operators: the composed end-to-end dedup pipeline and its
delivery through the 2PC sheetdir sink.

`pipeline_dedup_corpus` is the certified COMPOSITION of the
individually-certified stages (SimHash pairs → CC labels → quality
argmax → metadata rejoin); these tests pin the set-level invariants the
oracle hash can't express directly, then prove the deliverable survives
the two-phase-commit write path (and that an aborted job leaves a
previously-published corpus untouched).
"""

from __future__ import annotations

import os


def test_pipeline_dedup_corpus_invariants(spark, sf_dir):
    from catme_etl_spark.operators.dedup import (
        dedup_cluster_representatives,
        dedup_connected_components,
        pipeline_dedup_corpus,
    )

    out = pipeline_dedup_corpus(spark, sf_dir).persist()
    labels = dedup_connected_components(spark, sf_dir)

    # exactly one survivor per component, and survivors are real docs
    n_components = labels.select("component").distinct().count()
    assert out.count() == n_components
    assert out.select("component").distinct().count() == n_components

    # multi-doc clusters' survivors are exactly the representatives
    reps = {
        r.rep_doc_id
        for r in dedup_cluster_representatives(spark, sf_dir).collect()
    }
    multi = {r.doc_id for r in out.filter(out.csize >= 2).collect()}
    assert multi == reps

    # singletons survive as themselves: survivors + dropped = corpus
    n_docs = labels.count()
    dropped = (
        out.groupBy().sum("csize").first()[0] - out.count()
    )
    assert out.count() + dropped == n_docs
    out.unpersist()


def test_pipeline_dedup_corpus_through_2pc_sink(spark, sf_dir, tmp_path):
    """The deliverable writes through the two-phase-commit sheetdir
    sink: promoted parts + _SUCCESS manifest whose row counts equal the
    survivor count, round-trips losslessly, and a later ABORTED job
    leaves the published corpus byte-identical."""
    from catme_etl_spark.operators.dedup import pipeline_dedup_corpus
    from catme_etl_spark.sources.pydatasource import (
        SheetDirDataSource,
        _SheetDirWriter,
    )

    spark.dataSource.register(SheetDirDataSource)
    out = str(tmp_path / "corpus")
    survivors = pipeline_dedup_corpus(spark, sf_dir)
    n = survivors.count()
    survivors.write.format("sheetdir").mode("overwrite").save(out)

    with open(os.path.join(out, "_SUCCESS")) as f:
        manifest = [ln for ln in f.read().splitlines() if ln]
    assert sum(int(m.split(",")[1]) for m in manifest) == n

    back = spark.read.format("sheetdir").load(out)
    assert back.count() == n
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        str(r.doc_id) for r in survivors.select("doc_id").collect()
    }

    # abort path: a failed follow-up job stages, aborts, and the
    # published corpus (files + manifest) is untouched
    published = {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }
    w = _SheetDirWriter(survivors.schema, {"path": out}, overwrite=True)
    msg = w.write(iter([tuple(survivors.first())]))
    assert os.path.exists(msg.staged)
    w.abort([msg, None])
    assert {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    } == published
