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


def test_round5_plan_shapes(spark, sf_dir):
    """Pin the round-5 operators' physical-plan shapes so regressions
    are test-visible (the round-4 pattern):

    - text_boilerplate_chunks: narrow explode + two cascaded hash-aggs
      — exactly 2 shuffles, no joins of any kind.
    - sim_centroid_assign_audit: broadcast-centroid Arrow pass + final
      pair-count agg — no joins; at most 2 shuffles (fan_out at test
      scale + the agg; at cluster parallelism fan_out is a no-op).
    - pipeline_dedup_corpus: post-checkpoint composition — the label
      snapshot join + survivor argmax stay within 3 shuffles and never
      nest-loop.
    """
    import re

    from catme_etl_spark.operators.dedup import pipeline_dedup_corpus
    from catme_etl_spark.operators.similarity import (
        sim_centroid_assign_audit,
    )
    from catme_etl_spark.operators.text import text_boilerplate_chunks
    from catme_etl_spark.plans.explain import (
        count_shuffles,
        executed_plan_str,
    )

    bp = text_boilerplate_chunks(spark, sf_dir)
    plan = executed_plan_str(bp)
    assert count_shuffles(bp) == 2, executed_plan_str(bp)[:2000]
    assert not re.search(r"Join|CartesianProduct", plan), plan[:2000]

    ca = sim_centroid_assign_audit(spark, sf_dir)
    plan = executed_plan_str(ca)
    assert count_shuffles(ca) <= 2, plan[:2000]
    assert not re.search(r"Join|CartesianProduct", plan), plan[:2000]

    pd_ = pipeline_dedup_corpus(spark, sf_dir)
    plan = executed_plan_str(pd_)
    assert count_shuffles(pd_) <= 3, plan[:2000]
    assert not re.search(
        r"BroadcastNestedLoopJoin|CartesianProduct", plan
    ), plan[:2000]


def test_attribution_conserves_pennies(spark, sf_dir):
    """The penny-allocation ledger's defining invariant: credited cents
    across all clicks exactly equal the total cents of every purchase
    that had >= 1 click in its 30-min window — no 1/n float crumbs
    created or lost at any parallelism."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.rangejoin import (
        banded_interval_join,
        events_attribution_linear,
    )
    from catme_etl_spark.sources.tables import load_table

    out = events_attribution_linear(spark, sf_dir)
    credited_cents = int(
        round(out.agg(F.sum("attributed_value")).first()[0] * 100)
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(ev.event_type == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(ev.event_type == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    attributed = (
        banded_interval_join(
            clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
            max_delta_us=1_800_000_000,
        )
        .filter(
            (F.unix_micros(F.col("ts_r")) - F.unix_micros(F.col("ts")))
            .between(0, 1_800_000_000)
        )
        .select("purchase_id", "cents")
        .distinct()
    )
    expected_cents = attributed.agg(F.sum("cents")).first()[0]
    assert credited_cents == expected_cents > 0


def test_attribution_penny_ledger_edge_cases(spark, tmp_path):
    """Crafted corner cases for the ledger and the window boundary:
    cents < n_clicks (floor = 0, remainder cents go to the EARLIEST
    clicks), a purchase with no clicks credits nothing, a click after
    the purchase is excluded, and a click exactly 30 minutes before is
    included."""
    import datetime as dt

    from pyspark.sql import functions as F

    from catme_etl_spark.operators.rangejoin import events_attribution_linear

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: purchase of $0.03 at t+30 with 5 clicks -> credits
        # 1,1,1,0,0 cents by click order; includes the exact-30-min
        # boundary click at t+0
        (101, ts(0), 1, "click", 0.0, "{}"),
        (102, ts(5), 1, "click", 0.0, "{}"),
        (103, ts(10), 1, "click", 0.0, "{}"),
        (104, ts(15), 1, "click", 0.0, "{}"),
        (105, ts(20), 1, "click", 0.0, "{}"),
        (106, ts(30), 1, "purchase", 0.03, "{}"),
        # user 2: purchase with no prior clicks -> no credit anywhere
        (201, ts(40), 2, "purchase", 10.0, "{}"),
        # user 3: click AFTER the purchase -> excluded
        (301, ts(50), 3, "purchase", 5.0, "{}"),
        (302, ts(51), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = events_attribution_linear(spark, str(tmp_path)).collect()
    # only user 1's clicks are credited; all fall in the 12:00 hour
    assert len(out) == 1
    [row] = out
    assert row.n_credited_clicks == 5
    assert round(row.attributed_value * 100) == 3  # all 3 cents, no more


def test_pipeline_dedup_ingest_partition(spark, sf_dir):
    """Ingest admission is a partition of the batch: every new doc is
    either admitted or has a qualifying near-dup pair naming it
    rejected; no doc is both; corpus docs never appear."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        pipeline_dedup_ingest,
    )
    from catme_etl_spark.sources.tables import load_table

    admitted = {
        r.doc_id for r in pipeline_dedup_ingest(spark, sf_dir).collect()
    }
    batch = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 9)
        .select("doc_id")
        .collect()
    }
    assert admitted <= batch
    pairs = dedup_minhash_incremental(spark, sf_dir).collect()
    rejected = set()
    for p in pairs:
        a_new, b_new = p.doc_a % 10 == 9, p.doc_b % 10 == 9
        rejected.add(p.doc_a if (a_new and not b_new) else p.doc_b)
    rejected &= batch
    assert admitted | rejected == batch
    assert admitted & rejected == set()


def test_sealed_session_watermark_boundary(spark, tmp_path):
    """Pins the exact boundary the stream_session_sealed oracle
    assumes: a session whose Spark window end (last event + 30 min)
    equals the final watermark (max ts − 1 h) EXACTLY is emitted
    (Spark seals on end <= watermark); a session ending 5 minutes past
    the watermark is not. The sf test data never lands on the
    boundary, so this crafted table is what actually certifies the
    oracle's `<=`."""
    import datetime as dt

    from catme_etl_spark.streaming.jobs import stream_session_sealed

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, ts(0), 1, "click", 0.0, "{}"),  # end t0+30 == watermark
        (2, ts(5), 2, "click", 0.0, "{}"),  # end t0+35 > watermark
        (3, ts(90), 3, "click", 0.0, "{}"),  # max ts → watermark t0+30
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = stream_session_sealed(spark, str(tmp_path)).collect()
    assert sorted((r.user_id, r.n_events) for r in out) == [(1, 1)]


def test_session_gap_boundary(spark, tmp_path):
    """Gap semantics both engines must agree on — MEASURED, not
    assumed: Spark's session windows merge when they overlap OR TOUCH,
    so two events exactly 30 minutes apart share ONE session; only a
    gap strictly greater than the timeout starts a new one. (This test
    caught the oracles' original `>= 30 MINUTE` island break — wrong
    at the boundary, invisible in the boundary-free sf data — now
    fixed to `>` in events.py and streaming/jobs.py.) The oracle SQL
    must agree, so the same crafted table is also run through DuckDB."""
    import datetime as dt

    import duckdb

    from catme_etl_spark.operators.events import events_session_30min
    from catme_etl_spark.operators.registry import ORACLE

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: exactly 30 min apart -> ONE session (touching merges)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
        # user 2: 30m01s apart -> TWO sessions
        (3, t0, 2, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=30, seconds=1), 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    out = events_session_30min(spark, str(tmp_path)).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert per_user[1] == [2]
    assert sorted(per_user[2]) == [1, 1]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = {
        (u, n)
        for u, _, n, _ in con.execute(ORACLE["events_session_30min"]).fetchall()
    }
    assert oracle == {(r.user_id, r.n_events) for r in out}


def test_runtime_bloom_filter_join_pruning(spark):
    """The 100 TB shuffle-join dial the SCALING.md joins section cites:
    with a selective creation side, Catalyst injects a bloom filter
    (bloom_filter_agg / might_contain) on the fact side of a shuffle
    join, pruning rows BEFORE the exchange. Thresholds are sized for
    clusters (application side >= 10 GB), so the test lowers them to
    demonstrate the mechanism and asserts results are unchanged."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    o = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    join = lambda: li.join(o, li.l_orderkey == o.o_orderkey)  # noqa: E731

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": (
            "100MB"
        ),
    }
    prev = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            join().explain(mode="extended")
        plan = buf.getvalue()
        assert "bloom_filter" in plan or "might_contain" in plan, (
            "no runtime bloom filter injected"
        )
        n_pruned = join().count()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert n_pruned == join().count() > 0


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
