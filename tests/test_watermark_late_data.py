"""Late-data watermark semantics (SURVEY §7.4 named risk): inject
synthetic late rows into a staged three-file stream and assert

(a) a late row whose window is still open (within the watermark
    horizon / not yet evicted) is MERGED,
(b) a row arriving after its window was evicted+emitted is DROPPED —
    counted by ``numRowsDroppedByWatermark`` and, critically, the
    sealed window is NOT re-emitted (append-mode emit-once holds),

for both tumbling-window and session-window aggregations — the exact
contract `streaming/jobs.py` builds on.

Measured Spark behavior this pins down (it is subtler than the docs'
short version): input rows are NOT filtered merely for being older
than the watermark — they are dropped only when their window/session
state has already been evicted. Eviction at the end of batch N uses
the watermark computed from batches < N.

Timeline (delay 10 min, tumbling width 10 min):

  file 0 (batch 0): 00:05  00:12  00:43  00:55      → wm after: 00:45
  file 1 (batch 1): 00:44 (late: < wm, but window [00:40,00:50) not
                    yet evicted → MERGED), 01:30 (advances wm to 01:20)
                    eviction at end: [00:00)→1, [00:10)→1 emitted
  file 2 (batch 2): 00:06 (window [00:00,00:10) already sealed →
                    DROPPED, not re-emitted), 02:30 (wm → 02:20)
                    eviction: [00:40)→2, [00:50)→1
  batch 3 (no data): eviction: [01:30)→1; 02:30's window never seals.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F


def _ts(h: int, m: int):
    return dt.datetime(2024, 1, 1, h, m)


_FILES = [
    [(1, 1, _ts(0, 5)), (2, 1, _ts(0, 12)), (3, 1, _ts(0, 43)), (4, 1, _ts(0, 55))],
    [(5, 1, _ts(0, 44)), (6, 1, _ts(1, 30))],
    [(7, 1, _ts(0, 6)), (8, 1, _ts(2, 30))],
]


@pytest.fixture()
def staged_stream(spark, tmp_path):
    """Three parquet files written sequentially (increasing mtimes) so
    maxFilesPerTrigger=1 yields three ordered micro-batches."""
    stage = str(tmp_path / "stream_src")
    for i, rows in enumerate(_FILES):
        spark.createDataFrame(
            rows, "event_id long, uid long, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(f"{stage}/file{i}")
        time.sleep(1.1)  # distinct mtimes → deterministic batch order
    schema = spark.read.parquet(f"{stage}/file0").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )


def _run_append(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in p["stateOperators"]
        )
    finally:
        q.stop()
    return df.sparkSession.table(name), dropped


def test_tumbling_merges_open_window_drops_sealed(spark, staged_stream):
    agg = (
        staged_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out, dropped = _run_append(agg, "wm_tumbling")
    rows = out.collect()
    got = {(r["w"].start.hour, r["w"].start.minute): r["n"] for r in rows}
    # (b) 00:06 arrived after [00:00,00:10) was sealed: dropped, window
    # emitted exactly once with the original count
    assert got[(0, 0)] == 1, got
    assert len(rows) == len(got), "append emitted a window twice"
    assert dropped == 1, f"expected exactly the sealed-window row dropped, got {dropped}"
    # (a) 00:44 was behind the watermark but its window was still open:
    # merged
    assert got[(0, 40)] == 2, got
    # sealed-on-time windows intact; unsealed tail never emitted
    assert got[(0, 10)] == 1 and got[(0, 50)] == 1 and got[(1, 30)] == 1, got
    assert (2, 30) not in got, got


def test_session_window_merges_open_drops_sealed(spark, staged_stream):
    # 5-minute-gap sessions over the same timeline: 00:43+00:44 merge
    # into one session; 00:06 arrives after its would-be session range
    # was sealed and is dropped. (Streaming session windows require a
    # non-window grouping key — uid here, single-valued by design.)
    agg = (
        staged_stream.withWatermark("ts", "10 minutes")
        .groupBy("uid", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out, dropped = _run_append(agg, "wm_session")
    rows = out.collect()
    got = {((r["w"].start.hour, r["w"].start.minute), r["n"]) for r in rows}
    starts = [s for s, _ in got]
    assert len(starts) == len(set(starts)), "append emitted a session twice"
    assert ((0, 5), 1) in got, got  # lone on-time session sealed intact
    assert ((0, 43), 2) in got, got  # late-but-open 00:44 merged
    assert ((0, 12), 1) in got, got
    assert ((0, 55), 1) in got, got
    assert (0, 6) not in starts, got  # sealed-range row dropped
    assert dropped >= 1, "sealed-session row was not dropped"
    assert (2, 30) not in starts, got  # unsealed tail never emitted
