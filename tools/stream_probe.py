"""Measure where streaming harness time goes (optimization r14, guide §1).

Runs a representative stream query once at the given SF and prints the
per-micro-batch ``durationMs`` breakdown from the StreamingQuery
progress events (triggerExecution = addBatch + walCommit +
commitOffsets + getBatch + latestOffset + queryPlanning), so the fixed
harness overhead (offset/commit WAL fsyncs, state store commits,
planning) is separated from the query's own compute. Evidence feeds
OPTIMIZATION_r14.md; not part of the bench contract.

Usage: python tools/stream_probe.py [--sf /root/testdata/sf0.1] [--name stream_tumbling_10min]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--name", default="stream_tumbling_10min")
    args = ap.parse_args()

    import __spark_entry__ as e
    from catme_etl_spark.session import get_spark
    from catme_etl_spark.streaming import jobs

    spark = get_spark("stream_probe")
    qs = e.queries()

    progress: list[dict] = []
    orig = jobs._run_to_memory

    def probed(df, mode):
        spark_ = df.sparkSession
        name = f"probe_sink_{int(time.time() * 1000)}"
        prev = spark_.conf.get("spark.sql.shuffle.partitions")
        spark_.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                for p in q.recentProgress:
                    progress.append(
                        {
                            "batchId": p["batchId"],
                            "numInputRows": p["numInputRows"],
                            "durationMs": p["durationMs"],
                            "stateOperators": [
                                {
                                    k: so.get(k)
                                    for k in (
                                        "numRowsTotal",
                                        "commitTimeMs",
                                        "stateMemory",
                                    )
                                }
                                for so in p.get("stateOperators", [])
                            ],
                        }
                    )
            finally:
                q.stop()
        finally:
            spark_.conf.set("spark.sql.shuffle.partitions", prev)
        return spark_.table(name)

    jobs._run_to_memory = probed
    try:
        t0 = time.time()
        df = qs[args.name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
    finally:
        jobs._run_to_memory = orig

    print(json.dumps({"name": args.name, "wall_s": round(wall, 3)}))
    tot = {}
    for p in progress:
        print(json.dumps(p))
        for k, v in p["durationMs"].items():
            tot[k] = tot.get(k, 0) + v
    print(json.dumps({"sum_durationMs": tot}))


if __name__ == "__main__":
    main()
