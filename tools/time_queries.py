"""Quick per-query timing loop for optimization iteration (guide §1.4).

Times each named query with the same methodology as bench.py (noop
sink, cold runs after clear_shared on request) but without the full
headline sweep — for tight before/after loops on a subset. NOT a
record: the committed before/after evidence stays bench.py's.

Usage:
    python tools/time_queries.py [--sf /root/testdata/sf0.1] [--runs 2]
        [--artifact-warm] name1,name2,...
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--artifact-warm",
        action="store_true",
        help="one untimed run first so shared artifacts are warm",
    )
    ap.add_argument("names")
    args = ap.parse_args()

    import __spark_entry__ as e
    from catme_etl_spark.session import get_spark
    from catme_etl_spark.operators._shared import clear_shared

    spark = get_spark("time_queries")
    qs = e.queries()
    names = args.names.split(",")

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    out = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        # JIT/codegen warm-up at sf0.001 (bench.py convention)
        clear_shared()
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
        if args.artifact_warm:
            run(name)  # untimed: builds shared artifacts at SF
        samples = [round(run(name), 3) for _ in range(args.runs)]
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min": round(sum(v["min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
