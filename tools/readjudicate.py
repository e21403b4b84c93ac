"""Targeted median-of-3 COLD re-runs for bench adjudication.

Round-12 verdict item #5: 9 names read 1.5-1.8x vs the round-11 record
after canary normalization, adjudicated as host contention. This tool
re-measures exactly those names on a quiet host under the ORIGINAL
cold protocol (clear_shared + clearCache between runs — the protocol
the r11/r12 records were taken under, NOT the round-13 artifact-warm
sweep), so the comparison is like-for-like with the committed record.

Usage:
    python tools/readjudicate.py [--names a,b,c] [--ref BENCH.json]

Prints one JSON line: per-name {median, runs, ref, ratio}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_NAMES = [
    "quality_psi_drift",
    "dedup_minhash_scurve_audit",
    "dedup_lsh_parameter_planner",
    "pipeline_semantic_dedup",
    "stream_latency_alert_daily",
    "tpch_q5_local_supplier_volume",
    "stream_drift_gate",
    "agg_cms_heavy_hitters",
    "sim_srp_lsh_pairs",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=",".join(DEFAULT_NAMES))
    ap.add_argument("--ref", default=None, help="bench json with queries{}")
    args = ap.parse_args()

    import __spark_entry__ as e
    from catme_etl_spark.operators._shared import clear_shared
    from catme_etl_spark.session import get_spark

    spark = get_spark("readjudicate")
    qs = e.queries()
    names = [n for n in args.names.split(",") if n in qs]

    ref = {}
    if args.ref:
        ref = json.load(open(args.ref)).get("queries", {})

    def cold(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        clear_shared()
        spark.catalog.clearCache()
        return el

    # one warm pass at sf0.001 for codegen/JIT, as bench does
    for n in names:
        try:
            clear_shared()
            qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    clear_shared()
    spark.catalog.clearCache()

    out = {}
    for n in names:
        runs = sorted(round(cold(n), 3) for _ in range(3))
        med = runs[1]
        r = ref.get(n)
        out[n] = {
            "median": med,
            "runs": runs,
            "ref": r,
            "ratio": round(med / r, 3) if r else None,
        }
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))


if __name__ == "__main__":
    main()
