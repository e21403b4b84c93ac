"""Adopt a round's local bench record from the three detached runs.

Round-11 verdict "What's wrong #1": batch entries are stable across the
three protocol runs, but `stream_*` entries are micro-batch
fixed-overhead readings with up to 1.6x spread on identical code — a
single adopted run makes round-over-round streaming deltas
unadjudicable at the ±50% level. The fix: the adopted record is the
chosen base run with every `stream_*` entry (raw AND normalized)
replaced by its per-entry MEDIAN across the three runs, and the
headline totals recomputed from the merged per-query values.

    python tools/bench_adopt.py --base run3.json --runs run1.json run2.json \
        --out BENCH_r12_local.json

Batch entries stay the base run's readings (they agree across runs; a
median would only launder a hot host into every number — host health is
adjudicated per-run BEFORE choosing the base, not averaged away here).
The output carries a `protocol` field naming the merge so the judge can
see which entries are medians.
"""

from __future__ import annotations

import argparse
import json
import statistics


def merge(base: dict, others: list[dict]) -> dict:
    runs = [base] + others
    out = dict(base)
    out["queries"] = dict(base["queries"])
    out["queries_normalized"] = dict(base.get("queries_normalized", {}))
    medianed = []
    for name in base["queries"]:
        if not name.startswith("stream_"):
            continue
        raw = [r["queries"][name] for r in runs if name in r.get("queries", {})]
        if len(raw) < 2:
            continue  # new entry absent from earlier runs — keep base
        out["queries"][name] = round(statistics.median(raw), 3)
        norm = [
            r["queries_normalized"][name]
            for r in runs
            if name in r.get("queries_normalized", {})
        ]
        if len(norm) == len(raw):
            out["queries_normalized"][name] = round(
                statistics.median(norm), 3
            )
        medianed.append(name)
    out["value"] = round(sum(out["queries"].values()), 3)
    if out.get("queries_normalized"):
        out["normalized_total"] = round(
            sum(out["queries_normalized"].values()), 3
        )
    out["protocol"] = (
        f"base run + per-entry median-of-{len(runs)} for {len(medianed)} "
        "stream_* entries (round-11 verdict item #3); batch entries are "
        "the base run's readings"
    )
    out["medianed_entries"] = sorted(medianed)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True, help="adopted base run JSON")
    ap.add_argument("--runs", nargs="+", required=True,
                    help="the other detached runs to median stream_* over")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    base = json.load(open(args.base))
    others = [json.load(open(p)) for p in args.runs]
    rec = merge(base, others)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(
        f"adopted {args.out}: {len(rec['medianed_entries'])} stream_* "
        f"entries medianed, total {rec['value']}s "
        f"(base {base['value']}s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
