"""CLI entry point — the engine's equivalent of the reference's
``__main__`` flow (`unified_code.py:481-583`), flags-for-prompts:

    python -m catme_etl_spark.cli --input Input/ --output Output/result \\
        --csv-separator ';' --output-mode merge --test-mode

Differences by design: the reference asks interactively before the test
and full runs (`unified_code.py:509-512,547-550`); a cluster job can't
prompt, so ``--test-mode`` is an explicit flag and the full run is the
default. ``--workers`` is accepted for parity but maps to Spark's
scheduler (local[N] / executor cores), not a process pool
(`unified_code.py:406,425`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="catme-etl-spark", description=__doc__)
    # flags mirror `unified_code.py:482-487`
    p.add_argument("--input", required=True, help="input file or directory")
    p.add_argument("--output", required=True, help="output path (dir for chunks)")
    p.add_argument("--chunk-size", type=int, default=500,
                   help="rows per chunk in test mode (default 500)")
    p.add_argument("--workers", type=int, default=None,
                   help="parallelism hint; maps to local[N]")
    p.add_argument("--csv-separator", default=",")
    p.add_argument("--output-mode", choices=["merge", "chunks"], default="merge",
                   help="one file vs part files (Archive --output-mode)")
    p.add_argument("--test-mode", action="store_true",
                   help="process only the first 3 chunks")
    p.add_argument("--test-then-full", action="store_true",
                   help="non-interactive version of the reference's "
                        "test-run → confirm → full-run flow: run test "
                        "mode to <output>.test first, print its stats, "
                        "then run the full conversion")
    p.add_argument("--order-by", default=None,
                   help="comma-separated explicit output ordering")
    p.add_argument("--array-parity", action="store_true",
                   help="also write the reference's single-JSON-array format")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .convert import convert
    from .session import get_spark

    master = f"local[{args.workers}]" if args.workers else None
    spark = get_spark("catme-etl-spark-cli", master=master)
    # Resolve directory inputs BEFORE deciding reader kwargs: discovery
    # prefers *.xlsx over *.csv (`unified_code.py:493-496`), and
    # read_excel takes no `sep` — only a resolved .csv gets the
    # separator.
    if os.path.isdir(args.input):
        from .sources.files import discover_input

        input_path = discover_input(args.input)
    else:
        input_path = args.input
    kwargs = {}
    if input_path.endswith(".csv"):
        kwargs["sep"] = args.csv_separator
    common = dict(
        chunk_size=args.chunk_size,
        output_mode=args.output_mode,
        order_by=args.order_by.split(",") if args.order_by else None,
        array_parity=args.array_parity,
        **kwargs,
    )
    if args.test_then_full:
        # reference flow (`unified_code.py:509-525,547-581`) without the
        # interactive confirms: test-run stats go to stdout first, so a
        # wrapper script (or a human watching logs) can abort between
        # the runs; the checkpoint-free full run starts from scratch
        # exactly like the reference's clear-checkpoints restart.
        test = convert(spark, input_path, args.output + ".test",
                       test_mode=True, **common)
        print(json.dumps({"phase": "test", "rows": test.rows,
                          "output": test.output_path, **test.stats}))
    res = convert(
        spark,
        input_path,
        args.output,
        test_mode=args.test_mode,
        **common,
    )
    print(json.dumps({"rows": res.rows, "output": res.output_path, **res.stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
