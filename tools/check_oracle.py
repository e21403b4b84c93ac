"""Local replica of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, column names/order-insensitive values. Use while
iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize values to strings, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.dt.tz_localize(None).astype("datetime64[us]").astype(str)
        else:
            df[c] = col.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(df.columns) + "\n").encode())
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(map(str, row)) + "\n").encode())
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--pending",
        action="store_true",
        help="check the registry.pending_query round-(N+1) debut queue "
        "instead of the live registry — the pre-deferral evidence that "
        "flipping a queued name to @query next round will certify",
    )
    args = ap.parse_args()

    import __spark_entry__ as e
    from catme_etl_spark.session import get_spark

    # Suppress stage-progress bars: their \r frames clobber OK lines in
    # captured transcripts (round-8 verdict: FULL_SWEEP footer said 273
    # but only 263 OK lines survived the carriage returns).
    spark = get_spark(
        "check_oracle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    if args.pending:
        from catme_etl_spark.operators.registry import PENDING, PENDING_ORACLE

        qs, oracles = dict(PENDING), dict(PENDING_ORACLE)
    else:
        qs = e.queries()
        oracles = e.oracle_sql()
    names = list(qs) if not args.only else args.only.split(",")

    failures, rows_only = [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        sc, oc = _canon(sdf), _canon(odf)
        if list(sc.columns) != list(oc.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(sc.columns)} != {list(oc.columns)}")
            continue
        if len(sc) != len(oc):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(sc)} != {len(oc)}")
            continue
        hs, ho = _hash(sc), _hash(oc)
        if hs != ho:
            failures.append(name)
            print(f"FAIL  {name}: value hash mismatch")
            diff = sc.compare(oc) if sc.shape == oc.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
        else:
            print(f"OK    {name}: {len(sc)} rows hash={hs} [{time.time()-t0:.1f}s]")

    print(
        f"\n{len(names) - len(failures)}/{len(names)} passing"
        f" ({len(rows_only)} rows-only: {rows_only})"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
