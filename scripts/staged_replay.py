#!/usr/bin/env python
"""Staged-key replay harness — the pre-registration gate the r11/r12
staging doctrine requires for every parked key, runnable in one shot:

  1. hostile-TZ replay: a foreign America/New_York session through
     prep(), Spark vs DuckDB hash at the GRADING scale (sf0.01);
  2. ANSI-off replay: same comparison with spark.sql.ansi.enabled=false
     (a fresh session — the conf is immutable mid-session for ANSI);
  3. sf0.1 noop: run the key at 10x the oracle scale through a noop
     sink and report wall time against the scale-sweep budget.

Usage: staged_replay.py [--ansi-off] [--sf01] module:function ...
  e.g. staged_replay.py timeseries:events_capture_recapture \
       aggregates:agg_confusion_mcc
The oracle constant is resolved from the STAGED maps in the
tests/test_staged_*.py files (falls back to skipping the hash compare
for oracle-less keys like ts_dtw_distance).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def find_oracle(key: str):
    """Pull the staged oracle for `key` from the tests' STAGED maps."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    for path in sorted(glob.glob("tests/test_staged_*.py")):
        mod = path.replace("/", ".")[:-3]
        try:
            m = importlib.import_module(mod)
        except Exception:
            continue
        staged = getattr(m, "STAGED", {})
        if key in staged:
            entry = staged[key]
            return entry[1] if isinstance(entry, tuple) else None
    return None


def value_hash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        repr(tuple(r))
        for r in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+", help="module:function, e.g. "
                    "timeseries:events_capture_recapture")
    ap.add_argument("--ansi-off", action="store_true",
                    help="run with spark.sql.ansi.enabled=false")
    ap.add_argument("--sf01", action="store_true",
                    help="also time an sf0.1 noop run per key")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    if args.ansi_off:
        b = b.config("spark.sql.ansi.enabled", "false")
    spark = b.getOrCreate()
    from trireme_spark.session import prep

    prep(spark)
    mode = "ANSI-OFF" if args.ansi_off else "hostile-TZ"

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    fails = 0
    for spec in args.keys:
        modname, fname = spec.split(":")
        mod = importlib.import_module(f"trireme_spark.queries.{modname}")
        fn = getattr(mod, fname)
        oracle = find_oracle(fname)
        t0 = time.time()
        sp = fn(spark, sf).toPandas()
        dt = time.time() - t0
        if oracle:
            du = con.sql(oracle).df()
            ok = len(sp) == len(du) and value_hash(sp) == value_hash(du)
            print(f"{fname} [{mode}]: spark={len(sp)}r duck={len(du)}r "
                  f"-> {'MATCH' if ok else 'MISMATCH'} [{dt:.1f}s]")
            fails += 0 if ok else 1
        else:
            h1 = value_hash(sp)
            h2 = value_hash(fn(spark, sf).toPandas())
            ok = h1 == h2
            print(f"{fname} [{mode}]: rows-only {len(sp)}r "
                  f"{'deterministic' if ok else 'NONDETERMINISTIC'} "
                  f"[{dt:.1f}s]")
            fails += 0 if ok else 1
        if args.sf01:
            t0 = time.time()
            fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"  sf0.1 noop: {time.time() - t0:.1f}s")
    print("REPLAY", "FAIL" if fails else "OK")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
