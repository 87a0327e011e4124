"""Simulates the driver: foreign SparkSession (non-UTC tz!), entry() smoke,
queries() vs oracle_sql() hash compare at sf0.01.

Usage: driver_sim.py [limit] [offset] — sweep keys [offset, offset+limit)
in registration order (the driver records the first 50, so `50 0` mirrors
what a real round will grade). Alternatively pass explicit key names:
driver_sim.py key1 key2 ... — sweep exactly those keys.
"""
import sys, hashlib, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
import duckdb, pandas as pd

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "America/New_York")  # hostile tz
         .config("spark.ui.enabled", "false").getOrCreate())

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("entry() rows:", len(rows))
assert len(rows) > 0

sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def h(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(repr(tuple(r)) for r in pdf[cols].itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]

def canon_check(k, pdf):
    """Mimic the REAL driver's canonicalizer: pandas sort_values over every
    column. Array/map cells raise `TypeError: unhashable type` there — the
    exact failure that turned embed_pca_project red in round 4 (and
    agg_collect in round 1) — so crash HERE, pre-commit, instead."""
    try:
        pdf.sort_values(by=sorted(pdf.columns))
    except TypeError as ex:
        raise AssertionError(
            f"{k}: output not driver-canonicalizable (non-scalar cell?): {ex}"
        ) from ex

qs, os_ = e.queries(), e.oracle_sql()
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    keys = sys.argv[1:]
    missing = [k for k in keys if k not in qs]
    assert not missing, f"unknown keys: {missing}"
else:
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else len(qs)
    offset = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    keys = list(qs)[offset:offset + limit]
print(f"keys ({len(keys)} of {len(qs)}):", keys)
t_all = time.monotonic()
for k in keys:
    t0 = time.monotonic()
    spdf = qs[k](spark, sf).toPandas()
    canon_check(k, spdf)
    if k in os_:
        dpdf = con.sql(os_[k]).df()
        hs, hd = h(spdf), h(dpdf)
        status = "MATCH" if hs == hd else "MISMATCH"
        print(f"{k}: spark={len(spdf)}r {hs} duck={len(dpdf)}r {hd} -> {status}"
              f" [{time.monotonic() - t0:.1f}s]")
        assert hs == hd, k
    else:
        print(f"{k}: rows-only {len(spdf)}r [{time.monotonic() - t0:.1f}s]")
print(f"DRIVER-SIM OK ({len(keys)} keys, {time.monotonic() - t_all:.1f}s)")
