"""Simulates the driver: foreign SparkSession (non-UTC tz!), entry() smoke,
queries() vs oracle_sql() hash compare at sf0.01."""
import sys, hashlib
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

qs, os_ = e.queries(), e.oracle_sql()
print("keys:", list(qs))
for k, fn in qs.items():
    spdf = fn(spark, sf).toPandas()
    if k in os_:
        dpdf = con.sql(os_[k]).df()
        hs, hd = h(spdf), h(dpdf)
        status = "MATCH" if hs == hd else "MISMATCH"
        print(f"{k}: spark={len(spdf)}r {hs} duck={len(dpdf)}r {hd} -> {status}")
        assert hs == hd, k
    else:
        print(f"{k}: rows-only {len(spdf)}r")
print("DRIVER-SIM OK")
