"""10× scale verification: execute EVERY registered key's Spark side at
sf0.1 (10× the driver's oracle scale) through the noop sink and flag
stragglers.

This is the sweep that catches plans which are correct-but-quadratic —
they pass the sf0.01 oracle gate and then blow up at scale (it found the
O(n²) UnboundedFollowing frame and the O(n·frame) global sliding RANGE
frame in round 2). Run it after adding any operator:

    python scripts/scale_sweep.py            # default /root/testdata/sf0.1
    SCALE_SWEEP_SF=/root/testdata/sf0.01 python scripts/scale_sweep.py

Exits nonzero if any key fails or exceeds the per-key budget.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

BUDGET_S = float(os.environ.get("SCALE_SWEEP_BUDGET_S", "10"))
SF_DIR = os.environ.get("SCALE_SWEEP_SF", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e  # noqa: E402

qs = e.queries()
t0 = time.time()
slow, fails = [], []
for k, fn in qs.items():
    t1 = time.time()
    try:
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    except Exception as ex:  # noqa: BLE001 - report and continue the sweep
        fails.append((k, f"{type(ex).__name__}: {str(ex)[:200]}"))
        continue
    dt = time.time() - t1
    if dt > BUDGET_S:
        slow.append((k, round(dt, 1)))

print(f"TOTAL {time.time() - t0:.1f}s for {len(qs)} keys at {SF_DIR}")
for k, msg in fails:
    print(f"FAIL {k}: {msg}")
for k, dt in slow:
    print(f"SLOW {k}: {dt}s (budget {BUDGET_S}s)")
if not fails and not slow:
    print("SCALE-SWEEP OK")
sys.exit(1 if (fails or slow) else 0)
