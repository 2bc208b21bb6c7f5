"""A/B the four unexplained r9->r10 bench deltas (VERDICT r10 #3) on a
fresh idle-host session with min-of-N timing.

None of the four queries' code changed in r10; the single-shot readings
moved (events_max_drawdown 0.32->0.91, events_hll_merge 0.49->0.98,
events_ema_sequential 1.06->2.00, doc_bpe_train_rounds 3.03->5.33).
Protocol: one fresh session, bench-identical confs + warm stage, then
each query x5, report min/median — compared against the r9 band.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from meerschaum_spark.session import apply_engine_confs

QUERIES = ["events_max_drawdown", "events_hll_merge",
           "events_ema_sequential", "doc_bpe_train_rounds"]
R9 = {"events_max_drawdown": 0.32, "events_hll_merge": 0.49,
      "events_ema_sequential": 1.06, "doc_bpe_train_rounds": 3.03}
R10 = {"events_max_drawdown": 0.91, "events_hll_merge": 0.98,
       "events_ema_sequential": 2.00, "doc_bpe_train_rounds": 5.33}

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
apply_engine_confs(spark)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

qs = e.queries()
sf = "/root/testdata/sf0.1"
# bench-style warm: touch the base tables these queries read
from meerschaum_spark.sources import load_table
for t_ in ("events", "documents"):
    load_table(spark, sf, t_).count()

out = {}
for name in QUERIES:
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        qs[name](spark, sf).count()
        ts.append(round(time.perf_counter() - t0, 3))
    ts_sorted = sorted(ts)
    out[name] = {"runs": ts, "min": ts_sorted[0],
                 "median": ts_sorted[2],
                 "r9_single": R9[name], "r10_single": R10[name],
                 "verdict": ("noise" if ts_sorted[0] <= R9[name] * 1.5
                             else "real")}
print(json.dumps(out, indent=1))
