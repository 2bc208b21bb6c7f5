"""Time individual engine functions during the real roundtrip (monkeypatch)."""
import collections
import datetime
import functools
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import meerschaum_spark.pipe as pipemod
import meerschaum_spark.store as storemod
from meerschaum_spark.pipe import Pipe
from meerschaum_spark.session import apply_engine_confs
from meerschaum_spark.sources import load_table

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
apply_engine_confs(spark)
spark.sparkContext.setLogLevel("ERROR")
events = load_table(spark, "/root/testdata/sf0.1", "events")
events.count()

acc = collections.defaultdict(float)
cnt = collections.defaultdict(int)


def timed(cls, name):
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def wrap(*a, **k):
        t0 = time.time()
        try:
            return orig(*a, **k)
        finally:
            acc[f"{cls.__name__}.{name}"] += time.time() - t0
            cnt[f"{cls.__name__}.{name}"] += 1
    setattr(cls, name, wrap)


for n in ["_split_existing", "_dedupe_patch", "register", "exists",
          "get_rowcount"]:
    timed(Pipe, n)
for n in ["append", "merge", "_refresh_listing", "_swap_partitions", "read"]:
    timed(storemod.ParquetPipeStore, n)

instance = tempfile.mkdtemp(prefix="mrsm_prof3_")
try:
    pipe = Pipe("catalog", "events", instance=instance, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    t0 = time.time()
    cut_lo = datetime.datetime(2024, 1, 10)
    pipe.sync(events.filter(F.col("ts") < F.lit(datetime.datetime(2024, 1, 20))))
    t1 = time.time(); print(f"sync1 {t1-t0:5.2f}s")
    pipe.sync(events.filter(F.col("ts") >= F.lit(cut_lo)))
    t2 = time.time(); print(f"sync2 {t2-t1:5.2f}s")
    pipe.sync(events)
    t3 = time.time(); print(f"sync3 {t3-t2:5.2f}s")
    pipe.sync(events.orderBy("ts").limit(1).withColumn("value", F.lit(-1.0)))
    t4 = time.time(); print(f"sync4 {t4-t3:5.2f}s")
    pipe.get_rowcount()
    print(f"total {time.time()-t0:5.2f}s")
    for k in sorted(acc, key=acc.get, reverse=True):
        print(f"{k:45s} {acc[k]:6.2f}s  n={cnt[k]}")
finally:
    shutil.rmtree(instance, ignore_errors=True)
