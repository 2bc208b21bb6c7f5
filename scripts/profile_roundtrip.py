"""Profile pipe_sync_roundtrip: Spark jobs + wall time per sync cycle."""
import datetime
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meerschaum_spark.pipe import Pipe
from meerschaum_spark.session import apply_engine_confs
from meerschaum_spark.sources import load_table

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.showConsoleProgress", "false")
         .getOrCreate())
apply_engine_confs(spark)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"
events = load_table(spark, sf_dir, "events")
events.count()  # warm the scan

tracker = spark.sparkContext.statusTracker()


def njobs():
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


instance = tempfile.mkdtemp(prefix="mrsm_prof_")
try:
    pipe = Pipe("catalog", "events", instance=instance, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    cut_lo = datetime.datetime(2024, 1, 10)
    phases = [
        ("sync1_fresh", lambda: pipe.sync(
            events.filter(F.col("ts") < F.lit(datetime.datetime(2024, 1, 20))))),
        ("sync2_overlap", lambda: pipe.sync(
            events.filter(F.col("ts") >= F.lit(cut_lo)))),
        ("sync3_noop", lambda: pipe.sync(events)),
        ("sync4_update", lambda: pipe.sync(
            spark.createDataFrame(events.orderBy("ts").limit(1).collect(),
                                  events.schema)
            .withColumn("value", F.lit(-1.0)))),
        ("rowcount", lambda: pipe.get_rowcount()),
    ]
    total0 = time.time()
    for name, fn in phases:
        j0, t0 = njobs(), time.time()
        out = fn()
        print(f"{name:15s} {time.time()-t0:6.2f}s  jobs={njobs()-j0:3d}  {out}")
    print(f"{'TOTAL':15s} {time.time()-total0:6.2f}s  jobs={njobs()}")
finally:
    shutil.rmtree(instance, ignore_errors=True)
