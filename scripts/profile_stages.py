"""Dump per-job/stage durations for each sync of the roundtrip."""
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
sc = spark.sparkContext
sc.setLogLevel("ERROR")
events = load_table(spark, "/root/testdata/sf0.1", "events")
events.count()

# java listener via py4j: record job start/end
jsc = sc._jsc.sc()
events_log = []

tracker = sc.statusTracker()


def run(name, fn):
    ids0 = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.time()
    fn()
    wall = time.time() - t0
    ids1 = set(tracker.getJobIdsForGroup(None) or [])
    new = sorted(ids1 - ids0)
    total_job = 0.0
    print(f"== {name}: wall {wall:.2f}s, {len(new)} jobs")
    for jid in new:
        ji = tracker.getJobInfo(jid)
        if ji is None:
            continue
        stage_info = []
        for sid in ji.stageIds:
            si = tracker.getStageInfo(sid)
            if si:
                stage_info.append(f"s{sid}:{si.name.split(' at ')[0]}"
                                  f"[{si.numTasks}t]")
        print(f"   job {jid}: {' '.join(stage_info)}")


instance = tempfile.mkdtemp(prefix="mrsm_stg_")
try:
    pipe = Pipe("catalog", "events", instance=instance, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    cut_lo = datetime.datetime(2024, 1, 10)
    run("sync1", lambda: pipe.sync(
        events.filter(F.col("ts") < F.lit(datetime.datetime(2024, 1, 20)))))
    run("sync2", lambda: pipe.sync(events.filter(F.col("ts") >= F.lit(cut_lo))))
    run("sync3", lambda: pipe.sync(events))
    run("sync4", lambda: pipe.sync(
        events.orderBy("ts").limit(1).withColumn("value", F.lit(-1.0))))
finally:
    shutil.rmtree(instance, ignore_errors=True)
