"""Step-level job accounting for one diff sync (sync3 no-op shape)."""
import datetime
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from meerschaum_spark.pipe import Pipe, HIT_COL, ORD_COL
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
events.count()

tracker = spark.sparkContext.statusTracker()


def njobs():
    ids = tracker.getJobIdsForGroup(None)
    return max(ids) + 1 if ids else 0


def step(name, fn):
    j0, t0 = njobs(), time.time()
    out = fn()
    print(f"{name:28s} {time.time()-t0:6.2f}s  jobs={njobs()-j0:3d}")
    return out


instance = tempfile.mkdtemp(prefix="mrsm_prof2_")
try:
    pipe = Pipe("catalog", "events", instance=instance, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    step("sync1_fresh", lambda: pipe.sync(events))

    # now replicate sync(events) (full overlap no-op) step by step
    import meerschaum_spark.dataframe as mdf
    df, inferred = mdf.to_spark_df(spark, events, pipe.dtypes or None)
    step("to_spark_df(action?)", lambda: None)
    df = df.withColumn(ORD_COL, F.monotonically_increasing_id())
    step("exists_refresh", lambda: pipe.exists(refresh=True))
    persisted = []
    df = df.persist(); persisted.append(df)
    dt = pipe.dt_col
    keys = [c for c in pipe.index_cols if c in df.columns]
    key_cols = [c for c in keys if c != dt]
    stats_aggs = [F.min(dt).alias("_lo"), F.max(dt).alias("_hi")]
    for col in key_cols:
        stats_aggs.append(F.approx_count_distinct(col, rsd=0.05).alias(f"_nd_{col}"))
        stats_aggs.append(F.count(F.when(F.col(col).isNull(), 1)).alias(f"_nn_{col}"))
    stats = step("stats_agg", lambda: df.agg(*stats_aggs).first())
    lo, hi = stats["_lo"], stats["_hi"]
    slop = datetime.timedelta(minutes=1)
    begin, end = lo - slop, hi + slop + datetime.timedelta(microseconds=1)
    backtrack = pipe.get_data(begin=begin, end=end, order=None)
    backtrack = backtrack.persist(); persisted.append(backtrack)
    common = [c for c in df.columns if c in backtrack.columns]
    b = backtrack.alias("b"); d = df.alias("d")
    full_cond = None
    for c in common:
        eq = F.col(f"d.{c}").eqNullSafe(F.col(f"b.{c}"))
        full_cond = eq if full_cond is None else (full_cond & eq)
    delta = d.join(b, on=full_cond, how="left_anti")
    bk = (backtrack.select(*keys).dropDuplicates()
          .withColumn(HIT_COL, F.lit(1)).alias("k"))
    delta = delta.alias("x")
    key_cond = None
    for c in keys:
        eq = F.col(f"x.{c}").eqNullSafe(F.col(f"k.{c}"))
        key_cond = eq if key_cond is None else (key_cond & eq)
    marked = delta.join(bk, on=key_cond, how="left").select(
        *[F.col(f"x.{c}") for c in df.columns],
        F.col(f"k.{HIT_COL}").alias(HIT_COL))
    marked = marked.persist()
    counts = step("counts_collect", lambda: {
        r["h"]: r["cnt"] for r in marked.groupBy(
            F.col(HIT_COL).isNotNull().alias("h"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()})
    print("counts:", counts)
    step("unpersist", lambda: [marked.unpersist()] + [c.unpersist() for c in persisted])
finally:
    shutil.rmtree(instance, ignore_errors=True)
