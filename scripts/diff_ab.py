"""A/B the diff-join formulations on an identical store + batch."""
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
events = load_table(spark, "/root/testdata/sf0.1", "events")
events.count()

instance = tempfile.mkdtemp(prefix="mrsm_ab_")
try:
    pipe = Pipe("catalog", "events", instance=instance, spark=spark,
                columns={"datetime": "ts", "id": "event_id"})
    pipe.sync(events)

    df0 = events.withColumn(ORD_COL, F.monotonically_increasing_id())
    keys = ["ts", "event_id"]
    backtrack0 = pipe.get_data(order=None)

    def old_form():
        df = df0
        backtrack = backtrack0
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
        return delta.join(bk, on=key_cond, how="left").select(
            *[F.col(f"x.{c}") for c in df.columns],
            F.col(f"k.{HIT_COL}").alias(HIT_COL))

    def new_form(agg="collect_set"):
        df = df0
        backtrack = backtrack0
        common = [c for c in df.columns if c in backtrack.columns]

        def _fp(frame):
            ins = []
            for c in common:
                col = F.col(c)
                t = frame.schema[c].dataType.simpleString()
                if t in ("float", "double"):
                    col = col + F.lit(0.0)
                ins.append(col)
            return F.struct(F.xxhash64(*ins).alias("a"),
                            F.xxhash64(F.lit(1), *ins).alias("b"))

        FP, FPS = "_mrsm_fp", "_mrsm_fps"
        bt_fp = backtrack.select(*keys, _fp(backtrack).alias(FP))
        if agg == "collect_set":
            bt_keyed = (bt_fp.groupBy(*keys)
                        .agg(F.collect_set(FP).alias(FPS)).alias("k"))
            contains = lambda: (F.col(FPS).isNull()
                                | ~F.array_contains(F.col(FPS), F.col(FP)))
            hit = lambda: F.when(F.col(FPS).isNotNull(), F.lit(1)).cast("int")
        else:  # no aggregation at all — store is key-unique by construction
            bt_keyed = bt_fp.withColumnRenamed(FP, FPS).alias("k")
            contains = lambda: (F.col(FPS).isNull()
                                | (F.col(FPS) != F.col(FP)))
            hit = lambda: F.when(F.col(FPS).isNotNull(), F.lit(1)).cast("int")
        d = df.withColumn(FP, _fp(df)).alias("x")
        key_cond = None
        for c in keys:
            eq = F.col(f"x.{c}").eqNullSafe(F.col(f"k.{c}"))
            key_cond = eq if key_cond is None else (key_cond & eq)
        joined = d.join(bt_keyed, on=key_cond, how="left")
        return (joined.filter(contains())
                .select(*[F.col(f"x.{c}") for c in df.columns],
                        hit().alias(HIT_COL)))

    def run(name, fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            n = fn().count()
            ts.append(time.time() - t0)
        print(f"{name:22s} rows={n:6d}  times={[round(t,2) for t in ts]}")

    run("old_two_join", old_form)
    run("fp_collect_set", lambda: new_form("collect_set"))
    run("fp_direct", lambda: new_form("direct"))
    run("old_two_join(2)", old_form)
finally:
    shutil.rmtree(instance, ignore_errors=True)
