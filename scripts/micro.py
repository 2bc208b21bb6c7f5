"""Micro-benchmarks of sync components at sf0.1."""
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

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

out = tempfile.mkdtemp(prefix="micro_")


def t(name, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 2))
    print(f"{name:42s} {ts}")


part = F.floor(F.unix_micros(F.col("ts")) / F.lit(43200 * 60_000_000)).cast("long")

t("count(warm)", lambda: events.count())
t("count+mono+part", lambda: events.withColumn("o", F.monotonically_increasing_id()).withColumn("p", part).count())
t("write 100k 1task", lambda: events.withColumn("p", part).write.mode("overwrite").partitionBy("p").parquet(f"{out}/w1"))
t("write 100k repart32", lambda: events.withColumn("p", part).repartition(32).write.mode("overwrite").partitionBy("p").parquet(f"{out}/w2"))
t("write 100k rebalance(AQE)", lambda: events.withColumn("p", part).hint("rebalance", "p").write.mode("overwrite").partitionBy("p").parquet(f"{out}/w3"))
t("persist+count", lambda: (lambda d: (d.count(), d.unpersist()))(events.persist()))
t("xxhash64 x2 count", lambda: events.select(F.xxhash64(*events.columns).alias("a"), F.xxhash64(F.lit(1), *events.columns).alias("b")).count())

# observation overhead on a write
from pyspark.sql import Observation
def w_obs():
    obs = Observation()
    (events.withColumn("p", part).observe(obs, F.count(F.lit(1)).alias("n"))
     .write.mode("overwrite").partitionBy("p").parquet(f"{out}/w4"))
    return obs.get["n"]
t("write 100k 1task + observe", w_obs)

spark.conf.set("spark.sql.adaptive.enabled", "false")
t("write 100k 1task AQE-off", lambda: events.withColumn("p", part).write.mode("overwrite").partitionBy("p").parquet(f"{out}/w5"))
t("write 100k 1task AQE-off + observe", w_obs)
spark.conf.set("spark.sql.adaptive.enabled", "true")

shutil.rmtree(out, ignore_errors=True)
