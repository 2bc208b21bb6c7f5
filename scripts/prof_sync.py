"""Decompose the per-sync fixed cost (r14, VERDICT r13 next-round #1).

Runs the pipe_sync_roundtrip scenario's sync cadence against a warm
session and reports, per sync phase:
  - wall time,
  - Spark job count + job time (status tracker),
  - py4j round-trip count + time (JavaMember/get_return_value patch),
so the floor splits into JVM job execution vs driver-side plan/py4j
chatter vs pure Python.

Usage: python scripts/prof_sync.py [--reps 3]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY4J = {"n": 0, "t": 0.0}


def patch_py4j() -> None:
    import py4j.java_gateway as jg
    orig = jg.JavaMember.__call__

    def patched(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **k)
        finally:
            PY4J["n"] += 1
            PY4J["t"] += time.perf_counter() - t0

    jg.JavaMember.__call__ = patched


class Phase:
    def __init__(self, spark, name):
        self.spark = spark
        self.name = name

    def __enter__(self):
        st = self.spark.sparkContext.statusTracker()
        self.jobs0 = len(st.getJobIdsForGroup(None) or [])
        self.n0, self.t0 = PY4J["n"], PY4J["t"]
        self.w0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        wall = time.perf_counter() - self.w0
        st = self.spark.sparkContext.statusTracker()
        jobs = len(st.getJobIdsForGroup(None) or []) - self.jobs0
        # the status-tracker calls above are themselves py4j calls; the
        # deltas below are ~3 calls high, fine at this resolution
        print(f"{self.name:34s} wall {wall:7.3f}s  jobs {jobs:3d}  "
              f"py4j {PY4J['n'] - self.n0:5d} calls "
              f"{PY4J['t'] - self.t0:7.3f}s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    patch_py4j()

    import datetime
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from meerschaum_spark.session import get_spark
    from meerschaum_spark.sources import load_table
    from meerschaum_spark.pipe import Pipe
    import bench

    spark = get_spark("meerschaum_spark_prof_sync")
    bench._warm(spark, sf_dir)

    events = load_table(spark, sf_dir, "events").persist()
    events.count()

    for rep in range(args.reps):
        print(f"--- rep {rep} ---")
        instance = tempfile.mkdtemp(prefix="mrsm_prof_sync_")
        try:
            pipe = Pipe("prof", "events", instance=instance, spark=spark,
                        columns={"datetime": "ts", "id": "event_id"})
            cut_lo = datetime.datetime(2024, 1, 10)
            with Phase(spark, "sync1 first (bulk insert)"):
                pipe.sync(events.filter(
                    F.col("ts") < F.lit(datetime.datetime(2024, 1, 20))))
            with Phase(spark, "sync2 overlap (ins+upd diff)"):
                pipe.sync(events.filter(F.col("ts") >= F.lit(cut_lo)))
            with Phase(spark, "sync3 full overlap (noop diff)"):
                pipe.sync(events)
            first_row = events.orderBy("ts").limit(1).collect()
            mutated = dict(first_row[0].asDict())
            mutated["value"] = -1.0
            with Phase(spark, "sync4 1-row dict (fused local)"):
                pipe.sync([mutated])
            with Phase(spark, "get_rowcount"):
                pipe.get_rowcount()
        finally:
            shutil.rmtree(instance, ignore_errors=True)
    events.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
