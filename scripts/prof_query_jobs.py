"""Job-timeline profile of one catalog query (r14).

Runs the named query once (after the bench warm stage and one untimed
warmup rep if --warmup), with an uncompressed event log, then prints
every job of the timed run: duration, gap since the previous job (the
driver-side plan/py4j time), stage task counts and times.

Usage: python scripts/prof_query_jobs.py pipe_ann_index_sync [--warmup]
"""
import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--warmup", action="store_true")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/evlog_q"
    os.makedirs(evdir, exist_ok=True)

    from meerschaum_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    spark = get_spark("prof_query_jobs", extra_confs={
        "spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false"})
    qs = entrymod.queries()
    fn = qs[args.name]
    bench._warm(spark, sf_dir)
    if args.warmup:
        fn(spark, sf_dir).count()
    spark.sparkContext.setJobDescription(f"TIMED::{args.name}")
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    app = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)

    print(f"{args.name}: wall {wall:.3f}s")
    path = glob.glob(f"{evdir}/{app}*")[0]
    jobs, stages = {}, {}
    for line in open(path):
        try:
            e = json.loads(line)
        except Exception:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            jobs[e["Job ID"]] = {
                "desc": desc, "t0": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e["Stage Infos"]]}
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"], "n": si["Number of Tasks"],
                "t0": si.get("Submission Time"),
                "t1": si.get("Completion Time")}
    prev_end = None
    tot_job = tot_gap = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if f"TIMED::{args.name}" not in j.get("desc", ""):
            prev_end = j.get("t1", prev_end)
            continue
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
        gap = (j["t0"] - prev_end) / 1000 if prev_end else 0.0
        tot_job += dur
        tot_gap += max(gap, 0.0)
        parts = []
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s and s.get("t0"):
                parts.append(f"{s['n']}t/{(s['t1']-s['t0'])/1000:.2f}s")
            elif s:
                parts.append(f"{s['n']}t/skip")
        print(f"job {jid:4d}: {dur:6.3f}s  gap {gap:6.3f}s  "
              f"stages [{', '.join(parts)}]")
        prev_end = j.get("t1")
    print(f"TOTAL job {tot_job:.3f}s + gaps {tot_gap:.3f}s "
          f"(wall {wall:.3f}s)")


if __name__ == "__main__":
    main()
