"""Name the query whose Python workers keep computing after it returns.

After each catalog query's .count() returns, the driver believes the job
is done. If any pyspark worker process gains CPU during the idle gap
that follows, those are runaway tasks (e.g. cancelled by an early-exit
job) still chewing their batch — they poison the shared worker pool for
the next Python-stage query.

Usage: python scripts/find_runaway_workers.py <start_idx> <end_idx> [gap_sec]
Prints, per query: wall time, CPU burned by python workers during the
post-query idle gap, and the pids responsible (with their cumulative CPU).
"""
import glob
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

CLK = os.sysconf("SC_CLK_TCK")


def python_cpu():
    """pid -> cumulative cpu seconds, for every live python process."""
    out = {}
    me = os.getpid()
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                head, rest = f.read().rsplit(") ", 1)
            pid_s, comm = head.split(" (", 1)
            if not comm.startswith("python"):
                continue
            pid = int(pid_s)
            if pid == me:
                continue
            fields = rest.split()
            out[pid] = (int(fields[11]) + int(fields[12])) / CLK
        except (OSError, ValueError):
            continue
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    start, end = int(sys.argv[1]), int(sys.argv[2])
    gap = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    from meerschaum_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    spark = get_spark("find_runaway")
    qs = entrymod.queries()
    ordered = sorted(qs, key=lambda n: (n.startswith("streaming_"), n))

    t0 = time.perf_counter()
    bench._warm(spark, sf_dir)
    print(f"warm {time.perf_counter()-t0:.1f}s", flush=True)

    for name in ordered[start:end]:
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).count()
        except Exception as exc:  # keep scanning
            print(f"{name} FAILED {exc}", flush=True)
            continue
        wall = time.perf_counter() - t0
        snap1 = python_cpu()
        time.sleep(gap)
        snap2 = python_cpu()
        burn = {
            pid: snap2[pid] - snap1[pid]
            for pid in snap2
            if pid in snap1 and snap2[pid] - snap1[pid] > 0.3 * gap
        }
        tag = ""
        if burn:
            total = sum(burn.values())
            detail = " ".join(
                f"{pid}:+{d:.1f}s(cum {snap2[pid]:.0f}s)"
                for pid, d in sorted(burn.items(), key=lambda kv: -kv[1])[:8]
            )
            tag = f"  RUNAWAY {len(burn)} workers, {total:.1f} cpu-s idle-burn: {detail}"
        print(f"[{time.strftime('%H:%M:%S')}] {name} {wall:.2f}{tag}", flush=True)

    # final probe: is the pool clean at the end?
    for rep in range(3):
        t0 = time.perf_counter()
        qs["multimodal_audio_features"](spark, sf_dir).count()
        print(f"PROBE audio rep{rep} {time.perf_counter()-t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
