"""Isolated per-query probe (r14 measurement protocol).

Runs a bench-identical session (same get_spark, same warm stage), then
times the named queries N reps each from a fresh JVM — the isolated
ground truth against which full-bench readings are adjudicated
(host-band inflation vs real regression).

Usage:
    python scripts/probe_queries.py q1_pricing_summary q6_revenue_forecast
    python scripts/probe_queries.py --family tpch --reps 3
    python scripts/probe_queries.py --no-warm pipe_sync_roundtrip
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def family_of(name: str) -> str:
    head = name.split("_", 1)[0]
    if head[:1] == "q" and head[1:].isdigit():
        return "tpch"
    return head


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--family", action="append", default=[])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--json", dest="json_out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from meerschaum_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    spark = get_spark("meerschaum_spark_probe")
    qs = entrymod.queries()

    names = list(args.names)
    for fam in args.family:
        names += sorted(n for n in qs if family_of(n) == fam)
    if not names:
        ap.error("no queries named")
    unknown = [n for n in names if n not in qs]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    t0 = time.perf_counter()
    if not args.no_warm:
        bench._warm(spark, sf_dir)
    warm_sec = round(time.perf_counter() - t0, 2)
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = -1.0

    out: dict[str, list[float]] = {}
    for name in names:
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = reps
        print(f"{name:44s} min {min(reps):7.3f}  reps {reps}", flush=True)

    total_min = round(sum(min(r) for r in out.values()), 3)
    print(f"# warm_sec={warm_sec} load_1min={load} "
          f"total_min={total_min} n={len(out)}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"warm_sec": warm_sec, "load_1min": load,
                       "reps": out, "total_min": total_min}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
