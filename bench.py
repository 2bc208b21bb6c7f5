"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from meerschaum_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("meerschaum_spark_bench")
    qs = entrymod.queries()

    # warm the JVM/catalyst on a trivial plan so query 1 isn't charged startup
    spark.range(1000).selectExpr("sum(id)").collect()
    # ...and the Python-worker pool, so the first pandas-UDF query isn't
    # charged the per-executor worker spinup either
    import pandas as _pd

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(256).repartition(32).mapInPandas(
        _noop, schema="id long").count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
        except Exception as e:  # a failing query gets a sentinel, not a crash
            timings[name] = -1.0
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
