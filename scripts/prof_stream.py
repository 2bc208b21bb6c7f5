"""Decompose the streaming replay floor (r14, VERDICT r13 next-round #5).

Replays the events table through representative streaming shapes and
prints each run's microbatch progress: batch count, rows per batch, and
the per-batch duration breakdown (addBatch / getBatch / commitOffsets /
walCommit / stateStore), so "many tiny batches" splits from "state
machinery floor".

Usage: python scripts/prof_stream.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from meerschaum_spark.session import get_spark
    import bench

    spark = get_spark("meerschaum_spark_prof_stream")
    bench._warm(spark, sf_dir)

    from meerschaum_spark.queries import (_stream_replay_confs,
                                          _STREAM_RUN_COUNTER)
    from meerschaum_spark.queries import canonicalize_ts

    def replay(name, build, output_mode="append"):
        _STREAM_RUN_COUNTER[0] += 1
        sink = f"_prof_{name}_{_STREAM_RUN_COUNTER[0]}"
        path = os.path.join(sf_dir, "events.parquet")
        t0 = time.perf_counter()
        with _stream_replay_confs(spark):
            raw = spark.read.parquet(path)
            stream = (spark.readStream.schema(raw.schema)
                      .option("pathGlobFilter", "events.parquet")
                      .parquet(sf_dir))
            stream = canonicalize_ts(stream, ["ts"])
            q = (build(stream).writeStream.format("memory").queryName(sink)
                 .outputMode(output_mode).trigger(availableNow=True).start())
            q.awaitTermination(300)
            progress = [json.loads(str(p)) for p in q.recentProgress]
        wall = time.perf_counter() - t0
        print(f"== {name}: wall {wall:.2f}s, {len(progress)} microbatches")
        for p in progress:
            dur = p.get("durationMs", {})
            print(f"   batch {p['batchId']}: rows={p['numInputRows']} "
                  f"dur={dur}")
        sys.stdout.flush()

    # 1. stateful sessionization (applyInPandasWithState)
    from meerschaum_spark.streaming.stateful import stateful_sessionize
    replay("sessionize",
           lambda s: stateful_sessionize(s, gap_seconds=30 * 60,
                                         order_cols=["event_id"]))

    # 2. watermarked hourly rollup (stateful agg)
    from meerschaum_spark.streaming.runner import windowed_rollup
    replay("hourly_rollup",
           lambda s: windowed_rollup(
               s, "ts", window_duration="1 hour", watermark="1 day",
               agg_cols={"value": "sum"}, group_cols=["event_type"]))

    # 3. plain dedup keys (dropDuplicates state)
    replay("dedup_keys",
           lambda s: s.withWatermark("ts", "1 day")
           .dropDuplicates(["user_id", "event_type"])
           .select("user_id", "event_type"))

    spark.stop()


if __name__ == "__main__":
    main()
