"""Bisect which earlier catalog query inflates multimodal_audio_features.

Usage: python scripts/bisect_audio.py <start_idx> <end_idx> [probe_reps]
Runs warm + ordered_names[start:end] then times the audio probe query.
"""
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
start, end = int(sys.argv[1]), int(sys.argv[2])
probe_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

from meerschaum_spark.session import get_spark
import __spark_entry__ as entrymod
import bench

spark = get_spark("bisect_audio")
qs = entrymod.queries()
ordered = sorted(qs, key=lambda n: (n.startswith("streaming_"), n))

t0 = time.perf_counter()
bench._warm(spark, sf_dir)
print(f"warm {time.perf_counter()-t0:.1f}s", flush=True)

for name in ordered[start:end]:
    if name == "multimodal_audio_features":
        continue
    t0 = time.perf_counter()
    try:
        qs[name](spark, sf_dir).count()
    except Exception as e:
        print(f"{name} FAILED {e}", flush=True)
        continue
    print(f"{name} {time.perf_counter()-t0:.2f}", flush=True)

for rep in range(probe_reps):
    t0 = time.perf_counter()
    qs["multimodal_audio_features"](spark, sf_dir).count()
    print(f"PROBE audio_features rep{rep} {time.perf_counter()-t0:.2f}",
          flush=True)
