"""Registry listing at fleet scale (VERDICT r10 #7).

Synthesizes N pipe docs (default 100k) the way a foreign writer would
(direct file publish), then times ``fetch_pipes_keys``:

* scan      — the pre-r11 path: listdir + parse every doc, per call
* index     — first call after the docs land: one rebuild scan, then
              ONE index-file read per cold call
* warm      — repeat calls: memoized per dir-mtime (two stat() calls)

Run: ``PYTHONPATH=/root/repo python scripts/registry_bench.py [N]``
Output: one JSON line with the three timings.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meerschaum_spark.registry import PipeRegistry  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    root = tempfile.mkdtemp(prefix="mrsm_regbench_")
    try:
        reg = PipeRegistry.for_instance(root)
        os.makedirs(reg.registry_dir, exist_ok=True)
        t0 = time.perf_counter()
        for i in range(n):
            doc = {"keys": {"connector": f"c{i % 7}", "metric": f"m{i}",
                            "location": None},
                   "parameters": {"tags": ["prod" if i % 3 == 0 else "dev"]}}
            with open(os.path.join(reg.registry_dir, f"p{i}.json"),
                      "w") as f:
                json.dump(doc, f)
        t_create = time.perf_counter() - t0

        # legacy scan path, what every call used to cost
        t0 = time.perf_counter()
        scan = reg._scan_entries()
        t_scan = time.perf_counter() - t0
        assert len(scan) == n

        # cold indexed call: pays ONE rebuild (scan + index write), after
        # which the file is the source
        t0 = time.perf_counter()
        rows = reg.fetch_pipes_keys(connector="c0")
        t_rebuild = time.perf_counter() - t0
        assert len(rows) == (n + 6) // 7

        # cold re-read: new registry object, index file already fresh
        reg2 = PipeRegistry(root)
        t0 = time.perf_counter()
        rows = reg2.fetch_pipes_keys(connector="c0")
        t_cold = time.perf_counter() - t0
        assert len(rows) == (n + 6) // 7

        # warm: memoized per dir-mtime
        t0 = time.perf_counter()
        for _ in range(10):
            rows = reg2.fetch_pipes_keys(tags=["prod"])
        t_warm = (time.perf_counter() - t0) / 10
        assert len(rows) == (n + 2) // 3

        print(json.dumps({
            "n_pipes": n,
            "create_docs_sec": round(t_create, 3),
            "legacy_scan_sec": round(t_scan, 3),
            "index_rebuild_sec": round(t_rebuild, 3),
            "index_cold_read_sec": round(t_cold, 4),
            "index_warm_sec": round(t_warm, 6),
            "index_bytes": os.path.getsize(reg.index_path),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
