"""The preloading worker daemon (meerschaum_spark.pydaemon).

Pinned behavior: engine sessions point spark.python.daemon.module at
the preloading daemon, and python workers forked by it inherit the
preloaded scientific stack (observable via the sentinel env var the
daemon sets before forking). This is the fix for the measured
fork-storm stalls: Spark hard-codes a 60 s idle timeout on pooled
python workers (PythonWorkerFactory.IDLE_WORKER_TIMEOUT_NS), so any
>60 s stretch without a python stage empties the pool and the next
Arrow stage re-forks workers — each import of numpy/pandas/pyarrow
cost ~1.5 s user CPU plus ~17k copy-on-write faults per worker before
the preload.
"""
import os

import pytest


def test_pydaemon_module_importable_and_harmless():
    import meerschaum_spark.pydaemon as pd_mod
    # the daemon entrypoint must exist and be pyspark's manager
    from pyspark.daemon import manager
    assert pd_mod.manager is manager


def test_session_points_at_preloading_daemon(spark):
    if os.environ.get("SPARK_GRAFT_DAEMON_MODULE", None) == "":
        pytest.skip("preload explicitly disabled via env")
    assert (spark.conf.get("spark.python.daemon.module")
            == "meerschaum_spark.pydaemon")


def test_workers_inherit_preload(spark):
    if os.environ.get("SPARK_GRAFT_DAEMON_MODULE", None) == "":
        pytest.skip("preload explicitly disabled via env")

    def probe(it):
        import pandas as pd
        flag = os.environ.get("MRSM_PYDAEMON_PRELOADED", "0")
        for pdf in it:
            yield pd.DataFrame([{"preloaded": int(flag)}])

    rows = (spark.range(0, 8, 1, 8)
            .mapInPandas(probe, "preloaded long").collect())
    assert rows and all(r["preloaded"] == 1 for r in rows)
