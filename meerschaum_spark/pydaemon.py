"""PySpark worker daemon with the engine's heavyweight imports preloaded.

Measured problem (guide §4.5, taken one level further — initialise
heavyweight state once per *daemon*, not once per worker): every
Arrow-batched python stage needs one worker per runner layer per task,
and whenever the idle pool cannot supply them the daemon forks fresh
workers that each import numpy + pandas + pyarrow from scratch. On this
host a 32-fork storm costs ~50 s of user CPU (imports) plus ~230 s of
kernel CPU (~1.1M copy-on-write page faults — measured via /proc
deltas around a stalled stage), turning a 0.8 s query into a 15-50 s
one whenever the pool has decayed mid-session.

Preloading the scientific stack in the daemon makes every forked
worker inherit the already-initialised modules through fork()'s
copy-on-write pages: no import CPU, no per-worker I/O, and the pages
are physically shared. This is the standard preload-then-fork pattern
(gunicorn ``preload_app``, celery, uwsgi) applied to pyspark's daemon,
and it behaves identically on cluster executors.

Selected via ``spark.python.daemon.module`` (see ``session.get_spark``).
The preload is best-effort: a missing library must not take down the
daemon — workers would then simply import it themselves as before.
"""

import os

try:  # best-effort: the daemon must start even if a preload fails
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # the serializer chain every Arrow runner touches on its first batch
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401

    # forked workers inherit the environment: lets tests (and operators
    # that care) verify they are running under the preloading daemon
    os.environ["MRSM_PYDAEMON_PRELOADED"] = "1"

    # Move every preloaded object to the GC's permanent generation so
    # forked children never cyclic-GC-scan them: a gen2 pass in a child
    # writes to each object's GC header, un-sharing (copy-on-write) the
    # preloaded pages one fault at a time. Standard companion of the
    # preload-then-fork pattern (CPython gc.freeze docs describe exactly
    # this use case). Collect first so import-time garbage is reclaimed
    # instead of being frozen into the permanent generation and leaked
    # into every forked worker (the documented collect-then-freeze
    # ordering; ADVICE r13).
    import gc
    gc.collect()
    gc.freeze()
except Exception:  # pragma: no cover - only hit on broken installs
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
