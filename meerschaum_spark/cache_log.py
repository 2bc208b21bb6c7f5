"""Session-cache build accounting (r14, VERDICT r13 "what's wrong" #1).

The catalog's session caches (the ``_cached_sigs`` family, the BPE loop
state, the part co-purchase edge list) are legitimate shared-computation
reuse — rebuilt fresh every process, keyed on (applicationId, sf_dir) —
but they distort PER-QUERY bench attribution: the first consumer pays
the build in its single-shot number, and its min-of-3 reps then time the
memo hit. This module gives the bench two handles:

* ``BUILDS`` — an append-only log of ``(cache_name, build_sec)`` the
  cache sites record; the bench diffs its length around each timed run
  to attribute builds to their first consumer (``cache_builds`` in
  BENCH_DETAIL).
* ``register_evictor``/``evict`` — per-cache eviction callbacks; the
  bench's rep loop evicts exactly the caches a query built in its first
  pass before re-timing it, so min-of-3 re-pays the build and stays an
  honest per-query cost instead of a cache-probe time.

Deliberately stdlib-only and side-effect-free for library users: when no
one reads ``BUILDS``, recording is an O(1) append.
"""

from __future__ import annotations

from typing import Callable

#: append-only (cache_name, build_seconds) log, in build order
BUILDS: list[tuple[str, float]] = []

#: cache_name -> evictor; calling it drops the memoized entry so the
#: next consumer rebuilds (safe: caches rebuild lazily on demand)
_EVICTORS: dict[str, Callable[[], None]] = {}


def record(cache_name: str, build_sec: float) -> None:
    BUILDS.append((cache_name, round(build_sec, 4)))


def register_evictor(cache_name: str, fn: Callable[[], None]) -> None:
    _EVICTORS[cache_name] = fn


def evict(cache_name: str) -> bool:
    """Evict one cache by name; returns whether an evictor existed."""
    fn = _EVICTORS.get(cache_name)
    if fn is None:
        return False
    fn()
    return True
