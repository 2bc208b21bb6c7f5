"""Instance-level bulk actions: the engine analogue of the reference's
action layer (``mrsm sync pipes``, ``verify pipes``, ``deduplicate
pipes`` — meerschaum/actions/sync.py:17-416, verify.py, delete.py),
iterating the registry's pipes with key/tag filters.

Driver-side orchestration only — each pipe's work is the usual
distributed sync/verify; a thread pool overlaps pipes whose work touches
disjoint stores (the reference pools the same way with --workers).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable

from pyspark.sql import SparkSession

from meerschaum_spark.pipe import VERIFY_BOUND_DAYS, Pipe, SyncResult
from meerschaum_spark.registry import PipeRegistry


def get_pipes(
    spark: SparkSession,
    instance: str,
    connector: str | None = None,
    metric: str | None = None,
    location: str | None = None,
    tags: list[str] | None = None,
) -> list[Pipe]:
    """Materialize Pipe objects for every registered pipe matching the
    key/tag filters (reference ``mrsm.get_pipes``)."""
    reg = PipeRegistry.for_instance(instance)
    return [
        Pipe(c, m, l, instance=instance, spark=spark)
        for c, m, l in reg.fetch_pipes_keys(connector=connector,
                                            metric=metric,
                                            location=location, tags=tags)
    ]


def _pipe_key(pipe: Pipe) -> tuple[str, str, str | None]:
    """Result-dict key: the (connector, metric, location) identity, NOT
    ``pipe.target`` — two pipes may share an explicit target, and keying
    by target would silently drop one result."""
    return (pipe.connector, pipe.metric, pipe.location)


def _run_over(
    pipes: list[Pipe],
    fn: Callable[[Pipe], SyncResult],
    workers: int = 1,
) -> dict[tuple[str, str, str | None], SyncResult]:
    def one(pipe: Pipe) -> tuple[tuple[str, str, str | None], SyncResult]:
        try:
            return _pipe_key(pipe), fn(pipe)
        except Exception as e:
            return _pipe_key(pipe), SyncResult(False,
                                               f"{type(e).__name__}: {e}")

    if workers > 1 and len(pipes) > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return dict(pool.map(one, pipes))
    return dict(one(p) for p in pipes)


def sync_pipes(spark: SparkSession, instance: str, workers: int = 1,
               **filters: Any) -> dict[str, SyncResult]:
    """Fetch-and-sync every matching pipe (reference actions/sync.py)."""
    return _run_over(get_pipes(spark, instance, **filters),
                     lambda p: p.sync(), workers)


def verify_pipes(spark: SparkSession, instance: str, workers: int = 1,
                 bound_days: int | None = VERIFY_BOUND_DAYS,
                 **filters: Any) -> dict[str, SyncResult]:
    """Verify every matching pipe (reference actions/verify.py).
    ``bound_days=None`` requests the full-history walk, exactly as on
    ``Pipe.verify`` — the default is the same 366-day cap."""
    return _run_over(get_pipes(spark, instance, **filters),
                     lambda p: p.verify(bound_days=bound_days), workers)


def deduplicate_pipes(spark: SparkSession, instance: str, workers: int = 1,
                      **filters: Any) -> dict[str, SyncResult]:
    """Deduplicate every matching pipe."""
    return _run_over(get_pipes(spark, instance, **filters),
                     lambda p: p.deduplicate(), workers)


def drop_pipes(spark: SparkSession, instance: str,
               **filters: Any) -> dict[tuple[str, str, str | None], bool]:
    """Drop data for every matching pipe (registry entries retained,
    matching the reference's drop-vs-delete split)."""
    out = {}
    for pipe in get_pipes(spark, instance, **filters):
        pipe.drop()
        out[_pipe_key(pipe)] = not pipe.exists()
    return out


def delete_pipes(spark: SparkSession, instance: str,
                 **filters: Any) -> dict[tuple[str, str, str | None], bool]:
    """Delete every matching pipe outright — data AND registry entry
    (reference actions/delete.py delete pipes; ``Pipe.delete``)."""
    out = {}
    for pipe in get_pipes(spark, instance, **filters):
        pipe.delete()
        out[_pipe_key(pipe)] = (
            not pipe.exists()
            and pipe.registry.load(pipe.target) is None)
    return out


def clear_pipes(spark: SparkSession, instance: str,
                begin=None, end=None,
                **filters: Any) -> dict[tuple[str, str, str | None], int]:
    """Bounded delete across every matching pipe (reference
    actions/clear.py — ``mrsm clear pipes --begin --end``); returns rows
    removed per pipe."""
    return {_pipe_key(p): p.clear(begin=begin, end=end)
            for p in get_pipes(spark, instance, **filters)}


def vacuum_pipes(spark: SparkSession, instance: str,
                 **filters: Any) -> dict[tuple[str, str, str | None], int]:
    """GC stale staging artifacts for every matching pipe (reference
    actions/vacuum.py); returns artifacts removed per pipe."""
    return {_pipe_key(p): p.vacuum()
            for p in get_pipes(spark, instance, **filters)}


def tag_pipes(spark: SparkSession, instance: str, add: list[str] | None = None,
              remove: list[str] | None = None,
              **filters: Any) -> dict[tuple[str, str, str | None], list[str]]:
    """Bulk tag editing (reference actions/tag.py): add/remove tags on
    every matching pipe's registered parameters; returns each pipe's
    final tag list."""
    out = {}
    for pipe in get_pipes(spark, instance, **filters):
        tags = [t for t in pipe.tags if t not in set(remove or [])]
        tags += [t for t in (add or []) if t not in tags]
        pipe.edit(tags=tags)
        out[_pipe_key(pipe)] = tags
    return out
