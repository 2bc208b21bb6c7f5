"""Shared DISK_ONLY local-checkpoint pin.

A local checkpoint truncates lineage, so its blocks are the ONLY copy of
the data — at the default MEMORY_AND_DISK level they sit in the unified
pool's storage region and compete with execution memory. Twice now the
clamped-pool pressure soak has turned that competition into
``SparkOutOfMemoryError`` (r8: the range sort behind
``ranking.global_row_number``; r9: the shingle-set hash aggregate behind
``dedup.ordered_shingle_sets`` could not even allocate its INITIAL 256 KB
map). DISK_ONLY keeps the pool whole; on local disks the re-read is one
OS-page-cached sequential pass, measured cost-neutral on the warm path
(r8 SCALE.md, re-verified r9 bench).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Eager DISK_ONLY local checkpoint — use for every multi-consumer
    materialization instead of bare ``localCheckpoint(eager=True)``."""
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
