"""Epoch-aligned chunk-bounds grid.

Port of the reference's chunk-interval machinery
(meerschaum/core/Pipe/_data.py:639-932): a deterministic ``[begin, end)``
grid of ``chunk_minutes`` width anchored at the Unix epoch. The same grid
drives verify/dedup chunking AND the store's physical partitioning, so
chunk workers touch disjoint partitions (reference
connectors/sql/_partition.py:231-260 uses the identical alignment).
"""

from __future__ import annotations

import datetime
from typing import Any, Iterator

from meerschaum_spark.dtypes import (
    UNIT_US,
    datetime_to_int,
    int_to_datetime,
    normalize_unit,
)

DEFAULT_CHUNK_MINUTES = 43_200  # 30 days (reference config/_default.py:240)


def _to_us(bound: Any, unit: str) -> int:
    if isinstance(bound, datetime.datetime):
        return datetime_to_int(bound, "microsecond")
    return int(bound) * UNIT_US[normalize_unit(unit)]


def _from_us(us: int, bound_like: Any, unit: str) -> Any:
    if isinstance(bound_like, datetime.datetime):
        return int_to_datetime(us, "microsecond")
    return us // UNIT_US[normalize_unit(unit)]


def align_floor(bound: Any, chunk_minutes: int = DEFAULT_CHUNK_MINUTES,
                unit: str = "microsecond") -> Any:
    """Floor a bound onto the epoch-aligned grid."""
    width_us = chunk_minutes * 60_000_000
    us = _to_us(bound, unit)
    return _from_us((us // width_us) * width_us, bound, unit)


def partition_index(epoch_us: int, chunk_minutes: int = DEFAULT_CHUNK_MINUTES) -> int:
    """Grid cell index for an epoch-µs value (the store's partition key)."""
    return epoch_us // (chunk_minutes * 60_000_000)


def get_chunk_bounds(
    begin: Any,
    end: Any,
    chunk_minutes: int = DEFAULT_CHUNK_MINUTES,
    align: bool = True,
    bounded: bool = True,
    unit: str = "microsecond",
) -> Iterator[tuple[Any, Any]]:
    """Yield ``[b, e)`` windows covering ``[begin, end)``.

    With ``align=True`` interior edges snap to the epoch grid (first/last
    windows are clipped to begin/end). With ``bounded=False`` the open
    edges ``(None, begin)`` and ``(end, None)`` are yielded too, matching
    the reference's unbounded verify mode (core/Pipe/_data.py:814-876).
    """
    if begin is None or end is None:
        raise ValueError("begin and end are required (use bounded=False for open edges)")
    width_us = chunk_minutes * 60_000_000
    b_us, e_us = _to_us(begin, unit), _to_us(end, unit)
    if b_us >= e_us:
        return
    if not bounded:
        yield (None, begin)
    cursor = b_us
    while cursor < e_us:
        if align:
            nxt = ((cursor // width_us) + 1) * width_us
        else:
            nxt = cursor + width_us
        nxt = min(nxt, e_us)
        yield (_from_us(cursor, begin, unit), _from_us(nxt, begin, unit))
        cursor = nxt
    if not bounded:
        yield (end, None)
