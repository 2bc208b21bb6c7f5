import datetime

from meerschaum_spark.chunks import align_floor, get_chunk_bounds, partition_index

UTC = datetime.timezone.utc


def test_aligned_grid_datetime():
    begin = datetime.datetime(2024, 1, 10, 5, tzinfo=UTC)
    end = datetime.datetime(2024, 3, 1, tzinfo=UTC)
    bounds = list(get_chunk_bounds(begin, end, chunk_minutes=43200))
    # contiguous, covering, half-open
    assert bounds[0][0] == begin
    assert bounds[-1][1] == end
    for (b1, e1), (b2, e2) in zip(bounds, bounds[1:]):
        assert e1 == b2
    # interior edges epoch-aligned to 30-day grid
    for _b, e in bounds[:-1]:
        us = int(e.timestamp() * 1_000_000)
        assert us % (43200 * 60_000_000) == 0


def test_aligned_grid_int_axis():
    # epoch-seconds axis
    begin, end = 1704067200, 1712067200
    bounds = list(get_chunk_bounds(begin, end, chunk_minutes=43200, unit="second"))
    assert bounds[0][0] == begin and bounds[-1][1] == end
    for _b, e in bounds[:-1]:
        assert (e * 1_000_000) % (43200 * 60_000_000) == 0


def test_unbounded_edges():
    b = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    e = datetime.datetime(2024, 1, 31, tzinfo=UTC)
    bounds = list(get_chunk_bounds(b, e, bounded=False))
    assert bounds[0] == (None, b)
    assert bounds[-1] == (e, None)


def test_empty_range():
    b = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    assert list(get_chunk_bounds(b, b)) == []


def test_partition_index_matches_align():
    dt = datetime.datetime(2024, 2, 14, 9, 30, tzinfo=UTC)
    us = int(dt.timestamp() * 1_000_000)
    idx = partition_index(us, 43200)
    floored = align_floor(dt, 43200)
    assert int(floored.timestamp() * 1_000_000) == idx * 43200 * 60_000_000
