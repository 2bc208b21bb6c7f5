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


def test_part_expr_exact_beyond_double_precision(spark, tmp_path):
    """r9: the partition-cell expression must be exact int64 end to end.
    The previous ``floor(epoch / width)`` float division loses integer
    precision above 2^53 µs — an int-axis epoch up in that range could
    land a row in one cell at write time while ``part_index_of`` prunes
    a different cell at read time, silently missing the row. The exact
    subtract-remainder ``div`` form must agree with Python ``//`` for
    huge positive, boundary, and NEGATIVE epochs."""
    from pyspark.sql import functions as F

    from meerschaum_spark.store import ParquetPipeStore

    store = ParquetPipeStore(spark, str(tmp_path), "pe", dt_col="t",
                             dt_is_int=True, dt_unit="microsecond",
                             chunk_minutes=43200)
    w = store.width_us
    # beyond-2^53 values where float floor(x / w) misrounds, plus exact
    # cell boundaries and negatives (floor, not truncation)
    vals = [
        (1 << 53) + 1, (1 << 60) - 1, (1 << 60), (1 << 60) + 1,
        5 * w, 5 * w - 1, 5 * w + 1, 0, 1, -1, -w, -w - 1, -w + 1,
        ((1 << 60) // w) * w, ((1 << 60) // w) * w - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "t long")
    got = {r["t"]: r["_mrsm_part"]
           for r in store.with_part(df).collect()}
    for v in vals:
        assert got[v] == v // w == store.part_index_of(v), (
            v, got[v], v // w)
