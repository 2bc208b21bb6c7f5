"""Property-based tests (hypothesis) over the pure driver-side kernels —
the invariants the distributed operators are built on. Mirrors the
reference's generative test style (tests/ uses parameterized flavors; we
generate inputs instead)."""

import datetime
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from meerschaum_spark.chunks import get_chunk_bounds
from meerschaum_spark.dtypes import (
    canonical_dtype,
    canonical_json,
    widen_dtypes,
)
from meerschaum_spark.registry import _match_tag_groups

DTYPES = st.sampled_from([
    "int8", "int16", "int32", "int64", "float32", "float64",
    "numeric", "numeric(10,2)", "str", "datetime", "date", "bool",
    "json", "uuid", "bytes",
])


@given(a=DTYPES, b=DTYPES)
def test_widen_is_commutative_on_bases(a, b):
    """Widening must not depend on which side arrived first, except for
    the explicit-args preference (same base keeps the old side's args)."""
    ab, ba = widen_dtypes(a, b), widen_dtypes(b, a)
    base = lambda d: d.split("(")[0]
    assert base(ab) == base(ba)


@given(a=DTYPES)
def test_widen_is_idempotent(a):
    w = widen_dtypes(a, a)
    assert w == canonical_dtype(a)
    assert widen_dtypes(w, a) == w


@given(a=DTYPES, b=DTYPES)
def test_widen_is_absorbing(a, b):
    """Once widened, adding either original side again changes nothing —
    the registry never flip-flops dtypes across syncs."""
    w = widen_dtypes(a, b)
    assert widen_dtypes(w, a) == w
    assert widen_dtypes(w, b) == w


JSON_VALUES = st.recursive(
    st.none() | st.booleans() | st.integers(-2**31, 2**31)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=10,
)


@given(obj=JSON_VALUES)
def test_canonical_json_is_stable_and_sorted(obj):
    """Canonical JSON must be loadable, key-sorted at every level, and a
    fixed point — it is the row-identity serialization for the diff.
    (Top-level strings are excluded: a non-JSON string passes through
    verbatim by design, mirroring the reference's attempt-parse.)"""
    if isinstance(obj, str):
        return
    s = canonical_json(obj)
    if s is None:
        return
    loaded = json.loads(s)
    assert canonical_json(loaded) == s

    def keys_sorted(x):
        if isinstance(x, dict):
            ks = list(x.keys())
            return ks == sorted(ks) and all(keys_sorted(v)
                                            for v in x.values())
        if isinstance(x, list):
            return all(keys_sorted(v) for v in x)
        return True
    assert keys_sorted(loaded)


@st.composite
def _bounds(draw):
    # tz-aware: the engine's canonical axis is µs-UTC; get_chunk_bounds
    # normalizes naive input to UTC, so aware input round-trips exactly
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    b_off = draw(st.integers(0, 10_000_000))
    minutes = draw(st.integers(1, 120_000))
    # cap the span at ~500 chunks so a 1-minute grid stays fast
    width = draw(st.integers(1, min(10_000_000, minutes * 60 * 500)))
    begin = base + datetime.timedelta(seconds=b_off)
    end = begin + datetime.timedelta(seconds=width)
    return begin, end, minutes


@settings(max_examples=60, deadline=None)
@given(args=_bounds())
def test_chunk_bounds_tile_exactly(args):
    """The chunk grid must tile [begin, end) exactly: contiguous,
    non-overlapping, clipped at both ends, every window non-empty —
    the invariant verify/clear/partitioning all lean on."""
    begin, end, minutes = args
    chunks = list(get_chunk_bounds(begin, end, minutes))
    assert chunks, (begin, end, minutes)
    assert chunks[0][0] == begin
    assert chunks[-1][1] == end
    for (b1, e1), (b2, e2) in zip(chunks, chunks[1:]):
        assert e1 == b2          # contiguous, no gap, no overlap
    assert all(b < e for b, e in chunks)
    width = datetime.timedelta(minutes=minutes)
    assert all(e - b <= width for b, e in chunks)


@settings(max_examples=60, deadline=None)
@given(args=_bounds())
def test_chunk_bounds_interior_edges_are_aligned(args):
    """Interior edges snap to the epoch grid — two overlapping verify
    runs produce the SAME windows, so their partition writes never
    interleave."""
    begin, end, minutes = args
    width_us = minutes * 60_000_000
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    for b, e in get_chunk_bounds(begin, end, minutes):
        if e != end:  # interior edge
            off = int((e - epoch).total_seconds() * 1_000_000)
            assert off % width_us == 0


TAGS = st.lists(st.sampled_from(["a", "b", "c", "_a", "_b", "a,b",
                                 "a,_c", "_a,_b"]), max_size=3)
DOC_TAGS = st.sets(st.sampled_from(["a", "b", "c"]), max_size=3)


@given(doc_tags=DOC_TAGS, tags=TAGS)
def test_tag_groups_match_reference_semantics(doc_tags, tags):
    """OR of groups; AND within a group; '_' negates: re-derive the
    expected result naively and compare."""
    if not tags:
        return
    expected = False
    for group in (t.split(",") for t in tags):
        ins = [t for t in group if not t.startswith("_")]
        exs = [t[1:] for t in group if t.startswith("_")]
        if all(t in doc_tags for t in ins) and \
                not any(t in doc_tags for t in exs):
            expected = True
    assert _match_tag_groups(doc_tags, tags) == expected


def test_rollup_bucket_floor_is_exact_via_product_expr(tmp_path):
    """Drive the REAL _rollup_bucket expression (int-axis form) through
    Spark over adversarial epoch values — exact-multiple boundaries,
    off-by-one-microsecond neighbors, negative epochs — and check the
    mathematical floor-to-multiple. A double-division floor (the bug
    this formula replaced) rounds at exactly these boundaries."""
    from meerschaum_spark.session import get_spark
    from meerschaum_spark.pipe import Pipe

    spark = get_spark("meerschaum_spark_tests")
    pipe = Pipe("prop", "bucket", instance=str(tmp_path), spark=spark,
                columns={"datetime": "k", "id": "k"},
                parameters={"precision": {"unit": "microsecond"},
                            "rollups": [{"name": "h", "interval": "hour"}]},
                dtypes={"k": "int64"})
    width = 3_600_000_000
    vals = []
    for base in (-(10**15), -width, 0, width, 7 * width, 10**15):
        vals += [base - 1, base, base + 1]
    df = spark.createDataFrame([(v,) for v in vals], "k long")
    conf = pipe._rollup_confs[0]
    got = [r["k"] for r in
           df.select(pipe._rollup_bucket(conf)).collect()]
    expect = [v - (((v % width) + width) % width) for v in vals]
    assert got == expect
    for v, b in zip(vals, got):
        assert b % width == 0 and b <= v < b + width


@given(n=st.integers(min_value=1, max_value=10_000),
       unit=st.sampled_from(["seconds", "minutes", "hours", "days",
                             "weeks"]))
def test_prune_duration_grammar_roundtrips(n, unit):
    """Every 'N unit' string the prune API documents parses to the
    matching positive second count."""
    from meerschaum_spark.streaming.schedule import parse_schedule
    sched = parse_schedule(f"every {n} {unit}")
    per = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400,
           "weeks": 604800}[unit]
    assert sched.seconds == float(n * per)


@given(seed=st.integers(0, 255), width=st.integers(1, 24),
       height=st.integers(1, 20))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_matches_closed_form(seed, width, height):
    """decode(encode(seed, w, h)) recovers the dimensions and the exact
    closed-form pixel sum for EVERY geometry, including single-row /
    single-column images and every filter-type mix (height < 5 exercises
    a prefix of the None/Sub/Up/Average/Paeth cycle)."""
    from meerschaum_spark.functions import multimodal as M

    png = M.encode_png(seed, width, height)
    assert png == M.encode_png_scalar(seed, width, height)
    d = M.decode_png(png)
    n = 3 * width * height

    def s(m):
        return (m // 256) * 32640 + (m % 256) * ((m % 256) - 1) // 2

    assert (d["width"], d["height"]) == (width, height)
    assert d["n_pixel_bytes"] == n
    assert d["pixel_sum"] == s(seed + n) - s(seed)


@given(values=st.lists(st.integers(-10_000, 10_000), min_size=1,
                       max_size=200))
@settings(max_examples=60, deadline=None)
def test_histogram_quantile_rank_bounds(values):
    """The integer ceil-rank forms used by events_quantile_histogram_est
    pick a bin whose cumulative count covers the target rank, and the
    resulting estimate brackets the true quantile to within one bin
    width (0.5)."""
    vals = sorted(v / 100.0 for v in values)
    n = len(vals)
    import math
    for p, rank in ((0.5, (n + 1) // 2), (0.9, (9 * n + 9) // 10),
                    (0.99, (99 * n + 99) // 100)):
        assert rank == math.ceil(p * n) or n * p == int(n * p), (p, n)
        assert 1 <= rank <= n
        # replicate the sketch: bin = floor(v*2), estimate = bin*0.5 of
        # the first bin whose cumulative count >= rank
        bins = {}
        for v in vals:
            b = math.floor(v * 2)
            bins[b] = bins.get(b, 0) + 1
        cum = 0
        est = None
        for b in sorted(bins):
            cum += bins[b]
            if cum >= rank:
                est = b * 0.5
                break
        true_q = vals[rank - 1]  # rank-th smallest
        assert est is not None
        assert est <= true_q < est + 0.5


# ---------------------------------------------------------------------------
# store.replace_range ≡ delete_where(range) + append  (the r6 rollup
# publication primitive — hypothesis locks the strand-fix against
# regression, including emptied-cell and staging-only-cell edges)
# ---------------------------------------------------------------------------

@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_replace_range_equiv_delete_plus_append(data, spark):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from meerschaum_spark.store import ParquetPipeStore

    base = data.draw(st.lists(st.integers(0, 300), unique=True,
                              min_size=0, max_size=25), label="base_epochs")
    b = data.draw(st.integers(0, 300), label="begin_s")
    width = data.draw(st.integers(1, 200), label="width_s")
    e = b + width
    # recompute rows MUST lie inside [b, e) per the contract; empty is the
    # emptied-cell edge (the range's rows vanish entirely)
    new = data.draw(st.lists(st.integers(b, e - 1), unique=True,
                             min_size=0, max_size=15), label="new_epochs")

    root = tempfile.mkdtemp(prefix="mrsm_rr_prop_")
    try:
        def mk(target):
            s = ParquetPipeStore(spark, root, target, dt_col="dt",
                                 dt_is_int=True, dt_unit="second",
                                 chunk_minutes=1)
            if base:
                s.append(spark.createDataFrame(
                    [(t, f"base{t}") for t in base], "dt long, v string"))
            return s

        new_df_schema = "dt long, v string"
        new_rows = [(t, f"new{t}") for t in new]
        a = mk("via_replace")
        a.replace_range(
            spark.createDataFrame(new_rows, new_df_schema),
            begin_us=b * 1_000_000, end_us=e * 1_000_000)

        c = mk("via_two_step")
        c.delete_where((F.col("dt") >= b) & (F.col("dt") < e),
                       begin_us=b * 1_000_000, end_us=e * 1_000_000)
        c.append(spark.createDataFrame(new_rows, new_df_schema))

        got = sorted((r["dt"], r["v"]) for r in a.read().collect())
        want = sorted((r["dt"], r["v"]) for r in c.read().collect())
        assert got == want
        # closed form: rows outside [b, e) kept, inside replaced by new
        expect = sorted([(t, f"base{t}") for t in base
                         if not (b <= t < e)] + new_rows)
        assert got == expect
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(max_examples=60, deadline=None)
@given(st.integers(-10**15, 10**15), st.integers(1, 10**9))
def test_floordiv_sql_matches_python_floor(num, den):
    """catalog.floordiv_sql must equal python's // (true floor) for
    BOTH numerator signs in DuckDB — the cross-engine spell every
    fixed-point operator leans on."""
    import duckdb

    from meerschaum_spark.catalog import floordiv_sql

    got = duckdb.sql(
        f"SELECT {floordiv_sql(str(num), str(den))} AS v").fetchone()[0]
    assert got == num // den


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10**7))
def test_png_mod_sum_closed_form(m):
    """queries_llm._png_mod_sum(m) must equal Σ_{k<m} (k % 256) — the
    closed form every tile/pixel oracle derives sums from."""
    import duckdb

    from meerschaum_spark.queries_llm import _png_mod_sum

    got = duckdb.sql(f"SELECT {_png_mod_sum(str(m))} AS v").fetchone()[0]
    full, rem = divmod(m, 256)
    assert got == full * 32640 + rem * (rem - 1) // 2
    if m <= 4096:
        assert got == sum(k % 256 for k in range(m))
