"""Gate-fidelity lint: flag oracle constructs whose cross-engine result
is sensitive to the DuckDB *version* the driver happens to run.

Background (r8 post-mortem): three catalog queries went driver-red
hash-only while passing the local full-precision gate byte-for-byte and
staying bit-stable across repeated local runs — same seed-42 data, same
code, session tz pinned by the ``@query`` wrapper. The local gate runs
builder-side DuckDB on both ends of its compare, so it is structurally
blind to divergence that only appears under the driver's (different)
DuckDB build. The divergence mechanisms are real and locally
demonstrable on synthetic values (see test_boundary_mechanism below);
the r8 reds each sat on one of them:

- ``events_stats_agg_linear``: ``CAST(decimal(38,0) AS VARCHAR) AS
  DOUBLE`` on >2^53 magnitudes divided in double — Java
  ``BigDecimal.doubleValue`` vs strtod can double-round differently.
- ``customer_rfm_segments``: ``date_diff('day', ts, ts)`` on raw
  timestamps (semantics changed across DuckDB releases) plus a
  double→decimal(18,6) cast in the rank key.
- ``pipe_verify_backfill``: a per-row double→decimal(18,6)→VARCHAR
  render inside a hashed digest.

All three were rewritten to pure integer/epoch arithmetic in r9. This
lint keeps the catalog free of the motifs so the reds cannot recur.
"""

from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def oracles() -> dict[str, str]:
    import meerschaum_spark.queries  # noqa: F401
    import meerschaum_spark.queries_llm  # noqa: F401
    from meerschaum_spark.catalog import ORACLE

    return dict(ORACLE)


def test_no_timestamp_date_diff(oracles):
    """``date_diff(unit, a, b)`` on raw TIMESTAMP arguments counts
    boundary crossings in some DuckDB versions and complete units in
    others — for EVERY unit, not just 'day'. Only DATE-typed arguments
    (literal or CAST(… AS DATE)) are version-stable.

    Flags on non-capture failure (anything after the unit comma that
    does not start with DATE/CAST), so parenthesized first arguments,
    scalar subqueries, and string literals cannot silently escape; any
    ``date_diff(`` call whose unit is not a plain quoted word is
    flagged outright."""
    unit_call = re.compile(r"date_diff\(\s*'\w+'\s*,\s*([^\s,][^,]{0,60})",
                           re.I)
    any_call = re.compile(r"date_diff\s*\(", re.I)
    date_arg = re.compile(r"(?i)^(DATE\b|CAST\s*\()")
    bad = set()
    for n, sql in oracles.items():
        matches = list(unit_call.finditer(sql))
        if len(any_call.findall(sql)) != len(matches):
            bad.add(n)  # unit not a plain quoted word — can't audit it
            continue
        if any(not date_arg.match(m.group(1).lstrip()) for m in matches):
            bad.add(n)
    assert not bad, (
        f"oracle(s) use date_diff on non-DATE args: {sorted(bad)} "
        "— cast both arguments to DATE or use epoch-µs integer division"
    )


def test_no_per_row_decimal_render_in_digests(oracles):
    """``CAST(x AS DECIMAL(p,s)) … AS VARCHAR`` renders a double through
    an engine-version-sensitive rounding path; inside a hashed digest a
    single 1-ulp flip shifts the hash. Digest inputs must be integers
    (``CAST(floor(x * 10^s + 0.5) AS BIGINT)`` is one IEEE double
    expression, bit-identical everywhere) or raw strings."""
    # scale >= 1 (a fractional render): scale-0 decimal→VARCHAR is the
    # exact-integer-digits bridge and is version-stable. Exclude
    # occurrences immediately re-cast to DOUBLE — that is the
    # varchar-double bridge audited by the frozen inventory below.
    motif = re.compile(
        r"CAST\([^()]*\bAS\s+DECIMAL\(\d+,\s*[1-9]\d*\)\)\s*"
        r"AS\s+VARCHAR\s*\)(?!\s*AS\s+DOUBLE)",
        re.I,
    )
    bad = {n for n, sql in oracles.items() if motif.search(sql)}
    assert not bad, (
        f"oracle(s) render a decimal cast to VARCHAR per-row: {sorted(bad)}"
    )


def test_varchar_double_inventory_frozen(oracles):
    """The ``CAST(… AS VARCHAR) AS DOUBLE`` bridge (exact decimal →
    rendered digits → strtod) is the catalog's canonical way to surface
    an exact decimal sum as a double, and it is version-stable **only
    below 2^53** where the varchar and direct conversion agree exactly.
    Freeze the set of queries using it so any NEW query consciously
    opts in (add it here with a magnitude argument) instead of
    inheriting the >2^53 trap that made events_stats_agg_linear
    driver-red in r8."""
    motif = re.compile(r"AS\s+VARCHAR\s*\)\s*AS\s+DOUBLE", re.I)
    users = {n for n, sql in oracles.items() if motif.search(sql)}
    # every current user surfaces an aggregate bounded far below 2^53 at
    # gate scale (sf0.01 sums ≤ ~1e12; dot products ≤ ~1e6)
    frozen = users - _VARCHAR_DOUBLE_ALLOWED
    assert not frozen, (
        "new oracle(s) adopt CAST(… AS VARCHAR) AS DOUBLE: "
        f"{sorted(frozen)} — verify the decimal magnitude stays < 2^53 "
        "at gate scale, then add to _VARCHAR_DOUBLE_ALLOWED"
    )


# literal (not derived from the live catalog — that would be vacuous):
# the r9 audit of all 46 users, each surfacing an aggregate bounded far
# below 2^53 at gate scale (sf0.01 decimal sums ≤ ~1e12; unit-norm dot
# products ≤ ~1e6; counts/squares in hhi/gini ≤ ~1e13)
_VARCHAR_DOUBLE_ALLOWED = frozenset({
    # r10: doc_hybrid_rrf / emb_mmr_diversify reuse the cosine _DOT
    # VARCHAR-cast discipline; the decimals are 64-dim float dot
    # products (|v| <= tens), far below 2^53 at any gate scale
    "doc_hybrid_rrf", "emb_mmr_diversify",
    "emb_ann_lsh_topk", "emb_ann_recall", "emb_centroid_stats",
    "emb_cosine_topk", "emb_ivf_recall", "emb_ivf_topk",
    "emb_jl_distortion", "emb_kmeans", "emb_matryoshka_recall",
    "emb_near_dup_clusters", "emb_near_dup_pairs", "emb_semantic_dedup",
    "events_acf_hourly", "events_anomaly_zscore", "events_counter_delta",
    "events_daily_cube", "events_gapfill_interp", "events_gapfill_locf",
    "events_gini_activity", "events_hourly_rollup", "events_json_extract",
    "events_seasonal_profile", "events_time_weighted_avg",
    "nation_supplier_hhi", "pipe_rollup_incremental",
    "q10_returned_items", "q11_important_stock", "q14_promo_share",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive_pushdown",
    "q1_pricing_summary", "q20_excess_share_suppliers",
    "q22_idle_customers", "q2_min_cost_supplier", "q3_shipping_priority",
    "q5_region_revenue", "q6_revenue_forecast", "q7_nation_trade_flow",
    "q9_product_profit", "streaming_hourly_rollup",
    "streaming_interval_join", "streaming_pipe_sync",
    "streaming_rollup_maintenance", "top_brands_by_revenue",
})


def test_money_columns_are_two_decimal():
    """The catalog's ``CAST(<double col> AS DECIMAL(18,6))`` aggregates
    are version-stable only because the source doubles carry ≤2 decimal
    digits (the 6th-decimal rounding then has a ~1e-5 margin on both
    engines). If a driver data regeneration ever ships full-precision
    doubles, this fails loudly BEFORE the driver gate does."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    probes = {
        "events.value": "value",
        "orders.o_totalprice": "o_totalprice",
        "lineitem.l_extendedprice": "l_extendedprice",
        "lineitem.l_discount": "l_discount",
        "lineitem.l_tax": "l_tax",
        "lineitem.l_quantity": "l_quantity",
        "customer.c_acctbal": "c_acctbal",
    }
    for label, col in probes.items():
        table = label.split(".")[0]
        off = con.execute(
            f"SELECT max(abs({col} * 100 - round({col} * 100))) "
            f"FROM read_parquet('/root/testdata/sf0.01/{table}.parquet') "
            f"WHERE {col} IS NOT NULL"
        ).fetchone()[0]
        assert off is not None and off < 1e-6, (
            f"{label} carries more than 2 decimal digits (max offset "
            f"{off}) — every CAST(… AS DECIMAL) oracle over it is now "
            "on an engine-version-sensitive rounding boundary"
        )


_TWO50 = 1 << 50  # margin below 2^53: output magnitudes grow with sf


def _wide_cells(row, cols) -> list:
    """The executable-lint cell check: Decimal/float cells at ≥ 2^50
    magnitude, or ints outside int64 (a HUGEINT output) — every type a
    driver-side pandas/float64 materialization silently rounds."""
    from decimal import Decimal

    return [
        (cols[i], v) for i, v in enumerate(row)
        if (isinstance(v, (Decimal, float)) and abs(v) >= _TWO50)
        or (isinstance(v, int) and not isinstance(v, bool)
            and not -(1 << 63) <= v < (1 << 63))
    ]


def test_wide_cell_check_sensitivity():
    """The scan must flag exactly the value classes that made
    events_stats_agg_linear / pipe_verify_backfill driver-red — and
    must NOT flag the classes that have always been driver-green
    (BIGINT-range ints at any magnitude, small decimals, strings)."""
    from decimal import Decimal

    flagged = _wide_cells(
        (Decimal(2) ** 54,        # the r9 red: wide decimal
         float(2 ** 54),          # wide float
         1 << 70,                 # HUGEINT output (int64 overflow)
         ), ["d", "f", "h"])
    assert [c for c, _ in flagged] == ["d", "f", "h"]
    assert not _wide_cells(
        ((1 << 60),               # 60-bit hash as BIGINT: green for rounds
         -(1 << 62),
         Decimal("123.456"),
         0.5, "x", None, True), ["a", "b", "c", "d", "e", "f", "g"])


def test_no_wide_exact_output_cells(oracles):
    """EXECUTE every oracle at sf0.01 and assert no result cell is a
    Decimal or float with |v| >= 2^50 (or an int past int64 range,
    i.e. a HUGEINT output).

    This is the scan that isolated the r8/r9 driver reds: across all
    182 oracles, exactly the two hash-red queries — and no others —
    emitted DECIMAL values past 2^53, where a driver-side pandas/float64
    materialization (DuckDB's ``.df()`` returns float64 for
    DECIMAL(38,0) and HUGEINT) silently rounds to 17 significant digits
    on one side of the hash. BIGINT cells are exempt: pandas int64
    carries them losslessly at any magnitude (the 60-bit hash columns
    have been driver-green for rounds). 2^50 leaves headroom for
    magnitude growth with sf; values that legitimately exceed it must
    be re-emitted as split BIGINT sums (hi/lo), fixed-point BIGINT, or
    exact digit strings (see pipe_verify_backfill /
    events_stats_agg_linear)."""
    import os

    duckdb = pytest.importorskip("duckdb")
    sf_dir = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no testdata at {sf_dir}")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(path):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')")
    bad = []
    for name, sql in sorted(oracles.items()):
        rel = con.execute(sql)
        cols = [d[0] for d in rel.description]
        for row in rel.fetchall():
            hit = _wide_cells(row, cols)
            if hit:
                col, v = hit[0]
                bad.append(f"{name}.{col} = {v}")
                break
    assert not bad, (
        "oracle(s) emit exact-typed cells >= 2^50 — driver-side float64 "
        "materialization will silently round them past 2^53 and the "
        f"hash gate goes red: {bad}"
    )


def test_boundary_mechanism():
    """Demonstrate the divergence mechanism the lint guards against:
    double→decimal(18,6) rounding on 6th-decimal boundary values differs
    between DuckDB (exact binary expansion / round-down here) and Spark
    (shortest-repr string, HALF_UP) — measured locally in r9, five of
    five probe values flipped. The r8 data could not hit it (2-decimal
    money values), which is why the local gate stayed green while the
    driver's different DuckDB build found divergence elsewhere; the fix
    is to keep such casts out of hashed/per-row paths entirely."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    v = 2.0000005  # double is 2.00000049999…: exact expansion < half
    duck = con.execute(f"SELECT CAST({v!r} AS DECIMAL(18,6))").fetchone()[0]
    # Spark renders via shortest repr "2.0000005" then HALF_UP → 2.000001
    assert str(duck) in {"2.000000", "2.000001"}
    # the two legal answers differ — the motif is inherently bistable
    assert str(duck) == "2.000000", (
        "local DuckDB changed its double→decimal rounding path; "
        "re-audit every CAST(double AS DECIMAL) oracle"
    )


def test_markov_channels_match_fixtures():
    """events_markov_attribution's oracle unrolls one static CTE ladder
    per channel in ``_MA_CHANNELS`` while the Spark side derives the
    channel list from the data (ADVICE r10): if a gated fixture gains
    or loses an event type, the oracle emits a fixed 4 rows and the
    engine emits per-data rows — a silent row-count mismatch. Execute
    the coupling against the real parquet for every gated sf."""
    import os

    duckdb = pytest.importorskip("duckdb")
    from meerschaum_spark.queries import _MA_CHANNELS

    checked = 0
    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.isfile(path):
            continue
        con = duckdb.connect()
        got = {r[0] for r in con.execute(
            "SELECT DISTINCT event_type FROM read_parquet(?) "
            "WHERE event_type <> 'purchase'", [path]).fetchall()}
        assert got == set(_MA_CHANNELS), (
            f"{sf}: fixture channels {sorted(got)} != _MA_CHANNELS "
            f"{sorted(_MA_CHANNELS)} — regenerate the oracle ladder "
            "(queries.py _MA_CHANNELS) to match the data"
        )
        checked += 1
    if not checked:
        pytest.skip("no testdata fixtures present")


def test_no_array_or_map_output_columns(oracles):
    """No gated query may emit an ARRAY/LIST, MAP, or STRUCT output
    column (r11 post-mortem): the driver's correctness harness
    canonicalizes both result frames through pandas ``sort_values``,
    which factorizes cells via a hash table — numpy arrays are
    unhashable, so an array-typed column makes the gate crash with
    ``TypeError: unhashable type: 'numpy.ndarray'`` REGARDLESS of the
    values (streaming_holt_winters was driver-red for exactly this in
    r11 while hash-exact under the local gate). Nested state must be
    rendered canonically scalar — ``array_join``/``array_to_string`` to
    a string, or one row per slot. Schema-only check: DuckDB binds the
    oracle without executing it, so this runs in milliseconds per query.
    Same discipline as the 2^50-Decimal lint: the thing that breaks is
    the driver's materialization layer, not the engine."""
    import os

    duckdb = pytest.importorskip("duckdb")
    sf_dir = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"no testdata at {sf_dir}")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isfile(path):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')")
    bad = []
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            ts = str(typ)
            if "[]" in ts or ts.startswith(("MAP(", "STRUCT(", "UNION(")):
                bad.append(f"{name}.{col}: {ts}")
    assert not bad, (
        "gated output schema(s) carry nested types — the driver's pandas "
        "sort_values canonicalizer cannot hash them and the row goes red "
        f"on a TypeError, never on values: {bad}"
    )
