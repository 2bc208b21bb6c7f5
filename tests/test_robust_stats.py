"""Known-truth tests for the r10-tail robust statistics + ANN-curve
operators: each catalog query is replayed by an INDEPENDENT pure-Python
implementation over the same parquet (no SQL, no Spark) — the same
reference-twin discipline as the Holt/EWMA fold replays.

Reference parity: the reference engine's analytics surface (verify /
stats aggregates, meerschaum/utils/dataframe.py) has no robust-stats
member; Theil-Sen and MAD extend the stats_agg/anomaly family with
breakdown-resistant forms, exact-integer like the rest of the family.
"""

import math
from collections import defaultdict

import duckdb
import pytest

import meerschaum_spark.queries  # noqa: F401 — registers catalog entries
import meerschaum_spark.queries_llm  # noqa: F401
from meerschaum_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(cols: str):
    return duckdb.sql(
        f"select {cols} from '{SF}/events.parquet' "
        "where value is not null").fetchall()


def _micro(v: float) -> int:
    return int(math.floor(v * 1_000_000 + 0.5))


def test_theil_sen_matches_pure_python(spark):
    out = {r["event_type"]: r.asDict()
           for r in QUERIES["events_theil_sen_slope"](spark, SF).collect()}

    hourly = defaultdict(int)
    for t, us, v in _rows("event_type, epoch_us(ts), value"):
        hourly[(t, us // 3_600_000_000)] += _micro(v)
    by_type = defaultdict(dict)
    for (t, h), v in hourly.items():
        by_type[t][h] = v
    assert set(out) == set(by_type)
    for t, series in by_type.items():
        hs = sorted(series)
        slopes = []
        for i, h1 in enumerate(hs):
            for h2 in hs[i + 1:]:
                # python // floors — the exact semantics the engine and
                # oracle spell as subtract-nonneg-remainder-then-divide
                slopes.append(((series[h2] - series[h1]) * 1000)
                              // (h2 - h1))
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        assert out[t]["n_hours"] == len(hs)
        assert out[t]["n_pairs"] == len(slopes)
        assert out[t]["theil_sen_slope_scaled"] == med, t


def test_mad_outliers_matches_pure_python(spark):
    out = {r["event_type"]: r.asDict()
           for r in QUERIES["events_mad_outliers"](spark, SF).collect()}

    ys = defaultdict(list)
    for t, v in _rows("event_type, value"):
        ys[t].append(_micro(v))
    assert set(out) == set(ys)
    for t, vals in ys.items():
        vals.sort()
        med = vals[(len(vals) + 1) // 2 - 1]
        devs = sorted(abs(y - med) for y in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        n_out = sum(1 for d in devs if d > 3 * mad)
        assert out[t]["n_events"] == len(vals)
        assert out[t]["median_scaled"] == med
        assert out[t]["mad_scaled"] == mad
        assert out[t]["n_outliers"] == n_out, t


def test_changepoint_matches_pure_python(spark):
    out = {r["event_type"]: r.asDict()
           for r in QUERIES["events_changepoint"](spark, SF).collect()}

    hourly = defaultdict(int)
    for t, us, v in _rows("event_type, epoch_us(ts), value"):
        hourly[(t, us // 3_600_000_000)] += _micro(v)
    by_type = defaultdict(dict)
    for (t, h), vm in hourly.items():
        by_type[t][h] = vm // 1_000_000
    assert set(out) == set(by_type)
    for t, series in by_type.items():
        hs = sorted(series)
        ys = [series[h] for h in hs]
        n, tot = len(ys), sum(ys)
        best = None
        cs = 0
        for i in range(1, n):
            cs += ys[i - 1]
            gain = (cs * cs) // i + ((tot - cs) * (tot - cs)) // (n - i) \
                - (tot * tot) // n
            # argmax, tie -> smallest split hour (== smallest i)
            if best is None or gain > best[0]:
                best = (gain, i, cs)
        gain, i, cs = best
        assert out[t]["n_hours"] == n
        assert out[t]["split_h"] == hs[i - 1]
        assert out[t]["gain_proxy"] == gain
        assert out[t]["n_left"] == i and out[t]["n_right"] == n - i
        assert out[t]["mean_left_scaled"] == (cs * 1000) // i
        assert out[t]["mean_right_scaled"] == ((tot - cs) * 1000) // (n - i)


def test_pq_train_gain_lloyd_improves(spark):
    """One Lloyd iteration must not worsen quantization SSE (assignment
    fixed → mean is the L2 minimizer; reassignment only shrinks): the
    trained codebook beats the seeded rows on the real corpus."""
    rows = QUERIES["emb_pq_train_gain"](spark, SF).collect()
    assert [r["subspace"] for r in rows] == [0, 1]
    for r in rows:
        assert r["n_vecs"] > 0
        assert r["sse_trained"] < r["sse_seeded"]
        assert 1 <= r["n_cells_trained"] <= 16
        assert 1 <= r["n_cells_seeded"] <= 16


def test_pq_train_gain_known_truth(spark):
    """Hand-computed single-subspace fixture: two seeded codes at the
    corners, four vectors clustered around off-corner means — the
    trained centroids are the exact floor-division means and the SSE
    values match the by-hand fold."""
    from meerschaum_spark.functions import similarity as S

    vecs = {1: [0.0, 0.0], 2: [0.2, 0.0], 3: [1.0, 1.0], 4: [0.8, 1.0]}
    cb = {5: [0.4, 0.1], 6: [0.9, 0.9]}
    rows = [(i, v) for i, v in {**vecs, **cb}.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.pq_train_gain(
        df, [r for r in df.collect() if r["vec_id"] >= 5],
        subspaces=1, subdim=2).collect()
    assert len(out) == 1
    r = out[0]

    def q(x):
        return int(math.floor(float(x) * 1_000_000 + 0.5))

    allv = {i: [q(a) for a in v] for i, v in {**vecs, **cb}.items()}
    codes = {i: allv[i] for i in (5, 6)}

    def d(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    assign = {i: min(codes, key=lambda c: (d(v, codes[c]), c))
              for i, v in allv.items()}
    sse0 = sum(d(allv[i], codes[assign[i]]) for i in allv)
    cells = {}
    for i, c in assign.items():
        cells.setdefault(c, []).append(allv[i])
    means = {c: [sum(col) // len(vs) for col in zip(*vs)]
             for c, vs in cells.items()}
    sse1 = sum(min(d(v, mv) for mv in means.values())
               for v in allv.values())
    assert r["n_vecs"] == 6
    assert r["sse_seeded"] == sse0
    assert r["sse_trained"] == sse1


def test_survival_km_matches_pure_python(spark):
    """Pure-Python Kaplan-Meier replay: per-user first/conversion
    times, 30-day cohorts, right-censoring at the horizon, S(t) as the
    left-to-right prefix product — bit-compared against the query
    (both engines fold doubles in the same order)."""
    rows = duckdb.sql(
        f"select user_id, epoch_us(ts), event_type "
        f"from '{SF}/events.parquet'").fetchall()
    first, conv, horizon = {}, {}, 0
    for uid, us, et in rows:
        horizon = max(horizon, us)
        first[uid] = min(first.get(uid, us), us)
        if et == "purchase":
            conv[uid] = min(conv.get(uid, us), us)
    DAY = 86_400_000_000
    per_cohort = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for uid, f in first.items():
        cohort = f // (DAY * 30)
        if uid in conv:
            per_cohort[cohort][(conv[uid] - f) // DAY][0] += 1
        else:
            per_cohort[cohort][(horizon - f) // DAY][1] += 1
    expect = {}
    for cohort, days in per_cohort.items():
        at_risk = sum(d + c for d, c in days.values())
        surv = 1.0
        for day in sorted(days):
            d, c = days[day]
            if d > 0:
                surv = surv * (1.0 - d / at_risk)
                expect[(cohort, day)] = (at_risk, d, surv)
            at_risk -= d + c
    got = {(r["cohort"], r["day"]):
           (r["n_at_risk"], r["n_deaths"], r["survival"])
           for r in QUERIES["events_survival_km"](spark, SF).collect()}
    assert got == expect


def test_png_tiles_reconstruct_full_decode(spark):
    """The 2×2 tile fan-out must PARTITION the image: per doc, tile
    pixel sums add up to decode_png's full pixel_sum and tile dims
    tile the full raster — cross-checking the tiling path against the
    independent whole-image decode path."""
    full = {r["doc_id"]: r.asDict()
            for r in QUERIES["multimodal_png_decode"](spark, SF).collect()}
    tiles = defaultdict(list)
    for r in QUERIES["multimodal_image_tiles"](spark, SF).collect():
        tiles[r["doc_id"]].append(r.asDict())
    assert set(full) == set(tiles)
    for did, ts in tiles.items():
        assert len(ts) == 4
        assert sum(t["tile_pixel_sum"] for t in ts) == \
            full[did]["pixel_sum"]
        assert sum(t["tile_w"] for t in ts if t["tile_row"] == 0) == \
            full[did]["width"]
        assert sum(t["tile_h"] for t in ts if t["tile_col"] == 0) == \
            full[did]["height"]


def test_residual_pq_gain_known_truth(spark):
    """Hand-replayed fixture: 1 centroid at the origin makes residuals
    EQUAL raw vectors (rq == xq), so both SSE arms must coincide; with
    a centroid at the corpus center the residual arm wins."""
    from meerschaum_spark.functions import similarity as S

    # two clusters with IDENTICAL internal offsets around far-apart
    # centroids: 0/1 are the centroids, 2/3 cluster at (0,0)+δ,
    # 4/5 cluster at (1,1)+δ
    vecs = {0: [0.0, 0.0], 1: [1.0, 1.0],
            2: [0.1, 0.1], 3: [0.12, 0.08],
            4: [1.1, 1.1], 5: [1.12, 1.08]}
    df = spark.createDataFrame(list(vecs.items()),
                               "vec_id long, embedding array<float>")
    rows = df.collect()

    # single centroid ⇒ residual coding is a rigid TRANSLATION of both
    # vectors and codebook: the two SSE arms must be bit-equal
    cents0 = [r for r in rows if r["vec_id"] == 0]
    cb01 = [r for r in rows if r["vec_id"] < 2]
    out = S.residual_pq_gain(df, cents0, cb01, subspaces=1,
                             subdim=2).collect()[0]
    assert out["n_vecs"] == 6
    assert out["sse_raw_pq"] == out["sse_residual_pq"]

    # two cells + a ONE-ROW codebook from cluster A: raw PQ pays the
    # full inter-cluster distance for cluster B, residual PQ reuses
    # A's codeword because the residual distributions align — the
    # textbook reason IVFADC codes residuals
    cents2 = [r for r in rows if r["vec_id"] < 2]
    cb2 = [r for r in rows if r["vec_id"] == 2]
    out2 = S.residual_pq_gain(df, cents2, cb2, subspaces=1,
                              subdim=2).collect()[0]
    assert out2["sse_residual_pq"] < out2["sse_raw_pq"]


def test_ivfpq_nprobe_curve_invariants(spark):
    rows = QUERIES["emb_ivfpq_nprobe_curve"](spark, SF).collect()
    assert [r["nprobe"] for r in rows] == [1, 2, 4]
    base = rows[0]
    for r in rows:
        assert r["n_queries"] == base["n_queries"] > 0
        assert r["n_exact_pairs"] == 5 * r["n_queries"]
        assert 0 <= r["n_hits"] <= r["n_exact_pairs"]
        assert r["recall_at_5"] == pytest.approx(
            r["n_hits"] / r["n_exact_pairs"])


def test_png_decoder_adversarial_fuzz():
    """Hostile PNG buffers must fail CLEANLY (ValueError /
    NotImplementedError), never crash, hang, or allocate per a hostile
    header — the WKB-fuzz discipline applied to the tile decoder path
    (shared with decode_png): truncations, bit flips (CRC must catch),
    dimension lies, and giant claimed chunk lengths."""
    import random
    import struct
    import zlib

    from meerschaum_spark.functions.multimodal import (
        decode_png,
        decode_png_tile_sums,
        encode_png,
    )

    good = encode_png(seed=7, width=9, height=6)
    assert decode_png(good)["pixel_sum"] == \
        sum(t["tile_pixel_sum"] for t in decode_png_tile_sums(good))

    def assert_clean(buf):
        # EXACTLY the documented contract — no struct.error/zlib.error
        # escape hatch (ADVICE r10): the chunk walker bounds every
        # slice and wraps inflate failures in ValueError
        for fn in (decode_png, decode_png_tile_sums):
            try:
                fn(buf)
            except (ValueError, NotImplementedError):
                pass  # clean, typed failure

    rng = random.Random(42)
    # truncations at every prefix length band
    for cut in range(0, len(good), max(1, len(good) // 23)):
        assert_clean(good[:cut])
    # single-bit flips: CRC or structure must catch every one that
    # lands in a guarded region; decode must never crash untyped
    for _ in range(120):
        i = rng.randrange(len(good))
        flipped = bytearray(good)
        flipped[i] ^= 1 << rng.randrange(8)
        assert_clean(bytes(flipped))
    # dimension lie: IHDR says 100x100, IDAT holds a 9x6 raster
    lied = bytearray(good)
    struct.pack_into(">II", lied, 16, 100, 100)
    struct.pack_into(
        ">I", lied, 29,
        zlib.crc32(bytes(lied[12:29])) & 0xFFFFFFFF)
    assert_clean(bytes(lied))
    # hostile chunk length: header claims 2^31-1 bytes
    hostile = bytearray(good)
    struct.pack_into(">I", hostile, 33, 0x7FFFFFFF)
    assert_clean(bytes(hostile))


def test_markov_attribution_matches_pure_python(spark):
    """Independent journey extraction (python loops over raw parquet,
    no Spark windows) + the same integer absorption spec — the whole
    path from events to attribution shares must agree."""
    rows = duckdb.sql(
        f"select user_id, epoch_us(ts), event_id, event_type "
        f"from '{SF}/events.parquet'").fetchall()
    by_user = defaultdict(list)
    for uid, us, eid, et in rows:
        by_user[uid].append((us, eid, et))
    trans = defaultdict(int)
    for uid, evs in by_user.items():
        evs.sort()
        prev = "START"
        converted = False
        for _, _, et in evs:
            cur = "CONV" if et == "purchase" else et
            trans[(prev, cur)] += 1
            if cur == "CONV":
                converted = True
                break
            prev = cur
        if not converted:
            trans[(prev, "NULL")] += 1
    outs = defaultdict(int)
    for (s, _t), c in trans.items():
        outs[s] += c
    states = sorted(outs)
    SCALE, K = 10 ** 12, 12

    def absorb(removed):
        v = {s: 0 for s in states}
        for _ in range(K):
            nv = {}
            for s in states:
                tot = 0
                for (s2, t), c in trans.items():
                    if s2 != s:
                        continue
                    if t == "CONV":
                        val = SCALE
                    elif t == "NULL" or t == removed:
                        val = 0
                    else:
                        val = v.get(t, 0)
                    tot += c * val
                nv[s] = tot // outs[s]
            v = nv
        return v["START"]

    base = absorb(None)
    effs = {}
    for ch in sorted(s for s in states if s != "START"):
        effs[ch] = ((base - absorb(ch)) * 1_000_000) // base
    tot = sum(effs.values())
    got = {r["channel"]: r.asDict() for r in
           QUERIES["events_markov_attribution"](spark, SF).collect()}
    assert set(got) == set(effs)
    for ch, eff in effs.items():
        assert got[ch]["base_p_scaled"] == base
        assert got[ch]["removal_effect_fp"] == eff
        assert got[ch]["attribution_share_fp"] == (eff * 1_000_000) // tot


def test_theil_sen_guard_errors_on_overflow(spark):
    """The O(T2) pair join must refuse task-side (typed job failure,
    no driver collect) when a series exceeds max_points."""
    from pyspark.errors import SparkRuntimeException

    from meerschaum_spark.functions.robust import theil_sen_pairs

    pts = spark.createDataFrame(
        [("a", i, i * 2) for i in range(30)], "s string, x long, y long")
    with pytest.raises(SparkRuntimeException, match="max_points"):
        theil_sen_pairs(pts, ["s"], "x", "y", max_points=10).collect()
    # under the cap: full pair set, exact slopes
    ok = theil_sen_pairs(pts, ["s"], "x", "y", max_points=30).collect()
    assert len(ok) == 30 * 29 // 2
    assert all(r["slope"] == 2000 for r in ok)


def test_theil_sen_guard_sample_mode(spark):
    """on_overflow='sample': deterministic stride keeps <= max_points
    per series (first point always kept), slopes stay exact."""
    from meerschaum_spark.functions.robust import theil_sen_pairs

    pts = spark.createDataFrame(
        [("a", i, 7 * i) for i in range(100)]
        + [("b", i, -3 * i) for i in range(5)],
        "s string, x long, y long")
    out = theil_sen_pairs(pts, ["s"], "x", "y", max_points=10,
                          on_overflow="sample").collect()
    xs_a = sorted({r["h1"] for r in out if r["s"] == "a"}
                  | {r["h2"] for r in out if r["s"] == "a"})
    assert len(xs_a) == 10 and xs_a[0] == 0  # ceil(100/10)=10 stride
    assert xs_a == list(range(0, 100, 10))
    assert all(r["slope"] == 7000 for r in out if r["s"] == "a")
    # series under the cap is untouched (negative slope floors exactly)
    assert sum(1 for r in out if r["s"] == "b") == 5 * 4 // 2
    assert all(r["slope"] == -3000 for r in out if r["s"] == "b")
    with pytest.raises(ValueError, match="error|sample"):
        theil_sen_pairs(pts, ["s"], "x", "y", on_overflow="nope")


def test_video_container_adversarial_fuzz():
    """The MPNG video container walker shares the codec fuzz
    contract: truncations, bit flips, hostile frame counts/lengths,
    and trailing garbage all fail with typed ValueError (or the
    decoder's NotImplementedError), never an untyped crash or a
    hostile-header allocation — and the good path round-trips the
    closed-form sums."""
    import random
    import struct

    from meerschaum_spark.functions.multimodal import (
        decode_png,
        decode_video_frames,
        encode_png,
        encode_video,
    )

    good = encode_video(11)  # 15 wide, 4 tall, 2 + 11 % 5 = 3 frames
    frames = decode_video_frames(good, stride=1)
    assert len(frames) == 2 + 11 % 5
    for fr in frames:
        png = encode_png((11 + 17 * fr["frame_idx"]) % 256,
                         fr["width"], fr["height"])
        assert fr["pixel_sum"] == decode_png(png)["pixel_sum"]
    # stride sampling picks exactly the even indices
    assert [f["frame_idx"] for f in decode_video_frames(good, 2)] == \
        [f for f in range(2 + 11 % 5) if f % 2 == 0]

    def assert_clean(buf):
        try:
            decode_video_frames(buf)
        except (ValueError, NotImplementedError):
            pass

    rng = random.Random(7)
    for cut in range(0, len(good), max(1, len(good) // 23)):
        assert_clean(good[:cut])
    for _ in range(120):
        i = rng.randrange(len(good))
        flipped = bytearray(good)
        flipped[i] ^= 1 << rng.randrange(8)
        assert_clean(bytes(flipped))
    # hostile frame count: header claims 2^31 frames
    hostile = bytearray(good)
    struct.pack_into(">I", hostile, 4, 0x80000000)
    assert_clean(bytes(hostile))
    # hostile frame length: first frame claims 2^31-1 bytes
    hostile = bytearray(good)
    struct.pack_into(">I", hostile, 8, 0x7FFFFFFF)
    assert_clean(bytes(hostile))
    # trailing garbage after the last frame
    assert_clean(good + b"x")
    # bad stride is a domain error
    try:
        decode_video_frames(good, stride=0)
        raise AssertionError("stride 0 accepted")
    except ValueError:
        pass
