"""Scale soak under pytest: the heaviest families run at 1× and 6× on a
seeded synthetic corpus and must stay near-linear — the in-CI version of
``scripts/scale_soak.py`` (which produces SCALE.md at 1×/10×).

Deterministic: the corpus derives entirely from xxhash64(id, seed). The
runtime assertion is deliberately loose (machine-load tolerant) but
tight enough that a quadratic blowup — like the uncapped-LSH mega-bucket
explosion this harness caught in r7 (134× superlinear, see SCALE.md) —
fails it by an order of magnitude.
"""

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow

SCALE = 6
FAMILIES = ["pipe_sync_diff", "pipe_ingest_dedup", "doc_domain_caps",
            "doc_minhash_lsh", "doc_bigram_lm", "events_lttb",
            "graph_pagerank", "events_sweep_concurrency",
            # r9: the genuinely-quadratic-worst-case similarity joins +
            # SymSpell — candidate volume must track the true result,
            # never |n|² (the r7 LSH lesson, applied before it burns)
            "doc_prefix_jaccard", "doc_containment", "symspell_join",
            "doc_containment_zipf",
            # r10: iterated BPE (per-round one-row collect cadence) and
            # the maximal-span window family (fine-grained diagonal
            # keys) — the shapes whose skew behavior should be
            # measured, not argued. doc_containment_forced is NOT here:
            # it is the kept-on-purpose quadratic row in SCALE.md.
            "doc_bpe_train", "doc_bpe_encode", "doc_dup_spans",
            # r10 second block: keyness — corpus-scale explode+agg,
            # vocabulary-sized tail
            "doc_keyness",
            # r10 tail: per-series cumsum + rank over hourly aggs
            "events_changepoint",
            # r11: the maintained ANN index 3-sync replay — encode is a
            # literal-codebook projection, maintenance O(patch files)
            "pipe_ann_index",
            # r13 third block: rolling distinct actives (one dedupe
            # shuffle + ×7 explode on the distinct frame) and map-only
            # video stride-decode
            "events_rolling_actives", "multimodal_video_frames"]


@pytest.fixture(scope="module")
def soak_results(spark):
    from meerschaum_spark.plans.soak import generate_corpus, run_families
    work = tempfile.mkdtemp(prefix="mrsm_soak_test_")
    try:
        out = {}
        # tiny warmup so the 1× numbers measure work, not JVM first-touch
        warm = os.path.join(work, "warm")
        generate_corpus(spark, warm, 80, 1_500)
        run_families(spark, warm, work, families=FAMILIES)
        for label, (n_docs, n_events) in {
            "1x": (500, 15_000),
            "big": (500 * SCALE, 15_000 * SCALE),
        }.items():
            d = os.path.join(work, label)
            generate_corpus(spark, d, n_docs, n_events)
            out[label] = run_families(spark, d, work, families=FAMILIES)
        yield out
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.parametrize("family", FAMILIES)
def test_family_stays_near_linear(soak_results, family):
    """6× data must cost well under quadratic (36×); the bound allows
    linear scaling plus generous machine-load slack."""
    t1 = soak_results["1x"][family]["sec"]
    tb = soak_results["big"][family]["sec"]
    assert tb <= max(3.0 * SCALE * t1, t1 + 8.0), (
        f"{family}: {t1:.2f}s → {tb:.2f}s at {SCALE}× data — "
        f"superlinear blowup")


@pytest.mark.parametrize("family", [f for f in FAMILIES
                                    if f.startswith("doc_")])
def test_family_plan_shape_stable(soak_results, family):
    """No cartesian product at either scale, and the big-scale plan does
    not grow new sort-merge joins relative to 1× (broadcast decisions
    may legitimately differ, but the join COUNT must not)."""
    p1 = soak_results["1x"][family].get("plan") or {}
    pb = soak_results["big"][family].get("plan") or {}
    assert pb.get("sortmerge_joins", 0) <= p1.get("sortmerge_joins", 0) + 1
    # plan_report has no cartesian counter; shuffles exploding would show
    # a structural change
    assert pb.get("shuffles", 0) <= p1.get("shuffles", 0) + 2


def test_sync_diff_counts_exact_at_both_scales(soak_results):
    """The soak's sync family asserts its own insert counts internally
    (bulk 60% + incremental 40%); reaching here means both scales
    synced exactly."""
    assert soak_results["1x"]["pipe_sync_diff"]["rows"] == 15_000
    assert soak_results["big"]["pipe_sync_diff"]["rows"] == 15_000 * SCALE


def test_sequential_ops_survive_hot_series(spark):
    """r8: the per-series sequential operators' admitted worst case —
    ONE user holding ~50% of all events (a single giant series). The
    cost contract is linear in the largest series, so the skewed corpus
    must cost at most a small multiple of the balanced one (a
    super-linear recurrence or a per-group collapse would blow the
    bound), and the results must still be exact per series."""
    import time

    from meerschaum_spark.catalog import QUERIES
    from meerschaum_spark.plans.soak import generate_corpus, generate_events

    import meerschaum_spark.queries  # noqa: F401 — registers the catalog

    work = tempfile.mkdtemp(prefix="mrsm_hot_series_")
    n_events = 90_000
    try:
        bal = os.path.join(work, "bal")
        hot = os.path.join(work, "hot")
        generate_corpus(spark, bal, 50, n_events)
        generate_corpus(spark, hot, 50, n_events)
        generate_events(spark, hot, n_events, hot_user_share=0.5)

        def run(d):
            t0 = time.time()
            rows = {}
            for q in ("events_lttb_downsample", "events_ema_sequential",
                      "events_holt_linear"):
                rows[q] = QUERIES[q](spark, d).count()
            return time.time() - t0, rows

        run(bal)                         # warm the shapes unmeasured
        t_bal, rows_bal = run(bal)
        t_hot, rows_hot = run(hot)
        # the hot corpus concentrates ~45k events in one series; linear
        # bound with generous machine slack — a quadratic recurrence or
        # an all-rows-one-task collapse lands far outside it
        assert t_hot <= max(4.0 * t_bal, t_bal + 20.0), (t_bal, t_hot)
        # sanity: the hot user's series really exists and dominates
        from meerschaum_spark.sources import load_table
        hot_n = (load_table(spark, hot, "events")
                 .filter("user_id = 0").count())
        assert hot_n > 0.4 * n_events, hot_n
        for q, n in rows_bal.items():
            assert n > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_heavy_families_survive_memory_pressure():
    """r8: the 100 TB failure mode the plain soak never exercises —
    hash tables that DON'T fit. A fresh JVM clamped to a ~100 MB
    unified pool runs the heavy families at the 10x corpus: they must
    complete with correct counts (the families assert their own
    inserts) by SPILLING, not OOM. Subprocess because driver memory and
    memory.fraction are fixed at JVM launch."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "pressure_soak.py"),
         "--json-only"],
        capture_output=True, text=True, timeout=1200, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    fams = out["families"]
    assert set(fams) == {"pipe_sync_diff", "pipe_ingest_dedup",
                         "doc_minhash_lsh", "doc_token_budget",
                         "geo_radius_join", "events_sweep_concurrency",
                         "doc_prefix_jaccard",
                         # r10: the BPE trainer + span family — the
                         # soak caught the trainer's bare MEMORY_AND_DISK
                         # checkpoints starving the per-round hash agg
                         # (third instance of the class; fixed by the
                         # repo-wide persist.pin DISK_ONLY sweep) — and
                         # the routed containment join (prescreen path
                         # under the clamp on the dense corpus)
                         "doc_bpe_train", "doc_dup_spans",
                         "doc_containment"}
    # the clamp must have actually BITTEN: the corpus working set is
    # ~10x the pool, so at least one family must record genuine spill
    assert out["total_memory_spill_b"] > 10 * 2**20, out
