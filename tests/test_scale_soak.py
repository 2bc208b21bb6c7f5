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
            "doc_minhash_lsh", "doc_bigram_lm", "events_lttb"]


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
