"""Scale-soak harness: generate a seeded synthetic corpus at multiple
scales and measure the engine's heaviest families at each, so the
"linear at 100 TB" plan claims are MEASURED, not asserted.

The generator is pure Spark expressions (JVM-side hashing of seeded
ids) — producing a 10× corpus costs one partitioned write, no Python
row loop. Schemas match the driver testdata (`TESTDATA.md`) exactly, so
the regular catalog queries run unchanged against a generated directory.

Determinism: every value derives from xxhash64(id, seed) — identical
across runs and machines. ~15% of documents are exact duplicates of an
earlier document (the ingest-dedup and LSH families need real dup
structure), and one "domain" holds ~40% of the corpus (the skew case
doc_domain_caps exists for).

Used by ``tests/test_scale_soak.py`` (small scales, ratio assertions)
and ``scripts/scale_soak.py`` (1×/10×, SCALE.md + shuffle-byte capture
via the UI REST API).
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "data", "table", "row", "key", "value", "hash", "scan", "merge",
    "sort", "join", "batch", "part", "spark", "plan", "query", "shard",
    "window", "agg", "sync", "pipe", "store", "chunk", "index", "range",
    "fast", "slow", "line", "text", "token", "model", "corpus", "train",
    "filter", "count", "group", "order", "limit", "cache", "write", "read",
]

DOMAINS = 30  # src0 is hot (~40%); src1 warm (~15%); the rest uniform


def generate_documents(spark: SparkSession, out_dir: str, n_docs: int,
                       seed: int = 7) -> str:
    """Write ``<out_dir>/documents.parquet`` with the testdata schema
    (doc_id, text, lang, source, n_chars)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # ~15% of docs (doc_id % 13 in {11, 12}) copy the text of the group
    # leader doc_id - (doc_id % 13): exact duplicates with NEW ids
    mod13 = F.pmod(F.col("doc_id"), 13)
    seed_id = F.when(mod13 >= 11, F.col("doc_id") - mod13) \
               .otherwise(F.col("doc_id"))
    n_words = (F.pmod(F.xxhash64(seed_id, F.lit(seed)), 120) + 30)
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(seed_id * 1_000_003 + i, F.lit(seed)),
                    len(VOCAB)) + 1).cast("int")))
    h = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed + 1)), 100)
    source = (F.when(h < 40, F.lit("src0"))
              .when(h < 55, F.lit("src1"))
              .otherwise(F.concat(F.lit("src"),
                                  (F.pmod(h, DOMAINS - 2) + 2)
                                  .cast("string"))))
    lang = F.element_at(
        F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
        (F.pmod(F.xxhash64(seed_id, F.lit(seed + 2)), 4) + 1).cast("int"))
    df = (base
          .withColumn("text", F.array_join(words, " "))
          .withColumn("lang", lang)
          .withColumn("source", source)
          .withColumn("n_chars", F.length("text")))
    path = os.path.join(out_dir, "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def generate_zipf_documents(spark: SparkSession, out_dir: str,
                            n_docs: int, seed: int = 7,
                            vocab_size: int = 200_000) -> str:
    """Write ``<out_dir>/documents.parquet`` with a ZIPFIAN vocabulary —
    the real-text regime the 48-word dense generator deliberately is
    not. Word ranks draw from P(r) ∝ 1/r via the inverse CDF
    ``r = floor(exp(u · ln V))`` on a hash-uniform u, so most 3-gram
    shingles are RARE (the regime where rare-first prefix filtering is
    selective by design) while the head words stay hot. Same ~15%
    exact-duplicate structure as the dense generator."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    mod13 = F.pmod(F.col("doc_id"), 13)
    seed_id = F.when(mod13 >= 11, F.col("doc_id") - mod13) \
               .otherwise(F.col("doc_id"))
    n_words = (F.pmod(F.xxhash64(seed_id, F.lit(seed)), 120) + 30)
    lnv = float(__import__("math").log(vocab_size))
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(F.lit("w"), F.floor(F.exp(
            (F.pmod(F.xxhash64(seed_id * 1_000_003 + i, F.lit(seed)),
                    1 << 20) / float(1 << 20)) * F.lit(lnv)))
            .cast("long").cast("string")))
    h = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed + 1)), 100)
    source = (F.when(h < 40, F.lit("src0"))
              .otherwise(F.concat(F.lit("src"),
                                  (F.pmod(h, DOMAINS - 1) + 1)
                                  .cast("string"))))
    df = (base
          .withColumn("text", F.array_join(words, " "))
          .withColumn("lang", F.lit("en"))
          .withColumn("source", source)
          .withColumn("n_chars", F.length("text")))
    path = os.path.join(out_dir, "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def generate_events(spark: SparkSession, out_dir: str, n_events: int,
                    seed: int = 7, hot_user_share: float = 0.0) -> str:
    """Write ``<out_dir>/events.parquet`` with the testdata schema
    (event_id, ts µs-timestamp, user_id, event_type, value, props).

    ``hot_user_share`` > 0 routes that fraction of events to user 0 —
    the hot-SERIES case the per-series sequential operators (EWMA/LTTB)
    are cost-bounded by (their docstrings admit the largest single
    series is the wall-clock floor; this knob makes that floor
    measurable)."""
    base = spark.range(n_events).select(F.col("id").alias("event_id"))
    # 90-second cadence → a multi-month span crossing many 30-day cells
    ts = F.timestamp_seconds(F.lit(1_704_067_200)  # 2024-01-01 UTC
                             + F.col("event_id") * 90)
    n_users = max(50, n_events // 600)
    uid = F.pmod(F.xxhash64("event_id", F.lit(seed)), n_users)
    if hot_user_share > 0:
        hot = (F.pmod(F.xxhash64("event_id", F.lit(seed + 9)), 1000)
               < int(hot_user_share * 1000))
        uid = F.when(hot, F.lit(0)).otherwise(uid)
    df = (base
          .withColumn("ts", ts)
          .withColumn("user_id", uid)
          .withColumn("event_type", F.element_at(
              F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                      F.lit("scroll"), F.lit("login")),
              (F.pmod(F.xxhash64("event_id", F.lit(seed + 1)), 5) + 1)
              .cast("int")))
          .withColumn("value",
                      (F.pmod(F.xxhash64("event_id", F.lit(seed + 2)),
                              10_000) / 100.0))
          .withColumn("props", F.to_json(F.struct(
              F.pmod(F.xxhash64("event_id", F.lit(seed + 3)), 100)
              .alias("k")))))
    path = os.path.join(out_dir, "events.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def generate_corpus(spark: SparkSession, out_dir: str, n_docs: int,
                    n_events: int, seed: int = 7) -> str:
    os.makedirs(out_dir, exist_ok=True)
    generate_documents(spark, out_dir, n_docs, seed)
    generate_events(spark, out_dir, n_events, seed)
    return out_dir


# ---------------------------------------------------------------------------
# Families under soak — each returns (rows_processed, result DataFrame or
# None). Catalog families run the REAL registered query on the generated
# dir; pipe families drive the REAL sync machinery.
# ---------------------------------------------------------------------------

def _family_sync_diff(spark: SparkSession, sf_dir: str,
                      workdir: str) -> tuple[int, None]:
    """Bulk load 60%, then re-sync the full table: the incremental diff
    absorbs the 60% overlap and appends the rest."""
    import shutil
    import tempfile

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    inst = tempfile.mkdtemp(prefix="soak_sync_", dir=workdir)
    try:
        pipe = Pipe("soak", "events", instance=inst, spark=spark,
                    columns={"datetime": "ts", "id": "event_id"})
        cut = int(n * 0.6)
        r1 = pipe.sync(ev.filter(F.col("event_id") < cut))
        r2 = pipe.sync(ev)
        assert r1.success and r2.success
        assert r1.inserted == cut and r2.inserted == n - cut, \
            (r1.inserted, r2.inserted, n)
        return n, None
    finally:
        shutil.rmtree(inst, ignore_errors=True)


def _family_ingest_dedup(spark: SparkSession, sf_dir: str,
                         workdir: str) -> tuple[int, None]:
    """Content-dedup guard under replay: half, then full (the guard
    drops all previously ingested text, including re-keyed dups)."""
    import shutil
    import tempfile

    from meerschaum_spark.pipe import Pipe
    from meerschaum_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    inst = tempfile.mkdtemp(prefix="soak_dedup_", dir=workdir)
    try:
        pipe = Pipe("soak", "docs", instance=inst, spark=spark,
                    columns={"datetime": "doc_id", "id": "doc_id"},
                    parameters={"dedup": {"method": "exact",
                                          "column": "text"},
                                "precision": {"unit": "second"}},
                    dtypes={"doc_id": "int64"})
        r1 = pipe.sync(docs.filter(F.col("doc_id") < n // 2))
        r2 = pipe.sync(docs)
        assert r1.success and r2.success
        # second pass inserts only second-half docs with UNSEEN text
        assert 0 < r2.inserted <= n - n // 2
        return n, None
    finally:
        shutil.rmtree(inst, ignore_errors=True)


def _family_graph_pagerank(spark: SparkSession, sf_dir: str,
                           workdir: str) -> tuple[int, DataFrame]:
    """Iterative graph workload at corpus scale: a deterministic sparse
    user graph with |E| ∝ events and |V| ∝ users (both scale with the
    corpus), three PageRank iterations through the shared
    ``pagerank_int`` join-agg loop. Near-linear behavior = each
    iteration's shuffle tracks |E|, and the per-iteration
    localCheckpoint keeps plan size flat regardless of iteration
    count."""
    from meerschaum_spark.functions.graph import pagerank_int

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_users = int(ev.agg(F.max("user_id")).first()[0]) + 1
    edges = (ev.select(
        F.col("user_id").alias("a"),
        F.pmod(F.xxhash64("event_id", F.lit(99)), n_users).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"),
                F.greatest("a", "b").alias("v"))
        .distinct())
    ranks = pagerank_int(edges, iterations=3)
    return ranks.count(), ranks


def _family_symspell(spark: SparkSession, sf_dir: str,
                     workdir: str) -> tuple[int, DataFrame]:
    """Edit-distance-1 entity resolution at corpus scale through the
    SAME machinery as ``customer_symspell_pairs`` (delete-variant
    blocking + in-task ``basket_pairs`` bucket expansion + exact
    levenshtein re-check), over a deterministic customer-like name
    table ∝ corpus size. Sequential zero-padded ids give every name
    ~|digits|·9 true neighbors, so BOTH the variant-bucket width
    (bounded by near-neighbor density) and the true result size scale
    linearly — the family's near-linear verdict measures that the
    candidate expansion tracks the result, never |n|²."""
    from meerschaum_spark.functions.graph import basket_pairs

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    n_names = max(200, n // 20)
    cust = spark.range(n_names).select(
        F.col("id").alias("k"),
        F.format_string("Customer#%09d", F.col("id")).alias("name"))
    vk = cust.select("k", F.explode(F.expr(
        "transform(sequence(0, length(name)), "
        "i -> concat(substr(name, 1, i), substr(name, i + 2)))"))
        .alias("v"))
    cand = basket_pairs(vk, "v", "k", out_a="a", out_b="b").distinct()
    ca = cust.select(F.col("k").alias("a"), F.col("name").alias("na"))
    cb = cust.select(F.col("k").alias("b"), F.col("name").alias("nb"))
    out = (cand.join(F.broadcast(ca), "a").join(F.broadcast(cb), "b")
           .filter(F.levenshtein("na", "nb") <= 1))
    return out.count(), out


def _family_containment_zipf(spark: SparkSession, sf_dir: str,
                             workdir: str) -> tuple[int, DataFrame]:
    """The containment join on a ZIPFIAN-vocabulary corpus sized to the
    scale's document count — the design-case companion to the dense
    ``doc_containment`` family: real-text 3-gram shingle frequencies
    are Zipf-distributed, rare-first prefixes are selective there, and
    the candidate volume must track the (linear) result. Runs through
    the r10 SELF-ROUTING ``containment_join`` and HARD-ASSERTS the
    router picks the lossless prefix path on this shape (the soak is
    the router's proving ground, not just its consumer). The corpus
    write is included in the family time (one linear partitioned write
    — it cannot change the verdict)."""
    from meerschaum_spark.functions.dedup import (
        containment_join,
        ordered_shingle_sets,
    )

    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = spark.read.parquet(docs_path).count()
    zdir = os.path.join(workdir, f"zipf_{n_docs}")
    generate_zipf_documents(spark, zdir, n_docs)
    zdocs = spark.read.parquet(os.path.join(zdir, "documents.parquet"))
    sets = ordered_shingle_sets(zdocs)
    route: dict = {}
    out = containment_join(zdocs, num=1, den=2, sets=sets,
                           auto=True, route_out=route)
    if route["route"] != "prefix":  # pragma: no cover - soak invariant
        raise AssertionError(
            f"router must pick prefix on Zipfian corpus: {route}")
    return out.count(), out


def _family_containment_prefix_forced(spark: SparkSession, sf_dir: str,
                                      workdir: str) -> tuple[int, DataFrame]:
    """The LOSSLESS prefix plan FORCED onto the dense stress corpus —
    the honest Θ(n²)-candidates row (r9's CHECK verdict, kept on
    purpose): no lossless filter can beat uniform shingle density, and
    this row is the measured reason ``containment_join(auto=True)``
    exists. The routed family above it shows what the router actually
    launches on this shape."""
    from meerschaum_spark.functions.dedup import containment_join

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = containment_join(docs, num=1, den=2, auto=False)
    return out.count(), out


def _catalog_family(name: str) -> Callable:
    def run(spark: SparkSession, sf_dir: str,
            workdir: str) -> tuple[int, DataFrame]:
        import meerschaum_spark.queries  # noqa: F401
        import meerschaum_spark.queries_llm  # noqa: F401
        from meerschaum_spark.catalog import QUERIES
        df = QUERIES[name](spark, sf_dir)
        rows = len(df.collect())
        return rows, df
    run.__name__ = f"family_{name}"
    return run




def _family_ann_index(spark: SparkSession, sf_dir: str,
                      workdir: str,
                      extra_conf: dict | None = None
                      ) -> tuple[int, DataFrame]:
    """The incrementally-maintained ANN index (r11) at corpus scale:
    a deterministic 64-dim vector table ∝ event count replays through
    a Pipe with ``parameters['ann_index']`` in three syncs (full build
    + codebook freeze, insert-only file-delta encode, one-cell update
    recompute; rows spaced HOURLY so the corpus spans many partition
    cells and the update recompute is genuinely cell-scoped).
    Near-linear verdict = the encode projections and the maintenance
    appends track ROWS; the codebook stays a constant 16x64 literal,
    the update recompute a constant one-cell read, so nothing in the
    path can grow faster than the corpus."""
    import shutil
    import tempfile

    from meerschaum_spark.pipe import Pipe

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = max(2_000, ev.count() // 4)
    vecs = spark.range(n).select(
        F.expr("timestamp'2024-01-01' + make_interval(0, 0, 0, 0, "
               "cast(id AS int))").alias("ts"),
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 64), j -> CAST("
               "(pmod(xxhash64(id, j), 1000) - 500) / 250.0 "
               "AS FLOAT))").alias("embedding"))
    inst = tempfile.mkdtemp(prefix="soak_ann_", dir=workdir)
    try:
        pipe = Pipe("soak", "annidx", instance=inst, spark=spark,
                    columns={"datetime": "ts", "id": "vec_id"},
                    parameters={"ann_index": {
                        "column": "embedding", "n_centroids": 16,
                        "subspaces": 2, "subdim": 32,
                        **(extra_conf or {})}})
        cut = int(n * 0.7)
        r1 = pipe.sync(vecs.filter(F.col("vec_id") < cut))
        r2 = pipe.sync(vecs.filter(F.col("vec_id") >= cut),
                       check_existing=False)
        assert r1.success and r2.success, (r1.message, r2.message)
        upd = (vecs.filter(F.col("vec_id") < 50)
               .withColumn("embedding",
                           F.transform("embedding", lambda x: -x)))
        r3 = pipe.sync(upd)
        assert r3.success, r3.message
        out = pipe.get_ann_index()
        got = out.count()
        assert got == n, (got, n)
        return got, out
    finally:
        shutil.rmtree(inst, ignore_errors=True)


FAMILIES: dict[str, Callable] = {
    "pipe_sync_diff": _family_sync_diff,
    "pipe_ingest_dedup": _family_ingest_dedup,
    "doc_domain_caps": _catalog_family("doc_domain_caps"),
    "doc_token_budget": _catalog_family("doc_token_budget"),
    "doc_minhash_lsh": _catalog_family("doc_minhash_jaccard_est"),
    "doc_bigram_lm": _catalog_family("doc_bigram_lm_score"),
    # spatial grid join over events-derived WKB points: candidate volume
    # must track local density, not |a|×|b|
    "geo_radius_join": _catalog_family("geo_radius_join"),
    # per-series sequential python (applyInPandas): series COUNT scales
    # 10× while series length stays constant — the axis that stresses
    # per-group call overhead and the cores-not-bytes partitioning
    "events_lttb": _catalog_family("events_lttb_downsample"),
    # iterative graph (r8 round 2): |E| ∝ events through three
    # pagerank_int join-agg iterations
    "graph_pagerank": _family_graph_pagerank,
    # distributed prefix sum (r8 third block): the ±1 endpoint stream is
    # 2×|events| rows through ranking.global_running_sum — range
    # shuffle, metadata-sized per-partition-sum collect, and local Arrow
    # cumsum must all scale linearly (a single-partition ordered window
    # here would collapse the big scale onto one task)
    "events_sweep_concurrency": _catalog_family("events_max_concurrency"),
    # r9: the similarity-join family whose WORST case is genuinely
    # quadratic — prefix filtering's candidate volume is corpus-shape-
    # dependent exactly the way LSH was before the r7 bucket cap; the
    # generated corpus's 48-word vocabulary makes shingles maximally
    # shared, a stress shape the driver testdata never produces
    "doc_prefix_jaccard": _catalog_family("doc_jaccard_prefix_join"),
    # r10: the catalog query now SELF-ROUTES — on this dense corpus the
    # preflight picks the bucket-capped LSH prescreen + exact re-check,
    # so the routed row should read NEAR-LINEAR where r9's read CHECK
    "doc_containment": _catalog_family("doc_containment_join"),
    # r10: the lossless prefix plan FORCED onto the dense corpus — the
    # kept-on-purpose CHECK row measuring WHY the router exists
    "doc_containment_forced": _family_containment_prefix_forced,
    # r9: the same join on the Zipfian-vocabulary regime (real-text
    # shingle statistics) — the design case; r10: runs the router and
    # asserts it picks prefix on this shape
    "doc_containment_zipf": _family_containment_zipf,
    # r9: SymSpell delete-variant join (the third never-all-pairs
    # family) over a corpus-∝ synthetic name table
    "symspell_join": _family_symspell,
    # r10: the iterated BPE trainer + encode — per round one map-side-
    # combinable (pair,count) agg + a one-row argmax collect + a
    # map-only JVM fold; the soak measures that the per-round collect
    # cadence and the greedy fold stay linear in corpus tokens
    "doc_bpe_train": _catalog_family("doc_bpe_train_rounds"),
    "doc_bpe_encode": _catalog_family("doc_bpe_encode_fertility"),
    # r10: maximal duplicated spans (Lee et al.) — gaps-and-islands
    # windows over fine-grained (doc_a, doc_b, diagonal) keys; the soak
    # measures that the window keys stay fine-grained (no single-key
    # skew collapse) as pair volume grows
    "doc_dup_spans": _catalog_family("doc_substring_dup_spans"),
    # r10: chi-square keyness — one corpus-scale explode + combinable
    # (scope, token) agg, then vocabulary-sized frames; the soak
    # measures the explode/agg stays linear while the vocab-sized tail
    # stays flat (the generated corpus's dense 48-word vocab keeps the
    # tail minimal, isolating the corpus-scale stage)
    "doc_keyness": _catalog_family("doc_source_keyness"),
    # r10 tail: binary-segmentation changepoint — one per-series
    # cumsum window + one rank over the hourly aggregate; the soak
    # measures the window stays series-partitioned as T grows with
    # the event span (Theil-Sen is deliberately NOT soaked: it is
    # quadratic in AXIS LENGTH by definition — the operator bounds
    # that with the bucketing choice, and the generator couples
    # span to corpus size, so the row would only re-measure T²)
    "events_changepoint": _catalog_family("events_changepoint"),
    # r11: the maintained ANN index — 3-sync replay over a
    # corpus-∝ synthetic vector table; encode is a shuffle-free
    # literal-codebook projection, maintenance appends are
    # O(patch files), so the family must read near-linear
    "pipe_ann_index": _family_ann_index,
    # r12: the TRAINED-codebook freeze — one exact-integer Lloyd pass
    # over the first sync's corpus (one shuffle-free assignment
    # projection + one (cell, pos) hash agg) runs ONCE at freeze; the
    # family must stay near-linear because training cost is a single
    # extra corpus pass, never a per-sync multiplier
    "pipe_ann_trained": lambda spark, sf_dir, workdir: _family_ann_index(
        spark, sf_dir, workdir, extra_conf={"train_iters": 1}),
    # r13: the IVF-SQ8 codec — same 3-sync replay; encode swaps the
    # per-subspace argmins for ONE clamped affine zip_with against the
    # frozen stats (still a shuffle-free projection), plus a one-time
    # per-dim min/max agg at freeze
    "pipe_ann_sq8": lambda spark, sf_dir, workdir: _family_ann_index(
        spark, sf_dir, workdir, extra_conf={"codec": "sq8"}),
    # r13: residual PQ — same replay with train_iters + residual: the
    # encode adds a two-stage projection (cell, then residual slices
    # feeding the code argmins), constant extra work per row
    "pipe_ann_residual": lambda spark, sf_dir, workdir: _family_ann_index(
        spark, sf_dir, workdir,
        extra_conf={"train_iters": 1, "residual": True}),
    # r12: classical MA decomposition — one hash agg + one per-series
    # row window + one hash agg; hourly-row count grows with the event
    # span, the window stays event_type-partitioned
    "events_seasonal_decompose": _catalog_family(
        "events_seasonal_decompose"),
    # r13 third block: rolling distinct actives — ONE corpus-scale
    # (day, user) dedupe shuffle, then the ×7 window expansion runs on
    # the already-tiny distinct frame; WAU cost scales with distinct
    # (day, user) pairs, never with raw events
    "events_rolling_actives": _catalog_family(
        "events_rolling_active_users"),
    # r13 third block: video frame sampling — map-only Arrow-batched
    # container parse + real PNG decode, ceil(n_frames/2) rows out per
    # doc; the only shuffle is the final presentation sort, so time
    # must track docs and shuffle-bytes/row must stay flat
    "multimodal_video_frames": _catalog_family(
        "multimodal_video_frame_sample"),
}


def run_families(spark: SparkSession, sf_dir: str, workdir: str,
                 families: list[str] | None = None,
                 stage_sampler: Callable | None = None) -> dict:
    """Run each family against ``sf_dir``; returns
    ``{family: {"sec": wall, "rows": n, "plan": {...} | None,
                "stages": sampler_delta | None}}``.
    ``stage_sampler()`` (optional) returns cumulative executor metrics —
    sampled before/after each family for shuffle/input byte deltas."""
    from meerschaum_spark.plans.inspect import plan_report

    out: dict = {}
    for name in (families or list(FAMILIES)):
        fn = FAMILIES[name]
        before = stage_sampler() if stage_sampler else None
        t0 = time.time()
        rows, df = fn(spark, sf_dir, workdir)
        sec = time.time() - t0
        rec: dict = {"sec": round(sec, 3), "rows": rows}
        if df is not None:
            rec["plan"] = plan_report(df)
        if stage_sampler:
            after = stage_sampler()
            rec["stages"] = {k: after[k] - before.get(k, 0)
                            for k in after}
        out[name] = rec
    return out
