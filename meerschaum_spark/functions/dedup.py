"""Deduplication family: exact hash-dedup, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (the point of each):
  * exact: one shuffle on the content hash — works at any scale.
  * n-gram Jaccard: shingle-explode + equi-join on shingle; the join key
    is the shingle so co-occurrence is computed without a cross join.
    Bounded per shard (``scope_col``) to cap bucket fan-out.
  * MinHash+LSH: fixed-size signature per doc (K exact decimal-free int
    mins — one pass), banded into buckets; candidate pairs come from an
    equi-join on (band, band_hash), never a cross join. This is the
    100 TB near-dup path.
  * SimHash: one 60-bit value per doc from a token-hash majority vote —
    pure array ops, no explode, no shuffle until the final compare.

All hashes derive from md5 (``catalog.hash60``) so the DuckDB oracle can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from meerschaum_spark.catalog import hash60
from meerschaum_spark.functions.text import tokens
from meerschaum_spark.functions.persist import pin as _pin

DEFAULT_MINHASH_K = 8
DEFAULT_BANDS = 4

#: band-bucket membership cap for LSH candidate generation: a bucket of
#: m docs emits m(m-1)/2 pairs, so one boilerplate mega-bucket turns the
#: candidate join quadratic (measured in the r7 scale soak: 79% of a
#: homogeneous corpus in ONE bucket → 134× superlinear, SCALE.md).
#: Buckets above the cap carry template-level similarity, not near-dup
#: specificity, and are dropped from candidate generation — the LSH
#: analogue of a stopword. 256 is far above every observed bucket on the
#: driver testdata (max 24 at sf0.01, 208 at sf0.1), so capped and
#: uncapped semantics coincide there bit-for-bit.
LSH_MAX_BUCKET = 256

#: same-signature group size above which hamming_near_pairs' in-task
#: i<j pair expansion (ONE row holding n(n-1)/2 structs) switches to
#: the salted distributed self-join — the §2.5 skew guard for a
#: corpus-scale hot value (e.g. the all-zero aHash of blank images).
#: 2048 caps the single-row pair array at ~2.1M structs (~35 MB — far
#: from a task OOM, which needs ~100k-member groups), and keeps every
#: observed driver-testdata group (sf0.1 ahash max = 943 members) on
#: the fast in-task path: the first guard shipped at 256 and silently
#: rerouted the 943/277/264/248-member ahash groups through the salted
#: join, costing ~0.35 s/rep (interleaved A/B) for zero safety gain.
_SAME_EXPAND_CAP = 2048

#: salt-bucket count for the oversized-group expansion: the O(n²) pair
#: output spreads across this many reduce partitions per hot value and
#: the join's build side shrinks to n/S members per partition.
_SAME_EXPAND_SALTS = 16

#: universal-hash mixing constants: sig_i = (A[i]*(h mod 2^30) + B[i]) mod P.
#: One md5 per token (hash60) + K cheap affine mixes replaces K md5 passes;
#: products stay < 2^60 so the arithmetic is overflow-free and identical
#: in Spark and DuckDB int64.
MINHASH_MIX = [
    (976369, 1000003), (813419, 2000029), (735979, 3000073), (655243, 4000037),
    (577897, 5000011), (492893, 6000047), (413159, 7000003), (336521, 8000009),
]
MINHASH_DOMAIN = 1 << 30
MINHASH_PRIME = (1 << 61) - 1


def minhash_mix(i: int) -> tuple[int, int]:
    """Mixing constants for permutation ``i``, any ``i`` ≥ 0: the first 8
    are the fixed table above (oracle-stable); further permutations derive
    deterministically, keeping ``a`` odd and < 2³⁰ so every product stays
    < 2⁶⁰ (overflow-free in both Spark and DuckDB int64)."""
    if i < len(MINHASH_MIX):
        return MINHASH_MIX[i]
    a = ((976369 + 104_729 * (i + 1)) % MINHASH_DOMAIN) | 1
    b = 1_000_003 * (i + 1) + 7
    return a, b


def choose_lsh_params(target_sim: float, max_k: int = 256) -> tuple[int, int]:
    """Derive (k, bands) from a target Jaccard similarity: banded LSH with
    ``b`` bands of ``r`` rows has detection threshold ≈ (1/b)^(1/r); pick
    the geometry under ``max_k`` total hashes whose threshold is closest
    to ``target_sim`` (standard MMDS ch.3 sizing)."""
    if not 0.0 < target_sim < 1.0:
        raise ValueError("target_sim must be in (0, 1)")
    best, best_err = (DEFAULT_MINHASH_K, DEFAULT_BANDS), float("inf")
    for r in range(1, 33):
        for b in range(1, max_k // r + 1):
            thr = (1.0 / b) ** (1.0 / r)
            err = abs(thr - target_sim)
            # prefer smaller signatures on ties (cheaper at equal quality)
            if err < best_err - 1e-12 or (
                abs(err - best_err) <= 1e-12 and b * r < best[0]
            ):
                best, best_err = (b * r, b), err
    return best


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Group identical content by md5; keep the smallest id as canonical."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles_of_tokens(toks, n: int = 3):
    """Word n-gram shingle array (distinct) from a token-array column.
    Guarded: Spark's ``sequence(1, 0)`` DESCENDS instead of returning
    empty, so short texts need an explicit empty-array branch.

    IMPORTANT: pass a *materialized column attribute*, not the raw
    ``tokens(text)`` expression — ``toks`` is referenced inside the
    transform lambda body, where Catalyst does NOT common-subexpression-
    eliminate, so an inline split expression would re-run the regex split
    ~3×·n_grams times per row (measured 2× total query cost)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *parts(i))))
    return F.when(F.size(toks) >= n, grams) \
            .otherwise(F.array().cast("array<string>"))


def shingles(col, n: int = 3):
    """Word n-gram shingles from a text column (convenience form; prefer
    materializing ``tokens(col)`` first — see ``shingles_of_tokens``)."""
    return shingles_of_tokens(tokens(col), n)


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope_col: str | None = None,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard via shingle-join (no cross product):
    explode distinct shingles, self-join on shingle (within ``scope_col``
    when given — the shard-local pattern), count shared, then
    |A∩B| / (|A| + |B| − |A∩B|).

    ``max_shingle_df`` caps shingle document frequency: a shingle shared
    by k documents creates a k² join bucket, so one "stop shingle" (a
    boilerplate phrase appearing everywhere) turns the equi-join
    quadratic. Shingles with DF > cap are dropped from BOTH the
    intersection and the set sizes — Jaccard is then computed over the
    capped shingle sets, the standard CCNet/Gopher-style treatment. The
    hot set is tiny by construction, so it is removed with a broadcast
    anti-join, not a shuffle."""
    scope = [scope_col] if scope_col else []
    # join on the shingle's 60-bit hash, not the string: ~3× smaller
    # shuffle/checkpoint, and identical results cross-engine (hash
    # collisions, if any, collide identically on both sides). Tokens are
    # materialized behind a projection boundary first — see
    # shingles_of_tokens for why.
    toked = df.select(F.col(id_col), *scope,
                      tokens(F.col(text_col)).alias("_toks"))
    exploded = toked.select(
        F.col(id_col), *scope,
        F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("_sh_str"),
    ).select(F.col(id_col), *scope, hash60(F.col("_sh_str")).alias("s"))
    # materialize once: the self-join would otherwise re-evaluate the
    # shingle pipeline on both sides (measured 3× slower); at cluster
    # scale this would be a persisted signatures table
    exploded = exploded.transform(_pin)
    if max_shingle_df is not None:
        hot = (exploded.groupBy(*scope, "s")
               .agg(F.count(F.lit(1)).alias("_df"))
               .filter(F.col("_df") > max_shingle_df)
               .select(*scope, "s"))
        # checkpoint the CAPPED table too: it feeds three consumers
        # (sizes, join side a, join side b) — without materializing it,
        # each consumer re-scans the pre-cap checkpoint and re-runs the
        # anti-join probe (measured: 11.4 s vs 4 s at sf0.1)
        exploded = exploded.join(F.broadcast(hot), on=[*scope, "s"],
                                 how="left_anti").transform(_pin)
    sizes = exploded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    cond = (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    if scope_col:
        cond = cond & (F.col(f"a.{scope_col}") == F.col(f"b.{scope_col}"))
    shared = (
        a.join(b, on=cond)
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"),
                 F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a", "doc_b", "n_shared",
            (F.col("n_shared").cast("double")
             / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_shared")))
            .alias("jaccard"),
        )
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       k: int = DEFAULT_MINHASH_K,
                       keep_cols: list[str] | None = None) -> DataFrame:
    """K-permutation MinHash over the distinct-token set: one md5 per
    token (hash60), then K affine mixes — sig_i = min over tokens of
    (A_i·(h mod 2³⁰) + B_i) mod P.

    Shape: explode the distinct tokens and compute all K mins in ONE
    whole-stage-codegen hash aggregate — the per-row higher-order-
    function form ran K interpreted lambda passes per document (the
    same interpreted-HOF tax the LSH bucket pass paid, see
    ``similarity.lsh_buckets_agg``). Partial aggregation computes the
    mins map-side (exploded rows of a document stay in its partition),
    so the shuffle carries ~one K-wide row per document. explode_outer
    keeps token-less documents present with NULL signatures, matching
    the fold form and the DuckDB oracle's list_min semantics."""
    keep = list(keep_cols or [])
    toks = F.array_distinct(tokens(F.col(text_col)))
    ex = (df.select(F.col(id_col), *[F.col(c) for c in keep],
                    F.explode_outer(toks).alias("_t"))
          .withColumn("_h", hash60(F.col("_t"))))
    h = F.col("_h")
    aggs = []
    for i in range(k):
        a, b = minhash_mix(i)
        aggs.append(F.min((F.lit(a) * (h % F.lit(MINHASH_DOMAIN))
                           + F.lit(b)) % F.lit(MINHASH_PRIME))
                    .alias(f"sig_{i}"))
    return ex.groupBy(id_col, *keep).agg(*aggs)


def band_hash_rows(sigs: DataFrame, id_col: str, k: int, bands: int,
                   keep_cols: list[str] | None = None) -> DataFrame:
    """Banded LSH bucket rows from a signature table: one
    ``(id, band, bh)`` row per band, ``bh = md5(band's sig values)`` —
    the shared bucketing for candidate self-joins AND the ingest-time
    near-dup guard."""
    rows_per_band = k // bands
    band_rows = []
    for b in range(bands):
        members = [F.col(f"sig_{b * rows_per_band + j}").cast("string")
                   for j in range(rows_per_band)]
        band_rows.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *members)).alias("bh")))
    keep = list(keep_cols or [])
    return sigs.select(
        F.col(id_col), *keep,
        F.explode(F.array(*band_rows)).alias("bb"),
    ).select(id_col, *keep, "bb.band", "bb.bh")


def cap_band_buckets(buckets: DataFrame, keys: list[str],
                     cap: int = LSH_MAX_BUCKET) -> DataFrame:
    """Drop LSH band buckets with more than ``cap`` members (see
    ``LSH_MAX_BUCKET``); the quadratic candidate join downstream is then
    bounded at cap²/2 pairs per bucket.

    Shape: map-side-combined groupBy count, then a left-semi join back.
    The size table is one row per DISTINCT bucket — O(docs x bands) at
    corpus scale, so it must NOT be broadcast (driver OOM); the shuffle
    semi-join is the right plan, and the one skewed partition a
    mega-bucket creates in it is exactly what AQE's runtime skew-join
    splitting handles (enabled in the engine session). A count WINDOW
    would be one shuffle cheaper but pins each mega-bucket to a single
    un-splittable task — the worst shape for the very input this
    function guards against."""
    sizes = (buckets.groupBy(*keys)
             .agg(F.count(F.lit(1)).alias("_bsz"))
             .filter(F.col("_bsz") <= cap)
             .drop("_bsz"))
    return buckets.join(sizes, on=keys, how="left_semi")


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope_col: str | None = None,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    target_sim: float | None = None,
    sigs: DataFrame | None = None,
    max_bucket_size: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Banded LSH: split the K-long signature into ``bands`` bands of
    K/bands rows, bucket-join on (band_idx, md5(band values)). Returns
    distinct candidate pairs (doc_a < doc_b).

    Pass ``target_sim`` to size the band geometry from the data's needs
    instead of the defaults: (k, bands) are derived so the detection
    threshold lands near the requested Jaccard similarity
    (``choose_lsh_params``).

    ``max_bucket_size`` bounds the quadratic risk at corpus scale: a
    band bucket holding m documents emits m(m-1)/2 pairs, so one
    boilerplate-heavy bucket of 10⁵ docs would emit 5·10⁹ candidates.
    Buckets above the cap are dropped entirely (the hot-bucket analogue
    of the stop-shingle cap: mega-buckets signal template-level
    similarity, not near-dup specificity; a true near-dup pair usually
    also collides in a colder band). The r7 scale soak MEASURED the
    hazard: a homogeneous 25k-doc corpus put 79% of documents in one
    bucket and the uncapped pair join went 134× superlinear (SCALE.md),
    so the cap now defaults ON at ``LSH_MAX_BUCKET`` and every catalog
    oracle mirrors the same size filter. Pass None for exact MMDS
    semantics."""
    if target_sim is not None:
        k, bands = choose_lsh_params(target_sim)
    rows_per_band = k // bands
    if sigs is None:
        sigs = minhash_signatures(
            df, text_col, id_col, k,
            keep_cols=[scope_col] if scope_col else None)
        # materialize: both sides of the bucket self-join reuse the
        # signatures (callers with a precomputed table pass ``sigs``
        # already checkpointed and amortize it across queries)
        sigs = sigs.transform(_pin)
    scope = [scope_col] if scope_col else []
    buckets = band_hash_rows(sigs, id_col, k, bands, keep_cols=scope)
    if max_bucket_size is not None:
        buckets = cap_band_buckets(buckets, [*scope, "band", "bh"],
                                   max_bucket_size)
    a, b_ = buckets.alias("a"), buckets.alias("b")
    cond = ((F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
    if scope_col:
        cond = cond & (F.col(f"a.{scope_col}") == F.col(f"b.{scope_col}"))
    return (a.join(b_, on=cond)
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())


#: edge-count ceiling for the driver-side components fast path. A dup
#: graph's edges are a sliver of the corpus (only near-duplicate pairs),
#: so even 100 TB corpora usually produce a graph that fits the driver;
#: 2M edges ≈ 32 MB of longs — far under any driver budget.
COMPONENTS_LOCAL_MAX_EDGES = 2_000_000


def _components_local(pairs: list, src_idx: int = 0,
                      dst_idx: int = 1) -> dict:
    """Union-find with path halving over collected edges; returns
    node → min-node-id-of-component (identical semantics to the
    distributed min-label loop)."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = p[src_idx], p[dst_idx]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the canonical label deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    local_max_edges: int = COMPONENTS_LOCAL_MAX_EDGES,
) -> DataFrame:
    """Connected components over an undirected edge list via iterative
    min-label propagation: every node starts labeled with itself; each
    round a node adopts the smallest label among itself and its
    neighbors; converged when no label changes. Returns
    (node, cluster_id) where cluster_id = min node id in the component.

    Scale: each round is ONE shuffle (join + groupBy on node id), and
    rounds needed = graph diameter — near-dup graphs are shallow (dups
    cluster star-like around a canonical doc), so this converges in a
    handful of rounds. Labels are localCheckpointed per round to keep
    the plan flat. For adversarially deep graphs, the large-star/
    small-star algorithm (Kiveris et al.) halves diameter per round —
    not needed for dedup-shaped data. Convergence is detected by the
    (monotonically decreasing) exact sum of labels, one lightweight
    action per round.

    Adaptive fast path: the dup graph is tiny relative to the corpus
    (it holds only near-duplicate PAIRS), so when the distinct edge set
    fits the driver (``local_max_edges``), a single-pass union-find
    replaces N iterative shuffles — the same economics as a broadcast
    join threshold. Semantics are identical (min-node-id labels)."""
    dedup_edges = (edges.select(F.col(src).alias("u"),
                                F.col(dst).alias("v"))
                   .distinct().transform(_pin))
    n_edges = dedup_edges.count()
    if n_edges <= local_max_edges:
        labels_map = _components_local(
            [(r["u"], r["v"]) for r in dedup_edges.collect()])
        spark = edges.sparkSession
        id_type = edges.schema[src].dataType
        schema = StructType([StructField("node", id_type),
                             StructField("cluster_id", id_type)])
        # Arrow-backed pandas frame, unsorted: at the edge cap this is up
        # to ~4M values — a python-tuple createDataFrame would push them
        # through Py4J row by row, and the previous sorted() both wasted
        # O(n log n) driver time and assumed homogeneous orderable ids
        import pandas as _pd
        items = list(labels_map.items())
        pdf = _pd.DataFrame({"node": [k for k, _ in items],
                             "cluster_id": [v for _, v in items]})
        return spark.createDataFrame(pdf, schema)
    sym = (dedup_edges
           .union(dedup_edges.select(F.col("v").alias("u"),
                                     F.col("u").alias("v"))))
    sym = sym.transform(_pin)
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .transform(_pin))
    # decimal(38,0) sum: label sums exceed int64 at large node counts
    prev_sum = labels.agg(
        F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        nbr_min = (sym.join(labels, sym["v"] == labels["node"])
                   .groupBy(F.col("u").alias("node"))
                   .agg(F.min("label").alias("nbr_label")))
        labels = (labels.join(nbr_min, on="node", how="left")
                  .select("node",
                          F.least(F.col("label"),
                                  F.coalesce("nbr_label", "label"))
                          .alias("label"))
                  .transform(_pin))
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    k: int = DEFAULT_MINHASH_K,
    bands: int = DEFAULT_BANDS,
    sigs: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """The canonical 100 TB near-dup pass, fused end-to-end:

      MinHash signatures → banded LSH candidate pairs → exact n-gram
      Jaccard re-rank on candidates only → threshold to edges →
      connected components (min-label propagation).

    Returns (doc_id, cluster_id, keep): one row per document belonging
    to a near-dup cluster, labeled with the smallest doc_id of its
    component; ``keep`` marks the canonical survivor. Singleton
    documents (no near-dup) are omitted — at corpus scale the
    interesting output is the dup clusters, not the identity mapping.

    Scale design: the only quadratic-risk step (pairing) is bounded by
    LSH bucketing; the exact Jaccard runs ONLY on candidate pairs, as
    two broadcast-joined shingle-set lookups + array_intersect (pure
    JVM column ops — candidates are rare relative to the corpus, so
    this join is candidate-proportional, never corpus²)."""
    cands = lsh_candidate_pairs(df, text_col, id_col, scope_col,
                                k=k, bands=bands, sigs=sigs)
    # the candidate table feeds three consumers (id semi-join + two
    # re-rank joins) — materialize it once
    cands = cands.transform(_pin)
    # shingle sets ONLY for docs that appear in a candidate pair: the
    # exact re-rank stays candidate-proportional — at corpus scale the
    # candidate docs are a sliver of the table, so hashing every doc's
    # shingles would dominate the whole pass
    cand_ids = (cands.select(F.col("doc_a").alias(id_col))
                .union(cands.select(F.col("doc_b").alias(id_col)))
                .distinct())
    needed = df.join(cand_ids, on=id_col, how="left_semi")
    toked = needed.select(F.col(id_col),
                          tokens(F.col(text_col)).alias("_toks"))
    sets = toked.select(
        F.col(id_col),
        F.transform(shingles_of_tokens(F.col("_toks"), n),
                    lambda s: hash60(s)).alias("sh"))
    sa = sets.select(F.col(id_col).alias("doc_a"),
                     F.col("sh").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("doc_b"),
                     F.col("sh").alias("sh_b"))
    scored = (cands.join(sa, on="doc_a").join(sb, on="doc_b")
              .select("doc_a", "doc_b",
                      F.size(F.array_intersect("sh_a", "sh_b"))
                      .alias("n_shared"),
                      F.size("sh_a").alias("na"),
                      F.size("sh_b").alias("nb")))
    edges = (scored
             # guard: two sub-n-token docs have EMPTY shingle sets but can
             # still be LSH candidates (signatures hash tokens) — 0/0 must
             # not become an edge
             .filter((F.col("na") + F.col("nb") - F.col("n_shared")) > 0)
             .withColumn("jaccard",
                         F.col("n_shared").cast("double")
                         / (F.col("na") + F.col("nb") - F.col("n_shared")))
             .filter(F.col("jaccard") >= F.lit(threshold))
             .select("doc_a", "doc_b"))
    comps = connected_components(edges, max_iter=max_iter)
    return comps.select(
        F.col("node").alias(id_col),
        "cluster_id",
        (F.col("node") == F.col("cluster_id")).alias("keep"))


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = 60) -> DataFrame:
    """60-bit SimHash: per bit, strict-majority vote of the distinct
    token hashes. Pure nested array ops (transform/filter/aggregate) —
    no explode, so a 1B-doc corpus is one narrow projection."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(toks, lambda t: hash60(t))
    # SQL-expr form: the Python F.shiftright wrapper only takes literal
    # shift amounts, but the SQL function accepts the lambda variable b
    simhash_expr = F.expr(f"""
        aggregate(
          transform(sequence(0, {bits - 1}),
            b -> CASE WHEN 2 * size(filter(_hs, h -> (shiftright(h, b) & 1) = 1))
                        > size(_hs)
                 THEN shiftleft(1L, b) ELSE 0L END),
          0L, (acc, x) -> acc + x)
    """)
    return (df.select(F.col(id_col), hashes.alias("_hs"))
            .select(F.col(id_col), simhash_expr.alias("simhash")))


def hamming_near_pairs(sim_df: DataFrame, id_col: str = "doc_id",
                       max_distance: int = 8,
                       checkpoint: bool = True,
                       nbits: int = 60) -> DataFrame:
    """SimHash near-dup pairs by Hamming distance, joined on rotated
    prefix buckets (pigeonhole: distance ≤ d means some nbits/(d+1)-bit
    block matches exactly) — equi-join, not cross join. ``nbits`` is
    the signature width (60 for the text simhash; 16 for the image
    aHash): blocks sized off the wrong width would leave high blocks
    permanently zero, funnelling every row into one hot bucket.

    For a NARROW signature space (``nbits <= 32``) the block join runs
    over DISTINCT signature VALUES, not doc rows: docs sharing a
    signature collapse into one value row carrying a sorted id list,
    and doc pairs are expanded back in-task from the surviving value
    pairs. Candidate volume then scales with the value-pair structure
    instead of the (value multiplicity)² doc-pair count — measured
    12.4M candidate rows → 181k at sf0.1 for the 16-bit image aHash
    (5000 docs, 603 values) — and the expansion is output-sized over
    two pinned tiny frames, so downstream consumers re-evaluating the
    returned frame re-pay only the expansion, never the join. WIDE
    spaces (the 60-bit text simhash: values ≈ docs, nothing collapses)
    keep the direct per-doc block join — an interleaved A/B measured
    the value-level machinery (group + two pins + id-list joins) at
    ~3× the direct join there, pure overhead."""
    blocks = max_distance + 1
    width = nbits // blocks
    if nbits > 32:
        return _hamming_near_pairs_wide(sim_df, id_col, max_distance,
                                        checkpoint, blocks, width)
    # contract to distinct values + sorted member-id lists (ascending:
    # the same-value expansion below relies on ids[i] < ids[j] for i<j)
    vals = (sim_df.select(id_col, "simhash")
            .groupBy("simhash")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("_ids")))
    # materialize: the value table feeds the block self-join and both
    # expansion branches; unpinned, the (possibly expensive) signature
    # lineage would recompute per branch
    if checkpoint:
        vals = vals.transform(_pin)
    exploded = vals.select(
        F.col("simhash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright(F.col("simhash"), i * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("bv"))
            for i in range(blocks)
        ])).alias("bb"),
    ).select("simhash", "bb.blk", "bb.bv")
    a, b = exploded.alias("a"), exploded.alias("b")
    # unordered value pairs (va <= vb keeps each once, va == vb keeps
    # the same-signature group) sharing at least one block
    vpairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.simhash") <= F.col("b.simhash")))
        .select(F.col("a.simhash").alias("va"),
                F.col("b.simhash").alias("vb"))
        .distinct()
        .withColumn("hamming",
                    F.bit_count(F.col("va").bitwiseXOR(F.col("vb"))))
        .filter(F.col("hamming") <= max_distance)
    )
    if checkpoint:
        vpairs = vpairs.transform(_pin)
    ids_a = vals.select(F.col("simhash").alias("va"),
                        F.col("_ids").alias("_ia"))
    ids_b = vals.select(F.col("simhash").alias("vb"),
                        F.col("_ids").alias("_ib"))
    # cross-value pairs: every (member of va) × (member of vb), oriented
    # doc_a < doc_b (ids are unique per doc, so the two sides never
    # collide)
    cross = (vpairs.filter(F.col("va") != F.col("vb"))
             .join(ids_a, "va").join(ids_b, "vb")
             .select(F.explode("_ia").alias("_da"), "_ib", "hamming")
             .select("_da", F.explode("_ib").alias("_db"), "hamming")
             .select(F.least("_da", "_db").alias("doc_a"),
                     F.greatest("_da", "_db").alias("doc_b"), "hamming"))
    # same-value pairs (hamming 0): in-task i<j expansion over the
    # sorted member list — the basket_pairs idiom. SIZE-CAPPED (r14,
    # VERDICT r13 skew guard): the flatten builds the whole n(n-1)/2
    # pair array in ONE row, so a corpus-scale hot value (the all-zero
    # aHash of blank images) would be a single-task OOM. Groups above
    # ``_SAME_EXPAND_CAP`` members instead expand through a SALTED
    # member self-join (guide §2.5): the left side replicates each
    # member across the salt buckets, the right side keeps one
    # deterministic bucket per member (pmod(xxhash64(id))), so the
    # per-partition build side is n/S members and the O(n²) pair
    # output spreads across S × values reduce partitions instead of
    # one. Empty at bench scale (largest sf0.1 group ≈ tens of docs);
    # both branches emit each unordered pair exactly once.
    arr = F.col("_ia")
    n = F.size(arr)
    elem_type = [f.dataType.simpleString() for f in vals.schema.fields
                 if f.name == "_ids"][0][len("array<"):-1]
    same_pairs = F.when(
        n >= 2,
        F.flatten(F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(arr, i).alias("doc_a"),
                    F.element_at(arr, j).alias("doc_b"))))),
    ).otherwise(F.array().cast(
        f"array<struct<doc_a:{elem_type},doc_b:{elem_type}>>"))
    same_base = vpairs.filter(F.col("va") == F.col("vb")).join(ids_a, "va")
    # hot-value probe (r14): the salted branch below exists only for a
    # corpus-scale hot signature, but keeping it in the plan statically
    # costs every downstream re-evaluation of the returned frame two
    # always-empty shuffle stages. ``vals`` is pinned here, so one tiny
    # aggregate over it learns whether any group exceeds the cap; the
    # common no-hot-value plan then stays branch-free. With
    # checkpoint=False the probe would re-run the signature lineage —
    # keep the static union there (both semantics identical).
    has_hot = True
    if checkpoint:
        row = vals.agg(F.max(F.size("_ids"))).first()
        has_hot = bool(row and (row[0] or 0) > _SAME_EXPAND_CAP)
    same = (same_base.filter(n <= _SAME_EXPAND_CAP)
            .select(F.explode(same_pairs).alias("_pr"), "hamming")
            .select(F.col("_pr.doc_a").alias("doc_a"),
                    F.col("_pr.doc_b").alias("doc_b"), "hamming"))
    if not has_hot:
        return cross.unionByName(same)
    members = (same_base.filter(n > _SAME_EXPAND_CAP)
               .select("va", "hamming", F.explode(arr).alias("_id")))
    salt = F.pmod(F.xxhash64("_id"), F.lit(_SAME_EXPAND_SALTS))
    rights = members.select("va", F.col("_id").alias("_idr"),
                            salt.alias("_rb"))
    lefts = members.select(
        "va", "hamming", F.col("_id").alias("_idl"),
        F.explode(F.sequence(
            F.lit(0), F.lit(_SAME_EXPAND_SALTS - 1))).alias("_rb"))
    same_big = (lefts.join(rights, ["va", "_rb"])
                .filter(F.col("_idl") < F.col("_idr"))
                .select(F.col("_idl").alias("doc_a"),
                        F.col("_idr").alias("doc_b"), "hamming"))
    return cross.unionByName(same).unionByName(same_big)


def _hamming_near_pairs_wide(sim_df: DataFrame, id_col: str,
                             max_distance: int, checkpoint: bool,
                             blocks: int, width: int) -> DataFrame:
    """The direct per-doc pigeonhole join — the right shape when
    signature values are (near-)unique per doc and the value-level
    contraction buys nothing (see :func:`hamming_near_pairs`)."""
    # materialize the signatures: the block self-join and the final
    # distance filter would otherwise recompute the simhash per branch
    if checkpoint:
        sim_df = sim_df.transform(_pin)
    exploded = sim_df.select(
        F.col(id_col), F.col("simhash"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright(F.col("simhash"), i * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("bv"))
            for i in range(blocks)
        ])).alias("bb"),
    ).select(id_col, "simhash", "bb.blk", "bb.bv")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.select("doc_a", "doc_b", dist.alias("hamming"))
            .filter(F.col("hamming") <= max_distance))


def sentence_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 20,
) -> DataFrame:
    """Span-level (sentence) duplication profile: for each document, how
    many of its distinct sentences also appear verbatim in ANOTHER
    document. High cross-doc sentence overlap flags boilerplate and
    template spam that document-level dedup misses.

    Plan: sentence-split (codegen regex) → per-doc distinct sentence
    hashes (explode + one aggregation) → corpus document-frequency per
    hash (second aggregation) → join back. Both aggregations partition
    on the hash/doc keys — no window, no all-pairs anything; the join is
    hash-key equi, so the whole pass is two shuffles at any corpus size.
    """
    sents = F.filter(
        F.transform(F.split(F.trim(F.col(text_col)), r"\.\s+"),
                    lambda s: F.trim(s)),
        lambda s: F.length(s) >= min_chars)
    ex = (df.select(F.col(id_col),
                    F.explode(F.array_distinct(sents)).alias("_sent"))
          .select(id_col, hash60(F.col("_sent")).alias("_sh")))
    dfreq = (ex.groupBy("_sh")
             .agg(F.countDistinct(id_col).alias("_docs")))
    return (ex.join(dfreq, on="_sh")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_sentences"),
                 F.count(F.when(F.col("_docs") >= 2, 1))
                 .alias("n_shared_sentences"))
            .withColumn(
                "shared_frac",
                F.col("n_shared_sentences").cast("double")
                / F.col("n_sentences")))


def ordered_shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    scope_col: str | None = None,
) -> DataFrame:
    """Per-document distinct word n-gram shingle sets as ARRAYS in the
    global rare-first order — the shared substrate of the prefix-filter
    family (``prefix_filter_join`` / ``containment_prefix_join``):
    (id[, scope], hs: array<long> document-frequency-then-hash sorted, n).

    With ``scope_col``, document frequencies count WITHIN each scope
    (the shard-local pattern of ``jaccard_pairs``/``lsh_candidate_pairs``)
    — the rare-first order then reflects the population the join will
    actually probe, and the scope column rides along for the join's
    scope-equality predicate.

    Per-doc distinct happens IN-ARRAY before the explode
    (``array_distinct`` is task-local) — a row-level ``.distinct()``
    would shuffle the full exploded shingle table just to dedupe within
    documents. The result is checkpointed: it feeds multiple joins in
    one query and MULTIPLE catalog queries per session (callers cache
    it per (session, corpus) — at cluster scale this is a persisted
    signatures table beside the corpus, the same economics as
    ``minhash_signatures``)."""
    scope = [scope_col] if scope_col else []
    # checkpoint ex: it feeds BOTH the document-frequency aggregate and
    # the probe side of its own join-back — one shingle+hash scan, not two
    ex = (df.select(F.col(id_col), *scope,
                    tokens(F.col(text_col)).alias("_toks"))
          .select(F.col(id_col), *scope,
                  F.explode(F.array_distinct(
                      shingles_of_tokens(F.col("_toks"), n)))
                  .alias("_sh_str"))
          .select(F.col(id_col), *scope,
                  hash60(F.col("_sh_str")).alias("s"))
          .transform(_pin))
    dfreq = ex.groupBy("s", *scope).agg(F.count(F.lit(1)).alias("_df"))
    ordered = (ex.join(dfreq, on=["s", *scope])
               .groupBy(id_col, *scope)
               .agg(F.array_sort(F.collect_list(
                        F.struct(F.col("_df").alias("df"),
                                 F.col("s").alias("s")))).alias("_ord"),
                    F.count(F.lit(1)).alias("n")))
    return (ordered
            .select(F.col(id_col), *scope,
                    F.transform(F.col("_ord"), lambda x: x["s"]).alias("hs"),
                    "n")
            .transform(_pin))


def prefix_filter_join(
    df: DataFrame,
    sim_num: int = 1,
    sim_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sets: DataFrame | None = None,
    scope_col: str | None = None,
) -> DataFrame:
    """Exact-threshold Jaccard set-similarity SELF-join via PREFIX
    FILTERING (the SSJoin / PPJoin family: Chaudhuri et al. ICDE'06,
    Xiao et al. WWW'08) over word n-gram shingle sets, with
    τ = ``sim_num``/``sim_den``.

    LOSSLESS, unlike LSH: if J(a, b) ≥ τ, the two sets MUST share at
    least one token among each side's (nᵢ − ⌈τ·nᵢ⌉ + 1) globally-RAREST
    shingles — so the candidate equi-join runs only on those prefix
    tokens and still finds every qualifying pair. A boilerplate shingle
    shared by half the corpus sits at the END of the frequency order and
    never enters a prefix, which is what keeps the candidate set small
    on real corpora; in the degenerate worst case (all documents
    near-identical) the TRUE result is itself quadratic, so no algorithm
    does better. The size filter (sim_den·nₐ ≥ sim_num·n_b both ways)
    prunes candidates further before verification.

    Everything threshold-shaped is INTEGER arithmetic — prefix length
    n − ⌈sim_num·n/sim_den⌉ + 1 via integer div, verification
    (sim_den + sim_num)·|a∩b| ≥ sim_num·(nₐ + n_b) — so there are no
    float-tie discrepancies cross-engine; the reported ``jaccard`` is
    one IEEE division of two exact longs. Shingles are joined by their
    60-bit md5 hash (3× smaller shuffle; collisions, if any, collide
    identically in the DuckDB oracle). The frequency order is the total
    order (document-frequency, hash) — deterministic with no string
    collation dependence.

    Scale shape: one hash-agg for document frequencies, one equi-join to
    attach them, one per-doc sort-aggregate for the ordered sets (all
    key-partitioned), then the prefix-token equi-join and two join-backs
    for verification. No all-pairs stage anywhere. The ordered-sets
    table feeds three consumers, so it is materialized once — at
    cluster scale this is a persisted signatures table beside the
    corpus, the same economics as ``minhash_signatures``."""
    if sets is None:
        sets = ordered_shingle_sets(df, text_col, id_col, n, scope_col)
    scope = [scope_col] if scope_col else []
    # prefix length with exact integer ceiling: n - ((p*n + q - 1) div q) + 1
    plen = (F.col("n")
            - F.expr(f"({sim_num} * n + {sim_den - 1}) div {sim_den}")
            + F.lit(1)).cast("int")
    pre = sets.select(F.col(id_col), *scope, "n",
                      F.explode(F.slice("hs", F.lit(1), plen)).alias("s"))
    a, b = pre.alias("a"), pre.alias("b")
    cand = (a.join(b, on=[
                F.col("a.s") == F.col("b.s"),
                *[F.col(f"a.{c}") == F.col(f"b.{c}") for c in scope],
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
                F.col("a.n") * sim_den >= F.col("b.n") * sim_num,
                F.col("b.n") * sim_den >= F.col("a.n") * sim_num,
            ])
            .select(F.col(f"a.{id_col}").alias("doc_a"),
                    F.col(f"b.{id_col}").alias("doc_b"))
            .distinct())
    sa = sets.select(F.col(id_col).alias("doc_a"),
                     F.col("hs").alias("_ha"), F.col("n").alias("_na"))
    sb = sets.select(F.col(id_col).alias("doc_b"),
                     F.col("hs").alias("_hb"), F.col("n").alias("_nb"))
    return (cand.join(sa, on="doc_a").join(sb, on="doc_b")
            .withColumn("n_shared",
                        F.size(F.array_intersect("_ha", "_hb")))
            .filter(F.col("n_shared") * (sim_num + sim_den)
                    >= F.lit(sim_num) * (F.col("_na") + F.col("_nb")))
            .select("doc_a", "doc_b", "n_shared",
                    (F.col("n_shared").cast("double")
                     / (F.col("_na") + F.col("_nb") - F.col("n_shared")))
                    .alias("jaccard")))


def containment_prefix_join(
    df: DataFrame,
    num: int = 1,
    den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """DIRECTED exact-threshold containment join over word n-gram
    shingle sets: every ordered pair (src, container) with
    C(src→container) = |src ∩ container| / |src| ≥ ``num``/``den`` —
    the quote / subset / training-data-inclusion detector (asymmetric,
    unlike Jaccard: a paragraph fully quoted inside a book scores 1.0
    here and ≈0 on Jaccard).

    Prefix filtering adapts to containment one-sidedly: only the
    CONTAINED side can prune (any qualifying container must share one
    of src's (n_src − ⌈τ·n_src⌉ + 1) globally-rarest shingles), while
    the container side indexes its FULL shingle list — the standard
    overlap-join shape (Chaudhuri et al. ICDE'06). Rare-first global
    ordering keeps prefix postings small; the size filter
    (den·n_b ≥ num·n_src) prunes before verification; the threshold is
    pure integer arithmetic (den·|∩| ≥ num·n_src) and the reported
    containment is one IEEE division of two exact longs. LOSSLESS —
    the oracle is the literal quadratic definition.

    Scale shape mirrors ``prefix_filter_join``: shingle table hashed
    and checkpointed once, document frequencies one hash agg, the
    candidate join is prefix(src) × full(container) on the shingle
    hash (posting-list economics — bounded by the prefix shingles'
    document frequency), then one verification join-back per side.

    POSITIONAL filter (r9 — the scale soak flagged 19.75× shuffle-
    bytes-per-row growth at 10× on a dense-vocabulary corpus): a match
    on the container's j-th shingle (0-based, rare-first order) can
    contribute at most the container's remaining ``n_b − j`` shingles
    of overlap — because the global order is shared, everything before
    the FIRST common shingle in b's order is disjoint from src — so
    ``(n_b − j)·den ≥ n_src·num`` must hold for at least the
    first-common-shingle match of every qualifying pair (the standard
    PPJoin positional argument, Xiao et al. WWW'08). LOSSLESS: the
    first match always survives; later matches of the same pair may
    prune, which only thins the pre-``distinct`` duplicate stream.
    Common shingles sit LAST in rare-first order, so this kills
    exactly the blowup case: a common shingle in a short doc's prefix
    matching the deep tail of every container's posting list."""
    if sets is None:
        sets = ordered_shingle_sets(df, text_col, id_col, n)
    plen = (F.col("n")
            - F.expr(f"({num} * n + {den - 1}) div {den}")
            + F.lit(1)).cast("int")
    pre = sets.select(F.col(id_col), "n",
                      F.explode(F.slice("hs", F.lit(1), plen)).alias("s"))
    full = sets.select(F.col(id_col), "n",
                       F.posexplode("hs").alias("j", "s"))
    a, b = pre.alias("a"), full.alias("b")
    cand = (a.join(b, on=[
                F.col("a.s") == F.col("b.s"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
                F.col("b.n") * den >= F.col("a.n") * num,
                (F.col("b.n") - F.col("b.j")) * den
                >= F.col("a.n") * num,
            ])
            .select(F.col(f"a.{id_col}").alias("doc_src"),
                    F.col(f"b.{id_col}").alias("doc_container"))
            .distinct())
    sa = sets.select(F.col(id_col).alias("doc_src"),
                     F.col("hs").alias("_ha"), F.col("n").alias("_na"))
    sb = sets.select(F.col(id_col).alias("doc_container"),
                     F.col("hs").alias("_hb"))
    return (cand.join(sa, on="doc_src").join(sb, on="doc_container")
            .withColumn("n_shared",
                        F.size(F.array_intersect("_ha", "_hb")))
            .filter(F.col("n_shared") * den >= F.col("_na") * num)
            .select("doc_src", "doc_container", "n_shared",
                    (F.col("n_shared").cast("double")
                     / F.col("_na").cast("double")).alias("containment")))


def estimate_prefix_candidates(
    sets: DataFrame,
    num: int = 1,
    den: int = 2,
    containment: bool = True,
) -> dict:
    """PREFLIGHT candidate-volume estimate for the prefix-filter joins —
    one hash aggregate over the shingle table, returning an UPPER BOUND
    on the candidate-match row count the join would shuffle (before
    pair dedup/verification) plus its per-document ratio. Self-matches
    (a.id == b.id, which the join excludes) are subtracted exactly; the
    join's size-ratio and positional predicates are NOT modeled, so the
    true shuffled volume is ≤ the estimate — on duplicate-heavy corpora
    ``per_doc`` is correspondingly conservative (it can only overstate,
    never understate, the blow-up risk the preflight exists to catch).

    Why this exists (r9 scale-soak finding): a lossless set-similarity
    join's candidate volume is Σ_s prefix_df(s)·df(s) (containment) or
    Σ_s prefix_df(s)² (Jaccard) — corpus-SHAPE-dependent, not
    corpus-size-dependent. On Zipfian real-text shingles the rare-first
    prefixes keep it near-linear; on a dense/homogeneous corpus (the
    soak generator's 48-word vocabulary, where every pair of documents
    shares shingles) it is Θ(n²) while the qualifying result stays
    linear — and NO lossless filter can beat that, because the
    candidate set must contain every qualifying pair and the corpus
    makes almost every pair plausible. At 100 TB the right move is to
    KNOW before launching: this estimate costs one shuffle of the
    (shingle, df) table; if ``est_candidates / n_docs`` is far above
    the expected matches-per-doc, route the corpus through the
    probabilistic prescreen (banded MinHash-LSH, ``lsh_candidates``)
    or a stricter threshold instead."""
    plen = (F.col("n")
            - F.expr(f"({num} * n + {den - 1}) div {den}")
            + F.lit(1)).cast("int")
    pre = sets.select(F.explode(F.slice("hs", F.lit(1), plen)).alias("s"))
    pdf_counts = pre.groupBy("s").agg(F.count(F.lit(1)).alias("pdf"))
    if containment:
        full = sets.select(F.explode("hs").alias("s"))
        dfc = full.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        j = pdf_counts.join(dfc, on="s")
        row = j.agg(F.sum(F.col("pdf").cast("long")
                          * F.col("df").cast("long")).alias("e"),
                    # each doc's prefix token also appears in its own
                    # full list exactly once (hs is distinct) → the
                    # a.id == b.id contribution is Σ_d plen_d = Σ pdf
                    F.sum(F.col("pdf").cast("long")).alias("self")
                    ).first()
        est = (row["e"] or 0) - (row["self"] or 0)
    else:
        row = pdf_counts.agg(F.sum(F.col("pdf").cast("long")
                                   * F.col("pdf").cast("long")).alias("e"),
                             F.sum(F.col("pdf").cast("long")).alias("self")
                             ).first()
        est = (row["e"] or 0) - (row["self"] or 0)
    n_docs = sets.count()
    return {"est_candidates": int(est), "n_docs": int(n_docs),
            "per_doc": (int(est) / max(n_docs, 1))}


def jaccard_join(
    df: DataFrame,
    sim_num: int = 1,
    sim_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sets: DataFrame | None = None,
    auto: bool = True,
    per_doc_budget: float | None = None,
    route_out: dict | None = None,
) -> DataFrame:
    """SELF-ROUTING exact-threshold Jaccard set-similarity join — the
    symmetric sibling of ``containment_join``: the lossless prefix
    filter's candidate volume is Σ prefix_df(s)² — the same corpus-
    shape dependence (the r9/r10 soaks measured its shuffle-per-row
    growing 1.72× at 10× on the dense corpus, the early warning of the
    same Θ(n²) wall the containment join hit). ``auto=True`` runs the
    one-aggregate preflight (``estimate_prefix_candidates`` with the
    Jaccard Σ pdf² volume) and routes:

    - ``per_doc ≤ budget`` → ``prefix_filter_join`` — LOSSLESS;
    - above budget → banded MinHash-LSH candidates ∪ exact-text-hash
      pairs + EXACT Jaccard re-verification. Bounded cost; recall is
      the LSH detection curve around τ (far better matched here than
      for containment — the band geometry is tuned for Jaccard), and
      the exact-hash union keeps identical docs findable when their
      band bucket overflows the quadratic-guard cap.

    Same output schema as ``prefix_filter_join``:
    (doc_a, doc_b, n_shared, jaccard), doc_a < doc_b."""
    if sets is None:
        sets = ordered_shingle_sets(df, text_col, id_col, n)
    if per_doc_budget is None:
        per_doc_budget = CONTAINMENT_PER_DOC_BUDGET
    if auto:
        decision = estimate_prefix_candidates(
            sets, num=sim_num, den=sim_den, containment=False)
        decision["route"] = ("prefix"
                             if decision["per_doc"] <= per_doc_budget
                             else "prescreen")
        decision["per_doc_budget"] = per_doc_budget
    else:
        decision = {"route": "prefix", "forced": True}
    if route_out is not None:
        route_out.update(decision)
    if decision["route"] == "prefix":
        return prefix_filter_join(df, sim_num=sim_num, sim_den=sim_den,
                                  text_col=text_col, id_col=id_col,
                                  n=n, sets=sets)
    ex = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    ea, eb = ex.alias("ea"), ex.alias("eb")
    ex_pairs = (ea.join(eb, on=[F.col("ea._h") == F.col("eb._h"),
                                F.col(f"ea.{id_col}")
                                < F.col(f"eb.{id_col}")])
                .select(F.col(f"ea.{id_col}").alias("doc_a"),
                        F.col(f"eb.{id_col}").alias("doc_b")))
    cand = (lsh_candidate_pairs(df, text_col=text_col, id_col=id_col)
            .union(ex_pairs).distinct())
    sa = sets.select(F.col(id_col).alias("doc_a"),
                     F.col("hs").alias("_ha"), F.col("n").alias("_na"))
    sb = sets.select(F.col(id_col).alias("doc_b"),
                     F.col("hs").alias("_hb"), F.col("n").alias("_nb"))
    return (cand.join(sa, on="doc_a").join(sb, on="doc_b")
            .filter((F.col("_na") * sim_den >= F.col("_nb") * sim_num)
                    & (F.col("_nb") * sim_den >= F.col("_na") * sim_num))
            .withColumn("n_shared",
                        F.size(F.array_intersect("_ha", "_hb")))
            .filter(F.col("n_shared") * (sim_num + sim_den)
                    >= F.lit(sim_num) * (F.col("_na") + F.col("_nb")))
            .select("doc_a", "doc_b", "n_shared",
                    (F.col("n_shared").cast("double")
                     / (F.col("_na") + F.col("_nb") - F.col("n_shared")))
                    .alias("jaccard")))


#: default routing budget for ``containment_join(auto=True)``: prefix-
#: filter candidate volume per document above which the corpus is
#: treated as dense and routed through the LSH prescreen. Real-text
#: (Zipfian) corpora measure single-digit per_doc at the C≥1/2
#: threshold (SCALE.md r9 isolation run); the dense soak corpus
#: measures in the thousands — the two regimes are orders of magnitude
#: apart, so the exact cut is not delicate.
CONTAINMENT_PER_DOC_BUDGET = 64.0


def containment_route(
    sets: DataFrame,
    num: int = 1,
    den: int = 2,
    per_doc_budget: float = CONTAINMENT_PER_DOC_BUDGET,
) -> dict:
    """Routing decision for ``containment_join(auto=True)``: run the
    candidate-volume preflight and pick ``'prefix'`` (lossless
    prefix-filter join) when the corpus shape keeps candidates
    near-linear, else ``'prescreen'`` (banded-LSH candidate generation
    + exact containment re-check). Returns the estimate dict with a
    ``route`` key so callers/logs can see WHY."""
    est = estimate_prefix_candidates(sets, num=num, den=den,
                                     containment=True)
    est["route"] = ("prefix" if est["per_doc"] <= per_doc_budget
                    else "prescreen")
    est["per_doc_budget"] = per_doc_budget
    return est


def containment_join(
    df: DataFrame,
    num: int = 1,
    den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    sets: DataFrame | None = None,
    auto: bool = True,
    per_doc_budget: float = CONTAINMENT_PER_DOC_BUDGET,
    route_out: dict | None = None,
) -> DataFrame:
    """SELF-ROUTING directed containment join — the 100 TB front door
    for quote/subset detection. The r9 scale soak proved the lossless
    prefix-filter join's candidate volume is corpus-SHAPE-dependent
    (Θ(Σ prefix_df·df)): near-linear on Zipfian real text, Θ(n²) on
    dense/homogeneous vocabularies where no lossless filter CAN do
    better (the candidate set must contain every qualifying pair and
    the corpus makes almost every pair plausible). Launching the wrong
    plan at 100 TB is a cluster-day mistake, so with ``auto=True`` the
    operator runs the one-aggregate preflight
    (``estimate_prefix_candidates``) and routes:

    - ``per_doc ≤ budget`` → ``containment_prefix_join`` — LOSSLESS,
      the default on real-text corpora;
    - above budget → banded MinHash-LSH candidate generation
      (bucket-capped, both directed orders) + EXACT containment
      re-verification of every candidate. Bounded cost at any density.

    Honest recall note on the prescreen path: MinHash-LSH detects
    JACCARD, and a short document fully contained in a much longer one
    has Jaccard ≈ n_src/n_container — so extremely size-asymmetric
    containment pairs can be missed by the prescreen (symmetric LSH
    cannot index directed containment; that asymmetry is inherent, cf.
    Shrivastava & Li's asymmetric-LSH line of work). Two mitigations
    keep the miss class narrow: (a) the candidate set UNIONS an
    exact-text-hash pair source — one linear md5 groupBy-join — so
    identical documents are found even when their LSH band bucket
    overflows the quadratic-guard cap and is dropped (the r10 dense
    soak measured exactly that: the cap-dropped mega-buckets held the
    whole exact-dup skeleton); (b) the router only takes the prescreen
    on corpora where the lossless plan is Θ(n²). Verified survivors
    are exact (no false positives ever).

    Pass ``route_out={}`` to receive the preflight numbers + chosen
    route. ``auto=False`` forces the prefix path (legacy behavior)."""
    if sets is None:
        sets = ordered_shingle_sets(df, text_col, id_col, n)
    if auto:
        decision = containment_route(sets, num=num, den=den,
                                     per_doc_budget=per_doc_budget)
    else:
        decision = {"route": "prefix", "forced": True}
    if route_out is not None:
        route_out.update(decision)
    if decision["route"] == "prefix":
        return containment_prefix_join(df, num=num, den=den,
                                       text_col=text_col, id_col=id_col,
                                       n=n, sets=sets)
    # prescreen path: undirected LSH candidates ∪ exact-text-hash pairs
    # → both directed orders → exact array-intersect verification
    # (+ the same size filter the prefix join applies before
    # verification). The exact-hash source is one linear md5 groupBy
    # self-join whose pair volume is output-proportional (dup groups of
    # size m yield m(m−1) TRUE directed pairs), and it is what keeps
    # identical documents findable when their LSH band bucket overflows
    # the quadratic-guard cap and is dropped.
    ex = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    ea, eb = ex.alias("ea"), ex.alias("eb")
    ex_pairs = (ea.join(eb, on=[F.col("ea._h") == F.col("eb._h"),
                                F.col(f"ea.{id_col}")
                                < F.col(f"eb.{id_col}")])
                .select(F.col(f"ea.{id_col}").alias("doc_a"),
                        F.col(f"eb.{id_col}").alias("doc_b")))
    cand = (lsh_candidate_pairs(df, text_col=text_col, id_col=id_col)
            .union(ex_pairs).distinct())
    directed = cand.union(
        cand.select(F.col("doc_b").alias("doc_a"),
                    F.col("doc_a").alias("doc_b")))
    sa = sets.select(F.col(id_col).alias("doc_a"),
                     F.col("hs").alias("_ha"), F.col("n").alias("_na"))
    sb = sets.select(F.col(id_col).alias("doc_b"),
                     F.col("hs").alias("_hb"), F.col("n").alias("_nb"))
    return (directed
            .join(sa, on="doc_a").join(sb, on="doc_b")
            .filter(F.col("_nb") * den >= F.col("_na") * num)
            .withColumn("n_shared",
                        F.size(F.array_intersect("_ha", "_hb")))
            .filter(F.col("n_shared") * den >= F.col("_na") * num)
            .select(F.col("doc_a").alias("doc_src"),
                    F.col("doc_b").alias("doc_container"),
                    "n_shared",
                    (F.col("n_shared").cast("double")
                     / F.col("_na").cast("double")).alias("containment")))
