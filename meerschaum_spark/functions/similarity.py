"""Similarity search over embedding columns (``array<float>``).

Two paths:
  * ``cosine_topk`` — brute-force exact top-k: broadcast the query set,
    one pass over the corpus, per-query window rank. O(Q × N) but fully
    JVM-side; the right baseline and the fallback when recall must be 1.
  * ``ann_lsh_topk`` — random-hyperplane LSH: 8 deterministic ±1
    hyperplanes bucket vectors by sign pattern; candidates come from an
    equi-join on the bucket id, then exact re-rank. This is the 100 TB
    path: the corpus-side work is one projection + one equi-join.

Determinism note (oracle parity): dot products accumulate in DECIMAL —
exact and order-insensitive — then surface as DOUBLE; float sums would
drift with Spark's partitioning vs DuckDB's scan order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meerschaum_spark.catalog import hash60
from meerschaum_spark.functions.persist import pin as _pin

VDEC = "decimal(12,9)"   # element type: float32 ≈ 7 sig digits; 9 exact decimals
ACC = "decimal(30,18)"   # product = (25,18) exact; 12 integer digits of headroom

N_PLANES = 8


def _dot_dec(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast(VDEC) * y.cast(VDEC))
    # the explicit cast pins the accumulator type: Spark's decimal `+`
    # widens to (31,18) which would not match the aggregate state type
    return F.aggregate(prods, F.lit(0).cast(ACC),
                       lambda acc, x: (acc + x).cast(ACC))


def _norm_dbl(v):
    return F.sqrt(_dot_dec(v, v).cast("double"))


def _dot_dbl(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact_decimal: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k of each query against the corpus.

    ``exact_decimal=False`` switches the dot product to plain double
    arithmetic — ~10× cheaper and the right production setting; the
    decimal default exists so results are bit-reproducible regardless of
    partitioning (the catalog's oracle requirement). Ranks only differ
    when two cosines collide within float rounding."""
    # norms are per-vector, not per-pair: compute them once on each side
    # of the join (Q + N norm computations instead of Q × N)
    dot = _dot_dec if exact_decimal else _dot_dbl
    norm = _norm_dbl if exact_decimal else (
        lambda v: F.sqrt(_dot_dbl(v, v)))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      norm(F.col(vec_col)).alias("cnorm"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       norm(F.col(vec_col)).alias("qnorm"))
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    cosine = (dot(F.col("qv"), F.col("cv")).cast("double")
              / (F.col("qnorm") * F.col("cnorm")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _plane_component(p: int, d, seed: str = "") -> F.Column:
    """Deterministic ±1 hyperplane component for (plane p, dimension d).
    ``seed`` derives independent plane families (multi-table LSH)."""
    bit = hash60(F.concat(F.lit(f"{seed}plane{p}_"),
                          d.cast("string"))).bitwiseAND(F.lit(1))
    return F.when(bit == 1, F.lit(1).cast(VDEC)).otherwise(F.lit(-1).cast(VDEC))


def _plane_bit(p: int, d: int, seed: str = "") -> int:
    """Driver-side replica of ``_plane_component``'s bit: first 15 hex
    digits of md5, low bit. Must stay identical to ``hash60`` so literal
    plane arrays reproduce the expression path exactly."""
    import hashlib
    h = hashlib.md5(f"{seed}plane{p}_{d}".encode()).hexdigest()
    return int(h[:15], 16) & 1


def lsh_bucket(vec_col, n_planes: int = N_PLANES, seed: str = "",
               dim: int | None = None) -> F.Column:
    """Sign-pattern bucket id from ``n_planes`` deterministic ±1
    hyperplanes. Signs are computed on exact decimal sums so bucketing is
    reproducible across engines. More planes → smaller buckets (finer
    recall/cost tradeoff): expected bucket occupancy is N / 2^n_planes,
    so size n_planes ≈ log2(N / desired_bucket_size) for the corpus.

    ``dim`` (embedding dimensionality) switches to literal plane-sign
    arrays instead of deriving each sign via md5 per row. The two paths
    are value-identical (same ±1 decimals, same accumulation order).
    Measured at sf0.1/dim=64 the md5 expression path is FASTER (the
    ~n_planes×dim-literal tree pays more in codegen compilation than the
    per-row hashing costs), so the catalog uses the default; the literal
    path exists for very wide embeddings or reused-plan pipelines where
    compile-once amortizes."""
    if dim is not None:
        # loud guard: zip_with null-pads on length mismatch, which would
        # silently flip the sign accumulation — fail the job instead of
        # bucketing wrong
        vec_col = F.when(
            F.size(vec_col) == F.lit(dim), vec_col
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"lsh_bucket: expected dim={dim}, got vector of size "),
            F.size(vec_col).cast("string"))))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        if dim is not None:
            signs = F.array(*[
                F.lit(1 if _plane_bit(p, d, seed) else -1).cast(VDEC)
                for d in range(dim)])
            terms = F.zip_with(vec_col, signs,
                               lambda x, s: s * x.cast(VDEC))
        else:
            terms = F.transform(
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda d: _plane_component(p, d, seed)
                * F.element_at(vec_col, d + 1).cast(VDEC),
            )
        dot = F.aggregate(terms, F.lit(0).cast(ACC),
                          lambda acc, x: (acc + x).cast(ACC))
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")) \
            .otherwise(F.lit(0).cast("long"))
    return bucket


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding dimensionality from one row (None on empty input)."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    return None if row is None else row["n"]


def lsh_buckets_agg(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    seeds: list[str],
    dim: int,
) -> DataFrame:
    """All (table, bucket) assignments for every vector, via ONE codegen'd
    aggregation instead of per-row fold lambdas.

    The per-plane signed sums Σ ±x_d are what ``lsh_bucket`` computes with
    interpreted higher-order-function folds — len(seeds)×n_planes×dim
    decimal ops per row OUTSIDE whole-stage codegen, which dominates the
    bucket pass. Here the vector posexplodes once, broadcast-joins a
    dim-row sign table carrying one ±1 decimal column per (table, plane),
    and one hash aggregate produces every plane sum in codegen. Decimal
    sums are exact and order-insensitive, so the sums — and therefore the
    buckets — are bit-identical to the fold path (asserted in
    tests/test_functions.py).

    Returns columns: ``<id_col>``, ``tbl`` (index into ``seeds``),
    ``bkt``.
    """
    import pandas as _pd

    spark = df.sparkSession
    sign_rows = {
        "_pos": list(range(dim)),
        **{
            f"_s_{t}_{p}": [
                1.0 if _plane_bit(p, d, seeds[t]) else -1.0
                for d in range(dim)
            ]
            for t in range(len(seeds)) for p in range(n_planes)
        },
    }
    signs = spark.createDataFrame(_pd.DataFrame(sign_rows))
    signs = signs.select(
        "_pos", *[F.col(c).cast(VDEC).alias(c)
                  for c in signs.columns if c != "_pos"])
    ex = df.select(F.col(id_col),
                   F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
    j = ex.join(F.broadcast(signs), on="_pos")
    x = F.col("_x").cast(VDEC)
    sums = j.groupBy(id_col).agg(*[
        F.sum(x * F.col(f"_s_{t}_{p}")).alias(f"_d_{t}_{p}")
        for t in range(len(seeds)) for p in range(n_planes)
    ])
    tbl_buckets = []
    for t in range(len(seeds)):
        bkt = F.lit(0).cast("long")
        for p in range(n_planes):
            bkt = bkt + F.when(F.col(f"_d_{t}_{p}") > 0,
                               F.lit(1 << p).cast("long")) \
                .otherwise(F.lit(0).cast("long"))
        tbl_buckets.append(
            F.struct(F.lit(t).alias("tbl"), bkt.alias("bkt")))
    return (sums.select(F.col(id_col),
                        F.explode(F.array(*tbl_buckets)).alias("bb"))
            .select(id_col, "bb.tbl", "bb.bkt"))


def _sqdist_dec(a, b):
    """Exact-decimal squared L2 distance (order-insensitive sum)."""
    diffs = F.zip_with(a, b,
                       lambda x, y: (x.cast(VDEC) - y.cast(VDEC))
                       * (x.cast(VDEC) - y.cast(VDEC)))
    return F.aggregate(diffs, F.lit(0).cast(ACC),
                       lambda acc, x: (acc + x).cast(ACC))


def assign_ivf_cells(
    df: DataFrame,
    centroids: "DataFrame | list",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment as a narrow projection: the centroid set is
    broadcast-sized by contract, so collect it to the driver and embed it
    as a literal array; each row's cell is then an argmin over that array
    (exact-decimal squared distance, centroid-id tie-break via struct
    ordering). Zero shuffle and zero row multiplication — the previous
    relational form (cross join + row_number window partitioned by the
    vector id) shuffled |centroids|× the corpus just to take an argmin,
    which at 100 TB is the whole job's cost."""
    rows = _id_vec_rows(centroids, id_col, vec_col)
    if not rows:
        raise ValueError("assign_ivf_cells: empty centroid set")
    # one parsed SQL string (measured: the Column-API literal form cost
    # ~1 s of py4j round trips per plan build at 16×64); the literal
    # arrays cast back to array<float> inside _cent_scored_sql so the
    # float→decimal cast sequence is byte-identical to computing
    # against the original column. array_min on structs orders
    # lexicographically: (distance asc, centroid id asc) — exactly the
    # argmin tie-break.
    qcol = "`" + vec_col.replace("`", "``") + "`"
    scored = _cent_scored_sql(qcol, rows, id_col, vec_col)
    return df.withColumn("cell", F.expr(f"array_min({scored}).cid"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """IVF ANN (nprobe=1): assign corpus and queries to their nearest
    coarse centroid, equi-join on the cell, exact cosine re-rank inside.
    At 100 TB the corpus side is one assignment pass + a cell-partitioned
    join; centroids stay broadcast-sized."""
    c = assign_ivf_cells(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm_dbl(F.col(vec_col)).alias("cnorm"), "cell")
    q = assign_ivf_cells(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm_dbl(F.col(vec_col)).alias("qnorm"), "cell")
    joined = c.join(F.broadcast(q), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    cosine = (_dot_dec(F.col("qv"), F.col("cv")).cast("double")
              / (F.col("qnorm") * F.col("cnorm")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: equi-join query and corpus vectors on their LSH
    bucket, exact cosine re-rank inside the bucket. The corpus-side
    bucket pass uses the aggregated (codegen) form when the
    dimensionality can be probed; queries/corpus get their buckets from
    the same pass so the two sides agree by construction."""
    dim = _probe_dim(corpus, vec_col)
    if dim is not None:
        def _with_bucket(df: DataFrame) -> DataFrame:
            b = (lsh_buckets_agg(df, id_col, vec_col, n_planes,
                                 seeds=[""], dim=dim)
                 .drop("tbl").withColumnRenamed("bkt", "bucket"))
            return df.join(b, on=id_col)
        cb, qb = _with_bucket(corpus), _with_bucket(queries)
        c = cb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"),
                      _norm_dbl(F.col(vec_col)).alias("cnorm"), "bucket")
        q = qb.select(F.col(id_col).alias("query_id"),
                      F.col(vec_col).alias("qv"),
                      _norm_dbl(F.col(vec_col)).alias("qnorm"), "bucket")
    else:
        c = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"),
                          _norm_dbl(F.col(vec_col)).alias("cnorm"),
                          lsh_bucket(F.col(vec_col), n_planes).alias("bucket"))
        q = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qv"),
                           _norm_dbl(F.col(vec_col)).alias("qnorm"),
                           lsh_bucket(F.col(vec_col), n_planes).alias("bucket"))
    joined = c.join(F.broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id"))
    cosine = (_dot_dec(F.col("qv"), F.col("cv")).cast("double")
              / (F.col("qnorm") * F.col("cnorm")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        joined.select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: multi-table random-hyperplane LSH
    candidates, exact-cosine threshold filter.

    The OR-construction (``n_tables`` independent plane families, a pair
    is a candidate if it collides in ANY table) is what makes recall work:
    one table of p planes accepts a cosine-θ pair with probability
    (1 − θ/π)^p, so several coarse tables beat one fine one. Corpus-side
    work is one projection emitting n_tables bucket ids per vector and a
    per-table equi-join — never a cross join; at 100 TB this is the same
    shape as a production near-dup pass (candidates are rare, the exact
    re-rank is cheap).

    Size ``n_planes`` to the corpus: expected bucket occupancy is
    N / 2^n_planes, and candidate volume per table is quadratic in
    occupancy — undersized planes (big buckets) turn the candidate join
    quadratic exactly like an uncapped shingle join. The bucket table
    carries IDS ONLY (n_tables × a 12-byte row per vector — the explode
    must not multiply the embedding itself); vectors re-attach to the
    deduplicated candidate pairs, so both the checkpoint footprint and
    the self-join shuffle are independent of embedding width, and the
    exact-cosine work is proportional to candidates, not to candidate
    multiplicity across tables.

    The bucket pass runs through ``lsh_buckets_agg`` — one codegen'd
    aggregation for all n_tables × n_planes signed sums (``dim`` probed
    from the data when omitted) — because the per-row fold form pays
    n_tables × n_planes × dim interpreted decimal ops per vector."""
    if dim is None:
        dim = _probe_dim(corpus, vec_col)
    buckets = lsh_buckets_agg(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col)),
        "vid", vec_col, n_planes,
        seeds=[f"tbl{t}_" for t in range(n_tables)], dim=dim)
    buckets = buckets.transform(_pin)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bkt") == F.col("b.bkt"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("vec_a"), F.col("b.vid").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = corpus.select(F.col(id_col).alias("vid"),
                         F.col(vec_col).alias("vec"),
                         _norm_dbl(F.col(vec_col)).alias("norm"))
    va, vb = vecs.alias("va_t"), vecs.alias("vb_t")
    pairs = (
        cand.join(va, F.col("vec_a") == F.col("va_t.vid"))
        .join(vb, F.col("vec_b") == F.col("vb_t.vid"))
        .select("vec_a", "vec_b",
                F.col("va_t.vec").alias("va"), F.col("vb_t.vec").alias("vb"),
                F.col("va_t.norm").alias("na"), F.col("vb_t.norm").alias("nb"))
    )
    # Two-stage threshold: a cheap double-precision cosine prunes the
    # candidate bulk inside a guard band (double dot error over a few
    # hundred float dims is ≲1e-12, the band is 1e-6), then the exact
    # decimal cosine — the cross-engine-deterministic value — is computed
    # only for near-threshold survivors and applies the real filter. The
    # result set is identical to running the decimal filter on every
    # candidate; the decimal work drops from |candidates| to |pairs|.
    fast = (_dot_dbl(F.col("va"), F.col("vb"))
            / (F.col("na") * F.col("nb")))
    cosine = (_dot_dec(F.col("va"), F.col("vb")).cast("double")
              / (F.col("na") * F.col("nb")))
    return (pairs.filter(fast >= F.lit(threshold) - F.lit(1e-6))
            .select("vec_a", "vec_b", cosine.alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def label_centroid_stats(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label embedding hygiene: each label's centroid direction and
    how tightly its members hug it (n, average and minimum cosine to the
    centroid). Low averages / outlier minimums flag mislabeled or noisy
    classes before training.

    Determinism recipe: the centroid is represented by the per-dimension
    exact-DECIMAL SUM vector (cosine is scale-invariant, so dividing by
    the count — whose decimal division rules differ across engines — is
    never needed); per-row dot products are fixed-order double folds over
    the dimensions (order-deterministic because they are per-row array
    folds, not cross-partition aggregates). Plan: one explode + two hash
    aggregations for the sum vectors (broadcast-sized: one row per
    label), a broadcast join back, then one narrow pass."""
    x = F.col("_x")
    ex = df.select(F.col(label_col),
                   F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
    sums = (ex.groupBy(label_col, "_pos")
            .agg(F.sum(x.cast(VDEC)).cast("decimal(22,9)").alias("_s")))
    svecs = (sums.groupBy(label_col)
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                 lambda p: p["_s"]).alias("_svec")))

    def fold_dot(a, b):
        return F.aggregate(
            F.zip_with(a, b,
                       lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0), lambda acc, t: acc + t)

    svecs = svecs.withColumn(
        "_ns", F.sqrt(fold_dot(F.col("_svec"), F.col("_svec"))))
    joined = df.join(F.broadcast(svecs), on=label_col)
    # zero-norm guard (a label whose members cancel exactly, or a zero
    # vector): cosine undefined -> NULL, skipped by the aggregates
    denom = (F.sqrt(fold_dot(F.col(vec_col), F.col(vec_col)))
             * F.col("_ns"))
    cos = F.when(denom != 0,
                 fold_dot(F.col(vec_col), F.col("_svec")) / denom)
    return (joined.select(F.col(label_col), cos.alias("_cos"))
            .groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 (F.sum(F.col("_cos").cast("decimal(18,12)"))
                  .cast("double") / F.count(F.lit(1))).alias("avg_cos"),
                 F.min("_cos").alias("min_cos"))
            .orderBy(label_col))


def kmeans_assign(df: DataFrame, cents: list, vec_col: str = "embedding",
                  cell_col: str = "cell") -> DataFrame:
    """Assign each vector to its nearest centroid from a literal list of
    ``(cell_id, [double, ...])`` — the k-means analogue of
    ``assign_ivf_cells``: centroids are broadcast-sized by contract, so
    the argmin is a narrow projection over a literal struct array (zero
    shuffle, zero row multiplication). Distances are double (both
    engines fold the same IEEE ops in the same order); ties break on the
    lower cell id via lexicographic struct ordering.

    The whole argmin is ONE ``F.expr`` SQL string rather than a
    Column-API tree: k x dim literal leaves built one Py4J call at a
    time cost ~2 s of driver latency PER ASSIGNMENT (measured at
    k=8 x dim=64); a single string parses JVM-side in milliseconds.
    Double literals round-trip exactly through ``repr`` (shortest
    exact decimal) + Spark's correctly-rounded string->double cast."""
    structs = []
    for cid, cv in cents:
        arr = ", ".join(f"CAST('{float(c)!r}' AS DOUBLE)" for c in cv)
        d = (f"aggregate(zip_with({vec_col}, array({arr}), "
             f"(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
             f"CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)")
        structs.append(
            f"struct({d} AS d, CAST({int(cid)} AS BIGINT) AS cid)")
    return df.withColumn(
        cell_col, F.expr(f"array_min(array({', '.join(structs)}))['cid']"))


def kmeans_stats(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means for a fixed number of iterations,
    returning per-cluster quality stats (size + within-cluster sum of
    squares). Seeded deterministically from the ``k`` vectors with the
    smallest ids (KMeans|| would add a second job per round; seeded init
    keeps the oracle replayable).

    Each iteration is one narrow assignment pass (literal-centroid
    argmin — no shuffle) plus one explode + hash aggregation for the
    per-dimension sums; the k x dim sum table (~512 values) collects to
    the driver exactly like a broadcast join's build side, so per-round
    cost at 100 TB is one scan + one map-side-combining agg.

    Determinism recipe: per-dimension sums accumulate in exact DECIMAL;
    new centroid components are double(str(sum))/n (correctly-rounded
    decimal->double, then one IEEE division — replayed in SQL as
    CAST(CAST(s AS VARCHAR) AS DOUBLE)/n); distances are per-row double
    folds. WCSS uses the identity sum||x-mu||^2 = sum||x||^2 -
    ||s||^2/n, so no per-row distance to a divided mean is ever needed:
    sum||x||^2 is exact decimal, ||s||^2/n is a double fold over the
    sum vector. Cells that lose every member drop out of later rounds
    (their rows re-assign to surviving centroids).
    """
    init_rows = sorted(
        df.filter(F.col(id_col) < k).select(id_col, vec_col).collect(),
        key=lambda r: r[0])
    if not init_rows:
        raise ValueError("kmeans_stats: no seed vectors with id < k")
    cents = [(int(r[0]), [float(x) for x in r[1]]) for r in init_rows]

    assigned = None
    for it in range(iters):
        assigned = kmeans_assign(df, cents, vec_col)
        if it == iters - 1:
            break
        ex = assigned.select("cell", F.posexplode(F.col(vec_col))
                             .alias("_pos", "_x"))
        sums = (ex.groupBy("cell", "_pos")
                .agg(F.sum(F.col("_x").cast("double").cast(VDEC))
                     .cast("decimal(22,9)").alias("_s"),
                     F.count(F.lit(1)).alias("_n")))
        rows = sums.collect()  # k x dim rows: broadcast-sized by contract
        by_cell: dict = {}
        for r in rows:
            by_cell.setdefault(int(r["cell"]), []).append(
                (int(r["_pos"]), float(str(r["_s"])) / int(r["_n"])))
        cents = [(cell, [v for _, v in sorted(vals)])
                 for cell, vals in sorted(by_cell.items())]

    xx = F.aggregate(
        F.transform(F.col(vec_col),
                    lambda x: x.cast("double").cast(VDEC)
                    * x.cast("double").cast(VDEC)),
        F.lit(0).cast(ACC), lambda acc, t: (acc + t).cast(ACC))
    # compute _xx one projection BELOW the generator: a generator's
    # sibling expressions re-evaluate per OUTPUT row, so co-locating
    # the 64-element decimal fold with posexplode ran it ×dim per
    # vector (the r13 _train_ann_centroids lesson; references are safe)
    per_cell = (assigned.select("cell", xx.alias("_xx"),
                                F.col(vec_col))
                .select("cell", "_xx",
                        F.posexplode(F.col(vec_col))
                        .alias("_pos", "_x"))
                .groupBy("cell", "_pos")
                .agg(F.sum(F.col("_x").cast("double").cast(VDEC))
                     .cast("decimal(22,9)").alias("_s"),
                     F.sum("_xx").alias("_sxx"),
                     F.count(F.lit(1)).alias("_n")))
    # _sxx/_n repeat per dimension; pos 0 carries the per-cell truth
    svecs = (per_cell.groupBy("cell")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
                 lambda p: p["_s"]).alias("_svec"),
                 F.max(F.when(F.col("_pos") == 0, F.col("_sxx")))
                 .alias("_sumxx"),
                 F.max(F.when(F.col("_pos") == 0, F.col("_n")))
                 .alias("n_vecs")))
    ssq = F.aggregate(
        F.transform(F.col("_svec"),
                    lambda s: s.cast("double") * s.cast("double")),
        F.lit(0.0), lambda acc, t: acc + t)
    wcss = (F.col("_sumxx").cast("double")
            - ssq / F.col("n_vecs"))
    return (svecs.select(F.col("cell"), F.col("n_vecs"),
                         wcss.alias("wcss"),
                         (wcss / F.col("n_vecs")).alias("avg_sqdist"))
            .orderBy("cell"))


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023's shape):
    cluster the corpus with coarse centroids, then inside each cluster
    drop every vector that has a near-duplicate (cosine >= threshold)
    with a smaller id. Returns (vec_id, cell, kept).

    The cluster pass is what bounds the quadratic: candidate pairs form
    only within a cell, so sizing k proportionally to N keeps per-cell
    occupancy - and the pairwise work - constant. This uses the
    order-independent "dominated by any earlier id" rule rather than the
    sequential greedy sweep (which chains: a~b, b~c, a!~c keeps c);
    dominated-by-earlier is embarrassingly parallel, SQL-replayable, and
    upper-bounds the dedup - the right variant for a distributed engine.

    Cost shape: one assignment pass (literal-centroid argmin, no
    shuffle), one cell-keyed self-join, double-precision prefilter with
    a 1e-6 guard band, exact-decimal cosine only for near-threshold
    survivors (the cross-engine-deterministic value)."""
    assigned = assign_ivf_cells(corpus, centroids, id_col, vec_col)
    base = assigned.select(F.col(id_col).alias("vid"),
                           F.col(vec_col).alias("vec"),
                           _norm_dbl(F.col(vec_col)).alias("norm"),
                           "cell")
    a, b = base.alias("sd_a"), base.alias("sd_b")
    pairs = (a.join(b, (F.col("sd_a.cell") == F.col("sd_b.cell"))
                    & (F.col("sd_a.vid") < F.col("sd_b.vid")))
             .select(F.col("sd_a.vec").alias("va"),
                     F.col("sd_b.vec").alias("vb"),
                     F.col("sd_a.norm").alias("na"),
                     F.col("sd_b.norm").alias("nb"),
                     F.col("sd_b.vid").alias("dominated")))
    fast = _dot_dbl(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    exact = (_dot_dec(F.col("va"), F.col("vb")).cast("double")
             / (F.col("na") * F.col("nb")))
    dominated = (pairs.filter(fast >= F.lit(threshold) - F.lit(1e-6))
                 .filter(exact >= threshold)
                 .select("dominated").distinct()
                 .withColumn("_dom", F.lit(1)))
    return (assigned.join(dominated,
                          assigned[id_col] == dominated["dominated"], "left")
            .select(id_col, "cell", F.col("_dom").isNull().alias("kept"))
            .orderBy(id_col))


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

def int8_quantize_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization with reconstruction error —
    the storage/serving compression step of an embedding pipeline
    (quantize → ship ~4× fewer bytes → dequantize at query time).

    Per vector: ``scale = max|v| / 127``; ``q_i = floor(v_i/scale + 0.5)``
    (explicit half-up so Spark and the SQL oracle round identically —
    each engine's ``round()`` picks a different tie rule); reconstruction
    ``r_i = q_i * scale``. Reports the scale, the quantized L2 error and
    a max elementwise error. Squared-error accumulation quantizes each
    residual to 1e-9 first (``floor(err·1e9 + 0.5)`` → BIGINT) so the sum
    is exact integer arithmetic — order-free and bit-identical across
    engines; no decimal rounding of tiny doubles is ever involved.

    Plan shape: one narrow projection per vector — no shuffle, no UDF,
    no join; at 100 TB this runs at scan speed and writes the quantized
    array alongside.
    """
    v = F.col(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
    scale = max_abs / F.lit(127.0)
    # guard all-zero vectors: scale 0 → quantized all-zero, error 0
    q = F.transform(
        v, lambda x: F.when(max_abs == F.lit(0.0), F.lit(0).cast("long"))
        .otherwise(F.floor(x.cast("double") / scale + F.lit(0.5))))
    err_terms = F.zip_with(
        v, q, lambda x, qi: (x.cast("double") - qi.cast("double") * scale))
    err_q = F.transform(
        err_terms,
        lambda e: F.floor(e * F.lit(1e9) + F.lit(0.5)).cast("long"))
    sq_sum = F.aggregate(
        F.transform(err_q, lambda e: e * e),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    max_err = F.array_max(F.transform(err_terms, lambda e: F.abs(e)))
    n_clip = F.size(F.filter(q, lambda qi: (qi > 127) | (qi < -127)))
    return corpus.select(
        F.col(id_col),
        scale.alias("scale"),
        (sq_sum.cast("double") / F.lit(1e18)).alias("sq_err"),
        max_err.alias("max_abs_err"),
        n_clip.alias("n_clipped"),
    )


# ---------------------------------------------------------------------------
# Top principal direction (power iteration)
# ---------------------------------------------------------------------------

PCA_ELEM_SCALE = 1_000_000.0     # float elements → 1e-6-quantized ints
PCA_ITER_SCALE = 10_000.0        # per-round rescale target max|w| = 1e4


def pca_power_direction(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dominant right-singular direction of the (uncentered) embedding
    matrix via two unrolled power-iteration rounds — the distributed
    building block for SIF-style "remove the top principal component"
    embedding post-processing and PCA whitening.

    Never materializes the d×d gram matrix: each round is two linear
    passes — per-row projections ``t_i = ⟨v_i, w⟩`` (narrow, codegen),
    then the weighted column sum ``w'_j = Σ_i t_i·v_ij`` via
    posexplode + a 64-key hash aggregation (map-side combined). Between
    rounds only the d-vector ``w`` crosses the driver (metadata-sized,
    like k-means centroids), rescaled to max|w| = 1e4.

    Determinism: elements quantize to 1e-6 ints up front; every sum is
    exact int64 arithmetic (order-free, engine-free), and the rescale is
    one double multiply-divide-floor chain replayed identically by the
    SQL oracle. Headroom: |w2| ≲ rows·1e4·1e8 — int64-safe through
    ~1e6 rows per partition-sum at this quantization; rescale more
    aggressively (or accumulate in decimal) beyond that.
    """
    vi = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(PCA_ELEM_SCALE)
                          + F.lit(0.5)).cast("long"))
    base = corpus.select(vi.alias("vi"))
    # round 1: w0 = all-ones → t1 = Σ_k v_ik
    t1 = F.aggregate(F.col("vi"), F.lit(0).cast("long"),
                     lambda acc, x: acc + x)
    r1 = base.select(F.col("vi"), t1.alias("t1"))
    w1_rows = (r1.select(F.posexplode("vi").alias("dim", "el"), "t1")
               .groupBy("dim")
               .agg(F.sum(F.col("t1") * F.col("el")).alias("w1"))
               .collect())
    w1 = {r["dim"]: r["w1"] for r in w1_rows}
    max_abs = max(abs(v) for v in w1.values()) or 1
    import math
    # the exact double chain the oracle replays: (w*1e4)/max_abs, floored
    w1s = {d: math.floor((v * PCA_ITER_SCALE) / max_abs)
           for d, v in w1.items()}
    w1s_lit = F.array(*[F.lit(w1s[d]).cast("long") for d in sorted(w1s)])
    # round 2 with the rescaled literal direction
    t2 = F.aggregate(F.zip_with(F.col("vi"), w1s_lit, lambda x, y: x * y),
                     F.lit(0).cast("long"), lambda acc, x: acc + x)
    r2 = base.select(F.col("vi"), t2.alias("t2"))
    return (r2.select(F.posexplode("vi").alias("dim", "el"), "t2")
            .groupBy("dim")
            .agg(F.sum(F.col("t2") * F.col("el")).alias("w2"))
            .withColumn("w1_scaled",
                        F.element_at(w1s_lit, F.col("dim") + 1))
            .select("dim", "w1_scaled", "w2")
            .orderBy("dim"))


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion + MMR diversification
# ---------------------------------------------------------------------------

RRF_C = 60                      # the standard RRF constant (Cormack 2009)
RRF_SCALE = 1_000_000_000_000   # fixed-point numerator: rrf terms stay exact BIGINTs

MMR_LAMBDA = 0.7
#: spelled as a literal, NOT computed 1 - 0.7: IEEE (1 - 0.7) is
#: 0.30000000000000004, which would diverge from an oracle's 0.3 literal
MMR_ONE_MINUS_LAMBDA = 0.3
MMR_MAX_POOL = 64


def rrf_fuse(ranked: list, k: int = 10, c: int = RRF_C,
             id_col: str = "id") -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of several top-k rank
    lists: ``rrf(d) = sum_i 1 / (c + rank_i(d))``, here in fixed-point
    ``RRF_SCALE div (c + rank)`` so every fused score is an exact BIGINT
    (integral division truncates identically in Spark's ``div`` and
    DuckDB's ``//`` for positive operands — no float anywhere).

    ``ranked`` is a list of ``(label, df)`` pairs where each df carries
    ``(id_col, <label>_rnk)``. Documents missing from a list contribute 0.

    Scale: the inputs are top-k lists (k rows each, produced by
    distributed TakeOrdered upstream), so the fusion join and the final
    ordering run on a few dozen rows — the corpus-scale work happens in
    the rankers, never here.
    """
    fused = None
    for label, df in ranked:
        part = df.select(F.col(id_col).alias("id"),
                         F.col(f"{label}_rnk"))
        fused = part if fused is None else fused.join(part, "id", "full_outer")
    rrf = F.lit(0).cast("long")
    for label, _ in ranked:
        rrf = rrf + F.coalesce(
            F.expr(f"CAST({RRF_SCALE} DIV ({c} + {label}_rnk) AS BIGINT)"),
            F.lit(0).cast("long"))
    w = Window.orderBy(F.col("rrf_fp").desc(), F.col("id"))
    return (fused.withColumn("rrf_fp", rrf)
            .withColumn("fused_rnk", F.row_number().over(w))
            .filter(F.col("fused_rnk") <= k)
            .orderBy("fused_rnk"))


def mmr_diversify(corpus: DataFrame, query_id: int = 0, k: int = 5,
                  pool: int = 16, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein 1998)
    of a cosine top-``pool`` candidate list: greedily pick ``k`` items,
    each maximizing ``0.7 * rel(d) - 0.3 * max_{s in S} sim(d, s)``
    (ties -> lowest id). The standard diversity-selection pass over a
    retrieval pool — for training-data curation it is the "don't fill the
    batch with near-identical examples" operator.

    Plan shape: relevance = one distributed ``cosine_topk`` scan over the
    corpus (the only corpus-scale stage); the pairwise-similarity matrix
    is computed distributed over the <= ``pool`` survivors (broadcast
    self-join) with the same decimal-exact dot products. The greedy
    selection itself is inherently sequential over ``k * pool`` scores,
    so it runs driver-side on the collected pool — bounded by
    ``MMR_MAX_POOL`` (<= 64 rows + <= 64^2/2 sims; metadata-sized, the
    same contract as the BPE trainer's one-row argmax collects).

    The doubles reproduce across engines: ``rel``/``sim`` come off the
    decimal-exact accumulator, and the score chain multiplies the same
    literals in the same order the SQL oracle spells.
    """
    if pool > MMR_MAX_POOL:
        raise ValueError(f"pool={pool} exceeds MMR_MAX_POOL={MMR_MAX_POOL}; "
                         "the greedy stage is contracted driver-local")
    spark = corpus.sparkSession
    q = corpus.filter(F.col(id_col) == query_id)
    pool_df = cosine_topk(corpus, q, id_col=id_col, vec_col=vec_col, k=pool)
    pool_rows = pool_df.select(F.col("neighbor_id").alias("id"),
                               F.col("cosine").alias("rel")).collect()
    schema = ("pick_rank INT, vec_id BIGINT, relevance DOUBLE, "
              "penalty DOUBLE, mmr_score DOUBLE")
    if not pool_rows:
        return spark.createDataFrame([], schema=schema)
    ids = [r["id"] for r in pool_rows]
    vecs = corpus.filter(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    right = vecs.select(F.col("a").alias("b"), F.col("va").alias("vb"))
    sim = (_dot_dec(F.col("va"), F.col("vb")).cast("double")
           / (_norm_dbl(F.col("va")) * _norm_dbl(F.col("vb"))))
    sims_df = (vecs.join(F.broadcast(right), F.col("a") < F.col("b"))
               .select("a", "b", sim.alias("sim")))
    sims: dict = {}
    for r in sims_df.collect():
        sims[(r["a"], r["b"])] = r["sim"]
        sims[(r["b"], r["a"])] = r["sim"]
    rel = {r["id"]: r["rel"] for r in pool_rows}
    selected: list = []
    out: list = []
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for cid in sorted(rel):
            if cid in selected:
                continue
            pen = max((sims[(cid, s)] for s in selected), default=0.0)
            score = MMR_LAMBDA * rel[cid] - MMR_ONE_MINUS_LAMBDA * pen
            key = (score, -cid)
            if best is None or key > best[0]:
                best = (key, cid, pen, score)
        _, cid, pen, score = best
        selected.append(cid)
        out.append((rank, cid, rel[cid], pen, score))
    return spark.createDataFrame(out, schema=schema).orderBy("pick_rank")


# ---------------------------------------------------------------------------
# IVF-PQ: the FAISS IVFADC search shape (coarse cells + PQ codes + ADC)
# ---------------------------------------------------------------------------

def _pq_subdist_dbl(half_col, lit_vals):
    """Sequential double fold of the squared distance between a vector
    slice and a literal codebook slice — spelled exactly like the
    emb_pq_codes oracle's ``list_reduce`` (0.0 + x1 == x1 exactly, so the
    init-seeded Spark fold matches DuckDB's init-free reduce)."""
    lit_arr = F.array(*[F.lit(float(v)) for v in lit_vals])
    return F.aggregate(
        F.zip_with(half_col, lit_arr,
                   lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0), lambda acc, x: acc + x)


def _flit(x) -> str:
    """One double literal as SQL text. ``repr`` round-trips doubles
    exactly, so the parsed literal is bit-identical to ``F.lit(float)``;
    non-finite values are rejected up front (their repr is not a SQL
    literal — the sq8_encode_expr discipline)."""
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite vector component {v!r} cannot be "
                         "rendered as a SQL literal")
    return repr(v) + "D"


def _int_lit(x) -> str:
    """An integer literal rendered with ``F.lit``'s type choice (INT
    when it fits 32 bits, else BIGINT) so SQL-text and Column-API plans
    stay type-identical."""
    v = int(x)
    return str(v) if -2**31 <= v < 2**31 else f"{v}L"


def _flt_arr_sql(vals) -> str:
    """A literal ``array<float>`` as SQL text — double literals cast
    back to float exactly like ``F.array(*F.lit(...)).cast()``, so the
    float→decimal cast sequence downstream stays byte-identical."""
    return ("CAST(array(" + ",".join(_flit(v) for v in vals)
            + ") AS ARRAY<FLOAT>)")


def _pq_subdist_dbl_sql(half_sql: str, lit_vals) -> str:
    """SQL-text twin of :func:`_pq_subdist_dbl` — same parsed tree, one
    py4j call instead of ~40 (the r11 literal lesson)."""
    arr = "array(" + ",".join(_flit(v) for v in lit_vals) + ")"
    return (f"aggregate(zip_with({half_sql}, {arr}, "
            f"(a, b) -> (CAST(a AS DOUBLE) - b) "
            f"* (CAST(a AS DOUBLE) - b)), 0.0D, (acc, x) -> acc + x)")


def _sqdist_dec_lit_sql(vec_sql: str, lit_vals) -> str:
    """SQL-text twin of ``_sqdist_dec(col, literal float array)`` —
    identical cast sequence (literal → float → decimal) and accumulator
    type pinning."""
    return (f"aggregate(zip_with({vec_sql}, {_flt_arr_sql(lit_vals)}, "
            f"(x, y) -> (CAST(x AS {VDEC}) - CAST(y AS {VDEC})) "
            f"* (CAST(x AS {VDEC}) - CAST(y AS {VDEC}))), "
            f"CAST(0 AS {ACC}), (acc, x) -> CAST(acc + x AS {ACC}))")


def _cent_scored_sql(vec_sql: str, rows, id_col: str, vec_col: str) -> str:
    """The literal centroid scoring array as SQL text: one
    ``named_struct('d', <decimal sqdist>, 'cid', <id>)`` per centroid —
    the (d, cid) struct order every argmin/sort in this family relies
    on. Rows are (id, vector) Rows from a ``collect``."""
    return "array(" + ", ".join(
        f"named_struct('d', {_sqdist_dec_lit_sql(vec_sql, r[vec_col])}, "
        f"'cid', {_int_lit(r[id_col])})"
        for r in rows) + ")"


def _id_vec_rows(obj, id_col: str, vec_col: str) -> list:
    """Normalize a centroid/codebook argument to id-sorted driver-side
    rows. A DataFrame is collected (one job); a driver-side list of
    ``(id, vec)`` pairs wraps as dict-rows VERBATIM — callers that
    already hold the frozen codebook on the driver (``pipe.ann_search``)
    skip a createDataFrame → collect round trip, which costs two jobs
    plus their driver gaps per search (measured ~2.5 s cold). Callers
    passing lists own any dtype rounding the DataFrame path would have
    applied (e.g. an ``array<float>`` cast)."""
    if isinstance(obj, DataFrame):
        rows = obj.select(id_col, vec_col).collect()
    else:
        rows = [{id_col: i, vec_col: v} for i, v in obj]
    return sorted(rows, key=lambda r: r[id_col])


def pq_encode(df: DataFrame, codebook_rows: list, subspaces: int = 2,
              subdim: int = 32, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product-quantize every vector: per subspace, the code is the
    argmin squared distance over the literal codebook (first bit-equal
    match = smallest code, the same tie-break as a row_number argmin).
    Shuffle-free projection — the corpus never joins anything."""
    out_cols = [F.col(c) for c in df.columns]
    qcol = "`" + vec_col.replace("`", "``") + "`"
    for m in range(subspaces):
        half_sql = f"slice({qcol}, {m * subdim + 1}, {subdim})"
        dists = F.expr("array(" + ",".join(
            _pq_subdist_dbl_sql(half_sql,
                                r[vec_col][m * subdim:(m + 1) * subdim])
            for r in codebook_rows) + ")")
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("long")
        out_cols.append(code.alias(f"code{m}"))
    return df.select(*out_cols)


def assign_ivf_cells_multi(
    df: DataFrame,
    centroids: "DataFrame | list",
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe coarse assignment: one output row per (vector, probed
    cell), the probe list being the ``nprobe`` nearest centroids
    (exact-decimal distance, centroid-id tie-break — ``array_sort`` on
    (d, cid) structs is the same lexicographic order as
    ``assign_ivf_cells``'s argmin). Still a shuffle-free literal-array
    projection; the row multiplication is nprobe× the QUERY side only."""
    rows = _id_vec_rows(centroids, id_col, vec_col)
    if not rows:
        raise ValueError("assign_ivf_cells_multi: empty centroid set")
    # SQL-text literal scoring (see assign_ivf_cells)
    qcol = "`" + vec_col.replace("`", "``") + "`"
    scored = _cent_scored_sql(qcol, rows, id_col, vec_col)
    return df.withColumn(
        "cell", F.explode(F.expr(
            f"transform(slice(array_sort({scored}), 1, {int(nprobe)}), "
            f"s -> s.cid)")))


def ivfpq_corpus_codes(
    corpus: DataFrame,
    centroids: DataFrame,
    codebook_rows: list,
    subspaces: int = 2,
    subdim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF-PQ INDEX table: (id, cell, code0..codeM) — the
    once-per-corpus artifact every search reuses (in FAISS terms, the
    trained+populated index). Both projections are shuffle-free; callers
    should cache/checkpoint the result so repeated searches never re-pay
    the encode pass."""
    c = assign_ivf_cells(corpus, centroids, id_col, vec_col)
    return pq_encode(c, codebook_rows, subspaces, subdim,
                     id_col, vec_col).select(
        id_col, "cell", *[f"code{m}" for m in range(subspaces)])


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "DataFrame | list",
    codebook: "DataFrame | list",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    subspaces: int = 2,
    subdim: int = 32,
    nprobe: int = 1,
    refine: int = 0,
    corpus_codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search with asymmetric distance computation (the FAISS
    IVFADC layout, Jégou et al. 2011): corpus vectors collapse to one
    coarse cell id + ``subspaces`` PQ codes (a few bytes per vector);
    each query precomputes a lookup table of squared distances from its
    subvectors to every codebook entry; candidate distance is then TWO
    ARRAY LOOKUPS AND AN ADD — no vector arithmetic per pair.
    ``nprobe`` > 1 probes each query's n nearest cells (the standard
    FAISS recall knob; candidate volume grows nprobe× on the query side
    only, the corpus pass is unchanged). ``refine`` > 0 adds the FAISS
    refine stage: the ADC ranking keeps a ``k * refine`` shortlist whose
    TRUE vectors are fetched back (an id equi-join — k·refine rows per
    query, never the cell) and re-ranked by exact decimal L2 — recall is
    then bounded by cell coverage instead of quantization error.

    Scale shape: the corpus side is two shuffle-free projections (cell
    assign + PQ encode) producing a narrow codes table; queries (with
    their LUT arrays) broadcast into a cell equi-join. At 100 TB the
    full-width vectors are read once and never shuffled — the join moves
    only ids, cells, and codes. Recall is measured by
    ``emb_ivfpq_recall``, never asserted.
    """
    cb_rows = _id_vec_rows(codebook, id_col, vec_col)
    if not cb_rows:
        raise ValueError("ivfpq_topk: empty codebook")
    if corpus_codes is None:
        corpus_codes = ivfpq_corpus_codes(corpus, centroids, cb_rows,
                                          subspaces, subdim, id_col, vec_col)
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), "cell",
        *[f"code{m}" for m in range(subspaces)])
    q = assign_ivf_cells_multi(queries, centroids, nprobe, id_col, vec_col)
    qcol = "`" + vec_col.replace("`", "``") + "`"
    lut_cols = []
    for m in range(subspaces):
        half_sql = f"slice({qcol}, {m * subdim + 1}, {subdim})"
        lut = F.expr("array(" + ",".join(
            _pq_subdist_dbl_sql(half_sql,
                                r[vec_col][m * subdim:(m + 1) * subdim])
            for r in cb_rows) + ")")
        lut_cols.append(lut.alias(f"lut{m}"))
    # the rank window must NOT carry the query vector: per-candidate
    # rows × 256-byte vectors through the rank exchange is corpus-scale
    # traffic — the refine stage re-joins the (tiny) query-vector frame
    # onto the shortlist instead
    q = q.select(F.col(id_col).alias("query_id"), "cell", *lut_cols)
    joined = c.join(F.broadcast(q), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    adc = F.lit(0.0)
    for m in range(subspaces):
        adc = adc + F.element_at(F.col(f"lut{m}"),
                                 (F.col(f"code{m}") + 1).cast("int"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id"))
    ranked = (joined.select("query_id", "neighbor_id",
                            *[f"code{m}" for m in range(subspaces)],
                            adc.alias("adc"))
              .withColumn("rnk", F.row_number().over(w)))
    if not refine:
        return (ranked.filter(F.col("rnk") <= k)
                .orderBy("query_id", "rnk"))
    qv_side = queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("_qv"))
    shortlist = (ranked.filter(F.col("rnk") <= k * refine).drop("rnk")
                 .join(F.broadcast(qv_side), on="query_id"))
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_nv"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_sq").asc(), F.col("neighbor_id"))
    # the shortlist is contractually |Q|·k·refine rows (query-sample
    # sized); broadcast it explicitly — its stats come out of a window,
    # so Catalyst can't see that it is the small side of the fetch join
    return (F.broadcast(shortlist).join(nv, on="neighbor_id")
            .withColumn("_sq", _sqdist_dec(F.col("_qv"), F.col("_nv")))
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id",
                    *[f"code{m}" for m in range(subspaces)], "adc", "rnk")
            .orderBy("query_id", "rnk"))


def ivfpq_topk_curve(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "DataFrame | list",
    codebook: "DataFrame | list",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    subspaces: int = 2,
    subdim: int = 32,
    nprobes: tuple = (1, 2, 4),
    refine: int = 0,
    corpus_codes: DataFrame | None = None,
) -> list:
    """Multi-nprobe IVF-PQ search sharing ONE candidate/ADC pass: the
    query side assigns its ``max(nprobes)`` nearest cells once with the
    probe RANK attached (``posexplode`` over the same sorted probe list
    ``assign_ivf_cells_multi`` slices), the cell join + ADC lookup runs
    once over that widest candidate set, and the (tiny, |Q|·nprobe·cell
    rows) scored frame is pinned; each curve point then just filters
    ``probe rank <= n`` and re-ranks. Because the nprobe=n candidate set
    IS the rank-filtered max-nprobe set, every returned frame is
    row-identical to ``ivfpq_topk(..., nprobe=n)`` — pinned by
    ``test_ivfpq_topk_curve_matches_single``. Returns ``[(n, DataFrame)]``
    in ``nprobes`` order; column layout matches ``ivfpq_topk``."""
    if not nprobes:
        raise ValueError("ivfpq_topk_curve: empty nprobes")
    cb_rows = _id_vec_rows(codebook, id_col, vec_col)
    if not cb_rows:
        raise ValueError("ivfpq_topk_curve: empty codebook")
    if corpus_codes is None:
        corpus_codes = ivfpq_corpus_codes(corpus, centroids, cb_rows,
                                          subspaces, subdim, id_col, vec_col)
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), "cell",
        *[f"code{m}" for m in range(subspaces)])
    # multi-probe assignment with the probe rank kept (same sorted
    # (d, cid) struct order as assign_ivf_cells_multi); literal
    # centroid/codebook expressions as SQL text like the single-point
    # search
    cent_rows = _id_vec_rows(centroids, id_col, vec_col)
    if not cent_rows:
        raise ValueError("ivfpq_topk_curve: empty centroid set")
    qcol = "`" + vec_col.replace("`", "``") + "`"
    scored = _cent_scored_sql(qcol, cent_rows, id_col, vec_col)
    q = queries.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(F.expr(
            f"transform(slice(array_sort({scored}), 1, "
            f"{int(max(nprobes))}), s -> s.cid)"))
        .alias("_probe_pos", "cell"))
    lut_cols = []
    for m in range(subspaces):
        half_sql = f"slice({qcol}, {m * subdim + 1}, {subdim})"
        lut = F.expr("array(" + ",".join(
            _pq_subdist_dbl_sql(half_sql,
                                r[vec_col][m * subdim:(m + 1) * subdim])
            for r in cb_rows) + ")")
        lut_cols.append(lut.alias(f"lut{m}"))
    q = q.select(F.col(id_col).alias("query_id"), "_probe_pos", "cell",
                 *lut_cols)
    joined = c.join(F.broadcast(q), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    adc = F.lit(0.0)
    for m in range(subspaces):
        adc = adc + F.element_at(F.col(f"lut{m}"),
                                 (F.col(f"code{m}") + 1).cast("int"))
    cand = _pin(joined.select(
        "query_id", "neighbor_id", "_probe_pos",
        *[f"code{m}" for m in range(subspaces)], adc.alias("adc")))
    qv_side = queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("_qv"))
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_nv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_sq").asc(), F.col("neighbor_id"))
    out = []
    for n in nprobes:
        ranked = (cand.filter(F.col("_probe_pos") < n).drop("_probe_pos")
                  .withColumn("rnk", F.row_number().over(w)))
        if not refine:
            out.append((n, ranked.filter(F.col("rnk") <= k)
                        .orderBy("query_id", "rnk")))
            continue
        shortlist = (ranked.filter(F.col("rnk") <= k * refine).drop("rnk")
                     .join(F.broadcast(qv_side), on="query_id"))
        out.append((n, F.broadcast(shortlist).join(nv, on="neighbor_id")
                    .withColumn("_sq", _sqdist_dec(F.col("_qv"),
                                                   F.col("_nv")))
                    .withColumn("rnk", F.row_number().over(wr))
                    .filter(F.col("rnk") <= k)
                    .select("query_id", "neighbor_id",
                            *[f"code{m}" for m in range(subspaces)],
                            "adc", "rnk")
                    .orderBy("query_id", "rnk")))
    return out


def ivfpq_residual_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    centroids: list,
    res_codebook: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    subspaces: int = 2,
    subdim: int = 32,
    nprobe: int = 1,
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """ADC search over RESIDUAL PQ codes (the faithful FAISS IVFADC:
    corpus codes quantize r = v − centroid[cell] against a residual
    codebook — Jégou et al. 2011 §III). Per (query, probed cell) the
    query's own residual is computed against that cell's centroid and
    the LUT holds its squared distances to every residual-codebook
    entry; candidate distance is then ``subspaces`` lookups and adds,
    exactly the ``ivfpq_topk`` shape. ``centroids``/``res_codebook``
    are driver-side (id, vec) lists (the frozen-doc artifacts); all
    literal tables ride as ONE parsed SQL string per projection (the
    measured py4j-literal lesson — thousands of ``F.lit`` calls cost
    seconds of pure driver time). Distances fold in IEEE doubles in
    element order, matching the maintained encode bit-for-bit."""
    ids = [int(i) for i, _ in centroids]
    cvs = [[float(x) for x in v] for _i, v in centroids]
    rvs = [[float(x) for x in v] for v in res_codebook]
    if not cvs or not rvs:
        raise ValueError("ivfpq_residual_topk: empty centroid or "
                         "residual-codebook set")

    def flit(x: float) -> str:
        return repr(float(x)) + "D"

    qcol = "`" + vec_col.replace("`", "``") + "`"

    def sqdist_dbl(vec_sql: str, lit_vals: list) -> str:
        arr = "array(" + ",".join(flit(x) for x in lit_vals) + ")"
        return (f"aggregate(zip_with({vec_sql}, {arr}, "
                f"(x, y) -> (CAST(x AS DOUBLE) - y) "
                f"* (CAST(x AS DOUBLE) - y)), 0.0D, "
                f"(acc, x) -> acc + x)")

    scored = ",".join(
        f"named_struct('d', {sqdist_dbl(qcol, cv)}, "
        f"'cid', CAST({cid} AS BIGINT))"
        for cid, cv in zip(ids, cvs))
    q1 = queries.selectExpr(
        f"{id_col} AS query_id", f"{qcol} AS _qv",
        f"explode(slice(array_sort(array({scored})), 1, {nprobe})) "
        f"AS _p")
    id_arr = "array(" + ",".join(
        f"CAST({i} AS BIGINT)" for i in ids) + ")"
    rs_exprs = []
    for m in range(subspaces):
        off = m * subdim
        cent_m = "array(" + ",".join(
            "array(" + ",".join(flit(x) for x in cv[off:off + subdim])
            + ")" for cv in cvs) + ")"
        rs_exprs.append(
            f"zip_with(slice(_qv, {off + 1}, {subdim}), "
            f"element_at({cent_m}, "
            f"CAST(array_position({id_arr}, _p.cid) AS INT)), "
            f"(x, c) -> CAST(x AS DOUBLE) - c) AS _rs{m}")
    q2 = q1.selectExpr("query_id", "_qv", "_p.cid AS cell", *rs_exprs)
    lut_exprs = []
    for m in range(subspaces):
        off = m * subdim
        dists = []
        for rv in rvs:
            arr = "array(" + ",".join(
                flit(x) for x in rv[off:off + subdim]) + ")"
            dists.append(
                f"aggregate(zip_with(_rs{m}, {arr}, "
                f"(x, y) -> (x - y) * (x - y)), 0.0D, "
                f"(acc, x) -> acc + x)")
        lut_exprs.append("array(" + ",".join(dists) + f") AS lut{m}")
    q3 = q2.selectExpr("query_id", "cell", *lut_exprs)
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"), "cell",
        *[f"code{m}" for m in range(subspaces)])
    joined = c.join(F.broadcast(q3), on="cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    adc = F.lit(0.0)
    for m in range(subspaces):
        adc = adc + F.element_at(F.col(f"lut{m}"),
                                 (F.col(f"code{m}") + 1).cast("int"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id"))
    ranked = (joined.select("query_id", "neighbor_id", adc.alias("adc"))
              .withColumn("rnk", F.row_number().over(w)))
    if not refine:
        # keep adc in the output like ivfpq_topk does — it is the same
        # IEEE fold on both engines, so it hashes stably under the gate
        return (ranked.filter(F.col("rnk") <= k)
                .select("query_id", "neighbor_id", "adc", "rnk")
                .orderBy("query_id", "rnk"))
    if corpus is None:
        raise ValueError("ivfpq_residual_topk: refine > 0 needs the "
                         "corpus frame to fetch exact vectors from")
    qv_side = queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("_qv"))
    shortlist = (ranked.filter(F.col("rnk") <= k * refine).drop("rnk")
                 .join(F.broadcast(qv_side), on="query_id"))
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_nv"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_sq").asc(), F.col("neighbor_id"))
    return (F.broadcast(shortlist).join(nv, on="neighbor_id")
            .withColumn("_sq", _sqdist_dec(F.col("_qv"), F.col("_nv")))
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= k)
            # keep the survivor's ADC value, mirroring ivfpq_topk's
            # refine output — the three codecs' search surfaces stay
            # symmetric for a future refine-mode gate
            .select("query_id", "neighbor_id", "adc", "rnk")
            .orderBy("query_id", "rnk"))


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force squared-L2 top-k (the ground truth for the
    IVF-PQ recall measurement). Distances accumulate in DECIMAL — exact
    and partitioning-insensitive — and the ranking compares the decimals
    directly, so the order is bit-identical across engines."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sqdist").asc(), F.col("neighbor_id"))
    return (joined
            .select("query_id", "neighbor_id",
                    _sqdist_dec(F.col("qv"), F.col("cv")).alias("sqdist"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id")
            .orderBy("query_id", "neighbor_id"))


def _q_micro(v: float) -> int:
    """Driver-side twin of the µ-quantization expression (float64 ops
    in the same order as the SQL/Column form, so literals match)."""
    import math
    return int(math.floor(float(v) * 1_000_000 + 0.5))


def _int_sqdist_lit(xq_col, lit_vals: list) -> F.Column:
    """Exact BIGINT squared distance between a µ-quantized slice column
    and a literal µ-quantized codebook slice (pure integer arithmetic —
    bit-identical on any engine, any partitioning)."""
    lit_arr = F.array(*[F.lit(int(v)) for v in lit_vals])
    return F.aggregate(
        F.zip_with(xq_col, lit_arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _int_arr_sql(vals: list) -> str:
    """A literal BIGINT array as SQL text (the r11 py4j-literal lesson:
    one parsed string instead of len(vals) F.lit round trips)."""
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _int_sqdist_sql(xq_sql: str, lit_vals: list) -> str:
    """SQL-text twin of :func:`_int_sqdist_lit`: same
    ``aggregate(zip_with(...))`` shape, built in ONE py4j call instead
    of ~40. The literal array is rendered as BIGINT (``L`` suffix)
    while ``F.lit(int)`` yields 32-bit ints for small values, so the
    trees differ in literal width — VALUES are still identical because
    the µ-quantized subtraction/products are exact in 64-bit for any
    input either form accepts (widening int→bigint coercion is
    value-preserving; ADVICE r13 wording fix)."""
    return (f"aggregate(zip_with({xq_sql}, {_int_arr_sql(lit_vals)}, "
            f"(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
            f"(acc, x) -> acc + x)")


def _int_argmin_sql(xq_sql: str, entries: list, tags: list,
                    tag_name: str) -> str:
    """``array_min`` over ``named_struct('d', sqdist, tag_name, tag)``
    as one SQL string — the struct-argmin idiom (single evaluation,
    (d, tag) lexicographic tie-break) with literal codebook entries.
    ``tags`` are int literals (rendered as 32-bit ints, matching
    ``F.lit(small int)``'s IntegerType)."""
    parts = ", ".join(
        f"named_struct('d', {_int_sqdist_sql(xq_sql, c)}, "
        f"'{tag_name}', {int(t)})"
        for t, c in zip(tags, entries))
    return f"array_min(array({parts}))"


def residual_pq_gain(
    df: DataFrame,
    centroid_rows: list,
    codebook_rows: list,
    subspaces: int = 2,
    subdim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """RESIDUAL product quantization — the actual FAISS IVFADC encoding
    (Jégou et al. 2011 §III: PQ codes the residual v − centroid[cell],
    not the raw vector, because residuals carry far less energy) — with
    the gain MEASURED: per subspace, quantization SSE of PQ over raw
    vectors vs PQ over IVF-cell residuals, both against codebooks built
    from the same seeded rows (raw slices vs those rows' own residual
    slices). Entirely µ-quantized 64-bit integer arithmetic: cell
    assignment is an integer argmin over ≤8 literal centroids, the
    residual is one ``zip_with`` subtract against the literal centroid
    picked by cell, and both PQ assignments are literal-codebook argmins
    — every pass shuffle-free, magnitudes ≤ ~4e17 (inside int64).

    Scale shape: two map-only projections over a narrow quantized
    frame + one final hash agg; centroids and codebooks travel as a few
    hundred driver-side integers, exactly the ``ivfpq_topk`` contract."""
    cents = sorted(centroid_rows, key=lambda r: r[id_col])
    cvs = [[_q_micro(v) for v in r[vec_col]] for r in cents]
    dim = len(cvs[0])
    xq_full = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5))
        .cast("long"))
    base = df.select(F.col(id_col).alias("_vid"), xq_full.alias("_xq"))
    # argmin by POSITION so the chosen centroid literal can be fetched
    # with element_at; the reported tie-break order is (dist, cid),
    # which equals (dist, pos) since cents are id-sorted. All literal
    # expressions build as SQL text (one parse each) — the Column-API
    # form cost ~3k F.lit py4j round trips ≈ 4.5 s of pure driver time
    # per plan build at 8 cents × 16 codes × 64 dims (measured r13).
    pick = F.expr(_int_argmin_sql("_xq", cvs, range(len(cvs)), "pos"))
    cent_lits = F.expr(
        "array(" + ",".join(_int_arr_sql(cv) for cv in cvs) + ")")
    chosen = F.element_at(cent_lits, (F.col("_p.pos") + 1).cast("int"))
    enc = (base.withColumn("_p", pick)
           .withColumn("_rq", F.zip_with(F.col("_xq"), chosen,
                                         lambda a, b: a - b))
           .select("_vid", "_xq", "_rq")
           .transform(_pin))

    # python twin of the same integer assignment for the codebook rows
    def _assign(xv: list) -> int:
        return min(range(len(cvs)),
                   key=lambda p: (sum((a - b) ** 2
                                      for a, b in zip(xv, cvs[p])), p))

    cb = sorted(codebook_rows, key=lambda r: r[id_col])
    outs = []
    for m in range(subspaces):
        lo, hi = m * subdim, (m + 1) * subdim
        raw_codes, res_codes = [], []
        for r in cb:
            xv = [_q_micro(v) for v in r[vec_col]]
            cv = cvs[_assign(xv)]
            raw_codes.append(xv[lo:hi])
            res_codes.append([a - b for a, b in zip(xv, cv)][lo:hi])
        xs_sql = f"slice(_xq, {lo + 1}, {subdim})"
        rs_sql = f"slice(_rq, {lo + 1}, {subdim})"
        d_raw = F.expr("array_min(array(" + ", ".join(
            _int_sqdist_sql(xs_sql, c) for c in raw_codes) + "))")
        d_res = F.expr("array_min(array(" + ", ".join(
            _int_sqdist_sql(rs_sql, c) for c in res_codes) + "))")
        outs.append(
            enc.select(d_raw.alias("_dw"), d_res.alias("_dr"))
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum("_dw").alias("sse_raw_pq"),
                 F.sum("_dr").alias("sse_residual_pq"))
            .select(F.lit(m).cast("int").alias("subspace"), "n_vecs",
                    "sse_raw_pq", "sse_residual_pq"))
    if dim < subspaces * subdim:
        raise ValueError("residual_pq_gain: vectors shorter than "
                         f"{subspaces}x{subdim}")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("subspace")


def pq_train_gain(
    df: DataFrame,
    codebook_rows: list,
    subspaces: int = 2,
    subdim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """One exact-integer Lloyd iteration per PQ subspace, measuring the
    quantization-SSE gain of TRAINED codebooks over the seeded rows —
    the k-means training step FAISS runs before populating an IVFADC
    index, with the outcome measured, not assumed.

    Per subspace: µ-quantize the vector slices to BIGINT, assign each
    to its nearest seeded codebook slice (integer sqdist, code-id tie
    break), take per-code FLOOR-division means (exact integers — the
    subtract-nonneg-remainder spell, since components go negative),
    REASSIGN against the trained centroids, and emit seeded vs trained
    SSE plus cell usage. Everything is 64-bit integer arithmetic: the
    gate hash is exact by construction, and SSE magnitudes stay far
    inside int64 (|x| ≤ 0.6 → diffs ≤ 1.2e6 scaled, 32 dims, corpus
    sums ≤ ~1e17).

    Scale shape: two shuffle-free literal-codebook assignment passes
    over a narrow quantized projection + one (cell, pos)-keyed hash agg
    per subspace; the trained means come back to the driver as k×subdim
    integers (≤ 512 values — metadata-sized, the same contract as the
    codebook collect in ``ivfpq_topk``), so the reassignment pass is
    again literal-based with no join. At 100 TB, training normally runs
    on a sample; this operator IS that sampled pass."""
    rows = sorted(codebook_rows, key=lambda r: r[id_col])
    outs = []
    for m in range(subspaces):
        half = F.slice(F.col(vec_col), m * subdim + 1, subdim)
        xq = F.transform(
            half,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
            .cast("long"))
        base = df.select(F.col(id_col).alias("_vid"), xq.alias("_xq"))
        codes = [(int(r[id_col]),
                  [_q_micro(v)
                   for v in r[vec_col][m * subdim:(m + 1) * subdim]])
                 for r in rows]
        seed_pick = F.expr(_int_argmin_sql(
            "_xq", [c for _ci, c in codes], [ci for ci, _c in codes],
            "cid"))
        assigned = (base
                    .withColumn("_a", seed_pick)
                    .select("_vid", "_xq",
                            F.col("_a.cid").alias("cell"),
                            F.col("_a.d").alias("d0"))
                    .transform(_pin))
        sums = (assigned
                .select("cell", F.posexplode("_xq").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("nn"))
                .collect())
        means: dict = {}
        for r in sums:
            # python // floors for both signs — the exact floor-division
            # semantics the oracle spells subtract-remainder-then-divide
            means.setdefault(r["cell"], [0] * subdim)[r["pos"]] = (
                int(r["s"]) // int(r["nn"]))
        trained = [means[c] for c in sorted(means)]
        cids = sorted(means)
        train_pick = F.expr(_int_argmin_sql("_xq", trained, cids, "cid"))
        out = (assigned
               .withColumn("_t", train_pick)
               .agg(F.count(F.lit(1)).alias("n_vecs"),
                    F.sum("d0").alias("sse_seeded"),
                    F.sum(F.col("_t.d")).alias("sse_trained"),
                    F.countDistinct("cell").alias("n_cells_seeded"),
                    F.countDistinct(F.col("_t.cid"))
                    .alias("n_cells_trained"))
               .select(F.lit(m).cast("int").alias("subspace"),
                       "n_vecs", "sse_seeded", "sse_trained",
                       "n_cells_seeded", "n_cells_trained"))
        outs.append(out)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("subspace")


def sq8_stats(corpus: DataFrame, vec_col: str = "embedding") -> list:
    """Per-dimension (min, max) over the corpus as driver-side doubles
    — the SQ8 training pass (FAISS ``ScalarQuantizer`` QT_8bit): one
    posexplode + hash agg, dim rows back to the driver (metadata-sized,
    the codebook-collect contract)."""
    rows = (corpus
            .select(F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min(F.col("x").cast("double")).alias("mn"),
                 F.max(F.col("x").cast("double")).alias("mx"))
            .collect())
    stats = sorted((int(r["pos"]), float(r["mn"]), float(r["mx"]))
                   for r in rows)
    return [(mn, mx) for _p, mn, mx in stats]


def sq8_encode_expr(stats: list, vec_col: str = "embedding",
                    clamp: bool = False) -> str:
    """The SQ8 affine-encode expression as ONE parsed SQL string (the
    py4j-literal lesson): ``floor((x − mn) · 255 / (mx − mn) + 0.5)``
    in IEEE doubles against literal per-dimension stats arrays; a
    constant dimension encodes 0. ``clamp=True`` pins codes to
    [0, 255] (what FAISS does for values outside the trained range —
    required when stats are FROZEN and later syncs may exceed them).
    Shared by :func:`sq8_codes` and the maintained-index encode."""
    if not stats:
        raise ValueError(
            "sq8_codes: empty stats — train with sq8_stats on a "
            "non-empty corpus first (an empty literal array would "
            "fail later with an opaque SQL parse error)")
    for pos, (mn, mx) in enumerate(stats):
        if not (math.isfinite(mn) and math.isfinite(mx)):
            raise ValueError(
                f"sq8_codes: non-finite stat at dimension {pos}: "
                f"(min={mn!r}, max={mx!r}) — the corpus holds inf/nan "
                "in that dimension; clean it before quantizing "
                "(repr() of a non-finite double is not a SQL literal)")
    q = "`" + vec_col.replace("`", "``") + "`"
    mnl = "array(" + ",".join(repr(mn) + "D" for mn, _mx in stats) + ")"
    sl = "array(" + ",".join(repr(mx - mn) + "D"
                             for mn, mx in stats) + ")"
    inner = (f"zip_with(transform({q}, x -> CAST(x AS DOUBLE)), {mnl}, "
             f"(x, m) -> x - m)")
    code = "floor(d * 255.0D / s + 0.5D)"
    if clamp:
        code = f"greatest(0.0D, least(255.0D, {code}))"
    return (f"zip_with({inner}, {sl}, (d, s) -> "
            f"CAST(CASE WHEN s = 0.0D THEN 0.0D "
            f"ELSE {code} END AS BIGINT))")


def sq8_codes(corpus: DataFrame, stats: list, id_col: str = "vec_id",
              vec_col: str = "embedding",
              clamp: bool = False) -> DataFrame:
    """Scalar-quantize each vector to one uint8-range BIGINT per
    dimension (FAISS ``ScalarQuantizer`` QT_8bit; expression in
    :func:`sq8_encode_expr`). Shuffle-free projection — O(rows), the
    same plan contract as the PQ encode."""
    expr = sq8_encode_expr(stats, vec_col, clamp=clamp)
    return corpus.selectExpr(f"{id_col}", f"{expr} AS sq8")


def ivfsq8_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    centroids: "DataFrame | list",
    stats: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 1,
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """IVF-SQ8 search (the FAISS ``IVF,SQ8`` index shape): corpus
    vectors live as one coarse cell id + a per-dimension uint8 code
    array (``corpus_codes``: id, cell, sq8 — 4× compression at full
    dimensionality, vs PQ's 32× at subspace granularity; the measured
    recall ladder in SCALE-era notes reads SQ8 0.72 vs IVF-PQ 0.20 at
    sf0.01, so this is the maintained index's QUALITY codec). Queries
    probe their ``nprobe`` nearest cells, quantize with the SAME frozen
    stats (symmetric SQ distance — asymmetric buys nothing for scalar
    quantizers), and rank candidates by exact integer squared-L2 over
    the codes (≤ 255²·dim per pair, far inside int64; BIGINT fold, id
    tie-break). ``refine`` > 0 re-ranks a ``k·refine`` shortlist by
    exact decimal L2 over the true vectors (requires ``corpus``).

    Scale shape: identical to ``ivfpq_topk`` — the codes table is
    narrow, queries broadcast into a cell equi-join, full-width vectors
    move only for the (query-sample-sized) refine fetch."""
    c = corpus_codes.select(F.col(id_col).alias("neighbor_id"),
                            "cell", F.col("sq8").alias("cc"))
    q = assign_ivf_cells_multi(queries, centroids, nprobe,
                               id_col, vec_col)
    qexpr = sq8_encode_expr(stats, vec_col, clamp=True)
    q = q.selectExpr(f"{id_col} AS query_id", "cell",
                     f"{qexpr} AS qc")
    joined = (c.join(F.broadcast(q), on="cell")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("_d", F.expr(
                  "aggregate(zip_with(qc, cc, (a, b) -> (a - b) * (a - b)), "
                  "0L, (acc, x) -> acc + x)")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc())
    ranked = (joined.select("query_id", "neighbor_id", "_d")
              .withColumn("rnk", F.row_number().over(w)))
    if not refine:
        # expose the exact integer code distance (the ranking key) the
        # way ivfpq_topk exposes adc — it is BIGINT-exact, so callers
        # (and the catalog gate) can hash it
        return (ranked.filter(F.col("rnk") <= k)
                .select("query_id", "neighbor_id",
                        F.col("_d").alias("code_dist"), "rnk")
                .orderBy("query_id", "rnk"))
    if corpus is None:
        raise ValueError("ivfsq8_topk: refine > 0 needs the corpus "
                         "frame to fetch exact vectors from")
    qv_side = queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("_qv"))
    shortlist = (ranked.filter(F.col("rnk") <= k * refine).drop("rnk")
                 .join(F.broadcast(qv_side), on="query_id"))
    nv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("_nv"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("_sq").asc(), F.col("neighbor_id"))
    # |Q|·k·refine rows by contract — broadcast explicitly (window
    # output has no stats Catalyst could size the join by)
    return (F.broadcast(shortlist).join(nv, on="neighbor_id")
            .withColumn("_sq", _sqdist_dec(F.col("_qv"), F.col("_nv")))
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= k)
            # keep the ADC-stage integer key the survivor rode in on,
            # mirroring ivfpq_topk's refine output (codes + adc)
            .select("query_id", "neighbor_id",
                    F.col("_d").alias("code_dist"), "rnk")
            .orderBy("query_id", "rnk"))


def sq8_topk(codes: DataFrame, query_codes: DataFrame,
             id_col: str = "vec_id", k: int = 5) -> DataFrame:
    """Top-k neighbors by exact integer squared-L2 over SQ8 codes
    (asymmetric search is pointless for SQ — both sides quantize): the
    query side broadcasts (a handful of code rows), distances are
    BIGINT folds (≤ 255²·dim, far inside int64), ties break on
    neighbor id. Returns (query_id, neighbor_id, rnk)."""
    qd = F.broadcast(query_codes.select(
        F.col(id_col).alias("query_id"), F.col("sq8").alias("qc")))
    cd = codes.select(F.col(id_col).alias("neighbor_id"),
                      F.col("sq8").alias("cc"))
    pairs = (cd.join(qd, F.col("neighbor_id") != F.col("query_id"))
             .withColumn("_d", F.expr(
                 "aggregate(zip_with(qc, cc, (a, b) -> (a - b) * (a - b)), "
                 "0L, (acc, x) -> acc + x)")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk"))
