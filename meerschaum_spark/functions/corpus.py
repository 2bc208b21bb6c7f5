"""Composite corpus preparation: the end-to-end "clean a pretraining
corpus" pass — quality gates + language filter + exact dedup + fingerprint
— as ONE Spark plan.

The operators exist individually (``functions/text.py``,
``functions/dedup.py``); this composes their *expressions* into a single
projection so the whole pass costs one scan plus one shuffle (the
content-hash window for canonical-doc selection). Running the operators
separately and joining their outputs would re-scan the corpus per metric
and add a join shuffle each — the difference between one pass over 100 TB
and five.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meerschaum_spark.catalog import hash60
from meerschaum_spark.functions.persist import pin as _pin
from meerschaum_spark.functions.text import (
    lang_columns,
    norm_text,
    quality_columns,
)


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Filter a document table down to the training-ready subset: each
    surviving row is the canonical (lowest-id) copy of its exact content,
    passes the C4/Gopher-style quality gates, and is in ``keep_langs``.

    Output: ``id_col``, any ``carry_cols``, ``n_tokens``, ``punct_ratio``,
    ``stopword_ratio``, ``pred_lang``, ``fingerprint``, ``n_copies`` (how
    many exact duplicates the canonical row represents — the count needed
    for dedup-aware sampling weights).
    """
    text = F.col(text_col)
    q = quality_columns(text)
    lang = lang_columns(text)
    scored = df.select(
        F.col(id_col),
        *[F.col(c) for c in (carry_cols or [])],
        F.md5(text).alias("_text_hash"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["quality_pass"].alias("quality_pass"),
        lang["pred_lang"].alias("pred_lang"),
        hash60(norm_text(text)).alias("fingerprint"),
    )
    # one shuffle: canonical copy + duplicate count from the same window
    w = Window.partitionBy("_text_hash").orderBy(F.col(id_col).asc())
    wc = Window.partitionBy("_text_hash")
    return (
        scored
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(wc))
        .filter((F.col("_rn") == 1)
                & F.col("quality_pass")
                & F.col("pred_lang").isin(*keep_langs))
        .drop("_rn", "_text_hash", "quality_pass")
    )


def _range_bucket_expr(order_col: str, cuts: list):
    """Map a value to its range bucket = the count of quantile cuts
    strictly below it, as ONE FLAT multi-branch CaseWhen.

    The previous form nested ``when(col > c, i+1).otherwise(prev)`` 127
    levels deep; Catalyst's Operator Optimization batch re-walked that
    tree until its 100-iteration cap (the bench's "Max iterations"
    warning — seconds of pure analysis time per query). A flat
    ``when().when()...otherwise()`` chain is a single CaseWhen node the
    optimizer passes once. Semantics are identical: a value in
    ``(cuts[i-1], cuts[i]]`` lands in bucket ``i``, above every cut in
    bucket ``len(cuts)``."""
    if not cuts:
        return F.lit(0)
    w = F.when(F.col(order_col) <= F.lit(cuts[0]), 0)
    for i, c in enumerate(cuts[1:], start=1):
        w = w.when(F.col(order_col) <= F.lit(c), i)
    return w.otherwise(len(cuts))


def select_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep the prefix of ``df`` (in ``order_col`` order) whose cumulative
    ``token_col`` stays within ``budget`` — packing a training mix to a
    token budget.

    Scale design: the naive form is a GLOBAL running-sum window (single
    task over the whole corpus — the autoincrement anti-pattern). Instead:
    range-bucket on ``order_col`` (~128 buckets via approx quantiles), sum
    tokens per bucket (one small aggregate), find the threshold bucket on
    the driver from ~128 rows, take every earlier bucket whole, and run
    the exact running sum ONLY inside the threshold bucket. Work is one
    pass plus a window over corpus/128 rows."""
    # The algorithm takes three passes over ``df`` (quantile probe,
    # bucket sums, final filter). The input is usually a narrow derived
    # projection whose lineage is expensive (tokenization at ~regex cost
    # per doc) — materialize it once so the passes scan stored rows, not
    # lineage.
    df = df.transform(_pin)
    n_buckets = 128
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(order_col, probs, 0.001)
    # dedupe boundaries (skewed keys can repeat a quantile)
    uniq: list = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    tagged = df.withColumn("_bkt", _range_bucket_expr(order_col, uniq))
    sums = {r["_bkt"]: r["_tok"] for r in
            tagged.groupBy("_bkt").agg(F.sum(token_col).alias("_tok"))
            .collect()}
    cum, full_buckets, threshold_bkt, offset = 0, [], None, 0
    for b in sorted(sums):
        if cum + sums[b] <= budget:
            cum += sums[b]
            full_buckets.append(b)
        else:
            threshold_bkt, offset = b, cum
            break
    keep = tagged.filter(F.col("_bkt").isin(full_buckets)) \
        if full_buckets else tagged.limit(0)
    if threshold_bkt is not None:
        w = Window.partitionBy("_bkt").orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, 0)
        edge = (tagged.filter(F.col("_bkt") == threshold_bkt)
                .withColumn("_cum", F.sum(token_col).over(w))
                .filter(F.col("_cum") + F.lit(offset) <= budget)
                .drop("_cum"))
        keep = keep.unionByName(edge)
    return keep.drop("_bkt")


def shard_assign(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5-based
    ``hash60(id) mod n_shards``. Hash sharding (vs range) keeps shard
    sizes balanced regardless of id clustering; the assignment is a
    narrow projection, so writing a 100 TB corpus as N shard files is
    scan → assign → partitioned write with exactly one shuffle (the
    write's repartition on shard)."""
    from meerschaum_spark.catalog import hash60
    return df.withColumn(
        "shard",
        F.pmod(hash60(F.col(id_col).cast("string")), F.lit(n_shards)))


#: 2^60 — the hash60 value range, as the A-ES uniform-draw denominator
_H60_RANGE = float(1 << 60)


def weighted_sample(
    df: DataFrame,
    weight_col,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of exactly
    ``k`` rows — Efraimidis–Spirakis A-ES: each row draws a uniform
    ``u`` and ranks by ``u^(1/w)``; the top-k by that key is a weighted
    k-sample. Equivalent (and numerically safer) ordering: ascending
    ``-ln(u) / w``.

    The uniform draw is ``(hash60(id) + 1) / 2^60`` — reproducible
    across runs AND engines (the catalog oracle replays the identical
    md5 arithmetic in DuckDB), no RNG state to coordinate across 1000
    executors. Key collisions need two draws within ~1 ulp (P ≈ n²·2⁻⁵²);
    the id tiebreak pins the order regardless.

    Scale shape: ``orderBy(key).limit(k)`` plans as TakeOrdered — a
    per-partition k-heap plus a k·partitions driver merge, NEVER a full
    sort/shuffle of the corpus. Weighting by token count makes this the
    standard "sample a token-budget slice proportional to document
    length" selection step of a pretraining pipeline."""
    from meerschaum_spark.catalog import hash60
    w = F.greatest(weight_col.cast("double"), F.lit(1.0))
    u = ((hash60(F.col(id_col).cast("string")) + F.lit(1)).cast("double")
         / F.lit(_H60_RANGE))
    key = -F.log(u) / w
    return (df.withColumn("_es_key", key)
              .orderBy(F.col("_es_key").asc(), F.col(id_col).asc())
              .limit(k)
              .drop("_es_key"))


def with_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "cumsum",
    n_buckets: int = 128,
) -> DataFrame:
    """Distributed prefix sum: adds ``out_col`` = inclusive running sum of
    ``value_col`` in ``order_col`` order — WITHOUT the global
    single-partition window (`sum() OVER (ORDER BY ...)` collapses to one
    task at any scale).

    Two-phase: range-bucket on ``order_col`` (approx quantiles), sum each
    bucket (one small aggregate), convert to exclusive per-bucket offsets
    on the driver (~``n_buckets`` rows), then a window ONLY inside each
    bucket plus the broadcast offset. Work is one pass + a window over
    corpus/n_buckets rows per task — the building block for sequence
    packing, token budgeting, and deterministic offset assignment."""
    df = df.transform(_pin)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(order_col, probs, 0.001)
    uniq: list = []
    for c in cuts:
        if not uniq or c > uniq[-1]:
            uniq.append(c)
    tagged = df.withColumn("_bkt", _range_bucket_expr(order_col, uniq))
    sums = {r["_bkt"]: r["_s"] for r in
            tagged.groupBy("_bkt").agg(F.sum(value_col).alias("_s"))
            .collect()}
    offsets, acc = {}, 0
    for b in range(len(uniq) + 1):
        offsets[b] = acc
        acc += sums.get(b, 0) or 0
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("_bkt"))
    w = Window.partitionBy("_bkt").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0)
    return (tagged
            .withColumn(out_col, F.sum(value_col).over(w) + offset_expr)
            .drop("_bkt"))


def sequence_pack(
    df: DataFrame,
    capacity: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Contiguous sequence packing: assign each document (in ``order_col``
    order) to the fixed token-capacity bin its running-sum START position
    falls into — ``pack_id = floor(exclusive_cumsum / capacity)``.

    This is the streaming approximation of first-fit packing: bins are
    contiguous runs, a document straddling a boundary stays with the bin
    its start belongs to (bins may overshoot by one document's tail),
    and the whole assignment is the distributed prefix sum — no global
    window, no driver-side loop over documents."""
    out = with_running_sum(df, token_col, order_col, out_col="_cum")
    return (out.withColumn(
        "pack_id",
        F.floor((F.col("_cum") - F.col(token_col)) / F.lit(capacity))
        .cast("long"))
        .drop("_cum"))
