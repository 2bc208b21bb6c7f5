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
