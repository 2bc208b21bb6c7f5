"""Text-analysis operators: tokenization, stats, quality scoring,
language-ID heuristic, fingerprinting.

Everything stays in built-in ``pyspark.sql.functions`` (whole-stage
codegen; no Python in the hot path). Tokenization = lowercase, trim,
split on whitespace runs — chosen because it is expressible identically
in ANSI SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meerschaum_spark.catalog import hash60
from meerschaum_spark.functions.persist import pin as _pin

#: small stopword sets for the language-ID heuristic (deterministic,
#: priority-ordered argmax: en > de > es > fr)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "un"],
}

QUALITY_STOPWORDS = STOPWORDS["en"]
PUNCT_CLASS = r"[.,!?;:]"


def tokens(col: Column) -> Column:
    """lower → trim → split on whitespace runs."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def norm_text(col: Column) -> Column:
    """Whitespace-collapsed lowercase text (fingerprint normalization)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


#: BPE-ish pre-tokenizer classes (letter runs / digit runs / single
#: punctuation) — the GPT-2-style split shape, restricted to a regex
#: subset identical under Java regex and RE2 for the oracle
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """Subword-style token count: letter runs + digit runs + punctuation
    marks, the usual pre-tokenization for BPE vocabularies."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    toks = tokens(F.col(text_col))
    tok_lens = F.transform(toks, lambda t: F.length(t))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        (F.aggregate(tok_lens, F.lit(0).cast("long"), lambda acc, x: acc + x)
         .cast("double") / F.size(toks)).alias("avg_token_len"),
    )


def quality_columns(text) -> dict[str, F.Column]:
    """The quality-gate expressions as named Columns, composable into a
    wider single-pass projection (see ``functions/corpus.py``)."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    sw = F.array([F.lit(w) for w in QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_toks = F.size(toks)
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_toks
    return {
        "n_tokens": n_toks,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_pass": ((n_toks >= 10) & (n_toks <= 10000)
                         & (stop_ratio >= 0.01)),
    }


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality gates (the standard
    pre-training corpus filters, à la C4/Gopher rules)."""
    cols = quality_columns(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols.items()],
    )


def lang_columns(text) -> dict[str, F.Column]:
    """Language-ID expressions as named Columns (composable)."""
    toks = tokens(text)
    hits = {}
    for lang, words in STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    n_chars = F.length(text)
    non_ascii = n_chars - F.length(F.regexp_replace(text, r"[^\x00-\x7F]", ""))
    non_ascii_ratio = non_ascii.cast("double") / n_chars
    pred = (
        F.when(non_ascii_ratio > 0.3, F.lit("zh"))
        .when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"])
              & (hits["en"] >= hits["fr"]), F.lit("en"))
        .when((hits["de"] >= hits["es"]) & (hits["de"] >= hits["fr"]), F.lit("de"))
        .when(hits["es"] >= hits["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return {
        "hits_en": hits["en"], "hits_de": hits["de"],
        "hits_es": hits["es"], "hits_fr": hits["fr"],
        "non_ascii_ratio": non_ascii_ratio,
        "pred_lang": pred,
    }


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic with a non-ASCII check for CJK.
    Deterministic priority argmax (en > de > es > fr); 'zh' when the
    non-ASCII character ratio exceeds 0.3."""
    cols = lang_columns(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols.items()],
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """60-bit content fingerprint of whitespace-normalized text."""
    return df.select(
        F.col(id_col),
        hash60(norm_text(F.col(text_col))).alias("fingerprint"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): fraction
    of tokens that are repeats, and the share of the corpus-of-one taken
    by the most frequent token and word-bigram. High values flag
    boilerplate/spam documents worth dropping from a training corpus.

    Plan: explode tokens once, two hash-aggregations (token counts →
    per-doc max/sum) — one shuffle per aggregation, no window, scales
    linearly in corpus size. Bigrams ride the same shape.
    """
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    ex = toked.select(id_col, F.explode("_t").alias("tok"))
    tok_top = (ex.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
               .groupBy(id_col)
               .agg(F.max("c").alias("top_tok_c"),
                    F.sum("c").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_distinct_tokens")))
    # word bigrams via the same guarded sequence trick as shingles
    bigrams = F.when(
        F.size("_t") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.concat_ws(" ", F.element_at("_t", i),
                                          F.element_at("_t", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bex = toked.select(id_col, F.explode(bigrams).alias("bg"))
    bg_top = (bex.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
              .groupBy(id_col)
              .agg(F.max("c").alias("top_bg_c"),
                   F.sum("c").alias("n_bigrams")))
    return (tok_top.join(bg_top, on=id_col, how="left")
            .select(
                F.col(id_col),
                F.col("n_tokens"),
                F.col("n_distinct_tokens"),
                (F.lit(1.0) - F.col("n_distinct_tokens").cast("double")
                 / F.col("n_tokens")).alias("repeat_token_frac"),
                (F.col("top_tok_c").cast("double")
                 / F.col("n_tokens")).alias("top_token_frac"),
                F.when(F.col("n_bigrams").isNotNull(),
                       F.col("top_bg_c").cast("double")
                       / F.col("n_bigrams"))
                .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
            ))


# ---------------------------------------------------------------------------
# Chunking, PII scrubbing, vocabulary
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 400,
    overlap: int = 80,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap
    (the standard context-window prep for training/embedding pipelines).

    Pure built-ins: a per-row ``sequence`` of chunk starts + ``posexplode``
    + ``substr`` — row-multiplying but shuffle-free, so a 100 TB corpus
    chunks in one narrow map stage. Empty documents yield one empty
    chunk (the ``greatest`` guard) so every input row survives.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    starts = F.sequence(F.lit(1),
                        F.greatest(F.length(F.col(text_col)), F.lit(1)),
                        F.lit(stride))
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        F.col(text_col),
    )
    chunk = F.col(text_col).substr(F.col("chunk_start"), F.lit(chunk_chars))
    return out.select(
        id_col, "chunk_idx", "chunk_start",
        chunk.alias("chunk_text"),
        F.length(chunk).alias("n_chunk_chars"),
    )


#: PII patterns, least-specific last so earlier redactions cannot destroy
#: later matches. Every pattern is valid in BOTH Java regex (Spark) and
#: RE2 (DuckDB): no backreferences, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
]


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Detect + redact common PII shapes (email / IPv4 / phone), returning
    per-pattern match counts and the fingerprint hash of the scrubbed
    text. All regex work is JVM-side codegen; patterns are RE2-safe so
    the DuckDB oracle applies the identical expressions."""
    counts = [F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS]
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        F.col(id_col), *counts,
        hash60(scrubbed).alias("scrubbed_fingerprint"),
    )


def tfidf_topk(df: DataFrame, n_docs: int, k: int = 5,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k characteristic terms by a log-free TF-IDF
    variant: ``score = tf × N / df`` computed in pure IEEE double from
    exact integer inputs — deliberately no ``ln``: libm log results are
    not bit-identical across engines, double multiply/divide are, so the
    scores (and the oracle hash) stay deterministic. Plan: one explode,
    two hash aggregations (tf per doc×token, df per token), a token-keyed
    join, and a per-doc window rank — every stage partitions on small
    keys, nothing global. ``n_docs`` is passed in (metadata-sized count)
    so the plan carries it as a literal instead of a global aggregate."""
    from pyspark.sql import Window
    ex = df.select(F.col(id_col),
                   F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = ex.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("token_df"))
    score = ((F.col("tf").cast("double") * F.lit(float(n_docs)))
             / F.col("token_df").cast("double"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tok"))
    return (tf.join(dfreq, on="tok")
            .select(id_col, "tok", "tf", "token_df", score.alias("score"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def split_assign(df: DataFrame, id_col: str = "doc_id",
                 train_pct: int = 96, val_pct: int = 2) -> DataFrame:
    """Deterministic train/val/test split: ``hash(id) % 100`` buckets →
    train < ``train_pct`` ≤ val < ``train_pct+val_pct`` ≤ test. A narrow
    projection (no shuffle, no RNG state): the same document lands in the
    same split on every engine, every run, every cluster size — the
    reproducibility contract a training pipeline needs from its split."""
    bucket = hash60(F.col(id_col).cast("string")) % 100
    split = (F.when(bucket < train_pct, F.lit("train"))
             .when(bucket < train_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("test")))
    return df.withColumn("split", split)


def vocab_topk(df: DataFrame, k: int = 50, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary head: the k most frequent tokens with their
    total counts and document frequencies. One explode + one hash
    aggregation (map-side partial combine) + a tiny top-k sort — the
    canonical Zipf/vocab probe for corpus QA."""
    ex = df.select(F.col(id_col),
                   F.explode(tokens(F.col(text_col))).alias("tok"))
    return (ex.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.countDistinct(id_col).alias("doc_freq"))
            .orderBy(F.col("n_occurrences").desc(), "tok")
            .limit(k))


# ---------------------------------------------------------------------------
# Gopher quality rules, BM25 retrieval
# ---------------------------------------------------------------------------

#: Gopher-rule thresholds (Rae et al. 2021 Table A1), word-count bounds
#: adapted to the corpus scale of the testdata generator
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.10
GOPHER_MIN_ALPHA_FRAC = 0.80
GOPHER_REQUIRED_STOPWORDS = ["the", "a", "of", "and", "to", "in"]
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, Appendix A):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ``...``), fraction of words containing an alphabetic
    character, and a required-stopword presence count. Returns every
    metric plus the fused ``gopher_pass`` flag so downstream filters can
    tune individual rules.

    Plan shape: a single narrow projection — one pass over the corpus,
    no shuffle, no UDF; every expression is whole-stage-codegen built-ins,
    so the filter runs at scan speed on a 100 TB corpus. Mean word length
    divides two exact integers, keeping the doubles engine-reproducible.
    """
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    mean_len = sum_len.cast("double") / n_words
    n_hash = F.size(F.split(F.col(text_col), r"#", -1)) - 1
    n_ellipsis = F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = n_alpha.cast("double") / n_words
    sw = F.array([F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    sw_hits = F.size(F.filter(sw, lambda w: F.array_contains(toks, w)))
    gpass = ((n_words >= GOPHER_MIN_WORDS)
             & (n_words <= GOPHER_MAX_WORDS)
             & (mean_len >= GOPHER_MIN_MEAN_LEN)
             & (mean_len <= GOPHER_MAX_MEAN_LEN)
             & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
             & (alpha_frac >= GOPHER_MIN_ALPHA_FRAC)
             & (sw_hits >= GOPHER_MIN_STOPWORD_HITS))
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        sw_hits.alias("stopword_hits"),
        gpass.alias("gopher_pass"),
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BM25 retrieval of the top-``k`` documents for a bag of query
    terms, with the raw (log-free) idf variant
    ``idf = (N - df + 0.5) / (df + 0.5)`` — the standard Robertson
    formula minus the ``ln``, because libm logs are not bit-identical
    across engines while double multiply/divide are (same rationale as
    ``tfidf_topk``). Ranking order is preserved for any monotone idf.

    Plan shape (the scalable inverted-index-free form): per-term ``tf``
    is an array-filter expression — no explode, no join against a posting
    list; corpus statistics (``N``, per-term ``df``, total token count
    for ``avgdl``) reduce to ONE single-row aggregate that joins back as
    a broadcast literal. Total cost: two passes over the corpus (one for
    stats, one for scoring) + a top-k window — no shuffle keyed on
    anything wider than the single stats row. Per-document scores sum the
    per-term contributions in fixed query order, so the doubles are
    engine-reproducible (integer tf/df/N/dl inputs, one division chain
    per term).
    """
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("_toks"),
                     F.size(toks).alias("dl"))
    def _tf(word: str) -> Column:
        # NB: the predicate lambda must be unary — pyspark passes
        # (element, index) to binary lambdas, so a `w=w` default capture
        # would silently bind the index column
        return F.size(F.filter(F.col("_toks"), lambda t: t == F.lit(word)))

    tf_cols = [_tf(w).alias(f"tf_{i}") for i, w in enumerate(query_terms)]
    # the tf frame feeds BOTH the stats aggregate and the scoring pass —
    # without a checkpoint Catalyst re-runs the tokenize+filter scan for
    # each consumer (multi-use-plan discipline; measured ~2x on the
    # corpus bench). The materialized frame is narrow ints, corpus-scale
    # safe — tiny next to the text it replaces.
    scored_base = base.select(id_col, "dl", *tf_cols).transform(_pin)
    stats = scored_base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(query_terms))],
    )
    joined = scored_base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = ((F.col("n_docs").cast("double") - dfreq + F.lit(0.5))
               / (dfreq + F.lit(0.5)))
        contrib = idf * (tf * F.lit(BM25_K1 + 1.0)) / (
            tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                                   + F.lit(BM25_B) * F.col("dl").cast("double") / avgdl))
        score = score + contrib
    from pyspark.sql import Window
    # distributed top-k (TakeOrderedAndProject), NOT a global window:
    # ranking all scored rows through one partition would bottleneck at
    # corpus scale; the window only numbers the k survivors
    top = (joined.select(id_col, "dl",
                         *[F.col(f"tf_{i}").alias(f"tf_{t}")
                           for i, t in enumerate(query_terms)],
                         score.alias("score"))
           .filter(F.col("score") > 0)
           .orderBy(F.col("score").desc(), F.col(id_col))
           .limit(k))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rnk", F.row_number().over(w)).orderBy("rnk")


# ---------------------------------------------------------------------------
# Corpus keyness (distinctive terms per source/domain)
# ---------------------------------------------------------------------------

def source_keyness(df: DataFrame, k: int = 10, min_count: int = 5,
                   text_col: str = "text", id_col: str = "doc_id",
                   scope_col: str = "source") -> DataFrame:
    """Top-``k`` distinctive terms per ``scope_col`` by chi-square keyness
    (Dunning-style corpus-linguistics contrast, chi2 variant so the score
    is log-free and engine-reproducible).

    For each (scope, token): ``a`` = occurrences inside the scope,
    ``b`` = occurrences elsewhere, ``c``/``d`` = the complementary
    non-token counts, ``N = a+b+c+d`` = corpus token total. The score is

        chi2 = N * (a*d - b*c)^2 / ((a+b)*(c+d)*(a+c)*(b+d))

    computed in DOUBLE with a fixed operation order (all four counts are
    exact BIGINTs first), so the value is bit-identical across engines —
    same discipline as ``bm25_topk``'s log-free idf. Only overrepresented
    terms (``a*d > b*c``) are keyness candidates.

    Plan shape: one explode + one (scope, token) hash aggregate (map-side
    combinable) over the corpus; everything after runs on vocabulary-sized
    frames — token totals re-aggregate the (scope, token) frame, scope
    totals and the corpus total are broadcast back, and the final top-k
    window partitions by scope (domain-grained keys, no global sort). At
    100 TB the only corpus-scale stage is the first aggregate.
    """
    ex = df.select(F.col(scope_col).alias("scope"),
                   F.explode(tokens(F.col(text_col))).alias("tok"))
    st = (ex.groupBy("scope", "tok")
          .agg(F.count(F.lit(1)).alias("a"))
          .transform(_pin))
    tok_tot = st.groupBy("tok").agg(F.sum("a").alias("g"))
    scope_tot = st.groupBy("scope").agg(F.sum("a").alias("s_tot"))
    corpus_tot = st.agg(F.sum("a").alias("n_tot"))
    j = (st.join(tok_tot, "tok")
         .join(F.broadcast(scope_tot), "scope")
         .join(F.broadcast(corpus_tot))
         .filter(F.col("g") >= min_count))
    b = (F.col("g") - F.col("a")).alias("b")
    c = (F.col("s_tot") - F.col("a")).alias("c")
    d = (F.col("n_tot") - F.col("g") - (F.col("s_tot") - F.col("a"))).alias("d")
    m = j.select("scope", "tok", "a", "g", "n_tot", b, c, d)
    # fixed-order double arithmetic: delta, then N*delta^2 / (4 margins)
    delta = (F.col("a").cast("double") * F.col("d").cast("double")
             - F.col("b").cast("double") * F.col("c").cast("double"))
    m = m.withColumn("delta", delta).filter(F.col("delta") > 0)
    chi2 = (F.col("n_tot").cast("double") * (F.col("delta") * F.col("delta"))
            / ((F.col("a") + F.col("b")).cast("double")
               * (F.col("c") + F.col("d")).cast("double")
               * (F.col("a") + F.col("c")).cast("double")
               * (F.col("b") + F.col("d")).cast("double")))
    scored = m.select("scope", "tok",
                      F.col("a").alias("n_in_scope"),
                      F.col("g").alias("n_global"),
                      chi2.alias("chi2"))
    from pyspark.sql import Window
    w = Window.partitionBy("scope").orderBy(F.col("chi2").desc(), F.col("tok"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .orderBy("scope", "rnk"))
