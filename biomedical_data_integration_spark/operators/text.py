"""Text-analysis operators for corpus pipelines.

Training-data-pipeline extensions (BASELINE.json north-star): language ID,
quality scoring, token counting, document fingerprinting. Every operator
is a pure built-in-expression projection over the documents table — no
shuffle, no Python, linear scans that hold at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biomedical_data_integration_spark import config

# Tiny high-frequency stopword lists per language. Order matters: argmax
# ties resolve in this (alphabetical) order for determinism.
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "los", "las", "es", "de", "que", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "est", "de", "que", "en", "un", "une", "et", "dans"],
}


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties dropped."""
    return F.filter(
        F.split(F.lower(F.trim(text)), "\\s+"), lambda t: F.length(t) > 0
    )


def detect_language(
    df: DataFrame, text_col: str = "text", out_col: str = "detected_lang"
) -> DataFrame:
    """Heuristic n-gram/stopword language ID.

    Score per language = #tokens in its stopword list; argmax wins,
    alphabetical tiebreak; all-zero -> 'und' (undetermined, BCP-47).

    Staged projections: the token array and the per-language hit counts
    are materialized as real columns, because inlined they'd be
    re-evaluated at every reference (the argmax chain reads each count up
    to 3x, and each count re-reads the tokens — tokenization would run
    ~12x per row; CollapseProject keeps non-cheap multiply-referenced
    aliases in their own projection).
    """
    toks_df = df.withColumn("__toks", tokens_expr(F.col(text_col)))
    hit_cols = {}
    for lang in sorted(STOPWORDS):
        words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_cols[f"__hit_{lang}"] = F.size(
            F.filter(F.col("__toks"), lambda t: F.array_contains(words, t))
        )
    hits_df = toks_df.withColumns(hit_cols)
    hits = {lang: F.col(f"__hit_{lang}") for lang in sorted(STOPWORDS)}
    best = F.greatest(*hits.values())
    # argmax, alphabetical tiebreak: first language reaching the max wins
    chain = None
    for lang in sorted(STOPWORDS):
        step = F.when(hits[lang] == best, F.lit(lang))
        chain = step if chain is None else chain.when(hits[lang] == best, F.lit(lang))
    return hits_df.withColumn(
        out_col, F.when(best <= 0, F.lit("und")).otherwise(chain)
    ).drop("__toks", *hit_cols)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0, 1].

    Features (all pure expressions): char count, token count, mean token
    length, alpha ratio, digit ratio, punct ratio, stopword ratio,
    distinct-token ratio. Composite score = weighted sum of normalized
    features — a deterministic heuristic in the C4/Gopher-rules spirit.
    """
    text = F.col(text_col)
    all_stop = F.array(
        *[F.lit(w) for ws in STOPWORDS.values() for w in ws]
    )
    # stage the token array and every O(tokens) count as real columns —
    # inlined, each of the ~10 references below would re-tokenize the text
    staged = df.withColumn("__toks", tokens_expr(text)).withColumns(
        {
            "__n_tokens": F.size(F.col("__toks")),
            "__n_distinct": F.size(F.array_distinct(F.col("__toks"))),
            "__stop_hits": F.size(
                F.filter(F.col("__toks"), lambda t: F.array_contains(all_stop, t))
            ),
        }
    )
    n_chars = F.length(text)
    n_tokens = F.col("__n_tokens")
    n_distinct = F.col("__n_distinct")
    stop_hits = F.col("__stop_hits")
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", ""))

    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, digit / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_tokens > 0, n_distinct / n_tokens).otherwise(F.lit(0.0))

    # length factor: saturating ramp to 1.0 at >= 20 tokens
    length_factor = F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    score = (
        0.3 * alpha_ratio
        + 0.2 * length_factor
        + 0.2 * distinct_ratio
        + 0.2 * F.least(stop_ratio * 4.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(digit_ratio + punct_ratio, F.lit(1.0)))
    )
    r = lambda c: F.round(c, config.SIMILARITY_SCALE)  # noqa: E731
    return staged.select(
        *[F.col(c) for c in df.columns],
        n_tokens.alias("n_tokens"),
        r(mean_tok_len).alias("mean_token_len"),
        r(alpha_ratio).alias("alpha_ratio"),
        r(digit_ratio).alias("digit_ratio"),
        r(punct_ratio).alias("punct_ratio"),
        r(stop_ratio).alias("stopword_ratio"),
        r(distinct_ratio).alias("distinct_token_ratio"),
        r(score).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish subword estimate.

    The subword estimate charges ceil(len/4) units per word (the familiar
    ~4-chars-per-token rule) — a deterministic, vocabulary-free stand-in
    for a real tokenizer, adequate for budget accounting in pipelines.
    """
    staged = df.withColumn("__toks", tokens_expr(F.col(text_col)))
    toks = F.col("__toks")
    ws = F.size(toks)
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("bigint"),
    )
    return staged.select(
        *[F.col(c) for c in df.columns], ws.alias("ws_tokens"), bpe.alias("bpe_tokens_est")
    )


def document_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 5,
) -> DataFrame:
    """Content fingerprint: min md5 over word-5-gram shingles (a winnowing-
    style selection of one representative shingle hash). Documents sharing
    a fingerprint almost surely share a 5-word span; cheap join key for
    coarse near-dup grouping. Returns (id, fingerprint)."""
    from biomedical_data_integration_spark.functions.strings import word_ngrams

    # materialize the token array first — word_ngrams references its input
    # ~4x and once per shingle slice, so an inlined tokenize is O(len ·
    # n_shingles) per document (same fix as dedup.shingle_sets)
    staged = df.select(
        F.col(id_col).alias("id"), tokens_expr(F.col(text_col)).alias("__toks")
    )
    shingles = word_ngrams(F.col("__toks"), shingle_words)
    fp = F.array_min(F.transform(shingles, lambda s: F.md5(s)))
    return staged.select("id", fp.alias("fingerprint"))


def corpus_vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
    min_doc_freq: int = 1,
) -> DataFrame:
    """Corpus-level vocabulary: the ``top_k`` terms by term frequency with
    document frequencies — the input to tokenizer training, stopword
    derivation, and idf tables.

    One explode + one hash-groupBy (both map-side combinable: partial
    counts per partition, the shuffle carries one row per distinct term
    per partition, not per token occurrence), then a global top-k via
    TakeOrderedAndProject (no full sort at the driver). Ties break
    alphabetically for determinism.

    Returns (term, tf, df) — tf = total occurrences, df = #documents.
    """
    toks = df.select(
        F.col(id_col).alias("__doc"),
        tokens_expr(F.col(text_col)).alias("__toks"),
    )
    terms = toks.select(
        "__doc", F.explode(F.col("__toks")).alias("term")
    )
    counts = terms.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.count_distinct("__doc").alias("df"),
    )
    return (
        counts.where(F.col("df") >= min_doc_freq)
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(top_k)
    )
