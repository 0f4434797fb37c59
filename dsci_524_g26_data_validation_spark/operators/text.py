"""Text-analysis operators for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All hot-path expressions are pure Catalyst (``pyspark.sql.functions`` —
split/filter/transform/aggregate on arrays), so whole-stage codegen and
column pruning hold; nothing here ships rows through Python. Every
operator is deliberately expressible in ANSI SQL too, so the DuckDB
oracle can verify it value-for-value (see __spark_entry__.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tokens_expr",
    "token_count_expr",
    "BPE_SPLIT_PATTERN",
    "bpe_tokens_expr",
    "bpe_token_count_expr",
    "token_stats",
    "top_tokens",
    "quality_score_expr",
    "quality_by_source",
    "char_entropy_expr",
    "entropy_census",
    "word_ngrams_expr",
    "max_run_expr",
    "repetition_metrics",
    "repetitive_docs",
    "repetition_by_group",
    "STOPWORDS",
    "language_scores_expr",
    "language_id",
    "NGRAM_PROFILES",
    "char_trigrams_expr",
    "ngram_profile_hits_expr",
    "language_id_ngram",
    "fingerprint_expr",
    "fingerprints",
    "kgram_hashes_expr",
    "winnow_expr",
    "winnowing_fingerprints",
    "HYGIENE_PATTERNS",
    "encoding_hygiene",
]


# -- token counting ----------------------------------------------------------


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokenization (BPE-ish splitting is a contract between
    producer and consumer; whitespace is the deterministic common core)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count_expr(col: Column | str) -> Column:
    return F.size(tokens_expr(col))


#: GPT-2-style pre-tokenizer split (Radford et al. 2019, public spec),
#: ASCII form: contraction suffixes, space-prefixed letter runs, digit
#: runs, punctuation runs. Kept to constructs Java regex and RE2 parse
#: identically, so the DuckDB oracle reproduces it byte-for-byte; swap
#: in the \p{L}/\p{N} unicode classes for multilingual corpora.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_tokens_expr(col: Column | str) -> Column:
    """BPE-style pre-tokenization — the unit an LLM tokenizer would merge
    from; counts with this split track real token budgets far better
    than whitespace (punctuation, contractions, and numbers separate).
    Pure Catalyst ``regexp_extract_all``, codegen-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)


def bpe_token_count_expr(col: Column | str) -> Column:
    return F.size(bpe_tokens_expr(col))


def token_stats(df: DataFrame, text_col: str = "text", group_col: str = "source") -> DataFrame:
    """Per-group token statistics — one scan, one partial+final hash agg."""
    n = token_count_expr(text_col)
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # explicit bigint: DuckDB's sum() yields HUGEINT/DECIMAL where
            # Spark yields BIGINT — both sides cast so serialized values match
            F.sum(n).cast("bigint").alias("total_tokens"),
            F.round(F.avg(n), 6).alias("avg_tokens"),
            F.max(n).alias("max_tokens"),
        )
    )


def top_tokens(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """Exact top-``k`` most frequent tokens per group →
    (group, token, n, rank) — the corpus-quality heavy-hitter report
    (boilerplate tokens, template artifacts, language drift per source).

    Scale shape: explode → groupBy(group, token) hash-aggregates with
    map-side partial aggregation, so the shuffle carries one
    (group, token, partial-count) tuple per distinct token per
    partition, NOT one row per token occurrence; the windowed top-k then
    runs over the (much smaller) distinct-token counts, partitioned by
    group. Deterministic: ties break by token ascending.
    """
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    counts = (
        # explode_outer sidesteps the inferred size()>0 filter (it would
        # inline an extra split per row below this projection)
        df.select(F.col(group_col), F.explode_outer(toks).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy(group_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= k)
    )


# -- quality scoring ---------------------------------------------------------


def quality_score_expr(col: Column | str) -> Column:
    """Heuristic document quality in [0,1] from cheap surface features:
    length band, mean word length band, alpha ratio. Deterministic,
    SQL-expressible, tuned for 'is this plausible natural text'."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tok = token_count_expr(c)
    mean_word = n_chars.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    alpha = (
        F.length(F.regexp_replace(c, "[^a-zA-Z ]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    len_ok = F.when((n_chars >= 100) & (n_chars <= 100000), 1.0).otherwise(
        F.when(n_chars < 100, n_chars.cast("double") / 100.0).otherwise(0.5)
    )
    word_ok = F.when((mean_word >= 3.0) & (mean_word <= 12.0), 1.0).otherwise(0.4)
    return F.round((len_ok + word_ok + alpha) / F.lit(3.0), 6)


def quality_by_source(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    # projection barrier: materialize the score ONCE per row, then
    # aggregate the materialized column. Inlining quality_score_expr
    # into both avg() and min() would evaluate the whole expression tree
    # (which re-splits the text) twice per row — Catalyst does not
    # common-subexpression-eliminate across aggregate expressions.
    scored = df.select(
        F.col(group_col), quality_score_expr(text_col).alias("_q")
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_q"), 6).alias("avg_quality"),
        F.round(F.min("_q"), 6).alias("min_quality"),
    )


def char_entropy_expr(col: Column | str) -> Column:
    """Shannon entropy (bits/char) of the document's character unigram
    distribution — the degenerate-text signal quality bands can't see:
    keyboard mash, single-char padding, base64 blobs and binary-pasted
    junk all sit far from natural language's ~3.5-4.5 bits/char (the
    C4/Dolma-style entropy gate).

    Pure Catalyst, row-local: one split yields the distinct characters;
    each character's count is ``length(text) − length(replace(text,
    ch))`` (a JVM string pass, no per-char explode), and the entropy is
    one ``aggregate`` fold over the ≤|alphabet| distinct chars — so cost
    is O(distinct_chars × len) of codegen string work per row, zero
    shuffles, zero Python. NULL or empty text → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    # split("") emits a trailing "" (Java split semantics at limit -1)
    chars = F.filter(F.array_distinct(F.split(c, "")), lambda ch: ch != "")
    p = lambda ch: (  # noqa: E731
        (n - F.length(F.replace(c, ch))).cast("double") / n
    )
    ent = F.aggregate(
        chars,
        F.lit(0.0),
        lambda acc, ch: acc - p(ch) * F.log2(p(ch)),
    )
    return F.when(c.isNull() | (F.length(c) == 0), F.lit(None).cast("double")).otherwise(
        F.round(ent, 6)
    )


def entropy_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    low_threshold: float = 2.0,
) -> DataFrame:
    """Per-group character-entropy health → ``(group, n_docs, n_scored,
    avg_entropy, min_entropy, low_frac)``.

    ``low_frac`` is the share of scored docs under ``low_threshold``
    bits/char — the boilerplate/degenerate-content fraction; NULL/empty
    docs count in ``n_docs`` but not in ``n_scored`` (missingness is a
    different check's verdict). Projection barrier first (the entropy
    tree re-reads the text many times; materialize it once per row),
    then one map-side-combined aggregate on |groups| keys.
    """
    scored = df.select(
        F.col(group_col), char_entropy_expr(text_col).alias("_e")
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("_e").alias("n_scored"),
        F.round(F.avg("_e"), 6).alias("avg_entropy"),
        F.round(F.min("_e"), 6).alias("min_entropy"),
        F.round(
            F.count_if(F.col("_e") < low_threshold).cast("double")
            / F.greatest(F.count("_e"), F.lit(1)).cast("double"),
            6,
        ).alias("low_frac"),
    )


# -- repetition / boilerplate detection (Gopher-style) -----------------------


def word_ngrams_expr(toks: Column, n: int = 2) -> Column:
    """Word ``n``-grams of a token array, joined with single spaces —
    pure Catalyst (transform over an index sequence + element_at).

    ``toks`` MUST be a materialized column reference (select the token
    array behind a projection barrier first): an inline
    :func:`tokens_expr` here would sit inside the per-position lambda
    and re-split the text once per n-gram (the CollapseProject/lambda
    trap — see :func:`winnow_expr`). Arrays shorter than ``n`` yield an
    empty n-gram array (NOT a descending index sequence — Spark's
    ``sequence(n, size)`` counts DOWN when size < n, so the short case
    is guarded explicitly)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    gram = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i - F.lit(n - 1 - j)) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(n), F.size(toks)), gram),
    ).otherwise(F.array().cast("array<string>"))


def max_run_expr(sorted_arr: Column) -> Column:
    """Count of the most frequent element of a SORTED array = the longest
    run of equal adjacent elements — one ``aggregate`` fold with a tiny
    (prev, run, max) struct state, O(m) per row after the O(m log m)
    ``array_sort``.

    This is the row-local way to compute a per-document mode count: no
    explode, no (doc, gram) shuffle — the 100 TB-safe shape, since
    per-document work never leaves the row. Empty array → 0."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("mx"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["mx"], run).alias("mx"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["mx"])


def repetition_metrics(
    df: DataFrame, *, text_col: str = "text", keep: tuple = ("doc_id",)
) -> DataFrame:
    """Per-document repetition metrics — the Gopher/MassiveText
    repetition filters (Rae et al. 2021, "Scaling Language Models",
    public) in their occurrence-count form:

    - ``dup_word_frac``: 1 − distinct/total words (0 for empty docs);
    - ``top_bigram_frac`` / ``top_trigram_frac``: fraction of word
      n-gram occurrences claimed by the single most frequent n-gram.

    Boilerplate, templated spam, and degenerate generations score high;
    natural text stays low. All pure Catalyst: tokens materialize once
    behind a projection barrier, each n-gram array materializes once,
    and the per-doc mode count is a row-local sort+fold
    (:func:`max_run_expr`) — zero shuffles, zero UDFs, so the plan is a
    single whole-stage-codegen map at any scale."""
    base = df.select(*[F.col(c) for c in keep], tokens_expr(text_col).alias("_t"))
    with_ng = base.select(
        *keep,
        F.size("_t").alias("n_words"),
        F.size(F.array_distinct("_t")).alias("_nd"),
        word_ngrams_expr(F.col("_t"), 2).alias("_bg"),
        word_ngrams_expr(F.col("_t"), 3).alias("_tg"),
    )

    def top_frac(ng: Column) -> Column:
        return F.when(
            F.size(ng) > 0,
            max_run_expr(F.array_sort(ng)).cast("double")
            / F.size(ng).cast("double"),
        ).otherwise(F.lit(0.0))

    return with_ng.select(
        *keep,
        "n_words",
        F.round(
            F.lit(1.0)
            - F.col("_nd").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_word_frac"),
        F.round(top_frac(F.col("_bg")), 6).alias("top_bigram_frac"),
        F.round(top_frac(F.col("_tg")), 6).alias("top_trigram_frac"),
    )


def repetitive_docs(
    df: DataFrame,
    *,
    text_col: str = "text",
    keep: tuple = ("doc_id",),
    max_dup_word_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
    max_top_trigram_frac: float = 0.18,
) -> DataFrame:
    """Documents failing any repetition threshold (defaults follow the
    published Gopher bands) — the filter stage of a cleaning pipeline;
    feed the complement to training."""
    m = repetition_metrics(df, text_col=text_col, keep=keep)
    return m.filter(
        (F.col("dup_word_frac") > max_dup_word_frac)
        | (F.col("top_bigram_frac") > max_top_bigram_frac)
        | (F.col("top_trigram_frac") > max_top_trigram_frac)
    )


def repetition_by_group(
    df: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group rollup of :func:`repetition_metrics` — the corpus
    health report (which sources ship templated/repetitive text)."""
    m = repetition_metrics(df, text_col=text_col, keep=(group_col,))
    return m.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dup_word_frac"), 4).alias("avg_dup_word_frac"),
        F.round(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
        F.round(F.max("top_bigram_frac"), 6).alias("max_top_bigram_frac"),
        F.round(F.avg("top_trigram_frac"), 4).alias("avg_top_trigram_frac"),
    )


# -- language identification -------------------------------------------------

#: Tiny per-language stopword lists — the heuristic core of n-gram langid.
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"],
}


def language_scores_expr(col: Column | str) -> Dict[str, Column]:
    """Per-language stopword-hit counts over the token array — Catalyst
    ``filter`` higher-order function, zero UDFs."""
    toks = tokens_expr(col)
    lowered = F.transform(toks, lambda t: F.lower(t))
    return {
        lang: F.size(F.filter(lowered, lambda t: t.isin(words)))
        for lang, words in STOPWORDS.items()
    }


def language_id(
    df: DataFrame, text_col: str = "text", *, min_hits: int = 1
) -> DataFrame:
    """Append ``lang_pred``: argmax language by stopword hits, ``und``
    (undetermined) below ``min_hits``. Ties break alphabetically
    (deterministic).

    Two-step projection on purpose: hit counts are materialized as
    columns first and the argmax only references them. Inlining the
    split/filter expression into every ``when`` arm (the naive one-step
    form) replicates the tokenization ~12× in the expression tree;
    Catalyst's CollapseProject declines to merge projections that would
    duplicate expensive expressions, so each hit count is evaluated
    exactly once per row here (~10× faster on real documents)."""
    scores = language_scores_expr(text_col)
    langs = sorted(scores)
    hit_cols = [f"_hits_{l}" for l in langs]
    with_hits = df.select(
        "*", *[scores[l].alias(h) for l, h in zip(langs, hit_cols)]
    )
    best_score = F.greatest(*[F.col(h) for h in hit_cols])
    pred = F.lit("und")
    for lang, h in zip(reversed(langs), reversed(hit_cols)):
        pred = F.when(
            (F.col(h) == best_score) & (best_score >= min_hits), F.lit(lang)
        ).otherwise(pred)
    return with_hits.withColumn("lang_pred", pred).drop(*hit_cols)


# -- byte/char n-gram language ID --------------------------------------------

#: Characteristic character trigrams per language — the classic n-gram
#: profile method (Cavnar & Trenkle, "N-Gram-Based Text Categorization",
#: SDAIR 1994): rank-frequent trigrams (including word-boundary spaces)
#: drawn from published frequency tables. 12 per language so raw hit
#: counts are comparable without normalization. Trigram scoring is far
#: more robust than word-stopword hits on short strings, OCR noise, and
#: unsegmented text, and needs no tokenizer.
NGRAM_PROFILES: Dict[str, List[str]] = {
    "en": [" th", "the", "he ", "ing", "ng ", " an", "and", "nd ",
           " of", "of ", "ed ", " to"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", "nt ", " la",
           "la ", "ion", " et", "et "],
    "de": ["er ", "en ", " de", "der", "ie ", "die", "ch ", "ein",
           "sch", "und", " un", "ich"],
    "es": [" de", "de ", "os ", " la", "la ", " el", "el ", "que",
           " qu", "ue ", "ar ", " co"],
}


def char_trigrams_expr(col: Column | str) -> Column:
    """All character trigrams of the lowercased text — pure Catalyst
    (transform over a start-index sequence). The input column SHOULD be
    a materialized lowercase column reference: an inline ``lower(text)``
    expression here would sit inside the per-position lambda and be
    recomputed once per trigram (the CollapseProject/lambda trap —
    see :func:`winnow_expr`)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: c.substr(i, F.lit(3)),
    )


def ngram_profile_hits_expr(trigrams: Column) -> Dict[str, Column]:
    """Per-language profile-trigram hit counts over a materialized
    trigram array — Catalyst ``filter`` HOF, zero UDFs. Counts every
    occurrence (not distinct trigrams): frequency carries signal."""
    return {
        lang: F.size(F.filter(trigrams, lambda t: t.isin(prof)))
        for lang, prof in NGRAM_PROFILES.items()
    }


def language_id_ngram(
    df: DataFrame, text_col: str = "text", *, min_hits: int = 2,
    max_chars: Optional[int] = None,
) -> DataFrame:
    """Append ``lang_pred``: argmax language by character-trigram profile
    hits, ``und`` below ``min_hits``. Ties break alphabetically.

    The scale-path upgrade of :func:`language_id` (VERDICT r2 item 8):
    same oracle-checkable pure-Catalyst shape, but scoring on character
    n-grams instead of word stopwords. Three projection barriers —
    lowered text, then the trigram array, then the per-language hit
    counts — so the text is lowered once, trigrams materialize once per
    row, and the argmax references plain int columns.

    Cost is linear in text length and dominated by trigram
    materialization (measured: the 4 profile filters are nearly free on
    top of it). ``max_chars`` is the scale lever: language ID on a
     512-1024 char prefix is statistically equivalent for whole-document
    labels (the standard sampling trick in production detectors) and
    cuts the per-row cost proportionally on long documents.
    """
    src = F.col(text_col)
    if max_chars is not None:
        src = F.substring(src, 1, max_chars)
    lowered = df.select("*", F.lower(src).alias("_lt"))
    with_tri = lowered.select(
        "*", char_trigrams_expr("_lt").alias("_tri")
    ).drop("_lt")
    scores = ngram_profile_hits_expr(F.col("_tri"))
    langs = sorted(scores)
    hit_cols = [f"_nhits_{l}" for l in langs]
    with_hits = with_tri.select(
        "*", *[scores[l].alias(h) for l, h in zip(langs, hit_cols)]
    ).drop("_tri")
    best = F.greatest(*[F.col(h) for h in hit_cols])
    pred = F.lit("und")
    for lang, h in zip(reversed(langs), reversed(hit_cols)):
        pred = F.when(
            (F.col(h) == best) & (best >= min_hits), F.lit(lang)
        ).otherwise(pred)
    return with_hits.withColumn("lang_pred", pred).drop(*hit_cols)


# -- fingerprinting ----------------------------------------------------------


def fingerprint_expr(col: Column | str, *, prefix_tokens: Optional[int] = None) -> Column:
    """Deterministic document fingerprint: md5 of the text (or of its
    first ``prefix_tokens`` tokens for clustering near-identical heads).
    md5 chosen over xxhash64 because every engine (Spark, DuckDB,
    Trino…) renders it identically — fingerprints are portable IDs."""
    c = F.col(col) if isinstance(col, str) else col
    if prefix_tokens is not None:
        c = F.array_join(F.slice(tokens_expr(c), 1, prefix_tokens), " ")
    return F.md5(c)


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col),
        fingerprint_expr(text_col).alias("fingerprint"),
        fingerprint_expr(text_col, prefix_tokens=16).alias("prefix_fingerprint"),
    )


# -- winnowing (rolling k-gram fingerprints) ---------------------------------


def kgram_hashes_expr(
    col: Column | str, *, k: int = 8, hash_fn: str = "xxhash64"
) -> Column:
    """Rolling character k-gram hashes of a document — the MOSS
    winnowing substrate (Schleimer/Wilkerson/Aiken, SIGMOD 2003). Pure
    Catalyst: transform over a start-index sequence, one hash per
    k-gram. ``hash_fn``: ``xxhash64`` (bigint, the fast at-scale
    default) or ``md5`` (hex string — renders identically in every
    engine, used by the oracle-checked query)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(
            f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}"
        )
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    h = (lambda s: F.xxhash64(s)) if hash_fn == "xxhash64" else F.md5
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: h(c.substr(i, F.lit(k))),
    )


def winnow_expr(kgrams: Column, *, window: int = 4) -> Column:
    """Winnowing: the minimum hash of every ``window`` consecutive
    k-gram hashes, deduplicated — guarantees any shared substring of
    length ≥ k+window−1 between two documents yields a shared
    fingerprint (the MOSS guarantee). Catalyst transform + array_min
    over slices; output is a per-document fingerprint set.

    ``kgrams`` MUST be a materialized column reference (select the
    k-gram array behind a projection barrier first, as
    :func:`winnowing_fingerprints` does) — an inline
    :func:`kgram_hashes_expr` expression here is embedded inside the
    sliding-window lambda and recomputed once per window position
    (measured ~70x slower at 200-char prefixes)."""
    m = F.size(kgrams)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(m - window + 1, F.lit(1))),
            lambda j: F.array_min(F.slice(kgrams, j, window)),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fingerprints: array) — winnowed rolling-hash fingerprints.

    Docs sharing any fingerprint share a ≥ k+window−1 character run —
    the standard copy-detection candidate generator; join on exploded
    fingerprints (tiny values, text never shuffled) to find candidates,
    exactly like the MinHash band join."""
    kg = kgram_hashes_expr(text_col, k=k, hash_fn=hash_fn)
    base = df.select(F.col(id_col), kg.alias("_kg"))
    return base.select(
        id_col, winnow_expr(F.col("_kg"), window=window).alias("fingerprints")
    )


# -- encoding / markup hygiene ------------------------------------------------

#: Hygiene patterns in the Java-regex ∩ RE2 subset (the pii.py
#: convention, so the DuckDB oracle runs the SAME pattern): mojibake
#: marker, C0 control characters (excluding \t \n \r, which are normal
#: text), HTML/XML tag residue, and HTML entity residue.
HYGIENE_PATTERNS = {
    "replacement": "�",
    "control": "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]",
    "markup_tag": "<[A-Za-z/][^<>]*>",
    "entity": "&(amp|lt|gt|quot|nbsp|#[0-9]{1,6});",
}


def encoding_hygiene(
    df: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group encoding/markup hygiene census — the web-corpus screens
    document-level quality scores don't see: mojibake (U+FFFD
    replacement characters mean an upstream decode already destroyed
    bytes), C0 control characters (binary contamination), and HTML
    tag/entity residue (extraction failure).

    One Catalyst scan: four ``regexp_count`` projections per row, then
    a |groups|-row aggregate (map-side combined). Zero UDFs, zero extra
    shuffles — the same shape as ``detect_pii``. NULL text counts as a
    document with no findings.

    Output per group: n_docs, then per pattern `docs_<kind>` (documents
    containing ≥1 hit) and `n_<kind>` (total occurrences), plus
    avg_nonascii_frac (mean fraction of characters outside printable
    ASCII — a blunt but language-aware-threshold-able signal; 0 for
    empty docs).
    """
    c = F.col(text_col)
    counts = {
        k: F.regexp_count(c, F.lit(p)).alias(f"_h_{k}")
        for k, p in HYGIENE_PATTERNS.items()
    }
    n_chars = F.length(c)
    nonascii = n_chars - F.regexp_count(c, F.lit("[\\x20-\\x7e]"))
    pre = df.select(
        F.col(group_col),
        *counts.values(),
        F.when(
            c.isNotNull() & (n_chars > 0),
            nonascii.cast("double") / n_chars.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("_nonascii"),
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    for k in HYGIENE_PATTERNS:
        aggs.append(
            F.count_if(F.col(f"_h_{k}") > 0).cast("bigint").alias(f"docs_{k}")
        )
        aggs.append(
            F.coalesce(F.sum(f"_h_{k}"), F.lit(0)).cast("bigint").alias(f"n_{k}")
        )
    aggs.append(F.round(F.avg("_nonascii"), 6).alias("avg_nonascii_frac"))
    return pre.groupBy(group_col).agg(*aggs)
