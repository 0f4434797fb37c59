"""Gopher-style document-quality rule filters and a compression-ratio
quality proxy for LLM training-data pipelines.

The rule set is the published Gopher quality-filter heuristics (Rae et
al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", Appendix A1.1): word-count band, mean-word-length
band, symbol-to-word ratio, bullet-line and ellipsis-line fractions,
alphabetic-word fraction, and a minimum stop-word presence. Every rule
is a pure Catalyst expression (split / filter / transform on arrays +
string functions) so whole-stage codegen holds and the DuckDB oracle
can reproduce each predicate byte-for-byte — no Python in the hot path.

The compression-ratio proxy (deflate bytes / raw bytes, a standard
repetitive-boilerplate signal used by public corpus-cleaning pipelines
such as CCNet/RefinedWeb-style filters) needs zlib, which SQL engines
don't expose — it runs as an Arrow-batched pandas UDF (never per-row
Python) and is pinned by pytest rather than the SQL oracle. A second
``mode="dictionary"`` (r3 VERDICT item 7) estimates the same signal as
the word type-token ratio — distinct words / total words, the
zeroth-order dictionary-coder bound — in PURE Catalyst, so the census
pipeline AROUND the gate is oracle-verified end-to-end while the zlib
path stays pytest-pinned.

Scale shape: the flags are row-local (one projection, no shuffle); the
census is one map-side-combined aggregate on |groups| keys. At 100 TB
the whole operator is a single scan.
"""

from __future__ import annotations

from functools import reduce
from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "GOPHER_STOPWORDS",
    "GOPHER_RULE_NAMES",
    "gopher_flag_exprs",
    "gopher_flags",
    "gopher_census",
    "compression_ratio_udf",
    "dictionary_ratio_expr",
    "with_compression_ratio",
    "compression_census",
]

#: The eight stop words of the Gopher rule: a document must contain at
#: least two of them (Rae et al. 2021, A1.1).
GOPHER_STOPWORDS: List[str] = [
    "the", "be", "to", "of", "and", "that", "have", "with",
]

#: Rule flag column names, in census order.
GOPHER_RULE_NAMES: List[str] = [
    "fail_word_count",
    "fail_mean_word_len",
    "fail_symbol_ratio",
    "fail_bullet_lines",
    "fail_ellipsis_lines",
    "fail_alpha_words",
    "fail_stopwords",
]


def _words_expr(c: Column) -> Column:
    """Single-space word split with empties dropped — matches the
    engine's whitespace-token contract (text.tokens_expr) while staying
    robust to runs of spaces. Oracle: list_filter(string_split(text,' '),
    w -> w <> '')."""
    return F.filter(F.split(c, " "), lambda w: w != F.lit(""))


def gopher_flag_exprs(
    c: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> List[Column]:
    """The seven Gopher rule predicates over a text column, as unaliased
    boolean Columns in :data:`GOPHER_RULE_NAMES` order. NULL text yields
    NULL flags (callers gate on scorability separately).

    Every sub-expression has an exact DuckDB twin (see
    __spark_entry__.py's ``gopher_rules_documents`` oracle): division is
    double/double computed identically on both sides, so threshold
    comparisons agree bit-for-bit.
    """
    words = _words_expr(c)
    n_words = F.size(words).cast("double")
    n_words_safe = F.greatest(n_words, F.lit(1.0))

    # mean word length: chars excluding the single-space separators
    mean_word = (
        F.length(F.replace(c, F.lit(" "), F.lit(""))).cast("double") / n_words_safe
    )

    # symbol-to-word ratio over '#' and '...' occurrences
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words_safe

    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.endswith(F.lit("...")))).cast("double")
        / n_lines
    )

    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words_safe
    )

    # distinct stop-word presence as an explicit sum of contains() terms:
    # deterministic on both engines (no list_intersect dedup-semantics risk)
    lower_words = F.transform(words, F.lower)
    stop_hits = reduce(
        lambda a, b: a + b,
        [
            F.array_contains(lower_words, sw).cast("int")
            for sw in GOPHER_STOPWORDS
        ],
    )

    return [
        (n_words < F.lit(float(min_words))) | (n_words > F.lit(float(max_words))),
        (mean_word < F.lit(min_mean_word_len))
        | (mean_word > F.lit(max_mean_word_len)),
        symbol_ratio > F.lit(max_symbol_ratio),
        bullet_frac > F.lit(max_bullet_frac),
        ellipsis_frac > F.lit(max_ellipsis_frac),
        alpha_frac < F.lit(min_alpha_frac),
        stop_hits < F.lit(min_stopword_hits),
    ]


def gopher_flags(
    df: DataFrame, *, text_col: str = "text", **thresholds
) -> DataFrame:
    """Append the seven Gopher rule flags plus ``gopher_pass`` (true iff
    every rule passes; NULL text → NULL everywhere). Row-local — one
    projection, no shuffle, codegen-friendly at any scale."""
    c = F.col(text_col)
    exprs = gopher_flag_exprs(c, **thresholds)
    out = df
    for name, e in zip(GOPHER_RULE_NAMES, exprs):
        out = out.withColumn(name, e)
    passed = reduce(
        lambda a, b: a & b, [~F.col(n) for n in GOPHER_RULE_NAMES]
    )
    return out.withColumn("gopher_pass", passed)


def gopher_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    **thresholds,
) -> DataFrame:
    """Per-group Gopher rule census → ``(group, n_docs, n_scored,
    n_fail_<rule> × 7, n_pass, pass_frac)``.

    ``n_scored`` excludes NULL/empty text (missingness is a different
    check's verdict); ``pass_frac`` = n_pass / n_scored. Projection
    barrier first (the flag trees re-split the text; materialize each
    flag once per row), then one map-side-combined aggregate — the
    shuffle carries |groups| tuples, never rows.
    """
    c = F.col(text_col)
    scorable = c.isNotNull() & (F.length(c) > 0)
    exprs = gopher_flag_exprs(c, **thresholds)
    flagged = df.select(
        F.col(group_col),
        scorable.alias("_ok"),
        *[
            F.when(scorable, e).alias(n)
            for n, e in zip(GOPHER_RULE_NAMES, exprs)
        ],
    )
    passed = reduce(lambda a, b: a & b, [~F.col(n) for n in GOPHER_RULE_NAMES])
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("_ok")).alias("n_scored"),
        *[F.count_if(F.col(n)).alias(f"n_{n}") for n in GOPHER_RULE_NAMES],
        F.count_if(passed).alias("n_pass"),
        F.round(
            F.count_if(passed).cast("double")
            / F.greatest(F.count_if(F.col("_ok")), F.lit(1)).cast("double"),
            6,
        ).alias("pass_frac"),
    ]
    return flagged.groupBy(group_col).agg(*aggs)


# -- compression-ratio proxy (zlib, Arrow-batched) ----------------------------


def compression_ratio_udf(level: int = 6):
    """Arrow-batched pandas UDF: deflate-bytes / raw-utf8-bytes per
    document. Low ratios (< ~0.3) flag highly repetitive boilerplate;
    ratios near 1.0 flag random/binary junk. NULL/empty → NULL.

    zlib is stdlib — no sandbox gating needed; the batch loop is a tight
    C call per value (zlib releases the GIL), not row-at-a-time Python
    overhead in the Spark sense (one Arrow transfer per batch).
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.map(one)

    return _ratio


def dictionary_ratio_expr(text: Column) -> Column:
    """Pure-Catalyst compression proxy: distinct words / total words
    (word type-token ratio) — the size a zeroth-order dictionary coder's
    dictionary would have relative to the stream, and a monotone proxy
    for the same repetitive-boilerplate signal zlib measures (a page of
    repeated nav-bar tokens has few types over many tokens). Split on
    single spaces so the DuckDB oracle (string_split/list_distinct)
    reproduces it byte-for-byte. NULL/empty → NULL like the zlib mode."""
    toks = F.split(text, " ")
    return F.when(
        text.isNotNull() & (F.length(text) > 0),
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double"),
    )


def with_compression_ratio(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
    mode: str = "zlib",
) -> DataFrame:
    """Append the per-document compression ratio (row-local, no
    shuffle). ``mode="zlib"`` (default): deflate bytes / raw bytes via
    the Arrow-batched UDF; ``mode="dictionary"``: the pure-Catalyst
    type-token proxy (:func:`dictionary_ratio_expr`) — SQL-oracle-able
    and whole-stage-codegen'd, with ``level`` ignored."""
    if mode == "zlib":
        expr = compression_ratio_udf(level)(F.col(text_col))
    elif mode == "dictionary":
        expr = dictionary_ratio_expr(F.col(text_col))
    else:
        raise ValueError(f"mode must be 'zlib' or 'dictionary', got {mode!r}")
    return df.withColumn(out_col, expr)


def compression_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    repetitive_threshold: float = 0.3,
    level: int = 6,
    mode: str = "zlib",
) -> DataFrame:
    """Per-group compression-ratio health → ``(group, n_docs, n_scored,
    avg_ratio, min_ratio, repetitive_frac)`` where ``repetitive_frac``
    is the share of scored docs compressing below the threshold.
    ``mode`` selects the per-document ratio (see
    :func:`with_compression_ratio`); pick the threshold per mode —
    zlib ratios sit lower than type-token ratios on the same text."""
    if mode == "zlib":
        ratio = compression_ratio_udf(level)(F.col(text_col))
    elif mode == "dictionary":
        ratio = dictionary_ratio_expr(F.col(text_col))
    else:
        raise ValueError(f"mode must be 'zlib' or 'dictionary', got {mode!r}")
    scored = df.select(F.col(group_col), ratio.alias("_r"))
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("_r").alias("n_scored"),
        F.round(F.avg("_r"), 6).alias("avg_ratio"),
        F.round(F.min("_r"), 6).alias("min_ratio"),
        F.round(
            F.count_if(F.col("_r") < repetitive_threshold).cast("double")
            / F.greatest(F.count("_r"), F.lit(1)).cast("double"),
            6,
        ).alias("repetitive_frac"),
    )
