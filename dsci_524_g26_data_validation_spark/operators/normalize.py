"""Unicode text normalization for training corpora.

The silent corpus splitter: ``café`` appears in crawls both as the
precomposed U+00E9 and as ``e`` + combining U+0301 — byte-different,
render-identical. Exact dedup, shingle hashing, token counting and
vocabulary checks all treat the two as different text, so normalization
must run BEFORE any hash-based operator or the pipeline silently
under-deduplicates. This module provides the standard pass (NFC +
control stripping + whitespace collapse) and the census that says how
much of a corpus it touches.

Execution split, chosen per step by where it can run fastest:

* **NFC** has no Catalyst builtin → a vectorized Arrow ``pandas_udf``
  over ``Series.str.normalize`` (pandas dispatches to the C
  ``unicodedata`` implementation; the batch crosses once over Arrow —
  never per-row Python).
* **Control stripping / whitespace collapse** are single
  ``regexp_replace`` projections — pure codegen, zero UDF cost. The
  character classes are spelled explicitly (``[ \\t\\r\\n\\x0B\\f]``
  rather than ``\\s``) so Java regex and RE2/DuckDB agree byte-for-byte
  and the oracle can replay them.

100 TB shape: the whole pass is row-local (one scan-rewrite, no
shuffle, no state). The census aggregates |groups| rows. NFC is the
only step that leaves the JVM; docs that are pure ASCII are skipped
JVM-side by a cheap ``rlike`` pre-filter so the Arrow hop pays only for
rows that can possibly change (most web text is ASCII-heavy).

Cross-engine verification: DuckDB ships ``nfc_normalize`` (utf8proc);
Unicode normalization is a spec, so Python's unicodedata and utf8proc
produce identical NFC for identical input — which makes even the UDF
step value-checkable by the SQL oracle, the same trick
``multimodal.media_table(hash_fn='portable')`` uses.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "CONTROL_CHAR_PATTERN",
    "WHITESPACE_PATTERN",
    "nfc_udf",
    "strip_controls_expr",
    "collapse_whitespace_expr",
    "normalize_text",
    "normalization_census",
]

#: C0 controls and DEL, EXCLUDING tab/newline/carriage-return (those are
#: whitespace — the collapse step owns them).
CONTROL_CHAR_PATTERN = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"

#: Explicit whitespace run (no ``\\s`` — engine-identical by spelling).
WHITESPACE_PATTERN = "[ \\t\\r\\n\\x0B\\f]+"

#: Rows that can't change under NFC: pure-ASCII text (NFC is identity on
#: ASCII). Checked JVM-side so the Arrow hop skips them.
_NON_ASCII = "[^\\x00-\\x7F]"


@pandas_udf(StringType())
def nfc_udf(texts: pd.Series) -> pd.Series:
    """NFC normalization, Arrow-batched (NULLs pass through)."""
    return texts.str.normalize("NFC")


def strip_controls_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, CONTROL_CHAR_PATTERN, "")


def collapse_whitespace_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, WHITESPACE_PATTERN, " "))


def normalize_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: Optional[str] = None,
    nfc: bool = True,
    strip_controls: bool = True,
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Normalized text column (in place by default, or as ``out_col``).

    Step order is load-bearing: NFC first (composition can produce
    characters the later regexes must see in final form), then control
    stripping, then whitespace collapse + trim. The NFC hop runs only
    on rows containing non-ASCII (identity otherwise, skipped by a
    codegen ``rlike`` guard)."""
    out = out_col or text_col
    c: Column = F.col(text_col)
    if nfc:
        c = F.when(c.rlike(_NON_ASCII), nfc_udf(c)).otherwise(c)
    if strip_controls:
        c = strip_controls_expr(c)
    if collapse_whitespace:
        c = collapse_whitespace_expr(c)
    return df.withColumn(out, c)


def normalization_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: Optional[str] = None,
) -> DataFrame:
    """How much would normalization change this corpus? Per group:
    rows touched by each step (independently measured against the raw
    text), rows changed by the full pass, and the char-count delta.

    One scan: the normalized variants are materialized behind a
    projection barrier (each is referenced by several aggregates — the
    same CollapseProject-barrier discipline as ``text.quality_by_source``)
    and the census is |groups| rows out of one hash aggregate."""
    keys = [group_col] if group_col else []
    raw = F.col(text_col)
    base = df.select(
        *keys,
        raw.alias("_raw"),
        F.when(raw.rlike(_NON_ASCII), nfc_udf(raw)).otherwise(raw).alias("_nfc"),
    )
    staged = base.select(
        *keys,
        "_raw",
        "_nfc",
        collapse_whitespace_expr(strip_controls_expr(F.col("_nfc"))).alias("_full"),
    )
    grouped = staged.groupBy(*keys) if keys else staged.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("_nfc") != F.col("_raw")).alias("n_nfc_changed"),
        F.count_if(
            F.regexp_count(F.col("_raw"), F.lit(CONTROL_CHAR_PATTERN)) > 0
        ).alias("n_with_controls"),
        F.count_if(
            collapse_whitespace_expr("_raw") != F.col("_raw")
        ).alias("n_ws_changed"),
        F.count_if(F.col("_full") != F.col("_raw")).alias("n_changed"),
        F.sum(F.length("_raw")).cast("bigint").alias("chars_before"),
        F.sum(F.length("_full")).cast("bigint").alias("chars_after"),
    )
