"""PII detection and redaction for training-data pipelines.

Emails, IPv4 addresses, phone numbers, and SSN-shaped ids are matched
with regular expressions kept to constructs that Java regex (Spark) and
RE2 (DuckDB, Go scanners) parse identically — character classes,
bounded quantifiers, ``\\b`` word boundaries — so the same patterns run
in the lakehouse engine and in the oracle byte-for-byte. Everything is
pure Catalyst (``regexp_count`` / ``regexp_replace``): detection and
redaction are row-local projections with zero shuffles and zero UDFs,
so a 100 TB redaction pass is a single scan-rewrite at full
whole-stage-codegen speed.

This is an engine-level check in the same spirit as the contract
operators (reference semantics: a column-level predicate producing
violation rows + a verdict, cf. reference ``validation.py`` range/
category checks): texts containing PII are contract *violations* for a
"clean corpus" contract, and ``redact_pii`` is the remediation pass.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "PII_PLACEHOLDERS",
    "pii_count_expr",
    "detect_pii",
    "pii_by_group",
    "pii_documents",
    "redact_pii",
    "k_anonymity_report",
    "smallest_quasi_groups",
]

#: kind → regex. Deliberately conservative (precision over recall): each
#: pattern anchors on structure a random word stream cannot produce.
#: Order matters for redaction: emails first (an email contains dots
#: that the ipv4 pattern must not see first).
PII_PATTERNS: Dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}

PII_PLACEHOLDERS: Dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "phone": "<PHONE>",
    "ssn": "<SSN>",
}


def pii_count_expr(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII kind in a string column — ``regexp_count``
    (Spark ≥3.4 builtin, codegen'd; identical function exists in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def detect_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    keep: tuple = ("doc_id",),
    kinds: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Per-document PII hit counts, one column per kind plus ``pii_total``.

    A single row-local projection: the scan reads ``keep + [text_col]``
    only (column pruning holds), each pattern is one codegen'd
    ``regexp_count``, and no shuffle occurs — the shape that lets a
    100 TB corpus be screened at scan speed. Filter ``pii_total > 0``
    for the violation rows."""
    pats = dict(kinds) if kinds is not None else PII_PATTERNS
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{k}")
        for k, p in pats.items()
    ]
    out = df.select(*[F.col(c) for c in keep], *counts)
    total = None
    for k in pats:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total if total is not None else F.lit(0))


def pii_by_group(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    kinds: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Corpus PII health rolled up per group: documents affected and
    total hits per kind. One scan + one tiny hash aggregate on the
    group key — the per-kind counts ride the same partial-agg pass."""
    pats = dict(kinds) if kinds is not None else PII_PATTERNS
    per_doc = detect_pii(df, text_col=text_col, keep=(group_col,), kinds=pats)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    aggs.append(
        F.sum(F.when(F.col("pii_total") > 0, 1).otherwise(0)).alias("n_docs_with_pii")
    )
    for k in pats:
        aggs.append(F.sum(f"n_{k}").alias(f"total_{k}"))
    return per_doc.groupBy(group_col).agg(*aggs)


def pii_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    keep: tuple = ("doc_id",),
    kinds: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """The violation rows: documents containing any PII, with per-kind
    counts — feed to quarantine or to :func:`redact_pii`."""
    return detect_pii(df, text_col=text_col, keep=keep, kinds=kinds).filter(
        F.col("pii_total") > 0
    )


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: Optional[str] = None,
    kinds: Optional[Mapping[str, str]] = None,
    placeholders: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Replace every PII match with its kind's placeholder token.

    Chained ``regexp_replace`` in :data:`PII_PATTERNS` order (emails
    before ipv4 so the address's dotted domain is consumed as one email,
    not partially as an ip). Row-local, zero-shuffle: redacting a corpus
    is a map-only rewrite — at scale this is a read-transform-write with
    no exchange in the plan at all."""
    pats = dict(kinds) if kinds is not None else PII_PATTERNS
    ph = dict(PII_PLACEHOLDERS)
    ph.update(placeholders or {})
    expr: Column = F.col(text_col)
    for k, p in pats.items():
        expr = F.regexp_replace(expr, p, ph.get(k, f"<{k.upper()}>"))
    return df.withColumn(out_col or text_col, expr)


# -- k-anonymity (quasi-identifier re-identification risk) -------------------


def k_anonymity_report(
    df: DataFrame,
    quasi_cols,
    *,
    k: int = 5,
) -> DataFrame:
    """ONE-row k-anonymity census over a quasi-identifier tuple →
    (k, n_rows, n_groups, min_group_size, n_groups_below_k,
    n_rows_below_k, frac_rows_below_k).

    The privacy failure the regex screens can't see: no cell contains
    PII, yet the COMBINATION (zip, birth-year, device…) is unique enough
    to re-identify — a row is k-anonymous iff at least ``k`` rows share
    its quasi-identifier tuple (Sweeney 2002, public definition), so
    ``frac_rows_below_k`` is the released corpus's re-identification
    surface. NULL is a quasi-value like any other (an absent zip code
    narrows identity too).

    100 TB shape: groupBy(quasi tuple) with map-side combine — the
    exchange carries (tuple, partial-count); worst case (every row
    unique) that is the dedup-digest shuffle shape, ~the tuple bytes per
    row and nothing else. The census fold over the group-size frame is
    a second scalar aggregate to one row.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    quasi = [F.col(f"`{c}`") for c in quasi_cols]
    if not quasi:
        raise ValueError("quasi_cols must name at least one column")
    sizes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("group_size"))
    below = F.col("group_size") < F.lit(k)
    return sizes.agg(
        F.lit(k).alias("k"),
        F.sum("group_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.count_if(below).alias("n_groups_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("group_size"))), F.lit(0)).alias(
            "n_rows_below_k"
        ),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("group_size"))), F.lit(0))
            / F.sum("group_size"),
            6,
        ).alias("frac_rows_below_k"),
    )


def smallest_quasi_groups(
    df: DataFrame,
    quasi_cols,
    *,
    top_k: int = 10,
) -> DataFrame:
    """The witnesses: the ``top_k`` most identifying quasi-identifier
    tuples (smallest groups first) → quasi columns + group_size.

    Deterministic: ties break by the quasi values ascending (NULLs
    first, Spark's asc default), so the same witnesses surface on every
    run. orderBy().limit() plans TakeOrderedAndProject over the
    group-size frame — no full sort.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be > 0, got {top_k}")
    quasi = [F.col(f"`{c}`") for c in quasi_cols]
    if not quasi:
        raise ValueError("quasi_cols must name at least one column")
    sizes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("group_size"))
    return sizes.orderBy(
        F.asc("group_size"), *[F.asc_nulls_first(f"`{c}`") for c in quasi_cols]
    ).limit(top_k)
