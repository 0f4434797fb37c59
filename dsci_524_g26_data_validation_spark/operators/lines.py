"""Line-level boilerplate detection and stripping.

The corpus-cleaning step between document-level dedup and model
training: web text carries lines repeated across thousands of pages
(cookie banners, nav menus, share buttons, license footers) that
document-level near-dedup can never remove — the surrounding prose
differs, so the documents aren't duplicates, but the lines are. CCNet
(Wenzek et al., LREC 2020) and RefinedWeb (Penedo et al., NeurIPS 2023)
both strip lines/paragraphs by corpus frequency before training; this
module is that operator, Spark-first.

Scale design — document text NEVER moves through an exchange:

1. *Census*: explode each document into (doc_id, pos, line_digest)
   tuples — ~24 B/row through the one groupBy shuffle; the digest is
   128-bit (two xxhash64 seeds, the ``rowdiff`` argument: at 10^12
   lines a 64-bit space is birthday-saturated, and a collision here
   would delete an innocent line from someone's training set).
   Document frequency = count of DISTINCT docs per digest (a line
   pasted 50× into one page is not boilerplate), map-side combined.
2. *Frequent set*: digests with doc-frequency ≥ threshold. By
   construction it is small — at min_doc_frac f there can be at most
   lines_per_doc/f distinct frequent lines — so Spark broadcasts it.
3. *Drop lists*: the exploded tuples that hit the frequent set,
   re-grouped to one ``(doc_id, sorted drop positions)`` row per
   AFFECTED document. Only boilerplate OCCURRENCES shuffle here.
4. *Rebuild*: one row-local projection — re-split the text, drop the
   listed positions with an index-aware ``filter`` lambda, re-join.
   The corpus-side join against the drop lists is id-keyed and the
   drop-list side holds only affected docs.

Compare the naive shape (explode → anti-join → groupBy(doc).
collect_list(line)): it rebuilds every document by shuffling the FULL
corpus text twice. This design shuffles fixed-width digests and the
(small) drop lists only.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "lines_expr",
    "line_frequency",
    "frequent_lines",
    "strip_frequent_lines",
    "line_strip_report",
]

#: Line-digest seeds — two independent xxhash64 passes = 128 effective
#: bits (same construction and rationale as rowdiff.row_digest).
_SEED_A = 0x51_1E
_SEED_B = 0xB0_17


def lines_expr(text_col: Column | str, *, sep: str = "\n") -> Column:
    """Document → array of lines. Pure split; empty documents yield
    [''] (one empty line), mirroring every line-based cleaner."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, F.lit(sep).cast("string"), -1)


def _digest_cols(line: Column) -> list[Column]:
    return [
        F.xxhash64(line, F.lit(_SEED_A)).alias("_ha"),
        F.xxhash64(line, F.lit(_SEED_B)).alias("_hb"),
    ]


def _exploded(
    df: DataFrame, *, text_col: str, id_col: str, sep: str
) -> DataFrame:
    """(doc_id, pos, _ha, _hb) — one row per line occurrence. pos is
    0-based to match the rebuild lambda's filter index."""
    # posexplode_OUTER: a plain posexplode gets an inferred size()>0
    # filter pushed below this projection with the split inlined (one
    # extra split per row); outer generates skip the rule. The null
    # placeholder (NULL text rows) is dropped by the cheap filter.
    return (
        df.select(
            F.col(f"`{id_col}`").alias("_doc"),
            F.posexplode_outer(lines_expr(text_col, sep=sep)).alias(
                "_pos", "_line"
            ),
        )
        .filter(F.col("_line").isNotNull())
        .select("_doc", "_pos", *_digest_cols(F.col("_line")))
    )


def line_frequency(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
    k: int = 100,
) -> DataFrame:
    """Top-``k`` lines by DOCUMENT frequency → (line, n_docs, n_occurrences).

    The census view of the corpus' repeated lines (what WOULD be
    stripped at a given threshold). Doc frequency counts distinct
    documents (within-doc repeats collapse); n_occurrences counts every
    appearance. The line text itself is recovered by joining one
    exemplar occurrence back — only the top-k digests' text is ever
    fetched, via a broadcast semi-join, so the heavy census runs on
    digests alone.
    """
    ex = _exploded(df, text_col=text_col, id_col=id_col, sep=sep)
    counts = (
        ex.groupBy("_ha", "_hb")
        .agg(
            F.count_distinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= int(min_docs))
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("_ha"))
        .limit(int(k))
    )
    # fetch one exemplar line text per surviving digest (top-k rows →
    # broadcast); min(line) is deterministic under 128-bit uniqueness
    exemplar = (
        df.select(
            F.explode_outer(lines_expr(text_col, sep=sep)).alias("_line")
        )
        .filter(F.col("_line").isNotNull())
        .select("_line", *_digest_cols(F.col("_line")))
        .join(F.broadcast(counts), ["_ha", "_hb"])
        .groupBy("_ha", "_hb", "n_docs", "n_occurrences")
        .agg(F.min("_line").alias("line"))
    )
    return exemplar.select(
        "line", "n_docs", "n_occurrences"
    ).orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("line"))


def frequent_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: Optional[int] = None,
    min_doc_frac: Optional[float] = 0.01,
) -> DataFrame:
    """Digest set of boilerplate lines: document frequency ≥ threshold.

    Threshold = ``min_docs`` if given, else ``ceil(min_doc_frac · N)``
    where N is the corpus document count (computed as a 1-row agg and
    joined in as a scalar — no driver round-trip, the whole thing stays
    one lazy plan). Returns (_ha, _hb, n_docs) — intentionally
    digest-only (the strip path never needs the text); use
    :func:`line_frequency` for the human-readable census.
    """
    if min_docs is None and min_doc_frac is None:
        raise ValueError("one of min_docs / min_doc_frac is required")
    ex = _exploded(df, text_col=text_col, id_col=id_col, sep=sep)
    counts = ex.groupBy("_ha", "_hb").agg(
        F.count_distinct("_doc").alias("n_docs")
    )
    if min_docs is not None:
        return counts.filter(F.col("n_docs") >= int(min_docs))
    total = df.select(
        F.count(F.lit(1)).alias("_n_corpus")
    )
    return (
        counts.join(F.broadcast(total))
        .filter(
            F.col("n_docs")
            >= F.ceil(F.col("_n_corpus") * F.lit(float(min_doc_frac)))
        )
        .select("_ha", "_hb", "n_docs")
    )


def strip_frequent_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: Optional[int] = None,
    min_doc_frac: Optional[float] = 0.01,
    min_line_chars: int = 1,
    out_col: Optional[str] = None,
    dropped_col: Optional[str] = "n_lines_dropped",
) -> DataFrame:
    """Remove corpus-frequent lines from every document.

    Returns ``df`` with ``text_col`` rewritten (or ``out_col`` added)
    and, when ``dropped_col`` is set, a per-row count of removed lines.
    Requires ``id_col`` to be unique + non-null (the same precondition
    as deduplicate_exact, and checkable with the same operators).

    ``min_line_chars``: lines shorter than this never strip, even when
    frequent — single-token lines ("Yes", "1.", "---") are frequent in
    ANY corpus and are content, not boilerplate; CCNet applies the same
    guard. The default of 1 exists to protect the EMPTY line: '' is a
    paragraph separator present in ~every multi-paragraph document, so
    a 0 default would silently collapse paragraph structure corpus-wide
    the moment blank lines cross the frequency threshold. It is enforced once, when building the drop lists — the
    rebuild lambda only consults positions, so it cannot disagree.

    Plan shape: digests-only census → broadcast frequent set → drop
    lists for affected docs only → ONE id-keyed left join against the
    corpus → row-local rebuild (index-aware ``filter`` + ``array_join``;
    untouched docs keep their original string object, no re-split cost
    on the common path).
    """
    strip_len_ok = F.length(F.col("_line")) >= int(min_line_chars)
    freq = frequent_lines(
        df,
        text_col=text_col,
        id_col=id_col,
        sep=sep,
        min_docs=min_docs,
        min_doc_frac=min_doc_frac,
    ).select("_ha", "_hb")
    occ = (
        df.select(
            F.col(f"`{id_col}`").alias("_doc"),
            F.posexplode_outer(lines_expr(text_col, sep=sep)).alias(
                "_pos", "_line"
            ),
        )
        .filter(strip_len_ok)  # NULL _line fails the length bound too
        .select("_doc", "_pos", *_digest_cols(F.col("_line")))
    )
    drops = (
        occ.join(F.broadcast(freq), ["_ha", "_hb"])
        .groupBy("_doc")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_drop_pos"))
    )
    out_name = out_col or text_col
    joined = df.join(
        drops, df[f"`{id_col}`"] == drops["_doc"], "left"
    ).drop("_doc")
    rebuilt = F.array_join(
        F.filter(
            lines_expr(text_col, sep=sep),
            lambda line, i: ~F.array_contains(F.col("_drop_pos"), i),
        ),
        sep,
    )
    cols = [
        F.when(F.col("_drop_pos").isNull(), F.col(f"`{text_col}`"))
        .otherwise(rebuilt)
        .alias(out_name)
        if c == out_name
        else F.col(f"`{c}`")
        for c in df.columns
    ]
    if out_col is not None and out_col not in df.columns:
        cols.append(
            F.when(F.col("_drop_pos").isNull(), F.col(f"`{text_col}`"))
            .otherwise(rebuilt)
            .alias(out_col)
        )
    if dropped_col is not None:
        cols.append(
            F.coalesce(F.size("_drop_pos"), F.lit(0)).alias(dropped_col)
        )
    return joined.select(*cols)


def line_strip_report(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: Optional[str] = None,
    sep: str = "\n",
    min_docs: Optional[int] = None,
    min_doc_frac: Optional[float] = 0.01,
    min_line_chars: int = 1,
) -> DataFrame:
    """Aggregate before/after census of a strip run — the validation
    artifact: (group?, n_docs, n_docs_changed, n_lines_dropped,
    chars_before, chars_after). One strip plan + one agg; no text ever
    leaves the executors."""
    stripped = strip_frequent_lines(
        df,
        text_col=text_col,
        id_col=id_col,
        sep=sep,
        min_docs=min_docs,
        min_doc_frac=min_doc_frac,
        min_line_chars=min_line_chars,
        out_col="_clean",
        dropped_col="_n_dropped",
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("_n_dropped") > 0).alias("n_docs_changed"),
        F.sum("_n_dropped").alias("n_lines_dropped"),
        F.sum(F.length(f"`{text_col}`")).alias("chars_before"),
        F.sum(F.length("_clean")).alias("chars_after"),
    ]
    if group_col is None:
        return stripped.agg(*aggs)
    return stripped.groupBy(group_col).agg(*aggs)
