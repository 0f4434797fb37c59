"""Salient-term extraction (presence TF-IDF) per corpus slice.

`text.top_tokens` answers "what is FREQUENT in this source" — which is
dominated by stopwords everywhere. The curation question is "what is
DISTINCTIVE about this source" (the template artifact, the domain
jargon, the language mix), and that needs rarity weighting:

    score(term, g) = (df_g / n_g) · (ln((N + 1) / (df_t + 1)) + 1)

where ``df_g`` = docs in group g containing the term, ``n_g`` = docs in
g, ``df_t`` = docs anywhere containing it, ``N`` = all docs — i.e. the
share of the group's documents carrying the term, weighted by
sklearn-style smoothed IDF (presence-based tf, the classic
characteristic-terms formulation; add-1 smoothing keeps corpus-wide
terms finite and new terms bounded).

100 TB shape: ONE corpus scan. A tagged-struct explode (the
`operators.lm` trick) emits one doc marker plus each DISTINCT term per
row, so the same map-side-combined aggregate yields both per-group doc
counts and per-(group, term) doc frequencies — the exchange carries
(group, term, partial-count) tuples, never token occurrences. That
aggregate is materialized eagerly (``localCheckpoint``, the
json_profile/skew-report pattern) because FOUR derivations read it —
without it Spark re-runs the corpus scan per branch; it is vocab ×
groups rows, bounded regardless of corpus size. The corpus-wide
``df_t``/``N`` frames then derive from the checkpointed frame, joined
back term-to-term; the final top-k window runs per group over the
(groups × vocab) score frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_expr

__all__ = ["salient_terms"]


def salient_terms(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 10,
    min_df: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``top_k`` characteristic terms per group →
    (group, term, df_group, n_docs_group, df_total, score, rank).

    ``min_df`` drops terms seen in fewer than that many docs corpus-wide
    (hapaxes are "distinctive" for free and pure noise). NULL/empty
    texts count as documents (they carry the doc marker) but contribute
    no terms; empty-string tokens from repeated separators are excluded.
    Deterministic: ties break by term ascending.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be > 0, got {top_k}")
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")

    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    # one marker struct per doc + one struct per DISTINCT non-empty term;
    # coalesce keeps NULL-text docs in the denominator
    tagged = F.concat(
        F.array(F.struct(F.lit(True).alias("is_doc"), F.lit("").alias("term"))),
        F.transform(
            F.filter(
                F.array_distinct(F.coalesce(toks, F.array())),
                lambda t: t.isNotNull() & (t != F.lit("")),
            ),
            lambda t: F.struct(F.lit(False).alias("is_doc"), t.alias("term")),
        ),
    )
    # the four derivations below (doc counts, group dfs, corpus dfs, N)
    # all read this aggregate; materialize it ONCE (localCheckpoint, the
    # json_profile/skew-report pattern) so the corpus is scanned exactly
    # once — the frame is vocab x groups, bounded regardless of corpus
    counts = (
        df.select(F.col(f"`{group_col}`").alias("group"), F.explode(tagged).alias("e"))
        .select("group", "e.is_doc", "e.term")
        .groupBy("group", "is_doc", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    ).localCheckpoint()
    # doc counts: |groups| rows; term doc-frequencies: groups x vocab
    docs = counts.filter("is_doc").select(
        "group", F.col("n").alias("n_docs_group")
    )
    dfg = counts.filter("NOT is_doc").select(
        "group", "term", F.col("n").alias("df_group")
    )
    totals = dfg.groupBy("term").agg(F.sum("df_group").alias("df_total"))
    n_total = docs.agg(F.sum("n_docs_group").alias("n_docs_total"))

    idf = (
        F.log(
            (F.col("n_docs_total") + F.lit(1.0))
            / (F.col("df_total") + F.lit(1.0))
        )
        + F.lit(1.0)
    )
    scored = (
        dfg.join(totals, "term")
        .filter(F.col("df_total") >= F.lit(min_df))
        .join(docs, "group")
        .crossJoin(F.broadcast(n_total))
        .select(
            "group",
            "term",
            "df_group",
            "n_docs_group",
            "df_total",
            F.round(
                F.col("df_group") / F.col("n_docs_group") * idf, 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("group").orderBy(F.desc("score"), F.asc("term"))
    return scored.select(
        "*", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= top_k)
