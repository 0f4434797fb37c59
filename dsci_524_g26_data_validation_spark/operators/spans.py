"""Token-level duplicate-span measurement (substring duplication).

Document-level dedup (``operators/dedup.py``) answers "which DOCUMENTS
are copies"; this module answers the finer question from Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499, public): how much of the corpus consists of token
SPANS that occur more than once — boilerplate headers, license blocks,
quoted passages — even when the containing documents are unique.

The reference approach (a corpus-wide suffix array) is a single-machine
design; the Spark-first shape here is a k-gram census:

* every length-``k`` token window becomes one 8-byte hash — the explode
  is row-local and feeds a map-side partial aggregation in the SAME
  stage, so what crosses the exchange is ``(group, gram_hash, count)``
  rows, never token payloads;
* duplication statistics derive from gram counts alone (a window over
  ``gram_hash`` on the count frame), so every post-explode shuffle is
  bounded by the number of DISTINCT grams, not corpus size;
* the 10^12-token path is content-defined sampling: keep only grams
  whose hash ≡ 0 (mod ``sample_mod``). Membership is a pure function of
  the gram's CONTENT, so both copies of a duplicated span sample
  identically — an unbiased 1/p estimate of the duplication rate with
  1/p of the shuffle. A duplicated span of length L ≥ k shares
  L−k+1 grams and is detected with probability 1 − (1−1/p)^(L−k+1).

Hash modes mirror :func:`operators.text.kgram_hashes_expr`:
``xxhash64`` (JVM hashes the int-array slice natively — the at-scale
default) and ``portable`` (top-60-bits-of-md5 of the space-joined gram,
renderable bit-for-bit by any engine with md5 — the oracle-checked
mode; see ``operators/sampling.py:portable_hash64``).

Token arrays must have non-NULL elements (the portable join would
silently skip them); run ``operators/structure.py`` screening first if
that is not guaranteed.

Reference parity note: the reference package (pyos_data_validation) has
no substring-level operator — this is a beyond-reference pipeline
component mandated by the task brief (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import portable_hash64

__all__ = [
    "token_kgram_hashes_expr",
    "token_kgram_occurrences",
    "span_duplication_census",
    "top_duplicate_spans",
]


def token_kgram_hashes_expr(
    tokens: Column | str, *, k: int = 25, hash_fn: str = "xxhash64"
) -> Column:
    """Array of (pos, gram_hash) structs — one per length-``k`` token
    window at every start position (1-based), empty for rows shorter
    than ``k``. Pure Catalyst (transform over a start-index sequence);
    O(n·k) row-local work, zero shuffle.

    The slice materializes inside the lambda only (k ints), so the plan
    stays a single whole-stage-codegen projection.
    """
    if hash_fn not in ("xxhash64", "portable"):
        raise ValueError(f"hash_fn must be 'xxhash64' or 'portable', got {hash_fn!r}")
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    if hash_fn == "xxhash64":
        gram_h = lambda s: F.xxhash64(s)  # noqa: E731 — array hashed natively
    else:
        gram_h = lambda s: portable_hash64(  # noqa: E731
            F.array_join(F.transform(s, lambda x: x.cast("string")), " ")
        )
    n = F.size(t)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.struct(
                i.alias("pos"), gram_h(F.slice(t, i, k)).alias("gram_hash")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram_hash:bigint>>"))


def token_kgram_occurrences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    keep: tuple = ("source",),
    k: int = 25,
    hash_fn: str = "xxhash64",
    sample_mod: int = 1,
) -> DataFrame:
    """One row per (sampled) k-gram occurrence:
    ``(keep…, id_col, pos, gram_hash)``.

    ``sample_mod=p`` keeps only grams with ``gram_hash % p == 0`` —
    content-defined, so identical spans in different rows keep or drop
    the SAME grams (position- and document-independent), which is what
    makes the sampled duplication rate unbiased. The filter runs before
    the explode leaves the row (inside the array), so dropped grams
    never become rows.
    """
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    grams = token_kgram_hashes_expr(tokens_col, k=k, hash_fn=hash_fn)
    if sample_mod > 1:
        grams = F.filter(
            grams, lambda g: F.pmod(g["gram_hash"], F.lit(sample_mod)) == 0
        )
    # projection barrier: materialize the struct array once, then
    # explode. explode_OUTER, deliberately: a plain explode triggers
    # InferFiltersFromGenerate, whose `size(_g) > 0` filter gets
    # predicate-pushed below this projection with the WHOLE gram
    # expression inlined — including the tokens column's own definition
    # re-evaluated inside the per-position slice lambda (measured: O(n²)
    # hash evaluations per row, 7× wall on synthesized-token inputs).
    # The rule skips outer generates; short rows' NULL placeholder is
    # dropped by a cheap post-generate filter on the generated column.
    base = df.select(*[F.col(c) for c in keep], F.col(id_col), grams.alias("_g"))
    return (
        base.select(*keep, id_col, F.explode_outer("_g").alias("_o"))
        .filter(F.col("_o").isNotNull())
        .select(
            *keep,
            id_col,
            F.col("_o.pos").alias("pos"),
            F.col("_o.gram_hash").alias("gram_hash"),
        )
    )


def span_duplication_census(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    k: int = 25,
    hash_fn: str = "xxhash64",
    sample_mod: int = 1,
) -> DataFrame:
    """Per-group substring-duplication census. One row per group:

    - ``n_occurrences``: (sampled) k-gram occurrences in the group;
    - ``n_distinct_grams``: distinct gram hashes in the group;
    - ``dup_occurrences``: occurrences whose gram appears ≥2 times
      CORPUS-WIDE (cross-group duplication counts — a span shared by
      two sources is duplication in both);
    - ``dup_frac``: dup_occurrences / n_occurrences — the headline
      "what fraction of the corpus is repeated text" number;
    - ``top_gram_count``: global occurrence count of the most frequent
      gram present in the group.

    Plan: row-local explode → partial-agg to ``(group, gram, count)``
    in the same stage → one window over ``gram_hash`` for global totals
    → one |groups|-row aggregate. Post-explode exchanges carry count
    rows only (~24 B per distinct (group, gram)); token arrays never
    cross an exchange.
    """
    occ = token_kgram_occurrences(
        df,
        id_col=id_col,
        tokens_col=tokens_col,
        keep=(group_col,),
        k=k,
        hash_fn=hash_fn,
        sample_mod=sample_mod,
    )
    cnt = occ.groupBy(group_col, "gram_hash").agg(F.count("*").alias("c"))
    # global total per gram: all rows of one gram_hash sit in one window
    # partition (≤ |groups| rows each) — one exchange of the count frame,
    # no per-gram join.
    w = Window.partitionBy("gram_hash")
    tot = cnt.withColumn("total", F.sum("c").over(w))
    dup_occ = F.coalesce(
        F.sum(F.when(F.col("total") >= 2, F.col("c"))), F.lit(0)
    ).cast("bigint")
    return (
        tot.groupBy(group_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_occurrences"),
            F.count("*").cast("bigint").alias("n_distinct_grams"),
            dup_occ.alias("dup_occurrences"),
            F.round(
                dup_occ.cast("double") / F.sum("c").cast("double"), 6
            ).alias("dup_frac"),
            F.max("total").cast("bigint").alias("top_gram_count"),
        )
    )


def top_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    k: int = 25,
    top_n: int = 20,
    hash_fn: str = "xxhash64",
    sample_mod: int = 1,
    min_count: int = 2,
) -> DataFrame:
    """The ``top_n`` most-duplicated k-grams with bounded witnesses:
    ``(gram_hash, n_occurrences, n_docs, example_doc_id, example_pos)``
    ordered by (n_occurrences DESC, gram_hash ASC) — deterministic
    under ties, so the LIMIT cut is engine-reproducible.

    Two-level aggregation: ``(gram, id)`` first (map-side combined, and
    the per-doc min position is resolved before the second shuffle), so
    the final per-gram aggregate sees ≤ n_docs rows per gram, never raw
    occurrences. The witness is the lexicographically first (doc, pos)
    — a min, never a collect_set, so memory per gram is O(1).
    """
    occ = token_kgram_occurrences(
        df,
        id_col=id_col,
        tokens_col=tokens_col,
        keep=(),
        k=k,
        hash_fn=hash_fn,
        sample_mod=sample_mod,
    )
    per_doc = occ.groupBy("gram_hash", id_col).agg(
        F.count("*").alias("c"), F.min("pos").alias("min_pos")
    )
    per_gram = per_doc.groupBy("gram_hash").agg(
        F.sum("c").cast("bigint").alias("n_occurrences"),
        F.count("*").cast("bigint").alias("n_docs"),
        F.min(F.struct(F.col(id_col), F.col("min_pos"))).alias("_w"),
    )
    return (
        per_gram.filter(F.col("n_occurrences") >= min_count)
        .select(
            "gram_hash",
            "n_occurrences",
            "n_docs",
            F.col(f"_w.{id_col}").alias("example_doc_id"),
            F.col("_w.min_pos").alias("example_pos"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("gram_hash"))
        .limit(top_n)
    )
