"""Benchmark decontamination — train/test overlap detection for
training-data pipelines.

The standard method (Brown et al., "Language Models are Few-Shot
Learners", NeurIPS 2020, appendix C; Gao et al., "The Pile", 2020):
a training document is contaminated iff it shares at least one word
``n``-gram (n = 13 in both papers) with any benchmark document. This
module implements it Spark-first:

* both sides reduce to DISTINCT word n-grams — pure Catalyst
  (``transform`` over a token-index sequence + ``array_distinct``),
  hashed to 8-byte ``xxhash64`` values so the join never moves strings;
* the benchmark side is tiny relative to a 100 TB corpus, so the n-gram
  join is an explicit **broadcast** hash join: the corpus streams
  through scan-bound, nothing about the corpus is ever shuffled;
* overlap metrics (shared n-gram count, fraction of the benchmark doc
  covered) are one hash aggregation over the (vanishing) hit set.

``decontaminate`` then drops contaminated corpus rows with a broadcast
anti-join on the hit ids — the same zero-corpus-shuffle shape as
``deduplicate_exact``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams_expr",
    "contamination_pairs",
    "contaminated_ids",
    "decontaminate",
    "fuzzy_contamination_pairs",
    "fuzzy_contaminated_ids",
    "fuzzy_decontaminate",
]


def word_ngrams_expr(text_col: Column | str, *, n: int = 13) -> Column:
    """Distinct word ``n``-grams of a document (space-joined strings):
    the same expression tree as :func:`~.dedup.shingles_expr` (word
    shingles ARE word n-grams), re-exported under the decontamination
    vocabulary with the GPT-3/Pile default of n=13. Delegates rather
    than duplicates, so shingle-construction fixes apply everywhere."""
    from .dedup import shingles_expr

    return shingles_expr(text_col, size=n)


def _exploded_gram_hashes(
    df: DataFrame, *, text_col: str, id_col: str, n: int, out_id: str
) -> DataFrame:
    """(out_id, _g: bigint) — one row per distinct n-gram hash per doc.

    Two-step projection so the token array materializes once per row
    (the n-gram transform references it per position); the exploded
    values are 8-byte hashes, never the n-gram strings."""
    base = df.select(
        F.col(f"`{id_col}`").alias(out_id),
        word_ngrams_expr(text_col, n=n).alias("_grams"),
    )
    # explode_outer sidesteps the inferred size()>0 filter, which would
    # inline the n-gram build + hash transform below this projection and
    # evaluate it an extra time per row; docs shorter than n contribute a
    # null placeholder dropped by the cheap filter
    return base.select(
        out_id,
        F.explode_outer(
            F.transform("_grams", lambda g: F.xxhash64(g))
        ).alias("_g"),
    ).filter(F.col("_g").isNotNull())


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    min_shared: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, n_shared, bench_coverage) for every corpus
    document sharing ≥ ``min_shared`` word n-grams with a benchmark doc.

    ``bench_coverage`` = shared / benchmark-doc distinct n-grams — 1.0
    means the benchmark document appears wholesale in the training doc.

    Scale shape: the benchmark n-gram table (with per-doc totals riding
    along) is broadcast; the corpus side streams through one scan with
    no shuffle until the (tiny) hit set is aggregated. n-gram identity
    travels as xxhash64 longs (2^-64/pair collision odds — the accepted
    trade in every published decontamination pipeline, which hash
    n-grams too).
    """
    c = _exploded_gram_hashes(
        corpus, text_col=text_col, id_col=id_col, n=n, out_id="doc_id"
    )
    b = _exploded_gram_hashes(
        benchmark, text_col=bench_text_col, id_col=bench_id_col, n=n,
        out_id="bench_id",
    )
    # per-benchmark-doc distinct n-gram totals ride the broadcast side,
    # so coverage needs no second join against the benchmark
    b = b.withColumn(
        "_bench_total", F.count(F.lit(1)).over(Window.partitionBy("bench_id"))
    )
    hits = c.join(F.broadcast(b), on="_g")
    return (
        hits.groupBy("doc_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.round(
                F.count(F.lit(1)) / F.first("_bench_total"), 6
            ).alias("bench_coverage"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    **kwargs,
) -> DataFrame:
    """Distinct corpus ids contaminated by any benchmark doc."""
    return (
        contamination_pairs(corpus, benchmark, **kwargs)
        .select("doc_id")
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Corpus minus contaminated rows — broadcast anti-join on the (tiny)
    contaminated-id set; the corpus is never shuffled."""
    bad = contaminated_ids(corpus, benchmark, id_col=id_col, **kwargs)
    bad = bad.withColumnRenamed("doc_id", "_contaminated")
    return corpus.join(
        F.broadcast(bad),
        corpus[f"`{id_col}`"] == bad["_contaminated"],
        "left_anti",
    )


# -- fuzzy (MinHash) decontamination ------------------------------------------
#
# Exact n-gram overlap misses PARAPHRASED / lightly-edited leakage — a
# benchmark item whose whitespace, casing, or a few words were changed
# shares no 13-gram with its source yet is still contamination (the gap
# GPT-3's appendix C acknowledges and later pipelines — e.g. Llama/Dolma
# fuzzy decontamination — close with MinHash). The fuzzy path reuses the
# dedup module's banded-MinHash machinery BIPARTITELY: corpus band digests
# join benchmark band digests (broadcast — the benchmark is tiny), and
# only the surfaced candidates pay for an exact shingle-Jaccard verify.


def fuzzy_contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    shingle_size: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    seed: int = 42,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, bench_id, jaccard) for corpus docs near-duplicating a
    benchmark doc at exact shingle-Jaccard ≥ ``threshold``, surfaced by
    bipartite banded MinHash-LSH.

    Scale shape (unlike the self-join in
    :func:`~.dedup.minhash_lsh_candidates`, NO degenerate-bucket cap is
    needed): the candidate set is corpus × benchmark band collisions,
    structurally bounded by |corpus| × bands rows even if every corpus
    doc hits a boilerplate benchmark bucket — O(n), never O(n²). The
    benchmark band table broadcasts; the corpus streams through its
    signature pipeline scan-bound with no shuffle before the candidate
    distinct (|candidates| tiny tuples). The verify step prunes the
    corpus to candidate docs with a broadcast semi-join before computing
    shingle sets, so full text is re-read only for hits.

    Determinism: signatures are seeded xxhash64 — a pair is either
    surfaced or not, identically on every run/cluster size. Recall at
    the threshold boundary follows the banded-LSH S-curve
    (1-(1-j^r)^b); size bands for the j you must not miss.
    """
    from .dedup import minhash_band_digests, shingles_expr

    c_bands = minhash_band_digests(
        corpus,
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    ).withColumnRenamed("_id", "doc_id")
    b_bands = minhash_band_digests(
        benchmark,
        text_col=bench_text_col,
        id_col=bench_id_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    ).withColumnRenamed("_id", "bench_id")
    candidates = (
        c_bands.join(F.broadcast(b_bands), on=["band", "digest"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    # exact verify on candidates only: prune the corpus to hit docs first
    # (broadcast semi-join on the tiny candidate-id set), THEN shingle
    hit_ids = candidates.select(F.col("doc_id").alias("_hit")).distinct()
    c_sh = corpus.join(
        F.broadcast(hit_ids),
        corpus[f"`{id_col}`"] == F.col("_hit"),
        "left_semi",
    ).select(
        F.col(f"`{id_col}`").alias("doc_id"),
        shingles_expr(text_col, size=shingle_size).alias("_sh_c"),
    )
    b_sh = benchmark.select(
        F.col(f"`{bench_id_col}`").alias("bench_id"),
        shingles_expr(bench_text_col, size=shingle_size).alias("_sh_b"),
    )
    return (
        candidates.join(c_sh, "doc_id")
        .join(F.broadcast(b_sh), "bench_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_c", "_sh_b")).cast("double")
            / F.size(F.array_union("_sh_c", "_sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "bench_id", F.round("jaccard", 6).alias("jaccard"))
    )


def fuzzy_contaminated_ids(
    corpus: DataFrame, benchmark: DataFrame, **kwargs
) -> DataFrame:
    """Distinct corpus ids fuzzy-contaminated by any benchmark doc."""
    return (
        fuzzy_contamination_pairs(corpus, benchmark, **kwargs)
        .select("doc_id")
        .distinct()
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Corpus minus fuzzy-contaminated rows — the same zero-corpus-shuffle
    broadcast anti-join as :func:`decontaminate`."""
    bad = fuzzy_contaminated_ids(corpus, benchmark, id_col=id_col, **kwargs)
    bad = bad.withColumnRenamed("doc_id", "_contaminated")
    return corpus.join(
        F.broadcast(bad),
        corpus[f"`{id_col}`"] == bad["_contaminated"],
        "left_anti",
    )


# -- canary strings ------------------------------------------------------------


def _canary_struct_array(text: Column, canaries: list[str]) -> Column:
    """Per-row array of (canary, n_occurrences) structs, occurrences
    counted by the length-difference identity
    ``(len(t) − len(replace(t, c, ''))) / len(c)`` — pure Catalyst,
    renderable identically in ANSI SQL (which is what lets the DuckDB
    oracle verify the census value-for-value)."""
    entries = []
    for c in canaries:
        lit = F.lit(c)
        occ = (
            (F.length(text) - F.length(F.replace(text, lit, F.lit(""))))
            / F.length(lit)
        ).cast("bigint")
        entries.append(
            F.struct(F.lit(c).alias("canary"), F.coalesce(occ, F.lit(0)).alias("occ"))
        )
    return F.array(*entries)


def _check_canaries(canaries) -> list[str]:
    out = list(canaries)
    if not out:
        raise ValueError("canaries must be a non-empty list of strings")
    for c in out:
        if not isinstance(c, str) or c == "":
            raise ValueError(f"canaries must be non-empty strings, got {c!r}")
    if len(set(out)) != len(out):
        raise ValueError("canaries must be distinct")
    return out


def canary_rows(
    df: DataFrame,
    canaries,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, canary, n_occurrences) for every document containing a
    canary string — the per-row evidence behind :func:`canary_census`.

    Canary strings (Carlini et al., "The Secret Sharer", USENIX
    Security 2019; benchmark canary GUIDs à la BIG-bench) are planted
    unique markers whose presence in a training corpus PROVES the
    contaminated source leaked in. Matching is exact substring
    (case-sensitive, byte-for-byte — canaries are chosen to be
    collision-free, so no normalization is wanted).

    Scale shape: the canary list is a driver-side constant folded into
    a row-local projection — the corpus streams through one scan-bound
    filter+explode; nothing shuffles. Rows with NULL text match
    nothing. Cost grows linearly in |canaries| per row; for canary
    sets beyond a few thousand switch to the n-gram overlap operators.
    """
    canaries = _check_canaries(canaries)
    arr = _canary_struct_array(F.col(f"`{text_col}`"), canaries)
    hits = F.filter(arr, lambda s: s["occ"] > 0)
    return (
        df.select(F.col(f"`{id_col}`"), F.explode(hits).alias("_h"))
        .select(
            f"`{id_col}`",
            F.col("_h.canary").alias("canary"),
            F.col("_h.occ").alias("n_occurrences"),
        )
    )


def canary_census(
    df: DataFrame,
    canaries,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-canary leakage census: (canary, n_docs, n_occurrences),
    one row per canary INCLUDING zero-hit canaries — "this canary did
    not leak" is the result the audit exists to prove, so absence must
    be a row, not a missing row.

    Same single-scan shape as :func:`canary_rows`; the zero rows come
    from a left join FROM the driver-side canary frame against the
    broadcast per-canary aggregate (≤ |canaries| rows after its
    groupBy). Spark cannot broadcast the PRESERVED side of an outer
    join — a hint on the canary frame of a right-outer (or on the left
    of a left-outer) is silently dropped and a sort-merge join with two
    exchanges planned instead — so the hint goes on the aggregate,
    which is the build side of the left-outer.
    """
    canaries = _check_canaries(canaries)
    hits = canary_rows(
        df, canaries, text_col=text_col, id_col=id_col
    )
    agg = hits.groupBy("canary").agg(
        F.count(F.lit(1)).alias("_nd"), F.sum("n_occurrences").alias("_no")
    )
    spark = df.sparkSession
    all_c = spark.createDataFrame([(c,) for c in canaries], "canary string")
    return (
        all_c.join(F.broadcast(agg), "canary", "left")
        .select(
            "canary",
            F.coalesce(F.col("_nd"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("_no"), F.lit(0)).alias("n_occurrences"),
        )
    )
