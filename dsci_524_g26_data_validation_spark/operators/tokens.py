"""E5/E6 — token-array invariants on the pre-tokenized sequence table.

* E5 ``n_tok == size(tokens)``: pure Catalyst filter — no UDF, codegen
  applies, the parquet reader only decodes the two columns involved.
* E6 per-row token-array equality vs a reference table: join on
  ``doc_id`` then a **vectorized Arrow pandas UDF** (BASELINE.json:15
  mandates the Arrow/pandas-UDF form, no per-row Python). The UDF body
  works on flattened token buffers: per row it touches O(1) Python
  objects (length bookkeeping); all token comparisons are single numpy
  vector ops over the concatenated buffers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = [
    "ntok_invariant_violations",
    "vocab_violations",
    "arrays_equal_udf",
    "token_equality_violations",
    "token_equality_report",
    "key_integrity_counts",
    "tokenizer_efficiency_census",
]

#: Max candidate rows fetched for Arrow-UDF confirmation; above this the
#: (already exact) hash verdicts are returned directly.
VERIFY_CANDIDATE_CAP = 100_000


def ntok_invariant_violations(
    df: DataFrame, *, n_col: str = "n_tok", arr_col: str = "tokens"
) -> DataFrame:
    """Rows violating ``n_tok == size(tokens)`` (E5). Pure Catalyst.

    NULL-safe by construction: under ANSI semantics (the Spark 4
    default) ``size(NULL)`` is NULL, so a plain ``!=`` filter would
    silently PASS a corrupted NULL-token row (2 != NULL → NULL → row
    dropped). The null-safe comparison flags a NULL array against any
    non-NULL ``n_tok`` (and vice versa); a row where BOTH are NULL is
    internally consistent and belongs to the missingness check, not
    this invariant."""
    return df.filter(~F.col(n_col).eqNullSafe(F.size(F.col(arr_col))))


def vocab_violations(
    df: DataFrame,
    *,
    vocab_size: int,
    arr_col: str = "tokens",
    keep: tuple = ("doc_id",),
) -> DataFrame:
    """Rows whose token array leaves ``[0, vocab_size)`` — the vocabulary
    bounds invariant of a pre-tokenized sequence table (a token id at or
    beyond the embedding-table row count corrupts training silently).

    Pure Catalyst array HOFs (filter/size + array_min/max), row-local,
    zero shuffles: the corpus screens at scan speed and the parquet
    reader decodes only ``keep + [arr_col]``. Returns per-row diagnostic
    counts (``n_bad``, observed min/max token); a NULL array yields no
    row here — E5 (``ntok_invariant_violations``) owns NULL detection.
    """
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    arr = F.col(arr_col)
    bad = F.filter(arr, lambda t: (t < 0) | (t >= vocab_size))
    return (
        df.select(
            *[F.col(c) for c in keep],
            F.size(bad).alias("n_bad"),
            F.array_min(arr).alias("min_token"),
            F.array_max(arr).alias("max_token"),
        )
        .filter(F.col("n_bad") > 0)
    )


# type instance (not DDL string) so import needs no active SparkSession
@pandas_udf(BooleanType())
def arrays_equal_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized equality of two array<int> columns (Arrow batches).

    Token-level work is numpy-vectorized over the flattened buffers;
    Python-level work is one length lookup per row (not per token).
    NULL handling: both NULL → equal; one NULL → not equal.
    """
    n = len(a)
    null_a = a.isna().to_numpy()
    null_b = b.isna().to_numpy()
    out = np.zeros(n, dtype=bool)
    out[null_a & null_b] = True
    both = ~null_a & ~null_b
    if both.any():
        av = a[both].to_numpy()
        bv = b[both].to_numpy()
        la = np.fromiter((len(x) for x in av), dtype=np.int64, count=len(av))
        lb = np.fromiter((len(x) for x in bv), dtype=np.int64, count=len(bv))
        same_len = la == lb
        eq = same_len.copy()
        if same_len.any():
            lens = la[same_len]
            fa = np.concatenate([np.asarray(x) for x in av[same_len]] or [[]])
            fb = np.concatenate([np.asarray(x) for x in bv[same_len]] or [[]])
            bad = np.zeros(int(same_len.sum()), dtype=bool)
            if fa.size:
                diff = fa != fb
                starts = np.cumsum(lens) - lens
                nonzero = lens > 0  # zero-length rows compare equal
                if nonzero.any():
                    seg = np.add.reduceat(diff, starts[nonzero])
                    bad[nonzero] = seg > 0
            eq[same_len] = ~bad
        out[np.flatnonzero(both)] = eq
    return pd.Series(out)


def token_equality_violations(
    df: DataFrame,
    reference: DataFrame,
    *,
    key: str = "doc_id",
    arr_col: str = "tokens",
    verify_with_udf: bool = True,
    eager: bool = True,
    verify_candidate_cap: int | None = None,
) -> DataFrame:
    """Rows of ``df`` whose token array differs from ``reference``'s (E6).

    Scale-first two-phase design:

    1. **Hash pre-filter (pure Catalyst).** Each side is reduced to
       ``(key, xxhash64(tokens), size(tokens))`` inside the scan, so the
       equi-join on ``key`` shuffles ~24 bytes/row instead of whole token
       arrays (~1 KB/row at typical sequence lengths — a 40× shuffle
       reduction at 100 TB). A differing hash or length *proves* the
       arrays differ; equal hashes mean equal arrays up to a 2^-64
       collision.
    2. **Arrow-UDF confirmation on candidates only.** The (tiny)
       candidate key set is broadcast back against both tables to fetch
       the actual arrays; the vectorized ``arrays_equal_udf`` re-checks
       them batch-wise. The UDF therefore only ever sees the mismatch
       set, never the full table.

    Inner-join on the key (rows missing from the reference are the
    referential check's job, not this one). NULL-key rows never match and
    are dropped, same as before.

    Returns (key, n_tok_observed, n_tok_reference). **Execution
    contract** (explicit because it differs by mode — ADVICE r2):

    * ``eager=True`` (default): the candidate set and its Arrow-UDF
      confirmation execute AT CALL TIME (two bounded Spark jobs) and the
      returned DataFrame is backed by driver-local rows — later actions
      on it re-trigger nothing. If the candidate count exceeds
      ``verify_candidate_cap`` (default: module constant
      ``VERIFY_CANDIDATE_CAP``, 100k) the (already exact) hash verdicts
      are returned as a LAZY plan instead — a mass mismatch must not be
      collected to the driver. Callers that need a hard eager guarantee
      raise the cap explicitly; callers that must never collect pass
      ``eager=False``.
    * ``eager=False``: nothing executes; the returned DataFrame is a
      fully lazy distributed plan (hash pre-filter → array fetch →
      Arrow-UDF confirmation), for callers composing a larger plan who
      will pay the candidate-side join at action time.
    * ``verify_with_udf=False``: lazy hash-verdict plan only (exact for
      every reported row; misses only 2^-64 hash-collision false
      negatives).
    """
    k, arr = f"`{key}`", f"`{arr_col}`"
    left = df.select(
        F.col(k).alias("_k"),
        F.xxhash64(F.col(arr)).alias("_h_obs"),
        F.size(F.col(arr)).alias("n_tok_observed"),
    )
    right = reference.select(
        F.col(k).alias("_k"),
        F.xxhash64(F.col(arr)).alias("_h_ref"),
        F.size(F.col(arr)).alias("n_tok_reference"),
    )
    cand = (
        left.join(right, on="_k", how="inner")
        .filter(
            (F.col("_h_obs") != F.col("_h_ref"))
            | (F.col("n_tok_observed") != F.col("n_tok_reference"))
        )
        .select(F.col("_k"), "n_tok_observed", "n_tok_reference")
    )
    cand = cand.withColumnRenamed("_k", key)
    if not verify_with_udf:
        return cand

    if not eager:
        # fully lazy distributed confirmation: join the token arrays of
        # BOTH sides back to the candidate keys (AQE broadcasts the tiny
        # candidate side, so the big tables stream through scan-bound)
        # and re-check with the vectorized UDF. No collect, no driver
        # round-trip — the whole thing is one composable plan.
        obs = df.select(F.col(k).alias("_ok"), F.col(arr).alias("_obs_tokens"))
        ref = reference.select(
            F.col(k).alias("_rk"), F.col(arr).alias("_ref_tokens")
        )
        return (
            cand.join(obs, cand[f"`{key}`"] == obs["_ok"])
            .join(ref, cand[f"`{key}`"] == ref["_rk"])
            .filter(
                ~arrays_equal_udf(F.col("_obs_tokens"), F.col("_ref_tokens"))
            )
            .select(F.col(f"`{key}`"), "n_tok_observed", "n_tok_reference")
        )

    # Phase 2: the candidate key set is tiny in practice (it IS the
    # violation set — a differing hash proves the arrays differ; the only
    # hash error mode is a 2^-64 false NEGATIVE). Collect it to the
    # driver ONCE (so phase 1 executes exactly once), ship it back as a
    # small DataFrame (Arrow — py4j literal lists are ruinously slow at
    # >10^3 elements), and broadcast-semi-join both tables: pruned
    # (key, tokens) reads, zero array shuffle. If a mass mismatch
    # overflows the cap, the hash verdicts are returned as-is (still
    # exact for every reported row).
    cap = (
        VERIFY_CANDIDATE_CAP
        if verify_candidate_cap is None
        else verify_candidate_cap
    )
    cand_local = cand.limit(cap + 1).collect()
    if len(cand_local) > cap:
        return cand
    spark = df.sparkSession
    key_type = df.select(F.col(k)).schema.fields[0].dataType
    if not cand_local:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(key, key_type),
                    T.StructField("n_tok_observed", T.IntegerType()),
                    T.StructField("n_tok_reference", T.IntegerType()),
                ]
            ),
        )
    keys_df = spark.createDataFrame(
        [(r[key],) for r in cand_local],
        T.StructType([T.StructField("_ck", key_type)]),
    )
    obs = df.join(
        F.broadcast(keys_df), on=df[k] == F.col("_ck"), how="left_semi"
    ).select(F.col(k).alias("_k"), F.col(arr).alias("_obs_tokens"))
    ref = reference.join(
        F.broadcast(keys_df), on=reference[k] == F.col("_ck"), how="left_semi"
    ).select(F.col(k).alias("_k"), F.col(arr).alias("_ref_tokens"))
    # The confirmation runs EAGERLY and the result is rebuilt from the
    # already-collected candidate rows: phase 1 and the pruned array
    # fetch each execute exactly once, and downstream actions on the
    # returned (tiny, local-backed) DataFrame re-trigger nothing.
    confirmed_rows = (
        obs.join(ref, on="_k", how="inner")
        .withColumn(
            "_eq", arrays_equal_udf(F.col("_obs_tokens"), F.col("_ref_tokens"))
        )
        .filter(~F.col("_eq"))
        .select("_k")
        .collect()
    )
    confirmed = {r["_k"] for r in confirmed_rows}
    out_schema = T.StructType(
        [
            T.StructField(key, key_type),
            T.StructField("n_tok_observed", T.IntegerType()),
            T.StructField("n_tok_reference", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [r for r in cand_local if r[key] in confirmed], out_schema
    )


def key_integrity_counts(
    df: DataFrame,
    reference: DataFrame,
    *,
    key: str = "doc_id",
    arr_col: str = "tokens",
) -> dict:
    """E1 uniqueness + E6 token-equality summary in ONE shuffled job.

    Both checks need the table keyed by ``key``; paying that shuffle once
    is the scale play. Each side reduces to ``(key, xxhash64(tokens))``
    in its scan; the union is hash-aggregated twice:

      stage 1  groupBy(key, hash) — map-side partial agg collapses
               duplicates before the only real shuffle (~24 B/row);
               reducer groups are per (key,hash): bounded under key skew.
      stage 2  groupBy(key)       — per-key row counts per side + the
               count of hash values present on exactly one side
               (distinct-set difference), tiny input.
      stage 3  global agg         — duplicate keys, surplus rows,
               mismatched keys; one row to the driver.

    Token equality is judged on DISTINCT 64-bit token-hash sets per key
    (a hash differing proves arrays differ; equal sets are equal up to
    2^-64/row collisions) for keys present in BOTH tables. NULL keys
    group like SQL GROUP BY (they count for uniqueness; for equality a
    NULL key never matches, like the join formulation).

    Returns {dup_keys, surplus_rows, eq_bad_keys, n_obs_rows, n_ref_rows}.
    """
    k, arr = f"`{key}`", f"`{arr_col}`"
    u = df.select(
        F.col(k).alias("_k"),
        F.xxhash64(F.col(arr)).alias("_h"),
        F.lit(1).alias("_s"),
    ).unionByName(
        reference.select(
            F.col(k).alias("_k"),
            F.xxhash64(F.col(arr)).alias("_h"),
            F.lit(0).alias("_s"),
        )
    )
    per_hash = u.groupBy("_k", "_h").agg(
        F.count_if(F.col("_s") == 1).alias("n1"),
        F.count_if(F.col("_s") == 0).alias("n0"),
    )
    per_key = per_hash.groupBy("_k").agg(
        F.sum("n1").alias("n_obs"),
        F.sum("n0").alias("n_ref"),
        F.count_if(
            ((F.col("n1") > 0) & (F.col("n0") == 0))
            | ((F.col("n0") > 0) & (F.col("n1") == 0))
        ).alias("set_diff"),
    )
    row = per_key.agg(
        F.count_if(F.col("n_obs") > 1).alias("dup_keys"),
        F.coalesce(
            F.sum(F.when(F.col("n_obs") > 1, F.col("n_obs") - 1)), F.lit(0)
        ).alias("surplus_rows"),
        F.count_if(
            (F.col("n_obs") > 0)
            & (F.col("n_ref") > 0)
            & (F.col("set_diff") > 0)
            & F.col("_k").isNotNull()
        ).alias("eq_bad_keys"),
        F.sum("n_obs").alias("n_obs_rows"),
        F.sum("n_ref").alias("n_ref_rows"),
    ).collect()[0]
    return {n: int(row[n] or 0) for n in row.asDict()}


def token_equality_report(
    df: DataFrame, reference: DataFrame, *, key: str = "doc_id", arr_col: str = "tokens"
) -> dict:
    """Driver-side scalar summary for the Issue payload."""
    n_bad = token_equality_violations(df, reference, key=key, arr_col=arr_col).count()
    return {"mismatched_rows": int(n_bad)}


def tokenizer_efficiency_census(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer-fit census for a (text, tokens) sequence table — the
    budget question behind every mixture plan: how many TOKENS does a
    slice cost per unit of text? A tokenizer trained on English spends
    3-5× more tokens per word on code, non-Latin scripts, or noisy
    text (high "fertility"); a slice whose fertility spikes is either
    out-of-domain for the tokenizer or corrupt, and its share of the
    token budget silently exceeds its share of the corpus.

    Per group → (group, n_seqs, total_tokens, total_words, total_chars,
    fertility = tokens/word, chars_per_token), corpus-weighted (sums
    ride one fused agg; ratios computed from the sums, so long docs
    weigh in proportion to their text). NULL text/tokens rows count
    toward n_seqs but contribute nothing to the sums — missingness is
    its own check. Words are whitespace tokens of the trimmed text
    (empty text = 0 words, never 1).

    100 TB shape: pure Catalyst row-local terms (size/length/split)
    fused into ONE scan + a |groups|-row exchange; the token ARRAY
    never moves — only its size does.
    """
    toks = F.col(tokens_col)
    txt = F.col(text_col)
    words = F.when(
        txt.isNotNull() & (F.trim(txt) != F.lit("")),
        F.size(F.split(F.trim(txt), "\\s+")),
    ).otherwise(F.lit(0))
    n_tok = F.when(toks.isNotNull(), F.size(toks)).otherwise(F.lit(0))
    n_chars = F.when(txt.isNotNull(), F.length(txt)).otherwise(F.lit(0))
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        F.sum(words).cast("bigint").alias("total_words"),
        F.sum(n_chars).cast("bigint").alias("total_chars"),
    )
    return agg.select(
        "group",
        "n_seqs",
        "total_tokens",
        "total_words",
        "total_chars",
        F.round(
            F.when(
                F.col("total_words") > 0,
                F.col("total_tokens") / F.col("total_words"),
            ),
            6,
        ).alias("fertility"),
        F.round(
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_chars") / F.col("total_tokens"),
            ),
            6,
        ).alias("chars_per_token"),
    )
