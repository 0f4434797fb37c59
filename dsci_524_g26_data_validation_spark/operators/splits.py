"""Train/val/test split assignment + cross-split leakage audit.

The evaluation-integrity gap the dedup and decontamination operators
leave open: a corpus can be perfectly deduplicated against external
benchmarks and still leak INTERNALLY — the same (or near-same) document
landing in both train and validation silently inflates every eval
number computed on that split. Two operators close it:

* :func:`assign_splits` — the split itself, as a reproducible operator:
  membership is a pure function of ``(salt, md5(id))`` (the
  `portable_hash64` convention shared with `operators.sampling`), so
  the SAME document lands in the SAME split on every engine, every run,
  every resume, at every cluster size — unlike `randomSplit`, whose
  assignment depends on seed AND partitioning. Cumulative bucket
  ranges over ``hash mod 1e6`` in declaration order; the last split
  absorbs the rounding remainder so every row is assigned.
* :func:`split_leakage` — exact-content leakage across the assigned
  splits: md5 content digests grouped, flagged when one digest spans
  ≥2 splits. (Near-duplicate leakage composes from the existing
  machinery: run `dedup.near_duplicate_pairs` and join each side's
  split — pairs with differing splits are fuzzy leaks.)

100 TB shape: assignment is a row-local CASE over the hash — no
shuffle, no state, pushes nothing but the id column into the scan.
Leakage groups by a 16-byte digest with map-side combine, so the
exchange carries (digest, split, id)-sized rows — document text never
moves; the ≥2-splits filter runs on the |distinct contents| frame.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _BUCKETS, portable_hash64

__all__ = ["assign_splits", "split_census", "split_leakage"]


def _split_expr(
    splits: Dict[str, float], *, id_col: str, salt: str
) -> Column:
    """Row-local CASE assigning a split name from the id hash."""
    if not splits:
        raise ValueError("splits must declare at least one split")
    total = 0.0
    for name, w in splits.items():
        if not isinstance(name, str) or not name:
            raise ValueError(f"split name must be a non-empty string: {name!r}")
        if not float(w) > 0.0:
            raise ValueError(f"weight for {name!r} must be > 0, got {w}")
        total += float(w)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")

    bucket = F.pmod(
        portable_hash64(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(f"`{id_col}`").cast("string"), F.lit("")),
            )
        ),
        F.lit(_BUCKETS),
    )
    names = list(splits)
    expr = None
    cum = 0.0
    # boundaries in declaration order; the LAST split takes everything
    # past its predecessors' cutoffs, so rounding can never orphan a row
    for name in names[:-1]:
        cum += float(splits[name])
        cond = bucket < F.lit(int(round(cum * _BUCKETS)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def assign_splits(
    df: DataFrame,
    splits: Dict[str, float],
    *,
    id_col: str,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic ``out_col`` split label.

    ``splits``: name → weight, weights > 0 summing to 1; cutoffs are
    cumulative in declaration order with 1/1e6 resolution (same bucket
    space as `hash_sample`, so a different ``salt`` decorrelates the
    split from any sampling draw). NULL ids hash as the bare salt and
    therefore land in ONE split together — visibly, not dropped.
    """
    return df.withColumn(out_col, _split_expr(splits, id_col=id_col, salt=salt))


def split_census(
    df: DataFrame,
    splits: Dict[str, float],
    *,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Realized (split, n_rows, share, declared_share) — the audit that
    the hash partition actually hit its declared weights (it converges
    at 1/sqrt(n) like any hash partition; a large deviation means
    skewed/duplicated ids, which is itself a finding).

    One scan, |splits|-row aggregate; share is computed against the
    total via a broadcast-sized window over the census frame.
    """
    lab = _split_expr(splits, id_col=id_col, salt=salt)
    counts = (
        df.select(lab.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    declared = F.create_map(
        *[x for k, v in splits.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    from pyspark.sql import Window

    total = F.sum("n_rows").over(Window.partitionBy())
    return counts.select(
        "split",
        "n_rows",
        F.round(F.col("n_rows") / total, 6).alias("share"),
        declared[F.col("split")].alias("declared_share"),
    )


def split_leakage(
    df: DataFrame,
    splits: Dict[str, float],
    *,
    id_col: str,
    content_col: str,
    salt: str = "",
    extra_group_cols: Sequence[str] = (),
    min_splits: int = 2,
) -> DataFrame:
    """Exact-content groups spanning ≥ ``min_splits`` splits →
    (content_hash, n_docs, n_splits, splits, min_id), the documents
    whose eval-set copies make every metric on those splits a lie.

    ``content_col`` is digested with md5 (portable, like the
    fingerprint operators) — pass a normalized column name if
    whitespace/case variants should collapse (compose with
    `operators.normalize` upstream). NULL content digests as the empty
    string: all NULL-content rows form one group, flagged if they span
    splits — a NULL collision across train/val is still a collision.
    ``extra_group_cols`` refine the identity (e.g. leak only counts
    within a language).

    Within-split duplicates are NOT leakage (that's `exact_duplicates`'
    job); the ≥2-splits filter runs after a digest-keyed aggregate
    whose exchange carries (digest, split, id) rows only.
    """
    if min_splits < 2:
        raise ValueError(f"min_splits must be >= 2, got {min_splits}")
    lab = _split_expr(splits, id_col=id_col, salt=salt)
    digest = F.md5(
        F.coalesce(F.col(f"`{content_col}`").cast("string"), F.lit(""))
    )
    keys = ["content_hash", *extra_group_cols]
    return (
        df.select(
            digest.alias("content_hash"),
            *extra_group_cols,
            lab.alias("split"),
            F.col(f"`{id_col}`").alias("_id"),
        )
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("split")).alias("n_splits"),
            F.array_join(
                F.array_sort(F.collect_set("split")), ","
            ).alias("splits"),
            F.min("_id").alias("min_id"),
        )
        .filter(F.col("n_splits") >= F.lit(min_splits))
    )
