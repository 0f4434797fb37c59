"""Heavy-hitter detection with bounded shuffle — the sketch-first,
verify-exact frequency census.

The existing :func:`~.skew.key_skew_report` is an exact
``groupBy(key).count()``: one scan, but the exchange carries one row
per DISTINCT key. On a 10^12-row table whose key has 10^9-10^11
distinct values (user ids, URLs, content digests) that shuffle is
itself a multi-terabyte job — to find the dozen keys that matter.

This module replaces the distinct-keys shuffle with a **mergeable
Misra–Gries summary** (Misra & Gries 1982; mergeability per Agarwal,
Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012):

  stage 1  ``mapInPandas`` folds each input partition into a k-counter
           Misra–Gries summary (pandas ``value_counts`` per Arrow
           batch, dict-merge + (k+1)-th-largest decrement per fold —
           per-row Python never runs). The shuffleable output is at
           most k rows per partition, independent of key cardinality.
  stage 2  summing the per-partition lower bounds per key (a tiny
           groupBy) preserves the guarantee: for every key,
           ``sum_lb(x) ≥ count(x) − n/(k+1)`` — each partition's
           summary undercounts by at most n_p/(k+1) and the errors add.
  stage 3  candidates = keys whose summed lower bound clears
           ``threshold − n/(k+1)``. By the stage-2 bound this set
           CONTAINS every true heavy hitter (no false negatives); it
           may contain light keys (false positives), so
  stage 4  one more corpus scan counts ONLY the candidates (broadcast
           semi-filter, the aggregate's key domain is the candidate
           set) and drops those below threshold.

The final output is therefore EXACT — identical to
``GROUP BY key HAVING count(*) >= threshold`` — which is what lets the
DuckDB oracle verify it value-for-value even though the middle is a
sketch. Cost: two scans + O(partitions × k) shuffled rows, vs one scan
+ O(distinct keys) shuffled rows for the exact census. At web-scale
key cardinalities the second scan is far cheaper than the giant
exchange (scans are the cheap, pushdown-pruned part; exchanges are
the expensive part).

Completeness guard: the no-false-negatives argument needs
``threshold > n/(k+1)``. ``heavy_hitters`` picks k from the threshold
(k = ceil(safety × n / threshold)) so the guard holds by construction,
and re-checks it against the observed n after the sketch pass —
a violation raises rather than silently missing a heavy key.

Reference parity note: the reference package has no frequency census
at all (its closest is the categorical-domain check,
``/root/reference/src/pyos_data_validation/validate_contract.py``);
this operator is part of the engine's own 100-TB surface, same as
dedup/skew/spans.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "misra_gries_partials",
    "heavy_hitters",
    "heavy_hitters_estimate",
]

# Cap on Misra-Gries counters per partition. 2^20 counters ≈ tens of MB
# of Python dict per task — past that the summary itself stops being
# "small" and the exact groupBy census is the better tool.
MAX_COUNTERS = 1 << 20

# NULL keys are real keys (the most common skew source — see
# key_skew_report). Inside the pandas fold they are represented by a
# private sentinel so dict keys stay hashable and distinct from every
# string; the sentinel is mapped back to NULL on emit.
_NULL_SENTINEL = "\x00__dv_null__\x00"


def _fold_batch(counters: dict, values) -> None:
    """Fold one Arrow batch's key column into the MG counter dict.

    Vectorized: one ``value_counts(dropna=False)`` per batch, then a
    dict merge over the (≤ batch-distinct) unique keys.
    """
    vc = values.value_counts(dropna=False)
    for key, cnt in vc.items():
        if key is None or pd.isna(key):  # None, NaN, or pd.NA
            key = _NULL_SENTINEL
        counters[key] = counters.get(key, 0) + int(cnt)


def _compress(counters: dict, k: int) -> dict:
    """Misra-Gries compression: keep at most ``k`` counters by
    subtracting the (k+1)-th largest count from all and dropping the
    non-positive remainder (the batched/merge form of the classic
    decrement step — Agarwal et al. 2012, §3). Each surviving count is
    a lower bound undercounting by at most the total mass removed /
    (k+1)."""
    if len(counters) <= k:
        return counters
    # (k+1)-th largest value; nsmallest/nlargest via sort of the values
    # only (len(counters) ≈ k + batch-distinct, small)
    vals = sorted(counters.values(), reverse=True)
    delta = vals[k]  # 0-indexed: element k is the (k+1)-th largest
    return {key: c - delta for key, c in counters.items() if c > delta}


def misra_gries_partials(
    df: DataFrame, key: str, *, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``key``.

    Returns ``(key_str: string, lb: bigint, n_part: bigint)`` — at most
    ``k`` counter rows per input partition, each carrying the
    partition's row count ``n_part`` on its first row (0 elsewhere) so
    downstream can recover total n without a second aggregate. Keys are
    string-rendered (injectively for ints/strings — the same cast
    policy as the HLL sketches); NULL keys come back as NULL.

    Guarantee per partition: ``lb(x) ≥ count_p(x) − n_p/(k+1)`` and
    ``lb(x) ≤ count_p(x)``.
    """
    if not 0 < k <= MAX_COUNTERS:
        raise ValueError(f"k must be in (0, {MAX_COUNTERS}], got {k}")
    pruned = df.select(F.col(f"`{key}`").cast("string").alias("_key"))

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            _fold_batch(counters, pdf["_key"])
            counters = _compress(counters, k)
        if not counters and n_part == 0:
            return
        rows = {
            "key_str": [
                None if key_ == _NULL_SENTINEL else key_ for key_ in counters
            ]
            or [None],
            "lb": list(counters.values()) or [0],
        }
        np_col = [0] * len(rows["lb"])
        np_col[0] = n_part
        rows["n_part"] = np_col
        yield pd.DataFrame(rows)

    return pruned.mapInPandas(
        summarize, "key_str string, lb bigint, n_part bigint"
    )


def heavy_hitters(
    df: DataFrame,
    key: str,
    *,
    min_count: Optional[int] = None,
    min_share: Optional[float] = None,
    safety: float = 2.0,
) -> DataFrame:
    """Exactly the keys with ``count(*) >= threshold``, with exact
    counts — computed sketch-first so the shuffle never carries the
    distinct-key domain.

    Exactly one of:

    * ``min_count`` — absolute row-count threshold. Needs total n to
      size the sketch, so a ``df.count()`` runs first (parquet counts
      are metadata-cheap).
    * ``min_share`` — threshold as a fraction of rows (e.g. ``0.001``
      = keys covering ≥0.1% of the table). Sketch width depends only
      on the share, so no pre-count runs; the absolute threshold is
      ``ceil(min_share × n)`` with n taken from the sketch pass.

    ``safety`` (>1) widens the sketch beyond the theoretical minimum
    k = n/threshold, shrinking the false-positive candidate set the
    exact pass must count. Returns ``(key_str, cnt)`` sorted by
    (cnt desc, key asc) — identical to
    ``GROUP BY key HAVING count(*) >= threshold`` string-rendered,
    which is how the driver oracle verifies it.

    Raises if the derived k would exceed ``MAX_COUNTERS`` (threshold
    too small for the sketch path — use the exact census) or if the
    completeness guard ``threshold > n/(k+1)`` fails post-hoc.
    """
    if (min_count is None) == (min_share is None):
        raise ValueError("pass exactly one of min_count / min_share")
    if safety <= 1.0:
        raise ValueError(f"safety must be > 1, got {safety}")
    if min_share is not None and not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    if min_count is not None and min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    if min_share is not None:
        k = math.ceil(safety / min_share)
    else:
        n_total = df.count()
        if n_total == 0:
            return (
                df.select(F.col(f"`{key}`").cast("string").alias("key_str"))
                .groupBy("key_str")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        k = math.ceil(safety * n_total / min_count)
    if k > MAX_COUNTERS:
        raise ValueError(
            f"threshold implies k={k} > {MAX_COUNTERS} counters/partition; "
            "the sketch path stops paying for itself there — use the exact "
            "census (key_skew_report / groupBy count) instead"
        )

    partials = misra_gries_partials(df, key, k=k)
    merged = partials.groupBy("key_str").agg(
        F.sum("lb").alias("lb"), F.sum("n_part").alias("_n")
    )
    # tiny frame (≤ partitions × k rows), consumed for n and candidates
    merged = merged.localCheckpoint()
    n = merged.agg(F.sum("_n")).first()[0] or 0
    if n == 0:
        return merged.select("key_str", F.col("lb").alias("cnt")).filter(
            F.lit(False)
        )
    threshold = min_count if min_count is not None else math.ceil(min_share * n)
    threshold = max(threshold, 1)
    if threshold * (k + 1) <= n:
        raise RuntimeError(
            f"completeness guard failed: threshold={threshold} ≤ "
            f"n/(k+1)={n / (k + 1):.1f} — observed n grew past the sketch "
            "width (concurrent append?); rerun with a larger safety"
        )
    # no-false-negative candidate cut: sum_lb ≥ threshold − n/(k+1),
    # kept in exact integer arithmetic (lb·(k+1) ≤ n·(k+1) < 2^63 for
    # any k this module accepts at real row counts)
    candidates = merged.filter(
        F.col("lb") * (k + 1) >= F.lit(threshold * (k + 1) - n)
    ).select("key_str")
    # exact verify: count ONLY candidate keys — a broadcast null-safe
    # hash semi-join prunes every light key at the scan (NULL is a key
    # like any other here, so <=> not =), leaving the groupBy's domain
    # the candidate set, not the corpus key domain
    keyed = df.select(F.col(f"`{key}`").cast("string").alias("key_str"))
    cand = candidates.withColumnRenamed("key_str", "_cand")
    return (
        keyed.join(
            F.broadcast(cand),
            keyed["key_str"].eqNullSafe(cand["_cand"]),
            "left_semi",
        )
        .groupBy("key_str")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .orderBy(F.col("cnt").desc(), F.col("key_str").asc_nulls_first())
    )


def heavy_hitters_estimate(
    df: DataFrame, key: str, *, k: int, top_k: int = 100
) -> DataFrame:
    """One-scan approximate top keys: merged Misra-Gries lower bounds
    plus the global error bound, NO exact verify pass.

    Returns ``(key_str, lb, ub)`` for the ``top_k`` largest lower
    bounds, where ``ub = lb + floor(n/(k+1))`` is a guaranteed upper
    bound on the true count. Use when a ranking with error bars is
    enough and the second scan isn't worth it (ad-hoc exploration,
    pre-flight sizing); use :func:`heavy_hitters` when the answer must
    be exact.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    merged = (
        misra_gries_partials(df, key, k=k)
        .groupBy("key_str")
        .agg(F.sum("lb").alias("lb"), F.sum("n_part").alias("_n"))
        .localCheckpoint()
    )
    n = merged.agg(F.sum("_n")).first()[0] or 0
    err = n // (k + 1)
    return (
        merged.select(
            "key_str", "lb", (F.col("lb") + F.lit(err)).alias("ub")
        )
        .orderBy(F.col("lb").desc(), F.col("key_str").asc_nulls_first())
        .limit(top_k)
    )
