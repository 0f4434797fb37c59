"""Per-file health census — which shard is broken?

At 10^12 rows a table is tens of thousands of parquet files, and the
failure mode row-level contracts miss is FILE-shaped: one shard written
by a sick executor (truncated, all-NULL column, stale schema default),
one backfill job that double-wrote a day. Table-level stats dilute a
single bad file to invisibility; ``input_file_name()`` keys the same
fused aggregates to the physical file so the census names the culprit.

Scale shape: ONE scan; the aggregation is map-side combined and the
shuffle carries O(files × stats) rows — a partition almost always reads
one file, so the partial aggregate usually collapses to one row per
file before the exchange. ``flag_outlier_files`` reuses the
median/MAD-robust z-score (the same estimator as
``operators.outliers``) over the FILE-count frame — a population of
file sizes is exactly where mean/σ breaks (the bad file inflates σ and
hides itself).

No SQL oracle: file paths are environment-local, so this operator is
pinned by pytest over a deterministically partitioned write instead
(the honest check — the driver compare can't see paths).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "file_census",
    "flag_outlier_files",
    "clustering_report",
    "file_order_census",
    "file_order_summary",
]


def file_census(
    df: DataFrame,
    *,
    null_cols: Sequence[str] = (),
    key_col: Optional[str] = None,
) -> DataFrame:
    """(file, n_rows[, <col>_null_frac…][, key_min, key_max]) per input
    file of a file-backed DataFrame.

    ``null_cols``: columns whose per-file NULL fraction is reported — an
    all-NULL column in ONE file is the classic sick-writer signature.
    ``key_col``: a monotonic-ish key whose per-file min/max exposes
    duplicate/overlapping ranges (double-written shards) when compared
    across files.

    Call on a freshly-read frame (``spark.read.parquet(...)``):
    ``input_file_name()`` is empty for rows that did not originate from
    a file scan; such rows are surfaced under the ``""`` file rather
    than dropped, because an unexpected non-file source IS a finding.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        aggs.append(
            F.avg(F.col(f"`{c}`").isNull().cast("double")).alias(
                f"{c}_null_frac"
            )
        )
    if key_col is not None:
        aggs.append(F.min(F.col(f"`{key_col}`")).alias("key_min"))
        aggs.append(F.max(F.col(f"`{key_col}`")).alias("key_max"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def flag_outlier_files(
    census: DataFrame,
    *,
    metric_col: str = "n_rows",
    threshold: float = 3.5,
) -> DataFrame:
    """Append (median, mad_z, is_outlier) to a file census — modified
    z-score of ``metric_col`` against the population of FILES (Hampel
    identifier, ×1.4826 consistency constant; meanAD ×1.2533 fallback
    when MAD degenerates to 0, i.e. when more than half the files are
    identical — exactly the healthy case where the detector must stay
    live for the one deviant file).

    The census frame is O(files) rows, so the unpartitioned exact-median
    windows inside :func:`operators.outliers.append_robust_z` (the ONE
    shared estimator implementation) are single-task by construction —
    the correct plan at any corpus size (the window runs over files,
    not rows)."""
    from ..operators.outliers import append_robust_z

    scored = append_robust_z(census, metric_col, z_col="_z")
    return (
        scored.withColumn("mad_z", F.round(F.col("_z"), 6))
        .withColumn(
            "is_outlier",
            F.coalesce(F.col("mad_z") > threshold, F.lit(False)),
        )
        .withColumnRenamed("_med", "median")
        .drop("_z", "_scale")
    )


def file_order_census(
    df: DataFrame,
    key_col: str,
    *,
    descending: bool = False,
) -> DataFrame:
    """Per-file WITHIN-file sort-order validation — does the declared
    sort order actually hold inside each physical file?

    :func:`clustering_report` judges the layout ACROSS files (do key
    ranges overlap?); this operator judges each file INTERNALLY. Both
    matter for the same reason: parquet/Iceberg min/max pruning works at
    two granularities — file level (needs disjoint ranges across files)
    and row-group/page level (needs rows sorted WITHIN the file). A
    table whose Iceberg `sort_order` is declared but whose writers
    silently stopped sorting keeps its metadata promise while its
    row-group statistics degrade to useless — scans stay "pruned" on
    paper and slow in practice. This check catches that drift.

    Scale shape — ZERO data shuffle. A parquet scan delivers each
    file-chunk's rows in physical order within its input partition, so
    per-chunk order statistics need no exchange at all:

      stage 1  ``mapInPandas`` over (file_path, row_index, key) —
               Arrow-vectorized, no per-row Python — emits ONE summary
               row per (input partition × file): within-segment
               adjacent-pair inversion count, boundary keys, min/max,
               null count. The shuffleable output is O(#splits) rows,
               not O(rows). Robustness: the segment recomputes its own
               order from ``_metadata.row_index`` (argsort only when a
               chunk arrives out of order), so correctness never rests
               on undocumented batch-order guarantees.
      stage 2  ``groupBy(file)`` over the segment frame (tiny):
               ``sort_array(collect_list(struct(seg_min_idx, …)))``
               orders a file's segments by physical position —
               segments per file is bounded by file_size /
               maxPartitionBytes (a few hundred at most, because file
               size is physically capped) — and array HOFs fold the
               boundary comparisons between consecutive segments.

    NULL keys carry no order relation (SQL semantics): they are counted
    per file (``n_null_keys``) and excluded from adjacent-pair
    comparisons — the pair bridges across them (…, 5, NULL, 2, … is one
    comparable pair 5→2, an inversion). A boundary whose segment is
    entirely NULL is skipped (conservative undercount, documented).

    Returns one row per file:
    ``(file, n_rows, n_null_keys, n_segments, n_pairs, n_inversions,
    sorted_frac, is_sorted, key_min, key_max)`` where ``sorted_frac`` =
    1 − inversions/pairs (NULL when no comparable pair exists) and
    ``is_sorted`` is vacuously true for 0-pair files. ``key_min`` /
    ``key_max`` make the output a valid :func:`clustering_report`
    input, so one pass feeds both the within-file and the across-file
    layout verdicts.

    Call on a freshly-read file-backed frame — the operator selects the
    parquet ``_metadata.file_path`` / ``_metadata.row_index`` columns,
    which only exist on a file scan (Spark ≥3.5).

    No SQL oracle: file paths/row indexes are environment-local, so the
    operator is pinned by pytest over deterministic sorted/shuffled/
    multi-segment writes instead (same policy as :func:`file_census`).
    """
    kt = df.schema[key_col].dataType.simpleString()
    pruned = df.select(
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.row_index").alias("_idx"),
        F.col(f"`{key_col}`").alias("_key"),
    )
    seg_schema = (
        "file string, seg_min_idx bigint, n_rows bigint, n_nulls bigint, "
        f"n_inversions bigint, n_pairs bigint, first_key {kt}, "
        f"last_key {kt}, key_min {kt}, key_max {kt}"
    )

    def segments(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        # per-file accumulation of (idx, key) chunk arrays; a partition
        # holds at most maxPartitionBytes of (8B idx + key) columns
        acc: dict = {}
        for pdf in batches:
            for fname, g in pdf.groupby("_file", sort=False):
                acc.setdefault(fname, []).append(
                    (g["_idx"].to_numpy(), g["_key"])
                )
        out = []
        for fname, chunks in acc.items():
            idx = np.concatenate([c[0] for c in chunks])
            keys = pd.concat([c[1] for c in chunks], ignore_index=True)
            if len(idx) > 1 and not (idx[1:] >= idx[:-1]).all():
                order = np.argsort(idx, kind="stable")
                idx = idx[order]
                keys = keys.iloc[order].reset_index(drop=True)
            nn = keys[keys.notna()]
            arr = nn.to_numpy()
            n_pairs = max(len(arr) - 1, 0)
            if n_pairs:
                inv = int(
                    ((arr[1:] > arr[:-1]) if descending else (arr[1:] < arr[:-1])).sum()
                )
            else:
                inv = 0
            out.append(
                {
                    "file": fname,
                    "seg_min_idx": int(idx.min()) if len(idx) else 0,
                    "n_rows": len(idx),
                    "n_nulls": int(len(idx) - len(arr)),
                    "n_inversions": inv,
                    "n_pairs": n_pairs,
                    "first_key": arr[0] if len(arr) else None,
                    "last_key": arr[-1] if len(arr) else None,
                    "key_min": nn.min() if len(arr) else None,
                    "key_max": nn.max() if len(arr) else None,
                }
            )
        if out:
            yield pd.DataFrame(out)

    segs = pruned.mapInPandas(segments, seg_schema)

    cmp_inv = (
        (lambda s: s["n"] > s["p"]) if descending else (lambda s: s["n"] < s["p"])
    )
    per_file = segs.groupBy("file").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_null_keys"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("n_inversions").alias("_inv_within"),
        F.sum("n_pairs").alias("_pairs_within"),
        F.min("key_min").alias("key_min"),
        F.max("key_max").alias("key_max"),
        F.sort_array(
            F.collect_list(F.struct("seg_min_idx", "first_key", "last_key"))
        ).alias("_segs"),
    )
    n = F.size("_segs")
    z = F.zip_with(
        F.slice("_segs", 1, n - 1),
        F.slice("_segs", 2, n - 1),
        lambda a, b: F.struct(
            a["last_key"].alias("p"), b["first_key"].alias("n")
        ),
    )
    comparable = F.filter(z, lambda s: s["p"].isNotNull() & s["n"].isNotNull())
    b_pairs = F.size(comparable)
    b_inv = F.size(F.filter(comparable, cmp_inv))
    n_pairs = (F.col("_pairs_within") + b_pairs).alias("n_pairs")
    n_inv = (F.col("_inv_within") + b_inv).alias("n_inversions")
    return per_file.select(
        "file",
        "n_rows",
        "n_null_keys",
        "n_segments",
        n_pairs,
        n_inv,
        F.round(
            F.when(
                F.col("_pairs_within") + b_pairs > 0,
                1.0 - (F.col("_inv_within") + b_inv) / (F.col("_pairs_within") + b_pairs),
            ),
            6,
        ).alias("sorted_frac"),
        ((F.col("_inv_within") + b_inv) == 0).alias("is_sorted"),
        "key_min",
        "key_max",
    )


def file_order_summary(census: DataFrame) -> DataFrame:
    """ONE row → (n_files, n_sorted_files, sorted_file_frac, n_rows,
    n_pairs, n_inversions, global_sorted_frac) from a
    :func:`file_order_census` frame — the dashboard number for "is the
    declared sort order still being honoured by the writers". The census
    is O(files) rows, so the single aggregation is trivially sized."""
    return census.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.coalesce(F.count_if(F.col("is_sorted")), F.lit(0)).alias(
            "n_sorted_files"
        ),
        F.round(
            F.when(
                F.count(F.lit(1)) > 0,
                F.count_if(F.col("is_sorted")) / F.count(F.lit(1)),
            ),
            6,
        ).alias("sorted_file_frac"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_pairs").alias("n_pairs"),
        F.sum("n_inversions").alias("n_inversions"),
        F.round(
            F.when(
                F.sum("n_pairs") > 0,
                1.0 - F.sum("n_inversions") / F.sum("n_pairs"),
            ),
            6,
        ).alias("global_sorted_frac"),
    )


def clustering_report(census: DataFrame) -> DataFrame:
    """ONE row → (n_files, n_ranged_files, n_overlapping_files,
    overlap_frac, span_inflation) from a :func:`file_census` frame that
    carried ``key_col``.

    The data-layout health check behind every slow scan: parquet/
    Iceberg min/max pruning only skips a file when the predicate's key
    range misses the FILE's range — if file key ranges overlap heavily
    (append-order writes, unsorted backfills), every point query touches
    every file and "partition pruning" silently becomes a full scan.
    ``n_overlapping_files`` counts files whose [key_min, key_max] range
    intersects ANY earlier range (the monotonic running-max sweep —
    same any-predecessor shape as ``timeseries.interval_overlaps``, so
    one long file swallowing many is charged to each); ``span_inflation``
    = Σ file spans / global span (≈1 for disjoint sorted layout, ≫1 for
    interleaved writes). High numbers say: rewrite sorted (or cluster by
    the key) before blaming the reader.

    The census frame is O(files) rows, so the single-task windows are
    the correct plan at any corpus size.
    """
    if "key_min" not in census.columns or "key_max" not in census.columns:
        raise ValueError("census must be built with key_col= (key_min/key_max)")
    ranged = census.filter(
        F.col("key_min").isNotNull() & F.col("key_max").isNotNull()
    )
    w = Window.orderBy(F.asc("key_min"), F.asc("key_max"), F.asc("file"))
    prev_max = F.max("key_max").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = ranged.select(
        F.col("key_min").cast("double"),
        F.col("key_max").cast("double"),
        (F.col("key_min") <= prev_max).alias("_overlaps"),
    )
    total = census.agg(F.count(F.lit(1)).alias("n_files"))
    stats = swept.agg(
        F.count(F.lit(1)).alias("n_ranged_files"),
        F.coalesce(F.count_if(F.col("_overlaps")), F.lit(0)).alias(
            "n_overlapping_files"
        ),
        F.sum(F.col("key_max") - F.col("key_min")).alias("_span_sum"),
        F.min("key_min").alias("_lo"),
        F.max("key_max").alias("_hi"),
    )
    return total.crossJoin(F.broadcast(stats)).select(
        "n_files",
        "n_ranged_files",
        "n_overlapping_files",
        F.round(
            F.when(
                F.col("n_ranged_files") > 0,
                F.col("n_overlapping_files") / F.col("n_ranged_files"),
            ),
            6,
        ).alias("overlap_frac"),
        F.round(
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.col("_span_sum") / (F.col("_hi") - F.col("_lo")),
            ),
            6,
        ).alias("span_inflation"),
    )
