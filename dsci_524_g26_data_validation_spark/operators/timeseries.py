"""Temporal integrity checks over event streams — the time axis of the
validation engine (the reference validates shape/range/category,
`validate.py`; an event table additionally carries ordering, arrival and
contiguity guarantees that only hold or break ALONG time).

Four checks, each a standard data-platform SLO:

- :func:`freshness` — how far behind a reference clock the newest row
  is (the Deequ/Great-Expectations "freshness" check). ONE single-row
  aggregate; the reference instant is an explicit parameter so results
  are deterministic and engine-reproducible (never wall-clock).
- :func:`order_health` — fraction of per-key adjacent event pairs whose
  timestamp regresses when ordered by the sequence column (producers
  that clock-skew or buffer-flush out of order). One hash shuffle on
  the key, one partition-local sorted window — the sessionize plan
  shape (`sessions.py`), so a hot key is bounded by its own volume.
- :func:`sequence_gap_buckets` — missing ids in a supposedly-contiguous
  id sequence, WITHOUT a global sort: ids hash-aggregate into
  fixed-width buckets (id div B) where `span − n_ids` counts interior
  holes exactly; whole-bucket holes surface as gaps in the bucket
  numbers themselves. Shuffle is bounded at one row per B ids.
- :func:`interarrival_stats` — per-key arrival-cadence profile (mean /
  max gap, regression count) for burst/stall detection; same single
  window pass as order_health, then a key-sized aggregate.

All four are pure Catalyst (no UDF), lazy, and ANSI-expressible — the
driver oracle replicates freshness/order/gap checks in DuckDB.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "freshness",
    "order_health",
    "sequence_gap_buckets",
    "interarrival_stats",
    "interval_overlaps",
    "monotonic_violations",
    "volume_calendar",
    "change_point_report",
]


def freshness(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    as_of: str = "",
) -> DataFrame:
    """Single-row freshness verdict vs an explicit reference instant.

    Columns: ``n_rows``, ``n_null_ts``, ``min_ts``, ``max_ts``,
    ``seconds_behind`` (as_of − max_ts; negative means data from the
    future — itself a signal worth gating on).

    ``as_of`` is an ISO timestamp string and is REQUIRED: a wall-clock
    default would make the check non-reproducible and untestable (and
    on a backfill, meaningless). Gate with e.g.
    ``AggregateCheck("seconds_behind <= 3600")`` semantics downstream.

    ``seconds_behind`` is floor(microsecond difference / 1e6): the
    microsecond diff is the exact duration at the column's own
    precision, so the number is engine-portable (DuckDB's
    ``datediff('second', …)`` counts boundary CROSSINGS and disagrees
    with duration truncation on sub-second data; microsecond boundaries
    and duration coincide). The reference instant is cast to the ts
    column's own type so timestamp and timestamp_ntz behave identically.
    """
    if not as_of:
        raise ValueError("as_of (ISO timestamp) is required for reproducibility")
    ts = F.col(ts_col)
    ref = F.lit(as_of).cast(df.schema[ts_col].dataType)
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if(ts.isNull()).cast("bigint").alias("n_null_ts"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
        F.floor(
            F.timestamp_diff("MICROSECOND", F.max(ts), ref) / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("seconds_behind"),
    )


def _pair_window(key_col: str, seq_col: str) -> Window:
    # total order inside each key: the sequence column IS the producer's
    # claimed order, so ordering by it (ties -> stable on itself only)
    # makes `lag(ts)` the timestamp the producer wrote immediately before
    return Window.partitionBy(key_col).orderBy(F.col(seq_col).asc())


def order_health(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
) -> DataFrame:
    """ONE-row out-of-order summary: of all adjacent (by ``seq_col``)
    event pairs within a key, how many have a regressing timestamp?

    Columns: ``n_events`` (non-null key+ts+seq rows), ``n_pairs``,
    ``n_regressions`` (prev_ts > ts, strict), ``regression_frac``
    (0.0 when there are no pairs), ``n_keys_affected``.

    NULL key/seq/ts rows are excluded — they have no defined position;
    surface them via missingness. Equal timestamps are NOT regressions
    (multiple events in the same tick are normal at coarse clocks).
    """
    clean = df.filter(
        F.col(key_col).isNotNull()
        & F.col(seq_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    prev_ts = F.lag(F.col(ts_col)).over(_pair_window(key_col, seq_col))
    flagged = clean.select(
        F.col(key_col).alias("_k"),
        prev_ts.isNotNull().cast("int").alias("_pair"),
        (prev_ts > F.col(ts_col)).cast("int").alias("_reg"),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.coalesce(F.sum("_pair"), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum("_reg"), F.lit(0)).cast("bigint").alias("n_regressions"),
        F.round(
            F.when(
                F.coalesce(F.sum("_pair"), F.lit(0)) > 0,
                F.coalesce(F.sum("_reg"), F.lit(0))
                / F.coalesce(F.sum("_pair"), F.lit(0)),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("regression_frac"),
        F.count_distinct(F.when(F.col("_reg") == 1, F.col("_k")))
        .cast("bigint")
        .alias("n_keys_affected"),
    )


def sequence_gap_buckets(
    df: DataFrame,
    *,
    id_col: str = "event_id",
    bucket_size: int = 1000,
    limit: Optional[int] = 100,
) -> DataFrame:
    """Buckets of ``id_col`` that are missing interior ids.

    Each bucket ``b`` covers ids ``[b·B, (b+1)·B)``; a row is returned
    when ``span − n_ids > 0`` where span = max−min+1 WITHIN the bucket —
    exact interior-hole count, zero false positives at the corpus edges
    (the first/last bucket's partial coverage is not a hole). A bucket
    that is entirely missing yields no row here but shows as a break in
    the ``bucket`` sequence; both read from the same output.

    Columns: ``bucket``, ``n_ids`` (distinct), ``min_id``, ``max_id``,
    ``n_missing``. Deterministic order (most holes first, bucket asc);
    ``limit`` bounds the result (None = unbounded). Duplicate ids are
    counted once — pair with the uniqueness check (E1) to distinguish
    "gap because missing" from "count off because duplicated".
    """
    if bucket_size <= 0:
        raise ValueError(f"bucket_size must be positive, got {bucket_size}")
    ids = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).cast("bigint").alias("_id")
    )
    out = (
        ids.groupBy((F.floor(F.col("_id") / bucket_size)).alias("bucket"))
        .agg(
            F.count_distinct("_id").alias("n_ids"),
            F.min("_id").alias("min_id"),
            F.max("_id").alias("max_id"),
        )
        .select(
            "bucket",
            F.col("n_ids").cast("bigint").alias("n_ids"),
            "min_id",
            "max_id",
            (F.col("max_id") - F.col("min_id") + 1 - F.col("n_ids"))
            .cast("bigint")
            .alias("n_missing"),
        )
        .filter(F.col("n_missing") > 0)
        .orderBy(F.desc("n_missing"), F.asc("bucket"))
    )
    return out.limit(int(limit)) if limit is not None else out


def interarrival_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    top_k: int = 20,
) -> DataFrame:
    """Per-key arrival cadence: top-``top_k`` keys by timestamp
    regressions, then by max inter-arrival gap (stall detection).

    Columns: key, ``n_events``, ``n_regressions``, ``avg_gap_s``
    (mean gap in seconds: the exact microsecond mean scaled by 1e6 —
    computing in microseconds keeps every intermediate an exact
    integer, scaling to seconds keeps the rounded double within exact
    double range), ``max_gap_us`` (exact integer microseconds).
    Gaps cover adjacent seq-ordered pairs; regressing pairs
    contribute negative gaps to neither avg nor max — they're counted,
    not averaged, so one skewed clock doesn't poison the cadence
    profile. Deterministic order with the key as the final tiebreak;
    TakeOrderedAndProject keeps top-k selection map-side.
    """
    clean = df.filter(
        F.col(key_col).isNotNull()
        & F.col(seq_col).isNotNull()
        & F.col(ts_col).isNotNull()
    )
    prev_ts = F.lag(F.col(ts_col)).over(_pair_window(key_col, seq_col))
    gap_us = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    flagged = clean.select(
        F.col(key_col).alias("key"),
        gap_us.alias("_gap"),
        (prev_ts > F.col(ts_col)).cast("int").alias("_reg"),
    )
    pos_gap = F.when(F.col("_gap") >= 0, F.col("_gap"))
    return (
        flagged.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.coalesce(F.sum("_reg"), F.lit(0)).cast("bigint").alias("n_regressions"),
            F.round(F.avg(pos_gap) / F.lit(1_000_000.0), 6).alias("avg_gap_s"),
            F.max(pos_gap).cast("bigint").alias("max_gap_us"),
        )
        .orderBy(F.desc("n_regressions"), F.desc("max_gap_us"), F.asc("key"))
        .limit(int(top_k))
    )


def interval_overlaps(
    df: DataFrame,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Intervals that overlap a PRECEDING interval of the same key —
    the no-double-booking / no-overlapping-sessions invariant.

    The naive formulation is a per-key interval self-join (quadratic in
    the worst key). This is the linear sweep instead: sort each key's
    intervals by (start, end), carry the running ``max(end)`` of all
    EARLIER intervals with one window, and a row violates iff its start
    is strictly before that running max. One shuffle (by key) + one
    sorted window — the sessionize plan shape — and it catches overlaps
    with ANY predecessor, not just the adjacent row (a long interval
    swallowing several short ones still flags each of them).

    Rows with a NULL key/start/end are reported with
    ``overlap_kind='null_bounds'`` (an interval that can't be placed
    can't be proven non-overlapping — NULL-fails, the engine's
    standard); inverted intervals (``end < start``) flag as
    ``'inverted'``; genuine overlaps as ``'overlap'``, carrying the
    previous running max end (``prev_max_end``) as the witness.
    Junk rows (null bounds / inverted) are excluded from the sweep
    input — one NULL-start row with a far-future end must not poison
    the running max and flag every later valid interval of its key —
    so their ``prev_max_end`` is NULL.

    Returns: key, start, end, overlap_kind, prev_max_end — violating
    rows only.
    """
    src = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).alias("start"),
        F.col(end_col).alias("end"),
    )
    # junk rows (unplaceable or inverted) are CLASSIFIED but EXCLUDED
    # from the sweep: a NULL-start row with a huge end would otherwise
    # poison the running max and falsely flag every later valid
    # interval of its key. Exclusion happens INSIDE the one window —
    # junk sorts last within its key and the max only aggregates clean
    # ends — so the whole operator stays a single scan (a filtered
    # clean/bad branch pair would read the source twice).
    junk = (
        F.col("key").isNull()
        | F.col("start").isNull()
        | F.col("end").isNull()
        | (F.col("end") < F.col("start"))
    )
    base = src.withColumn("_junk", junk)
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("_junk").asc(), F.col("start").asc(), F.col("end").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_clean_max = F.max(
        F.when(~F.col("_junk"), F.col("end"))
    ).over(w)
    swept = base.withColumn(
        "prev_max_end", F.when(~F.col("_junk"), prev_clean_max)
    )
    kind = (
        F.when(
            F.col("key").isNull()
            | F.col("start").isNull()
            | F.col("end").isNull(),
            F.lit("null_bounds"),
        )
        .when(F.col("end") < F.col("start"), F.lit("inverted"))
        .when(F.col("start") < F.col("prev_max_end"), F.lit("overlap"))
    )
    return (
        swept.withColumn("overlap_kind", kind)
        .filter(F.col("overlap_kind").isNotNull())
        .select("key", "start", "end", "overlap_kind", "prev_max_end")
    )


def monotonic_violations(
    df: DataFrame,
    *,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Rows where a per-key counter DECREASES — the never-goes-backward
    invariant of cumulative metrics (byte counters, sequence offsets,
    account balances under append-only accounting, watermark columns).

    A violating row is one whose value is strictly below the running
    max of all EARLIER values of its key (ordered by ``order_col``) —
    the same any-predecessor sweep as :func:`interval_overlaps`, so a
    counter that drops and then recovers flags every row under the old
    high-water mark, not just the first. One key shuffle + one sorted
    window; no self-join.

    NULL discipline: a NULL value can't be proven monotonic →
    ``kind='null_value'``; a NULL order column makes the row unplaceable
    → ``kind='null_order'`` (excluded from the sweep input — its value
    must not enter the running max and flag valid rows; its
    ``prev_max`` is NULL); genuine drops → ``kind='regression'`` with
    the high-water mark (``prev_max``) as witness. Rows with a NULL key
    are reported as ``null_order`` only if their order is NULL too —
    otherwise they form their own single NULL-key group, matching the
    window's NULL-grouping semantics.

    Returns violating rows only: (key, order, value, kind, prev_max).
    """
    src = df.select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("order"),
        F.col(value_col).alias("value"),
    )
    # unplaceable rows (NULL order) are CLASSIFIED but EXCLUDED from the
    # sweep: their value must never enter the running max (it would
    # falsely flag perfectly monotonic rows as regressions). Exclusion
    # happens INSIDE the one window — NULL-order rows sort LAST within
    # their key and the max only aggregates placeable values — keeping
    # the operator a single scan. (NULL values inside the sweep are
    # harmless — max() skips them — and are flagged as null_value.)
    junk = F.col("order").isNull()
    base = src.withColumn("_junk", junk)
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("_junk").asc(), F.col("order").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_clean_max = F.max(F.when(~F.col("_junk"), F.col("value"))).over(w)
    swept = base.withColumn(
        "prev_max", F.when(~F.col("_junk"), prev_clean_max)
    )
    kind = (
        F.when(F.col("order").isNull(), F.lit("null_order"))
        .when(F.col("value").isNull(), F.lit("null_value"))
        .when(F.col("value") < F.col("prev_max"), F.lit("regression"))
    )
    return (
        swept.withColumn("kind", kind)
        .filter(F.col("kind").isNotNull())
        .select("key", "order", "value", "kind", "prev_max")
    )


def volume_calendar(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    bucket: str = "day",
    robust_threshold: float = 3.5,
) -> DataFrame:
    """Per-time-bucket row counts with EMPTY buckets materialized and a
    robust anomaly flag — "did yesterday's partition arrive, and was it
    the usual size?", the completeness SLO a row-level contract can't
    see (a missing day has no rows to violate anything).

    Buckets span min(ts)…max(ts) inclusive; interior buckets with zero
    rows appear with ``n_rows = 0`` (``status='missing'``). Volume
    anomalies use the median/MAD modified z-score (the
    ``operators.outliers`` rule): |z| > ``robust_threshold`` →
    ``'anomaly'``; a mean/σ rule would let one backfill day inflate σ
    and mask real drops. NULL timestamps are reported as one extra
    ``bucket_ts = NULL`` row (``status='null_ts'``).

    Scale shape: ONE corpus scan → groupBy(bucket) with map-side
    combine (shuffle carries one row per bucket per partition); the
    calendar spine is ``sequence(min, max, interval)`` exploded from
    the 1-row agg — never a driver loop; median/MAD run over the
    bucket frame (years of daily buckets ≈ thousands of rows — one
    task). ``bucket`` ∈ {'hour','day','week','month'}.
    """
    if bucket not in ("hour", "day", "week", "month"):
        raise ValueError(f"unsupported bucket: {bucket!r}")
    ts = F.col(ts_col)
    b = F.date_trunc(bucket, ts)
    counts = (
        df.select(b.alias("bucket_ts"))
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    nonnull = counts.filter(F.col("bucket_ts").isNotNull())
    step = F.expr(f"INTERVAL 1 {bucket.upper()}")
    spine = (
        nonnull.agg(
            F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
        )
        .select(
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias(
                "bucket_ts"
            )
        )
    )
    filled = spine.join(nonnull, "bucket_ts", "left").select(
        "bucket_ts", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )
    # robust stats over the bucket frame (tiny): the shared exact-median
    # Hampel estimator (operators.outliers.append_robust_z) — one task,
    # deterministic, oracle-exact; its meanAD fallback keeps the
    # detector live when >50% of buckets carry the identical count (the
    # NORMAL case for healthy fixed-cadence feeds).
    from .outliers import append_robust_z

    scored = append_robust_z(filled, "n_rows", z_col="_z")
    status = (
        F.when(F.col("n_rows") == 0, F.lit("missing"))
        .when(
            F.col("_z") > F.lit(float(robust_threshold)),
            F.lit("anomaly"),
        )
        .otherwise(F.lit("ok"))
    )
    out = scored.select(
        "bucket_ts",
        "n_rows",
        status.alias("status"),
        F.round(F.col("_med"), 6).alias("median_rows"),
    )
    nulls = counts.filter(F.col("bucket_ts").isNull()).select(
        "bucket_ts",
        "n_rows",
        F.lit("null_ts").alias("status"),
        F.lit(None).cast("double").alias("median_rows"),
    )
    return out.unionByName(nulls).orderBy(F.asc_nulls_last("bucket_ts"))


def change_point_report(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Single most likely LEVEL-SHIFT point of a metric series — "when
    did this metric change?", the follow-up question to every drift
    alarm. One row: (split_after, n_before, n_after, mean_before,
    mean_after, shift, cusum_stat).

    Method: the CUSUM change-point estimator (binary segmentation's
    first split): D_t = S_t − (t/n)·S_n over prefix sums S_t; the split
    maximizes |D_t| (ties → earliest), and ``cusum_stat`` =
    max|D_t| / (σ·√n) is the normalized statistic — under a
    no-change null it concentrates below ~1.36 (the Kolmogorov 95%
    band), so gate on ``cusum_stat > 1.36`` as a first approximation
    (exact thresholds need a permutation test — out of scope for a
    one-pass report). Expressed entirely with prefix-sum windows, so
    the identical number falls out of any SQL engine — no recursive
    CUSUM state (deliberately: recursion is neither Catalyst- nor
    oracle-expressible).

    Input contract: ``df`` is a METRIC SERIES — one row per period
    (volume_calendar output, a metrics-history table, a per-batch
    quality score), i.e. thousands of rows, not the corpus. The
    unpartitioned windows here run single-task ON PURPOSE: compacting
    the series through one task is the correct plan at any corpus
    scale because the series size is bounded by time, not data volume.
    NULL values are excluded (can't contribute to a mean); NULL order
    keys are excluded (unplaceable). Series with < 2 usable rows or
    zero variance return cusum_stat = 0 and a NULL split.
    """
    o, v = F.col("_o"), F.col("_v")
    base = (
        df.select(
            F.col(f"`{order_col}`").alias("_o"),
            F.col(f"`{value_col}`").cast("double").alias("_v"),
        )
        .filter(o.isNotNull() & v.isNotNull())
        # EAGER by design: the series is bounded by time, not data
        # volume (input contract above), but its UPSTREAM plan may be a
        # corpus-scale aggregation (volume_calendar output). Both the
        # prefix-sum chain and the degenerate-series fallback consume
        # `base`; materializing it once means one upstream execution
        # instead of one per consumer.
        .localCheckpoint()
    )
    wp = (
        Window.partitionBy()
        .orderBy(o.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    stats = base.select(
        "_o",
        "_v",
        F.sum("_v").over(wp).alias("_s"),
        F.count(F.lit(1)).over(wp).alias("_t"),
        F.sum("_v").over(wall).alias("_sn"),
        F.count(F.lit(1)).over(wall).alias("_n"),
        F.stddev_pop("_v").over(wall).alias("_sd"),
    )
    d = F.col("_s") - (F.col("_t") / F.col("_n")) * F.col("_sn")
    cand = stats.filter(F.col("_t") < F.col("_n")).select(
        "_o",
        "_t",
        "_s",
        "_n",
        "_sn",
        "_sd",
        F.abs(d).alias("_absd"),
    )
    best = cand.orderBy(F.desc("_absd"), F.asc("_o")).limit(1)
    mean_before = F.col("_s") / F.col("_t")
    mean_after = (F.col("_sn") - F.col("_s")) / (F.col("_n") - F.col("_t"))
    stat = F.when(
        (F.col("_sd") > 0) & (F.col("_n") > 1),
        F.col("_absd") / (F.col("_sd") * F.sqrt(F.col("_n"))),
    ).otherwise(F.lit(0.0))
    main = best.select(
        F.when(stat > 0, F.col("_o")).alias("split_after"),
        F.col("_t").alias("n_before"),
        (F.col("_n") - F.col("_t")).alias("n_after"),
        F.round(mean_before, 6).alias("mean_before"),
        F.round(mean_after, 6).alias("mean_after"),
        F.round(mean_after - mean_before, 6).alias("shift"),
        F.round(stat, 6).alias("cusum_stat"),
    )
    # the documented one-row contract for degenerate series: with < 2
    # usable rows no candidate split exists (the _t < _n filter empties
    # `best`), so a fallback row carries the promised NULL split and
    # cusum_stat = 0. Built from a 1-row aggregate, so it also covers
    # the zero-usable-rows case; filtered away whenever n >= 2.
    order_type = df.schema[order_col].dataType
    fallback = (
        base.agg(
            F.count(F.lit(1)).alias("_n"), F.avg("_v").alias("_avg")
        )
        .filter(F.col("_n") <= 1)
        .select(
            F.lit(None).cast(order_type).alias("split_after"),
            F.col("_n").alias("n_before"),
            F.lit(0).cast("bigint").alias("n_after"),
            F.round(F.col("_avg"), 6).alias("mean_before"),
            F.lit(None).cast("double").alias("mean_after"),
            F.lit(None).cast("double").alias("shift"),
            F.lit(0.0).alias("cusum_stat"),
        )
    )
    return main.unionByName(fallback)
