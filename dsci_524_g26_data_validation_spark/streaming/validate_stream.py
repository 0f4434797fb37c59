"""Streaming contract validation — Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.7) and the north rule describes
batch passes over Iceberg snapshots, but a training-data pipeline also
ingests continuously; this module runs the SAME contract engine over a
``readStream`` DataFrame two ways:

* :func:`violation_counts_stream` — pure-Catalyst path: per-rule violation
  predicates (plans.rule_compiler) summed inside a watermarked event-time
  window aggregation. Fully incremental, state bounded by the watermark,
  no Python in the hot path; sink-agnostic (the caller writes it with
  ``writeStream``).
* :func:`validate_each_batch` — ``foreachBatch`` path: every micro-batch
  gets the full fused validate_contract pass (schema checks + one-scan
  stats) and the resulting Issues are handed to a callback / collected as
  per-batch verdict rows. This reuses the exact batch semantics when a
  whole-batch verdict (not a windowed count) is the contract.

Both work with any streaming source (file/kafka/rate); tests drive them
with a file source + ``trigger(availableNow=True)`` for determinism.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.rule_compiler import violation_predicates
from ..types import Contract, ValidationResult
from ..operators.validate import validate_contract

__all__ = [
    "category_drift_stream",
    "histogram_drift_stream",
    "violation_counts_stream",
    "json_violation_counts_stream",
    "violation_running_totals",
    "validate_each_batch",
    "BatchVerdict",
]


def violation_counts_stream(
    stream_df: DataFrame,
    contract: Contract,
    *,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Streaming DF of per-window, per-rule violation counts.

    Output: (window_start, window_end, column, kind, facet, n_violations,
    n_rows); ``facet`` is the per-column rule-facet ordinal (a range rule
    with both bounds has facet 0 = lower, 1 = upper) so each facet keeps
    its own violation count and ``n_rows`` is the window's row count.
    Late rows beyond ``watermark_delay`` are dropped by the watermark so
    aggregation state stays bounded — the standard late-data contract.

    Every rule facet is evaluated as a Catalyst predicate inside ONE
    projection (same compiler as the batch engine), so the stream stage is
    whole-stage-codegen and shuffles only (window, column, kind) partial
    counts.
    """
    preds = violation_predicates(stream_df, contract)
    entries = [
        F.struct(
            F.lit(col).alias("column"),
            F.lit(kind).alias("kind"),
            F.lit(facet).alias("facet"),
            p.cast("int").alias("viol"),
        )
        for col, plist in preds.items()
        for facet, (kind, p) in enumerate(plist)
    ]
    if not entries:  # contract has no data-dependent rules: count rows only
        entries = [
            F.struct(
                F.lit(None).cast("string").alias("column"),
                F.lit("none").alias("kind"),
                F.lit(0).alias("facet"),
                F.lit(0).alias("viol"),
            )
        ]
    exploded = (
        stream_df.withWatermark(time_col, watermark_delay)
        .select(
            F.col(time_col).alias("_ts"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .select("_ts", "e.column", "e.kind", "e.facet", "e.viol")
    )
    return (
        exploded.groupBy(
            F.window("_ts", window_duration).alias("w"), "column", "kind", "facet"
        )
        .agg(
            F.sum("viol").alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "column",
            "kind",
            "facet",
            "n_violations",
            "n_rows",
        )
    )


def json_violation_counts_stream(
    stream_df: DataFrame,
    rules,
    *,
    col: str = "props",
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Streaming per-window JSON payload contract monitor — the
    :mod:`..operators.json_contract` facets on an event stream.

    Output: ``(window_start, window_end, rule, n_violations, n_rows)``,
    one row per (window, rule) plus the ``__payload__`` pseudo-rule
    (malformed / non-object payloads). Same shape and late-data
    contract as :func:`violation_counts_stream`: every rule's facets
    evaluate as Catalyst predicates in ONE codegen projection, the
    watermark bounds window state, and only (window, rule) partial
    counts shuffle.
    """
    from ..operators.json_contract import (
        PARSED_COL,
        PAYLOAD_RULE,
        _facet_exprs,
        _rule_values,
        _violated_expr,
        json_contract_pre_columns,
    )

    if not rules:
        raise ValueError(
            "json_violation_counts_stream requires at least one rule"
        )
    payload = F.col(f"`{col}`")
    valid = F.json_object_keys(payload).isNotNull()
    entries = [
        F.struct(
            F.lit(PAYLOAD_RULE).alias("rule"),
            (payload.isNotNull() & ~valid).cast("int").alias("viol"),
        )
    ]
    # one from_json parse per row, materialized as a projected column
    # (json_contract_pre_columns) so schema pruning can't split it back
    # into per-rule parses; {} on conflicting paths -> get_json_object
    pre = json_contract_pre_columns(rules, col=col)
    values = _rule_values(
        payload, rules, parsed=F.col(PARSED_COL) if pre else None
    )
    for r, v in zip(rules, values):
        facets = _facet_exprs(valid, v, r)
        entries.append(
            F.struct(
                F.lit(r.label).alias("rule"),
                _violated_expr(facets, r).cast("int").alias("viol"),
            )
        )
    src = stream_df.withWatermark(time_col, watermark_delay)
    if pre:
        src = src.withColumns(pre)
    exploded = (
        src.select(
            F.col(time_col).alias("_ts"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .select("_ts", "e.rule", "e.viol")
    )
    return (
        exploded.groupBy(F.window("_ts", window_duration).alias("w"), "rule")
        .agg(
            F.sum("viol").cast("bigint").alias("n_violations"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rule",
            "n_violations",
            "n_rows",
        )
    )


def violation_running_totals(
    stream_df: DataFrame,
    contract: Contract,
    *,
    key_col: str,
) -> DataFrame:
    """Custom stateful operator: cumulative violation totals per key
    across the whole stream lifetime (``applyInPandasWithState``).

    Windowed counts (:func:`violation_counts_stream`) expire with the
    watermark; some contracts instead need *lifetime* quality per
    partition key ("what is the all-time violation rate of source X?").
    That is unbounded-in-time but bounded-in-keys state — exactly the
    arbitrary-stateful-processing shape, so the per-key running totals
    live in Spark's state store (checkpointed, recovered on restart,
    ~two longs per key).

    Output per key per micro-batch (update mode):
      (key, batch_rows, batch_violations, total_rows, total_violations,
       violation_rate) where totals accumulate across batches/restarts.

    Hot path stays cheap: every rule facet is compiled to a Catalyst
    predicate (same rule compiler as the batch engine) and summed into
    ONE int column *before* the stateful exchange, so the Python state
    function only ever sums a pre-computed per-row violation count per
    Arrow batch — no per-row rule evaluation in Python, and the shuffle
    carries (key, int) not full rows.
    """
    import pandas as pd  # local: Arrow path only
    from pyspark.sql.streaming.state import GroupStateTimeout

    preds = violation_predicates(stream_df, contract)
    viol = None
    for _col, plist in preds.items():
        for _kind, p in plist:
            # NULL predicate (e.g. NULL value vs a range bound) is not a
            # violation and must not poison the row-wise sum
            term = F.when(p, F.lit(1)).otherwise(F.lit(0))
            viol = term if viol is None else viol + term
    if viol is None:
        viol = F.lit(0)
    enriched = stream_df.select(
        F.col(f"`{key_col}`").cast("string").alias("key"),
        viol.alias("_v"),
    )

    out_schema = (
        "key string, batch_rows long, batch_violations long, "
        "total_rows long, total_violations long, violation_rate double"
    )
    state_schema = "total_rows long, total_violations long"

    def _update(key, pdf_iter, state):
        batch_rows = 0
        batch_viols = 0
        for pdf in pdf_iter:
            batch_rows += len(pdf)
            batch_viols += int(pdf["_v"].sum())
        total_rows, total_viols = state.get if state.exists else (0, 0)
        total_rows += batch_rows
        total_viols += batch_viols
        state.update((total_rows, total_viols))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "batch_rows": batch_rows,
                    "batch_violations": batch_viols,
                    "total_rows": total_rows,
                    "total_violations": total_viols,
                    "violation_rate": (
                        total_viols / total_rows if total_rows else 0.0
                    ),
                }
            ]
        )

    return enriched.groupBy("key").applyInPandasWithState(
        _update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


class BatchVerdict:
    """Verdict for one micro-batch from :func:`validate_each_batch`."""

    def __init__(self, batch_id: int, result: ValidationResult, n_rows: int):
        self.batch_id = batch_id
        self.result = result
        self.n_rows = n_rows

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"BatchVerdict(batch_id={self.batch_id}, ok={self.result.ok}, "
            f"issues={len(self.result.issues)}, rows={self.n_rows})"
        )


def validate_each_batch(
    stream_df: DataFrame,
    contract: Contract,
    *,
    checkpoint_dir: str,
    on_verdict: Optional[Callable[[BatchVerdict], None]] = None,
    strict: bool = True,
    available_now: bool = True,
):
    """Run the full fused contract pass on every micro-batch.

    Returns ``(query, verdicts)``: the StreamingQuery and a driver-side
    list that accumulates one :class:`BatchVerdict` per processed batch
    (also forwarded to ``on_verdict`` when given). The foreachBatch body
    is the batch engine verbatim — one fused aggregation per micro-batch,
    so semantics match offline validation exactly (the point: one
    contract, one code path, batch or stream).

    ``available_now=True`` processes the current backlog then stops —
    deterministic for tests/backfills; pass False for a continuous run.
    """
    verdicts: List[BatchVerdict] = []

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        result = validate_contract(batch_df, contract, strict=strict)
        v = BatchVerdict(batch_id, result, n)
        verdicts.append(v)
        if on_verdict is not None:
            on_verdict(v)

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), verdicts


def histogram_drift_stream(
    stream_df: DataFrame,
    baseline,
    *,
    column: str,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    eps: float = 1e-6,
) -> DataFrame:
    """Streaming distribution-drift monitor: per-window PSI and JS of a
    column against a baseline :class:`types.Histogram` (categorical
    labels or numeric equi-width bins — the same `_bucket_label`
    bucketing as the batch scorers, so the two paths bin identically) —
    the continuous-ingest counterpart of the batch E3/E4 checks.

    Design: ONE watermarked stateful aggregation whose state per window
    is a FIXED count vector — one ``count_if`` per declared baseline
    label plus a pooled ``__novel__`` bucket (values outside the
    baseline domain) — so state is O(|labels|) per open window
    regardless of stream volume, and the divergences are a pure
    projection over the finished aggregate row (no second stateful
    stage, which Structured Streaming would reject in append mode
    anyway).

    Formula parity with the batch scorers (``operators/drift.py``):
    PSI = Σ (p−q)·ln(p/q) with both sides eps-floored, over non-NULL
    mass; JS = base-2 Jensen-Shannon with no smoothing (0-mass terms
    contribute 0). One DOCUMENTED difference: all novel values pool
    into a single bucket, while the batch scorer keys each novel label
    separately — a streaming aggregate cannot enumerate labels it has
    not declared. Empty windows (no non-NULL rows) report 0.0, matching
    the batch ``total == 0`` convention.

    Output per window: (window_start, window_end, n_rows, n_observed,
    novel_frac, psi, js).
    """
    from pyspark.sql import types as T

    from ..operators.drift import (
        _bucket_label,
        divergence_columns,
        fixed_vector_aggs,
    )
    from ..plans.rule_compiler import categorical_cast

    c = F.col(column)
    # bucketing parity with the batch path (observed_histogram_df):
    # boolean categoricals render pandas-style 'True'/'False' there, so
    # a batch-captured baseline would otherwise NEVER match Spark's
    # plain 'true'/'false' cast and every row would pool as novel
    dt = stream_df.schema[column].dataType
    if baseline.kind == "categorical" and isinstance(dt, T.BooleanType):
        c = categorical_cast(c, dt)
    lbl = _bucket_label(c, baseline)
    labels = [str(x) for x in baseline.labels]
    agg = (
        stream_df.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(time_col, window_duration).alias("_w"))
        .agg(*fixed_vector_aggs(c, lbl, labels))
    )
    d = divergence_columns([float(x) for x in baseline.fracs], eps=eps)
    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        F.col("n_rows"),
        d["n_observed"].alias("n_observed"),
        d["novel_frac"].alias("novel_frac"),
        d["psi"].alias("psi"),
        d["js"].alias("js"),
    )


def category_drift_stream(
    stream_df: DataFrame,
    baseline,
    *,
    column: str,
    time_col: str,
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    eps: float = 1e-6,
) -> DataFrame:
    """Categorical-only front door for :func:`histogram_drift_stream`
    (raises on a numeric baseline so a caller who meant bins gets a
    clear error instead of label-string equality against bin indices)."""
    if baseline.kind != "categorical":
        raise ValueError(
            f"category_drift_stream needs a categorical baseline, "
            f"got kind={baseline.kind!r} — use histogram_drift_stream"
        )
    return histogram_drift_stream(
        stream_df,
        baseline,
        column=column,
        time_col=time_col,
        window_duration=window_duration,
        watermark_delay=watermark_delay,
        eps=eps,
    )
