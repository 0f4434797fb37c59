"""Preference-pair (RLHF/DPO) dataset validation.

Preference data has failure modes plain text corpora don't: a pair
where chosen and rejected are IDENTICAL carries zero preference signal
(and, under DPO, pushes gradients through noise); an empty side turns
the pair into an unconditional length prior; a response that merely
echoes the prompt teaches parroting; and the same prompt appearing in
many pairs silently over-weights it (and, if the duplicates disagree,
injects label noise). All of it ships in real exports — dedup passes
built for documents never look INSIDE the pair structure.

Operates on the flat pair shape (prompt, chosen, rejected[, id]) — one
row per comparison, the layout preference exports land in.

100 TB shape: every per-pair check is a row-local predicate over one
scan, assembled by the same lazy ``inline`` unpivot as the other
row-rule operators (clean pairs are pruned BEFORE the explode); the
duplicate-prompt census groups 16-byte prompt digests with map-side
combine, so prompt text never crosses an exchange; the one-row census
folds the same scan.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "preference_pair_violations",
    "duplicate_prompt_census",
    "preference_pair_report",
]

#: violation kinds, in emission order
PREFERENCE_VIOLATION_KINDS = (
    "identical_responses",
    "empty_prompt",
    "empty_chosen",
    "empty_rejected",
    "chosen_echoes_prompt",
    "rejected_echoes_prompt",
)


def _blank(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == F.lit(""))


def _pair_checks(
    prompt: Column, chosen: Column, rejected: Column
) -> Sequence[Tuple[str, Column]]:
    return (
        # null-safe: two NULL responses are still indistinguishable
        ("identical_responses", chosen.eqNullSafe(rejected)),
        ("empty_prompt", _blank(prompt)),
        ("empty_chosen", _blank(chosen)),
        ("empty_rejected", _blank(rejected)),
        # echo = the response IS the prompt (trimmed); composing with
        # normalize_text upstream catches sloppier echoes
        (
            "chosen_echoes_prompt",
            ~_blank(chosen) & (F.trim(chosen) == F.trim(prompt)),
        ),
        (
            "rejected_echoes_prompt",
            ~_blank(rejected) & (F.trim(rejected) == F.trim(prompt)),
        ),
    )


def preference_pair_violations(
    df: DataFrame,
    *,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    id_col: Optional[str] = None,
) -> DataFrame:
    """Per-pair violation rows → ([id,] kind), one row per fired check;
    a pair can fire several kinds. Row-local: one scan, no shuffle."""
    checks = _pair_checks(
        F.col(f"`{prompt_col}`"),
        F.col(f"`{chosen_col}`"),
        F.col(f"`{rejected_col}`"),
    )
    structs = [
        F.struct(
            F.lit(kind).alias("kind"),
            F.coalesce(fired, F.lit(False)).alias("_fired"),
        )
        for kind, fired in checks
    ]
    any_fired = None
    for _, fired in checks:
        f0 = F.coalesce(fired, F.lit(False))
        any_fired = f0 if any_fired is None else any_fired | f0
    keep = [F.col(f"`{id_col}`").alias("pair_id")] if id_col else []
    return (
        df.filter(any_fired)
        .select(*keep, F.inline(F.array(*structs)))
        .filter(F.col("_fired"))
        .drop("_fired")
    )


def duplicate_prompt_census(
    df: DataFrame,
    *,
    prompt_col: str = "prompt",
    id_col: Optional[str] = None,
    min_pairs: int = 2,
) -> DataFrame:
    """Prompts appearing in ≥ ``min_pairs`` pairs →
    (prompt_hash, n_pairs[, min_id]) — the over-weighted prompts whose
    conflicting labels are noise and whose agreeing labels are an
    implicit duplicate-weighting nobody declared.

    md5 digest groupBy with map-side combine; prompt text never
    shuffles. NULL prompts digest together (they are also individually
    flagged by ``empty_prompt``)."""
    if min_pairs < 2:
        raise ValueError(f"min_pairs must be >= 2, got {min_pairs}")
    digest = F.md5(
        F.coalesce(F.col(f"`{prompt_col}`").cast("string"), F.lit(""))
    )
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    if id_col:
        aggs.append(F.min(F.col(f"`{id_col}`")).alias("min_id"))
    return (
        df.select(digest.alias("prompt_hash"), "*")
        .groupBy("prompt_hash")
        .agg(*aggs)
        .filter(F.col("n_pairs") >= F.lit(min_pairs))
    )


def preference_pair_report(
    df: DataFrame,
    *,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """ONE row → (n_pairs, n_<kind>… per check, n_bad_pairs,
    n_dup_prompts, n_pairs_with_dup_prompt, ok) — the gate: feed
    ``ok`` to CI, the counts to triage.

    One scan for the pair facets (every counter rides the same fused
    aggregate) + the digest frame for prompt duplication; both
    aggregates are O(1)/O(distinct prompts) past their map-side
    combines."""
    p = F.col(f"`{prompt_col}`")
    c = F.col(f"`{chosen_col}`")
    r = F.col(f"`{rejected_col}`")
    checks = _pair_checks(p, c, r)
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    any_fired = None
    for kind, fired in checks:
        f0 = F.coalesce(fired, F.lit(False))
        aggs.append(F.count_if(f0).alias(f"n_{kind}"))
        any_fired = f0 if any_fired is None else any_fired | f0
    aggs.append(F.count_if(any_fired).alias("n_bad_pairs"))
    base = df.agg(*aggs)
    dup = (
        duplicate_prompt_census(df, prompt_col=prompt_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_prompts"),
            F.coalesce(F.sum("n_pairs"), F.lit(0)).alias(
                "n_pairs_with_dup_prompt"
            ),
        )
    )
    return base.crossJoin(F.broadcast(dup)).withColumn(
        "ok",
        (F.col("n_bad_pairs") == 0) & (F.col("n_dup_prompts") == 0),
    )
