"""Conversation-structure validation for instruction-tuning corpora.

Chat/SFT training data has per-SEQUENCE invariants no column contract
can express: roles must come from the declared set, the first turn must
open the conversation (system prompt or user), system turns belong at
the top only, adjacent turns must not repeat a role (the
user/assistant alternation every chat template assumes — a repeated
role silently merges two training examples or truncates a reply), and
no turn may carry empty content. Violations of these are the classic
silent SFT-data corruptions: the template renders, the loss masks
shift, and the model trains on garbage without a single job failing.

Operates on the exploded "turns" shape (conv_id, order, role, content)
— one row per turn, the layout conversations land in after ingest (an
``array<struct>`` column explodes to it row-locally).

100 TB shape: the sessionize plan — ONE hash exchange on the
conversation key feeding ONE sorted window (lag + row_number share the
frame); every check is then a row-local predicate, and the per-turn
violation rows come from a lazy ``inline`` unpivot that prunes clean
turns before exploding. The census is the same window pass folded by
conversation (map-side combined).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["conversation_violations", "conversation_census"]

#: violation kinds emitted, in emission order
CHAT_VIOLATION_KINDS = (
    "unknown_role",
    "empty_content",
    "bad_first_role",
    "system_not_first",
    "role_repeat",
)


def _turn_checks(
    roles: Sequence[str],
    opening_roles: Sequence[str],
) -> Sequence[Tuple[str, Column]]:
    """(kind, fired-predicate) per check over the windowed columns
    ``role`` / ``content`` / ``_rn`` / ``_prev_role``."""
    role = F.col("role")
    known = role.isin(list(roles))
    first = F.col("_rn") == 1
    return (
        # NULL role is unknown (guard each predicate's 3VL explicitly)
        ("unknown_role", role.isNull() | ~known),
        (
            "empty_content",
            F.col("content").isNull()
            | (F.trim(F.col("content")) == F.lit("")),
        ),
        # only sensible for known roles — an unknown first role already
        # fired unknown_role; double-reporting would double-count it
        ("bad_first_role", first & known & ~role.isin(list(opening_roles))),
        ("system_not_first", ~first & known & (role == F.lit("system"))),
        (
            "role_repeat",
            ~first & (role.eqNullSafe(F.col("_prev_role"))),
        ),
    )


def _windowed(
    df: DataFrame,
    *,
    conv_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    w = Window.partitionBy(F.col(f"`{conv_col}`")).orderBy(
        *[F.col(f"`{c}`") for c in order_cols]
    )
    return df.select(
        F.col(f"`{conv_col}`").alias("conv_id"),
        *[F.col(f"`{c}`") for c in order_cols],
        "role",
        "content",
        F.row_number().over(w).alias("_rn"),
        F.lag("role").over(w).alias("_prev_role"),
    )


def conversation_violations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    content_col: str = "content",
    roles: Sequence[str] = ("system", "user", "assistant"),
    opening_roles: Sequence[str] = ("system", "user"),
) -> DataFrame:
    """Per-turn violation rows → (conv_id, turn, role, kind), one row
    per (turn, fired check); a turn can fire several kinds.

    ``order_cols`` must be a deterministic total order within a
    conversation (add a tiebreak column if timestamps can collide —
    alternation is only defined under a stable order). NULL roles fire
    ``unknown_role``; a NULL previous role never fires ``role_repeat``
    (eqNullSafe), so turn 2 after a NULL-role turn 1 is judged on its
    own faults only.
    """
    turns = _windowed(
        df.withColumnRenamed(role_col, "role").withColumnRenamed(
            content_col, "content"
        ),
        conv_col=conv_col,
        order_cols=order_cols,
    )
    checks = _turn_checks(roles, opening_roles)
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
    return (
        turns
        # prune clean turns BEFORE the explode — violations are rare
        .filter(any_fired)
        .select(
            "conv_id",
            F.col("_rn").alias("turn"),
            "role",
            F.inline(F.array(*structs)),
        )
        .filter(F.col("_fired"))
        .drop("_fired")
    )


def conversation_census(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    order_cols: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    content_col: str = "content",
    roles: Sequence[str] = ("system", "user", "assistant"),
    opening_roles: Sequence[str] = ("system", "user"),
) -> DataFrame:
    """Per-conversation verdicts → (conv_id, n_turns,
    n_<kind>… per check, n_violations, ok) — the triage frame: which
    conversations to drop or repair, and the corpus pass rate.

    Same single window pass as :func:`conversation_violations`, folded
    by conversation with map-side combine (the aggregate is
    O(conversations), never O(turns), past the exchange).
    """
    turns = _windowed(
        df.withColumnRenamed(role_col, "role").withColumnRenamed(
            content_col, "content"
        ),
        conv_col=conv_col,
        order_cols=order_cols,
    )
    checks = _turn_checks(roles, opening_roles)
    aggs = [F.count(F.lit(1)).alias("n_turns")]
    total = None
    for kind, fired in checks:
        cnt = F.count_if(F.coalesce(fired, F.lit(False)))
        aggs.append(cnt.alias(f"n_{kind}"))
        total = cnt if total is None else total + cnt
    aggs.append(total.alias("n_violations"))
    aggs.append((total == 0).alias("ok"))
    return turns.groupBy("conv_id").agg(*aggs)
