"""Join pre-flight: predicted join cardinality and hot-key report.

The most expensive failure on a shared cluster is the join that
"worked at sf0.01" and explodes in production — a many-to-many key
nobody declared (the double-booked dimension row, the NULL-adjacent
default key, the re-crawled URL). Both sides' row counts say nothing:
join output is Σ_k count_left(k)·count_right(k), a quantity dominated
by a handful of hot keys.

:func:`join_explosion_report` computes that sum EXACTLY before any
join runs, plus the key-overlap census (orphan keys each side — the
referential-integrity picture at key granularity) and the worst
single-key fan-out. :func:`hot_join_keys` names the offending keys —
the input `operators.skew.suggested_salt` needs to size a salted join.

100 TB shape: each side collapses to its (key, count) frame first
(map-side combine — the exchange carries one partial per distinct key
per task, never rows), the full-outer join runs on those two
key-frames, and the report is a 1-row fold. Nothing about the real
join is materialized; cost ~ two distinct-count aggregations.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["join_explosion_report", "hot_join_keys", "key_overlap_sketch"]


def _key_counts(df: DataFrame, keys: Sequence[str], side: str) -> DataFrame:
    if not keys:
        raise ValueError("keys must name at least one column")
    return df.groupBy(
        *[F.col(f"`{k}`").alias(k) for k in keys]
    ).agg(F.count(F.lit(1)).alias(f"_c_{side}"))


def _joined_counts(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Full-outer join of the two (key, count) frames on STRICT key
    equality — equality is FALSE on NULL operands, so NULL-key groups
    never pair and flow through as orphan rows carrying ``_lnull`` /
    ``_rnull`` flags instead. One aggregation per side, one join: each
    input is scanned exactly once (branching the count frames into a
    separate null-mass aggregate would re-run the scans — Spark shares
    no subplans across DataFrame branches)."""
    lc = _key_counts(left, keys, "l").alias("l")
    rc = _key_counts(right, keys, "r").alias("r")

    def any_null(side: str):
        cond = None
        for k in keys:
            c = F.col(f"{side}.{k}").isNull()
            cond = c if cond is None else cond | c
        return cond

    on = None
    for k in keys:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        on = eq if on is None else on & eq
    j = lc.join(rc, on=on, how="full_outer").select(
        *[F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys],
        F.col("_c_l"),
        F.col("_c_r"),
        F.coalesce(F.col("_c_l").isNotNull() & any_null("l"), F.lit(False)).alias(
            "_lnull"
        ),
        F.coalesce(F.col("_c_r").isNotNull() & any_null("r"), F.lit(False)).alias(
            "_rnull"
        ),
    )
    return j


def join_explosion_report(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
) -> DataFrame:
    """ONE row → (n_rows_left, n_rows_right, n_keys_left, n_keys_right,
    n_shared_keys, n_keys_left_only, n_keys_right_only, join_rows,
    max_key_fanout, null_key_rows_left, null_key_rows_right).

    ``join_rows`` is the EXACT inner-join output cardinality
    (Σ over shared keys of count_l·count_r) — compare to
    max(n_rows_left, n_rows_right) before submitting the real thing.
    ``max_key_fanout`` is the largest single-key product (the skew
    ceiling a salted join must flatten). NULL keys never pair in an
    equi-join; their row mass is reported separately instead of
    silently inflating either side.
    """
    j = _joined_counts(left, right, keys)
    # decimal(38,0), not bigint: the per-key product (and the summed
    # cardinality) of two 10^12-row sides can pass 2^63, and under ANSI
    # (Spark 4 default) a bigint multiply would abort the pre-flight on
    # exactly the mega-hot-key it exists to detect. Same widening as
    # rowdiff.partition_digests.
    pair = (
        F.coalesce(F.col("_c_l"), F.lit(0)).cast("decimal(38,0)")
        * F.coalesce(F.col("_c_r"), F.lit(0))
    ).cast("decimal(38,0)")
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    lnull, rnull = F.col("_lnull"), F.col("_rnull")
    return j.agg(
        F.coalesce(F.sum("_c_l"), F.lit(0)).alias("n_rows_left"),
        F.coalesce(F.sum("_c_r"), F.lit(0)).alias("n_rows_right"),
        F.count_if(F.col("_c_l").isNotNull() & ~lnull).alias("n_keys_left"),
        F.count_if(F.col("_c_r").isNotNull() & ~rnull).alias("n_keys_right"),
        F.count_if(both).alias("n_shared_keys"),
        F.count_if(
            F.col("_c_l").isNotNull() & F.col("_c_r").isNull() & ~lnull
        ).alias("n_keys_left_only"),
        F.count_if(
            F.col("_c_r").isNotNull() & F.col("_c_l").isNull() & ~rnull
        ).alias("n_keys_right_only"),
        F.coalesce(F.sum(F.when(both, pair)), F.lit(0))
        .cast("decimal(38,0)")
        .alias("join_rows"),
        F.coalesce(F.max(F.when(both, pair)), F.lit(0))
        .cast("decimal(38,0)")
        .alias("max_key_fanout"),
        F.coalesce(F.sum(F.when(lnull, F.col("_c_l"))), F.lit(0)).alias(
            "null_key_rows_left"
        ),
        F.coalesce(F.sum(F.when(rnull, F.col("_c_r"))), F.lit(0)).alias(
            "null_key_rows_right"
        ),
    )


def hot_join_keys(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    top_k: int = 10,
) -> DataFrame:
    """The offending keys: top-``top_k`` shared keys by output fan-out →
    key columns + (n_left, n_right, join_rows). Feed the worst
    ``join_rows / tasks`` ratio into `skew.suggested_salt` to size the
    salted join. Deterministic: ties break by the key values ascending.
    TakeOrderedAndProject over the key-count frame — no full sort.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be > 0, got {top_k}")
    j = _joined_counts(left, right, keys)
    both = F.col("_c_l").isNotNull() & F.col("_c_r").isNotNull()
    return (
        j.filter(both)
        .select(
            *keys,
            F.col("_c_l").alias("n_left"),
            F.col("_c_r").alias("n_right"),
            # decimal(38,0): a hot key's fan-out can pass 2^63 (see
            # join_explosion_report) — ANSI would abort the bigint cast
            (F.col("_c_l").cast("decimal(38,0)") * F.col("_c_r"))
            .cast("decimal(38,0)")
            .alias("join_rows"),
        )
        .orderBy(
            F.desc("join_rows"), *[F.asc(f"`{k}`") for k in keys]
        )
        .limit(top_k)
    )


# -- sketch-mode overlap pre-flight -------------------------------------------


def key_overlap_sketch(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    *,
    lg_k: int = 14,
) -> DataFrame:
    """Approximate key-overlap census from two HLL sketches — the
    pre-flight for joins where even the (key, count) frames are big.

    :func:`join_explosion_report` is exact but shuffles one row per
    distinct key per side; at 10^9-10^11 distinct keys on BOTH sides
    that pre-flight costs a real fraction of the join it guards. This
    sketch mode reduces each side to ONE ~2^lg_k-byte HLL (map-side
    merged, a one-row exchange), estimates the union by merging the two
    sketches, and derives the intersection by inclusion–exclusion:

        |A∩B| ≈ |A| + |B| − |A∪B|

    Returns one row: ``n_keys_left_est, n_keys_right_est,
    n_union_est, n_shared_est, containment_left, containment_right,
    jaccard_est, regime`` where ``containment_left`` = shared/left
    ("what fraction of my corpus keys have a dim row") — usually the
    number the referential question actually needs. ``regime`` is the
    operator's actual product — the triage label the error contract
    guarantees even where the estimates cannot be trusted:

    * ``"contained"`` — either containment ≥ 0.9 (one side is (nearly)
      a subset of the other; equal key sets land here);
    * ``"disjoint"``  — jaccard ≤ 0.02 (includes TRUE small overlaps:
      the subtraction error swamps the estimate there, and the honest
      answer is "≈ nothing within sketch noise — run the exact report
      if the exact small count matters");
    * ``"overlapping"`` — everything else.

    Error honesty: each HLL carries ~1.04/√2^lg_k relative error
    (~0.8% at lg_k=14), but inclusion–exclusion SUBTRACTS estimates,
    so the intersection's relative error blows up as the true overlap
    shrinks — at |A∩B| ≪ |A∪B| the estimate can even go negative
    (clamped to 0 here). This operator answers "mostly disjoint,
    mostly contained, or mostly overlapping"; for small-overlap
    precision run the exact report or an anti-join on the candidate
    side. NULL keys are excluded on both sides (SQL equality never
    matches them, so they can't join anyway — the exact report counts
    them separately).

    Multi-key joins sketch a length-prefixed rendering of the key
    tuple (``len(col):col`` per column, concatenated) — injective for
    ANY column content, including values containing the would-be
    separator byte, so disjoint composite keys are never conflated.
    (A plain ``concat_ws`` would render ``('a\\x1fb', 'c')`` and
    ``('a', 'b\\x1fc')`` identically and inflate the overlap.)
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")

    def sketch_of(df: DataFrame):
        cols = [F.col(f"`{k}`") for k in keys]
        nonnull = df
        for c in cols:
            nonnull = nonnull.filter(c.isNotNull())
        if len(keys) == 1:
            key_expr = cols[0].cast("string")
        else:
            key_expr = F.concat(
                *[
                    F.concat(
                        F.length(c.cast("string")).cast("string"),
                        F.lit(":"),
                        c.cast("string"),
                    )
                    for c in cols
                ]
            )
        return nonnull.agg(
            F.hll_sketch_agg(key_expr, int(lg_k)).alias("hll")
        )

    a = sketch_of(left).select(F.col("hll").alias("hll_a"))
    b = sketch_of(right).select(F.col("hll").alias("hll_b"))
    both = a.crossJoin(b)  # 1 row × 1 row
    est = both.select(
        F.hll_sketch_estimate("hll_a").alias("n_keys_left_est"),
        F.hll_sketch_estimate("hll_b").alias("n_keys_right_est"),
        F.hll_sketch_estimate(
            F.hll_union("hll_a", "hll_b")
        ).alias("n_union_est"),
    )
    shared = F.greatest(
        F.col("n_keys_left_est")
        + F.col("n_keys_right_est")
        - F.col("n_union_est"),
        F.lit(0),
    )
    out = est.select(
        "n_keys_left_est",
        "n_keys_right_est",
        "n_union_est",
        shared.alias("n_shared_est"),
        F.when(
            F.col("n_keys_left_est") > 0,
            shared / F.col("n_keys_left_est"),
        ).alias("containment_left"),
        F.when(
            F.col("n_keys_right_est") > 0,
            shared / F.col("n_keys_right_est"),
        ).alias("containment_right"),
        F.when(
            F.col("n_union_est") > 0, shared / F.col("n_union_est")
        ).alias("jaccard_est"),
    )
    cl = F.coalesce(F.col("containment_left"), F.lit(0.0))
    cr = F.coalesce(F.col("containment_right"), F.lit(0.0))
    jac = F.coalesce(F.col("jaccard_est"), F.lit(0.0))
    return out.withColumn(
        "regime",
        F.when(F.greatest(cl, cr) >= 0.9, F.lit("contained"))
        .when(jac <= 0.02, F.lit("disjoint"))
        .otherwise(F.lit("overlapping")),
    )
