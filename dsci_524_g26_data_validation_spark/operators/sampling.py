"""Deterministic hash sampling + bounded violation-rate estimation.

At 100 TB a full contract pass is hours; most pipeline gates only need
"is the violation rate plausibly below X?" — answerable from a sample
thousands of times smaller. Two properties a `df.sample()` can't give:

* **Deterministic and engine-portable.** Membership is a pure function
  of the row's id (top-60-bits-of-md5, the same portable-hash trick the
  simhash/fingerprint operators use), so the SAME rows are selected on
  every run, on every engine (the DuckDB oracle reproduces the sample
  exactly), across retries and resumes — a prerequisite for auditable
  gating decisions. `sample()` is seed-and-partitioning dependent.
* **Honest uncertainty.** The estimate comes with a Wilson score
  interval (the binomial interval that behaves at p≈0, exactly where
  violation rates live — the normal approximation collapses there), so
  callers gate on ``rate_hi`` (upper bound), not the point estimate.

100 TB shape: the membership predicate is row-local (no shuffle, no
state); it evaluates right after the scan so everything downstream sees
``fraction``·N rows. It cannot push into the parquet reader (md5 of a
column isn't a min/max-prunable predicate) — the scan still reads the id
column of every row group, but only sampled rows survive to the first
exchange, which is where the cost lives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "portable_hash64",
    "hash_sample",
    "violation_rate_estimate",
    "stratified_hash_sample",
    "mixture_report",
    "mixture_plan",
    "wilson_interval_cols",
]

#: Sample-bucket granularity: fraction resolution is 1/_BUCKETS.
_BUCKETS = 1_000_000

#: z for a 95% two-sided Wilson interval. Fixed (not a parameter forced
#: through norm.ppf) so the oracle SQL carries the identical literal.
_Z95 = 1.959964


def portable_hash64(col: Column) -> Column:
    """Top 60 bits of md5 as a non-negative bigint.

    Renderable identically by any engine with md5 — DuckDB spells it
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``. Used instead of
    the (faster, JVM-only) xxhash64 wherever cross-engine reproducibility
    is the point.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame,
    *,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic ``fraction``-sample: keep rows whose
    ``portable_hash64(salt || id) mod 1e6`` falls under the cutoff.

    ``salt`` selects an independent sample from the same ids (vary it to
    draw disjoint audit samples; same salt ⇒ same rows forever). NULL
    ids hash as the bare salt — all NULL-id rows land in one bucket
    together, in or out as a unit.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    cutoff = int(round(fraction * _BUCKETS))
    if cutoff == 0:
        raise ValueError(
            f"fraction {fraction} is below the 1/{_BUCKETS} resolution"
        )
    h = portable_hash64(
        F.concat(F.lit(salt), F.coalesce(F.col(id_col).cast("string"), F.lit("")))
    )
    return df.filter(F.pmod(h, F.lit(_BUCKETS)) < F.lit(cutoff))


def wilson_interval_cols(n_col: Column, k_col: Column):
    """(p, center, half) Columns of the 95% Wilson score interval for
    k successes in n trials — interval is [center-half, center+half],
    clamp to [0,1] at the call site. Shared by the one-row sample
    estimate and the per-slice triage report so both carry the exact
    same literal arithmetic the oracle SQL replicates."""
    n = n_col.cast("double")
    z2 = F.lit(_Z95 * _Z95)
    p = k_col / n
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        F.lit(_Z95)
        * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
        / denom
    )
    return p, center, half


def violation_rate_estimate(
    df: DataFrame,
    predicate: str,
    *,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """ONE-row Wilson-bounded estimate of ``fraction-of-rows violating
    predicate`` from a deterministic hash sample.

    ``predicate`` is a Spark SQL boolean expression naming the
    INVARIANT that must hold (e.g. ``"l_quantity <= 45"``); a row
    violates when the invariant is false, and NULL evaluations count as
    violations ("couldn't establish the property"), matching the
    engine's check semantics.

    Columns: ``sample_n``, ``violations``, ``rate`` (point estimate),
    ``rate_lo``/``rate_hi`` (95% Wilson score bounds). Gate on
    ``rate_hi < budget``: at 0.1% sampling of 10^11 rows the sample is
    ~10^8 rows, so the interval width is ~1e-4 — tight enough for any
    realistic violation budget, at 1/1000 the cost of the full pass.

    The whole computation is one row-local filter + a single-row
    aggregate (count / count_if) + literal arithmetic: fully lazy, no
    shuffle beyond the one-row final exchange, and every number is
    reproducible in ANSI SQL (the driver oracle recomputes sample
    membership AND the interval).
    """
    sample = hash_sample(df, id_col=id_col, fraction=fraction, salt=salt)
    viol = F.coalesce(~F.expr(predicate), F.lit(True))
    agg = sample.agg(
        F.count(F.lit(1)).cast("bigint").alias("sample_n"),
        F.count_if(viol).cast("bigint").alias("violations"),
    )
    p, center, half = wilson_interval_cols(
        F.col("sample_n"), F.col("violations")
    )
    empty = F.col("sample_n") == 0
    return agg.select(
        "sample_n",
        "violations",
        F.round(F.when(empty, F.lit(None)).otherwise(p), 9).alias("rate"),
        F.round(
            F.when(empty, F.lit(None)).otherwise(F.greatest(center - half, F.lit(0.0))),
            9,
        ).alias("rate_lo"),
        F.round(
            F.when(empty, F.lit(None)).otherwise(F.least(center + half, F.lit(1.0))),
            9,
        ).alias("rate_hi"),
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict,
    *,
    strata_col: str,
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling — dataset mixing/curriculum
    weighting as a reproducible operator: keep ``fractions[stratum]``
    of each stratum (web 10%, books 100%, code 50%…), membership a pure
    function of (salt, id), so the SAME mixture comes out on every
    engine, every run, every resume — the auditability requirement of
    a training-data recipe (a seeded ``sampleBy`` reshuffles with the
    partitioning).

    ``fractions``: stratum value (stringified) → fraction in [0, 1].
    Strata not listed get ``default_fraction`` (0.0 = drop unlisted —
    the allowlist posture for training mixtures; NULL strata are
    'unlisted' unless the dict carries an explicit ``None`` key).
    Fractions at 0 prune without hashing; at 1 keep without hashing —
    the common all-of-this-source case costs nothing.

    Scale shape: one row-local CASE over the (broadcast-literal)
    fraction table + the hash filter — no shuffle, no state, composable
    before any downstream dedup/validation. Resolution 1/1e6 per
    stratum (same bucket space as :func:`hash_sample`).
    """
    for k, v in fractions.items():
        if not 0.0 <= float(v) <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1], got {v}")
    if not 0.0 <= float(default_fraction) <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1]")
    s = F.col(f"`{strata_col}`").cast("string")
    cutoff = F.lit(int(round(float(default_fraction) * _BUCKETS)))
    null_frac = None
    for k, v in fractions.items():
        c = F.lit(int(round(float(v) * _BUCKETS)))
        if k is None:
            null_frac = c
            continue
        cutoff = F.when(s == F.lit(str(k)), c).otherwise(cutoff)
    if null_frac is not None:
        cutoff = F.when(s.isNull(), null_frac).otherwise(cutoff)
    h = portable_hash64(
        F.concat(
            F.lit(salt), F.coalesce(F.col(id_col).cast("string"), F.lit(""))
        )
    )
    return df.filter(
        (cutoff >= F.lit(_BUCKETS)) | (F.pmod(h, F.lit(_BUCKETS)) < cutoff)
    )


def mixture_report(
    df: DataFrame,
    sampled: DataFrame,
    *,
    strata_col: str,
) -> DataFrame:
    """Before/after census of a mixing run: (stratum, n_before,
    n_after, realized_fraction, share_of_mix). Two grouped counts
    (map-side combined, one tiny shuffle each) + a full-outer join on
    the stratum key — strata sampled to zero still appear, with
    n_after = 0. ``share_of_mix`` is each stratum's fraction of the
    SAMPLED corpus (the number the training recipe actually cares
    about), via an unpartitioned window over the strata-sized frame."""
    s = F.col(f"`{strata_col}`").cast("string").alias("stratum")
    before = df.select(s).groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = sampled.select(s).groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    w = Window.partitionBy()
    return (
        before.join(after, "stratum", "full_outer")
        .select(
            "stratum",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
        .select(
            "*",
            F.round(F.col("n_after") / F.col("n_before"), 6).alias(
                "realized_fraction"
            ),
            F.round(
                F.col("n_after") / F.sum("n_after").over(w), 6
            ).alias("share_of_mix"),
        )
        .orderBy("stratum")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict,
    *,
    token_budget: int,
    group_col: str = "source",
    tokens_col: Optional[str] = None,
    text_col: Optional[str] = "text",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-recipe planning: per-source token supply vs the mixture's
    demand → (stratum, available_tokens, weight, target_tokens, epochs,
    over_epoch_cap, share_of_budget).

    The question behind every mixture spec (LLaMA/Chinchilla-style
    "web 67%, code 8%…"): does each source HAVE enough tokens for its
    share of the training budget, and how many epochs of it would the
    recipe imply? ``epochs`` > ~4 is the documented regime where
    repetition stops helping (public scaling-law folklore; the cap is a
    parameter) — ``over_epoch_cap`` flags those strata, which is the
    signal to re-weight or acquire more data.

    Token supply comes from ONE scan: ``tokens_col`` (array column →
    ``size``) if given, else whitespace counts over ``text_col``.
    Strata missing from ``weights`` get weight 0 (excluded from the
    recipe but still reported — dropping a source silently is how
    mixtures rot). All arithmetic is in the frame, so the plan is
    engine-checkable like any other query.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    total_w = sum(float(v) for v in weights.values())
    if not weights or abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"weights must be non-empty and sum to 1, got {total_w}")
    if any(float(v) < 0 for v in weights.values()):
        raise ValueError("weights must be >= 0")
    if tokens_col is not None:
        n_tok = F.size(F.col(f"`{tokens_col}`"))
        n_tok = F.when(n_tok >= 0, n_tok).otherwise(F.lit(0))
    elif text_col is not None:
        from .text import token_count_expr

        n_tok = F.coalesce(token_count_expr(text_col), F.lit(0))
    else:
        raise ValueError("one of tokens_col / text_col is required")
    supply = (
        df.select(F.col(f"`{group_col}`").alias("stratum"), n_tok.alias("_n"))
        .groupBy("stratum")
        .agg(F.sum("_n").alias("available_tokens"))
    )
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    w = F.coalesce(wmap[F.col("stratum")], F.lit(0.0))
    target = F.round(w * F.lit(float(token_budget)), 6)
    epochs = F.when(
        F.col("available_tokens") > 0,
        F.round(target / F.col("available_tokens"), 6),
    )  # NULL epochs: the recipe demands tokens a supply-less stratum lacks
    return supply.select(
        "stratum",
        "available_tokens",
        F.round(w, 6).alias("weight"),
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        F.coalesce(epochs > F.lit(float(max_epochs)), w > 0).alias(
            "over_epoch_cap"
        ),
        F.round(target / F.lit(float(token_budget)), 6).alias(
            "share_of_budget"
        ),
    )
