"""E3/E4 — distribution drift: observed histograms + chi-square / PSI.

The reference's drift detection is metadata-only (compare_contracts);
the north star (BASELINE.json:6) adds data-level drift: compare an
observed distribution against a baseline histogram stored in the
(extended) contract.

Plan shape: **one scan captures the histograms of every watched column**
— each row emits an array of (column, bucket-label) structs which is
exploded and hash-aggregated by (column, label). One scan + one shuffle
for any number of columns, versus one job per column naively. The
chi-square / PSI folds run on the driver over (bins ≪ data) counts.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Mapping, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..plans.rule_compiler import categorical_cast
from ..types import Histogram

__all__ = [
    "NULL_LABEL",
    "OTHER_LABEL",
    "capture_histograms",
    "observed_histogram_df",
    "fused_drift_terms",
    "drift_scores_from_counts",
    "chi_square",
    "psi",
    "ks",
    "js",
    "emd",
    "drift_scores",
    "token_histogram",
    "token_distribution_drift",
    "token_drift_movers",
    "unseen_categories",
    "expected_distribution_check",
    "fixed_vector_aggs",
    "divergence_columns",
    "drift_calendar",
]

NULL_LABEL = "__null__"
OTHER_LABEL = "__other__"
_EPS = 1e-9


def _bucket_label(col: F.Column, h: Histogram) -> F.Column:
    """Bucket expression for one column under a baseline histogram."""
    if h.kind == "categorical":
        return F.coalesce(col.cast("string"), F.lit(NULL_LABEL))
    lo, hi, n = float(h.lo), float(h.hi), int(h.n_bins)
    width = (hi - lo) / n if hi > lo else 1.0
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(width)) + 1
    idx = (
        F.when(col.isNull(), F.lit(None).cast("bigint"))
        .when(col.cast("double") < lo, F.lit(0))
        .when(col.cast("double") >= hi, F.lit(n + 1))
        .otherwise(F.least(raw, F.lit(n)))  # guard FP edge at hi
    )
    return F.coalesce(idx.cast("string"), F.lit(NULL_LABEL))


def observed_histogram_df(
    df: DataFrame, histograms: Mapping[str, Histogram]
) -> DataFrame:
    """(column, label, cnt) for every watched column in ONE scan."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    entries = []
    for c, h in histograms.items():
        col = F.col(f"`{c}`")
        if h.kind == "categorical" and isinstance(schema.get(c), T.BooleanType):
            col = categorical_cast(col, schema[c])
        entries.append(
            F.struct(F.lit(c).alias("column"), _bucket_label(col, h).alias("label"))
        )
    return (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .groupBy(F.col("e.column").alias("column"), F.col("e.label").alias("label"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def capture_histograms(
    df: DataFrame,
    *,
    categorical_cols: Iterable[str] = (),
    numeric_bins: Optional[Mapping[str, Tuple[float, float, int]]] = None,
) -> Dict[str, Histogram]:
    """Profile ``df`` into baseline Histograms (to store in a contract).

    ``numeric_bins``: column → (lo, hi, n_bins) equi-width spec; derive
    lo/hi from infer_contract's fused min/max pass. NULLs are excluded
    from baseline mass (fractions are over non-null rows of each column).
    """
    specs: Dict[str, Histogram] = {}
    for c in categorical_cols:
        specs[c] = Histogram(labels=(), fracs=(), kind="categorical")
    for c, (lo, hi, n) in (numeric_bins or {}).items():
        specs[c] = Histogram(
            labels=(), fracs=(), kind="numeric", lo=float(lo), hi=float(hi), n_bins=int(n)
        )
    if not specs:
        return {}
    rows = observed_histogram_df(df, specs).collect()
    by_col: Dict[str, Dict[str, int]] = {}
    for r in rows:
        by_col.setdefault(r["column"], {})[r["label"]] = int(r["cnt"])
    out: Dict[str, Histogram] = {}
    for c, spec in specs.items():
        counts = {k: v for k, v in by_col.get(c, {}).items() if k != NULL_LABEL}
        total = sum(counts.values())
        labels = tuple(sorted(counts))
        fracs = tuple((counts[l] / total) if total else 0.0 for l in labels)
        out[c] = Histogram(
            labels=labels,
            fracs=fracs,
            kind=spec.kind,
            lo=spec.lo,
            hi=spec.hi,
            n_bins=spec.n_bins,
        )
    return out


def _align(baseline: Histogram, observed_counts: Mapping[str, int]):
    """Union of labels → (baseline frac, observed frac) pairs."""
    obs = {k: v for k, v in observed_counts.items() if k != NULL_LABEL}
    total = sum(obs.values())
    base = dict(zip(baseline.labels, baseline.fracs))
    labels = sorted(set(base) | set(obs))
    q = [base.get(l, 0.0) for l in labels]
    p = [(obs.get(l, 0) / total) if total else 0.0 for l in labels]
    return labels, p, q, total


def chi_square(baseline: Histogram, observed_counts: Mapping[str, int]) -> float:
    """Pearson χ² of observed counts vs baseline-expected counts.

    Labels absent from the baseline get expected mass _EPS — a genuinely
    novel category yields a very large (finite) statistic.
    """
    labels, p, q, total = _align(baseline, observed_counts)
    if total == 0:
        return 0.0
    stat = 0.0
    for pi, qi in zip(p, q):
        e = max(qi, _EPS) * total
        o = pi * total
        stat += (o - e) ** 2 / e
    return stat


def psi(baseline: Histogram, observed_counts: Mapping[str, int], *, eps: float = 1e-6) -> float:
    """Population Stability Index Σ (p−q)·ln(p/q), eps-smoothed.

    Common reading: <0.1 stable, 0.1–0.25 moderate, >0.25 major shift.
    """
    _, p, q, total = _align(baseline, observed_counts)
    if total == 0:
        return 0.0
    val = 0.0
    for pi, qi in zip(p, q):
        pi, qi = max(pi, eps), max(qi, eps)
        val += (pi - qi) * math.log(pi / qi)
    return val


def ks(baseline: Histogram, observed_counts: Mapping[str, int]) -> float:
    """Kolmogorov-Smirnov statistic (binned): max |CDF_obs − CDF_base|.

    Complements PSI/chi-square — KS is sensitive to LOCATION shifts
    (mean/median drift) that spread mass to adjacent bins, which
    per-bin divergences under-weight. Numeric histograms order bins by
    index (underflow 0 … overflow n+1); for categorical histograms
    (no natural order) this degrades to the L∞ distance
    max |p_i − q_i| — still a valid, bounded [0,1] drift signal.
    Conventional read: two-sample KS at α=0.05 rejects around
    1.36·√(2/n_per_bin-ish); for drift monitoring treat >0.1 as
    moderate, >0.25 as major (same bands as PSI in practice).
    """
    labels, p, q, total = _align(baseline, observed_counts)
    if total == 0:
        return 0.0
    if baseline.kind == "numeric":
        def key(lab: str):
            s = lab.lstrip("-")
            return (0, int(lab)) if s.isdigit() else (1, 0)  # novel last

        order = sorted(range(len(labels)), key=lambda i: key(labels[i]))
        cum_p = cum_q = 0.0
        stat = 0.0
        for i in order:
            cum_p += p[i]
            cum_q += q[i]
            stat = max(stat, abs(cum_p - cum_q))
        return stat
    return max((abs(pi - qi) for pi, qi in zip(p, q)), default=0.0)


def js(baseline: Histogram, observed_counts: Mapping[str, int]) -> float:
    """Jensen-Shannon divergence (base-2): ½KL(p‖m) + ½KL(q‖m), m=(p+q)/2.

    The bounded, symmetric member of the drift family — always in
    [0, 1], defined even when a bin has zero mass on one side (where
    PSI needs eps-smoothing and KL is infinite), and symmetric in
    (baseline, observed) so A-vs-B equals B-vs-A. No smoothing needed:
    0·log(0/m) ≡ 0 and m > 0 whenever either side has mass.
    Practical bands: <0.02 stable, 0.02–0.1 moderate, >0.1 major.
    """
    _, p, q, total = _align(baseline, observed_counts)
    if total == 0:
        return 0.0
    val = 0.0
    for pi, qi in zip(p, q):
        m = (pi + qi) / 2.0
        if pi > 0.0:
            val += 0.5 * pi * math.log2(pi / m)
        if qi > 0.0:
            val += 0.5 * qi * math.log2(qi / m)
    return val


def emd(baseline: Histogram, observed_counts: Mapping[str, int]) -> float:
    """Earth mover's distance (binned Wasserstein-1): Σ |CDF_p − CDF_q|·Δx.

    The MAGNITUDE member of the drift family — KS reports the largest
    single CDF gap (how *confident* the shift is), EMD integrates every
    gap (how *far* the mass moved, in the column's own units): a uniform
    +1-bin shift of all mass gives EMD = one bin width while KS saturates
    the same as a tiny local spill. Numeric histograms use the KS bin
    ordering (underflow 0 … overflow n+1, novel last) and scale by the
    equi-width bin size, so the result reads in value units (dollars,
    token counts, …) under the histogram's piecewise approximation.
    Categorical histograms have no transport metric, so this degrades to
    total variation distance ½·Σ|p−q| ∈ [0,1] — the EMD under the
    discrete 0/1 ground metric.
    """
    labels, p, q, total = _align(baseline, observed_counts)
    if total == 0:
        return 0.0
    if baseline.kind == "numeric":
        def key(lab: str):
            s = lab.lstrip("-")
            return (0, int(lab)) if s.isdigit() else (1, 0)  # novel last

        order = sorted(range(len(labels)), key=lambda i: key(labels[i]))
        width = (
            (float(baseline.hi) - float(baseline.lo)) / int(baseline.n_bins)
            if baseline.hi is not None
            and baseline.lo is not None
            and float(baseline.hi) > float(baseline.lo)
            else 1.0
        )
        cum = 0.0
        stat = 0.0
        for i in order:
            cum += p[i] - q[i]
            stat += abs(cum)
        # the final cumulative term is |1 − 1| = 0, so summing over every
        # position (instead of gaps only) adds nothing spurious
        return stat * width
    return 0.5 * sum(abs(pi - qi) for pi, qi in zip(p, q))


def fused_drift_terms(df: DataFrame, baselines: Mapping[str, Histogram]):
    """Compile observed-histogram capture into flat ``count_if`` aggregate
    terms so drift rides the SAME single-row fused aggregation as the
    column stats (no separate scan, no (column,label) shuffle).

    Possible because the baseline pins the label set: one ``count_if``
    per baseline label plus one ``__other__`` bucket for everything
    novel. vs. the groupBy path (:func:`observed_histogram_df`) the only
    semantic difference is that multiple novel categories aggregate into
    ONE novel bucket — which is also the only formulation whose state is
    bounded at 10^12 rows (a groupBy on a drifting high-cardinality
    column is not).

    Returns ``(terms, decode)`` where ``decode(extras)`` maps the
    aggregated values back to ``{column: {label: count}}`` ready for
    :func:`chi_square` / :func:`psi`.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    terms = []
    spec: Dict[str, Dict[str, str]] = {}
    for i, (c, h) in enumerate(baselines.items()):
        col = F.col(f"`{c}`")
        if h.kind == "categorical" and isinstance(schema.get(c), T.BooleanType):
            col = categorical_cast(col, schema[c])
        label = _bucket_label(col, h)
        labels = list(h.labels)
        # numeric histograms: underflow ("0") and overflow ("n+1") get
        # their OWN counters even when absent from the baseline labels —
        # collapsing them into __other__ would place out-of-range mass at
        # the END of the KS cumulative ordering (novel-last) instead of
        # its true position, making the fused path's KS disagree with
        # drift_scores() on the same data (r3 code-review finding #1).
        # For numeric bucketing these are also the ONLY possible novel
        # labels, so after this the __other__ counter is exactly zero.
        if h.kind == "numeric":
            for edge in ("0", str(int(h.n_bins) + 1)):
                if edge not in labels:
                    labels.append(edge)
        aliases: Dict[str, str] = {}
        for j, lab in enumerate(labels):
            a = f"hg{i}_{j}"
            terms.append(F.count_if(label == F.lit(lab)).alias(a))
            aliases[lab] = a
        other = f"hg{i}_other"
        known = labels + [NULL_LABEL]
        terms.append(F.count_if(~label.isin(known)).alias(other))
        aliases[OTHER_LABEL] = other
        spec[c] = aliases

    base_labels = {c: set(h.labels) for c, h in baselines.items()}

    def decode(extras: Mapping[str, object]) -> Dict[str, Dict[str, int]]:
        out: Dict[str, Dict[str, int]] = {}
        for c, aliases in spec.items():
            counts = {
                lab: int(extras[a] or 0)
                for lab, a in aliases.items()
            }
            # zero-count labels outside the baseline (the edge bins and
            # __other__) are dropped so the fused counts are exactly what
            # the groupBy path (observed_histogram_df) would emit — the
            # two paths must feed chi²/PSI/KS identical inputs
            for lab in list(counts):
                if counts[lab] == 0 and lab not in base_labels[c]:
                    counts.pop(lab)
            out[c] = counts
        return out

    return terms, decode


def drift_scores_from_counts(
    baselines: Mapping[str, Histogram], by_col: Mapping[str, Mapping[str, int]]
) -> Dict[str, Dict[str, float]]:
    """chi-square / PSI per column from already-aggregated counts."""
    out: Dict[str, Dict[str, float]] = {}
    for c, h in baselines.items():
        counts = by_col.get(c, {})
        non_null = sum(v for k, v in counts.items() if k != NULL_LABEL)
        out[c] = {
            "chi_square": chi_square(h, counts),
            "psi": psi(h, counts),
            "ks": ks(h, counts),
            "js": js(h, counts),
            "emd": emd(h, counts),
            "total": float(non_null),
        }
    return out


def drift_scores(
    df: DataFrame, baselines: Mapping[str, Histogram]
) -> Dict[str, Dict[str, float]]:
    """One scan → {column: {chi_square, psi, total}} for every baseline."""
    if not baselines:
        return {}
    rows = observed_histogram_df(df, baselines).collect()
    by_col: Dict[str, Dict[str, int]] = {}
    for r in rows:
        by_col.setdefault(r["column"], {})[r["label"]] = int(r["cnt"])
    return drift_scores_from_counts(baselines, by_col)


# ---------------------------------------------------------------------------
# Token-ID distribution drift (LLM-corpus drift over the tokens payload)
# ---------------------------------------------------------------------------


def token_histogram(df: DataFrame, *, tokens_col: str = "tokens") -> DataFrame:
    """(token_id, cnt) over every element of ``tokens_col``.

    The token-ID histogram is THE unit-level distribution of a
    pre-tokenized corpus — what the column-level histograms (E3/E4)
    are to scalar columns. Explode + hash aggregate: partial (map-side)
    aggregation bounds the shuffle at vocab size per input partition
    regardless of corpus size, so at 100 TB the exchange carries
    ~|V| rows per partition (|V| ≈ 10^4-10^5), not one row per token.
    NULL arrays and NULL elements contribute nothing.
    """
    return (
        df.select(F.explode(F.col(tokens_col)).alias("token_id"))
        .groupBy("token_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _token_pq(
    baseline_df: DataFrame,
    current_df: DataFrame,
    *,
    tokens_col: str,
) -> DataFrame:
    """Per-token (token_id, cnt_base, cnt_cur, p, q) — q is the baseline
    fraction, p the current fraction (the drift.psi convention).

    Both histograms are vocab-sized, so the full-outer join and the
    broadcast of the two one-row totals are trivially cheap next to the
    two corpus scans.
    """
    hb = token_histogram(baseline_df, tokens_col=tokens_col).withColumnRenamed(
        "cnt", "cnt_base"
    )
    hc = token_histogram(current_df, tokens_col=tokens_col).withColumnRenamed(
        "cnt", "cnt_cur"
    )
    joined = hb.join(hc, "token_id", "full_outer").select(
        "token_id",
        F.coalesce("cnt_base", F.lit(0)).alias("cnt_base"),
        F.coalesce("cnt_cur", F.lit(0)).alias("cnt_cur"),
    )
    # Totals via an unpartitioned window, NOT agg + crossJoin: a self-join
    # on an aggregate of `joined` would recompute the whole subtree — at
    # 100 TB that doubles the corpus scans (4 instead of 2, caught by the
    # r3 plan audit). The single-partition window touches only the
    # vocab-sized frame (|V| ≈ 10^4-10^5 rows), a trivial single task.
    w = Window.partitionBy()
    return joined.select(
        "token_id",
        "cnt_base",
        "cnt_cur",
        (F.col("cnt_cur") / F.sum("cnt_cur").over(w)).alias("p"),
        (F.col("cnt_base") / F.sum("cnt_base").over(w)).alias("q"),
    )


def _js_term(p: F.Column, q: F.Column) -> F.Column:
    """Per-token Jensen-Shannon contribution, 0·log0 ≡ 0 (no smoothing)."""
    m = (p + q) / F.lit(2.0)
    left = F.when(p > 0, F.lit(0.5) * p * F.log2(p / m)).otherwise(F.lit(0.0))
    right = F.when(q > 0, F.lit(0.5) * q * F.log2(q / m)).otherwise(F.lit(0.0))
    return left + right


def token_distribution_drift(
    baseline_df: DataFrame,
    current_df: DataFrame,
    *,
    tokens_col: str = "tokens",
    eps: float = 1e-6,
) -> DataFrame:
    """ONE-row token-ID drift summary between two corpus slices.

    Columns: ``total_base``/``total_cur`` (token counts),
    ``vocab_base``/``vocab_cur`` (distinct ids), ``novel_tokens`` (ids in
    current only — tokenizer-version or contamination tripwire), ``psi``
    (eps-smoothed, same convention as :func:`psi`) and ``js`` (base-2,
    bounded [0,1], no smoothing).

    Fully lazy and distributed: two explode+hash-agg scans, a
    vocab-sized full-outer join, an unpartitioned window for the totals
    (vocab-sized, one task), and a single-row final aggregate — no collect, composable into bigger
    plans. The same numbers are expressible in ANSI SQL (the driver
    oracle does), unlike sampled/sketch corpora comparisons.
    """
    pq_df = _token_pq(baseline_df, current_df, tokens_col=tokens_col)
    p = F.col("p")
    q = F.col("q")
    pe = F.greatest(p, F.lit(float(eps)))
    qe = F.greatest(q, F.lit(float(eps)))
    return pq_df.agg(
        F.sum("cnt_base").cast("bigint").alias("total_base"),
        F.sum("cnt_cur").cast("bigint").alias("total_cur"),
        F.count_if(F.col("cnt_base") > 0).cast("bigint").alias("vocab_base"),
        F.count_if(F.col("cnt_cur") > 0).cast("bigint").alias("vocab_cur"),
        F.count_if((F.col("cnt_cur") > 0) & (F.col("cnt_base") == 0))
        .cast("bigint")
        .alias("novel_tokens"),
        F.round(F.sum((pe - qe) * F.log(pe / qe)), 9).alias("psi"),
        F.round(F.sum(_js_term(p, q)), 9).alias("js"),
    )


def token_drift_movers(
    baseline_df: DataFrame,
    current_df: DataFrame,
    *,
    tokens_col: str = "tokens",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` token ids by absolute frequency shift |p − q|.

    The diagnostic companion to :func:`token_distribution_drift`: WHICH
    tokens moved. Deterministic order (shift desc, token_id asc) so the
    result is engine-reproducible; TakeOrderedAndProject keeps the
    top-k selection map-side — only k rows per partition reach the
    driver-side sort.
    """
    pq_df = _token_pq(baseline_df, current_df, tokens_col=tokens_col)
    return (
        pq_df.select(
            "token_id",
            "cnt_base",
            "cnt_cur",
            F.round(F.abs(F.col("p") - F.col("q")), 9).alias("abs_shift"),
        )
        .orderBy(F.desc("abs_shift"), F.asc("token_id"))
        .limit(int(k))
    )


def unseen_categories(
    baseline_df: DataFrame,
    current_df: DataFrame,
    col: str,
    *,
    k: int = 100,
) -> DataFrame:
    """Data-level category novelty: values of ``col`` present in the
    current batch but NEVER seen in the baseline corpus, with their
    current counts and share — ``(value, n_rows, frac_of_current)``.

    The contract-level twin (``compare.category_changes``) diffs two
    DECLARED domains; this diffs the DATA, catching novelty the contract
    hasn't caught up with (new enum value, upstream rename, junk).

    Scale shape: both sides collapse to their distinct/grouped category
    frames FIRST (map-side partial aggregation — the shuffle carries one
    row per distinct value per partition, never corpus rows), then a
    left-anti join keyed on the value; AQE broadcasts the baseline
    distinct set when it is small. NULL is never novel (it is a
    missingness concern, not a domain one); top-k by count keeps the
    report bounded when the novelty IS junk with unbounded cardinality
    (TakeOrderedAndProject). ``frac_of_current`` is relative to the
    CURRENT batch's non-null rows, computed from the same grouped frame
    via an unpartitioned window (|distinct| rows, one task).
    """
    c = F.col(f"`{col}`")
    base_vals = baseline_df.select(c.alias("_v")).filter(
        F.col("_v").isNotNull()
    ).distinct()
    cur = (
        current_df.select(c.alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = F.sum("n_rows").over(Window.partitionBy())
    return (
        cur.withColumn("_total", total)
        .join(base_vals, on="_v", how="left_anti")
        .select(
            F.col("_v").alias("value"),
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias(
                "frac_of_current"
            ),
        )
        .orderBy(F.desc("n_rows"), "value")
        .limit(int(k))
    )


def expected_distribution_check(
    df: DataFrame,
    col: str,
    priors: "dict",
    *,
    min_expected: float = 5.0,
) -> DataFrame:
    """Observed category distribution vs DECLARED priors — the
    expected-distribution check that needs no baseline capture (the
    user states the distribution; Benford is the special case where
    mathematics states it): label-balance gates ("50/50 ± noise"),
    traffic-split verification (A/B at 90/10), encoding checks.

    ``priors``: value → expected fraction; must sum to ~1. Returns one
    row per declared value — values absent from the data appear with
    n = 0 — plus one ``'__other__'`` row aggregating every undeclared
    value (out-of-domain mass is usually THE finding; its expected
    fraction is 0 and its chi2_term is n²/… undefined, so it carries
    NULL chi2_term and a nonzero observed_frac instead). NULLs are
    excluded (missingness's concern, the house rule).

    Columns: (value, n, observed_frac, expected_frac, chi2_term,
    low_expected). ``chi2_term`` = (n − E)²/E with E = expected_frac ·
    n_total; sum terms for the statistic (df = |declared| − 1).
    ``low_expected`` flags E < ``min_expected`` (Cochran's rule — the
    χ² approximation degrades; collapse such cells before testing).

    Scale: ONE scan → groupBy on the (bounded) declared domain + other
    (map-side combined), literal prior frame joined to the
    domain-sized counts, unpartitioned window over that tiny frame.
    """
    total = float(sum(priors.values()))
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"priors must sum to 1 (got {total})")
    if any(float(v) <= 0 for v in priors.values()):
        raise ValueError("every declared prior must be > 0")
    spark = df.sparkSession
    c = F.col(f"`{col}`").cast("string")
    declared = sorted(str(k) for k in priors)
    v = F.col("_v")
    bucket = F.when(v.isin(declared), v).otherwise(F.lit("__other__"))
    counts = (
        df.select(c.alias("_v"))
        .filter(v.isNotNull())
        .select(bucket.alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    prior_rows = [(str(k), float(priors[k])) for k in priors] + [
        ("__other__", None)
    ]
    prior_df = spark.createDataFrame(
        prior_rows, "value string, expected_frac double"
    )
    w = Window.partitionBy()
    joined = (
        prior_df.join(counts, "value", "left")
        .select(
            "value",
            F.coalesce("n", F.lit(0)).alias("n"),
            "expected_frac",
        )
        .select(
            "value",
            "n",
            F.sum("n").over(w).alias("_total"),
            "expected_frac",
        )
    )
    e = F.col("expected_frac") * F.col("_total")
    return joined.select(
        "value",
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("observed_frac"),
        F.round("expected_frac", 6).alias("expected_frac"),
        F.when(
            F.col("expected_frac").isNotNull(),
            F.round((F.col("n") - e) * (F.col("n") - e) / e, 6),
        ).alias("chi2_term"),
        F.when(
            F.col("expected_frac").isNotNull(), e < F.lit(float(min_expected))
        ).alias("low_expected"),
    ).orderBy("value")


# -- fixed count-vector divergences (shared by the batch calendar and the
#    streaming monitor) --------------------------------------------------------


def fixed_vector_aggs(c: F.Column, lbl: F.Column, labels) -> list:
    """The O(|labels|) aggregate vector: one ``count_if`` per declared
    baseline label + a pooled ``__novel__`` bucket + non-NULL and total
    counts. State stays labels-bounded per group no matter the volume —
    the property the streaming monitor needs per open window and the
    batch calendar needs per bucket."""
    aggs = [
        F.count_if(lbl == F.lit(l)).alias(f"_c{i}")
        for i, l in enumerate(labels)
    ]
    aggs += [
        F.count_if(c.isNotNull() & ~lbl.isin(list(labels))).alias("_cnov"),
        F.count_if(c.isNotNull()).alias("_n"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    return aggs


def divergence_columns(fracs, *, eps: float = 1e-6) -> dict:
    """(n_observed, novel_frac, psi, js) Column expressions over a frame
    produced with :func:`fixed_vector_aggs` — eps-floored PSI and
    unsmoothed base-2 JS, formula parity with the scalar scorers
    (:func:`psi` / :func:`js`); all novel mass pools into one bucket
    (a fixed aggregate cannot enumerate labels it has not declared).
    Empty groups (no non-NULL rows) report 0.0."""
    n = F.col("_n").cast("double")

    def p_of(cnt: F.Column) -> F.Column:
        return cnt.cast("double") / n

    pairs = [
        (p_of(F.col(f"_c{i}")), F.lit(float(q)))
        for i, q in enumerate(fracs)
    ]
    pairs.append((p_of(F.col("_cnov")), F.lit(0.0)))
    e = F.lit(float(eps))
    psi_terms, js_terms = [], []
    for p, q in pairs:
        pe, qe = F.greatest(p, e), F.greatest(q, e)
        psi_terms.append((pe - qe) * F.log(pe / qe))
        m = (p + q) / F.lit(2.0)
        js_terms.append(
            F.when(p > 0, F.lit(0.5) * p * F.log2(p / m)).otherwise(F.lit(0.0))
            + F.when(q > 0, F.lit(0.5) * q * F.log2(q / m)).otherwise(F.lit(0.0))
        )

    def zero_safe(expr: F.Column) -> F.Column:
        return F.when(n > 0, expr).otherwise(F.lit(0.0))

    return {
        "n_observed": F.col("_n"),
        "novel_frac": F.round(zero_safe(p_of(F.col("_cnov"))), 6),
        "psi": F.round(zero_safe(sum(psi_terms[1:], psi_terms[0])), 6),
        "js": F.round(zero_safe(sum(js_terms[1:], js_terms[0])), 6),
    }


def drift_calendar(
    df: DataFrame,
    baseline: Histogram,
    *,
    column: str,
    time_col: str,
    bucket: str = "day",
    eps: float = 1e-6,
) -> DataFrame:
    """Batch drift SERIES: per-calendar-bucket PSI/JS of ``column``
    against a declared baseline → (bucket_start, n_rows, n_observed,
    novel_frac, psi, js), ordered by time once collected.

    The one-number batch scorers (E3/E4) say THAT the week drifted;
    the calendar says WHEN — and its (bucket, psi) series is exactly
    the metric-series input :func:`timeseries.change_point_report`
    expects, closing the loop from drift alarm to onset date. Same
    ``_bucket_label`` bucketing and divergence formulas as the batch
    scorers and the streaming monitor (novel mass pooled, documented
    there).

    100 TB shape: ONE scan; the aggregate is |buckets| × O(|labels|)
    with map-side combine — the same fixed count vector as the
    streaming monitor keyed by ``date_trunc`` instead of a watermarked
    window.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    c = F.col(f"`{column}`")
    if baseline.kind == "categorical" and isinstance(
        schema.get(column), T.BooleanType
    ):
        c = categorical_cast(c, schema[column])
    lbl = _bucket_label(c, baseline)
    labels = [str(x) for x in baseline.labels]
    agg = df.groupBy(
        F.date_trunc(bucket, F.col(f"`{time_col}`")).alias("bucket_start")
    ).agg(*fixed_vector_aggs(c, lbl, labels))
    d = divergence_columns([float(x) for x in baseline.fracs], eps=eps)
    return agg.select(
        "bucket_start",
        "n_rows",
        d["n_observed"].alias("n_observed"),
        d["novel_frac"].alias("novel_frac"),
        d["psi"].alias("psi"),
        d["js"].alias("js"),
    )
