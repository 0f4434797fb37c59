"""Sequence-structure validation for pre-tokenized training sequences.

The tokens-payload analog of the reference's per-column facets
(``validate_contract.py`` checks cells; this checks the INTERNAL
structure of each ``tokens: array<int>`` cell): BOS/EOS framing,
padding discipline, vocabulary bounds, and content-length limits — the
invariants a training loader assumes and a corrupted tokenizer run
silently breaks.

Every check is a pure Catalyst array expression (HOF ``transform`` /
``filter`` / ``aggregate`` + ``element_at``), so the whole screen is
row-local: zero shuffles, whole-stage codegen, and the parquet reader
decodes only the token column plus requested keys. The census is one
``groupBy(group_col)`` over pre-computed bits — a single scan and one
tiny shuffle (|groups| rows) regardless of corpus size, the same fused
shape as the contract validation pass.

Definitions (for a spec with ``pad_id``):

* ``content_len`` = 1-based index of the LAST non-pad token (0 if the
  sequence is empty or all-pad). Trailing pads are legal padding;
  anything else involving pad is not.
* ``interior_pad``: the number of pad tokens exceeds the trailing pad
  run, i.e. a pad appears before a real token.
* ``missing_bos`` / ``missing_eos``: first token ≠ ``bos_id`` / last
  non-pad token ≠ ``eos_id`` (only checked on non-empty content).
* ``oov``: any token outside ``[0, vocab_size)``.
* ``too_short`` / ``too_long``: ``content_len`` outside
  ``[min_len, max_len]``.

NULL arrays get the single tag ``null_tokens`` (E5
``ntok_invariant_violations`` owns the n_tok cross-check; here a NULL
cell must still be routable). 3VL note: all predicates below are built
from ``size``/``element_at`` over a non-NULL guard, so no tag silently
disappears on NULL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SequenceSpec",
    "structure_flags",
    "structure_violations",
    "structure_census",
    "DEFAULT_CAPS",
    "length_clipping_census",
]


@dataclass(frozen=True)
class SequenceSpec:
    """Structural contract for one tokenized-sequence column.

    Any field left ``None`` disables its checks, so the spec degrades
    gracefully for corpora without special tokens or padding.
    """

    bos_id: Optional[int] = None
    eos_id: Optional[int] = None
    pad_id: Optional[int] = None
    vocab_size: Optional[int] = None
    min_len: Optional[int] = None
    max_len: Optional[int] = None

    def __post_init__(self) -> None:
        if self.vocab_size is not None and self.vocab_size <= 0:
            raise ValueError(f"vocab_size must be positive, got {self.vocab_size}")
        if (
            self.min_len is not None
            and self.max_len is not None
            and self.min_len > self.max_len
        ):
            raise ValueError(
                f"min_len {self.min_len} > max_len {self.max_len}"
            )
        for name in ("bos_id", "eos_id", "pad_id"):
            v = getattr(self, name)
            if v is not None and self.vocab_size is not None and not (
                0 <= v < self.vocab_size
            ):
                raise ValueError(
                    f"{name}={v} outside [0, vocab_size={self.vocab_size})"
                )


def _content_len(arr: Column, pad_id: Optional[int]) -> Column:
    """1-based index of the last non-pad token; 0 for empty/all-pad.

    ``aggregate(transform(arr, (x, i) -> if(x != pad, i+1, 0)), 0,
    greatest)`` — one pass over the array, no explode, stays inside
    codegen. Without a pad_id the content length is simply ``size``.
    """
    if pad_id is None:
        return F.size(arr)
    idx = F.transform(
        arr,
        lambda x, i: F.when(x != F.lit(pad_id), i + 1).otherwise(F.lit(0)),
    )
    return F.aggregate(idx, F.lit(0), lambda acc, v: F.greatest(acc, v))


def structure_flags(arr: Column, spec: SequenceSpec) -> dict:
    """Dict of tag → BooleanColumn for one token-array column.

    Exposed so callers can embed individual bits in their own fused
    aggregation passes (the engine-wide single-scan idiom)."""
    clen = _content_len(arr, spec.pad_id)
    is_null = arr.isNull()
    flags: dict = {"null_tokens": is_null}
    nn = ~is_null  # guard: every non-null tag is False on NULL arrays
    # NULL ELEMENTS are their own violation class: every other predicate
    # evaluates to NULL on a NULL element (three-valued logic), so the
    # when() tag slot silently drops and a [1, NULL, 2] row would
    # otherwise pass as clean — exactly the rows downstream operators
    # (spans.py hashing, packing) direct users here to screen out
    flags["null_element"] = nn & F.exists(arr, lambda x: x.isNull())
    flags["empty"] = nn & (clen == 0)
    if spec.bos_id is not None:
        flags["missing_bos"] = nn & (clen > 0) & (
            F.element_at(arr, 1) != F.lit(spec.bos_id)
        )
    if spec.eos_id is not None:
        flags["missing_eos"] = nn & (clen > 0) & (
            F.element_at(arr, clen) != F.lit(spec.eos_id)
        )
    if spec.pad_id is not None:
        n_pad = F.size(F.filter(arr, lambda x: x == F.lit(spec.pad_id)))
        flags["interior_pad"] = nn & (n_pad != F.size(arr) - clen)
    if spec.vocab_size is not None:
        oov = F.filter(
            arr, lambda x: (x < 0) | (x >= F.lit(spec.vocab_size))
        )
        flags["oov"] = nn & (F.size(oov) > 0)
    if spec.min_len is not None:
        flags["too_short"] = nn & (clen < F.lit(spec.min_len))
    if spec.max_len is not None:
        flags["too_long"] = nn & (clen > F.lit(spec.max_len))
    return flags


def structure_violations(
    df: DataFrame,
    spec: SequenceSpec,
    *,
    arr_col: str = "tokens",
    keep: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-row structural violations: ``keep + (tags: array<string>,
    content_len: int)``, rows with ≥1 tag only.

    Tags are sorted for deterministic comparison (the same contract as
    ``quarantine.tag_rows``). Single codegen projection + filter — no
    shuffle, no UDF."""
    arr = F.col(arr_col)
    flags = structure_flags(arr, spec)
    tags = F.array_sort(
        F.array_compact(
            F.array(*[F.when(c, F.lit(t)) for t, c in sorted(flags.items())])
        )
    )
    return (
        df.select(
            *[F.col(c) for c in keep],
            tags.alias("tags"),
            _content_len(arr, spec.pad_id).alias("content_len"),
        )
        .filter(F.size("tags") > 0)
    )


def structure_census(
    df: DataFrame,
    spec: SequenceSpec,
    *,
    arr_col: str = "tokens",
    group_col: Optional[str] = None,
) -> DataFrame:
    """Violation census: one row per group (or one total row) with
    ``n_rows``, one ``n_<tag>`` count per enabled check, ``n_bad``
    (rows with any violation), and ``pad_frac`` (corpus padding
    overhead — wasted loader work, not a violation).

    One scan, map-side partial aggregation, |groups| result rows — the
    100 TB shape."""
    arr = F.col(arr_col)
    flags = structure_flags(arr, spec)
    any_bad = None
    for c in flags.values():
        any_bad = c if any_bad is None else (any_bad | c)
    clen = _content_len(arr, spec.pad_id)
    pre = df.select(
        *([F.col(group_col)] if group_col else []),
        *[c.alias(f"_f_{t}") for t, c in sorted(flags.items())],
        any_bad.alias("_f_any"),
        F.coalesce(F.size(arr), F.lit(0)).alias("_sz"),
        clen.alias("_cl"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if("_f_any").alias("n_bad"),
        *[
            F.count_if(f"_f_{t}").alias(f"n_{t}")
            for t in sorted(flags.keys())
        ],
        F.round(
            (F.sum("_sz") - F.sum("_cl")).cast("double")
            / F.greatest(F.sum("_sz"), F.lit(1)).cast("double"),
            6,
        ).alias("pad_frac"),
    ]
    if group_col:
        return pre.groupBy(group_col).agg(*aggs)
    return pre.agg(*aggs)


# -- truncation / clipping detection ------------------------------------------

#: Caps a truncating writer plausibly clipped at: context windows and
#: field limits are powers of two (and the off-by-one forms a "reserve
#: one for EOS" pipeline produces).
DEFAULT_CAPS = tuple(
    sorted(
        {1 << p for p in range(7, 21)}
        | {(1 << p) - 1 for p in range(7, 21)}
    )
)


def length_clipping_census(
    df: DataFrame,
    len_col: str,
    *,
    window: int = 8,
    min_ratio: float = 3.0,
    min_count: int = 5,
    caps: Sequence[int] = DEFAULT_CAPS,
    flag_only: bool = True,
) -> DataFrame:
    """Truncation-spike detector over a length column (``n_tok``,
    ``n_chars``): a writer that silently clips sequences at a cap leaves
    every *row-level* contract satisfied — lengths are in range, arrays
    are well-formed — while the length HISTOGRAM grows a spike at
    exactly the cap that the natural distribution cannot produce. The
    census finds mass concentrated at the distribution's maximum or at
    known cap values (powers of two and the reserve-one-for-EOS
    off-by-ones) that towers over the immediately preceding lengths.

    Returns ``(length, n_rows, share, neigh_mean, spike_ratio, at_max,
    at_cap)``; with ``flag_only=True`` only suspicious rows — spike
    ratio ≥ ``min_ratio``, count ≥ ``min_count``, and the length is the
    global max or a known cap.

    ``neigh_mean`` = mean rows per length over the ``window`` lengths
    strictly below (absent lengths count 0 — a RANGE window sum over
    the value domain, so gaps are handled exactly);
    ``spike_ratio = n / max(neigh_mean, 1/window)``.

    Scale shape: one scan collapses the corpus to a (length, count)
    frame bounded by the number of DISTINCT lengths (≤ max sequence
    length, e.g. ≤ ~10^5 rows at any corpus size) with map-side
    combine; the windows then run on that tiny frame — the single-task
    sort there is the correct plan at 10^12 rows, same argument as
    ``change_point_report``.
    """
    from pyspark.sql import Window

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    counts = (
        df.filter(F.col(len_col).isNotNull())
        .groupBy(F.col(len_col).cast("bigint").alias("length"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w_neigh = Window.orderBy("length").rangeBetween(-window, -1)
    w_all = Window.partitionBy()
    neigh_mean = (
        F.coalesce(F.sum("n_rows").over(w_neigh), F.lit(0)).cast("double")
        / F.lit(float(window))
    )
    cap_arr = F.array(*[F.lit(int(c)) for c in sorted(set(caps))])
    out = counts.select(
        "length",
        "n_rows",
        F.round(
            F.col("n_rows").cast("double") / F.sum("n_rows").over(w_all),
            6,
        ).alias("share"),
        F.round(neigh_mean, 6).alias("neigh_mean"),
        F.round(
            F.col("n_rows").cast("double")
            / F.greatest(neigh_mean, F.lit(1.0 / float(window))),
            6,
        ).alias("spike_ratio"),
        (F.col("length") == F.max("length").over(w_all)).alias("at_max"),
        F.array_contains(cap_arr, F.col("length")).alias("at_cap"),
    )
    if not flag_only:
        return out
    return out.filter(
        (F.col("spike_ratio") >= min_ratio)
        & (F.col("n_rows") >= min_count)
        & (F.col("at_max") | F.col("at_cap"))
    )
