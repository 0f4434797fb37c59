"""Detokenization round-trip validation: ``detok(tokens) == text``.

The tokenizer-version skew detector. A pre-tokenized training table
carries BOTH the raw text and the token ids; if the vocab that encoded
``tokens`` is not the vocab the trainer will decode with (a tokenizer
upgrade, a re-shard with a different special-token layout, a vocab file
drift), every row is silently corrupted while every *structural* check
(E5 length invariant, vocab bounds, BOS/EOS framing) still passes. E6
(``token_equality_violations``) catches this only when a re-tokenized
reference copy exists; the round-trip check needs only the vocab
itself: decode the ids with the vocab you *claim* produced them and the
result must reproduce the text exactly.

Reference parity note: the reference package (pandas, ~845 LoC) has no
token concept at all; this operator exists for the BASELINE.json tokens
payload (`input_hint`: ``tokens:array<int32>`` with a per-row invariant
vs reference). It extends the reference's "dtype + range" cell contract
(reference ``validate_contract.py:100-176``) to the sequence payload.

Two decode paths, same semantics:

* **Catalyst** (``detok_expr``): the vocab becomes an array literal and
  decode is ``array_join(transform(tokens, t -> get(vocab, t)), sep)``
  — whole-stage codegen, zero Python, and exactly replayable in ANSI
  SQL (the DuckDB oracle). ``F.get`` is 0-based and yields NULL for any
  out-of-range/negative id (no ANSI index error), which the ``oov``
  sentinel makes visible. The literal rides the plan, so this path is
  for bounded vocabs (≲ tens of thousands of pieces).
* **Arrow UDF** (``detok_udf``): the 10^12-row path for real LLM vocabs
  (50k-1M pieces) — the vocab ships once per executor inside the UDF
  closure as a numpy object array; decode is one vectorized ``np.take``
  per batch plus a per-row join (the unavoidable string assembly).
  Never per-token Python.

Both paths are row-local projections: the round-trip screen runs at
scan speed with zero shuffles, and the census adds only a
|groups|-sized hash aggregate (map-side combined). Text never crosses
an exchange.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = [
    "detok_expr",
    "detok_udf",
    "roundtrip_violations",
    "roundtrip_census",
]

#: Above this vocab size, ``mode="auto"`` switches from the Catalyst
#: array-literal decode to the Arrow UDF (the literal would bloat the
#: plan and every task's codegen source beyond usefulness).
EXPR_VOCAB_CAP = 8192

#: Decode sentinel for ids outside [0, |vocab|): U+FFFD can never equal
#: a real piece of well-formed text, so OOV ids force a round-trip
#: mismatch instead of being silently skipped.
OOV_PIECE = "�"


def _check_vocab(vocab: Sequence[str]) -> List[str]:
    if not vocab:
        raise ValueError("vocab must contain at least one piece")
    out = list(vocab)
    if any(p is None for p in out):
        raise ValueError("vocab pieces must be non-None strings")
    return out


def detok_expr(
    tokens: Column | str,
    vocab: Sequence[str],
    *,
    sep: str = " ",
    oov: str = OOV_PIECE,
) -> Column:
    """Pure-Catalyst decode of ``tokens`` through ``vocab`` (id = index).

    NULL array → NULL (the row is missingness's concern, not this
    check's); any id outside [0, |vocab|) decodes to ``oov``.
    """
    vocab = _check_vocab(vocab)
    arr = F.array(*[F.lit(p) for p in vocab])
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.array_join(
        F.transform(toks, lambda t: F.coalesce(F.get(arr, t), F.lit(oov))),
        sep,
    )


def detok_udf(vocab: Sequence[str], *, sep: str = " ", oov: str = OOV_PIECE):
    """Arrow-batched decode for large vocabs: ``np.take`` over the
    whole batch's flattened id buffer, one string join per row.

    Returns a callable column-maker: ``detok_udf(v)(F.col("tokens"))``.
    """
    vocab = _check_vocab(vocab)

    # one extra slot holds the OOV sentinel; bad ids clip onto it
    table = np.array(list(vocab) + [oov], dtype=object)
    n_vocab = len(vocab)

    @pandas_udf(StringType())
    def _detok(col: pd.Series) -> pd.Series:
        out = [None] * len(col)
        vals = col.to_numpy()
        null = col.isna().to_numpy()
        for i in np.nonzero(~null)[0]:
            arr = np.asarray(vals[i])
            if arr.dtype == object or arr.dtype.kind == "f":
                # null ELEMENTS arrive as None (object) or NaN (float);
                # NaN->int64 is undefined-behavior (INT64_MIN on x86,
                # 0 on aarch64) — mask them onto the OOV slot explicitly
                # so udf and expr modes agree on every platform
                elem_null = pd.isna(arr)
                if elem_null.any():
                    arr = np.where(elem_null, n_vocab, arr)
            ids = arr.astype(np.int64)
            bad = (ids < 0) | (ids >= n_vocab)
            if bad.any():
                ids = np.where(bad, n_vocab, ids)
            out[i] = sep.join(table[ids]) if ids.size else ""
        return pd.Series(out, dtype=object)

    return _detok


def _detok_col(
    tokens_col: str, vocab: Sequence[str], sep: str, oov: str, mode: str
) -> Column:
    if mode == "auto":
        mode = "expr" if len(vocab) <= EXPR_VOCAB_CAP else "udf"
    if mode == "expr":
        return detok_expr(tokens_col, vocab, sep=sep, oov=oov)
    if mode == "udf":
        return detok_udf(vocab, sep=sep, oov=oov)(F.col(tokens_col))
    raise ValueError(f"mode must be 'auto', 'expr' or 'udf', got {mode!r}")


def roundtrip_violations(
    df: DataFrame,
    vocab: Sequence[str],
    *,
    tokens_col: str = "tokens",
    text_col: str = "text",
    keep: Sequence[str] = ("doc_id",),
    sep: str = " ",
    oov: str = OOV_PIECE,
    mode: str = "auto",
) -> DataFrame:
    """Rows where ``detok(tokens) != text`` (null-safe: both NULL is
    internally consistent and passes; one-sided NULL fails).

    Returns ``keep + (text, detok)`` for triage. Row-local filter —
    zero shuffles, scan-speed at any corpus size.
    """
    detok = _detok_col(tokens_col, vocab, sep, oov, mode).alias("detok")
    return (
        df.select(*[F.col(c) for c in keep], F.col(text_col).alias("text"), detok)
        .filter(~F.col("detok").eqNullSafe(F.col("text")))
    )


def roundtrip_census(
    df: DataFrame,
    vocab: Sequence[str],
    *,
    tokens_col: str = "tokens",
    text_col: str = "text",
    group_col: Optional[str] = "source",
    sep: str = " ",
    oov: str = OOV_PIECE,
    mode: str = "auto",
) -> DataFrame:
    """Per-group round-trip health: ``(group, n_docs, n_fail,
    fail_frac)`` — the tokenizer-consistency SLO row.

    One scan; the decode + null-safe compare is a row-local projection
    and only the |groups|-row aggregate shuffles (map-side combined).
    ``group_col=None`` gives the single table-level row.
    """
    detok = _detok_col(tokens_col, vocab, sep, oov, mode)
    fail = ~detok.eqNullSafe(F.col(text_col))
    keys = [group_col] if group_col else []
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(fail).alias("n_fail"),
        F.round(
            F.count_if(fail).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double"),
            6,
        ).alias("fail_frac"),
    )
