"""Lexicon gates: blocklist-word filtering and chat-template leak
detection.

Two curation screens driven by a small fixed word/phrase list rather
than a statistic:

- **Blocklist filter** (the C4 "bad words" gate, Raffel et al. 2020):
  drop or flag documents containing any word from a deny lexicon.
  Matching is whole-word on a deterministic lowercase tokenization, so
  "class" never matches a 3-letter entry embedded inside it.
- **Template-leak census**: training corpora scraped after 2022
  increasingly contain *model output* — chat-template control tokens
  (``<|im_start|>``, ``[INST]``), scaffold headers (``### Response:``)
  and assistant boilerplate ("As an AI language model"). Any of these
  inside a pre-training document marks synthetic or chat-log
  contamination the quality scores don't see.

100 TB shape: both screens are row-local projections — the lexicon is a
bounded literal array (or per-marker predicate), so matching happens
inside whole-stage codegen with ZERO shuffles; only the |groups|- or
|groups×lexicon|-bounded census frames cross an exchange (map-side
combined). Nothing here ships rows through Python, and every expression
stays in the Java-regex ∩ RE2 subset so the DuckDB oracle replays it
verbatim (the operators/pii.py convention).

For a lexicon too large for a literal (>~10k entries) the same census
composes from an explode + broadcast semi-join against the lexicon
table instead; the literal form is the fast path for the published
lists (C4's deny list is ~400 entries).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "blocklist_hits_expr",
    "blocklist_rows",
    "blocklist_census",
    "blocklist_word_census",
    "TEMPLATE_MARKERS",
    "template_leak_rows",
    "template_leak_census",
]

#: Tokenization for whole-word matching: lowercase, split on any run of
#: characters outside [a-z0-9'] (apostrophe kept so "don't" stays one
#: word). Both Java regex and RE2/DuckDB parse this identically.
_WORD_SPLIT = "[^a-z0-9']+"

#: Lexicon size above which the literal-array fast path is refused —
#: a larger list belongs in a broadcast-joined lexicon table, not a
#: Catalyst literal baked into every task's codegen.
MAX_LITERAL_LEXICON = 10_000


#: An entry over the tokenization alphabet (matchable as one token).
_WORD_RE = re.compile(r"^[a-z0-9']+$")
#: A multi-word phrase: valid tokens separated by single spaces.
_PHRASE_RE = re.compile(r"^[a-z0-9']+( [a-z0-9']+)+$")


def _check_lexicon(words: Sequence[str]) -> Tuple[List[str], List[str]]:
    """Normalize the lexicon to (single_words, phrases), REJECTING any
    entry that could never match: tokens are drawn from [a-z0-9'], so an
    entry carrying other characters ("f*ck") or shaped any other way
    would silently produce zero hits — a false PASS of the safety gate
    (the published C4 deny list contains many multi-word and punctuated
    entries; feeding it in unvalidated must not quietly weaken the
    filter)."""
    if not words:
        raise ValueError("blocklist lexicon must be non-empty")
    if len(words) > MAX_LITERAL_LEXICON:
        raise ValueError(
            f"lexicon has {len(words)} entries (> {MAX_LITERAL_LEXICON}); "
            "use a broadcast lexicon-table join instead of the literal path"
        )
    singles: List[str] = []
    phrases: List[str] = []
    for raw in words:
        w = str(raw).lower()
        if not w:
            raise ValueError("lexicon entries must be non-empty strings")
        if _WORD_RE.match(w):
            singles.append(w)
        elif _PHRASE_RE.match(w):
            phrases.append(w)
        else:
            raise ValueError(
                f"lexicon entry {raw!r} can never match: entries must be "
                "single words or space-separated phrases over [a-z0-9'] "
                "(the whole-word tokenization alphabet). Rewrite "
                "punctuated entries in token form (e.g. drop the "
                "punctuation) or match them with template_leak_census's "
                "literal-substring mode instead."
            )
    return singles, phrases


def blocklist_hits_expr(text_col: Column | str, words: Sequence[str]) -> Column:
    """Sorted array of distinct lexicon entries present (whole-word,
    case-insensitive) in the text — NULL text yields an empty array.
    Row-local: lowercase regex split + ``array_intersect`` with the
    literal lexicon for single words; multi-word phrases match as
    token-boundary substrings of the space-rejoined token stream (so
    "hand job" hits "hand  job." but never "handjob"), all inside
    codegen."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    singles, phrases = _check_lexicon(words)
    toks = F.array_distinct(F.split(F.lower(F.coalesce(c, F.lit(""))), _WORD_SPLIT))
    hit_parts = []
    if singles:
        lex = F.array(*[F.lit(w) for w in singles])
        hit_parts.append(F.array_intersect(toks, lex))
    if phrases:
        # token stream rejoined with single spaces, space-padded, so a
        # padded phrase matches exactly on token boundaries
        stream = F.concat(
            F.lit(" "),
            F.array_join(
                F.filter(
                    F.split(F.lower(F.coalesce(c, F.lit(""))), _WORD_SPLIT),
                    lambda t: t != F.lit(""),
                ),
                " ",
            ),
            F.lit(" "),
        )
        hit_parts.append(
            F.array_compact(
                F.array(
                    *[
                        F.when(
                            F.contains(stream, F.lit(f" {p} ")), F.lit(p)
                        )
                        for p in phrases
                    ]
                )
            )
        )
    combined = (
        hit_parts[0]
        if len(hit_parts) == 1
        else F.concat(*hit_parts)
    )
    return F.array_sort(combined)


def blocklist_rows(
    df: DataFrame,
    *,
    text_col: str = "text",
    words: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Flagged documents only → (id, matched: array<string>, n_matched).

    The filter itself is the same expression, so ``df.filter(
    size(blocklist_hits_expr(...)) == 0)`` is the C4 drop gate — both
    directions are one row-local predicate."""
    hits = blocklist_hits_expr(text_col, words)
    return (
        df.select(F.col(id_col), hits.alias("matched"))
        .filter(F.size("matched") > 0)
        .withColumn("n_matched", F.size("matched"))
    )


def blocklist_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    words: Sequence[str],
    group_by: str = "source",
) -> DataFrame:
    """Per-group gate report → (group, n_docs, n_flagged, flagged_frac).

    One scan; the exchange carries |groups| rows."""
    hits = blocklist_hits_expr(text_col, words)
    return (
        df.select(F.col(group_by).alias("group"), (F.size(hits) > 0).alias("_hit"))
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("_hit")).alias("n_flagged"),
            F.round(F.count_if(F.col("_hit")) / F.count(F.lit(1)), 6).alias(
                "flagged_frac"
            ),
        )
    )


def blocklist_word_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    words: Sequence[str],
    group_by: str = "source",
) -> DataFrame:
    """WHICH lexicon words fire where → (group, word, n_docs) — only
    words that hit at least once (zero rows would say nothing the
    lexicon itself doesn't). Explode is bounded by matches-per-doc ≤
    |lexicon|, and the map-side combine collapses to ≤ |groups|×|lexicon|
    cells before the exchange."""
    hits = blocklist_hits_expr(text_col, words)
    return (
        df.select(F.col(group_by).alias("group"), hits.alias("_m"))
        .filter(F.size("_m") > 0)
        .select("group", F.explode("_m").alias("word"))
        .groupBy("group", "word")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -- chat-template / synthetic-text leak ------------------------------------

#: Default markers: chat-template control tokens and assistant
#: boilerplate whose presence inside a *pre-training document* marks
#: synthetic or chat-log contamination. Matched as case-insensitive
#: LITERAL substrings (no regex, no word boundaries — "<|im_start|>"
#: is not a word).
TEMPLATE_MARKERS: List[str] = [
    "<|im_start|>",
    "<|endoftext|>",
    "[INST]",
    "<</SYS>>",
    "### Instruction:",
    "### Response:",
    "as an ai language model",
    "i cannot fulfill that request",
]


def _marker_hit(text_col: Column | str, marker: str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.contains(F.lower(F.coalesce(c, F.lit(""))), F.lit(marker.lower()))


def template_leak_rows(
    df: DataFrame,
    *,
    text_col: str = "text",
    markers: Sequence[str] = tuple(TEMPLATE_MARKERS),
    id_col: str = "doc_id",
) -> DataFrame:
    """Contaminated documents → (id, markers: array<string>) with the
    sorted list of markers present. Row-local CASE chain per marker."""
    if not markers:
        raise ValueError("markers must be non-empty")
    arr = F.array_compact(
        F.array(
            *[
                F.when(_marker_hit(text_col, m), F.lit(m.lower()))
                for m in markers
            ]
        )
    )
    return (
        df.select(F.col(id_col), F.array_sort(arr).alias("markers"))
        .filter(F.size("markers") > 0)
    )


def template_leak_census(
    df: DataFrame,
    *,
    text_col: str = "text",
    markers: Sequence[str] = tuple(TEMPLATE_MARKERS),
    group_by: str = "source",
) -> DataFrame:
    """Per-(group, marker) leak census → (group, marker, n_docs_hit,
    hit_frac), ZERO-INCLUSIVE: every declared marker appears for every
    group even at 0 hits — proving a corpus is CLEAN of a marker is the
    point (the canary_census convention). One scan: per-marker
    ``count_if`` terms ride a single |groups|-row aggregate, unpivoted
    to long form afterwards (no explode of the corpus)."""
    if not markers:
        raise ValueError("markers must be non-empty")
    low = [m.lower() for m in markers]
    agg = (
        df.groupBy(F.col(group_by).alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.count_if(_marker_hit(text_col, m)).alias(f"_m{i}")
                for i, m in enumerate(low)
            ],
        )
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(m).alias("marker"), F.col(f"_m{i}").alias("n_docs_hit")
            )
            for i, m in enumerate(low)
        ]
    )
    return (
        agg.select("group", "n_docs", F.inline(pairs))
        .select(
            "group",
            "marker",
            "n_docs_hit",
            F.round(F.col("n_docs_hit") / F.col("n_docs"), 6).alias("hit_frac"),
        )
    )
