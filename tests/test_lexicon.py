"""Lexicon gates (operators/lexicon.py): whole-word blocklist matching,
census folds, template-marker leak detection (zero-inclusive)."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.lexicon import (
    MAX_LITERAL_LEXICON,
    TEMPLATE_MARKERS,
    blocklist_census,
    blocklist_hits_expr,
    blocklist_rows,
    blocklist_word_census,
    template_leak_census,
    template_leak_rows,
)

LEX = ["spam", "viagra", "don't"]


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "Buy SPAM now", "web"),          # hit (case-insensitive)
        (2, "antispam filters spamless", "web"),  # NO hit: whole-word only
        (3, "spam and viagra spam", "web"),  # two distinct matches
        (4, "clean text here", "web"),
        (5, None, "mail"),                   # NULL text: no hit
        (6, "i don't care", "mail"),         # apostrophe word matches
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_whole_word_case_insensitive(spark, docs):
    got = {
        r.doc_id: (list(r.matched), r.n_matched)
        for r in blocklist_rows(docs, words=LEX).collect()
    }
    assert got == {
        1: (["spam"], 1),
        3: (["spam", "viagra"], 2),  # distinct + sorted
        6: (["don't"], 1),
    }


def test_census_fractions(spark, docs):
    got = {
        r.group: (r.n_docs, r.n_flagged, r.flagged_frac)
        for r in blocklist_census(docs, words=LEX).collect()
    }
    assert got["web"] == (4, 2, 0.5)
    assert got["mail"] == (2, 1, 0.5)


def test_word_census_only_firing_words(spark, docs):
    got = {
        (r.group, r.word): r.n_docs
        for r in blocklist_word_census(docs, words=LEX).collect()
    }
    assert got == {
        ("web", "spam"): 2,
        ("web", "viagra"): 1,
        ("mail", "don't"): 1,
    }


def test_lexicon_validation(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        blocklist_census(docs, words=[])
    with pytest.raises(ValueError, match="non-empty strings"):
        blocklist_census(docs, words=["ok", ""])
    with pytest.raises(ValueError, match="broadcast"):
        blocklist_census(docs, words=[f"w{i}" for i in range(MAX_LITERAL_LEXICON + 1)])


@pytest.fixture()
def chatty(spark):
    rows = [
        (1, "plain prose", "a"),
        (2, "begin <|im_start|>user hello", "a"),   # control token
        (3, "AS AN AI LANGUAGE MODEL I cannot", "a"),  # case-insensitive
        (4, "### Response:\nSure!", "b"),
        (5, None, "b"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_template_rows_sorted_markers(spark, chatty):
    got = {
        r.doc_id: list(r.markers) for r in template_leak_rows(chatty).collect()
    }
    assert got[2] == ["<|im_start|>"]
    assert got[3] == ["as an ai language model"]
    assert got[4] == ["### response:"]
    assert set(got) == {2, 3, 4}


def test_template_census_zero_inclusive(spark, chatty):
    rows = template_leak_census(chatty).collect()
    # every (group, marker) cell present, even at zero hits
    assert len(rows) == 2 * len(TEMPLATE_MARKERS)
    got = {(r.group, r.marker): (r.n_docs_hit, r.hit_frac) for r in rows}
    assert got[("a", "<|im_start|>")] == (1, round(1 / 3, 6))
    assert got[("a", "as an ai language model")] == (1, round(1 / 3, 6))
    assert got[("b", "### response:")] == (1, 0.5)
    assert got[("b", "<|endoftext|>")] == (0, 0.0)  # clean is a row


def test_template_markers_param_validation(spark, chatty):
    with pytest.raises(ValueError, match="non-empty"):
        template_leak_census(chatty, markers=[])


def test_phrase_entries_match_on_token_boundaries(spark, docs):
    """Multi-word entries (the published C4 list is full of them) match
    as token-boundary phrases of the normalized stream — never inside a
    fused word, and robust to punctuation/extra whitespace between the
    words."""
    phr = spark.createDataFrame(
        [
            (1, "offers a Hand   Job, cheap", "w"),   # punct + runs of space
            (2, "handjob mention", "w"),              # fused: NO hit
            (3, "hand jobs plural", "w"),             # 'jobs' != 'job': NO hit
            (4, "a helping hand job done", "w"),      # plain hit
        ],
        "doc_id bigint, text string, source string",
    )
    got = {
        r.doc_id: list(r.matched)
        for r in blocklist_rows(phr, words=["hand job"]).collect()
    }
    assert got == {1: ["hand job"], 4: ["hand job"]}
    # words and phrases compose in one expression
    both = {
        r.doc_id: list(r.matched)
        for r in blocklist_rows(
            phr, words=["hand job", "cheap"]
        ).collect()
    }
    assert both[1] == ["cheap", "hand job"]  # sorted


def test_unmatchable_entries_rejected_not_silent(spark, docs):
    """An entry outside the tokenization alphabet can NEVER hit — it
    must raise, not silently weaken the safety gate to a false pass."""
    with pytest.raises(ValueError, match="can never match"):
        blocklist_census(docs, words=["f*ck"])
    with pytest.raises(ValueError, match="can never match"):
        blocklist_census(docs, words=["spam", "tab\tseparated"])
    # a gate whose every entry is unmatchable exits loudly too
    with pytest.raises(ValueError, match="can never match"):
        blocklist_hits_expr("text", ["<|im_start|>"])
