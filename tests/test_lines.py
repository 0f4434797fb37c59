"""Line-level boilerplate detection / stripping (operators/lines.py)."""

from __future__ import annotations

import pytest

from dsci_524_g26_data_validation_spark.operators.lines import (
    frequent_lines,
    line_frequency,
    line_strip_report,
    strip_frequent_lines,
)

BANNER = "ACCEPT COOKIES TO CONTINUE"
FOOTER = "(c) example.com all rights reserved"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 10 docs: all carry the banner, 5 carry the footer, each has
    # unique content lines; doc 3 repeats the banner WITHIN the doc.
    for i in range(10):
        lines = [BANNER, f"unique content of document {i}"]
        if i % 2 == 0:
            lines.append(FOOTER)
        if i == 3:
            lines.append(BANNER)
        lines.append(f"more prose {i}")
        rows.append((i, "\n".join(lines)))
    rows.append((99, "no boilerplate here at all"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_frequency_counts_documents_not_occurrences(corpus):
    out = {r["line"]: r for r in line_frequency(corpus, min_docs=2).collect()}
    # banner: 10 docs (doc 3's repeat collapses), 11 occurrences
    assert out[BANNER]["n_docs"] == 10
    assert out[BANNER]["n_occurrences"] == 11
    assert out[FOOTER]["n_docs"] == 5
    # unique lines never reach min_docs=2
    assert all(l in (BANNER, FOOTER) for l in out)


def test_frequent_lines_fraction_threshold(corpus):
    # 11 docs; frac 0.5 → ceil(5.5)=6 → banner only
    fl = frequent_lines(corpus, min_doc_frac=0.5)
    assert fl.count() == 1
    # frac 0.4 → ceil(4.4)=5 → banner + footer
    assert frequent_lines(corpus, min_doc_frac=0.4).count() == 2


def test_strip_removes_all_occurrences_preserving_order(corpus):
    out = {
        r["doc_id"]: r
        for r in strip_frequent_lines(corpus, min_docs=6).collect()
    }
    # doc 3 had the banner twice — both occurrences go
    assert out[3]["text"] == "unique content of document 3\nmore prose 3"
    assert out[3]["n_lines_dropped"] == 2
    assert out[0]["text"] == (
        f"unique content of document 0\n{FOOTER}\nmore prose 0"
    )
    assert out[0]["n_lines_dropped"] == 1
    # untouched doc: identical text, zero drops
    assert out[99]["text"] == "no boilerplate here at all"
    assert out[99]["n_lines_dropped"] == 0


def test_min_line_chars_guard(spark):
    df = spark.createDataFrame(
        [(i, f"Yes\ncontent {i}") for i in range(5)],
        "doc_id long, text string",
    )
    # 'Yes' is in every doc but under the 5-char guard → survives
    kept = strip_frequent_lines(df, min_docs=2, min_line_chars=5).collect()
    assert all(r["text"].startswith("Yes\n") for r in kept)
    # without the guard it strips
    gone = strip_frequent_lines(df, min_docs=2, min_line_chars=0).collect()
    assert all(not r["text"].startswith("Yes") for r in gone)


def test_out_col_keeps_original(corpus):
    out = strip_frequent_lines(
        corpus, min_docs=6, out_col="clean"
    ).filter("doc_id = 0").first()
    assert BANNER in out["text"]
    assert BANNER not in out["clean"]


def test_report_reconciles(corpus):
    rep = line_strip_report(corpus, min_docs=6).first()
    assert rep["n_docs"] == 11
    assert rep["n_docs_changed"] == 10
    assert rep["n_lines_dropped"] == 11  # 10 banners + doc3 repeat
    # chars removed = banner len × 11 + the separators that left with them
    assert rep["chars_before"] - rep["chars_after"] == (len(BANNER) + 1) * 11


def test_requires_threshold(corpus):
    with pytest.raises(ValueError):
        frequent_lines(corpus, min_docs=None, min_doc_frac=None)


def test_blank_lines_never_strip_by_default(spark):
    """r3 review fix: '' (the paragraph separator) is frequent in any
    multi-paragraph corpus; the default min_line_chars=1 must protect
    it or paragraph structure collapses corpus-wide."""
    from dsci_524_g26_data_validation_spark.operators.lines import (
        strip_frequent_lines,
    )

    df = spark.createDataFrame(
        [(i, f"para one {i}\n\npara two {i}") for i in range(10)],
        "doc_id bigint, text string",
    )
    out = strip_frequent_lines(df, min_docs=2).collect()
    assert all(r.text.count("\n\n") == 1 for r in out)
    assert all(r.n_lines_dropped == 0 for r in out)
