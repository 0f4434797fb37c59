"""Sequence-structure validation (operators/structure.py).

Planted fixtures cover every tag exactly once plus the clean and NULL
paths; a plan test pins the zero-shuffle/zero-UDF claim for the row
screen.
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv

SPEC = dv.SequenceSpec(
    bos_id=1, eos_id=2, pad_id=0, vocab_size=100, min_len=3, max_len=6
)

ROWS = [
    # (doc_id, tokens, expected sorted tags)
    (1, [1, 10, 11, 2], []),                 # clean
    (2, [1, 10, 2, 0, 0], []),               # trailing pads are legal
    (3, [10, 11, 2], ["missing_bos"]),
    (4, [1, 10, 11], ["missing_eos"]),
    (5, [1, 0, 10, 2], ["interior_pad"]),
    (6, [1, 10, 250, 2], ["oov"]),
    (7, [1, 2], ["too_short"]),
    (8, [1, 10, 11, 12, 13, 14, 2], ["too_long"]),
    (9, [], ["empty", "too_short"]),
    (10, [0, 0, 0], ["empty", "too_short"]),  # all-pad == empty content
    (11, None, ["null_tokens"]),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id int, tokens array<int>"
    )


def test_structure_violations_tags(df):
    out = {r["doc_id"]: r for r in dv.structure_violations(df, SPEC).collect()}
    for doc_id, _, want in ROWS:
        if want:
            assert list(out[doc_id]["tags"]) == want, doc_id
        else:
            assert doc_id not in out, doc_id


def test_content_len_reported(df):
    out = {r["doc_id"]: r for r in dv.structure_violations(df, SPEC).collect()}
    assert out[5]["content_len"] == 4   # interior pad still counts to last token
    assert out[10]["content_len"] == 0  # all-pad
    assert out[9]["content_len"] == 0   # empty


def test_structure_census_counts(df):
    row = dv.structure_census(df, SPEC).collect()[0]
    assert row["n_rows"] == len(ROWS)
    assert row["n_bad"] == sum(1 for _, _, w in ROWS if w)
    assert row["n_missing_bos"] == 1
    assert row["n_missing_eos"] == 1
    assert row["n_interior_pad"] == 1
    assert row["n_oov"] == 1
    assert row["n_too_short"] == 3
    assert row["n_too_long"] == 1
    assert row["n_empty"] == 2
    assert row["n_null_tokens"] == 1
    # pad_frac: pads everywhere / all sizes; row 2 has 2 trailing pads,
    # rows 9/10 contribute 0/3 content over 0/3 size.
    sizes = sum(len(t) for _, t, _ in ROWS if t is not None)
    clens = {1: 4, 2: 3, 3: 3, 4: 3, 5: 4, 6: 4, 7: 2, 8: 7, 9: 0, 10: 0}
    assert row["pad_frac"] == round((sizes - sum(clens.values())) / sizes, 6)


def test_structure_census_grouped(spark):
    g = spark.createDataFrame(
        [("a", [1, 10, 2]), ("a", [10, 2]), ("b", [1, 2, 0])],
        "src string, tokens array<int>",
    )
    spec = dv.SequenceSpec(bos_id=1, eos_id=2, pad_id=0)
    out = {r["src"]: r for r in
           dv.structure_census(g, spec, group_col="src").collect()}
    assert out["a"]["n_missing_bos"] == 1 and out["a"]["n_rows"] == 2
    assert out["b"]["n_bad"] == 0


def test_spec_disables_checks(spark):
    """Fields left None produce no tags for their class."""
    g = spark.createDataFrame([(1, [5, 5])], "doc_id int, tokens array<int>")
    out = dv.structure_violations(g, dv.SequenceSpec()).collect()
    assert out == []  # nothing enabled except null/empty; row is fine


def test_spec_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        dv.SequenceSpec(vocab_size=0)
    with pytest.raises(ValueError, match="min_len"):
        dv.SequenceSpec(min_len=5, max_len=2)
    with pytest.raises(ValueError, match="pad_id"):
        dv.SequenceSpec(pad_id=7, vocab_size=5)


def test_structure_screen_is_single_stage(df):
    plan = (
        dv.structure_violations(df, SPEC)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_elements_are_their_own_violation_class(spark):
    """r3 review fix: [1, NULL, 5, 2] previously passed as fully clean —
    every other predicate is NULL on the NULL element and the tag slot
    silently dropped."""
    import dsci_524_g26_data_validation_spark as dv

    spec = dv.SequenceSpec(bos_id=1, eos_id=2, pad_id=0, vocab_size=100)
    df = spark.createDataFrame(
        [(0, [1, None, 5, 2]), (1, [1, 5, 2])],
        "doc_id bigint, tokens array<int>",
    )
    v = {r.doc_id: r.tags for r in dv.structure_violations(df, spec).collect()}
    assert v == {0: ["null_element"]}
    c = dv.structure_census(df, spec).first()
    assert c.n_null_element == 1 and c.n_bad == 1
