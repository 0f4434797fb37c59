"""read_compatibility: schema-registry-style "can this consumer read
that producer" verdict over two Contracts.

Engine extension (the reference's compare_contracts.py reports WHAT
changed; this decides whether a change BREAKS a consumer). Pure
metadata — no Spark session needed for most cases.
"""

from __future__ import annotations

import pytest

import dsci_524_g26_data_validation_spark as dv


def _c(**cols) -> dv.Contract:
    return dv.Contract(name="c", columns=cols)


def _kinds(res):
    return sorted(i.kind for i in res.issues)


def test_identical_is_compatible():
    w = _c(a=dv.ColumnRule(dtype="int"), b=dv.ColumnRule(dtype="string"))
    assert dv.read_compatibility(w, w).ok


def test_projection_ignores_extra_writer_columns():
    w = _c(a=dv.ColumnRule(dtype="int"), b=dv.ColumnRule(dtype="string"))
    r = _c(a=dv.ColumnRule(dtype="int"))
    assert dv.read_compatibility(w, r).ok


def test_missing_reader_column():
    w = _c(a=dv.ColumnRule(dtype="int"))
    r = _c(a=dv.ColumnRule(dtype="int"), b=dv.ColumnRule(dtype="string"))
    res = dv.read_compatibility(w, r)
    assert not res.ok and _kinds(res) == ["missing_column"]


def test_avro_promotions_allowed():
    w = _c(
        a=dv.ColumnRule(dtype="int"),
        b=dv.ColumnRule(dtype="float"),
        c=dv.ColumnRule(dtype="tinyint"),
        d=dv.ColumnRule(dtype="bigint"),
    )
    r = _c(
        a=dv.ColumnRule(dtype="bigint"),
        b=dv.ColumnRule(dtype="double"),
        c=dv.ColumnRule(dtype="double"),
        d=dv.ColumnRule(dtype="double"),
    )
    assert dv.read_compatibility(w, r).ok


def test_narrowing_rejected():
    # cross-family narrowing: double → integer family, string → numeric.
    # (Width changes WITHIN the int family are equivalent by the engine's
    # dtype model — normalize_dtype collapses them, same as validation.)
    w = _c(a=dv.ColumnRule(dtype="double"), b=dv.ColumnRule(dtype="string"))
    r = _c(a=dv.ColumnRule(dtype="bigint"), b=dv.ColumnRule(dtype="int"))
    res = dv.read_compatibility(w, r)
    assert not res.ok and _kinds(res) == ["dtype", "dtype"]


def test_pandas_era_names_normalized():
    # int64 (pandas-era) == bigint (Spark) — same normalization layer
    # validation uses, so equivalence is consistent engine-wide
    w = _c(a=dv.ColumnRule(dtype="int64"))
    r = _c(a=dv.ColumnRule(dtype="bigint"))
    assert dv.read_compatibility(w, r).ok


def test_missingness_guarantee():
    w = _c(a=dv.ColumnRule(dtype="int", max_missing_frac=0.5))
    r = _c(a=dv.ColumnRule(dtype="int", max_missing_frac=0.1))
    res = dv.read_compatibility(w, r)
    assert not res.ok and _kinds(res) == ["missingness"]
    # opposite direction is fine: writer guarantees MORE than reader needs
    assert dv.read_compatibility(
        _c(a=dv.ColumnRule(dtype="int", max_missing_frac=0.1)),
        _c(a=dv.ColumnRule(dtype="int", max_missing_frac=0.5)),
    ).ok


def test_range_containment():
    w = _c(a=dv.ColumnRule(dtype="int", min_value=0, max_value=100))
    assert dv.read_compatibility(
        w, _c(a=dv.ColumnRule(dtype="int", min_value=-10, max_value=200))
    ).ok
    res = dv.read_compatibility(
        w, _c(a=dv.ColumnRule(dtype="int", min_value=10, max_value=50))
    )
    assert not res.ok and _kinds(res) == ["range"]
    # unbounded writer vs bounded reader is incompatible
    res2 = dv.read_compatibility(
        _c(a=dv.ColumnRule(dtype="int")),
        _c(a=dv.ColumnRule(dtype="int", min_value=0)),
    )
    assert not res2.ok and _kinds(res2) == ["range"]
    # bounded writer vs unbounded reader is fine
    assert dv.read_compatibility(w, _c(a=dv.ColumnRule(dtype="int"))).ok


def test_category_containment():
    w = _c(a=dv.ColumnRule(dtype="string", allowed_values={"x", "y"}))
    assert dv.read_compatibility(
        w, _c(a=dv.ColumnRule(dtype="string", allowed_values={"x", "y", "z"}))
    ).ok
    res = dv.read_compatibility(
        w, _c(a=dv.ColumnRule(dtype="string", allowed_values={"x"}))
    )
    assert not res.ok and _kinds(res) == ["category"]
    # open writer domain vs closed reader domain is incompatible
    res2 = dv.read_compatibility(
        _c(a=dv.ColumnRule(dtype="string")),
        _c(a=dv.ColumnRule(dtype="string", allowed_values={"x"})),
    )
    assert not res2.ok and _kinds(res2) == ["category"]


def test_multiple_issues_accumulate():
    w = _c(a=dv.ColumnRule(dtype="string", max_missing_frac=0.9))
    r = _c(
        a=dv.ColumnRule(dtype="int", max_missing_frac=0.0),
        b=dv.ColumnRule(dtype="int"),
    )
    res = dv.read_compatibility(w, r)
    assert _kinds(res) == ["dtype", "missing_column", "missingness"]


def test_type_errors():
    with pytest.raises(TypeError):
        dv.read_compatibility(_c(a=dv.ColumnRule(dtype="int")), "nope")
