"""Degenerate-input behavior: empty tables, all-null columns, 0-row
streams — the engine must report cleanly, never throw."""

from __future__ import annotations

from pyspark.sql import types as T

import dsci_524_g26_data_validation_spark as dv

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

TC = dv.TableContract(
    contract=dv.Contract(
        columns={
            "doc_id": dv.ColumnRule(dtype="string"),
            "tokens": dv.ColumnRule(dtype="array<int>"),
            "n_tok": dv.ColumnRule(dtype="int", min_value=1),
            "source": dv.ColumnRule(dtype="string", allowed_values={"web"}),
        }
    ),
    unique_keys=("doc_id",),
    invariants=("n_tok = size(tokens)",),
)


def test_empty_table_full_pass_is_ok(spark):
    empty = spark.createDataFrame([], SCHEMA)
    res = dv.validate_table_contract(empty, TC, reference=empty)
    assert res.ok is True


def test_empty_table_infer(spark):
    empty = spark.createDataFrame([], SCHEMA)
    c = dv.infer_contract(empty)
    assert set(c.columns) == {"doc_id", "tokens", "n_tok", "source"}
    r = c.columns["n_tok"]
    # no rows -> no bounds, zero missingness (reference all-null/empty path)
    assert r.min_value is None and r.max_value is None
    assert r.max_missing_frac == 0.0


def test_all_null_column(spark):
    df = spark.createDataFrame([(None, None, None, None)] * 3, SCHEMA)
    res = dv.validate_contract(
        df, dv.Contract(columns={"n_tok": dv.ColumnRule(dtype="int", min_value=1)}),
        strict=False,
    )
    # all-null: missingness fires (1.0 > 0.0); range can't (no values)
    kinds = [i.kind for i in res.issues]
    assert kinds == ["missingness"]


def test_token_equality_empty_and_disjoint(spark):
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        key_integrity_counts,
        token_equality_violations,
    )

    empty = spark.createDataFrame([], SCHEMA)
    a = dv.token_table(spark, 100, num_partitions=2)
    # empty vs empty
    assert token_equality_violations(empty, empty).count() == 0
    kc = key_integrity_counts(empty, empty)
    assert kc["dup_keys"] == 0 and kc["eq_bad_keys"] == 0
    # disjoint keys: inner-join semantics -> nothing to compare
    b = a.selectExpr("concat(doc_id, '_x') as doc_id", "tokens", "n_tok", "source")
    assert token_equality_violations(a, b).count() == 0
    assert key_integrity_counts(a, b)["eq_bad_keys"] == 0


def test_duplicate_keys_with_nulls(spark):
    df = spark.createDataFrame(
        [(None, [1], 1, "web"), (None, [2], 1, "web"), ("a", [1], 1, "web")],
        SCHEMA,
    )
    dup = dv.duplicate_keys(df, "doc_id").collect()
    # NULL keys group like SQL GROUP BY: two NULLs are a duplicate pair
    assert len(dup) == 1 and dup[0]["dup_count"] == 2


def test_round3_operators_on_empty_input(spark):
    """Every round-3 operator degrades to an empty (or zeroed) frame on
    a zero-row input instead of raising."""
    from dsci_524_g26_data_validation_spark.operators.chats import (
        conversation_census,
        conversation_violations,
    )
    from dsci_524_g26_data_validation_spark.operators.infer import (
        frequent_values,
    )
    from dsci_524_g26_data_validation_spark.operators.joins import (
        hot_join_keys,
        join_explosion_report,
    )
    from dsci_524_g26_data_validation_spark.operators.labels import (
        label_agreement_census,
        label_agreement_summary,
    )
    from dsci_524_g26_data_validation_spark.operators.preferences import (
        duplicate_prompt_census,
        preference_pair_report,
        preference_pair_violations,
    )
    from dsci_524_g26_data_validation_spark.operators.rowdiff import (
        partition_diff,
    )
    from dsci_524_g26_data_validation_spark.operators.splits import (
        split_census,
        split_leakage,
    )
    from dsci_524_g26_data_validation_spark.operators.terms import (
        salient_terms,
    )
    from dsci_524_g26_data_validation_spark.operators.vocab import zipf_census

    docs = spark.createDataFrame(
        [], "doc_id bigint, text string, source string"
    )
    splits = {"train": 0.9, "test": 0.1}
    assert split_census(docs, splits, id_col="doc_id").count() == 0
    assert (
        split_leakage(docs, splits, id_col="doc_id", content_col="text").count()
        == 0
    )
    assert salient_terms(docs).count() == 0
    assert zipf_census(docs).count() == 0
    assert frequent_values(docs, ["source"]).count() == 0

    turns = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, content string"
    )
    assert conversation_violations(turns).count() == 0
    assert conversation_census(turns).count() == 0

    labeled = spark.createDataFrame([], "lang string, lang_pred string")
    assert label_agreement_census(
        labeled, declared_col="lang", predicted_col="lang_pred"
    ).count() == 0
    s = label_agreement_summary(
        labeled, declared_col="lang", predicted_col="lang_pred"
    ).first()
    assert s.n_rows is None or s.n_rows == 0

    pairs = spark.createDataFrame(
        [], "pair_id int, prompt string, chosen string, rejected string"
    )
    assert preference_pair_violations(pairs, id_col="pair_id").count() == 0
    assert duplicate_prompt_census(pairs).count() == 0
    r = preference_pair_report(pairs).first()
    assert r.n_pairs == 0 and r.n_dup_prompts == 0 and r.ok is True

    keyed = spark.createDataFrame([], "k string")
    jr = join_explosion_report(keyed, keyed, keys=["k"]).first()
    assert jr.join_rows == 0 and jr.n_shared_keys == 0
    assert hot_join_keys(keyed, keyed, keys=["k"]).count() == 0

    part = spark.createDataFrame([], "p string, v int")
    assert partition_diff(part, part, partition_col="p").count() == 0
