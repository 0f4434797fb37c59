"""Token-array near-dedup (dedup.token_shingles_expr / token_near_duplicates).

Planted near-duplicate token sequences pin the k-gram shingling, the
jaccard arithmetic, threshold filtering, and the short-sequence
whole-array shingle convention.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators import dedup


def _tokens_frame(spark):
    base = list(range(100, 140))          # 40 tokens
    near = base[:20] + [999] + base[21:]  # one substitution
    far = list(range(5000, 5040))         # disjoint
    rows = [(0, base), (1, near), (2, far)]
    return spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")


def test_token_shingles_expr(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, [7, 7])],
        "doc_id bigint, tokens array<int>",
    )
    out = df.select(
        dedup.token_shingles_expr("tokens", size=3).alias("sh")
    ).collect()
    assert out[0]["sh"] == ["1,2,3", "2,3,4"]
    # shorter than k -> one whole-sequence shingle
    assert out[1]["sh"] == ["7,7"]


def test_token_near_duplicates_finds_planted_pair(spark):
    pairs = dedup.token_near_duplicates(
        _tokens_frame(spark),
        tokens_col="tokens",
        id_col="doc_id",
        k=8,
        num_hashes=16,
        bands=8,
        threshold=0.5,
    ).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    # 40-token seqs, k=8: 33 shingles each; one substitution kills the
    # 8 grams covering position 20 -> inter=25 shingles, union=41
    assert pairs[0]["jaccard"] == round(25 / 41, 6)


def test_blank_sequences_never_pair(spark):
    """NULL/empty token arrays shingle to an EMPTY array and are
    filtered before signature generation — two blank rows must NOT
    verify as a jaccard-1.0 pair (the blank-corpus flooding bug)."""
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, []), (2, []), (3, None)],
        "doc_id bigint, tokens array<int>",
    )
    sh = df.select(
        dedup.token_shingles_expr("tokens", size=3).alias("sh")
    ).collect()
    assert sh[1]["sh"] == [] and sh[2]["sh"] == [] and sh[3]["sh"] == []
    pairs = dedup.token_near_duplicates(
        df,
        tokens_col="tokens",
        id_col="doc_id",
        k=3,
        num_hashes=16,
        bands=8,
        threshold=0.5,
    ).collect()
    assert pairs == []


def test_threshold_excludes_weak_pairs(spark):
    pairs = dedup.token_near_duplicates(
        _tokens_frame(spark),
        tokens_col="tokens",
        id_col="doc_id",
        k=8,
        num_hashes=16,
        bands=8,
        threshold=0.99,
    ).collect()
    assert pairs == []
