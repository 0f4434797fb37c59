"""Incremental index-backed near-dedup (operators/incremental.py):
index construction, bipartite corpus screen, hashed-shingle verify
parity with text-level jaccard, witness capping, within-batch keep-one,
cold start, and the batch-broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.dedup import (
    jaccard_verify,
)
from dsci_524_g26_data_validation_spark.operators.incremental import (
    admit_batch,
    incremental_near_dup_pairs,
    minhash_index,
    shingle_hash_index,
)

PARAMS = dict(shingle_size=3, num_hashes=16, bands=8, seed=42)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


WORDS = [
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "kilo lima mike november oscar papa quebec romeo sierra tango",
    "uniform victor whiskey xray yankee zulu apple banana cherry date",
]


@pytest.fixture()
def corpus(spark):
    return _docs(
        spark,
        [
            (1, WORDS[0]),
            (2, WORDS[1]),
            (3, WORDS[2] + " elderberry fig grape"),
        ],
    )


def test_index_schemas(corpus):
    bi = minhash_index(corpus, **PARAMS)
    assert bi.columns == ["doc_id", "band", "digest"]
    assert bi.count() == 3 * 8  # one row per (doc, band)
    hi = shingle_hash_index(corpus, shingle_size=3, seed=42)
    assert hi.columns == ["doc_id", "sh_hashes"]
    assert dict(hi.dtypes)["sh_hashes"] == "array<bigint>"


def test_corpus_screen_finds_near_and_exact_dups(spark, corpus):
    batch = _docs(
        spark,
        [
            (10, WORDS[0]),  # exact copy of corpus doc 1
            (11, WORDS[1] + " extra"),  # near copy of corpus doc 2
            (12, "totally novel words nothing shared here at all ok"),
        ],
    )
    pairs = incremental_near_dup_pairs(
        batch,
        minhash_index(corpus, **PARAMS),
        shingle_hash_index(corpus, shingle_size=3, seed=42),
        threshold=0.5,
        **PARAMS,
    )
    got = {(r.batch_id, r.corpus_id): r.jaccard for r in pairs.collect()}
    assert (10, 1) in got and got[(10, 1)] == 1.0
    assert (11, 2) in got and 0.5 <= got[(11, 2)] < 1.0
    assert all(b != 12 for b, _ in got)


def test_hashed_jaccard_matches_text_jaccard(spark, corpus):
    """The sidecar verify (8-byte hashed shingles) must produce the same
    jaccard values as the text-level jaccard_verify on the same pairs."""
    batch = _docs(spark, [(10, WORDS[0]), (11, WORDS[1] + " extra")])
    pairs = incremental_near_dup_pairs(
        batch,
        minhash_index(corpus, **PARAMS),
        shingle_hash_index(corpus, shingle_size=3, seed=42),
        threshold=0.1,
        **PARAMS,
    )
    both = corpus.unionByName(batch)
    cand = pairs.select(
        F.least("batch_id", "corpus_id").alias("id_a"),
        F.greatest("batch_id", "corpus_id").alias("id_b"),
    )
    text_j = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_verify(
            both, cand, shingle_size=3, threshold=0.0
        ).collect()
    }
    for r in pairs.collect():
        key = (min(r.batch_id, r.corpus_id), max(r.batch_id, r.corpus_id))
        assert text_j[key] == r.jaccard


def test_parameter_mismatch_yields_no_collisions(spark, corpus):
    batch = _docs(spark, [(10, WORDS[0])])
    pairs = incremental_near_dup_pairs(
        batch,
        minhash_index(corpus, shingle_size=3, num_hashes=16, bands=8, seed=7),
        shingle_hash_index(corpus, shingle_size=3, seed=7),
        threshold=0.5,
        **PARAMS,  # seed=42 batch vs seed=7 index
    )
    assert pairs.count() == 0


def test_max_witnesses_caps_and_keeps_min_ids(spark):
    """100 identical corpus docs = one boilerplate bucket; a colliding
    batch doc must verify against only the k smallest corpus ids."""
    corpus = _docs(spark, [(i, WORDS[0]) for i in range(1, 101)])
    batch = _docs(spark, [(500, WORDS[0])])
    pairs = incremental_near_dup_pairs(
        batch,
        minhash_index(corpus, **PARAMS),
        shingle_hash_index(corpus, shingle_size=3, seed=42),
        threshold=0.5,
        max_witnesses=3,
        **PARAMS,
    )
    got = sorted(r.corpus_id for r in pairs.collect())
    assert got == [1, 2, 3]  # every band's bucket keeps the same min ids


def test_admit_batch_full_flow(spark, corpus):
    batch = _docs(
        spark,
        [
            (10, WORDS[0]),  # dup of corpus -> dropped
            (11, WORDS[1] + " extra"),  # near-dup of corpus -> dropped
            (12, WORDS[2] + " kiwi lemon mango"),  # near-dup of corpus 3
            (20, "one two three four five six seven eight nine ten"),
            (21, "one two three four five six seven eight nine ten!"),
            # 20/21 near-dup each other (novel) -> keep min id 20
            (30, "completely different content with no overlap anywhere"),
        ],
    )
    admitted = admit_batch(
        batch,
        minhash_index(corpus, **PARAMS),
        shingle_hash_index(corpus, shingle_size=3, seed=42),
        threshold=0.5,
        **PARAMS,
    )
    assert admitted.columns == batch.columns
    assert sorted(r.doc_id for r in admitted.collect()) == [20, 30]


def test_admit_batch_index_update_closes_the_loop(spark, corpus):
    """Appending the admitted docs' index rows makes the NEXT batch see
    them: a copy of an admitted doc is rejected on ingest 2."""
    novel = "one two three four five six seven eight nine ten"
    batch1 = _docs(spark, [(20, novel)])
    bi = minhash_index(corpus, **PARAMS)
    hi = shingle_hash_index(corpus, shingle_size=3, seed=42)
    admitted1 = admit_batch(batch1, bi, hi, threshold=0.5, **PARAMS)
    assert admitted1.count() == 1
    bi2 = bi.unionByName(minhash_index(admitted1, **PARAMS))
    hi2 = hi.unionByName(
        shingle_hash_index(admitted1, shingle_size=3, seed=42)
    )
    batch2 = _docs(spark, [(40, novel + " ha"), (41, "novel again zz qq")])
    admitted2 = admit_batch(batch2, bi2, hi2, threshold=0.5, **PARAMS)
    assert sorted(r.doc_id for r in admitted2.collect()) == [41]


def test_cold_start_empty_index(spark):
    """No corpus yet: the screen is a no-op and the batch self-dedups."""
    batch = _docs(
        spark,
        [(1, WORDS[0]), (2, WORDS[0] + " x"), (3, WORDS[1])],
    )
    empty = _docs(spark, []).limit(0)
    bi = minhash_index(empty, **PARAMS).limit(0)
    hi = shingle_hash_index(empty, shingle_size=3, seed=42).limit(0)
    admitted = admit_batch(batch, bi, hi, threshold=0.5, **PARAMS)
    assert sorted(r.doc_id for r in admitted.collect()) == [1, 3]


def test_screen_plan_broadcasts_batch_not_index(spark):
    """The index side must never shuffle: the candidate join is a
    broadcast hash join with the BATCH bands on the broadcast side."""
    corpus = _docs(spark, [(i, WORDS[i % 3] + f" w{i}") for i in range(50)])
    batch = _docs(spark, [(500, WORDS[0])])
    pairs = incremental_near_dup_pairs(
        batch,
        minhash_index(corpus, **PARAMS),
        shingle_hash_index(corpus, shingle_size=3, seed=42),
        threshold=0.5,
        **PARAMS,
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
