"""Tests for the training-data pipeline operators: text analysis, dedup
(exact / MinHash-LSH / SimHash / Jaccard), similarity search, multimodal
plumbing — over the driver testdata and synthetic fixtures.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


# -- text --------------------------------------------------------------------


def test_token_stats(docs):
    stats = text.token_stats(docs).collect()
    assert len(stats) == 20  # src0..src19
    for r in stats:
        assert r["total_tokens"] > 0
        assert 0 < r["avg_tokens"] <= r["max_tokens"]


def test_token_count_matches_python(docs):
    sample = docs.limit(50).select("doc_id", "text").collect()
    counted = {
        r["doc_id"]: r["n"]
        for r in docs.limit(50)
        .select("doc_id", text.token_count_expr("text").alias("n"))
        .collect()
    }
    for r in sample:
        assert counted[r["doc_id"]] == len(r["text"].split(" "))


def test_quality_score_bounds(docs):
    rows = docs.select(text.quality_score_expr("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_repetition_metrics_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a a a a a"),
            (2, "one two three four five six seven eight"),
            (3, "spam ham spam ham spam ham spam ham"),
            (4, "solo"),
            (5, "two words"),
        ],
        "doc_id int, text string",
    )
    m = {r["doc_id"]: r for r in text.repetition_metrics(df).collect()}
    # doc 1: 8 words, 1 distinct; every bigram/trigram identical
    assert m[1]["dup_word_frac"] == pytest.approx(1 - 1 / 8, abs=1e-6)
    assert m[1]["top_bigram_frac"] == 1.0
    assert m[1]["top_trigram_frac"] == 1.0
    # doc 2: all distinct words; 7 distinct bigrams -> mode frac 1/7
    assert m[2]["dup_word_frac"] == 0.0
    assert m[2]["top_bigram_frac"] == pytest.approx(1 / 7, abs=1e-6)
    # doc 3: "spam ham" claims 4 of 7 bigram slots
    assert m[3]["top_bigram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    # doc 4: a single word has no bigrams (and must NOT hit Spark's
    # descending-sequence trap) -> 0.0, not an error
    assert m[4]["n_words"] == 1
    assert m[4]["top_bigram_frac"] == 0.0 and m[4]["top_trigram_frac"] == 0.0
    # doc 5: exactly one bigram -> 1.0; no trigram -> 0.0
    assert m[5]["top_bigram_frac"] == 1.0 and m[5]["top_trigram_frac"] == 0.0


def test_repetitive_docs_filter(spark):
    df = spark.createDataFrame(
        [
            (1, ("buy now " * 20).strip()),
            (2, "a genuinely varied sentence holding many different interesting words"),
        ],
        "doc_id int, text string",
    )
    flagged = {r["doc_id"] for r in text.repetitive_docs(df).collect()}
    assert flagged == {1}


def test_repetition_by_group(docs):
    rows = text.repetition_by_group(docs).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_docs"] > 0
        assert 0.0 <= r["avg_dup_word_frac"] <= 1.0
        assert 0.0 < r["avg_top_bigram_frac"] <= 1.0
        assert r["avg_top_bigram_frac"] <= r["max_top_bigram_frac"] <= 1.0


def test_max_run_expr_mode_count(spark):
    df = spark.createDataFrame(
        [(["a", "a", "b"],), (["z"],), ([],)], "arr array<string>"
    )
    got = sorted(
        r["mx"]
        for r in df.select(
            text.max_run_expr(F.array_sort(F.col("arr"))).alias("mx")
        ).collect()
    )
    assert got == [0, 1, 2]


def test_simhash_portable_mode(spark):
    """Portable (md5-derived) token hashing finds the same planted
    near-dup structure as the xxhash64 fast path, and signatures are
    deterministic across calls (the property the oracle relies on)."""
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("dog", "cat")), (3, "entirely different words here")],
        "doc_id int, text string",
    )
    for mode in ("xxhash64", "portable"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_near_duplicates(
                df, max_hamming=10, token_hash=mode
            ).collect()
        }
        assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs
    s1 = dedup.simhash(df, token_hash="portable").collect()
    s2 = dedup.simhash(df, token_hash="portable").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    with pytest.raises(ValueError, match="token_hash"):
        dedup.simhash(df, token_hash="sha1")


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is happy"),
            (2, "le chat est sur la table et il est content"),
            (3, "der hund ist ein guter freund und die katze auch"),
            (4, "el perro es un buen amigo y la casa es grande"),
            (5, "xyzzy plugh qwerty"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}


def test_fingerprints_identical_text_identical_fp(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d f")],
        "doc_id bigint, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprints(df).collect()}
    assert fp[1] == fp[2] != fp[3]


# -- dedup -------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup
        (4, "completely different content about spark dataframes and shuffles here"),
        (5, "another unrelated document discussing histograms and drift detection"),
    ]
    return spark.createDataFrame(base, "doc_id bigint, text string")


def test_exact_duplicates(dup_docs):
    groups = dedup.exact_duplicates(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 2
    assert groups[0]["keep_id"] == 1


def test_deduplicate_exact(dup_docs):
    kept = dedup.deduplicate_exact(dup_docs)
    assert kept.count() == 4
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {1, 3, 4, 5}  # survivor is min id


def test_minhash_lsh_finds_near_dups(dup_docs):
    cand = dedup.minhash_lsh_candidates(dup_docs, num_hashes=32, bands=16)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (1, 2) in pairs  # exact dup always collides
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup collides w.h.p.
    # unrelated docs don't appear together
    assert not any({a, b} == {4, 5} for a, b in pairs)


def test_jaccard_verify(dup_docs):
    cand = dedup.minhash_lsh_candidates(dup_docs, num_hashes=32, bands=16)
    verified = dedup.jaccard_verify(dup_docs, cand, threshold=0.5)
    rows = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert rows[(1, 2)] == 1.0
    pair13 = rows.get((1, 3)) or rows.get((2, 3))
    assert pair13 is not None and 0.5 <= pair13 < 1.0


def test_simhash_near_duplicates(dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(dup_docs).collect()}
    assert sh[1] == sh[2]  # identical text → identical signature
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(dup_docs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0


def test_exact_dedup_at_scale(docs):
    # testdata documents are unique → dedup keeps everything
    assert dedup.exact_duplicates(docs).count() == 0
    assert dedup.deduplicate_exact(docs).count() == docs.count()


# -- similarity --------------------------------------------------------------


def test_cosine_topk_bruteforce(emb):
    query = emb.filter("vec_id = 0").select("embedding").first()["embedding"]
    top = similarity.cosine_topk_bruteforce(emb, list(query), k=5).collect()
    assert len(top) == 5
    assert top[0]["vec_id"] == 0  # self is most similar
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-5)
    cosines = [r["cosine"] for r in top]
    assert cosines == sorted(cosines, reverse=True)


def test_cosine_topk_lsh_approximates_bruteforce(emb):
    query = list(emb.filter("vec_id = 7").select("embedding").first()["embedding"])
    exact = similarity.cosine_topk_bruteforce(emb, query, k=10).collect()
    approx = similarity.cosine_topk_lsh(emb, query, k=10, n_planes=6).collect()
    # the query's own vector must be found, and recall@10 should be decent
    assert approx[0]["vec_id"] == 7
    exact_ids = {r["vec_id"] for r in exact}
    approx_ids = {r["vec_id"] for r in approx}
    assert len(exact_ids & approx_ids) >= 5
    # LSH scans a strict subset of rows
    assert len(approx) <= 10


def test_embedding_near_duplicates(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    pairs = similarity.embedding_near_duplicates(df, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


# -- multimodal --------------------------------------------------------------


def test_media_plumbing(spark):
    media = multimodal.media_table(spark, 300, num_partitions=4).cache()
    # same names/types (nullability of generated columns may differ)
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}

    decoded = multimodal.decode_images(media)
    rows = decoded.collect()
    assert len(rows) == media.filter("kind = 'image'").count()
    assert all(r["ok"] and r["n_pixels"] == r["width"] * r["height"] for r in rows)

    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 300
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic across runs
    feats2 = multimodal.extract_features(
        multimodal.media_table(spark, 300, num_partitions=4)
    ).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in feats} == {
        r["media_id"]: tuple(r["features"]) for r in feats2
    }

    frames = multimodal.sample_frames(media, every_ms=5000)
    f0 = frames.groupBy("media_id").count().first()
    assert f0["count"] >= 1


def test_real_decode_is_gated(spark):
    media = multimodal.media_table(spark, 10)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises(Exception) as exc_info:
        multimodal.decode_images(media, real_decode=True).collect()
    assert "codec" in str(exc_info.value) or "NotImplementedError" in str(exc_info.value)


def test_lsh_persisted_buckets_match_inline(spark, sf_dir):
    """with_lsh_buckets persisted column gives the same top-k as inline."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = list(e.filter("vec_id = 0").first()["embedding"])
    inline = similarity.cosine_topk_lsh(e, query, k=10).collect()
    persisted_tbl = similarity.with_lsh_buckets(e, dim=len(query))
    persisted = similarity.cosine_topk_lsh(
        persisted_tbl, query, k=10, bucket_col="lsh_buckets"
    ).collect()
    assert [r["vec_id"] for r in inline] == [r["vec_id"] for r in persisted]


def test_key_checks_survive_hot_key_skew(spark):
    """50% of all rows share ONE key: the two-level aggregations must
    stay bounded and return exact counts (no OOM, no wrong answers)."""
    from pyspark.sql import functions as F

    import dsci_524_g26_data_validation_spark as dv
    from dsci_524_g26_data_validation_spark.operators.tokens import (
        key_integrity_counts,
    )

    n = 200_000
    df = spark.range(0, n, 1, 16).select(
        F.when(F.col("id") % 2 == 0, F.lit("HOT"))
        .otherwise(F.format_string("k%09d", F.col("id")))
        .alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("web").alias("source"),
    )
    dup = dv.duplicate_keys(df, "doc_id").collect()
    assert len(dup) == 1 and dup[0]["dup_count"] == n // 2
    ref = df.dropDuplicates(["doc_id"])
    kc = key_integrity_counts(df, ref)
    assert kc["dup_keys"] == 1
    assert kc["surplus_rows"] == n // 2 - 1


def test_minhash_degenerate_bucket_cap(spark):
    """5k identical docs: the capped path must produce O(n) star pairs
    (anchored at the min id), not the quadratic all-pairs blowup."""
    n = 5000
    df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate terms of service text repeated verbatim many times").alias(
            "text"
        ),
    )
    cand = dedup.minhash_lsh_candidates(
        df, num_hashes=16, bands=8, max_bucket_size=100
    )
    rows = cand.collect()
    # star topology: every non-anchor doc pairs with doc 0, once
    assert len(rows) == n - 1
    assert all(r["id_a"] == 0 for r in rows)
    # honest metrics (ADVICE r2): star-derived pairs report n_bands = 0
    # (no REAL band collision was observed) and carry the star flag —
    # callers thresholding on n_bands are never fed synthetic counts
    assert all(r["n_bands"] == 0 for r in rows)
    assert all(r["star_linked"] for r in rows)
    assert {r["id_b"] for r in rows} == set(range(1, n))


def test_minhash_cap_neutral_on_small_buckets(dup_docs):
    """With every bucket under the cap, capped and uncapped outputs are
    identical — the cap only changes behavior where the blowup is."""
    capped = {
        (r["id_a"], r["id_b"], r["n_bands"])
        for r in dedup.minhash_lsh_candidates(
            dup_docs, num_hashes=32, bands=16, max_bucket_size=1000
        ).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"], r["n_bands"])
        for r in dedup.minhash_lsh_candidates(
            dup_docs, num_hashes=32, bands=16, max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped


def test_embedding_near_dup_recall_vs_bruteforce(spark):
    """Planted near-dup pairs: LSH recall >= 0.95 against brute-force
    ground truth at threshold 0.95 (VERDICT r1 item 2)."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim, n_base, n_dups = 16, 200, 60
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # copies of the first n_dups vectors with small angular noise
    noisy = base[:n_dups] + rng.normal(scale=0.04, size=(n_dups, dim))
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    all_vecs = np.vstack([base, noisy])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(all_vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    sims = all_vecs @ all_vecs.T
    gt = {
        (i, j)
        for i in range(len(all_vecs))
        for j in range(i + 1, len(all_vecs))
        if sims[i, j] >= 0.95
    }
    assert len(gt) >= n_dups  # the plant worked

    found = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_duplicates(df, threshold=0.95).collect()
    }
    assert found <= gt  # exact verification: no false positives
    recall = len(found & gt) / len(gt)
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95 (found {len(found)}/{len(gt)})"


def test_lsh_buckets_udf_tolerates_dirty_vectors(spark):
    """NULL or wrong-dimension embeddings get NULL buckets (silently
    excluded from bucketed search) instead of crashing the Arrow batch."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),
        (3, [1.0, 0.0]),  # wrong dim
        (4, [0.9, 0.1, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = similarity.with_lsh_buckets(df, dim=4, n_planes=4, n_tables=2)
    got = {r["vec_id"]: r["lsh_buckets"] for r in out.collect()}
    assert got[2] is None and got[3] is None
    assert got[1] is not None and len(got[1]) == 2
    # bucketed top-k over the dirty table must not crash and must only
    # rank the valid vectors
    top = similarity.cosine_topk_lsh(
        df, [1.0, 0.0, 0.0, 0.0], k=4, n_planes=4, n_tables=2
    ).collect()
    assert {r["vec_id"] for r in top} <= {1, 4}


def test_simhash_degenerate_block_cap(spark):
    """5k identical docs: capped path produces star pairs at Hamming 0,
    not the quadratic all-pairs block join."""
    n = 5000
    df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate text repeated across the whole corpus").alias(
            "text"
        ),
    )
    pairs = dedup.simhash_near_duplicates(df, max_block_size=100).collect()
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in pairs)
    assert {r["id_b"] for r in pairs} == set(range(1, n))


def test_simhash_cap_neutral_on_small_blocks(dup_docs):
    capped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_near_duplicates(dup_docs, max_block_size=1000).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_near_duplicates(dup_docs, max_block_size=None).collect()
    }
    assert capped == uncapped


def test_bpe_token_count_matches_python_re(docs):
    import re

    pat = re.compile(text.BPE_SPLIT_PATTERN)
    sample = docs.limit(30).select("doc_id", "text").collect()
    counted = {
        r["doc_id"]: r["n"]
        for r in docs.limit(30)
        .select("doc_id", text.bpe_token_count_expr("text").alias("n"))
        .collect()
    }
    for r in sample:
        assert counted[r["doc_id"]] == len(pat.findall(r["text"]))
    # BPE-ish splits always >= whitespace words (punctuation separates)
    both = docs.limit(200).select(
        text.token_count_expr("text").alias("w"),
        text.bpe_token_count_expr("text").alias("b"),
    ).collect()
    assert all(r["b"] >= r["w"] for r in both)


def test_ivf_topk_recall_and_pruning(emb):
    """IVF: recall@10 vs brute force at modest probe counts, NULL cells
    for dirty vectors, persisted-cell parity with inline assignment."""
    query = list(emb.filter("vec_id = 3").first()["embedding"])
    cents = similarity.ivf_centroids(emb, n_cells=8, seed=7)
    truth = [r["vec_id"] for r in similarity.cosine_topk_bruteforce(emb, query, k=10).collect()]

    # probing ALL cells must recover brute force exactly
    allcells = similarity.cosine_topk_ivf(emb, query, cents, k=10, n_probe=8)
    assert [r["vec_id"] for r in allcells.collect()] == truth

    # half the cells: decent recall at half the scan
    half = {r["vec_id"] for r in similarity.cosine_topk_ivf(emb, query, cents, k=10, n_probe=4).collect()}
    assert len(half & set(truth)) >= 5

    # persisted cell column gives identical results to inline assignment
    tbl = similarity.with_ivf_cells(emb, cents)
    persisted = similarity.cosine_topk_ivf(
        tbl, query, cents, k=10, n_probe=4, cell_col="ivf_cell"
    )
    assert {r["vec_id"] for r in persisted.collect()} == half


def test_ivf_cells_null_safe(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, None),
        (3, [1.0]),  # wrong dim
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = {r["vec_id"]: r["ivf_cell"] for r in similarity.with_ivf_cells(df, cents).collect()}
    assert out[1] == 0 and out[4] == 1
    assert out[2] is None and out[3] is None


def _components(n_ids, pairs):
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return frozenset(
        frozenset(i for i in range(n_ids) if find(i) == r)
        for r in {find(i) for i in range(n_ids)}
    )


def test_minhash_cap_preserves_connected_components(spark):
    """The cap's contract: dedup clustering (union-find over candidate
    pairs) produces IDENTICAL components with and without the cap —
    star-linking trades clique edges for anchor edges, never
    connectivity. Mixed over/under-cap groups exercised together."""
    rows = []
    for i in range(120):
        rows.append((i, "huge duplicated boilerplate group alpha text"))
    for i in range(120, 180):
        rows.append((i, "second duplicated cluster beta text body here"))
    for i in range(180, 185):
        rows.append((i, "tiny duplicate gamma group under the cap limit"))
    for i in range(185, 200):
        rows.append((i, f"unique document number {i} about topic {i * 7}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def pairs(cap):
        return {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_candidates(
                df, num_hashes=16, bands=8, max_bucket_size=cap
            ).collect()
        }

    capped, uncapped = pairs(50), pairs(None)
    assert capped <= uncapped  # star edges are a subset of clique edges
    assert len(capped) < len(uncapped)  # the cap actually pruned
    assert _components(200, capped) == _components(200, uncapped)


def test_winnow_candidates_finds_copy(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "PREFIX the quick brown fox jumps over the lazy dog again and again"),
        (3, "totally different content discussing spark physical plans instead"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in dedup.winnow_candidates(df, min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)


def test_winnow_candidates_degenerate_cap(spark):
    n = 3000
    df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate legal disclaimer text repeated on every single page").alias(
            "text"
        ),
    )
    pairs = dedup.winnow_candidates(df, max_bucket_size=100, min_shared=1).collect()
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 for r in pairs)


def test_resolve_components_chain_and_clique(spark):
    """Chains (a-b, b-c without a-c) and cliques resolve to one
    component each; isolated pairs stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22), (21, 22)],
        "id_a bigint, id_b bigint",
    )
    comp = {
        r["id"]: r["comp"] for r in dedup.resolve_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_deduplicate_near_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, "the quick brown fox jumps over the lazy dog again and again tonight"),
            (4, "completely different content about spark dataframes and shuffles here"),
        ],
        "doc_id bigint, text string",
    )
    cand = dedup.jaccard_verify(
        docs, dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=16),
        threshold=0.5,
    )
    kept = dedup.deduplicate_near(docs, cand)
    ids = {r["doc_id"] for r in kept.collect()}
    # 1,2,3 form one near-dup component -> min id 1 survives; 4 untouched
    assert ids == {1, 4}


def test_resolve_components_nonconvergence_raises(spark):
    # a long chain cannot converge in 1 iteration
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError):
        dedup.resolve_components(pairs, max_iter=1)


def test_resolve_components_long_chain_pointer_jumping(spark):
    """60-node chain (diameter 59) must converge within the default
    max_iter=10 — pointer jumping gives O(log diameter) convergence."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a bigint, id_b bigint"
    )
    comp = {r["id"]: r["comp"] for r in dedup.resolve_components(pairs).collect()}
    assert set(comp.values()) == {0} and len(comp) == 60


def test_winnow_candidates_star_bypasses_min_shared(spark):
    """Docs in an over-cap boilerplate bucket must stay connected even
    when min_shared exceeds their star-edge count."""
    n = 2000
    df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate body repeated everywhere in this corpus").alias(
            "text"
        ),
    )
    pairs = dedup.winnow_candidates(df, max_bucket_size=100, min_shared=3).collect()
    assert len(pairs) == n - 1  # star edges survive the min_shared filter
    assert all(r["id_a"] == 0 for r in pairs)


def test_infer_dim_robust_to_dirty_leading_rows(spark):
    """A NULL or junk-length vector in row 1 must not decide (or crash)
    dimension inference — the modal length over non-null rows wins."""
    rows = [(0, None), (1, [1.0, 2.0])] + [
        (i, [float(i), 0.0, 1.0, 0.5]) for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    assert similarity.infer_dim(df) == 4
    # end-to-end: near-dup search over the dirty table neither crashes
    # nor silently drops the valid corpus
    pairs = similarity.embedding_near_duplicates(
        df.unionByName(
            spark.createDataFrame(
                [(1000, [2.0, 0.0, 1.0, 0.5])],
                "vec_id bigint, embedding array<double>",
            )
        ),
        threshold=0.99,
        n_planes=4,
        n_tables=4,
    ).collect()
    assert (2, 1000) in {(r["id_a"], r["id_b"]) for r in pairs}


def test_embedding_degenerate_bucket_cap(spark):
    """3k identical embeddings: the capped path must produce O(n) star
    pairs (all exact-cosine verified), not the quadratic bucket join."""
    n = 3000
    df = spark.range(0, n, 1, 8).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5), F.lit(0.25), F.lit(0.0)).alias("embedding"),
    )
    pairs = similarity.embedding_near_duplicates(
        df, threshold=0.99, n_planes=4, n_tables=2, dim=4, max_bucket_size=100
    ).collect()
    assert len(pairs) == n - 1
    assert all(r["id_a"] == 0 for r in pairs)
    assert all(r["cosine"] == 1.0 for r in pairs)


def test_lsh_exhaustive_probe_equals_bruteforce(emb):
    """probe_hamming = n_planes probes EVERY bucket → the 'approximate'
    search must recover the exact brute-force top-k (partition
    completeness: each vector is in exactly one bucket per table)."""
    query = list(emb.filter("vec_id = 3").select("embedding").first()["embedding"])
    exact = [
        (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk_bruteforce(emb, query, k=10).collect()
    ]
    probed = [
        (r["vec_id"], r["cosine"])
        for r in similarity.cosine_topk_lsh(
            emb, query, k=10, n_planes=6, n_tables=2, probe_hamming=6
        ).collect()
    ]
    assert probed == exact


def test_language_id_ngram(spark):
    df = spark.createDataFrame(
        [
            (1, "The theory of the thing is that singing and dancing go hand in hand."),
            (2, "Le chat est sur la table et la lampe de la maison est belle."),
            (3, "Der Hund und die Katze sind ein gutes Team in der Schule."),
            (4, "El perro que vive en la casa de el vecino es un buen amigo."),
            (5, "zzz qqq"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in text.language_id_ngram(df).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}
    # the expensive steps evaluate once per row: the projection barriers
    # survive optimization (lower() and the trigram transform each
    # appear exactly once in the optimized plan)
    plan = text.language_id_ngram(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("lower(") == 1
    assert plan.count("transform(") == 1


# -- contamination -----------------------------------------------------------


def test_contamination_planted_excerpt(spark):
    from dsci_524_g26_data_validation_spark.operators import contamination as ct

    corpus = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j}" for j in range(40)))
            for i in range(30)
        ],
        "doc_id bigint, text string",
    )
    # benchmark doc 100 = token-aligned excerpt of corpus doc 5
    excerpt = " ".join(f"w5x{j}" for j in range(10, 30))
    bench = spark.createDataFrame(
        [(100, excerpt), (101, "totally novel benchmark question text here")],
        "bench_id bigint, text string",
    )
    pairs = ct.contamination_pairs(corpus, bench, n=8).collect()
    hits = {(r["doc_id"], r["bench_id"]): r for r in pairs}
    assert (5, 100) in hits
    # token-aligned excerpt: every benchmark n-gram appears in doc 5
    assert hits[(5, 100)]["bench_coverage"] == 1.0
    assert all(k[1] != 101 for k in hits)  # novel doc contaminates nothing

    clean = ct.decontaminate(corpus, bench, n=8)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == set(range(30)) - {5}


def test_contamination_broadcasts_benchmark(spark):
    """The n-gram join must broadcast the benchmark side — the corpus is
    never shuffled before the (tiny) hit aggregation."""
    from dsci_524_g26_data_validation_spark.operators import contamination as ct

    corpus = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
    )
    bench = spark.createDataFrame(
        [(1, "document body 7")], "bench_id bigint, text string"
    )
    pairs = ct.contamination_pairs(corpus, bench, n=3)
    plan = pairs._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "a b b c c c", "s1"),
            (2, "c a a", "s1"),
            (3, "z z y", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    rows = text.top_tokens(df, k=2).collect()
    got = {(r["source"], r["rank"]): (r["token"], r["n"]) for r in rows}
    assert got == {
        ("s1", 1): ("c", 4),
        ("s1", 2): ("a", 3),
        ("s2", 1): ("z", 2),
        ("s2", 2): ("y", 1),
    }
    # top-k is pushed below the shuffle (per-partition group limit)
    plan = text.top_tokens(df, k=2)._jdf.queryExecution().sparkPlan().toString()
    assert "WindowGroupLimit" in plan


def test_deduplicate_exact_null_id_contract(spark):
    """Documented contract: NULL-id rows are unaddressable by the
    id-keyed anti-join and always survive; non-null groups still dedup
    to their min id."""
    df = spark.createDataFrame(
        [(None, "same text"), (None, "same text"), (1, "same text"), (2, "same text")],
        "doc_id bigint, text string",
    )
    kept = dedup.deduplicate_exact(df).collect()
    ids = sorted((r["doc_id"] for r in kept), key=lambda x: (x is None, x))
    assert ids == [1, None, None]


def test_encoding_hygiene_planted(spark):
    """Mojibake, control chars, markup residue each counted exactly;
    clean and NULL docs contribute zero findings."""
    from dsci_524_g26_data_validation_spark.operators.text import (
        encoding_hygiene,
    )

    rows = [
        (0, "s", "clean plain text here"),
        (1, "s", "bad � decode �� here"),
        (2, "s", '<div class="x">ad</div> more &nbsp; &#123; text'),
        (3, "s", "ctrl\x07here\x1f"),
        (4, "s", None),
        (5, "s", "héllo wörld"),  # non-ascii but legitimate
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    r = encoding_hygiene(df).first()
    assert r.n_docs == 6
    assert r.docs_replacement == 1 and r.n_replacement == 3
    assert r.docs_control == 1 and r.n_control == 2
    assert r.docs_markup_tag == 1 and r.n_markup_tag == 2
    assert r.docs_entity == 1 and r.n_entity == 2
    assert 0 < r.avg_nonascii_frac < 0.2


def test_json_key_census_accounts_for_all_rows(spark):
    import dsci_524_g26_data_validation_spark as dv

    rows = [
        (0, '{"a": 1, "b": 2}'),
        (1, '{"a": 3}'),
        (2, None),
        (3, "junk"),
        (4, "[1, 2]"),  # valid JSON, not an object -> invalid
        (5, "{}"),
    ]
    df = spark.createDataFrame(rows, "id bigint, props string")
    got = {r.key: (r.n_rows, r.frac) for r in dv.json_key_census(df).collect()}
    assert got == {
        "a": (2, 0.333333),
        "b": (1, 0.166667),
        "__null__": (1, 0.166667),
        "__invalid__": (2, 0.333333),
        "__empty_object__": (1, 0.166667),
    }


def test_json_field_stats_faults_classified(spark):
    import dsci_524_g26_data_validation_spark as dv

    rows = [
        ('{"k": 10}',),
        ('{"k": 30}',),
        ('{"k": "oops"}',),
        ("{}",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "props string")
    r = dv.json_field_stats(df, col="props", field="k").first()
    assert r.n_rows == 5
    assert r.n_missing == 2  # absent key + NULL payload
    assert r.n_nonnumeric == 1
    assert (r.min_value, r.max_value, r.avg_value) == (10.0, 30.0, 20.0)


# -- fuzzy (MinHash) decontamination ------------------------------------------


def test_fuzzy_contamination_catches_edited_leak(spark):
    """A benchmark doc with every 13-gram broken by sparse edits is
    invisible to exact n-gram decontamination but caught by the fuzzy
    (MinHash + exact-Jaccard) path — the scenario the operator exists for."""
    from dsci_524_g26_data_validation_spark.operators import contamination as ct

    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(30)],
        "doc_id bigint, text string",
    )
    # benchmark 200 = corpus doc 5 with words 12/25/38 swapped: the longest
    # untouched run is 12 words, so NO 13-gram survives; shingle jaccard
    # stays ~0.6. benchmark 201 shares nothing.
    words = [f"w5x{j}" for j in range(40)]
    for p in (12, 25, 38):
        words[p] = f"edited{p}"
    bench = spark.createDataFrame(
        [(200, " ".join(words)), (201, "totally novel benchmark text here")],
        "bench_id bigint, text string",
    )
    exact = ct.contamination_pairs(corpus, bench, n=13).collect()
    assert exact == []  # the exact path is blind to this leak

    pairs = ct.fuzzy_contamination_pairs(
        corpus, bench, num_hashes=16, bands=16, threshold=0.5
    ).collect()
    hits = {(r["doc_id"], r["bench_id"]): r["jaccard"] for r in pairs}
    assert (5, 200) in hits
    assert 0.5 <= hits[(5, 200)] < 1.0
    assert all(b != 201 for (_, b) in hits)

    clean = ct.fuzzy_decontaminate(
        corpus, bench, num_hashes=16, bands=16, threshold=0.5
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == set(range(30)) - {5}


def test_fuzzy_contamination_broadcasts_benchmark(spark):
    """Both the band join and the verify joins must broadcast the
    benchmark/candidate side — the corpus never sort-merge-shuffles."""
    from dsci_524_g26_data_validation_spark.operators import contamination as ct

    corpus = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body text of document "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    bench = spark.createDataFrame(
        [(1, "body text of document 7")], "bench_id bigint, text string"
    )
    # threshold 0.7: every corpus doc shares the 2 generic shingles with
    # the benchmark (jaccard exactly 0.5); only doc 7 is the true leak
    pairs = ct.fuzzy_contamination_pairs(
        corpus, bench, num_hashes=16, bands=8, threshold=0.7
    )
    plan = pairs._jdf.queryExecution().sparkPlan().toString()
    assert "SortMergeJoin" not in plan
    got = pairs.collect()
    assert {(r.doc_id, r.bench_id) for r in got} == {(7, 1)}
    assert got[0].jaccard == 1.0


# -- cross-group duplicate-leakage matrix --------------------------------------


def test_pair_group_matrix_canonical_and_counts(spark):
    from dsci_524_g26_data_validation_spark.operators import dedup

    labels = spark.createDataFrame(
        [(1, "cc"), (2, "c4"), (3, "cc"), (4, "wiki"), (5, "c4"), (6, "c4")],
        "doc_id bigint, source string",
    )
    # pairs deliberately mis-ordered vs label order: (c4,cc) must fold
    # into (c4,cc) with group_a <= group_b regardless of id order
    pairs = spark.createDataFrame(
        [(1, 2), (3, 5), (2, 6), (1, 3)],
        "id_a bigint, id_b bigint",
    )
    got = {
        (r.group_a, r.group_b): (r.n_pairs, r.n_docs_a, r.n_docs_b)
        for r in dedup.pair_group_matrix(pairs, labels).collect()
    }
    # cc-c4 pairs: (1,2), (3,5) -> group_a='c4' docs {2,5}, group_b='cc' {1,3}
    assert got[("c4", "cc")] == (2, 2, 2)
    # same-group pair (2,6) both c4
    assert got[("c4", "c4")] == (1, 1, 1)
    assert got[("cc", "cc")] == (1, 1, 1)
    assert set(got) == {("c4", "cc"), ("c4", "c4"), ("cc", "cc")}


def test_pair_group_matrix_broadcasts_pairs(spark):
    from dsci_524_g26_data_validation_spark.operators import dedup

    labels = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("source"),
    )
    pairs = spark.createDataFrame([(1, 6), (2, 7)], "id_a bigint, id_b bigint")
    out = dedup.pair_group_matrix(pairs, labels)
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_exact_dedup_null_columns_distinct(spark):
    """(x, NULL) and (NULL, x) must NOT collide (concat_ws silently
    skips NULLs without the sentinel), and NULL text != empty text."""
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        deduplicate_exact,
        exact_duplicates,
    )

    df = spark.createDataFrame(
        [("1", "x", None), ("2", None, "x"), ("3", None, None), ("4", "", "")],
        "doc_id string, a string, b string",
    )
    assert exact_duplicates(df, cols=("a", "b")).count() == 0
    assert deduplicate_exact(df, cols=("a", "b")).count() == 4


# -- containment (asymmetric near-dup) ---------------------------------------


def test_containment_finds_embedded_quote(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        containment_pairs,
    )

    long_words = " ".join(f"w{i}" for i in range(20))
    quote = " ".join(f"w{i}" for i in range(5, 11))  # w5..w10 inside long
    other = " ".join(f"z{i}" for i in range(12))
    rows = [(1, long_words), (2, quote), (3, other), (4, quote)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b): r
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    # quote (4 3-shingles) fully contained in long (18 shingles):
    # jaccard = 4/18 would never pass a 0.8 jaccard screen
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    r = got[(1, 2)]
    assert (r.n_common, r.n_a, r.n_b) == (4, 18, 4)
    assert r.containment_a == round(4 / 18, 6)
    assert r.containment_b == 1.0
    dup = got[(2, 4)]  # exact copies: both directions 1.0
    assert (dup.containment_a, dup.containment_b) == (1.0, 1.0)


def test_containment_df_cap_drops_boilerplate_only_pairs(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        containment_pairs,
    )

    # 10 docs share ONLY the boilerplate shingle "x y z"; unique tails
    rows = [
        (i, f"x y z u{i} v{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # df("x y z") = 10 > max_df=5 -> no candidate generation at all
    assert containment_pairs(df, threshold=0.3, max_df=5).count() == 0
    # raising the cap re-admits them: C(2,10)=45 pairs at containment 1/3
    got = containment_pairs(df, threshold=0.3, max_df=50).collect()
    assert len(got) == 45
    assert all(r.containment_a == round(1 / 3, 6) for r in got)


def test_containment_param_validation(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        containment_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="threshold"):
        containment_pairs(df, threshold=0.0)
    with _pt.raises(ValueError, match="max_df"):
        containment_pairs(df, max_df=1)


# -- edit-similarity verification / keep-best survivors ----------------------


def test_edit_similarity_verify_hand_computed(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        edit_similarity_verify,
    )

    docs = spark.createDataFrame(
        [
            (1, "abcd"),
            (2, "abxd"),                 # lev 1 vs doc 1 -> sim 0.75
            (3, "ccc ddd aaa bbb"),      # shuffled copy of 4: high jaccard,
            (4, "aaa bbb ccc ddd"),      # low edit similarity
            (5, ""),
            (6, ""),                     # two empties: sim 1.0 (max-len guard)
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (1, 7)], "id_a bigint, id_b bigint"
    )
    got = {
        (r.id_a, r.id_b): r.edit_sim
        for r in edit_similarity_verify(docs, pairs, threshold=0.7).collect()
    }
    assert got == {(1, 2): 0.75, (5, 6): 1.0}
    # the shuffled pair is exactly what this verifier rejects
    loose = {
        (r.id_a, r.id_b): r.edit_sim
        for r in edit_similarity_verify(docs, pairs, threshold=0.1).collect()
    }
    assert loose[(3, 4)] < 0.5
    # NULL-text pair never passes any threshold
    assert (1, 7) not in loose

    import pytest as _pt

    with _pt.raises(ValueError, match="threshold"):
        edit_similarity_verify(docs, pairs, threshold=1.5)


def test_component_survivors_keep_best(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        component_survivors,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5)], "id bigint, comp bigint"
    )
    metrics = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (5, None), (6, None)],
        "doc_id bigint, n_chars int",
    )
    got = {
        r.component: r for r in component_survivors(comp, metrics).collect()
    }
    # metric tie at 50 -> min id 2 wins, never the min-id-overall 1
    assert (got[1].keep_id, got[1].keep_metric, got[1].n_members) == (2, 50, 3)
    # all-NULL metrics: NULLs last, tie -> min id
    assert (got[5].keep_id, got[5].keep_metric, got[5].n_members) == (5, None, 2)


def test_deduplicate_near_best_elects_longest(spark):
    from dsci_524_g26_data_validation_spark.operators.dedup import (
        deduplicate_near,
        deduplicate_near_best,
    )

    docs = spark.createDataFrame(
        [
            (1, "short", 5),
            (2, "a much longer surviving copy", 28),
            (3, "medium length", 13),
            (4, "untouched", 9),
        ],
        "doc_id bigint, text string, n_chars int",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    best = {
        r.doc_id for r in deduplicate_near_best(docs, pairs).collect()
    }
    assert best == {2, 4}  # longest member survives + the unpaired doc
    # min-id keep-one would have kept the SHORT crawl-first copy
    minid = {r.doc_id for r in deduplicate_near(docs, pairs).collect()}
    assert minid == {1, 4}
