"""Token-level duplicate-span census (operators/spans.py).

Fixture corpus with KNOWN substring structure:

- doc 0 and doc 1 share a planted 6-token span inside otherwise-unique
  text (document-level dedup sees nothing — they are different docs);
- doc 2 repeats its own 6-token span twice (within-doc duplication);
- doc 3 is fully unique;
- doc 4 is shorter than k (no grams at all).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators.spans import (
    span_duplication_census,
    token_kgram_hashes_expr,
    token_kgram_occurrences,
    top_duplicate_spans,
)

K = 4
SHARED = [101, 102, 103, 104, 105, 106]  # planted cross-doc span, len 6


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a", [1, 2, 3] + SHARED + [4, 5, 6]),
        (1, "b", [7, 8] + SHARED + [9]),
        (2, "a", [10] + [51, 52, 53, 54] + [11, 12] + [51, 52, 53, 54] + [13]),
        (3, "b", [20, 21, 22, 23, 24, 25, 26]),
        (4, "a", [30, 31]),  # shorter than k=4: zero grams
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, tokens array<int>"
    )


def grams(tokens, k=K):
    return [tuple(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def expected_occurrences(rows, k=K):
    out = []
    for doc_id, source, toks in rows:
        for i, g in enumerate(grams(toks, k)):
            out.append((source, doc_id, i + 1, g))
    return out


def test_gram_count_and_positions(spark, corpus):
    occ = token_kgram_occurrences(
        corpus, keep=("source",), k=K, hash_fn="xxhash64"
    ).collect()
    rows = [tuple(r) for r in corpus.orderBy("doc_id").collect()]
    exp = expected_occurrences(rows)
    assert len(occ) == len(exp)
    # positions are 1-based and contiguous per doc
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    assert sorted(by_doc[0]) == list(range(1, len(grams([1, 2, 3] + SHARED + [4, 5, 6])) + 1))
    assert 4 not in by_doc  # short doc yields no grams


def test_shared_span_detected_across_docs(spark, corpus):
    """The planted 6-token span shares exactly 6-K+1 = 3 gram hashes
    between doc 0 and doc 1 (the Lee-et-al covering argument)."""
    occ = token_kgram_occurrences(corpus, keep=(), k=K).collect()
    hashes = {}
    for r in occ:
        hashes.setdefault(r.gram_hash, set()).add(r.doc_id)
    cross = [h for h, docs in hashes.items() if {0, 1} <= docs]
    assert len(cross) == len(SHARED) - K + 1 == 3


def test_census_exact(spark, corpus):
    census = {
        r.source: r
        for r in span_duplication_census(
            corpus, group_col="source", k=K, hash_fn="xxhash64"
        ).collect()
    }
    rows = [tuple(r) for r in corpus.orderBy("doc_id").collect()]
    occ = expected_occurrences(rows)
    from collections import Counter

    total = Counter(g for _, _, _, g in occ)
    for src in ("a", "b"):
        mine = [o for o in occ if o[0] == src]
        dup = [o for o in mine if total[o[3]] >= 2]
        r = census[src]
        assert r.n_occurrences == len(mine)
        assert r.n_distinct_grams == len({o[3] for o in mine})
        assert r.dup_occurrences == len(dup)
        assert r.dup_frac == pytest.approx(len(dup) / len(mine), abs=1e-6)
        assert r.top_gram_count == max(total[o[3]] for o in mine)
    # doc 2's self-repeat makes source a duplicated even without doc 1
    assert census["a"].dup_occurrences >= 2


def test_top_spans_witnesses(spark, corpus):
    top = top_duplicate_spans(corpus, k=K, top_n=10).collect()
    assert top, "planted duplicates must surface"
    # every returned gram is genuinely duplicated, ordered by count desc
    counts = [r.n_occurrences for r in top]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_occurrences >= 2 for r in top)
    # the cross-doc span: some gram has n_docs == 2 with witness doc 0
    cross = [r for r in top if r.n_docs == 2]
    assert cross and all(r.example_doc_id == 0 for r in cross)
    # the within-doc repeat: n_docs == 1 but n_occurrences == 2
    selfrep = [r for r in top if r.n_docs == 1 and r.example_doc_id == 2]
    assert selfrep and all(r.n_occurrences == 2 for r in selfrep)
    assert all(r.example_pos >= 1 for r in top)


def test_content_defined_sampling_is_subset_and_deterministic(spark, corpus):
    full = token_kgram_occurrences(corpus, keep=(), k=K, sample_mod=1)
    sampled = token_kgram_occurrences(corpus, keep=(), k=K, sample_mod=3)
    f = {(r.doc_id, r.pos, r.gram_hash) for r in full.collect()}
    s = {(r.doc_id, r.pos, r.gram_hash) for r in sampled.collect()}
    assert s <= f
    assert all(h % 3 == 0 for _, _, h in s)
    # content-defined: every surviving hash survives EVERYWHERE it occurs
    kept_hashes = {h for _, _, h in s}
    assert {(d, p, h) for d, p, h in f if h in kept_hashes} == s
    # deterministic across evaluations
    assert {(r.doc_id, r.pos, r.gram_hash) for r in sampled.collect()} == s


def test_portable_mode_matches_manual_md5(spark, corpus):
    occ = token_kgram_occurrences(
        corpus, keep=(), k=K, hash_fn="portable"
    ).filter(F.col("doc_id") == 3).collect()
    import hashlib

    toks = [20, 21, 22, 23, 24, 25, 26]
    for r in occ:
        gram = " ".join(str(x) for x in toks[r.pos - 1 : r.pos - 1 + K])
        expect = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        assert r.gram_hash == expect


def test_short_and_exact_length_rows(spark):
    df = spark.createDataFrame(
        [(0, [1, 2, 3, 4]), (1, [1, 2, 3])], "doc_id bigint, tokens array<int>"
    )
    got = token_kgram_occurrences(df, keep=(), k=4).collect()
    assert len(got) == 1 and got[0].doc_id == 0 and got[0].pos == 1


def test_bad_args(spark, corpus):
    with pytest.raises(ValueError, match="hash_fn"):
        token_kgram_hashes_expr("tokens", k=4, hash_fn="sha1")
    with pytest.raises(ValueError, match="sample_mod"):
        token_kgram_occurrences(corpus, k=4, sample_mod=0)


def test_no_token_payload_crosses_exchange(spark, corpus):
    """Scale shape: the census plan's exchanges carry gram-count rows
    only — the tokens column must be projected away before any shuffle."""
    plan = span_duplication_census(corpus, group_col="source", k=K)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    exch = [i for i, l in enumerate(lines) if "Exchange" in l]
    assert exch, "census must aggregate (has exchanges)"
    # no Exchange row's distribution expression involves the raw tokens
    for i in exch:
        assert "tokens" not in lines[i]
