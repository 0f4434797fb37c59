"""Round-3 operators: SemDeDup semantic dedup (IVF-cell blocking),
magic-byte media-format sniffing, per-document character entropy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators import similarity as sim
from dsci_524_g26_data_validation_spark.operators.multimodal import (
    media_format_census,
    sniff_format_expr,
)
from dsci_524_g26_data_validation_spark.operators.text import (
    char_entropy_expr,
    entropy_census,
)


# -- semantic dedup -----------------------------------------------------------


def _vec(rng, dim=8):
    v = rng.standard_normal(dim)
    return [float(x) for x in v / np.linalg.norm(v)]


@pytest.fixture(scope="module")
def emb_dup(spark):
    """60 random unit vectors + planted duplicates: ids 1000/1001 copy
    vec 0 exactly; id 1002 is vec 1 with tiny noise (cosine > 0.99)."""
    rng = np.random.default_rng(7)
    rows = [(i, _vec(rng)) for i in range(60)]
    rows.append((1000, rows[0][1]))
    rows.append((1001, rows[0][1]))
    noisy = np.asarray(rows[1][1]) + 0.01 * rng.standard_normal(8)
    noisy = noisy / np.linalg.norm(noisy)
    rows.append((1002, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _bruteforce_pairs(df, threshold):
    rows = df.collect()
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            va, vb = np.asarray(a.embedding), np.asarray(b.embedding)
            cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if cos >= threshold:
                key = (min(a.vec_id, b.vec_id), max(a.vec_id, b.vec_id))
                out.add(key)
    return out


def test_semantic_pairs_single_cell_equals_bruteforce(spark, emb_dup):
    """One cell (explicit zero centroid — no KMeans) == exhaustive pair
    search: the completeness proof the oracle query replays in SQL."""
    got = {
        (r.id_a, r.id_b)
        for r in sim.semantic_dedup_pairs(
            emb_dup, threshold=0.95, centroids=[[0.0] * 8], max_cell_size=None
        ).collect()
    }
    assert got == _bruteforce_pairs(emb_dup, 0.95)
    assert (0, 1000) in got and (0, 1001) in got and (1000, 1001) in got


def test_semantic_pairs_multicell_finds_exact_copies(spark, emb_dup):
    """Exact copies share the argmin cell under ANY centroid set, so the
    planted trio must survive real KMeans blocking."""
    got = {
        (r.id_a, r.id_b)
        for r in sim.semantic_dedup_pairs(
            emb_dup, threshold=0.999, n_cells=8, seed=1
        ).collect()
    }
    assert {(0, 1000), (0, 1001), (1000, 1001)} <= got


def test_semantic_deduplicate_keep_one(spark, emb_dup):
    """Component {0,1000,1001} keeps min id 0; near-copy 1002 joins 1's
    component (cosine>0.99) and is dropped at threshold 0.95."""
    kept = {
        r.vec_id
        for r in sim.semantic_deduplicate(
            emb_dup, threshold=0.95, centroids=[[0.0] * 8], max_cell_size=None
        ).collect()
    }
    assert 0 in kept and 1000 not in kept and 1001 not in kept
    assert 1 in kept and 1002 not in kept
    assert len(kept) == emb_dup.count() - 3


def test_semantic_pairs_cell_cap_star_links(spark):
    """An over-cap cell must produce O(n) anchor edges, not O(n²) —
    and every returned pair is still exactly verified."""
    base = [1.0] + [0.0] * 7
    rows = [(i, base) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = sim.semantic_dedup_pairs(
        df, threshold=0.99, centroids=[[0.0] * 8], max_cell_size=5
    ).collect()
    # star edges: everyone linked to anchor 0 only
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, i) for i in range(1, 30)}
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in pairs)


# -- media format sniffing ----------------------------------------------------


def test_sniff_format_magic_bytes(spark):
    rows = [
        ("png", bytes.fromhex("89504E470D0A1A0A") + b"rest"),
        ("jpeg", bytes.fromhex("FFD8FFE000104A46")),
        ("gif", b"GIF89a----"),
        ("mp4", bytes.fromhex("0000001866747970") + b"isom"),
        ("wav", b"RIFF\x01\x02\x03\x04WAVEfmt "),
        ("webp", b"RIFF\x01\x02\x03\x04WEBPVP8 "),
        ("ogg", b"OggS\x00\x02"),
        ("flac", b"fLaC\x00\x00"),
        ("mp3", b"ID3\x04\x00"),
        ("webm", bytes.fromhex("1A45DFA3") + b"x"),
        ("pdf", b"%PDF-1.7"),
        ("gzip", bytes.fromhex("1F8B0808")),
        ("zip", b"PK\x03\x04"),
        ("tiff", bytes.fromhex("49492A00")),
        ("bmp", b"BMxxxx"),
        ("unknown", b"\x00\x01\x02\x03\x04"),
        ("empty", b""),
        ("empty", None),
    ]
    df = spark.createDataFrame(
        [(exp, payload) for exp, payload in rows], "expected string, payload binary"
    )
    bad = df.filter(
        sniff_format_expr("payload") != F.col("expected")
    ).collect()
    assert bad == []


def test_media_format_census_mismatch_and_aliases(spark):
    rows = [
        ("jpg", bytes.fromhex("FFD8FFE0")),   # alias normalizes → match
        ("png", bytes.fromhex("FFD8FFE0")),   # mislabeled
        ("png", b""),                          # empty → mismatch
        ("png", bytes.fromhex("89504E470D0A1A0A")),
    ]
    df = spark.createDataFrame(rows, "codec string, payload binary")
    out = {
        (r.declared, r.sniffed): (r.n_rows, r.mismatch)
        for r in media_format_census(
            df, payload_col="payload", declared_col="codec"
        ).collect()
    }
    assert out[("jpeg", "jpeg")] == (1, False)
    assert out[("png", "jpeg")] == (1, True)
    assert out[("png", "empty")] == (1, True)
    assert out[("png", "png")] == (1, False)


# -- character entropy --------------------------------------------------------


def test_char_entropy_values(spark):
    df = spark.createDataFrame(
        [("a", "aaaa"), ("b", "abab"), ("c", "abcd"), ("d", ""), ("e", None),
         ("f", "hello world")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r.e for r in df.select(
        "doc_id", char_entropy_expr("text").alias("e")).collect()}
    assert got["a"] == 0.0
    assert got["b"] == 1.0
    assert got["c"] == 2.0
    assert got["d"] is None and got["e"] is None
    from collections import Counter
    t = "hello world"
    exp = -sum((c / len(t)) * math.log2(c / len(t))
               for c in Counter(t).values())
    assert abs(got["f"] - exp) < 1e-6


def test_entropy_census_low_fraction(spark):
    df = spark.createDataFrame(
        [("s", "aaaaaaaa"), ("s", "abababab"), ("s", "the quick brown fox"),
         ("s", None), ("t", "jumps over the lazy dog")],
        "source string, text string",
    )
    out = {r.source: r for r in entropy_census(df, low_threshold=2.0).collect()}
    s = out["s"]
    assert (s.n_docs, s.n_scored) == (4, 3)
    assert s.min_entropy == 0.0
    assert abs(s.low_frac - 2 / 3) < 1e-6
    t = out["t"]
    assert (t.n_docs, t.n_scored, t.low_frac) == (1, 1, 0.0)
