"""Incremental (index-backed) near-dedup for continuous ingest.

The missing shape between batch self-join dedup and streaming first-
arrival dedup: a training corpus is LSH-indexed ONCE, and every incoming
crawl/batch is screened against the **persisted index** — the 100 TB
corpus is never re-read, re-shingled, or re-signed per ingest. The batch
side (small) broadcasts; the index side streams through an unshuffled
scan-join.

Two index frames, both derived from the same MinHash machinery as
:mod:`.dedup` (Broder 1997; banded LSH per Leskovec/Rajaraman/Ullman
ch. 3) so an index built by this module is band-compatible with the
batch pipeline when the (shingle_size, num_hashes, bands, seed)
parameters match:

* :func:`minhash_index` — ``(doc_id, band, digest)``: the candidate
  index. At scale, persist bucketed/partitioned by ``(band, digest)``
  so the per-ingest join prunes to colliding buckets.
* :func:`shingle_hash_index` — ``(doc_id, sh_hashes: array<bigint>)``:
  the verify sidecar. Jaccard over 8-byte xxhash64 shingle hashes
  equals Jaccard over the shingle strings (collision probability
  ~2⁻⁶⁴ per compared pair), so candidate verification never touches
  corpus text either — the entire ingest decision runs off the two
  index tables.

Reference parity note: the reference package (pandas, in-memory —
``/root/reference/src/pyos_data_validation``) has no dedup surface at
all; this module is part of the beyond-reference pipeline mandate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import (
    deduplicate_near,
    jaccard_verify,
    minhash_band_digests,
    minhash_lsh_candidates,
    shingles_expr,
)

__all__ = [
    "minhash_index",
    "shingle_hash_index",
    "incremental_near_dup_pairs",
    "admit_batch",
]


def minhash_index(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """``(doc_id, band, digest)`` — the persisted LSH candidate index.

    One row per (document, band); ``digest`` is the 8-byte hash of that
    band's signature slice (the exact construction behind
    :func:`~.dedup.minhash_lsh_candidates`, so an index built here
    collides with batch digests built at the same parameters). Persist
    it bucketed or partitioned by ``(band, digest)``: each ingest then
    reads only colliding buckets instead of scanning |corpus|×bands
    rows.
    """
    return minhash_band_digests(
        corpus,
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    ).select(F.col("_id").alias(id_col), "band", "digest")


def shingle_hash_index(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    seed: int = 42,
) -> DataFrame:
    """``(doc_id, sh_hashes: array<bigint>)`` — the verify sidecar.

    Distinct word shingles hashed to 8 bytes each (the same ``h1``
    family the signatures are built from). Exact-Jaccard verification
    of index candidates intersects these arrays instead of re-reading
    corpus text; at ~8 B per shingle the sidecar is the same order as
    the text itself but lives columnar next to the band index, so the
    ingest path's working set is candidates-only.
    """
    return corpus.select(
        F.col(id_col).alias(id_col),
        F.transform(
            shingles_expr(text_col, size=shingle_size),
            lambda s: F.xxhash64(s, F.lit(seed)),
        ).alias("sh_hashes"),
    )


def incremental_near_dup_pairs(
    batch: DataFrame,
    band_index: DataFrame,
    hash_index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    index_id_col: str = "doc_id",
    shingle_size: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    threshold: float = 0.5,
    max_witnesses: Optional[int] = None,
) -> DataFrame:
    """``(batch_id, corpus_id, jaccard)`` — batch docs near-duplicating
    an already-indexed corpus doc at exact shingle-Jaccard ≥ threshold.

    ``(shingle_size, num_hashes, bands, seed)`` MUST match the values
    the indexes were built with — band digests are seeded hashes, so a
    mismatch silently yields zero collisions, not an error.

    Scale shape (the point of the module):

    * the batch's band table (|batch|×bands tiny tuples) **broadcasts**;
      the band index streams through a broadcast hash join — no index
      shuffle, no corpus scan (opposite side of the same bipartite
      pattern as :func:`~.contamination.fuzzy_contamination_pairs`,
      where the benchmark is the small side);
    * candidates verify against the ``hash_index`` sidecar: corpus
      shingle-hash rows are fetched for candidate ids only (broadcast
      semi-join prune), batch shingle hashes broadcast;
    * ``max_witnesses`` (optional): a batch doc landing in a huge
      boilerplate bucket collides with every member; since ONE verified
      witness is enough to call the batch doc a duplicate, keep only
      the ``k`` smallest corpus ids per (batch doc, band, digest)
      bucket before verify. Over-cap buckets are near-homogeneous (the
      same argument as the ``_capped_split`` star anchors), so the
      min-id members are representative witnesses; the cap bounds
      verify work at O(|batch|·bands·k) pairs. Default off — exact.
    """
    b_bands = minhash_band_digests(
        batch,
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    ).withColumnRenamed("_id", "_batch_id")
    idx = band_index.select(
        F.col(index_id_col).alias("_corpus_id"), "band", "digest"
    )
    hits = idx.join(F.broadcast(b_bands), on=["band", "digest"])
    if max_witnesses is not None:
        w = Window.partitionBy("_batch_id", "band", "digest").orderBy(
            F.asc("_corpus_id")
        )
        hits = hits.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= max_witnesses
        )
    candidates = hits.select("_batch_id", "_corpus_id").distinct()

    # verify on candidates only: corpus sidecar rows pruned by a
    # broadcast semi-join on the candidate corpus ids, batch shingle
    # hashes broadcast (batch-sized)
    c_ids = candidates.select(F.col("_corpus_id").alias("_hit")).distinct()
    c_sh = hash_index.join(
        F.broadcast(c_ids),
        hash_index[f"`{index_id_col}`"] == F.col("_hit"),
        "left_semi",
    ).select(
        F.col(f"`{index_id_col}`").alias("_corpus_id"),
        F.col("sh_hashes").alias("_sh_c"),
    )
    b_sh = shingle_hash_index(
        batch,
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        seed=seed,
    ).select(
        F.col(id_col).alias("_batch_id"), F.col("sh_hashes").alias("_sh_b")
    )
    return (
        candidates.join(c_sh, "_corpus_id")
        .join(F.broadcast(b_sh), "_batch_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_b", "_sh_c")).cast("double")
            / F.size(F.array_union("_sh_b", "_sh_c")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("_batch_id").alias("batch_id"),
            F.col("_corpus_id").alias("corpus_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def admit_batch(
    batch: DataFrame,
    band_index: DataFrame,
    hash_index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    index_id_col: str = "doc_id",
    shingle_size: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    threshold: float = 0.5,
    max_witnesses: Optional[int] = None,
    max_bucket_size: Optional[int] = 1000,
    max_iter: int = 10,
) -> DataFrame:
    """The full ingest decision: batch rows that should JOIN the corpus.

    Two screens, in order:

    1. **corpus screen** — drop every batch doc with a verified
       near-dup already in the index
       (:func:`incremental_near_dup_pairs`); the drop is a broadcast
       anti-join on the (small) hit-id set, so batch payloads never
       shuffle;
    2. **within-batch near-dedup** — the survivors self-dedup with the
       standard batch pipeline (LSH candidates → exact-Jaccard verify →
       connected components, min id survives), because two novel
       near-copies arriving in the SAME batch have no index entry to
       collide with. Exact duplicates need no separate screen: identical
       text gives identical signatures, which collide in every band.

    Returns the admitted batch rows with their original schema. To keep
    the indexes current, append ``minhash_index(admitted)`` and
    ``shingle_hash_index(admitted)`` (same parameters) to the two index
    tables — the next ingest then sees this batch's survivors.
    """
    corpus_hits = (
        incremental_near_dup_pairs(
            batch,
            band_index,
            hash_index,
            text_col=text_col,
            id_col=id_col,
            index_id_col=index_id_col,
            shingle_size=shingle_size,
            num_hashes=num_hashes,
            bands=bands,
            seed=seed,
            threshold=threshold,
            max_witnesses=max_witnesses,
        )
        .select(F.col("batch_id").alias("_dup"))
        .distinct()
        # materialize the (tiny, ≤|batch|-row) hit set: `survivors` is
        # referenced by three downstream branches (signature pipeline,
        # verify shingles, final anti-join) and each would otherwise
        # re-run the whole index join; the within-batch component
        # resolver is eager anyway, so this adds no laziness loss
        .localCheckpoint()
    )
    survivors = batch.join(
        F.broadcast(corpus_hits),
        batch[f"`{id_col}`"] == F.col("_dup"),
        "left_anti",
    )
    pairs = jaccard_verify(
        survivors,
        minhash_lsh_candidates(
            survivors,
            text_col=text_col,
            id_col=id_col,
            shingle_size=shingle_size,
            num_hashes=num_hashes,
            bands=bands,
            seed=seed,
            max_bucket_size=max_bucket_size,
        ),
        text_col=text_col,
        id_col=id_col,
        shingle_size=shingle_size,
        threshold=threshold,
    )
    return deduplicate_near(
        survivors, pairs, id_col=id_col, max_iter=max_iter
    )
