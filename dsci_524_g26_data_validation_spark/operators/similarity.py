"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: dot products via
  Catalyst higher-order functions (zip_with + aggregate, JVM-side, no
  Python), then TakeOrderedAndProject for the top-k (per-partition heap
  + k-row merge; no full sort, no full shuffle).
* LSH-bucketed ANN — the scale path: random-hyperplane signatures bucket
  vectors; a query probes its own bucket plus Hamming-1 neighbors and
  brute-forces only those. Hyperplanes are seed-deterministic ±1 vectors
  so executors and driver derive identical planes with no broadcast of
  random state.
* embedding-cosine near-duplicate pairs — bucket self-join then exact
  cosine on candidates only.

Random-hyperplane signatures are Charikar's rounding-hyperplane LSH
(STOC 2002); multi-table amplification and multiprobe (Hamming-1 bucket
probing) follow Lv et al., VLDB 2007.

Two ANN index families behind the same probe-then-brute-force shape:

* hyperplane LSH (data-independent, zero training) — best for
  high-similarity near-dup workloads;
* IVF (KMeans coarse quantizer → probe nearest cells, FAISS-style) —
  data-adaptive cells, the structure real embedding corpora (clustered
  by topic/modality) reward. Head-to-head on THIS repo's near-uniform
  random testdata (ANN_RECALL.json) the two families tie at equal scan
  fractions — random vectors give KMeans no structure either, and
  neighbors near the noise floor are information-theoretically hard for
  any partition-based index; use brute force there.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "infer_dim",
    "vector_stats",
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "cosine_topk_bruteforce",
    "hyperplanes",
    "lsh_signature_expr",
    "lsh_buckets_udf",
    "with_lsh_buckets",
    "cosine_topk_lsh",
    "embedding_near_duplicates",
    "ivf_centroids",
    "ivf_cells_udf",
    "with_ivf_cells",
    "cosine_topk_ivf",
    "semantic_dedup_pairs",
    "semantic_deduplicate",
    "dimension_stats",
    "embedding_drift",
    "centroid_vector",
    "embedding_outlier_census",
    "embedding_outlier_topk",
]


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Modal vector length over non-null rows — ONE tiny agg job.

    Robust against dirty leading rows (a NULL or wrong-dimension junk
    vector as row 1 must not decide the corpus dimensionality — ADVICE
    r2): the most frequent length wins, ties broken by the smaller
    length for determinism. Callers that already know ``dim`` should
    pass it explicitly and skip this job entirely."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .groupBy(F.size(F.col(vec_col)).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("d"))
        .first()
    )
    if row is None:
        raise ValueError(f"infer_dim: no non-null vectors in '{vec_col}'")
    return int(row["d"])


def vector_stats(
    df: DataFrame, *, vec_col: str = "embedding", dim: Optional[int] = None
) -> DataFrame:
    """One-row health report of an embedding column — the vector-typed
    analog of the engine's fused column stats: NULL count, wrong-dim
    count, NaN-containing count, and norm min/avg/max over clean rows.
    Pure Catalyst (size/exists/aggregate HOFs) in ONE scan + one-row agg;
    the dirty-row categories mirror exactly what the bucketing UDFs
    (:func:`lsh_buckets_udf`, :func:`ivf_cells_udf`) tolerate, so this
    is the check to run before building an index.

    ``dim``: expected dimensionality; default = modal observed
    (:func:`infer_dim`, one extra tiny job).
    """
    if dim is None:
        dim = infer_dim(df, vec_col)
    v = F.col(f"`{vec_col}`")
    vd = v.cast("array<double>")
    is_null = v.isNull()
    wrong = ~is_null & (F.size(v) != F.lit(dim))
    valid = ~is_null & ~wrong
    has_nan = valid & F.exists(vd, lambda x: F.isnan(x))
    clean = valid & ~has_nan
    norm = F.when(clean, norm_expr(vd))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(is_null).alias("n_null"),
        F.count_if(wrong).alias("n_wrong_dim"),
        F.count_if(has_nan).alias("n_nan"),
        F.lit(dim).alias("dim"),
        F.round(F.min(norm), 6).alias("min_norm"),
        F.round(F.avg(norm), 6).alias("avg_norm"),
        F.round(F.max(norm), 6).alias("max_norm"),
    )


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — evaluated in the JVM."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _query_lit(query: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query])


def cosine_topk_bruteforce(
    df: DataFrame,
    query: Sequence[float],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query`` → (id, cosine).

    orderBy(desc).limit(k) plans as TakeOrderedAndProject: each partition
    keeps a k-heap, the driver merges #partitions·k rows — scan-bound and
    embarrassingly parallel at any scale.
    """
    q = _query_lit(query)
    cos = cosine_expr(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, *, seed: int = 42) -> List[List[float]]:
    """Deterministic ±1 hyperplanes: component j of plane p is the sign
    of a sha256 bit of (seed, p, j). Same planes everywhere, no RNG
    state to ship."""
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{j}".encode()).digest()
            row.append(1.0 if h[0] & 1 else -1.0)
        planes.append(row)
    return planes


def lsh_signature_expr(vec: Column, planes: List[List[float]]) -> Column:
    """Pack sign(v·plane_p) bits into an int bucket id — pure Catalyst."""
    sig = F.lit(0)
    for p, plane in enumerate(planes):
        bit = (dot_expr(vec, _query_lit(plane)) > 0).cast("int")
        sig = sig + bit * F.lit(1 << p)
    return sig


def _signature_py(vec: Sequence[float], planes: List[List[float]]) -> int:
    sig = 0
    for p, plane in enumerate(planes):
        if sum(x * y for x, y in zip(vec, plane)) > 0:
            sig |= 1 << p
    return sig


def lsh_buckets_udf(all_planes: List[List[List[float]]]):
    """Vectorized bucket assignment: one Arrow batch → ONE numpy matmul
    against every table's planes at once → per-table packed bucket ids.

    The Catalyst form (:func:`lsh_signature_expr`) evaluates
    ``n_tables × n_planes`` interpreted higher-order-function dot
    products per row; this UDF replaces them with a single BLAS
    ``(batch, dim) @ (dim, n_tables·n_planes)`` product — the per-row
    Python cost is zero (BASELINE.json mandate: vectorized Arrow UDFs,
    no per-row Python). At 100 TB the buckets are computed once at
    ingest and persisted as ordinary int columns.
    """
    n_tables = len(all_planes)
    n_planes = len(all_planes[0])
    dim = len(all_planes[0][0])
    mat = np.concatenate(
        [np.asarray(p, dtype=np.float64).T for p in all_planes], axis=1
    )  # (dim, n_tables*n_planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<int>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        # Dirty vector data (NULL embeddings, wrong dimensionality) must
        # not crash a validation engine: invalid rows get NULL buckets
        # (so downstream bucket filters drop them) and a zero vector is
        # substituted in the matmul to keep the batch rectangular.
        vals = vecs.to_numpy(dtype=object)
        valid = np.fromiter(
            (v is not None and len(v) == dim for v in vals),
            dtype=bool,
            count=len(vals),
        )
        zero = np.zeros(dim, dtype=np.float64)
        x = np.stack(
            [np.asarray(v, dtype=np.float64) if ok else zero
             for v, ok in zip(vals, valid)]
        ) if len(vals) else np.empty((0, dim))
        bits = (x @ mat) > 0  # (batch, n_tables*n_planes)
        bits = bits.reshape(len(x), n_tables, n_planes)
        sigs = (bits * weights).sum(axis=2).astype(np.int32)
        return pd.Series(
            [list(s) if ok else None for s, ok in zip(sigs, valid)]
        )

    return _buckets


def with_lsh_buckets(
    df: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    bucket_col: str = "lsh_buckets",
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Append the persisted-bucket column (array<int>, one id per table).

    The 100 TB pattern: run this once at ingest, write the table with the
    bucket column, and every subsequent :func:`cosine_topk_lsh` query
    becomes a pure Catalyst filter over precomputed ints — no vector math
    on the query path at all. Buckets are a pure seed-deterministic
    function of the vector, so ingest-time and query-time planes always
    agree.
    """
    all_planes = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    buckets = lsh_buckets_udf(all_planes)
    return df.withColumn(bucket_col, buckets(F.col(vec_col).cast("array<double>")))


def cosine_topk_lsh(
    df: DataFrame,
    query: Sequence[float],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    ``n_tables`` independent signatures; a row is scanned iff ANY table
    puts it in the query's bucket (or a Hamming-≤``probe_hamming``
    neighbor bucket) — the classic recall amplification 1−(1−p)^L.
    Brute-force cosine runs only inside the union of probed buckets.
    ``probe_hamming >= n_planes`` enumerates EVERY bucket — probing the
    whole index must then equal exact brute force (every valid vector
    lands in exactly one bucket per table), which is the
    partition-completeness proof the ``ann_lsh_topk`` driver oracle
    checks, mirroring the IVF probe-all-cells oracle.

    At 100 TB the bucket columns are precomputed/persisted (pure
    functions of the vector), turning every query into a bucket-pruned
    scan of roughly n_tables·(n_planes+1)/2^n_planes of the data.

    Buckets for all tables come from ONE vectorized Arrow-UDF matmul
    (:func:`lsh_buckets_udf`); the probe test is a cheap Catalyst filter
    over the resulting int array. Pass ``bucket_col`` when the table
    already carries persisted buckets (:func:`with_lsh_buckets`) — then
    the query is filter + top-k only.

    **Measured trade-offs** (ANN_RECALL.json, swept by tools/
    ann_recall.py on the sf0.01 embeddings): hyperplane LSH recall
    depends on the similarity regime. High-similarity neighbors (planted
    pairs at cosine ≥0.95) are recalled at 0.96-1.0 across all swept
    configs; the testdata's *natural* top-20 sit at cosine ~0.2-0.3
    (near-random angles) where e.g. (6 planes, 8 tables, Hamming-1)
    reaches recall 0.86 at a 0.59 scan fraction, and tighter configs
    trade recall for pruning ((10, 8, 1): 0.30 recall @ 0.09 scanned).
    Prefer :func:`cosine_topk_bruteforce` when the similarity floor is
    low; LSH pays off for near-dup / high-similarity workloads.
    """
    from itertools import combinations

    dim = len(query)
    all_planes = [
        hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    probes = []
    for planes in all_planes:
        qsig = _signature_py(list(query), planes)
        probe = {qsig}
        for h in range(1, min(probe_hamming, n_planes) + 1):
            for bits in combinations(range(n_planes), h):
                flip = 0
                for b in bits:
                    flip |= 1 << b
                probe.add(qsig ^ flip)
        probes.append(sorted(probe))
    if bucket_col is None:
        buckets = lsh_buckets_udf(all_planes)
        df = df.withColumn("_b", buckets(F.col(vec_col).cast("array<double>")))
        bucket_col, drop_after = "_b", True
    else:
        drop_after = False
    cond = None
    for t, probe in enumerate(probes):
        this = F.element_at(F.col(bucket_col), t + 1).isin(probe)
        cond = this if cond is None else (cond | this)
    pruned = df.filter(cond)
    if drop_after:
        pruned = pruned.drop("_b")
    return cosine_topk_bruteforce(
        pruned, query, vec_col=vec_col, id_col=id_col, k=k
    )


def embedding_near_duplicates(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 8,
    seed: int = 42,
    bucket_col: Optional[str] = None,
    dim: Optional[int] = None,
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Multi-table LSH candidate generation then exact cosine verification
    on candidates only → (id_a, id_b, cosine). Collision probability per
    table is p = (1 − θ/π)^n_planes (Charikar), amplified 1−(1−p)^L
    across ``n_tables`` independent tables. At the default 10 planes ×
    8 tables, a pair at exactly cosine 0.95 (θ≈0.318) has p≈0.345 per
    table → amplified recall ≈0.966; tighter near-dups (≥0.98) are found
    with probability >0.99. Recall is asserted against brute-force
    ground truth in tests/test_pipeline_ops.py. Raise ``n_planes`` (and
    ``n_tables`` with it) on very large corpora to keep random-pair
    collisions (~n_tables·2^−n_planes of all pairs) in check.

    Scale shape (100 TB):

    * buckets come from ONE vectorized Arrow matmul
      (:func:`lsh_buckets_udf`) — or, better, a persisted
      ``bucket_col`` written at ingest by :func:`with_lsh_buckets`,
      making this query pure Catalyst;
    * the candidate self-join shuffles only (id, table, bucket) int
      tuples — embedding payloads never move;
    * **degenerate-bucket cap** (same job-killer as MinHash buckets,
      fixed the same way): a (table, bucket) shared by more than
      ``max_bucket_size`` vectors — a cluster of identical/boilerplate
      embeddings — skips the all-pairs join; its members are
      star-linked to the bucket's min-id anchor (O(n) pairs). Star
      pairs still get EXACT cosine verification below, so no unverified
      pair is ever returned. **Recall contract of the cap**: a true
      near-dup pair BOTH of whose members sit inside an over-cap bucket
      is only seen there via its anchor edges, which the threshold
      filter may legitimately kill (the members need not be near the
      anchor) — such a pair is recovered iff some OTHER table separates
      it from the bulk. That rescue is the design: a pair with
      per-table collision probability p is missed in all remaining
      tables with probability (1−p)^(L−1) — at the defaults (10 planes,
      8 tables) ≈5 % for cosine-0.95 pairs and ≈0.4 % at 0.99, and only
      when the pair co-buckets with unrelated boilerplate mass in the
      first place (~2^−n_planes per table). Within a genuinely
      homogeneous over-cap bucket (the actual boilerplate case) anchor
      edges pass verification and the component survives intact.
      ``max_bucket_size=None`` restores exhaustive per-bucket pairing
      (and drops the broadcast hint with it — an uncapped candidate set
      must not be forced to the driver);
    * vectors are joined back ONLY for the deduplicated candidate
      pairs (a vanishing fraction of rows) for exact verification.

    ``dim``: the embedding dimensionality; pass it when known (callers
    of :func:`with_lsh_buckets` already do) to skip the one-job modal
    probe (:func:`infer_dim`) — and never trust row 1, whose NULL or
    junk length must not crash plane construction (ADVICE r2).
    """
    from .dedup import _capped_split

    if bucket_col is None:
        if dim is None:
            dim = infer_dim(df, vec_col)
        all_planes = [
            hyperplanes(dim, n_planes, seed=seed + 1000 * t)
            for t in range(n_tables)
        ]
        # single projection: posexplode directly over the UDF output, so
        # exactly ONE ArrowEvalPython per plan branch (a withColumn +
        # select chain leaves a duplicated eval after UDF extraction)
        bucket_expr = lsh_buckets_udf(all_planes)(
            F.col(vec_col).cast("array<double>")
        )
    else:
        bucket_expr = F.col(bucket_col)
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(bucket_expr).alias("_t", "_bucket"),
    )
    small, star = _capped_split(
        keyed, ["_t", "_bucket"], max_bucket_size=max_bucket_size
    )
    x, y = small.alias("x"), small.alias("y")
    cand = x.join(
        y,
        (F.col("x._t") == F.col("y._t"))
        & (F.col("x._bucket") == F.col("y._bucket"))
        & (F.col("x._id") < F.col("y._id")),
    ).select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return _verify_pairs_cosine(
        df,
        cand,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        broadcast_hint=max_bucket_size is not None,
    )


def _verify_pairs_cosine(
    df: DataFrame,
    cand: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    threshold: float,
    broadcast_hint: bool,
) -> DataFrame:
    """Exact cosine verification of candidate (id_a, id_b) pairs →
    (id_a, id_b, cosine ≥ threshold). Shared by the LSH-bucket and
    IVF-cell (SemDeDup) candidate generators.

    Fetches both pair members' vectors in ONE scan of the table: unpivot
    each candidate pair to two (role, id) rows, equi-join against the
    vectors once (the tiny candidate side broadcasts; the big table
    streams through scan-bound), then regroup per pair. Joining va and
    vb separately would scan the embedding column — the bulk of the
    table's bytes — twice.

    ``broadcast_hint``: planning-time size estimates for a self-join +
    dropDuplicates are wildly high, so without the hint Spark plans a
    sort-merge join that shuffles the embedding column. Pass True only
    when a degenerate-bucket cap bounds the candidate count (star-linking
    caps the worst case at O(n) edges per bucket), keeping the candidate
    set driver-safe; uncapped candidate sets must never be
    force-collected to the driver (ADVICE r2, medium) — pass False and
    AQE decides.
    """
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    long = cand.selectExpr(
        "id_a", "id_b", "stack(2, 'a', id_a, 'b', id_b) as (role, _vid)"
    )
    hinted = F.broadcast(long) if broadcast_hint else long
    fetched = hinted.join(vecs, "_vid")
    wide = fetched.groupBy("id_a", "id_b").agg(
        F.any_value(F.when(F.col("role") == "a", F.col("_v")), True).alias("va"),
        F.any_value(F.when(F.col("role") == "b", F.col("_v")), True).alias("vb"),
    )
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (
        wide.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# -- IVF (inverted-file) ANN --------------------------------------------------
#
# The FAISS-style IVF-Flat layout (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — coarse quantizer part): partition
# the vector space by KMeans centroids, store each vector under its nearest
# centroid's cell, probe only the n_probe cells nearest the query. The
# cells adapt to the data distribution — the win on real (clustered)
# embedding corpora. On this repo's near-uniform random testdata the
# measured frontier ties hyperplane LSH (ANN_RECALL.json `ivf_sweep`):
# with no cluster structure both families face the same wall.


def ivf_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 42,
    sample_fraction: Optional[float] = None,
    max_iter: int = 20,
) -> List[List[float]]:
    """Fit the coarse quantizer: KMeans over (a sample of) the vectors.

    Training is a one-off index-build step (like with_lsh_buckets);
    at 100 TB fit on a sample — KMeans quality needs only ~1k vectors
    per cell. Returns plain ``List[List[float]]`` centroids so query
    planning needs no ml model object.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df.select(F.col(vec_col).cast("array<double>").alias("_v"))
    train = train.filter(F.col("_v").isNotNull())
    # drop wrong-dimension vectors too — the same dirty rows the query
    # path (ivf_cells_udf) tolerates would crash KMeans' training
    # aggregation with a dimension mismatch. Modal length, NOT row 1:
    # a junk-length first vector must not silently filter out the whole
    # valid corpus before KMeans (ADVICE r2).
    dim = infer_dim(train, "_v")
    train = train.filter(F.size("_v") == dim)
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=seed)
    feats = train.select(array_to_vector("_v").alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def ivf_cells_udf(centroids: List[List[float]]):
    """Vectorized cell assignment: argmin ||v − c||² over all centroids
    via one BLAS matmul per Arrow batch (argmin(||c||² − 2 v·c); the
    ||v||² term is constant per row). NULL/wrong-dim vectors get a NULL
    cell, mirroring :func:`lsh_buckets_udf`."""
    C = np.asarray(centroids, dtype=np.float64)  # (cells, dim)
    dim = C.shape[1]
    c_sq = (C * C).sum(axis=1)  # (cells,)

    @pandas_udf("int")
    def _cells(vecs: pd.Series) -> pd.Series:
        vals = vecs.to_numpy(dtype=object)
        valid = np.fromiter(
            (v is not None and len(v) == dim for v in vals),
            dtype=bool,
            count=len(vals),
        )
        zero = np.zeros(dim, dtype=np.float64)
        x = np.stack(
            [np.asarray(v, dtype=np.float64) if ok else zero
             for v, ok in zip(vals, valid)]
        ) if len(vals) else np.empty((0, dim))
        cell = np.argmin(c_sq - 2.0 * (x @ C.T), axis=1).astype(np.int32)
        return pd.Series(
            [int(c) if ok else None for c, ok in zip(cell, valid)]
        )

    return _cells


def with_ivf_cells(
    df: DataFrame,
    centroids: List[List[float]],
    *,
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Append the persisted cell column — the ingest-time half of the
    index. At 100 TB, additionally repartition/sort the table by this
    column on write so a probe prunes whole files (cell min/max stats)."""
    cells = ivf_cells_udf(centroids)
    return df.withColumn(cell_col, cells(F.col(vec_col).cast("array<double>")))


def cosine_topk_ivf(
    df: DataFrame,
    query: Sequence[float],
    centroids: List[List[float]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
    cell_col: Optional[str] = None,
) -> DataFrame:
    """Approximate top-k: probe the ``n_probe`` cells whose centroids are
    nearest the query, brute-force cosine inside them only.

    Centroid distances are computed on the driver (n_cells tiny); the
    probe is a Catalyst ``isin`` filter over the persisted (or inline)
    cell column, so with a cell-partitioned table the query reads
    ~n_probe/n_cells of the data. Expected scan fraction and recall per
    (n_cells, n_probe) are measured in ANN_RECALL.json.
    """
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(list(query), dtype=np.float64)
    d2 = ((C * C).sum(axis=1) - 2.0 * (C @ q)).astype(np.float64)
    probe = [int(i) for i in np.argsort(d2)[:n_probe]]
    if cell_col is None:
        cells = ivf_cells_udf(centroids)
        df = df.withColumn("_ivf", cells(F.col(vec_col).cast("array<double>")))
        cell_col, drop_after = "_ivf", True
    else:
        drop_after = False
    pruned = df.filter(F.col(cell_col).isin(probe))
    if drop_after:
        pruned = pruned.drop("_ivf")
    return cosine_topk_bruteforce(
        pruned, query, vec_col=vec_col, id_col=id_col, k=k
    )


# -- SemDeDup: cluster-blocked semantic deduplication ---------------------------


def semantic_dedup_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    centroids: Optional[List[List[float]]] = None,
    n_cells: int = 64,
    seed: int = 42,
    sample_fraction: Optional[float] = None,
    cell_col: Optional[str] = None,
    max_cell_size: Optional[int] = 1000,
) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): block by KMeans cell, compare pairs only WITHIN a
    cell, verify with exact cosine → (id_a, id_b, cosine ≥ threshold).

    SemDeDup's observation: semantic duplicates (same content re-rendered
    — translations of boilerplate, templated articles, near-identical
    product pages) land in the same embedding-space cluster, so the
    O(n²) pair search decomposes into per-cell searches — with balanced
    cells, n²/n_cells total comparisons. Recall contract: a true pair is
    found iff KMeans puts both members in one cell; exact copies always
    share the argmin cell, and near-copies split only when they straddle
    a cell boundary — raise ``n_cells`` more slowly than corpus growth,
    or probe with the LSH family (:func:`embedding_near_duplicates`,
    whose multi-table amplification gives a tunable recall floor) when a
    guarantee matters more than cost.

    Scale shape mirrors the LSH path: the cell self-join shuffles
    (id, cell) int tuples only; over-cap cells (boilerplate mass) are
    star-linked to the cell's min-id anchor by the shared
    ``_capped_split`` (O(n) pairs, component-preserving, every returned
    pair still exactly verified); vectors are fetched for verification
    in ONE scan (:func:`_verify_pairs_cosine`). ``cell_col`` reuses a
    persisted ingest-time cell column (:func:`with_ivf_cells`) — then
    candidate generation is pure Catalyst with no UDF at query time.
    """
    from .dedup import _capped_split

    if cell_col is None:
        if centroids is None:
            centroids = ivf_centroids(
                df,
                vec_col=vec_col,
                n_cells=n_cells,
                seed=seed,
                sample_fraction=sample_fraction,
            )
        cells = ivf_cells_udf(centroids)
        cell_expr = cells(F.col(vec_col).cast("array<double>"))
    else:
        cell_expr = F.col(cell_col)
    keyed = df.select(
        F.col(id_col).alias("_id"), cell_expr.alias("_cell")
    ).filter(F.col("_cell").isNotNull())
    small, star = _capped_split(keyed, ["_cell"], max_bucket_size=max_cell_size)
    x, y = small.alias("x"), small.alias("y")
    cand = x.join(
        y,
        (F.col("x._cell") == F.col("y._cell"))
        & (F.col("x._id") < F.col("y._id")),
    ).select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
    if star is not None:
        cand = cand.unionByName(star)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return _verify_pairs_cosine(
        df,
        cand,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        broadcast_hint=max_cell_size is not None,
    )


def semantic_deduplicate(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_iter: int = 10,
    **pair_kwargs,
) -> DataFrame:
    """Keep one survivor (min id) per semantic-duplicate component —
    :func:`semantic_dedup_pairs` resolved through the shared
    connected-component + broadcast-anti-join machinery
    (``dedup.deduplicate_near``); the corpus payload never shuffles."""
    from .dedup import deduplicate_near

    pairs = semantic_dedup_pairs(
        df,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        **pair_kwargs,
    )
    return deduplicate_near(
        df, pairs, id_col=id_col, max_iter=max_iter
    )


def dimension_stats(
    df: DataFrame, *, vec_col: str = "embedding", dim: Optional[int] = None
) -> DataFrame:
    """Per-dimension sufficient statistics (count, Σx, Σx²) of a vector
    column over clean rows — the building block for embedding drift.

    Scale shape: ``posexplode`` multiplies rows by ``dim`` *inside the
    map task*, but the groupBy's partial aggregation collapses them back
    to ``dim`` rows per partition before the exchange, so the shuffle
    carries ``dim × n_partitions`` tiny rows regardless of corpus size —
    the same map-side-combine argument as the engine's histogram drift
    (drift.py). One scan, one shuffle of ``dim`` keys, no driver math.

    Rows that are NULL, wrong-dimension, or contain NaN are excluded
    (identical clean-row predicate to :func:`vector_stats`, so the two
    reports reconcile)."""
    if dim is None:
        dim = infer_dim(df, vec_col)
    v = F.col(f"`{vec_col}`")
    vd = v.cast("array<double>")
    clean = (
        v.isNotNull()
        & (F.size(v) == F.lit(dim))
        & ~F.exists(vd, lambda x: F.isnan(x))
    )
    # posexplode_outer sidesteps the inferred size()>0 filter (an extra
    # array cast per row); clean rows are never empty, so the null
    # placeholder guard is a no-op in practice
    ex = (
        df.filter(clean)
        .select(F.posexplode_outer(vd).alias("pos", "x"))
        .filter(F.col("pos").isNotNull())
    )
    return ex.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )


def embedding_drift(
    baseline: DataFrame,
    current: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    round_to: int = 6,
) -> DataFrame:
    """One-row drift report between two embedding distributions —
    the vector-typed analog of the engine's scalar drift checks
    (chi²/PSI/EMD in drift.py): has the corpus the index was built on
    moved?

    Statistics (all derived from per-dimension sufficient statistics,
    never from row-level pairing):

    * ``centroid_cosine`` — cosine between the two mean vectors
      (1.0 = no directional drift);
    * ``centroid_l2`` — Euclidean distance between the mean vectors;
    * ``rms_norm_base`` / ``rms_norm_cur`` — root-mean-square vector
      norm per side, computed EXACTLY from Σx² (E‖x‖² = Σ_d E[x_d²]),
      no second scan;
    * ``max_dim_shift`` / ``max_shift_pos`` — largest per-dimension
      mean shift and which dimension (the triage pointer);
    * ``avg_dim_shift`` — mean |Δmean| across dimensions.

    Scale shape: each side is ONE scan + ONE shuffle of ``dim`` keys
    (:func:`dimension_stats`); the join and final agg run on two
    ``dim``-row frames. Nothing about this plan changes between 500
    vectors and 500 billion — the exchange payload is ``dim`` rows per
    partition either way.

    ``dim`` default: modal observed length of the BASELINE side (one
    tiny extra job); pass it explicitly to skip the probe. Results are
    rounded to ``round_to`` decimals so the report is stable across
    summation orders (engine-portable, like the rest of the suite).
    """
    if dim is None:
        dim = infer_dim(baseline, vec_col)
    b = dimension_stats(baseline, vec_col=vec_col, dim=dim)
    c = dimension_stats(current, vec_col=vec_col, dim=dim)
    mb = (F.col("b.sum_x") / F.col("b.n")).alias("mb")
    mc = (F.col("c.sum_x") / F.col("c.n")).alias("mc")
    j = (
        b.alias("b")
        .join(c.alias("c"), F.col("b.pos") == F.col("c.pos"), "inner")
        .select(
            F.col("b.pos").alias("pos"),
            F.col("b.n").alias("nb"),
            F.col("c.n").alias("nc"),
            mb,
            mc,
            F.col("b.sum_x2").alias("sx2b"),
            F.col("c.sum_x2").alias("sx2c"),
        )
    )
    dot = F.sum(F.col("mb") * F.col("mc"))
    nb_norm = F.sqrt(F.sum(F.col("mb") * F.col("mb")))
    nc_norm = F.sqrt(F.sum(F.col("mc") * F.col("mc")))
    diff = F.col("mb") - F.col("mc")
    r = round_to
    return j.agg(
        F.max("nb").alias("n_base"),
        F.max("nc").alias("n_cur"),
        F.count(F.lit(1)).cast("int").alias("dim"),
        F.round(dot / (nb_norm * nc_norm), r).alias("centroid_cosine"),
        F.round(F.sqrt(F.sum(diff * diff)), r).alias("centroid_l2"),
        F.round(F.sqrt(F.sum(F.col("sx2b") / F.col("nb"))), r).alias(
            "rms_norm_base"
        ),
        F.round(F.sqrt(F.sum(F.col("sx2c") / F.col("nc"))), r).alias(
            "rms_norm_cur"
        ),
        F.round(F.max(F.abs(diff)), r).alias("max_dim_shift"),
        F.max_by("pos", F.abs(diff)).alias("max_shift_pos"),
        F.round(F.avg(F.abs(diff)), r).alias("avg_dim_shift"),
    )


def centroid_vector(
    df: DataFrame, *, vec_col: str = "embedding", dim: Optional[int] = None
) -> List[float]:
    """Global mean vector over clean rows, as a Python list (``dim``
    floats — driver-sized by definition). Derived from
    :func:`dimension_stats`, so the shuffle carries ``dim × partitions``
    sufficient-stat rows, never vectors."""
    stats = dimension_stats(df, vec_col=vec_col, dim=dim).collect()
    if not stats:
        raise ValueError("centroid_vector: no clean vectors")
    by_pos = {int(r["pos"]): float(r["sum_x"]) / float(r["n"]) for r in stats}
    return [by_pos[i] for i in range(len(by_pos))]


def _centroid_dist_expr(vec_col: str, centre: List[float]):
    """Row-local L2 distance to a literal centroid — pure Catalyst
    (zip_with + aggregate), whole-stage codegen, no UDF."""
    vd = F.col(f"`{vec_col}`").cast("array<double>")
    c = F.array(*[F.lit(float(x)) for x in centre])
    sq = F.zip_with(vd, c, lambda x, y: (x - y) * (x - y))
    return F.sqrt(
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    )


def embedding_outlier_census(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    z: float = 3.0,
) -> DataFrame:
    """One-row census of centroid-distance outliers: ``(n_vectors,
    mean_dist, std_dist, threshold, n_outliers, outlier_frac)``.

    The embedding-space analog of the engine's robust scalar outlier
    check: rows whose L2 distance to the corpus centroid exceeds
    ``mean + z·std`` are flagged — the standard screen for corrupt /
    out-of-distribution vectors (wrong preprocessing, zeroed rows,
    truncated uploads) before an ANN index is built over them.

    Scale shape: three fused single-scan jobs, inherently sequential —
    (1) centroid from dim-bounded sufficient stats, (2) distance
    mean/std, (3) threshold count — each scan evaluates the distance as
    a row-local codegen expression (no UDF, no vector shuffle, no
    driver loop beyond the dim-sized centroid). ``std`` is the sample
    standard deviation (``stddev_samp``) in both engines.
    """
    dist = _centroid_dist_expr(
        vec_col, centroid_vector(df, vec_col=vec_col, dim=dim)
    )
    if dim is None:
        dim = infer_dim(df, vec_col)
    v = F.col(f"`{vec_col}`")
    clean = (
        v.isNotNull()
        & (F.size(v) == F.lit(dim))
        & ~F.exists(v.cast("array<double>"), lambda x: F.isnan(x))
    )
    base = df.filter(clean).select(dist.alias("_d"))
    srow = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_d").alias("m"),
        F.stddev_samp("_d").alias("s"),
    ).collect()[0]
    n, m, s = int(srow["n"]), srow["m"], srow["s"]
    if m is None:
        raise ValueError("embedding_outlier_census: no clean vectors")
    thr = float(m) + float(z) * float(s if s is not None else 0.0)
    out = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.avg("_d"), 6).alias("mean_dist"),
        F.round(F.coalesce(F.stddev_samp("_d"), F.lit(0.0)), 6).alias(
            "std_dist"
        ),
        F.round(F.lit(thr), 6).alias("threshold"),
        F.count_if(F.col("_d") > F.lit(thr)).cast("bigint").alias(
            "n_outliers"
        ),
    )
    return out.select(
        "*",
        F.round(
            F.col("n_outliers").cast("double")
            / F.col("n_vectors").cast("double"),
            6,
        ).alias("outlier_frac"),
    )


def embedding_outlier_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    k: int = 10,
) -> DataFrame:
    """The ``k`` vectors farthest from the corpus centroid:
    ``(id, dist)`` ordered by distance descending (ties broken by id
    ascending, so the result is deterministic). TakeOrderedAndProject —
    a per-partition heap of ``k`` rows, never a global sort."""
    centre = centroid_vector(df, vec_col=vec_col, dim=dim)
    if dim is None:
        dim = infer_dim(df, vec_col)
    v = F.col(f"`{vec_col}`")
    clean = (
        v.isNotNull()
        & (F.size(v) == F.lit(dim))
        & ~F.exists(v.cast("array<double>"), lambda x: F.isnan(x))
    )
    return (
        df.filter(clean)
        .select(
            F.col(f"`{id_col}`"),
            F.round(_centroid_dist_expr(vec_col, centre), 6).alias("dist"),
        )
        .orderBy(F.desc("dist"), F.asc(id_col))
        .limit(k)
    )
