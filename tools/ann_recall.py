"""ANN recall measurement harness (VERDICT r1 item 9).

Sweeps the LSH knobs (n_planes, n_tables, probe_hamming) for
``cosine_topk_lsh`` over the sf0.01 embeddings and records recall@k
against ``cosine_topk_bruteforce`` ground truth, plus the fraction of
the table each configuration actually scans (the recall/cost frontier).
Output: ANN_RECALL.json at the repo root — the numbers cited in
operators/similarity.py docstrings.

Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from dsci_524_g26_data_validation_spark.operators import similarity  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N_QUERIES = 25

SWEEP = [
    # (n_planes, n_tables, probe_hamming)
    (6, 4, 0),
    (6, 4, 1),
    (6, 8, 1),
    (8, 8, 1),
    (8, 16, 1),
    (10, 8, 1),
    (10, 16, 1),
]


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    n_rows = e.count()
    queries = {
        r["vec_id"]: list(r["embedding"])
        for r in e.filter(F.col("vec_id") < N_QUERIES).collect()
    }

    truth = {
        qid: [
            r["vec_id"]
            for r in similarity.cosine_topk_bruteforce(e, q, k=K).collect()
        ]
        for qid, q in queries.items()
    }

    # planted high-similarity pairs (the near-dup regime LSH targets):
    # noisy copies of the first 50 vectors at cosine ~0.95-0.99
    import numpy as np

    rng = np.random.default_rng(11)
    base = np.array(
        [list(r["embedding"]) for r in e.filter(F.col("vec_id") < 50).collect()],
        dtype=np.float64,
    )
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noisy = base + rng.normal(scale=0.04, size=base.shape)
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    planted_cos = [float(a @ b) for a, b in zip(base, noisy)]

    results = []
    for n_planes, n_tables, probe in SWEEP:
        dim = len(next(iter(queries.values())))
        # planted-pair collision recall: >=1 shared bucket across tables
        planes_all = [
            similarity.hyperplanes(dim, n_planes, seed=42 + 1000 * t)
            for t in range(n_tables)
        ]
        hit = 0
        for a, b in zip(base, noisy):
            for ps in planes_all:
                if similarity._signature_py(list(a), ps) == similarity._signature_py(
                    list(b), ps
                ):
                    hit += 1
                    break
        recall_planted = hit / len(base)
        bucketed = similarity.with_lsh_buckets(
            e, dim=dim, n_planes=n_planes, n_tables=n_tables
        ).cache()
        bucketed.count()
        recalls, scanned = [], []
        for qid, q in queries.items():
            approx = {
                r["vec_id"]
                for r in similarity.cosine_topk_lsh(
                    bucketed,
                    q,
                    k=K,
                    n_planes=n_planes,
                    n_tables=n_tables,
                    probe_hamming=probe,
                    bucket_col="lsh_buckets",
                ).collect()
            }
            recalls.append(len(approx & set(truth[qid])) / K)
            # candidate fraction: rows surviving the bucket filter
            planes = [
                similarity.hyperplanes(dim, n_planes, seed=42 + 1000 * t)
                for t in range(n_tables)
            ]
            probes = []
            for ps in planes:
                qsig = similarity._signature_py(q, ps)
                pset = {qsig}
                if probe >= 1:
                    pset |= {qsig ^ (1 << p) for p in range(n_planes)}
                probes.append(sorted(pset))
            cond = None
            for t, pr in enumerate(probes):
                this = F.element_at(F.col("lsh_buckets"), t + 1).isin(pr)
                cond = this if cond is None else (cond | this)
            scanned.append(bucketed.filter(cond).count() / n_rows)
        bucketed.unpersist()
        row = {
            "n_planes": n_planes,
            "n_tables": n_tables,
            "probe_hamming": probe,
            "recall_at_k": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4),
            "scan_fraction": round(sum(scanned) / len(scanned), 4),
            "recall_planted_pairs": round(recall_planted, 4),
        }
        results.append(row)
        print(row)

    # IVF sweep: data-adaptive cells vs the data-independent hyperplanes
    dim = len(next(iter(queries.values())))
    ivf_results = []
    for n_cells, n_probe in [(8, 1), (8, 2), (8, 4), (16, 2), (16, 4), (16, 8)]:
        cents = similarity.ivf_centroids(e, n_cells=n_cells, seed=42)
        tbl = similarity.with_ivf_cells(e, cents).cache()
        tbl.count()
        recalls, scanned = [], []
        C = np.asarray(cents)
        for qid, q in queries.items():
            qv = np.asarray(q, dtype=np.float64)
            d2 = (C * C).sum(axis=1) - 2.0 * (C @ qv)
            probe = [int(i) for i in np.argsort(d2)[:n_probe]]
            approx = {
                r["vec_id"]
                for r in similarity.cosine_topk_ivf(
                    tbl, q, cents, k=K, n_probe=n_probe, cell_col="ivf_cell"
                ).collect()
            }
            recalls.append(len(approx & set(truth[qid])) / K)
            scanned.append(
                tbl.filter(F.col("ivf_cell").isin(probe)).count() / n_rows
            )
        tbl.unpersist()
        row = {
            "n_cells": n_cells,
            "n_probe": n_probe,
            "recall_at_k": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4),
            "scan_fraction": round(sum(scanned) / len(scanned), 4),
        }
        ivf_results.append(row)
        print(row)

    out = {
        "sf_dir": SF_DIR,
        "k": K,
        "n_rows": n_rows,
        "n_queries": len(queries),
        "note": (
            "Two regimes: recall_at_k is measured on the testdata's NATURAL "
            "top-k neighbors, which sit at cosine ~0.2-0.3 (near-random "
            "angles) — hyperplane LSH has little locality to exploit there, "
            "so high recall requires scanning a large fraction anyway. "
            "recall_planted_pairs is measured on planted near-duplicates at "
            f"cosine {min(planted_cos):.3f}-{max(planted_cos):.3f} — the "
            "regime LSH targets — where multi-table recall approaches 1. "
            "Use brute force (cosine_topk_bruteforce) when the similarity "
            "floor is low; use LSH for near-dup/high-similarity workloads. "
            "ivf_sweep: KMeans-cell IVF ties LSH at equal scan fractions on "
            "this data — near-uniform random vectors give the coarse "
            "quantizer no cluster structure; IVF's advantage appears on "
            "real (clustered) embedding corpora."
        ),
        "planted_pair_cosine_range": [
            round(min(planted_cos), 4),
            round(max(planted_cos), 4),
        ],
        "sweep": results,
        "ivf_sweep": ivf_results,
    }
    (ROOT / "ANN_RECALL.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {ROOT / 'ANN_RECALL.json'}")


if __name__ == "__main__":
    main()
