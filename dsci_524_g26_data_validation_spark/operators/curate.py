"""End-to-end corpus curation: dedup → decontaminate → quality funnel →
split → mixture → shard, as ONE manifest-checkpointed, per-stage-resumable
operator (r3 VERDICT item 6 — the capstone proof that the E7 checkpoint
machinery, the filter funnel, and the shard writer interoperate).

This is the standard LLM training-data curation recipe (the published
C4/Gopher/RefinedWeb/Dolma shape): remove exact duplicates, remove
benchmark contamination, apply quality gates, carve deterministic
train/val/test splits, downsample per-source to a target mixture, and
lay the result out in balanced shards.

Scale shape — decisions, not copies
-----------------------------------
A naive checkpointed pipeline materializes the full corpus after every
stage (6 copies of 100 TB). This operator records each stage's
*decision set* instead:

* dedup and decontamination write **dropped-id sidecars** (ids only,
  ~16 B/row for the vanishing fraction dropped);
* the quality / split / mixture stages are **deterministic row-local
  predicates** — they are recomputed during final assembly for free in
  the same scan (their *census* is persisted in the manifest, so the
  report survives resume without a rescan);
* only the FINAL admitted corpus is written, once, sharded.

The corpus itself is therefore read in full exactly twice (once for the
decision sidecars, once for the final write) regardless of stage count,
and the only full-payload shuffle is the shard repartition of the
admitted survivors.

Resume contract
---------------
Each stage's completion is a :class:`FileManifestStore` record carrying
a **chained fingerprint**: sha256 of this stage's parameters + the
previous stage's fingerprint. Re-running `curate` with the same
``workdir``/``run_id``:

* skips every completed stage whose fingerprint matches (its sidecar /
  metrics are reused);
* re-runs any stage whose parameters changed — and, via the chain,
  every stage after it (same invalidation rule as
  ``table_contract_fingerprint`` for partition verdicts);
* re-runs any stage that was killed mid-write: the manifest record is
  written only AFTER the sidecar's atomic ``_SUCCESS``, so a half-built
  sidecar is invisible.

Identifying the INPUT is the caller's job (hashing 100 TB to fingerprint
it would cost more than the pipeline): a new input needs a new
``run_id`` or ``workdir``, exactly like any Spark checkpoint directory.

Reference lineage: composes this package's own operators
(dedup.exact_dropped_ids, contamination.contaminated_ids,
funnel.filter_funnel/apply_filters, splits.assign_splits,
sampling.hash_sample, sources.shards.write_shards); the reference
package (pyos_data_validation) has no pipeline layer — this is
engine-native surface.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.manifest import FileManifestStore
from .contamination import contaminated_ids
from .dedup import exact_dropped_ids
from .funnel import apply_filters, filter_funnel
from .sampling import _BUCKETS, portable_hash64
from .splits import assign_splits

__all__ = ["curate", "CurationResult", "CURATE_STAGES"]

#: Stage order is fixed — it is part of the recipe's semantics (dedup
#: before decontamination keeps the contamination join small; quality
#: after both so the funnel reports on the deduplicated corpus).
CURATE_STAGES = ("dedup", "decontaminate", "quality", "assemble")


@dataclass
class CurationResult:
    """What `curate` returns.

    ``admitted``: the final corpus (with ``split``/``shard`` columns when
    configured) — read back from the written output, so downstream code
    consumes exactly what landed on disk.
    ``report``: per-stage census rows ``(stage, n_in, n_dropped, n_out)``
    as a list of plain dicts (driver-sized: one per stage).
    ``resumed_stages``: stages satisfied from the manifest this run.
    ``output_path``: where the admitted corpus lives.
    """

    admitted: DataFrame
    report: List[dict]
    resumed_stages: List[str] = field(default_factory=list)
    output_path: str = ""


def _fingerprint(payload: dict, prev: str) -> str:
    blob = json.dumps(payload, sort_keys=True, default=str) + "|" + prev
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _mixture_keep_expr(
    mixture: Dict[str, float], *, group_col: str, id_col: str, salt: str
):
    """Deterministic per-group downsampling predicate: keep a row when
    its portable id-hash bucket falls under its group's rate (unknown
    groups keep everything — dropping data a config forgot to mention
    is the wrong default for a curation pipeline)."""
    for g, rate in mixture.items():
        if not 0.0 <= float(rate) <= 1.0:
            raise ValueError(f"mixture rate for {g!r} must be in [0,1], got {rate}")
    bucket = F.pmod(
        portable_hash64(
            F.concat(
                F.lit(salt),
                F.coalesce(F.col(f"`{id_col}`").cast("string"), F.lit("")),
            )
        ),
        F.lit(_BUCKETS),
    )
    # Cutoffs are computed driver-side with int(round(...)) — the same
    # rounding hash_sample/assign_splits use. An engine-side
    # (rate * _BUCKETS).cast('bigint') TRUNCATES (0.3 * 1e6 floats to
    # 299999.99999... -> 299999), off by one bucket vs the documented
    # 1e-6 resolution and the DuckDB oracle's rounding cast.
    cutoff_map = F.create_map(
        *[
            x
            for g, r in mixture.items()
            for x in (F.lit(g), F.lit(int(round(float(r) * _BUCKETS))))
        ]
    )
    cutoff = F.coalesce(
        cutoff_map[F.col(f"`{group_col}`")], F.lit(_BUCKETS)
    )
    return bucket < cutoff


def curate(
    df: DataFrame,
    *,
    workdir: str,
    run_id: str = "curate",
    id_col: str = "doc_id",
    text_col: str = "text",
    dedup: bool = True,
    benchmark: Optional[DataFrame] = None,
    contamination_ngram: int = 13,
    filters: Optional[Sequence[Tuple[str, str]]] = None,
    splits: Optional[Dict[str, float]] = None,
    split_salt: str = "",
    mixture: Optional[Dict[str, float]] = None,
    mixture_group_col: str = "source",
    mixture_salt: str = "mix",
    n_shards: Optional[int] = None,
    shard_salt: str = "",
) -> CurationResult:
    """Run the curation recipe over ``df``; resumable per stage.

    ``filters`` are ``(name, sql_predicate_string)`` pairs (strings, not
    Column objects, so the stage config is fingerprintable); predicate
    TRUE keeps the row, FALSE/NULL kills it (the funnel's 3VL).
    ``benchmark`` enables exact n-gram decontamination against it.
    ``mixture`` maps ``mixture_group_col`` values to keep-rates in
    [0, 1]; groups not mentioned keep everything.

    Requires ``id_col`` non-NULL unique (same precondition as keep-one
    dedup; validate with the uniqueness/missingness checks first).
    """
    if filters is not None:
        for name, pred in filters:
            if not isinstance(pred, str):
                raise TypeError(
                    f"filter {name!r}: predicates must be SQL strings so the "
                    "stage config is fingerprintable for resume"
                )
    spark = df.sparkSession
    store = FileManifestStore(workdir, run_id=run_id)
    done = store.completed()
    resumed: List[str] = []
    report: List[dict] = []

    def stage_complete(name: str, fp: str) -> Optional[dict]:
        rec = done.get(name)
        if rec is not None and rec.get("lineage", {}).get("fingerprint") == fp:
            return rec
        return None

    def sidecar(name: str) -> str:
        return os.path.join(workdir, run_id, f"sidecar-{name}")

    # ---- stage 1: exact dedup → dropped-id sidecar -------------------------
    fp = _fingerprint(
        {"stage": "dedup", "on": bool(dedup), "id_col": id_col,
         "text_col": text_col},
        prev="root",
    )
    survivors = df
    if dedup:
        rec = stage_complete("dedup", fp)
        if rec is not None:
            dropped = spark.read.parquet(sidecar("dedup"))
            resumed.append("dedup")
            n_dropped = int(rec["metrics"]["n_dropped"])
        else:
            dropped_plan = exact_dropped_ids(df, cols=(text_col,), id_col=id_col)
            dropped_plan.write.mode("overwrite").parquet(sidecar("dedup"))
            spark.catalog.refreshByPath(sidecar("dedup"))
            dropped = spark.read.parquet(sidecar("dedup"))
            n_dropped = dropped.count()
            store.record(
                "dedup", {"n_dropped": n_dropped},
                lineage={"fingerprint": fp, "sidecar": sidecar("dedup")},
            )
        # no broadcast HINT: the sidecar is parquet-backed so its size is
        # known to the planner — size-based planning broadcasts the
        # (typically vanishing) dropped set automatically and falls back
        # to a shuffled anti-join when a pathological corpus makes it big
        survivors = df.join(
            dropped.withColumnRenamed(id_col, "_drop"),
            df[f"`{id_col}`"] == F.col("_drop"),
            "left_anti",
        )
        report.append({"stage": "dedup", "n_dropped": n_dropped})

    # ---- stage 2: decontamination → contaminated-id sidecar ----------------
    # The benchmark IS fingerprinted (count + schema + order-independent
    # content hash): unlike the 100 TB corpus input (caller's job, see
    # module docstring), the benchmark is tiny and swapping it with the
    # same workdir must invalidate the stale contaminated-id sidecar.
    bench_fp = None
    if benchmark is not None:
        _bh = benchmark.select(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: xxhash64 spans the full int64 range, so
            # an ANSI-mode sum overflows; xor is order-independent too
            F.bit_xor(
                F.xxhash64(
                    F.concat_ws(
                        "\x00",
                        *[
                            F.coalesce(
                                F.col(f"`{c}`").cast("string"), F.lit("\x01")
                            )
                            for c in benchmark.columns
                        ],
                    )
                )
            ).alias("h"),
        ).collect()[0]
        bench_fp = {
            "n": int(_bh["n"]),
            "h": int(_bh["h"]) if _bh["h"] is not None else 0,
            "cols": list(benchmark.columns),
        }
    fp = _fingerprint(
        {"stage": "decontaminate", "on": benchmark is not None,
         "n": contamination_ngram, "benchmark": bench_fp}, prev=fp,
    )
    if benchmark is not None:
        rec = stage_complete("decontaminate", fp)
        if rec is not None:
            contaminated = spark.read.parquet(sidecar("decontaminate"))
            resumed.append("decontaminate")
            n_cont = int(rec["metrics"]["n_dropped"])
        else:
            cont_plan = contaminated_ids(
                survivors, benchmark,
                text_col=text_col, id_col=id_col, n=contamination_ngram,
            )
            cont_plan.write.mode("overwrite").parquet(sidecar("decontaminate"))
            spark.catalog.refreshByPath(sidecar("decontaminate"))
            contaminated = spark.read.parquet(sidecar("decontaminate"))
            n_cont = contaminated.count()
            store.record(
                "decontaminate", {"n_dropped": n_cont},
                lineage={"fingerprint": fp,
                         "sidecar": sidecar("decontaminate")},
            )
        # contaminated_ids always emits the column literally named
        # 'doc_id' (contamination.py out_id) regardless of id_col
        survivors = survivors.join(  # same no-hint rationale as dedup
            contaminated.withColumnRenamed("doc_id", "_cont"),
            survivors[f"`{id_col}`"] == F.col("_cont"),
            "left_anti",
        )
        report.append({"stage": "decontaminate", "n_dropped": n_cont})

    # ---- stage 3: quality funnel (row-local; census persisted) -------------
    fp = _fingerprint(
        {"stage": "quality", "filters": list(filters or [])}, prev=fp
    )
    if filters:
        rec = stage_complete("quality", fp)
        if rec is not None:
            funnel_rows = json.loads(rec["metrics"]["funnel"])
            resumed.append("quality")
        else:
            funnel_rows = [
                {k: r[k] for k in ("stage", "filter", "n_in", "n_killed",
                                   "n_out", "kill_frac")}
                for r in filter_funnel(survivors, list(filters)).collect()
            ]
            store.record(
                "quality", {"funnel": json.dumps(funnel_rows)},
                lineage={"fingerprint": fp},
            )
        survivors = apply_filters(survivors, list(filters))
        for r in funnel_rows:
            report.append({"stage": f"quality:{r['filter']}",
                           "n_dropped": r["n_killed"]})

    # ---- stage 4: assemble — mixture + split + shard + final write ---------
    fp = _fingerprint(
        {"stage": "assemble", "splits": splits, "split_salt": split_salt,
         "mixture": mixture, "mixture_group_col": mixture_group_col,
         "mixture_salt": mixture_salt, "n_shards": n_shards,
         "shard_salt": shard_salt}, prev=fp,
    )
    out_path = os.path.join(workdir, run_id, "admitted")
    rec = stage_complete("assemble", fp)
    if rec is not None:
        admitted = spark.read.parquet(out_path)
        resumed.append("assemble")
        n_admitted = int(rec["metrics"]["n_admitted"])
    else:
        final = survivors
        if mixture:
            final = final.filter(
                _mixture_keep_expr(
                    mixture, group_col=mixture_group_col,
                    id_col=id_col, salt=mixture_salt,
                )
            )
        if splits:
            final = assign_splits(
                final, splits, id_col=id_col, salt=split_salt
            )
        if n_shards:
            from ..sources.shards import assign_shards

            final = assign_shards(
                final, id_col=id_col, n_shards=n_shards, salt=shard_salt
            ).repartition(n_shards, "shard").sortWithinPartitions(id_col)
            final.write.mode("overwrite").partitionBy("shard").parquet(out_path)
        else:
            final.write.mode("overwrite").parquet(out_path)
        # a rerun overwrites paths whose listings Spark's FileStatusCache
        # may still hold from the PREVIOUS run — refresh before read-back
        spark.catalog.refreshByPath(out_path)
        admitted = spark.read.parquet(out_path)
        n_admitted = admitted.count()
        store.record(
            "assemble", {"n_admitted": n_admitted},
            lineage={"fingerprint": fp, "output": out_path},
        )
    report.append({"stage": "assemble", "n_admitted": n_admitted})
    return CurationResult(
        admitted=admitted,
        report=report,
        resumed_stages=resumed,
        output_path=out_path,
    )
