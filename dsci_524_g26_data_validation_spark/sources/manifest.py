"""E7 — checkpoint manifest: per-partition lineage + metrics, resume-by-skip.

North rule (BASELINE.json:14): validation runs over a 10^12-row table must
be resumable. The unit of work is a **data partition value** (e.g. the
Iceberg partition column ``source`` or a date) — stable across
repartitioning and cluster restarts, unlike ``spark_partition_id()``
(SURVEY.md §7 risk f).

The manifest is an append-only set of records keyed by
(run_id, partition_key); a partition is complete iff its record exists.
Records are written atomically (write-temp + rename) AFTER the
partition's checks finish, so a crash mid-partition just re-runs that
partition — every check is a pure read, hence idempotent.

``FileManifestStore`` (JSON records on any shared filesystem) is the
sandbox implementation; on a real cluster back the same interface with
an Iceberg manifest table (append of metrics rows is transactional).
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import time
from typing import Dict, Iterable, List, Optional

__all__ = [
    "ManifestRecord",
    "FileManifestStore",
    "run_history",
    "metric_series",
]


class ManifestRecord(dict):
    """A manifest row: run_id, partition, metrics, lineage, finished_at."""


class FileManifestStore:
    """Filesystem-backed manifest: one JSON file per completed partition.

    File-per-partition (not a shared log) so concurrent writers for
    different partitions never contend; the atomic rename makes a record
    all-or-nothing.
    """

    def __init__(self, path: str, run_id: str):
        self.path = os.path.join(path, run_id)
        self.run_id = run_id
        os.makedirs(self.path, exist_ok=True)

    def _file(self, partition_key: str) -> str:
        safe = "".join(
            ch if ch.isalnum() or ch in "-_." else f"_{ord(ch):02x}_"
            for ch in partition_key
        )
        return os.path.join(self.path, f"part-{safe}.json")

    def completed(self) -> Dict[str, ManifestRecord]:
        out: Dict[str, ManifestRecord] = {}
        for name in os.listdir(self.path):
            if not name.startswith("part-") or not name.endswith(".json"):
                continue
            with open(os.path.join(self.path, name)) as fh:
                rec = ManifestRecord(json.load(fh))
            out[rec["partition"]] = rec
        return out

    def record(
        self,
        partition_key: str,
        metrics: Dict,
        *,
        lineage: Optional[Dict] = None,
    ) -> ManifestRecord:
        rec = ManifestRecord(
            run_id=self.run_id,
            partition=partition_key,
            metrics=metrics,
            lineage=lineage or {},
            finished_at=time.time(),
        )
        target = self._file(partition_key)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, target)  # atomic on POSIX
        return rec

    def pending(self, all_partitions: Iterable[str]) -> List[str]:
        done = set(self.completed())
        return sorted(p for p in set(all_partitions) - done)


# -- cross-run history ---------------------------------------------------------
#
# A manifest root accumulates one directory per run_id; reading them ALL
# back turns the per-partition metrics into a longitudinal series — the
# regression-detection loop ("did null_frac jump between yesterday's run
# and today's?") that single-run validation can't close. The history is
# metadata-scale (O(runs × partitions) small JSON files), but it is read
# through spark.read.json anyway so a years-long history on a shared
# filesystem never funnels through the driver.


def run_history(spark, root: str):
    """All manifest records under ``root`` as a long-format DataFrame:
    ``(run_id, partition, metric, value double, value_str, finished_at)``
    — one row per metric per completed partition per run.

    ``value`` is the numeric reading (``try_cast``, so counters and
    fractions series cleanly); ``value_str`` preserves non-numeric
    metrics verbatim. Runs with disjoint metric sets coexist — history
    is a union, not a schema.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("run_id", T.StringType()),
            T.StructField("partition", T.StringType()),
            T.StructField("finished_at", T.DoubleType()),
            T.StructField(
                "metrics", T.MapType(T.StringType(), T.StringType())
            ),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("run_id", T.StringType()),
            T.StructField("partition", T.StringType()),
            T.StructField("metric", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("value_str", T.StringType()),
            T.StructField("finished_at", T.DoubleType()),
        ]
    )
    # a fresh root (no completed runs yet) matches no files — return an
    # empty history frame instead of letting the reader raise
    # PATH_NOT_FOUND. The local-filesystem glob probe only applies to
    # local roots: a remote root (s3a://, hdfs://) always looks empty to
    # the driver's glob, which would silently hide real history, so for
    # those we attempt the read and map Spark's PATH_NOT_FOUND to the
    # empty frame instead. glob.escape keeps roots containing glob
    # metacharacters ('[', '?') from matching nothing spuriously.
    has_scheme = "://" in root
    if not has_scheme and not glob.glob(
        os.path.join(glob.escape(root), "*", "part-*.json")
    ):
        return spark.createDataFrame([], out_schema)
    # Hadoop's glob treats [ ] { } ? * as metachars too: escape them in
    # the ROOT portion (backslash escaping per hadoop GlobPattern) so a
    # root like ".../runs [prod]" matches itself literally.
    hroot = "".join(
        "\\" + ch if ch in "[]{}?*\\" else ch for ch in root
    )
    try:
        raw = spark.read.schema(schema).json(
            os.path.join(hroot, "*", "part-*.json")
        )
        raw.schema  # force analysis so a missing remote path raises here
    except Exception as e:  # noqa: BLE001 — AnalysisException shape varies
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], out_schema)
        raise
    kv = raw.select(
        "run_id",
        "partition",
        "finished_at",
        F.explode_outer("metrics").alias("metric", "value_str"),
    )
    return kv.select(
        "run_id",
        "partition",
        "metric",
        F.col("value_str").try_cast("double").alias("value"),
        "value_str",
        "finished_at",
    )


def metric_series(history, metric: str, *, partition: str = None):
    """One metric's per-run series from :func:`run_history` output:
    ``(run_id, finished_at, value)`` ordered by run finish time —
    exactly the input contract of
    :func:`~..operators.timeseries.change_point_report`
    (``order_col="finished_at"``, ``value_col="value"``).

    ``partition=None`` SUMS the metric across partitions per run (the
    table-level series; counts and violation totals add); pass a
    partition value for that slice's own series (fractions/averages
    do NOT add — slice them, don't sum them).
    """
    from pyspark.sql import functions as F

    h = history.filter(F.col("metric") == metric)
    if partition is not None:
        h = h.filter(F.col("partition") == partition)
    return (
        h.groupBy("run_id")
        .agg(
            F.max("finished_at").alias("finished_at"),
            F.sum("value").alias("value"),
        )
        .orderBy("finished_at")
    )
