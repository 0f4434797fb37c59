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

import json
import os
import tempfile
import time
from typing import Dict, Iterable, List, Optional

__all__ = ["ManifestRecord", "FileManifestStore"]


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
