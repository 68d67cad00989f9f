"""Per-partition commit manifests — the exactly-once state (FIXTURES.md §3).

The manifest swap is the ONLY commit point (SURVEY.md §7 "exactly-once under
task retry"): data files use deterministic per-(partition, epoch) names so a
retried write overwrites rather than duplicates, and `os.replace` of the
manifest JSON is atomic on POSIX. Re-committing an identical manifest is a
no-op, so epoch re-runs are idempotent (BASELINE.json:6 "idempotent
per-partition commit manifests (offset + file-set atomically swapped)").

On a multi-node cluster the lake directory is shared storage (S3/NFS); here
it is a local path. Nothing in this module holds state in memory between
epochs — restore is "read the manifests" (SURVEY.md §3.2).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class Manifest:
    partition_id: int
    epoch: int
    upto_lsn: int
    schema_ver: int
    files: list[str]
    row_count: int
    content_hash: str
    lineage: dict = field(default_factory=dict)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def _manifest_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests")


def manifest_path(lake_dir: str, pid: int) -> str:
    return os.path.join(_manifest_dir(lake_dir), f"part-{pid:05d}.json")


def load_manifests(lake_dir: str) -> dict[int, Manifest]:
    """In-memory Manifest.files are absolute; on disk they are stored
    lake-relative so a lake mounted/relocated under a different path still
    resumes (and gc never mistakes still-referenced files for garbage)."""
    out: dict[int, Manifest] = {}
    for p in glob.glob(os.path.join(_manifest_dir(lake_dir), "part-*.json")):
        with open(p) as f:
            m = Manifest.from_json(f.read())
        m.files = [f if os.path.isabs(f) else os.path.join(lake_dir, f)
                   for f in m.files]
        out[m.partition_id] = m
    return out


def write_manifest(lake_dir: str, m: Manifest) -> None:
    """Atomic swap: write tmp in the same dir, fsync, os.replace.
    File paths are relativized against lake_dir before persisting."""
    d = _manifest_dir(lake_dir)
    os.makedirs(d, exist_ok=True)
    final = manifest_path(lake_dir, m.partition_id)
    tmp = final + ".tmp"
    payload = asdict(m)
    payload["files"] = [os.path.relpath(f, lake_dir) if os.path.isabs(f) else f
                        for f in m.files]
    with open(tmp, "w") as f:
        f.write(json.dumps(payload, sort_keys=True))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def gc_lake(lake_dir: str, manifests: dict[int, Manifest]) -> int:
    """Delete partition data files not referenced by any current manifest.

    Only files with an epoch tag strictly older than the owning partition's
    committed epoch are removed — an orphan from a crashed future epoch is
    kept (it will be overwritten deterministically on replay).
    """
    live = {os.path.abspath(f) for m in manifests.values() for f in m.files}
    removed = 0
    for pid, m in manifests.items():
        pdir = os.path.join(lake_dir, f"part={pid:05d}")
        for f in glob.glob(os.path.join(pdir, "state-e*.parquet")):
            try:
                epoch = int(os.path.basename(f)[len("state-e"):-len(".parquet")])
            except ValueError:
                continue
            if os.path.abspath(f) not in live and epoch < m.epoch:
                os.remove(f)
                removed += 1
    return removed
