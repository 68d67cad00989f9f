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

import json
import os
from dataclasses import asdict, dataclass, field

from thor_ray.state.storage import storage_for


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
    resumes (and gc never mistakes still-referenced files for garbage).
    Reads go through the storage interface like the writes — a lake on a
    scheme-routed backend lists and reads the same way."""
    st = storage_for(lake_dir)
    out: dict[int, Manifest] = {}
    for p in st.list(os.path.join(_manifest_dir(lake_dir), "part-*.json")):
        m = Manifest.from_json(st.read_bytes(p).decode())
        m.files = [f if os.path.isabs(f) else os.path.join(lake_dir, f)
                   for f in m.files]
        out[m.partition_id] = m
    return out


def _atomic_write(final: str, payload: dict) -> None:
    """All commit-point JSON (manifests, archives, tags, writer token,
    snapshot meta) publishes through the storage interface so the
    atomicity contract is swappable per backend (state/storage.py)."""
    storage_for(final).put_bytes(
        final, json.dumps(payload, sort_keys=True).encode())


def _relativized(m: Manifest, lake_dir: str) -> dict:
    payload = asdict(m)
    payload["files"] = [os.path.relpath(f, lake_dir) if os.path.isabs(f) else f
                        for f in m.files]
    return payload


def write_manifest(lake_dir: str, m: Manifest) -> None:
    """Atomic swap: write tmp in the same dir, fsync, os.replace.
    File paths are relativized against lake_dir before persisting."""
    d = _manifest_dir(lake_dir)
    storage_for(lake_dir).makedirs(d)
    _atomic_write(manifest_path(lake_dir, m.partition_id),
                  _relativized(m, lake_dir))


# --- incremental-snapshot progress (DBLog-style snapshot-while-tailing) -----
# CdcPipeline.run_incremental bootstraps EMPTY and folds the base table in
# as key-disjoint chunks (delta files at _lsn=0) interleaved with live epoch
# applies. This sidecar records chunk progress so a killed run resumes, and
# its `active` flag tells every reader/fold that delete tombstones must be
# RETAINED until the last chunk lands (a compaction that dropped a tombstone
# would let a later chunk resurrect a deleted key).


def _snapshot_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_schema", "snapshot.json")


def read_snapshot_meta(lake_dir: str) -> dict | None:
    """{"n_chunks", "done", "active"} or None if no incremental snapshot
    was ever started on this lake."""
    st = storage_for(lake_dir)
    p = _snapshot_path(lake_dir)
    if not st.exists(p):
        return None
    return json.loads(st.read_bytes(p))


def write_snapshot_meta(lake_dir: str, meta: dict) -> None:
    storage_for(lake_dir).makedirs(
        os.path.dirname(_snapshot_path(lake_dir)))
    _atomic_write(_snapshot_path(lake_dir), meta)


def snapshot_active(lake_dir: str) -> bool:
    meta = read_snapshot_meta(lake_dir)
    return bool(meta and meta.get("active"))


# --- snapshot history (time travel) ----------------------------------------
# An epoch-tagged copy of each committed manifest under _manifests/history/
# pins the file set of every retained epoch: `read_lake_at` is just "load
# the newest archived manifest per partition with epoch <= requested".
# Retention is bounded (CdcConfig.retain_snapshots); gc protects every file
# a retained snapshot still references, so cow AND delta lakes time-travel.


def _history_dir(lake_dir: str) -> str:
    return os.path.join(_manifest_dir(lake_dir), "history")


def archive_manifest(lake_dir: str, m: Manifest) -> None:
    """Epoch-tagged snapshot copy (idempotent: deterministic name, atomic
    replace — an epoch re-run rewrites the identical archive)."""
    d = _history_dir(lake_dir)
    storage_for(lake_dir).makedirs(d)
    _atomic_write(
        os.path.join(d, f"part-{m.partition_id:05d}-e{m.epoch:06d}.json"),
        _relativized(m, lake_dir))


def snapshot_epochs(lake_dir: str) -> list[int]:
    """Epochs with at least one archived manifest, ascending."""
    eps = {int(os.path.basename(p).rsplit("-e", 1)[1][:-len(".json")])
           for p in storage_for(lake_dir).list(
               os.path.join(_history_dir(lake_dir), "part-*-e*.json"))}
    return sorted(eps)


def load_manifests_at(lake_dir: str, epoch: int) -> dict[int, Manifest]:
    """Per-partition manifests as of `epoch`: the newest archive with
    epoch <= requested (partitions commit independently, so a partition
    untouched since epoch k<=epoch is represented by its epoch-k archive)."""
    st = storage_for(lake_dir)
    best: dict[int, str] = {}
    best_ep: dict[int, int] = {}
    for p in st.list(os.path.join(_history_dir(lake_dir),
                                  "part-*-e*.json")):
        b = os.path.basename(p)
        pid = int(b[len("part-"):len("part-") + 5])
        ep = int(b.rsplit("-e", 1)[1][:-len(".json")])
        if ep <= epoch and ep >= best_ep.get(pid, -1):
            best_ep[pid], best[pid] = ep, p
    out: dict[int, Manifest] = {}
    for pid, p in best.items():
        m = Manifest.from_json(st.read_bytes(p).decode())
        m.files = [f_ if os.path.isabs(f_) else os.path.join(lake_dir, f_)
                   for f_ in m.files]
        out[pid] = m
    return out


def prune_history(lake_dir: str, keep_from_epoch: int) -> int:
    """Drop archives older than the retention window. A partition's newest
    archive is always kept even if old (it still describes that partition's
    state inside the window). Archives a named savepoint tag resolves
    through (the newest archive <= the tagged epoch, per partition) are
    pinned regardless of the window — a tag is an indefinite-retention
    promise until delete_tag."""
    st = storage_for(lake_dir)
    newest: dict[int, int] = {}
    entries = []
    for p in st.list(os.path.join(_history_dir(lake_dir),
                                  "part-*-e*.json")):
        b = os.path.basename(p)
        pid = int(b[len("part-"):len("part-") + 5])
        ep = int(b.rsplit("-e", 1)[1][:-len(".json")])
        entries.append((pid, ep, p))
        newest[pid] = max(newest.get(pid, -1), ep)
    pinned: set[str] = set()
    for tag_ep in set(list_tags(lake_dir).values()):
        best: dict[int, tuple[int, str]] = {}
        for pid, ep, p in entries:
            if ep <= tag_ep and ep >= best.get(pid, (-1, ""))[0]:
                best[pid] = (ep, p)
        pinned |= {p for _, p in best.values()}
    removed = 0
    for pid, ep, p in entries:
        if ep < keep_from_epoch and ep != newest[pid] and p not in pinned:
            st.delete(p)
            removed += 1
    return removed


# ---------------------------------------------------------------------------
# Named savepoint tags (Iceberg-tag analogue): name -> retained epoch.
# A tag pins its archives against prune_history (above) and, through them,
# the data files against gc_lake — reading or branching at the tag stays
# valid for the tag's lifetime regardless of the retention window.
# ---------------------------------------------------------------------------


def _tags_path(lake_dir: str) -> str:
    return os.path.join(_manifest_dir(lake_dir), "tags.json")


def restore_count(lake_dir: str) -> int:
    """How many point-in-time restores this lake has undergone. Derived
    consumers (indexes, views, sinks, replicas) persist the count they
    last advanced under and fail loudly on mismatch — a restore rewrites
    epochs, so any state keyed by pre-restore epochs is stale."""
    st = storage_for(lake_dir)
    p = os.path.join(_manifest_dir(lake_dir), "restores.json")
    if not st.exists(p):
        return 0
    return int(json.loads(st.read_bytes(p))["count"])


def record_restore(lake_dir: str, epoch: int) -> int:
    c = restore_count(lake_dir) + 1
    _atomic_write(os.path.join(_manifest_dir(lake_dir), "restores.json"),
                  {"count": c, "epoch": int(epoch)})
    return c


def list_tags(lake_dir: str) -> dict[str, int]:
    """name -> epoch for every savepoint tag on the lake."""
    st = storage_for(lake_dir)
    p = _tags_path(lake_dir)
    if not st.exists(p):
        return {}
    return json.loads(st.read_bytes(p))


def create_tag(lake_dir: str, name: str, epoch: int,
               replace: bool = False) -> None:
    """Record a named savepoint at `epoch`. The epoch must be resolvable
    for every committed partition (an archive with epoch <= the tag exists
    — i.e. the snapshot is still retained); raises otherwise, and on a
    duplicate name unless `replace`."""
    if not name or any(c in name for c in "/\\\0\n"):
        raise ValueError(f"invalid tag name {name!r}")
    tags = list_tags(lake_dir)
    if name in tags and not replace:
        raise ValueError(f"tag {name!r} already exists at epoch "
                         f"{tags[name]} (pass replace=True to move it)")
    cur = load_manifests(lake_dir)
    at = load_manifests_at(lake_dir, epoch)
    missing = sorted(set(cur) - set(at))
    if not cur or missing:
        raise ValueError(
            f"epoch {epoch} is not a readable snapshot for partitions "
            f"{missing or 'all'} — retention (CdcConfig.retain_snapshots) "
            "must cover the tagged epoch when the tag is created")
    tags[name] = int(epoch)
    _atomic_write(_tags_path(lake_dir), tags)


def delete_tag(lake_dir: str, name: str) -> bool:
    """Drop a savepoint tag; its archives rejoin normal retention on the
    next prune. Returns False if the tag did not exist."""
    tags = list_tags(lake_dir)
    if name not in tags:
        return False
    del tags[name]
    _atomic_write(_tags_path(lake_dir), tags)
    return True


def gc_lake(lake_dir: str, manifests: dict[int, Manifest]) -> int:
    """Delete partition data files not referenced by any current manifest.

    Only files with an epoch tag strictly older than the owning partition's
    committed epoch are removed — an orphan from a crashed future epoch is
    kept (it will be overwritten deterministically on replay). Files still
    referenced by a retained snapshot archive (time travel) are protected;
    prune_history shrinks that set first.
    """
    st = storage_for(lake_dir)
    live = {os.path.abspath(f) for m in manifests.values() for f in m.files}
    # O(retention × partitions) small-JSON reads per commit — bounded by
    # prune_history just before this in the pipeline; skipped entirely
    # when time travel is off (no history dir)
    for p in st.list(os.path.join(_history_dir(lake_dir),
                                  "part-*-e*.json")):
        payload = json.loads(st.read_bytes(p))
        live |= {os.path.abspath(f_ if os.path.isabs(f_)
                                 else os.path.join(lake_dir, f_))
                 for f_ in payload["files"]}
    # fork-point manifests (sources/branch.py): a branched lake keeps its
    # creation-time state as the three-way merge base — those hardlinked
    # files must survive the branch's own compactions until the branch is
    # deleted wholesale
    fork_dir = os.path.join(_manifest_dir(lake_dir), "fork")
    for p in st.list(os.path.join(fork_dir, "part-*.json")):
        payload = json.loads(st.read_bytes(p))
        live |= {os.path.abspath(f_ if os.path.isabs(f_)
                                 else os.path.join(lake_dir, f_))
                 for f_ in payload["files"]}
    removed = 0
    snap_meta = read_snapshot_meta(lake_dir)
    snap_done = int(snap_meta["done"]) if snap_meta else 0
    snap_gen = int(snap_meta.get("generation", 0)) if snap_meta else 0
    for pid, m in manifests.items():
        pdir = os.path.join(lake_dir, f"part={pid:05d}")
        for f in st.list(os.path.join(pdir, "state-e*.parquet")):
            try:
                epoch = int(os.path.basename(f)[len("state-e"):-len(".parquet")])
            except ValueError:
                continue
            if os.path.abspath(f) not in live and epoch < m.epoch:
                st.delete(f)
                removed += 1
        # incremental/ad-hoc snapshot chunk files (snap-g{gen}-c{chunk}):
        # unreferenced + committed means a later compaction superseded it
        # — same "strictly older than the commit point" rule as epochs.
        # Committed = an older generation, or the current generation with
        # chunk id < done; an orphan from a crashed injection (current
        # gen, chunk >= done) is kept and overwritten on retry.
        for f in st.list(os.path.join(pdir, "snap-*.parquet")):
            stem = os.path.basename(f)[len("snap-"):-len(".parquet")]
            try:
                g_s, c_s = stem.split("-c")
                g, chunk = int(g_s.lstrip("g")), int(c_s)
            except ValueError:
                continue
            committed = g < snap_gen or (g == snap_gen and chunk < snap_done)
            if os.path.abspath(f) not in live and committed:
                st.delete(f)
                removed += 1
    return removed


# --- writer fencing ---------------------------------------------------------
# Zombie-writer protection for the exactly-once sink: each pipeline takes a
# monotonically increasing writer generation before its FIRST commit; every
# later commit verifies the persisted generation is still its own. A paused
# driver that resumes after a newer writer took over fails closed instead of
# swapping stale manifests over newer state (the Delta/Iceberg-style token,
# minus CAS: os.replace gives atomic visibility; on shared storage without
# compare-and-swap this is last-acquirer-wins best effort — documented).


class FencedWriterError(RuntimeError):
    """A newer writer generation owns this lake; this writer must stop."""


def _writer_path(lake_dir: str) -> str:
    return os.path.join(_manifest_dir(lake_dir), "writer.json")


def current_writer_gen(lake_dir: str) -> int:
    """Authoritative writer generation via the storage layer's
    ledger-aware read (`Storage.current_generation`) — on claim-ledger
    CAS backends this is regression-proof: a delayed old winner's stale
    cache publish cannot make a superseded writer's fence check pass
    again (the ledger is monotone)."""
    p = _writer_path(lake_dir)
    try:
        g = storage_for(lake_dir).current_generation(p)
    except OSError:
        g = None
    return int(g) if g is not None else 0


def acquire_writer_gen(lake_dir: str) -> int:
    """Take over the lake: bump and persist the generation token via the
    storage layer's conditional write (true claim-ledger CAS on posix
    backends; conditional PUT on object stores — see state/storage.py).
    A lost race simply re-reads and bumps past the winner."""
    p = _writer_path(lake_dir)
    st = storage_for(p)
    st.makedirs(_manifest_dir(lake_dir))
    while True:
        cur = current_writer_gen(lake_dir)
        g = cur + 1
        if st.put_if_generation(p, json.dumps({"gen": g}).encode(),
                                cur if cur else None):
            return g
