"""Lake table readers (SURVEY.md §2.1 S1).

State files carry three internal columns: ``_lsn`` (last-writer lsn per
key, the merge tiebreaker), ``_sha`` (cached sha256(content) so manifest
content hashes are incremental), and ``_op`` ('U' live row / 'D' tombstone
— delta files keep tombstones, merge-on-read drops them; SURVEY.md §2.3
A1 "LSM-style")."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

INTERNAL_COLS = ["_lsn", "_sha", "_op"]


def merge_state_frames(frames: list[pd.DataFrame],
                       drop_tombstones: bool = True) -> pd.DataFrame:
    """LSM merge: newest (_lsn) row per (repo, path) wins; tombstones drop.

    All frames of one partition share a schema (DDL epochs force
    compaction, so a file run is never schema-mixed; an incremental-
    snapshot chunk file carries only the base columns — concat fills the
    evolved columns with null, which is exactly the oracle's value for a
    base row after an add_column).

    drop_tombstones=False keeps the winning 'D' rows in the result —
    required while an incremental snapshot is in progress, when a delete
    must keep outranking a base-image chunk row (_lsn=0) that arrives
    later (CdcPipeline.run_incremental)."""
    if not frames:
        return pd.DataFrame()
    df = pd.concat(frames, ignore_index=True)
    df = df.sort_values("_lsn", kind="stable").drop_duplicates(
        ["repo", "path"], keep="last")
    if drop_tombstones and "_op" in df.columns:
        df = df[df["_op"] != "D"]
    return df


def read_lake(lake_dir: str, manifests: dict | None = None,
              keep_internal: bool = False, **read_kwargs) -> "ray.data.Dataset":
    """Current committed lake state as a Dataset.

    Partitions whose file run has deltas (write_mode="delta") are merged
    on read — one task per partition, no shuffle (a partition's files are
    co-located by construction)."""
    from thor_ray.state import load_manifests

    ms = manifests if manifests is not None else load_manifests(lake_dir)
    files_of = {
        pid: (m.files if hasattr(m, "files") else m["files"])
        for pid, m in ms.items()
    }
    all_files = [f for fs in files_of.values() for f in fs]
    if not all_files:
        return ray.data.from_items([])

    needs_merge = any(len(fs) > 1 for fs in files_of.values())
    # while an incremental snapshot is in progress, even single-file
    # partitions may hold retained delete tombstones — the merge path
    # filters them; the plain read below would surface them as data
    from thor_ray.state import snapshot_active
    if not needs_merge and snapshot_active(lake_dir):
        needs_merge = True
    if not needs_merge:
        # compacted lake: plain parallel parquet read (tombstone-free)
        # partitioning=None: the part=NNNNN dirs are layout, not hive columns
        ds = ray.data.read_parquet(all_files, partitioning=None, **read_kwargs)
        if not keep_internal:
            ds = ds.drop_columns(
                [c for c in INTERNAL_COLS if c in ds.schema().names])
        return ds

    items = pa.table({
        "files": pa.array([json.dumps(fs) for fs in files_of.values() if fs]),
    })

    columns = read_kwargs.get("columns")
    # column pruning THROUGH the merge: the fold itself only needs the
    # key + internal columns on top of what the caller asked for — the
    # payload columns it didn't ask for (content, typically the bulk of
    # every state file) never leave the parquet reader
    read_cols = None
    if columns:
        read_cols = list(dict.fromkeys(
            ["repo", "path"] + INTERNAL_COLS + list(columns)))

    def merge_task(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for fj in batch["files"]:
            frames = []
            for f in json.loads(fj):
                cols_f = None
                if read_cols is not None:
                    have = set(pq.read_schema(f).names)
                    cols_f = [c for c in read_cols if c in have]
                frames.append(pq.read_table(f, columns=cols_f).to_pandas())
            df = merge_state_frames(frames)
            if not keep_internal:
                df = df.drop(columns=[c for c in INTERNAL_COLS if c in df.columns])
            if columns:
                df = df[[c for c in columns if c in df.columns]]
            outs.append(df)
        return pd.concat(outs, ignore_index=True)

    return (ray.data.from_arrow(items)
            .repartition(items.num_rows)
            .map_batches(merge_task, batch_format="pandas", batch_size=None))


def read_lake_at(lake_dir: str, epoch: int, keep_internal: bool = False,
                 **read_kwargs) -> "ray.data.Dataset":
    """Time travel: the committed lake AS OF `epoch`, from the snapshot
    archives a pipeline with retain_snapshots > 0 keeps (per partition,
    the newest archived manifest with epoch <= requested — partitions
    commit independently). Raises if the epoch predates the retention
    window."""
    from thor_ray.state import load_manifests_at, snapshot_epochs

    ms = load_manifests_at(lake_dir, epoch)
    if not ms:
        raise ValueError(
            f"no snapshot at or before epoch {epoch} in {lake_dir} "
            f"(retained: {snapshot_epochs(lake_dir)}; "
            "was the pipeline run with retain_snapshots > 0?)")
    return read_lake(lake_dir, manifests=ms, keep_internal=keep_internal,
                     **read_kwargs)


def consistent_epoch(lake_dirs: "list[str]") -> int:
    """Highest epoch EVERY lake has fully committed — the consistency
    frontier of a demux family whose routes commit at different speeds
    (the slowest route bounds it, exactly like the slowest Kafka
    partition bounds a consumer's consistent offset vector)."""
    from thor_ray.state import load_manifests

    eps = []
    for d in lake_dirs:
        ms = load_manifests(d)
        if not ms:
            raise ValueError(f"no manifests under {d}")
        eps.append(min(m.epoch for m in ms.values()))
    return min(eps)


def read_demux_consistent(lake_dirs: "list[str]", epoch: int | None = None,
                          keep_internal: bool = False) -> "ray.data.Dataset":
    """Watermark-aligned snapshot of a WHOLE demux family: the union of
    every route's lake AS OF one aligned epoch — a transactionally
    consistent view of the full keyspace even while routes commit at
    different speeds. Lakes ahead of the aligned epoch are read through
    their retained time-travel snapshots, so ``retain_snapshots`` must
    cover the family's maximum lag; the caught-up lake reads its live
    manifests (no retention needed on the frontier lake).

    Guards: the lakes must be the complete route set of ONE family
    (same hash impl and route_on, same fanout n, route ids exactly
    0..n-1) and the selected manifests must agree on the lsn watermark
    (same binlog, same epoch grid) — violations raise instead of
    returning a torn snapshot."""
    import functools

    from thor_ray.state import load_manifests, load_manifests_at

    metas = []
    for d in lake_dirs:
        p = os.path.join(d, "_schema", "engine.json")
        if not os.path.exists(p):
            raise ValueError(f"{d} has no engine meta — not a CDC lake")
        with open(p) as f:
            metas.append(json.load(f))
    routes = [m.get("route") for m in metas]
    if any(r is None for r in routes):
        raise ValueError("read_demux_consistent requires route-demuxed "
                         "lakes (CdcConfig.route); got an unrouted lake")
    n = routes[0][1]
    ids = sorted(r[0] for r in routes)
    if any(r[1] != n for r in routes) or ids != list(range(n)):
        raise ValueError(f"lakes are not one complete demux family: "
                         f"fanouts {[r[1] for r in routes]}, ids {ids}")
    if len({m["hash_impl"] for m in metas}) != 1 \
            or len({m.get("route_on", "key") for m in metas}) != 1:
        raise ValueError("demux family mixes hash impls or route_on modes")

    e = consistent_epoch(lake_dirs) if epoch is None else epoch
    parts, uptos = [], set()
    for d in lake_dirs:
        ms = load_manifests(d)
        cur = min(m.epoch for m in ms.values())
        if cur < e:
            raise ValueError(f"{d} has only committed epoch {cur} < {e}")
        sel = ms if cur == e else load_manifests_at(d, e)
        if set(sel) != set(ms):
            raise ValueError(
                f"{d}: retention does not cover epoch {e} for partitions "
                f"{sorted(set(ms) - set(sel))}")
        uptos.add(max(m.upto_lsn for m in sel.values()))
        parts.append(read_lake(d, manifests=None if cur == e else sel,
                               keep_internal=keep_internal))
    if len(uptos) != 1:
        raise ValueError(f"lakes disagree on the lsn watermark at epoch "
                         f"{e}: {sorted(uptos)} — different binlogs or "
                         "epoch grids cannot form a consistent snapshot")
    return functools.reduce(lambda a, b: a.union(b), parts)


def snapshot_diff(lake_dir: str, epoch_a: int,
                  epoch_b: int) -> "ray.data.Dataset":
    """Changefeed between two retained snapshots: one row per key whose
    VISIBLE state differs between epoch_a and epoch_b — change 'I' (added),
    'D' (deleted), 'U' (any visible column differs; a re-write of identical
    values is NOT a change). lsn_a/lsn_b carry the last-writer metadata.

    Scale shape: keys are routed to the same partition in every epoch (same
    stable key hash, fixed partition count), so the diff is PARTITION-
    ALIGNED — one task reads both file sets of one partition and compares
    locally. No shuffle, no cross-partition traffic."""
    from thor_ray.sources.branch import _diff_manifest_sets
    from thor_ray.state import load_manifests_at

    ms_a = load_manifests_at(lake_dir, epoch_a)
    ms_b = load_manifests_at(lake_dir, epoch_b)
    if not ms_a or not ms_b:
        raise ValueError(
            f"snapshot_diff needs retained snapshots at both epochs "
            f"({epoch_a}: {bool(ms_a)}, {epoch_b}: {bool(ms_b)})")
    return _diff_manifest_sets(ms_a, ms_b)


def read_partition_state(files: list[str]) -> pd.DataFrame:
    """One partition's current merged state, inside an apply task."""
    return merge_state_frames([pq.read_table(f).to_pandas() for f in files])


def read_lineage(lake_dir: str, kind: str | None = None) -> pd.DataFrame:
    """All per-epoch lineage records (SURVEY.md §2.1 S4) as a DataFrame.

    kind: None (all) | "epoch" | "partition"."""
    import glob as _glob

    rows = []
    for p in sorted(_glob.glob(f"{lake_dir}/_lineage/epoch-*.jsonl")):
        with open(p) as f:
            for line in f:
                rec = json.loads(line)
                if kind is None or rec.get("type") == kind:
                    rows.append(rec)
    return pd.DataFrame(rows)


def _routing_guard(lake_dir: str, P: int, who: str) -> None:
    """The SAME guard the pipeline applies on resume: a lake routed under
    a different hash impl (e.g. polars there, FNV fallback here) or
    partition count would silently send lookups to the wrong partition
    and report present keys as absent."""
    meta_path = os.path.join(lake_dir, "_schema", "engine.json")
    if os.path.exists(meta_path):
        from thor_ray.pipelines.cdc import _hash_impl

        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("hash_impl") != _hash_impl() \
                or meta.get("num_partitions") != P:
            raise RuntimeError(
                f"{who} routing mismatch: lake wrote {meta}, this "
                f"process has hash_impl={_hash_impl()!r}, partitions={P} — "
                "lookups would silently miss; read via read_lake instead")


class LakeEnricher:
    """Stream-table lookup join (actor-pool stage): attach the lake's
    CURRENT row for each (repo, path) key to a keyed stream batch — the
    enrichment pattern a CDC consumer uses to decorate a change stream
    with base-table attributes without shuffling the (big) lake.

    Scale shape: manifests + the routing guard load ONCE per actor in
    __init__; per batch, keys group by owning partition (same stable_hash
    % P as the ingest router) and merge against an LRU-cached partition
    state, so a key-local stream reads each partition's file run once per
    actor, not once per batch. The lake side never moves: only the
    stream flows, and only `cols` columns are attached (`lake_`-prefixed,
    NULL for absent keys). A partition's merged state must fit in actor
    memory — the apply task's own assumption.

    Use via enrich_with_lake(); pass cache_partitions ≈ P/concurrency
    so the pool collectively holds the lake's hot set.
    """

    def __init__(self, lake_dir: str, cols: list[str],
                 cache_partitions: int = 8):
        from collections import OrderedDict

        from thor_ray.state import load_manifests

        self.ms = load_manifests(lake_dir)
        if not self.ms:
            raise RuntimeError(f"no committed lake at {lake_dir}")
        self.P = len(self.ms)
        _routing_guard(lake_dir, self.P, "enrich_with_lake")
        self.cols = list(cols)
        self.cache_partitions = cache_partitions
        self._cache: "OrderedDict[int, pd.DataFrame]" = OrderedDict()

    def _state(self, pid: int) -> pd.DataFrame:
        st = self._cache.get(pid)
        if st is not None:
            self._cache.move_to_end(pid)
            return st
        st = read_partition_state(self.ms[pid].files)
        if st.empty:
            st = pd.DataFrame(columns=["repo", "path", *self.cols])
        for c in self.cols:        # schema evolution: column not yet added
            if c not in st.columns:
                st[c] = None
        st = st[["repo", "path", *self.cols]]
        self._cache[pid] = st
        while len(self._cache) > self.cache_partitions:
            self._cache.popitem(last=False)
        return st

    def __call__(self, t: pa.Table) -> pa.Table:
        from thor_ray.stages.smt import stable_hash

        clash = {f"lake_{c}" for c in self.cols} | {"_ord"}
        clash &= set(t.column_names)
        if clash:
            raise ValueError(
                f"enrich_with_lake output columns {sorted(clash)} already "
                "exist in the stream — rename them first")
        df = t.to_pandas()
        if not len(df):
            for c in self.cols:
                df[f"lake_{c}"] = pd.Series([], dtype=object)
            return pa.Table.from_pandas(df, preserve_index=False)
        pids = stable_hash(t, ["repo", "path"]) % self.P
        df["_ord"] = np.arange(len(df))
        outs = []
        for pid, grp in df.groupby(pids, sort=False):
            st = self._state(int(pid))
            hit = grp.merge(
                st.rename(columns={c: f"lake_{c}" for c in self.cols}),
                on=["repo", "path"], how="left")
            outs.append(hit)
        out = pd.concat(outs, ignore_index=True) \
            .sort_values("_ord", kind="stable") \
            .drop(columns=["_ord"]).reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False)


def enrich_with_lake(ds: "ray.data.Dataset", lake_dir: str,
                     cols: list[str], concurrency: int = 4,
                     batch_size: int = 4096,
                     cache_partitions: int = 8) -> "ray.data.Dataset":
    """Enrich a (repo, path)-keyed stream with lake columns — see
    LakeEnricher. Stateful stage → actor pool (setup once per actor)."""
    return ds.map_batches(
        LakeEnricher, batch_format="pyarrow",
        fn_constructor_args=(lake_dir, cols, cache_partitions),
        concurrency=concurrency, batch_size=batch_size)


def _bloom_prune(files: list[str], key_hashes, stats: dict | None
                 ) -> list[str]:
    """Skip run files whose footer bloom proves they contain NONE of the
    queried keys (state/bloom.py). Footer-only metadata reads; files
    written before blooms existed (no thor_bloom key) are always read.
    Safe under merge-on-read: blooms have no false negatives and are
    built over every written row including tombstones, so a skipped file
    can contribute nothing to the queried keys' fold."""
    from thor_ray.pipelines.cdc import _hash_impl
    from thor_ray.state import bloom as _bloom

    impl = _hash_impl()
    keep = []
    for f in files:
        md = pq.read_schema(f).metadata or {}
        raw = md.get(b"thor_bloom")
        if raw is None or _bloom.might_contain(
                _bloom.decode_footer(raw), key_hashes, impl).any():
            keep.append(f)
    if stats is not None:
        stats["files_total"] = stats.get("files_total", 0) + len(files)
        stats["files_read"] = stats.get("files_read", 0) + len(keep)
    return keep


def lake_lookup(lake_dir: str, keys: "list[tuple[str, str]]",
                stats: dict | None = None) -> pd.DataFrame:
    """Partition-pruned point reads — the serving path. Each (repo, path)
    key hashes to its owning partition with the SAME stable hash the
    ingest router uses (pipelines/cdc.py route: stable_hash % P), so
    looking up k keys reads at most k partitions' file runs and never
    scans the lake; within a partition, footer blooms skip run files that
    contain none of the keys (_bloom_prune — the LSM point-read path).
    Runs driver-side (point reads are answer-sized; a
    partition's merged state must fit in memory, same assumption as the
    apply task). Missing keys are simply absent from the result.
    Pass ``stats={}`` to collect {files_total, files_read} pruning
    counters."""
    from thor_ray.state import load_manifests
    from thor_ray.stages.smt import stable_hash

    ms = load_manifests(lake_dir)
    if not ms:
        return pd.DataFrame()
    P = len(ms)
    _routing_guard(lake_dir, P, "lake_lookup")
    kt = pa.table({"repo": pa.array([r for r, _ in keys], pa.string()),
                   "path": pa.array([p for _, p in keys], pa.string())})
    kh = stable_hash(kt, ["repo", "path"])
    kdf = pd.DataFrame({"repo": kt["repo"].to_pylist(),
                        "path": kt["path"].to_pylist(), "pid": kh % P,
                        "kh": kh})
    outs = []
    for pid, grp in kdf.groupby("pid"):
        files = _bloom_prune(ms[int(pid)].files,
                             grp["kh"].to_numpy(), stats)
        if not files:
            continue
        state = read_partition_state(files)
        if state.empty:
            continue
        hit = state.merge(grp[["repo", "path"]], on=["repo", "path"])
        outs.append(hit.drop(columns=[c for c in INTERNAL_COLS
                                      if c in hit.columns]))
    if not outs:
        return pd.DataFrame()
    return pd.concat(outs, ignore_index=True) \
        .sort_values(["repo", "path"]).reset_index(drop=True)


def maintain_group_counts(counts: "pd.DataFrame | None",
                          diff_df: pd.DataFrame,
                          key: str = "repo") -> pd.DataFrame:
    """Incremental materialized-view maintenance: per-key live-row counts
    kept current from the snapshot changefeed ALONE — each epoch folds the
    (output-sized) diff into the running view, the lake is never
    rescanned. 'I' adds a row, 'D' removes one, 'U' leaves the count
    unchanged. Seed with counts=None at the first maintained epoch (fold
    a diff from epoch 0, or aggregate the snapshot once). The same fold
    shape extends to sums with a value-carrying diff."""
    if counts is None:
        counts = pd.DataFrame({key: pd.Series(dtype="object"),
                               "n": pd.Series(dtype="int64")})
    delta = diff_df[diff_df["change"] != "U"].copy()
    if delta.empty:
        return counts.reset_index(drop=True)
    delta["d"] = np.where(delta["change"] == "I", 1, -1)
    d = delta.groupby(key, as_index=False)["d"].sum()
    out = counts.merge(d, on=key, how="outer")
    out["n"] = (out["n"].fillna(0) + out["d"].fillna(0)).astype("int64")
    out = out[out["n"] > 0][[key, "n"]]
    return out.sort_values(key).reset_index(drop=True)


def lake_stats(lake_dir: str, ndv_cols: "tuple[str, ...]" = ("repo", "lang"),
               precision: int = 12) -> dict:
    """ANALYZE: table statistics in ONE streaming pass over the lake —
    row count, total content bytes, per-column null counts, and an
    HLL-approximate distinct count per requested column (±1.04/√2^p).

    Scale shape: each batch emits ONE partial row (counts + kilobyte HLL
    register blobs); the driver folds one small row per batch, never
    data. Returns {"rows", "content_bytes", "columns": {col: {"nulls",
    "ndv"?}}} — the planning/observability input (skew checks, join-side
    sizing, retention audits)."""
    import pyarrow.compute as pc

    from thor_ray.ops.sketch import _hll_estimate, _hll_registers
    from thor_ray.stages.smt import stable_hash

    ds = read_lake(lake_dir)
    names = [n for n in ds.schema().names]
    unknown = [c for c in ndv_cols if c not in names]
    if unknown:
        raise ValueError(f"lake_stats: ndv columns not in lake schema: "
                         f"{unknown} (have {names})")
    nd = list(ndv_cols)

    def partial(t: pa.Table) -> pa.Table:
        row: dict = {
            "_n": pa.array([len(t)], type=pa.int64()),
            "_bytes": pa.array([int(pc.sum(pc.binary_length(
                t["content"])).as_py() or 0)], type=pa.int64()),
        }
        for c in names:
            row[f"nulls_{c}"] = pa.array([t[c].null_count], type=pa.int64())
        for c in nd:
            arr = t[c].combine_chunks().drop_null()  # NDV excludes nulls
            st = pa.table({c: pc.cast(arr, pa.string())})
            h = stable_hash(st, [c]).astype(np.uint64)
            row[f"hll_{c}"] = pa.array([_hll_registers(h, precision).tobytes()],
                                       type=pa.binary())
        return pa.table(row)

    rows = 0
    nbytes = 0
    nulls = {c: 0 for c in names}
    regs = {c: np.zeros(1 << precision, dtype=np.int8) for c in nd}
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        rows += int(pc.sum(batch["_n"]).as_py() or 0)
        nbytes += int(pc.sum(batch["_bytes"]).as_py() or 0)
        for c in names:
            nulls[c] += int(pc.sum(batch[f"nulls_{c}"]).as_py() or 0)
        for c in nd:
            for blob in batch[f"hll_{c}"].to_pylist():
                regs[c] = np.maximum(regs[c],
                                     np.frombuffer(blob, dtype=np.int8))
    cols = {c: {"nulls": nulls[c]} for c in names}
    for c in nd:
        cols[c]["ndv"] = int(round(_hll_estimate(regs[c])))
    return {"rows": rows, "content_bytes": nbytes, "columns": cols}


def _run_epoch_of(path: str) -> int:
    """Epoch tag of a state-run file name (state-eNNNNNN.parquet)."""
    return int(os.path.basename(path)[7:13])


def _epoch_run_files(parts: list[str], epoch: int) -> list[tuple[int, str]]:
    """The level-0 delta run files of one committed epoch, as
    (partition_id, path) pairs — the unit of changefeed delivery.
    Raises if any partition's run is missing (not delta mode) or is a
    compaction product (the epoch was folded; its change rows are gone)."""
    files = []
    for d in parts:
        p = os.path.join(d, f"state-e{epoch:06d}.parquet")
        if not os.path.exists(p):
            raise ValueError(
                f"epoch {epoch}: delta run missing under {d} (compacted "
                "away, or lake not in write_mode='delta'); use "
                "snapshot_diff for folded history")
        meta = pq.read_schema(p).metadata or {}
        if meta.get(b"thor_kind") != b"delta":
            raise ValueError(
                f"epoch {epoch}: {p} is a compaction product (full state, "
                "not changes) — a DDL or compaction folded this epoch")
        files.append((int(os.path.basename(d).split("=", 1)[1]), p))
    return files


def _epoch_full_runs(parts: list[str], epoch: int) -> list[tuple[int, str]]:
    """The FULL-state run files of one epoch (a compaction product or the
    epoch-0 bootstrap), as (partition_id, path) pairs — the rebase target
    when a replica's incremental pull hits a folded epoch."""
    files = []
    for d in parts:
        p = os.path.join(d, f"state-e{epoch:06d}.parquet")
        if not os.path.exists(p):
            raise ValueError(f"epoch {epoch}: no run under {d}")
        meta = pq.read_schema(p).metadata or {}
        if meta.get(b"thor_kind") == b"delta":
            raise ValueError(f"epoch {epoch}: {p} is a delta run, not a "
                             "full-state compaction product")
        files.append((int(os.path.basename(d).split("=", 1)[1]), p))
    return files


def read_changefeed(lake_dir: str, after_epoch: int,
                    upto_epoch: int | None = None) -> "ray.data.Dataset":
    """CDC-out: the per-epoch change rows — I/U winners and D tombstones,
    exactly what the apply folded — for epochs in (after_epoch,
    upto_epoch], read STRAIGHT from the delta-mode LSM run files.
    Partition-aligned, no shuffle, nothing recomputed: a downstream
    consumer tails the lake like a log (Debezium-outbox shape), folding
    rows last-lsn-wins per key reproduces the lake state over that range.

    Requires ``write_mode='delta'`` and the runs to still be level-0: a
    compaction (forced by a DDL epoch, compact_every, or compact()) folds
    change rows into a full-state file, and a range touching one raises —
    use snapshot_diff (retained snapshots) for further-back history.
    Output columns: key + payload + ``op`` ('I'/'U'/'D'), ``lsn``,
    ``epoch``."""
    import glob as _glob

    from thor_ray.state import load_manifests

    ms = load_manifests(lake_dir)
    if not ms:
        raise ValueError(f"no manifests under {lake_dir}")
    cur = min(m.epoch for m in ms.values())
    upto = cur if upto_epoch is None else upto_epoch
    if not after_epoch < upto <= cur:
        raise ValueError(f"bad epoch range ({after_epoch}, {upto}] "
                         f"(lake is at epoch {cur})")
    parts = sorted(_glob.glob(os.path.join(lake_dir, "part=*")))

    per_epoch = []
    for e in range(after_epoch + 1, upto + 1):
        files = [p for _pid, p in _epoch_run_files(parts, e)]
        ee = e

        def tag(t: pa.Table, ee: int = ee) -> pa.Table:
            # "part" is hive-inferred from the part=NNNNN dir names; "_sha"
            # is the audit column — neither is a change-row field
            t = t.drop_columns([c for c in ("_sha", "part")
                                if c in t.column_names])
            t = t.rename_columns(
                [{"_op": "op", "_lsn": "lsn"}.get(c, c)
                 for c in t.column_names])
            return t.append_column(
                "epoch", pa.array(np.full(len(t), ee, dtype=np.int64)))

        per_epoch.append(ray.data.read_parquet(files)
                         .map_batches(tag, batch_format="pyarrow"))
    out = per_epoch[0]
    for d in per_epoch[1:]:
        out = out.union(d)
    return out


def read_changefeed_full(lake_dir: str, after_epoch: int,
                         upto_epoch: int | None = None,
                         columns: list[str] | None = None
                         ) -> "ray.data.Dataset":
    """Before-image changefeed: :func:`read_changefeed` rows PLUS the
    previous image of every changed key — the full Debezium
    ``before/after`` event shape `[K]` (the after-only feed cannot power
    retraction consumers or audit diffs without a consumer-side ledger).

    Output columns: key (``repo``, ``path``), the after-image payload
    (null on deletes, the envelope ``after=null`` contract), one
    ``before_<col>`` per payload column, ``before_lsn`` (the lsn of the
    previous image; NULL means the key did not exist — the insert-vs-
    upsert discriminator), ``op``/``lsn``/``epoch`` as in the plain feed.

    Scale shape: ONE task per lake partition, zero shuffle — delta runs
    are co-partitioned by the key hash, so each task folds its own base
    (files at epochs <= after_epoch, one merge) and walks its tail runs
    in epoch order, joining each epoch's winners against the rolling fold.
    Cost is O(partition state) + O(range changes) per partition, the same
    read the merge-on-read path already pays; nothing is recomputed from
    the binlog. ``columns`` restricts the payload (and its ``before_``
    siblings) to the named subset — the base fold then reads ONLY those
    parquet columns, the pruning that matters when the payload carries
    wide content. Same ``write_mode='delta'``/level-0 contract as
    read_changefeed: a range touching a folded (compacted/DDL) epoch is
    refused loudly, as is an in-progress incremental snapshot (base-image
    chunks still landing make before-images undefined)."""
    from thor_ray.pipelines.cdc import _EVOLVED_TYPES, BASE_COLS
    from thor_ray.state import SchemaRegistry, load_manifests, snapshot_active

    ms = load_manifests(lake_dir)
    if not ms:
        raise ValueError(f"no manifests under {lake_dir}")
    cur = min(m.epoch for m in ms.values())
    upto = cur if upto_epoch is None else upto_epoch
    if not after_epoch < upto <= cur:
        raise ValueError(f"bad epoch range ({after_epoch}, {upto}] "
                         f"(lake is at epoch {cur})")
    if snapshot_active(lake_dir):
        raise ValueError(
            "incremental snapshot in progress: base-image chunks are still "
            "landing, so before-images over this range would be incomplete "
            "— finish the snapshot, then read the feed")

    reg = SchemaRegistry.load(lake_dir)
    evolved = list(reg.columns_at(reg.version))
    types = reg.types_at(reg.version)
    pay_cols = [c for c in BASE_COLS if c not in ("repo", "path")] + evolved
    if columns is not None:
        unknown = sorted(set(columns) - set(pay_cols))
        if unknown:
            raise ValueError(f"columns not in lake payload: {unknown} "
                             f"(have {pay_cols})")
        pay_cols = [c for c in pay_cols if c in set(columns)]
    pay_type = {c: pa.string() for c in BASE_COLS}
    pay_type.update({c: _EVOLVED_TYPES[types.get(c, "string")]
                     for c in evolved})
    out_schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string())]
        + [(c, pay_type[c]) for c in pay_cols]
        + [(f"before_{c}", pay_type[c]) for c in pay_cols]
        + [("before_lsn", pa.int64()), ("op", pa.string()),
           ("lsn", pa.int64()), ("epoch", pa.int64())])
    out_cols = list(out_schema.names)

    rows = []
    for pid, m in sorted(ms.items()):
        st = [f for f in m.files
              if os.path.basename(f).startswith("state-e")]
        base = [f for f in st if _run_epoch_of(f) <= after_epoch]
        tail = sorted((_run_epoch_of(f), f) for f in st
                      if after_epoch < _run_epoch_of(f) <= upto)
        if not base:
            raise ValueError(
                f"partition {pid}: no runs at or before epoch "
                f"{after_epoch} — the range's base was compacted away "
                "(tiered compaction retention); start after the fold point")
        rows.append({"pid": pid, "base": json.dumps(base),
                     "tail": json.dumps(tail)})

    need = ["repo", "path"] + pay_cols + ["_lsn", "_op"]

    def read_pruned(f: str) -> pa.Table:
        # intersect with the file's schema: older base files may predate
        # an evolved column; selecting a missing name would raise
        names = set(pq.read_schema(f).names)
        return pq.read_table(f, columns=[c for c in need if c in names])

    def with_before(b: pd.DataFrame) -> pa.Table:
        outs = []
        for r in b.itertuples(index=False):
            fold = merge_state_frames(
                [read_pruned(f).to_pandas() for f in json.loads(r.base)])
            for c in pay_cols:           # older base may predate a column
                if c not in fold.columns:
                    fold[c] = None
            for e, p in json.loads(r.tail):
                t = read_pruned(p)
                if (t.schema.metadata or {}).get(b"thor_kind") != b"delta":
                    raise ValueError(
                        f"epoch {e}: {p} is a compaction product (full "
                        "state, not changes) — the range touches folded "
                        "history; use snapshot_diff or start later")
                d = t.to_pandas()
                for c in pay_cols:
                    if c not in d.columns:
                        d[c] = None
                prev = fold[["repo", "path"] + pay_cols + ["_lsn"]].rename(
                    columns={**{c: f"before_{c}" for c in pay_cols},
                             "_lsn": "before_lsn"})
                out = d.merge(prev, on=["repo", "path"], how="left")
                dmask = (out["_op"] == "D").to_numpy()
                if dmask.any():          # envelope contract: after=null on D
                    for c in pay_cols:
                        out.loc[dmask, c] = None
                out = out.rename(columns={"_op": "op", "_lsn": "lsn"})
                out["epoch"] = np.int64(e)
                outs.append(out[out_cols])
                fold = merge_state_frames([fold, d])
        if not outs:
            return out_schema.empty_table()
        res = pd.concat(outs, ignore_index=True)
        for c, ty in zip(out_schema.names, out_schema.types):
            if pa.types.is_string(ty):
                res[c] = res[c].astype(object).where(pd.notna(res[c]), None)
        return pa.Table.from_pandas(res, schema=out_schema,
                                    preserve_index=False)

    items = pa.Table.from_pylist(rows)
    return (ray.data.from_arrow(items)
            .repartition(items.num_rows)
            .map_batches(with_before, batch_format="pandas",
                         batch_size=None))


def export_changefeed_envelopes(lake_dir: str, out_dir: str,
                                after_epoch: int = 0,
                                upto_epoch: int | None = None,
                                source_name: str = "lake",
                                with_before: bool = False) -> dict:
    """Kafka-sink-shaped CDC-out: serialize the changefeed range
    ``(after_epoch, upto_epoch]`` into Debezium change-event envelope
    JSONL segments (``stages.envelope.to_change_envelope`` wire shape:
    one ``{"key":…, "value":…}`` record per change row, deletes as
    ``after=null`` + op 'd', lsn/epoch under ``source``).

    ``with_before=True`` reads :func:`read_changefeed_full` instead and
    emits REAL ``before`` images (null only where the key did not exist)
    — the complete Debezium envelope, at the cost of the per-partition
    base fold that feed pays.

    One directory per epoch (``epoch=NNNNNN/``), written to a temp name
    and atomically renamed in — a re-run (crash resume, consumer-group
    re-poll) skips epochs whose final directory exists, the same
    skip-finished-partitions discipline as the parquet sinks. Returns
    ``{"epochs_written", "epochs_skipped"}``. Same delta-mode/level-0
    requirement as :func:`read_changefeed`."""
    from thor_ray.stages import to_change_envelope
    from thor_ray.state import load_manifests

    ms = load_manifests(lake_dir)
    if not ms:
        raise ValueError(f"no manifests under {lake_dir}")
    upto = min(m.epoch for m in ms.values()) if upto_epoch is None \
        else upto_epoch
    os.makedirs(out_dir, exist_ok=True)
    env = to_change_envelope(key_cols=["repo", "path"], op_col="op",
                             source_cols=["lsn", "epoch"],
                             source_name=source_name,
                             before_prefix="before_" if with_before else None)
    reader = read_changefeed_full if with_before else read_changefeed
    written = skipped = 0
    for e in range(after_epoch + 1, upto + 1):
        final = os.path.join(out_dir, f"epoch={e:06d}")
        if os.path.exists(final):
            skipped += 1
            continue
        tmp = final + f".tmp-{os.getpid()}"
        (reader(lake_dir, e - 1, e)
            .map_batches(env, batch_format="pyarrow")
            .write_json(tmp))
        os.replace(tmp, final)
        written += 1
    return {"epochs_written": written, "epochs_skipped": skipped}


class ChangefeedConsumer:
    """Kafka consumer-group shape over the lake changefeed: a named,
    DURABLE offset (last acked epoch) per group, committed atomically
    under ``lake_dir/_consumers/{group}.json``, with poll/commit
    delivery semantics over :func:`read_changefeed`.

    - ``poll()`` returns ``(dataset, upto_epoch)`` for the uncommitted
      range ``(committed, upto]`` — or ``(None, committed)`` when caught
      up. Nothing advances on poll.
    - ``commit(upto)`` atomically advances the group's offset; re-polling
      after a crash that lost an uncommitted batch re-delivers the same
      epochs (at-least-once; consumers that key their work by ``epoch``
      get exactly-once, the same idempotence rule as the lake's own
      manifests).
    - Groups are independent; each owns one offset file.

    Same delta-mode/level-0 requirements as read_changefeed: commit (and
    let gc/compaction fold) only epochs every group has consumed — the
    lag is visible via :meth:`lag`."""

    def __init__(self, lake_dir: str, group: str):
        if not group or "/" in group:
            raise ValueError(f"bad group name {group!r}")
        self.lake_dir = lake_dir
        self.group = group
        self._path = os.path.join(lake_dir, "_consumers", f"{group}.json")

    def committed(self) -> int:
        """Last acked epoch (0 = nothing consumed yet)."""
        if not os.path.exists(self._path):
            return 0
        with open(self._path) as f:
            return int(json.load(f)["epoch"])

    def poll(self, max_epochs: int | None = None):
        """Next uncommitted change rows: ``(Dataset, upto_epoch)``, or
        ``(None, committed)`` when caught up to the lake."""
        from thor_ray.state import load_manifests

        ms = load_manifests(self.lake_dir)
        if not ms:
            raise ValueError(f"no manifests under {self.lake_dir}")
        cur = min(m.epoch for m in ms.values())
        lo = self.committed()
        upto = cur if max_epochs is None else min(cur, lo + max_epochs)
        if upto <= lo:
            return None, lo
        return read_changefeed(self.lake_dir, lo, upto), upto

    def commit(self, upto_epoch: int) -> None:
        """Atomically advance the offset; refuses to move backwards."""
        from thor_ray.state.manifest import _atomic_write  # noqa: SLF001

        cur = self.committed()
        if upto_epoch < cur:
            raise ValueError(
                f"commit({upto_epoch}) behind committed offset {cur}")
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        _atomic_write(self._path, {"group": self.group,
                                   "epoch": int(upto_epoch)})

    def seek(self, epoch: int) -> None:
        """Admin offset reset (`kafka-consumer-groups --reset-offsets`
        analogue): set the group's offset to ANY epoch ≥ 0, including
        BACKWARDS — the group then re-consumes from there (at-least-once
        redelivery is the contract; epoch-idempotent consumers stay
        exactly-once). ``commit`` refuses regression precisely so that
        rewinds are always this explicit admin action."""
        from thor_ray.state.manifest import _atomic_write  # noqa: SLF001

        if epoch < 0:
            raise ValueError(f"seek({epoch}): epoch must be >= 0")
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        _atomic_write(self._path, {"group": self.group,
                                   "epoch": int(epoch)})

    def lag(self) -> int:
        """Epochs behind the lake's committed frontier."""
        from thor_ray.state import load_manifests

        ms = load_manifests(self.lake_dir)
        cur = min(m.epoch for m in ms.values()) if ms else 0
        return max(0, cur - self.committed())


def consumer_groups(lake_dir: str) -> dict[str, int]:
    """All registered consumer groups and their committed epochs."""
    import glob as _glob

    out = {}
    for p in _glob.glob(os.path.join(lake_dir, "_consumers", "*.json")):
        with open(p) as f:
            d = json.load(f)
        out[d["group"]] = int(d["epoch"])
    return out


def replicate_lake(src_lake: str, dst_lake: str, group: str = "default",
                   columns: list[str] | None = None,
                   max_epochs: int | None = None) -> dict:
    """Follower lake (read replica) maintained purely from the primary's
    changefeed — the read-replica / MirrorMaker shape over the lake's own
    CDC-out, so a serving cluster can tail a writer cluster with nothing
    shared but the lake directory.

    The replica is itself a delta-mode lake: the seed is a file-run copy
    of the primary's current manifests (snapshot + tail bootstrap — works
    on freshly-bootstrapped AND partially-compacted primaries), and every
    epoch consumed after that lands as the SAME level-0 run file
    (verbatim byte copy, footers and all — or a key+internal-preserving
    column projection when ``columns`` is given), so ``read_lake``,
    ``lake_lookup``, ``read_changefeed`` and ``ChangefeedConsumer`` all
    work on the replica unchanged — replicas chain.

    Exactly-once end to end: the replica's OWN manifests are the progress
    record (resume reads the slowest partition's epoch — a torn run
    re-delivers the gap), deterministic run-file names make re-delivered
    epochs overwrite-identical, and the manifest swap is the replica's
    commit point — a crash anywhere re-runs idempotently. A consumer-group
    offset on the primary (``replica-{group}``) mirrors the committed
    epoch purely for lag/retention visibility; give each replica its own
    group name. Boundaries self-heal: an incremental pull that meets a
    DDL/compact_upto-folded epoch REBASES onto that epoch's full-state
    compaction product and keeps tailing, and a retention gap (the
    needed runs already gc'd) falls back to a full snapshot re-seed in
    place; an unreadable boundary is reported in ``stopped``.

    Scale shape: one distributed task per (epoch, partition) run file,
    metadata-only discovery, nothing data-sized on the driver. Replica
    manifests carry row_count=-1 / content_hash="" after the seed (the
    live fold is never recomputed here); verify a replica with deep fsck
    on the primary plus ``read_lake`` equality, or compact it.

    Returns ``{"epochs_applied", "upto_epoch", "caught_up", "rows",
    "stopped"}``."""
    import glob as _glob
    import shutil

    from thor_ray.state import SchemaRegistry, load_manifests
    from thor_ray.state.manifest import Manifest, write_manifest

    src_abs = os.path.abspath(src_lake)
    src_ms = load_manifests(src_lake)
    if not src_ms:
        raise ValueError(f"no manifests under {src_lake}")
    cur = min(m.epoch for m in src_ms.values())
    consumer = ChangefeedConsumer(src_lake, f"replica-{group}")
    dst_ms = load_manifests(dst_lake) if os.path.isdir(dst_lake) else {}
    # durable identity marker — survives replica-side maintenance
    # (compaction rewrites manifests and their lineage)
    ident_path = os.path.join(dst_lake, "_schema", "replica.json")
    ident, ident_rc = None, 0
    if os.path.exists(ident_path):
        with open(ident_path) as f:
            _doc = json.load(f)
        ident = _doc.get("replica_of")
        ident_rc = _doc.get("src_restores", 0)
    if dst_ms and ident != src_abs:
        raise ValueError(
            f"{dst_lake} is not a replica of {src_abs} "
            f"(identity says {ident!r})")
    # restore self-heal: a point-in-time restore rewrote primary epochs,
    # so every replica run past the restore point is stale — fall back
    # to a full snapshot re-seed in place (the retention-gap path)
    from thor_ray.state import restore_count
    src_rc = restore_count(src_lake)
    restored_since = bool(dst_ms) and ident_rc != src_rc
    # the replica's own slowest partition is the resume point — a torn
    # apply (some manifests swapped, some not) re-delivers the gap
    lo = min((m.epoch for m in dst_ms.values()), default=0)
    upto_target = cur if max_epochs is None else min(cur, lo + max_epochs)
    parts = sorted(_glob.glob(os.path.join(src_lake, "part=*")))

    work: list[tuple[int, int, str]] = []   # (epoch, pid, src_path)
    seeding = not dst_ms or restored_since
    stopped = None
    rebase = None
    if not seeding:
        epochs_ok = lo
        for e in range(lo + 1, upto_target + 1):
            try:
                run = _epoch_run_files(parts, e)
            except ValueError as err:
                if "compaction product" in str(err):
                    # a DDL (or compact_upto at e) folded this epoch: the
                    # full-state product IS the state through e — rebase
                    # the replica onto it and keep tailing
                    try:
                        run = _epoch_full_runs(parts, e)
                    except ValueError as err2:
                        stopped = f"{err}; rebase probe failed: {err2}"
                        break
                    rebase = e
                    work = [(e, pid, p) for pid, p in run]
                    epochs_ok = e
                    continue
                if e == lo + 1 and "missing" in str(err):
                    # retention gap: the runs this replica still needed
                    # were gc'd (compact_upto past its offset) — fall back
                    # to a full snapshot re-seed in place
                    seeding = True
                    break
                stopped = str(err)
                break
            work.extend((e, pid, p) for pid, p in run)
            epochs_ok = e
    if seeding:
        # snapshot + tail bootstrap: copy the primary's CURRENT file runs
        # verbatim (works even after partial compaction folded early
        # epochs away); manifests are mirrored below, tailing starts at
        # the primary's committed frontier
        stopped = None
        work = [(_run_epoch_of(f), pid, f)
                for pid, m in src_ms.items() for f in m.files]
        epochs_ok = cur
    if not work:
        return {"epochs_applied": 0, "upto_epoch": lo,
                "caught_up": lo >= cur, "rows": 0, "stopped": stopped}

    keep_cols = None if columns is None else (
        ["repo", "path"] + list(columns) + INTERNAL_COLS)
    dst_abs = os.path.abspath(dst_lake)

    def copy_run(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for e, pid, src in zip(b["epoch"], b["pid"], b["src"]):
            e, pid = int(e), int(pid)
            out_dir = os.path.join(dst_abs, f"part={pid:05d}")
            os.makedirs(out_dir, exist_ok=True)
            from thor_ray.state.storage import storage_for

            dst = os.path.join(out_dir, f"state-e{e:06d}.parquet")

            def stage(tmp: str, src=src) -> None:
                if keep_cols is None:
                    shutil.copyfile(src, tmp)
                else:
                    t = pq.read_table(src)
                    t = t.select([c for c in t.column_names
                                  if c in keep_cols])
                    t = t.replace_schema_metadata(
                        pq.read_schema(src).metadata)
                    pq.write_table(t, tmp)

            storage_for(dst).put_atomic(dst, stage)
            import pyarrow.compute as _pc
            lsn = pq.read_table(src, columns=["_lsn"])["_lsn"]
            n = len(lsn)
            max_lsn = int(_pc.max(lsn).as_py() or 0) if n else 0
            rows.append({"epoch": e, "pid": pid, "dst": dst, "rows": n,
                         "max_lsn": max_lsn})
        return pd.DataFrame(rows)

    items = pa.table({
        "epoch": pa.array([e for e, _, _ in work], pa.int64()),
        "pid": pa.array([p for _, p, _ in work], pa.int64()),
        "src": pa.array([s for _, _, s in work], pa.string()),
    })
    stats = (ray.data.from_arrow(items)
             .repartition(min(len(work), 128))
             .map_batches(copy_run, batch_format="pandas", batch_size=None)
             .to_pandas())   # one row per copied run file — metadata-sized

    reg = SchemaRegistry.load(src_lake)
    reg.save(dst_lake)
    if ident is None or ident_rc != src_rc:
        from thor_ray.state.manifest import _atomic_write  # noqa: SLF001
        _atomic_write(ident_path, {"replica_of": src_abs,
                                   "src_restores": src_rc})
    eng = os.path.join(src_lake, "_schema", "engine.json")
    if os.path.exists(eng):   # routing identity: lookups hash identically
        from thor_ray.state.storage import storage_for

        dst = os.path.join(dst_lake, "_schema", "engine.json")
        with open(eng, "rb") as f:
            storage_for(dst).put_bytes(dst, f.read())
    lin = {"replica_of": src_abs, "group": group}
    stale: list[str] = []
    if seeding:
        # mirror the primary's manifests verbatim (row_count/content_hash
        # stay valid: the replica holds the exact same file runs, and the
        # fingerprint is over the always-kept _sha column even when
        # payload columns are projected away)
        new_by_pid = {}
        for pid, m in src_ms.items():
            files = [os.path.join(dst_abs, f"part={pid:05d}",
                                  os.path.basename(f)) for f in m.files]
            new_by_pid[pid] = set(files)
            write_manifest(dst_lake, Manifest(
                pid, m.epoch, m.upto_lsn, m.schema_ver, files,
                m.row_count, m.content_hash, lin))
        stale = [f for pid, m in dst_ms.items()
                 for f in m.files if f not in new_by_pid.get(pid, set())]
    else:
        for pid, grp in stats.groupby("pid"):
            pid = int(pid)
            grp = grp.sort_values("epoch")
            old = dst_ms[pid]
            if rebase is not None:
                files = list(grp["dst"])   # rebase product + later deltas
                stale += [f for f in old.files if f not in set(files)]
            else:
                files = list(old.files)
                known = set(files)
                files += [f for f in grp["dst"] if f not in known]
            up = max(int(grp["max_lsn"].max()), old.upto_lsn)
            write_manifest(dst_lake, Manifest(
                pid, max(epochs_ok, old.epoch), up,
                sum(1 for en in reg.entries if en["lsn"] <= up), files,
                -1, "", lin))
    for f in stale:   # superseded runs; crash before this leaves legal
        try:          # orphans that the next rebase/re-seed removes
            os.remove(f)
        except OSError:
            pass
    if epochs_ok > consumer.committed():
        consumer.commit(epochs_ok)   # lag/retention telemetry on the src
    return {"epochs_applied": epochs_ok - lo, "upto_epoch": epochs_ok,
            "caught_up": epochs_ok >= cur, "rows": int(stats["rows"].sum()),
            "stopped": stopped}


def compact_lake(lake_dir: str, update_mode: str = "full") -> int:
    """Standalone LSM compaction for a lake with no pipeline attached —
    the replica maintenance command. A long-lived replica accumulates one
    level-0 run per consumed epoch per partition; this folds each
    multi-file partition into a single state file (same distributed
    fold, atomic manifest swap, watermark/epoch-preserving semantics as
    ``CdcPipeline.compact``) and restores manifest row_count/content_hash,
    so a compacted replica deep-fscks clean. Replication resumes on top
    (new runs stack on the compacted file), but the folded epochs leave
    the replica's OWN changefeed — compact a replica only when its
    downstream (chained) replicas are caught up, the same retention rule
    as the primary. ``update_mode`` must match the primary's
    (patch-image primaries fold per-column). Returns partitions
    compacted."""
    from thor_ray.pipelines import CdcConfig, CdcPipeline
    from thor_ray.state import load_manifests

    ms = load_manifests(lake_dir)
    if not ms:
        raise ValueError(f"no manifests under {lake_dir}")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake_dir,
        binlog_dir=os.path.join(lake_dir, "_no_binlog"),
        num_partitions=len(ms), write_mode="delta",
        update_mode=update_mode))
    return pipe.compact()


def compact_upto(lake_dir: str, upto_epoch: int, force: bool = False) -> int:
    """Partial (tiered) compaction: fold each partition's level-0 runs of
    epochs ≤ ``upto_epoch`` into ONE base file while KEEPING later runs
    level-0 — bounds merge-on-read amplification on a long-lived lake
    without destroying the tail changefeed, the Kafka-retention analogue
    for the lake's CDC-out. ``read_changefeed``/consumers/replicas keep
    working for epochs > upto_epoch; ranges at or below it are refused by
    the existing kind markers (fold only what every consumer group has
    committed — the guard below enforces that unless ``force``).

    Crash-safe without coordination: the folded file overwrites the
    ``upto_epoch`` run under its deterministic name via os.replace, and
    until the manifest swaps, merging the OLD file list with the folded
    file in place is value-identical (every key's winner is preserved; a
    dropped tombstone's delta row still outranks the base). Unreferenced
    pre-fold runs are gc'd afterwards (time-travel archives keep
    protecting theirs). Acquires the writer generation — a concurrently
    running pipeline writer is fenced out, the same fail-closed rule as
    every maintenance command. One distributed fold task per partition.
    Returns partitions folded."""
    from thor_ray.pipelines.cdc import (BASE_COLS, _content_hash,
                                        _read_state, _write_state_file)
    from thor_ray.state import SchemaRegistry, load_manifests, snapshot_active
    from thor_ray.state.manifest import (Manifest, acquire_writer_gen,
                                         gc_lake, write_manifest)

    ms = load_manifests(lake_dir)
    if not ms:
        raise ValueError(f"no manifests under {lake_dir}")
    cur = min(m.epoch for m in ms.values())
    if not 0 <= upto_epoch <= cur:
        raise ValueError(f"upto_epoch {upto_epoch} outside [0, {cur}]")
    behind = {g: off for g, off in consumer_groups(lake_dir).items()
              if off < upto_epoch}
    if behind and not force:
        raise ValueError(
            f"consumer groups behind upto_epoch={upto_epoch}: {behind} — "
            "their unread changefeed would be folded away; commit them "
            "forward or pass force=True")
    todo = {}
    for pid, m in ms.items():
        olds = [f for f in m.files if _run_epoch_of(f) <= upto_epoch]
        if len(olds) > 1:
            todo[pid] = (olds,
                         [f for f in m.files
                          if _run_epoch_of(f) > upto_epoch])
    if not todo:
        return 0
    acquire_writer_gen(lake_dir)   # fence out a live writer (admin op)
    retain = snapshot_active(lake_dir)
    reg = SchemaRegistry.load(lake_dir)
    types = reg.types_at(reg.version)
    lake_abs = os.path.abspath(lake_dir)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid in b["pid"]:
            pid = int(pid)
            olds, tails = todo[pid]
            df = _read_state(olds, keep_tombstones=True)
            if not retain:
                df = df[df["_op"] != "D"].assign(_op="U")
            df = df.sort_values(["repo", "path"], kind="stable")
            evolved = [c for c in df.columns
                       if c not in BASE_COLS
                       and c not in ("_lsn", "_sha", "_op")]
            path = os.path.join(lake_abs, f"part={pid:05d}",
                                f"state-e{upto_epoch:06d}.parquet")
            _write_state_file(df, path, evolved,
                              {c: types.get(c, "string") for c in evolved},
                              kind="full")
            live = df.loc[df["_op"] != "D", "_sha"] if retain else df["_sha"]
            rows.append({"pid": pid, "base": path,
                         "rows": len(df),
                         "chash": _content_hash(live) if len(df) else ""})
        return pd.DataFrame(rows)

    pids = pa.table({"pid": pa.array(sorted(todo), pa.int64())})
    out = (ray.data.from_arrow(pids)
           .repartition(min(len(todo), 64))
           .map_batches(fold, batch_format="pandas", batch_size=None)
           .to_pandas())
    for r in out.itertuples(index=False):
        m = ms[int(r.pid)]
        tails = todo[int(r.pid)][1]
        write_manifest(lake_dir, Manifest(
            m.partition_id, m.epoch, m.upto_lsn, m.schema_ver,
            [r.base] + tails,
            int(r.rows) if not tails else -1,
            str(r.chash) if not tails else "",
            m.lineage))
    gc_lake(lake_dir, load_manifests(lake_dir))
    return len(out)


def fsck(lake_dir: str, deep: bool = False) -> dict:
    """Lake consistency check (the maintenance command run before trusting
    a restored/migrated lake).

    Shallow (metadata-only, no data read): every manifest-referenced file
    exists with a readable parquet footer; single-file (compacted)
    partitions' footer row counts match the manifest; schema versions are
    within the registry; unreferenced data files are listed as warnings
    (crash leftovers are LEGAL — deterministic names mean replay
    overwrites them; gc removes the strictly-older ones).

    Deep: additionally folds every partition (merge-on-read, one
    DISTRIBUTED task per partition) and recomputes live row count and the
    XOR content fingerprint against the manifest.

    Returns {"ok", "partitions", "files", "errors", "warnings"}."""
    import glob as _glob

    from thor_ray.state import SchemaRegistry, load_manifests
    from thor_ray.state.manifest import _history_dir  # noqa: SLF001

    errors: list[str] = []
    warnings: list[str] = []
    ms = load_manifests(lake_dir)
    if not ms:
        return {"ok": False, "partitions": 0, "files": 0,
                "errors": [f"no manifests under {lake_dir}"],
                "warnings": []}
    try:
        reg = SchemaRegistry.load(lake_dir)
        reg_ver = reg.version
    except Exception as e:  # noqa: BLE001
        errors.append(f"schema registry unreadable: {e}")
        reg_ver = None
    n_files = 0
    for pid, m in sorted(ms.items()):
        if reg_ver is not None and m.schema_ver > reg_ver:
            errors.append(f"part {pid}: schema_ver {m.schema_ver} beyond "
                          f"registry version {reg_ver}")
        rows_meta = 0
        for f in m.files:
            n_files += 1
            if not os.path.exists(f):
                errors.append(f"part {pid}: missing file {f}")
                continue
            try:
                rows_meta += pq.read_metadata(f).num_rows
            except Exception as e:  # noqa: BLE001
                errors.append(f"part {pid}: unreadable footer {f}: {e}")
        if len(m.files) == 1 and m.row_count >= 0 and not errors:
            if rows_meta != m.row_count:
                errors.append(
                    f"part {pid}: footer rows {rows_meta} != manifest "
                    f"row_count {m.row_count}")
    # orphans: data files referenced by neither live manifests nor
    # retained snapshot archives
    live = {os.path.abspath(f) for m in ms.values() for f in m.files}
    if os.path.isdir(_history_dir(lake_dir)):
        for p in _glob.glob(os.path.join(_history_dir(lake_dir),
                                         "part-*-e*.json")):
            with open(p) as fh:
                payload = json.load(fh)
            paths = [os.path.abspath(f if os.path.isabs(f)
                                     else os.path.join(lake_dir, f))
                     for f in payload["files"]]
            live |= set(paths)
            # time-travel promise: every archive still resolves to files
            # on disk (gc must have protected them)
            for f in paths:
                if not os.path.exists(f):
                    errors.append(f"archive {os.path.basename(p)}: "
                                  f"missing snapshot file {f}")
    for p in _glob.glob(os.path.join(lake_dir, "part=*", "*.parquet")):
        if os.path.abspath(p) not in live:
            warnings.append(f"orphan (legal crash leftover): {p}")
    # savepoint tags: each must resolve through retained archives for
    # every committed partition (prune/gc honor tags; a dangling tag
    # means out-of-band deletion)
    from thor_ray.state import list_tags, load_manifests_at
    for name, te in sorted(list_tags(lake_dir).items()):
        missing = sorted(set(ms) - set(load_manifests_at(lake_dir, te)))
        if missing:
            errors.append(f"tag {name!r}@e{te}: unresolvable for "
                          f"partitions {missing}")

    from thor_ray.state import snapshot_active
    if deep and snapshot_active(lake_dir):
        # manifests count retained tombstone rows while an incremental
        # snapshot is in progress; the live-row fold would spuriously
        # mismatch — run deep fsck after the snapshot finalizes
        warnings.append("incremental snapshot in progress: deep "
                        "row-count/fingerprint checks skipped")
        deep = False
    if deep and not errors:
        from thor_ray.pipelines.cdc import _content_hash

        man = {pid: {"files": m.files, "row_count": m.row_count,
                     "content_hash": m.content_hash}
               for pid, m in ms.items()}

        def check(b: pd.DataFrame) -> pd.DataFrame:
            errs = []
            for pid in b["pid"]:
                mm = man[int(pid)]
                df = read_partition_state(mm["files"])
                if mm["row_count"] >= 0 and len(df) != mm["row_count"]:
                    errs.append(f"part {pid}: folded rows {len(df)} != "
                                f"manifest {mm['row_count']}")
                if mm["content_hash"]:
                    got = _content_hash(df["_sha"])
                    if got != mm["content_hash"]:
                        errs.append(f"part {pid}: content fingerprint "
                                    f"mismatch")
            return pd.DataFrame({"err": pd.Series(errs, dtype="object")})

        pids = pa.table({"pid": pa.array(sorted(ms), pa.int64())})
        out = (ray.data.from_arrow(pids)
               .repartition(min(len(ms), 64))
               .map_batches(check, batch_format="pandas")
               .to_pandas())
        if len(out) and "err" in out.columns:
            errors.extend(out["err"].tolist())

    return {"ok": not errors, "partitions": len(ms), "files": n_files,
            "errors": errors, "warnings": warnings}
