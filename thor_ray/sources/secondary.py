"""Incremental secondary index over a lake column — the serving-path
companion to the primary (repo, path) key layout.

The lake is physically partitioned by ``stable_hash(repo, path) % P``, so
a predicate on any OTHER column (``lang == 'go'``) must scan every
partition's payload. ``SecondaryIndex`` maintains an LSM-style value
index, partition-aligned with the lake (maintenance never shuffles):

    index_dir/part=NNNNN/idx-e{EPOCH}.parquet
        base  (footer thor_idx_kind=b"base")  — all live (key, val, _lsn)
                                                at the anchor epoch
        delta (footer thor_idx_kind=b"delta") — one epoch's change rows
                                                projected to (key, val,
                                                _op, _lsn); deletes keep
                                                the key with val = null
    index_dir/_index_manifest.json             commit point (swap-last)

Each index file embeds TWO footer blooms (state/bloom.py): ``thor_bloom``
over the key hash (the lake's pinned routing hash) and ``thor_idx_vbloom``
over the stringified indexed value. A probe runs in two bloom-pruned,
narrow-column stages per partition:

  A. candidate keys = rows with ``val == probe`` in any value-bloom-passing
     file (a superset: a stale row survives here when the key's value later
     changed — its superseding row may live in a file the value bloom
     skipped);
  B. verify = fold last-lsn-wins over the key-bloom-passing files for the
     candidate keys only, keep keys whose FINAL image is live with
     ``val == probe``.

Both stages read only (repo, path, val, _op, _lsn) — never ``content`` —
so a probe's I/O is bloom-pruned index metadata, not the corpus.

Scale shape: maintenance is one task per partition per advance (the same
zero-shuffle contract as pipelines/ivm.py — delta runs and index runs are
co-partitioned by the lake's key hash); ``probe`` is one Ray task per
partition over answer-sized narrow frames; ``compact()`` bounds
merge-on-read fan-in exactly like the lake's own compaction.

Exactly-once: run files have deterministic epoch-stamped names (a retried
or re-run ``advance`` overwrites byte-identical files), and the JSON
manifest is swapped last — the IVM commit protocol (pipelines/ivm.py).

Same level-0 contract as sources.lake.read_changefeed: the lake must be
``write_mode='delta'`` and the advanced range uncompacted; after a
compaction or a DDL that folded the runs (or renamed/dropped the indexed
column), call ``rebuild()`` to re-anchor at the live state.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

_MANIFEST = "_index_manifest.json"
_KEY = ["repo", "path"]
_IDX_COLS = ["repo", "path", "val", "_op", "_lsn"]


def _atomic_json(path: str, payload: dict) -> None:
    from thor_ray.state.storage import storage_for

    storage_for(path).put_bytes(path, json.dumps(payload).encode())


def _val_hash(vals: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Hash of the stringified value column (bloom-build side and probe
    side must agree byte-for-byte; stringification pins int/str values —
    the supported index types — to one representation)."""
    from thor_ray.stages.smt import stable_hash
    s = pa.table({"v": vals.cast(pa.string())})
    return stable_hash(s, ["v"])


def _hash_impl() -> str:
    from thor_ray.pipelines.cdc import _hash_impl as hi
    return hi()


def _write_idx_file(df: pd.DataFrame, final_path: str, kind: str) -> None:
    """Narrow index run, sorted by val; key bloom + value bloom in the
    footer. Deterministic name + tmp/replace = idempotent on retry."""
    from thor_ray.state import bloom as _bloom
    from thor_ray.stages.smt import stable_hash

    df = df.sort_values(["val", "repo", "path"], kind="stable")
    tbl = pa.Table.from_pandas(df[_IDX_COLS], preserve_index=False)
    tbl = tbl.set_column(tbl.schema.get_field_index("val"),
                         "val", tbl["val"].cast(pa.string()))
    impl = _hash_impl()
    kh = stable_hash(pa.table({
        "repo": pa.array(df["repo"], pa.string()),
        "path": pa.array(df["path"], pa.string())}), _KEY)
    vals = tbl["val"].combine_chunks()
    vh = _val_hash(vals.drop_null()) if vals.null_count < len(vals) \
        else np.empty(0, dtype=np.int64)
    tbl = tbl.replace_schema_metadata({
        b"thor_idx_kind": kind.encode(),
        b"thor_bloom": _bloom.encode_footer(_bloom.build(kh, impl=impl)),
        b"thor_idx_vbloom": _bloom.encode_footer(_bloom.build(vh, impl=impl)),
    })
    from thor_ray.state.storage import storage_for

    storage_for(final_path).put_atomic(
        final_path, lambda tmp: pq.write_table(tbl, tmp))


def _fold(frames: list[pd.DataFrame]) -> pd.DataFrame:
    """Last-lsn-wins per key over index rows (tombstones retained — the
    caller filters)."""
    df = pd.concat(frames, ignore_index=True)
    df = df.sort_values("_lsn", kind="stable")
    return df.drop_duplicates(_KEY, keep="last")


def _part_files(part_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(part_dir, "idx-e*.parquet")))


def _vbloom_pass(files: list[str], vh: np.ndarray, impl: str,
                 stats: dict | None) -> list[str]:
    from thor_ray.state import bloom as _bloom
    keep = []
    for f in files:
        md = pq.read_schema(f).metadata or {}
        raw = md.get(b"thor_idx_vbloom")
        if raw is None or _bloom.might_contain(
                _bloom.decode_footer(raw), vh, impl).any():
            keep.append(f)
    if stats is not None:
        stats["files_total"] = stats.get("files_total", 0) + len(files)
        stats["files_stage_a"] = stats.get("files_stage_a", 0) + len(keep)
    return keep


def _probe_partition(part_dir: str, value: str, vh: np.ndarray,
                     impl: str, stats: dict | None) -> pd.DataFrame:
    """Two-stage bloom-pruned probe of one partition (module docstring)."""
    from thor_ray.sources.lake import _bloom_prune
    from thor_ray.stages.smt import stable_hash

    empty = pd.DataFrame({"repo": pd.Series(dtype=object),
                          "path": pd.Series(dtype=object)})
    files = _part_files(part_dir)
    cand_files = _vbloom_pass(files, vh, impl, stats)
    if not cand_files:
        return empty
    sval = str(value)
    cands = []
    for f in cand_files:
        t = pq.read_table(f, columns=_IDX_COLS).to_pandas()
        cands.append(t[t["val"] == sval])
    cand_keys = pd.concat(cands, ignore_index=True) \
        .drop_duplicates(_KEY)[_KEY]
    if cand_keys.empty:
        return empty
    kh = stable_hash(pa.table({
        "repo": pa.array(cand_keys["repo"], pa.string()),
        "path": pa.array(cand_keys["path"], pa.string())}), _KEY)
    verify_files = _bloom_prune(files, kh, stats)
    folded = _fold([pq.read_table(f, columns=_IDX_COLS).to_pandas()
                    .merge(cand_keys, on=_KEY) for f in verify_files])
    live = folded[(folded["_op"] != "D") & (folded["val"] == sval)]
    return live[_KEY].reset_index(drop=True)


_SEP = "\x1f"


def _composite_val(df: pd.DataFrame, cols: list[str]) -> pd.Series:
    """One index value per row: the column value itself for a single-col
    index, the \\x1f-joined stringification for a composite — any NULL
    component nulls the whole value (SQL semantics: NULL matches no
    probe; the key still reaches the key bloom via _op/_lsn rows)."""
    if len(cols) == 1:
        return df[cols[0]]
    mask = pd.Series(False, index=df.index)
    parts = []
    for c in cols:
        s = df[c]
        mask |= s.isna()
        parts.append(s.astype(str))    # null slots masked out below
    joined = parts[0]
    for p in parts[1:]:
        joined = joined + _SEP + p
    return joined.where(~mask, None)


def _probe_str(value) -> str:
    if isinstance(value, (tuple, list)):
        return _SEP.join(str(v) for v in value)
    return str(value)


class SecondaryIndex:
    """LSM value index on one or more lake columns (module docstring).
    ``col`` may be a single column name or a list (composite index —
    probe with a tuple of the same arity)."""

    def __init__(self, lake_dir: str, index_dir: str,
                 col: "str | list[str]"):
        self.lake_dir, self.index_dir = lake_dir, index_dir
        self.cols = [col] if isinstance(col, str) else list(col)
        self.col = self.cols[0] if len(self.cols) == 1 \
            else _SEP.join(self.cols)
        os.makedirs(index_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest(self) -> dict | None:
        p = os.path.join(self.index_dir, _MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            m = json.load(f)
        if m["col"] != self.col:
            raise ValueError(f"index at {self.index_dir} is on column "
                             f"{m['col']!r}, not {self.col!r}")
        return m

    def _commit(self, epoch: int, anchor: int, P: int) -> None:
        from thor_ray.state import restore_count

        _atomic_json(os.path.join(self.index_dir, _MANIFEST),
                     {"col": self.col, "epoch": epoch, "anchor": anchor,
                      "num_partitions": P, "hash_impl": _hash_impl(),
                      "lake_restores": restore_count(self.lake_dir)})

    def _check_restores(self, m: dict) -> None:
        """A point-in-time restore rewrites lake epochs — runs this index
        folded before it are stale; fail loudly (restore fencing)."""
        from thor_ray.state import restore_count

        rc = restore_count(self.lake_dir)
        if m.get("lake_restores", 0) != rc:
            raise ValueError(
                f"lake {self.lake_dir} was point-in-time restored "
                f"(restore #{rc}) after this index last advanced — its "
                "runs are stale; delete the index dir and build() again")

    def epoch(self) -> int:
        m = self._manifest()
        return -1 if m is None else m["epoch"]

    def _lake_state(self) -> tuple[dict, int]:
        from thor_ray.state import load_manifests
        ms = load_manifests(self.lake_dir)
        if not ms:
            raise ValueError(f"no manifests under {self.lake_dir}")
        return ms, min(m.epoch for m in ms.values())

    # -- maintenance -------------------------------------------------------
    def build(self) -> "SecondaryIndex":
        """Anchor the index at the lake's CURRENT state: one task per
        partition folds the partition's live rows (merge-on-read over its
        manifest file run) and writes the narrow base run."""
        ms, cur = self._lake_state()
        cols, idx_dir = self.cols, self.index_dir

        def base_task(b: pd.DataFrame) -> pd.DataFrame:
            from thor_ray.sources.lake import read_partition_state
            out = []
            for _, r in b.iterrows():
                pid, files = int(r["pid"]), list(r["files"])
                st = read_partition_state(files)
                pdir = os.path.join(idx_dir, f"part={pid:05d}")
                os.makedirs(pdir, exist_ok=True)
                for c in cols:
                    if c not in st.columns:
                        raise ValueError(f"column {c!r} not in lake state "
                                         f"(renamed/dropped by DDL?)")
                d = pd.DataFrame({
                    "repo": st["repo"], "path": st["path"],
                    "val": _composite_val(st, cols), "_op": "U",
                    "_lsn": st["_lsn"].astype("int64")
                    if "_lsn" in st.columns
                    else np.zeros(len(st), dtype=np.int64)})
                _write_idx_file(
                    d, os.path.join(pdir, f"idx-e{cur:06d}.parquet"), "base")
                out.append(pd.DataFrame({"pid": [pid], "rows": [len(d)]}))
            return pd.concat(out) if out else \
                pd.DataFrame({"pid": pd.Series(dtype=int),
                              "rows": pd.Series(dtype=int)})

        items = [{"pid": pid,
                  "files": [os.path.join(self.lake_dir, f)
                            if not os.path.isabs(f) else f
                            for f in m.files]}
                 for pid, m in sorted(ms.items())]
        ray.data.from_items(items) \
            .map_batches(base_task, batch_size=1, batch_format="pandas") \
            .materialize()
        self._commit(cur, cur, len(ms))
        return self

    def rebuild(self) -> "SecondaryIndex":
        """Re-anchor after a compaction / DDL folded the delta runs: drop
        every run file and build from the live lake."""
        for f in glob.glob(os.path.join(self.index_dir, "part=*",
                                        "idx-e*.parquet")):
            os.remove(f)
        return self.build()

    def advance(self, upto_epoch: int | None = None) -> int:
        """Fold lake epochs (index_epoch, upto] into per-partition delta
        runs — O(changes) I/O, zero shuffle. Returns the new index epoch.
        Builds first when the index is fresh."""
        m = self._manifest()
        if m is None:
            self.build()
            m = self._manifest()
        self._check_restores(m)
        ms, cur = self._lake_state()
        upto = cur if upto_epoch is None else upto_epoch
        e0 = m["epoch"]
        if upto <= e0:
            return e0
        cols, lake_dir, idx_dir = self.cols, self.lake_dir, self.index_dir

        def delta_task(b: pd.DataFrame) -> pd.DataFrame:
            out = []
            for _, r in b.iterrows():
                pid = int(r["pid"])
                part = os.path.join(lake_dir, f"part={pid:05d}")
                pdir = os.path.join(idx_dir, f"part={pid:05d}")
                os.makedirs(pdir, exist_ok=True)
                for e in range(e0 + 1, upto + 1):
                    p = os.path.join(part, f"state-e{e:06d}.parquet")
                    if not os.path.exists(p):
                        continue            # no changes for this pid/epoch
                    meta = pq.read_schema(p).metadata or {}
                    if meta.get(b"thor_kind") != b"delta":
                        raise ValueError(
                            f"epoch {e}: {p} is a compaction product — "
                            "history folded; call rebuild()")
                    sch = pq.read_schema(p)
                    for c in cols:
                        if c not in sch.names:
                            raise ValueError(
                                f"epoch {e}: column {c!r} missing from the "
                                "delta run (DDL rename/drop?) — rebuild()")
                    t = pq.read_table(
                        p, columns=_KEY + cols + ["_op", "_lsn"]).to_pandas()
                    d = t[_KEY + ["_op", "_lsn"]].copy()
                    d["val"] = _composite_val(t, cols)
                    d["_lsn"] = d["_lsn"].astype("int64")
                    _write_idx_file(
                        d[_IDX_COLS],
                        os.path.join(pdir, f"idx-e{e:06d}.parquet"), "delta")
                out.append(pd.DataFrame({"pid": [pid]}))
            return pd.concat(out) if out else \
                pd.DataFrame({"pid": pd.Series(dtype=int)})

        ray.data.from_items([{"pid": pid} for pid in sorted(ms)]) \
            .map_batches(delta_task, batch_size=1, batch_format="pandas") \
            .materialize()
        self._commit(upto, m["anchor"], m["num_partitions"])
        return upto

    def compact(self) -> int:
        """Fold each partition's base + delta runs into ONE new base at
        the indexed epoch (bounds probe merge-on-read fan-in; the lake's
        compact() analogue). Crash-safe: products land via tmp/replace
        under deterministic names before superseded runs are removed."""
        m = self._manifest()
        if m is None:
            raise ValueError("nothing to compact — build() first")
        e = m["epoch"]
        for pdir in sorted(glob.glob(os.path.join(self.index_dir,
                                                  "part=*"))):
            files = _part_files(pdir)
            if not files:
                continue
            folded = _fold([pq.read_table(f, columns=_IDX_COLS).to_pandas()
                            for f in files])
            live = folded[folded["_op"] != "D"]
            _write_idx_file(live, os.path.join(pdir,
                                               f"idx-e{e:06d}.parquet"),
                            "base")
            for f in files:
                if _run_epoch(f) != e:
                    os.remove(f)
        self._commit(e, e, m["num_partitions"])
        return e

    # -- serving -----------------------------------------------------------
    def probe(self, value) -> pd.DataFrame:
        """Distributed probe: one Ray task per partition, two bloom-pruned
        narrow stages each (module docstring). Returns the live (repo,
        path) keys whose indexed value equals ``value`` AS OF the indexed
        epoch, sorted."""
        m = self._manifest()
        if m is None:
            raise ValueError("index not built")
        self._check_restores(m)
        sval = _probe_str(value)
        vh = _val_hash(pa.array([sval], pa.string()))
        impl, idx_dir = m["hash_impl"], self.index_dir
        parts = sorted(glob.glob(os.path.join(idx_dir, "part=*")))
        if not parts:
            return pd.DataFrame({"repo": [], "path": []})

        def task(b: pd.DataFrame) -> pd.DataFrame:
            out = [_probe_partition(d, sval, vh, impl, None)
                   for d in b["part_dir"]]
            return pd.concat(out, ignore_index=True)

        res = ray.data.from_items([{"part_dir": d} for d in parts]) \
            .map_batches(task, batch_size=1, batch_format="pandas") \
            .to_pandas()
        if "repo" not in res.columns:   # all-miss probe: schema-less empty
            return pd.DataFrame({"repo": pd.Series(dtype=object),
                                 "path": pd.Series(dtype=object)})
        return res.sort_values(_KEY).reset_index(drop=True)

    def probe_rows(self, value) -> pd.DataFrame:
        """Full serving path: probe the index for the keys, then fetch
        their current rows via the partition-pruned, key-bloom-skipped
        point-read path (sources.lake.lake_lookup) — index files give the
        keys, the lake gives the payload; neither side is scanned."""
        from thor_ray.sources.lake import lake_lookup
        keys = self.probe(value)
        if keys.empty:
            return keys
        return lake_lookup(self.lake_dir,
                           list(zip(keys["repo"], keys["path"])))

    def probe_local(self, value, stats: dict | None = None) -> pd.DataFrame:
        """Driver-side probe (answer-sized point read, the lake_lookup
        tier) with pruning counters: pass ``stats={}`` to collect
        {files_total (per stage), files_stage_a, files_read}."""
        m = self._manifest()
        if m is None:
            raise ValueError("index not built")
        self._check_restores(m)
        sval = _probe_str(value)
        vh = _val_hash(pa.array([sval], pa.string()))
        outs = [_probe_partition(d, sval, vh, m["hash_impl"], stats)
                for d in sorted(glob.glob(os.path.join(self.index_dir,
                                                       "part=*")))]
        res = pd.concat(outs, ignore_index=True) if outs else \
            pd.DataFrame({"repo": [], "path": []})
        return res.sort_values(_KEY).reset_index(drop=True)


def _run_epoch(path: str) -> int:
    return int(os.path.basename(path)[5:11])
