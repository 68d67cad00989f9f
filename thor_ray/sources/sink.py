"""Resumable partitioned Parquet sink (build brief: "write partitioned
Parquet — one directory per input shard / key range — so a failed run can
skip finished partitions; never one giant file").

Each partition value gets its own directory and a deterministic file name;
writes go to a temp name and `os.replace` in (atomic on POSIX, and the same
commit discipline as the CDC lake manifests), so a partition directory with
its final file present is COMPLETE and a re-run skips it. On a cluster the
out_dir must be shared storage (S3/NFS), same as the lake.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset


def write_partitioned(ds: Dataset, out_dir: str, by: str,
                      overwrite: bool = False,
                      row_group_size: int = 16_384,
                      cluster_by: "list[str] | None" = None) -> pd.DataFrame:
    """Write one `<by>=<value>/data.parquet` per distinct key value; returns
    a per-partition report (value, rows, skipped). Use a COARSE key (date
    bucket, shard id, hash range) — one directory per distinct value; salt
    or bucket a fine key upstream. The groupby is the one wide step; each
    group writes independently, so a re-run after a crash rewrites only the
    partitions whose final file is missing.

    `cluster_by`: sort each partition's rows by these columns before the
    write, so per-row-group min/max statistics become TIGHT on them —
    a later range read prunes whole row groups / files via footer stats
    (`pruned_fragments` / `read_range`) instead of scanning. The sort is
    per-partition-group (inside the task), never a global shuffle."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        if cluster_by:
            g = g.sort_values(list(cluster_by), kind="stable")
        val = g[by].iloc[0]
        if os.sep in str(val) or str(val).startswith(".."):
            # a raw '/' (or '..') in the key value would nest or escape the
            # one-dir-per-value layout; make the caller bucket/encode it
            raise ValueError(
                f"write_partitioned: key value {val!r} contains a path "
                "separator; encode or bucket the key first")
        d = os.path.join(out_dir, f"{by}={val}")
        final = os.path.join(d, "data.parquet")
        if not overwrite and os.path.exists(final):
            return pd.DataFrame([{"value": str(val), "rows": len(g),
                                  "skipped": True}])
        os.makedirs(d, exist_ok=True)
        # durable publish: a final-named file must never hold partial
        # contents after a crash, or resume would skip it forever (the
        # storage interface fsyncs before the swap)
        from thor_ray.state.storage import storage_for

        storage_for(final).put_atomic(
            final, lambda tmp: pq.write_table(
                pa.Table.from_pandas(g, preserve_index=False), tmp,
                row_group_size=row_group_size))
        return pd.DataFrame([{"value": str(val), "rows": len(g),
                              "skipped": False}])

    rep = ds.groupby(by).map_groups(write_group,
                                    batch_format="pandas").to_pandas()
    if rep.empty:
        return pd.DataFrame(columns=["value", "rows", "skipped"])
    return rep.sort_values("value").reset_index(drop=True)


def pruned_fragments(out_dir: str, col: str, lo, hi) -> dict:
    """Zone-map pruning over a write_partitioned layout: which files (and
    how many row groups) can contain rows with `col` in [lo, hi], decided
    from parquet FOOTER statistics only — no data read. Selective when the
    layout was written with cluster_by=[col] (tight per-row-group min/max);
    a fragment with no statistics is conservatively kept."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "*", "data.parquet")))
    keep: list[str] = []
    rg_total = rg_kept = 0
    for p in files:
        md = pq.read_metadata(p)
        idx = md.schema.names.index(col)
        any_keep = False
        for rg in range(md.num_row_groups):
            rg_total += 1
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max or \
                    (st.min <= hi and st.max >= lo):
                rg_kept += 1
                any_keep = True
        if any_keep:
            keep.append(p)
    return {"files": keep, "files_total": len(files),
            "row_groups_kept": rg_kept, "row_groups_total": rg_total}


def read_range(out_dir: str, col: str, lo, hi) -> Dataset:
    """Range read over a write_partitioned layout with file-level zone-map
    pruning on top of Parquet's native row-group pushdown: only files whose
    stats overlap [lo, hi] are even opened, then the filter prunes row
    groups inside them."""
    import glob as _glob

    import pyarrow.compute as pc

    import ray.data

    info = pruned_fragments(out_dir, col, lo, hi)
    files = info["files"]
    if not files:
        all_files = sorted(_glob.glob(os.path.join(out_dir, "*",
                                                   "data.parquet")))
        if not all_files:
            raise FileNotFoundError(f"no partitions under {out_dir}")
        files = all_files[:1]  # schema-typed empty result
    flt = (pc.field(col) >= lo) & (pc.field(col) <= hi)
    return ray.data.read_parquet(files, filter=flt)


def _spread_bits16(x: "np.ndarray") -> "np.ndarray":
    """Interleave-ready bit spread: 16-bit values → even bit positions of
    a 32-bit word (classic Morton magic numbers, fully vectorized)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def add_zorder_key(ds: Dataset, cols: "tuple[str, str]",
                   ranges: "dict[str, tuple[float, float]] | None" = None,
                   out: str = "zval") -> Dataset:
    """Append a Morton (z-order) key interleaving two numeric columns,
    each normalized to 16 bits over its GLOBAL [min, max] (one cheap
    aggregate pass when `ranges` isn't supplied — per-batch normalization
    would break the global curve). Cluster a partitioned write by this
    key (`write_partitioned(..., cluster_by=[out])`) and row-group
    zone-map stats become tight on BOTH columns at once — range reads on
    either column prune, where single-column clustering only serves one."""
    from ray.data.aggregate import Max, Min

    a, b = cols
    if ranges is None:
        agg = ds.aggregate(Min(a), Max(a), Min(b), Max(b))
        ranges = {a: (agg[f"min({a})"], agg[f"max({a})"]),
                  b: (agg[f"min({b})"], agg[f"max({b})"])}

    def fn(t: pa.Table) -> pa.Table:
        out_bits = []
        for c in (a, b):
            lo, hi = ranges[c]
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            span = max(float(hi) - float(lo), 1e-300)
            q = np.clip(((v - float(lo)) / span) * 65535.0, 0, 65535)
            out_bits.append(_spread_bits16(q.astype(np.uint64)))
        z = (out_bits[0] | (out_bits[1] << np.uint64(1))).astype(np.int64)
        return t.append_column(out, pa.array(z, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


class SinkConnector:
    """Kafka-Connect sink-connector analogue over the lake changefeed:
    a named consumer group (durable offset) + an optional SMT
    TransformChain + an exactly-once per-epoch segment sink.

    Wiring: ``advance()`` polls the group's uncommitted epoch range,
    writes each epoch's transformed changefeed to
    ``out_dir/epoch=NNNNNN/`` (temp dir + atomic rename — the same
    skip-finished discipline as the lake manifests and
    export_changefeed_envelopes), then commits the group offset. A crash
    between write and commit re-delivers the epochs; the rename-skip
    makes the end-to-end path exactly-once. Pass ``advance`` to
    ``CdcPipeline.follow(on_apply=[...])`` to keep the sink current with
    the stream.

    The chain runs as a stateless ``map_batches`` stage (Connect's SMT
    contract: pure per-batch record transforms); ``fmt`` picks the wire
    tier ("parquet", "jsonl", or "wire" — e.g. compose
    ``stages.to_change_envelope(...)`` in the chain for Debezium JSONL;
    "wire" additionally frames the chain's envelope ``key``/``value``
    strings into magic|schema-id|payload binary records
    (``stages.wire.encode_wire``, schema id per row from a
    ``schema_ver`` column when the chain carries one) written as a
    binary-column parquet segment). Same delta-mode/level-0 requirement
    as read_changefeed.

    ``on_fold`` is the self-healing policy for epochs whose delta runs a
    DDL epoch or compaction already FOLDED (their change rows are gone):
    "fail" (default) raises — the operator decides; "diff" repairs from
    the retained time-travel snapshots (``snapshot_diff`` between the
    epoch's neighbors, payload included) — per key ONE row with the
    epoch-end state and the last-writer lsn, so folding consumers
    converge to the same state, though intra-epoch intermediate updates
    (folded away at compaction) are not individually replayed. Requires
    ``retain_snapshots`` to cover the sink's lag."""

    def __init__(self, lake_dir: str, out_dir: str, group: str,
                 chain=None, fmt: str = "parquet",
                 max_epochs_per_poll: int | None = None,
                 on_fold: str = "fail"):
        if fmt not in ("parquet", "jsonl", "wire"):
            raise ValueError(f"fmt must be 'parquet', 'jsonl' or 'wire', "
                             f"got {fmt!r}")
        if on_fold not in ("fail", "diff"):
            raise ValueError(f"on_fold must be 'fail' or 'diff', "
                             f"got {on_fold!r}")
        from thor_ray.sources.lake import ChangefeedConsumer

        self.lake_dir, self.out_dir, self.fmt = lake_dir, out_dir, fmt
        self.chain = chain
        self.consumer = ChangefeedConsumer(lake_dir, group)
        self.max_epochs = max_epochs_per_poll
        self.on_fold = on_fold

    def _diff_epoch(self, e: int):
        """Fold repair: change rows for epoch e reconstructed from the
        retained snapshots at e-1 and e (changefeed column shape)."""
        from thor_ray.sources.branch import _diff_manifest_sets
        from thor_ray.state import load_manifests_at

        ms_a = load_manifests_at(self.lake_dir, e - 1)
        ms_b = load_manifests_at(self.lake_dir, e)
        if not ms_a or not ms_b:
            raise ValueError(
                f"epoch {e} was folded and retention does not cover its "
                f"snapshots ({e - 1}: {bool(ms_a)}, {e}: {bool(ms_b)}) — "
                "run the lake with retain_snapshots covering sink lag")

        def shape(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [{"change": "op", "lsn_b": "lsn"}.get(c, c)
                 for c in t.column_names])
            if "lsn_a" in t.column_names:
                t = t.drop_columns(["lsn_a"])
            return t.append_column(
                "epoch", pa.array(np.full(len(t), e, dtype=np.int64)))

        return _diff_manifest_sets(ms_a, ms_b, payload_b=True) \
            .map_batches(shape, batch_format="pyarrow")

    def reset(self, to_epoch: int) -> int:
        """Post-restore repair: the lake rewrote epochs past a
        point-in-time restore, so this sink's already-written segments
        for epochs > ``to_epoch`` are STALE — and the exactly-once
        rename-skip would preserve them forever. Drop them and seek the
        group back so the next advance() re-exports the rewritten feed.
        Returns the number of segment directories removed."""
        import shutil

        removed = 0
        for d in glob.glob(os.path.join(self.out_dir, "epoch=*")):
            try:
                e = int(os.path.basename(d).split("=", 1)[1])
            except ValueError:
                continue
            if e > to_epoch:
                shutil.rmtree(d)
                removed += 1
        self.consumer.seek(min(self.consumer.committed(), to_epoch))
        return removed

    def advance(self) -> dict:
        """Consume every uncommitted epoch: write, then commit. Returns
        ``{"epochs_written", "epochs_skipped", "committed"}``."""
        from thor_ray.sources.lake import read_changefeed
        from thor_ray.state import load_manifests

        lo = self.consumer.committed()
        # the poll bound from manifests directly — poll() would eagerly
        # construct the whole-range changefeed, which raises on folded
        # epochs before the per-epoch on_fold repair can run
        ms = load_manifests(self.lake_dir)
        if not ms:
            raise ValueError(f"no manifests under {self.lake_dir}")
        cur = min(m.epoch for m in ms.values())
        upto = cur if self.max_epochs is None \
            else min(cur, lo + self.max_epochs)
        written = skipped = 0
        os.makedirs(self.out_dir, exist_ok=True)
        for e in range(lo + 1, upto + 1):
            final = os.path.join(self.out_dir, f"epoch={e:06d}")
            if os.path.exists(final):
                skipped += 1
                continue
            try:
                ds = read_changefeed(self.lake_dir, e - 1, e)
            except ValueError:
                if self.on_fold != "diff":
                    raise
                ds = self._diff_epoch(e)
            if self.chain is not None:
                ds = ds.map_batches(self.chain, batch_format="pyarrow")
            if self.fmt == "wire":
                from thor_ray.stages.wire import encode_wire

                def _enc(t: pa.Table) -> pa.Table:
                    enc = encode_wire(
                        schema_ver_col="schema_ver"
                        if "schema_ver" in t.column_names else None)
                    return enc(t)

                ds = ds.map_batches(_enc, batch_format="pyarrow")
            tmp = final + f".tmp-{os.getpid()}"
            os.makedirs(tmp, exist_ok=True)  # empty epochs still commit
            if self.fmt == "jsonl":
                ds.write_json(tmp)
            else:                       # parquet and wire tiers
                ds.write_parquet(tmp)
            os.replace(tmp, final)
            written += 1
        if upto > lo:
            self.consumer.commit(upto)
        return {"epochs_written": written, "epochs_skipped": skipped,
                "committed": upto}
