"""The flagship CDC apply pipeline (SURVEY.md §3.2 lifecycle).

Per epoch, expressed Ray-Data-first:

  TAIL    read_parquet(shards, filter=lsn∈(lo,hi] ∧ op≠DDL)      (pushdown)
  SMT     stateless map_batches chain: DLQ split, routing         (tasks)
  ROUTE   pid = stable_hash(repo,path) % P                        (map_batches)
  SHUFFLE groupby(pid) — the single wide step per epoch
  APPLY   per pid: watermark-drop → lsn-dedup → last-writer-wins
          merge with partition state, DDL applied in lsn order    (map_groups)
  COMMIT  deterministic per-(pid,epoch) state file + atomic
          manifest swap — the only commit point (exactly-once)
  METRICS per-partition lineage + events/s JSON per epoch

Correctness contract: replaying the full binlog reproduces
``thor_ray.oracle.apply_events`` exactly (per-row sha256(content) equality,
BASELINE.json:15), under injected duplicates, bounded out-of-order delivery,
mid-stream DDL, forced checkpoint-restore, and epoch re-runs
(BASELINE.json:6).

Scale notes (SURVEY.md §4.2): the shuffle key is hash(repo,path) % P with
P ≫ workers; DDL events are broadcast driver-side (rare, tiny) instead of
shuffled; per-partition state is read/written inside the apply task from
shared storage, so no actor holds unbounded state and restore is "read the
manifests".
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from thor_ray.sources import binlog as binlog_src
from thor_ray.stages import chain as chain_mod
from thor_ray.stages.smt import stable_hash
from thor_ray.state import (Manifest, SchemaRegistry, archive_manifest,
                            gc_lake, load_manifests, prune_history,
                            read_snapshot_meta, snapshot_active,
                            write_manifest, write_snapshot_meta)
from thor_ray.state.storage import storage_for

BASE_COLS = ["repo", "path", "commit", "lang", "content"]
# event columns the apply path needs — txn/ts/ddl are pruned at the read
APPLY_COLS = ["lsn", "op", "repo", "path", "commit", "lang", "content",
              "extra", "schema_ver", "shard"]


_EVOLVED_TYPES = {"string": pa.string(), "int64": pa.int64(),
                  "double": pa.float64()}


def _state_schema(evolved: list[str],
                  types: dict[str, str] | None = None) -> pa.Schema:
    """State-file schema. Evolved columns carry their registry type
    (alter_type widening changes it; values written under the narrower
    type cast losslessly at the next compact's write)."""
    tys = types or {}
    return pa.schema(
        [(c, pa.string()) for c in BASE_COLS]
        + [(c, _EVOLVED_TYPES[tys.get(c, "string")]) for c in evolved]
        + [("_lsn", pa.int64()), ("_sha", pa.string()), ("_op", pa.string())]
    )


_ROUTE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _route_mask(t: pa.Table, rt: tuple, route_on: str) -> "np.ndarray":
    """Demux keep-mask for one route. route_on='key' hashes the full
    (repo, path) key; 'repo' hashes the repo alone (all paths of a repo
    co-route — the Debezium table→topic shape)."""
    cols = ["repo"] if route_on == "repo" else ["repo", "path"]
    return route_of(stable_hash(t, cols), rt[1]) == rt[0]


def route_of(h: "np.ndarray", n_routes: int) -> "np.ndarray":
    """Demux route id from the stable key hash — an INDEPENDENT mix of the
    pid hash. Plain ``h % n_routes`` would correlate with ``pid = h % P``:
    whenever gcd(P, n_routes) > 1, every pid not ≡ route (mod gcd) would be
    permanently empty in that route's lake."""
    x = h.astype(np.uint64) * _ROUTE_MIX
    x ^= x >> np.uint64(31)
    return (x % np.uint64(n_routes)).astype(np.int64)


def _dlq_rules(update_mode: str = "full") -> list:
    """Event-validity rules shared by the ingest router's dead-letter
    split and replay_dlq's re-validation: a known DML verb, a present
    key, and content on full-image events (I/U in full mode; in patch
    mode a U with null content is a legal partial image, so only I
    requires content)."""
    no_content_ok = ["D"] if update_mode == "full" else ["D", "U"]
    return [
        lambda t: pc.is_in(t["op"], value_set=pa.array(["I", "U", "D"])),
        lambda t: pc.and_(pc.is_valid(t["repo"]), pc.is_valid(t["path"])),
        lambda t: pc.or_(pc.is_in(t["op"], value_set=pa.array(no_content_ok)),
                         pc.is_valid(t["content"])),
    ]


def _write_binlog_segment(t: pa.Table, path: str, fmt: str) -> None:
    """Atomically write one binlog segment in the log's wire format
    (shared by delete_where tombstones and replay_dlq re-injection)."""
    def stage(tmp: str) -> None:
        if fmt == "parquet":
            pq.write_table(t, tmp, row_group_size=16 * 1024)
        elif fmt in ("jsonl", "jsonl.gz"):
            df = t.to_pandas()
            df["ts"] = df["ts"].astype("int64")
            df.to_json(tmp, orient="records", lines=True,
                       compression="gzip" if fmt == "jsonl.gz" else None)
        else:  # csv
            import pyarrow.csv as pacsv
            t2 = t.set_column(t.schema.get_field_index("ts"), "ts",
                              t["ts"].cast(pa.int64()))
            pacsv.write_csv(t2, tmp)

    storage_for(path).put_atomic(path, stage)


def _sha256_series(s: pd.Series) -> pd.Series:
    """Per-row sha256 hex of string content. hashlib is the floor (there is
    no batch sha256 kernel); the wins over the old ``.map(lambda ...)`` are
    skipping pandas' per-row dispatch and the redundant str() of values
    that are already str (BASELINE.md §3 'vectorize the apply inner loop')."""
    sha = hashlib.sha256
    return pd.Series(
        [sha((v if isinstance(v, str) else str(v)).encode()).hexdigest()
         for v in s.to_numpy()],
        index=s.index, dtype="object")


def _content_hash(shas: pd.Series) -> str:
    """Order-independent partition audit fingerprint: byte-wise XOR of the
    per-row sha256 digests — O(n) vectorized, no O(n log n) string sort +
    re-hash of the whole SHA set per epoch (the round-1 per-epoch CPU tax).
    XOR cancels identical digests (two rows with equal content), which is
    acceptable for an audit field — the strong invariant remains the
    per-row `_sha` column checked against the oracle."""
    if not len(shas):
        return ""
    import numpy as np
    a = np.frombuffer(bytes.fromhex("".join(shas.tolist())),
                      dtype=np.uint8).reshape(len(shas), 32)
    return np.bitwise_xor.reduce(a, axis=0).tobytes().hex()


@dataclass
class CdcConfig:
    lake_dir: str
    binlog_dir: str
    num_partitions: int = 64
    epoch_size: int = 250_000          # lsn per epoch (micro-batch width)
    override_num_blocks: int | None = None
    compute_content_hash: bool = True  # manifest content_hash (incremental)
    dlq: bool = True
    # declarative CHECK constraints (data-quality gate, Connect
    # errors.tolerance DLQ + Debezium column-filter analogue): list of
    # (name, rule) pairs where rule is a vectorized
    # Callable[[pa.Table], BooleanArray] over the EVENT batch; events
    # failing any rule are dead-lettered (never applied, never silently
    # dropped) with a `_violation` column naming the first failed rule.
    # replay_dlq re-validates against the same constraints. Rules must
    # be null-safe (a null verdict counts as a violation) and op-aware
    # (e.g. exempt op='D' tombstones whose payload is null by contract).
    constraints: "list | None" = None
    metrics: bool = True
    apply_blocks: int | None = None    # hash-shuffle output blocks (default 2×CPU)
    # "sort": groupby sort-shuffle (no actor pools — best when epochs are
    # frequent; pool startup dominates hash shuffle at micro-batch cadence).
    # "hash": key-based hash repartition (aggregator actor pool per epoch —
    # wins only when epochs are large enough to amortize pool startup).
    # "spill": Spark-style two-stage exchange through the filesystem —
    # stage 1 tasks split each block by pid-slot and write Arrow IPC spill
    # files (lz4), stage 2 runs one task per slot over its files. Both
    # stages are embarrassingly parallel; measured to scale where Ray's
    # all-to-all ops flatten on this box. Retries are safe: spill names are
    # content-derived (overwrite) and the apply's lsn-dedup absorbs
    # leftovers. MULTI-NODE REQUIREMENT: exchange_dir (default
    # <lake>/_exchange) must live on storage every node can reach
    # (S3/NFS/shared mount) — stage-2 tasks read spill files written by
    # stage-1 tasks on other nodes. On a cluster without shared fs, use
    # shuffle="sort" — it shuffles through Ray's object store with NO
    # shared directory and is the measured-best dir-free fallback
    # (`bench.py --exchange`, shm lakes, 32 CPUs, 1M events: sort =
    # 0.67–0.70× spill at both 1M-row and 250k-row epochs; on a slow
    # shared disk the gap closes to ~parity because the disk bounds
    # both). "hash" is also shared-dir-free but measured 0.18–0.22×
    # spill at every cadence here — its aggregator pool start-up never
    # amortizes; kept because the pool route may win on real multi-node
    # clusters where driver-coordinated sort range-sampling costs more.
    # "auto": resolve by epoch_size at config time (spill for big epochs,
    # sort for micro-batches — the measured crossover, see __post_init__).
    shuffle: str = "spill"
    exchange_dir: str | None = None    # spill root (default <lake>/_exchange)
    # "cow": rewrite each partition's single state file per epoch (simple,
    # read-optimal). "delta": LSM write path — winners-only delta files with
    # tombstones, merge-on-read, compaction at DDL epochs or when the file
    # run exceeds compact_every (write-optimal for hot micro-batches).
    write_mode: str = "cow"
    compact_every: int = 8
    # delta-mode compaction policy: "count" folds a partition when its
    # level-0 run exceeds compact_every files; "size" folds when the
    # level-0 BYTES exceed compact_ratio × the base-file bytes (true
    # size-tiered LSM amortization — write amplification stays O(log)
    # under hot-key updates where count-based folding rewrites the whole
    # base over and over). compact_every remains the file-count backstop
    # under "size" (merge-on-read cost grows with file count even when
    # the bytes are small) — raise it when choosing the size policy.
    compact_policy: str = "count"
    compact_ratio: float = 1.0
    # >0: archive each partition's committed manifest per epoch under
    # _manifests/history so the lake is readable AS OF any retained epoch
    # (time travel: CdcPipeline.table_at / sources.lake.read_lake_at).
    # gc protects every file a retained snapshot still references; roughly
    # this many trailing epochs stay readable. 0 = off (no extra files).
    retain_snapshots: int = 0
    # overlap epoch N+1's read+route+spill (stage 1) with epoch N's apply
    # (stage 2): the two-stage barrier per epoch was the measured fixed
    # cost capping scaling efficiency (BASELINE.md §3). Spill mode only.
    pipeline_epochs: bool = True
    # writer fencing (zombie-writer protection): the pipeline takes a
    # monotonically increasing writer generation before its first commit
    # and every later commit verifies the token is still its own — a
    # paused driver that resumes after a newer writer took over the lake
    # raises FencedWriterError instead of swapping stale manifests.
    fencing: bool = True
    # JSONL wire tiers only: "fail" (default) raises on a malformed shard
    # line; "dlq" keeps well-formed lines and records bad ones under
    # <binlog>/_parse_dlq/ (Kafka Connect errors.tolerance=all analogue).
    text_errors: str = "fail"
    # transaction-atomic epoch boundaries (the Debezium/Connect
    # "transaction boundary" contract): never commit a watermark that
    # splits a multi-event transaction across epochs — the epoch's upper
    # bound is clamped to the last complete txn (binlog_src.txn_boundary)
    # and the deferred tail applies in the next epoch. Assumes a
    # commit-ordered binlog (txns contiguous in lsn — MySQL-binlog-style).
    # Disables pipeline_epochs (stage-1 prespill uses grid bounds, which a
    # data-dependent boundary would invalidate).
    txn_atomic: bool = False
    # DDL compatibility enforcement (Confluent-schema-registry analogue):
    # "none" folds every DDL; "additive" rejects drop_column /
    # rename_column / narrowing alter_type — rejected DDLs keep their
    # registry slot (schema_ver numbering is load-bearing for event
    # decode) but have NO effect, and are counted in epoch metrics as
    # ddl_rejected. Values writers send under a rejected evolution
    # (e.g. a column name from a rejected rename) are discarded, exactly
    # as the oracle (thor_ray.oracle.apply_events(ddl_policy=...)) does.
    ddl_policy: str = "none"
    # "full": a U event carries the whole row image (last-writer-wins on
    # the row). "patch": a U event is a PARTIAL image (Debezium/Hudi
    # partial update): null commit/lang/content = unchanged, and `extra`
    # carries only the evolved columns being set — the apply folds
    # per-COLUMN last-non-null after each key's last reset (I = full
    # image, D = clear), then inherits still-unset columns from the
    # partition's prior state. A patch can never set a column to null
    # (the standard partial-image limitation), and in patch mode only I
    # events require content (U with null content is legal, not DLQ).
    # Patch folding is inherently multi-event-per-key, so the epoch
    # reduction gathers kept events rather than last-wins winners, and
    # delta mode reads prior state each epoch to materialize full rows
    # (merge-on-read stays wholesale-row; blooms/changefeed/time travel
    # are untouched).
    update_mode: str = "full"
    # (route_id, n_routes): demux tier — this pipeline applies ONLY events
    # whose key hashes to route_id (Kafka-Connect topic-routing analogue:
    # one binlog fans out into n_routes independent exactly-once lakes; run
    # one CdcPipeline per route). DDL events fold into EVERY route's
    # registry; watermarks stay whole-log (skipping another route's events
    # is intentional, not loss). None = single-lake (all keys).
    route: "tuple[int, int] | None" = None
    # what the demux hashes: "key" = the full (repo, path) key (uniform
    # fan-out); "repo" = the repo ONLY — every path of a repo lands in the
    # same lake, the Debezium table→topic shape (repo ≙ source table,
    # path ≙ primary key), so per-repo consumers read one lake. pid
    # routing inside a lake always uses the full key hash regardless.
    route_on: str = "key"

    def __post_init__(self) -> None:
        if self.update_mode not in ("full", "patch"):
            raise ValueError(f"update_mode must be 'full' or 'patch', "
                             f"got {self.update_mode!r}")
        if self.compact_policy not in ("count", "size"):
            raise ValueError(f"compact_policy must be 'count' or 'size', "
                             f"got {self.compact_policy!r}")
        if self.shuffle == "auto":
            # measured guidance (BASELINE.md §3 + the shuffle= comment
            # above): the two-stage spill exchange amortizes its per-epoch
            # setup only when an epoch carries enough events; at
            # micro-batch cadence the sort-based groupby wins. Resolved
            # here so every downstream dispatch sees a concrete strategy.
            self.shuffle = "spill" if self.epoch_size >= 50_000 else "sort"
        if self.route_on not in ("key", "repo"):
            raise ValueError(f"route_on must be 'key' or 'repo', "
                             f"got {self.route_on!r}")
        if self.route is not None:
            rid, nr = self.route
            if not (nr >= 1 and 0 <= rid < nr):
                raise ValueError(f"route must be (route_id, n_routes) with "
                                 f"0 <= route_id < n_routes, got {self.route}")

    def exchange_root(self) -> str:
        return self.exchange_dir or os.path.join(self.lake_dir, "_exchange")

    def n_apply_blocks(self) -> int:
        if self.apply_blocks:
            return self.apply_blocks
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        return max(8, min(self.num_partitions, ncpu * 2))

    def n_read_blocks(self) -> int:
        """Explicit read block count: Ray's default splitting makes hundreds
        of ~1k-row blocks for a filtered epoch read, and the sort shuffle's
        per-block overhead then dominates (measured 6.5s → 1.4s at 32 CPUs
        by fixing the block count to 2×CPU)."""
        if self.override_num_blocks:
            return self.override_num_blocks
        return int(ray.cluster_resources().get("CPU", 8)) * 2


@dataclass
class EpochReport:
    epoch: int
    lo: int
    hi: int
    n_events: int
    n_applied: dict = field(default_factory=dict)
    wall_sec: float = 0.0
    events_per_sec: float = 0.0
    phase_sec: dict = field(default_factory=dict)  # ddl/apply/commit breakdown


# ----------------------------------------------------------------------------
# per-partition apply (runs inside map_groups tasks)
# ----------------------------------------------------------------------------

def _spill_stage1(t: pa.Table, *, ex_dir: str, n_slots: int) -> pa.Table:
    """Write this block's rows into per-slot Arrow IPC spill files.

    slot = pid % n_slots. File names are content-derived (lsn digest), so a
    retried task overwrites its own output instead of duplicating."""
    import numpy as np

    pid = t["pid"].to_numpy()
    slots = pid % n_slots
    lsns = t["lsn"].to_numpy()
    order = np.argsort(slots, kind="stable")
    # ONE gather then zero-copy slices per slot: a scattered take() per
    # slot on a multi-chunk block (filtered parquet reads arrive with one
    # chunk per row group) measured 55 ms per 2k-row take — 3.5 s per
    # block, the round-2 scaling bottleneck; this form is ~40× cheaper
    sorted_t = t.take(pa.array(order))
    sorted_slots = slots[order]
    bounds = np.searchsorted(sorted_slots, np.arange(n_slots + 1))
    counts = {"slot": [], "rows": []}
    for s in np.unique(sorted_slots):
        sub = sorted_t.slice(bounds[s], bounds[s + 1] - bounds[s])
        sl = lsns[order[bounds[s] : bounds[s + 1]]]
        # full-content digest: (count,min,max,xor) alone can collide between
        # two blocks of the same slot and silently clobber rows
        digest = hashlib.sha256(np.sort(sl).tobytes()).hexdigest()[:20]
        d = os.path.join(ex_dir, f"slot={int(s):05d}")
        storage_for(d).makedirs(d)   # scheme-routed exchange dirs work too
        path = os.path.join(d, f"b-{digest}.arrow")

        def stage(tmp: str, sub=sub) -> None:
            # lz4 trades bytes for (parallelizable) CPU: text payloads
            # shrink ~3x, and the exchange is bandwidth-bound once
            # compute vectorizes
            opts = pa.ipc.IpcWriteOptions(compression="lz4")
            with pa.OSFile(tmp, "wb") as f:
                with pa.ipc.new_stream(f, sub.schema, options=opts) as w:
                    w.write_table(sub)

        # durable=False: spill blocks are transient intra-epoch exchange
        # state — a crash recomputes them; fsync here is pure hot-path tax
        storage_for(path).put_atomic(path, stage, durable=False)
        counts["slot"].append(int(s))
        counts["rows"].append(len(sl))
    return pa.table(counts, schema=pa.schema([("slot", pa.int64()),
                                              ("rows", pa.int64())]))


def _reduce_slot_events(t: pa.Table, *, ctx: dict, num_partitions: int
                        ) -> dict[int, tuple[pd.DataFrame, dict]]:
    """Vectorized Arrow/numpy reduction of one slot's epoch events to
    per-pid (winners, stats) WITHOUT materializing the events as pandas:
    a full epoch's to_pandas() builds millions of Python strings (the
    round-2 apply bottleneck); only the last-writer-wins winners — bounded
    by keys touched, not events — cross into Python objects.

    Reproduces the pandas reduction exactly: watermark drop, per-pid lsn
    dedup (keep first), last-wins per (pid, repo, path), op counts and
    shard sets over the deduped events."""
    import numpy as np

    if t.num_rows == 0:
        return {}

    def dict_codes(col: "pa.ChunkedArray") -> tuple[np.ndarray, int]:
        """(global dictionary codes, dictionary size) for a string column —
        combined first so codes are table-global, not per-chunk."""
        arr = col.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=pa.string())
        d = pc.dictionary_encode(pc.fill_null(arr, ""))  # null key ≙ ""
        return np.asarray(d.indices, dtype=np.int64), len(d.dictionary)
    # index-space reduction: the table itself is NEVER sorted or gathered
    # wholesale (a full-slot take copies the whole content payload — ~7 GB
    # per 8M-event epoch); only the key/lsn/op/shard columns become numpy,
    # and the single take at the end gathers winners only
    pid0 = t["pid"].to_numpy()
    lsn0 = t["lsn"].to_numpy()
    n = len(pid0)
    order = np.lexsort((lsn0, pid0))  # pid primary, lsn secondary
    pid = pid0[order]
    lsn = lsn0[order]
    wm = np.zeros(num_partitions, dtype=np.int64)
    for p, m in ctx["manifests"].items():
        wm[int(p)] = m["upto_lsn"]
    valid = lsn > wm[pid]
    dup = np.zeros(n, dtype=bool)
    if n > 1:
        dup[1:] = (pid[1:] == pid[:-1]) & (lsn[1:] == lsn[:-1])
    dup &= valid
    keep = valid & ~dup

    def percount(mask) -> np.ndarray:
        return np.bincount(pid[mask], minlength=num_partitions)

    n_in = percount(slice(None))
    n_wm = percount(~valid)
    n_dup = percount(dup)
    op_arr = t["op"].combine_chunks()
    if isinstance(op_arr, pa.ChunkedArray):
        op_arr = op_arr.chunk(0)
    op_d = pc.dictionary_encode(pc.fill_null(op_arr, ""))
    oc = np.asarray(op_d.indices)[order]
    opvals = op_d.dictionary.to_pylist()
    op_counts = {v: percount(keep & (oc == i)) for i, v in enumerate(opvals)}
    # shard sets: match the pandas path's dropna() — null shards (float
    # NaN after to_numpy) must not be packed (NaN→int64 is platform UB)
    shard_raw = t["shard"].to_numpy(zero_copy_only=False)[order]
    sh_ok = keep.copy()
    if shard_raw.dtype.kind == "f":
        sh_ok &= ~np.isnan(shard_raw)
    shard_np = np.where(sh_ok, shard_raw, 0).astype(np.int64)
    sh_ok &= shard_np >= 0  # negative sentinel would corrupt the pid pack
    pk = np.unique((pid[sh_ok].astype(np.int64) << np.int64(32))
                   | shard_np[sh_ok])
    shard_sets: dict[int, list[int]] = {}
    for v in pk:
        shard_sets.setdefault(int(v >> 32), []).append(int(v & 0xFFFFFFFF))

    def stats_of(p: int) -> dict:
        return {
            "n_I": int(op_counts["I"][p]) if "I" in op_counts else 0,
            "n_U": int(op_counts["U"][p]) if "U" in op_counts else 0,
            "n_D": int(op_counts["D"][p]) if "D" in op_counts else 0,
            "n_dup": int(n_dup[p]), "n_wm_dropped": int(n_wm[p]),
            "n_events": int(n_in[p]), "shards": sorted(shard_sets.get(p, [])),
        }

    if ctx.get("update_mode") == "patch":
        # patch folding needs every kept event per key (per-column
        # last-non-null), not just the last row — gather kept rows once
        # (epoch-sized content copy, patch mode only) and fold vectorized
        kept_t = t.take(pa.array(order[np.flatnonzero(keep)]))
        pdf = _patch_fold_table(kept_t, ctx["all_entries"])
        pgroups = {int(p): g for p, g in pdf.groupby("pid", sort=True)}
        return {int(p): (pgroups.get(int(p), pdf.iloc[0:0]), stats_of(int(p)))
                for p in np.flatnonzero(n_in > 0)}

    # last-wins winners per (pid, key): dictionary-encode the key columns
    # (C-level; combined so codes are table-global), combine to one int64,
    # take the LAST occurrence in (pid, lsn) order via np.unique reversed
    rc, repo_card = dict_codes(t["repo"])
    pcc, path_card = dict_codes(t["path"])
    key = (rc * np.int64(path_card + 1) + pcc)[order]
    kidx = np.flatnonzero(keep)
    key_bound = np.int64(repo_card + 1) * np.int64(path_card + 1)
    pid_max = int(pid[-1]) if n else 0
    if (pid_max + 1) * int(key_bound) < (1 << 62):
        combo = pid[kidx].astype(np.int64) * key_bound + key[kidx]
        _, first_rev = np.unique(combo[::-1], return_index=True)
    else:
        # overflow-safe fallback (huge slots): structured unique — slower,
        # never silently collides
        arr = np.empty(len(kidx), dtype=[("p", "i8"), ("k", "i8")])
        arr["p"], arr["k"] = pid[kidx], key[kidx]
        _, first_rev = np.unique(arr[::-1], return_index=True)
    win_sorted_pos = np.sort(kidx[len(kidx) - 1 - first_rev])
    winners_t = t.take(pa.array(order[win_sorted_pos]))
    wdf = winners_t.to_pandas()  # winners only — small
    out: dict[int, tuple[pd.DataFrame, dict]] = {}
    groups = {int(p): g for p, g in wdf.groupby("pid", sort=True)}
    for p in np.flatnonzero(n_in > 0):
        p = int(p)
        out[p] = (groups.get(p, wdf.iloc[0:0]), stats_of(p))
    return out


_EMPTY_STATS = {"n_I": 0, "n_U": 0, "n_D": 0, "n_dup": 0,
                "n_wm_dropped": 0, "n_events": 0, "shards": []}


_PATCH_COLS = ["lsn", "op", "repo", "path", "commit", "lang", "content",
               "extra", "schema_ver", "pid", "_reset"]


def _patch_fold_table(t: pa.Table, all_entries: list) -> pd.DataFrame:
    """Patch-mode epoch reduction: ONE folded row per (pid, repo, path).

    Input: KEPT events (already watermark-filtered and lsn-deduped) of one
    or more pids, any order, APPLY_COLS+pid. Semantics (mirrors
    oracle.apply_events(update_mode="patch")): within a key's lsn-ordered
    event sequence, I is a full-image reset, D clears the row, and each U
    sets only its non-null commit/lang/content plus the evolved columns
    present (non-null) in `extra`. The fold is per-column last-non-null
    AFTER the key's last reset, falling back to the reset row's literal
    value when the reset is an I. Output rows carry:

      op          "D" iff the key's LAST kept event is a delete, else "U"
      lsn         the key's max kept lsn
      extra       the MERGED evolved mapping, re-serialized in FINAL-name
                  space with schema_ver = the registry's final version
                  (so _materialize_evolved maps it through identity)
      _reset      False = pure patch: columns still null must inherit from
                  the partition's prior state (_fold_partition resolves)

    Vectorized in index space like _reduce_slot_events: per-column
    last-non-null via np.maximum.at over sorted positions; only
    winner-sized gathers touch Python objects. The evolved `extra` merge
    is a Python loop, but only over reset rows and rows carrying a
    non-trivial extra — zero when no DDL has ever run."""
    import numpy as np

    if t.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in _PATCH_COLS})

    # all-null object columns arrive as arrow null type (from_pandas
    # inference); cast so fill_null / string kernels below are well-typed
    for c in ("op", "repo", "path", "commit", "lang", "content", "extra"):
        if pa.types.is_null(t.schema.field(c).type):
            t = t.set_column(t.schema.get_field_index(c), c,
                             t[c].cast(pa.string()))

    def dict_codes(col: "pa.ChunkedArray") -> tuple[np.ndarray, int]:
        arr = col.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=pa.string())
        d = pc.dictionary_encode(pc.fill_null(arr, ""))
        return np.asarray(d.indices, dtype=np.int64), len(d.dictionary)

    pid0 = t["pid"].to_numpy()
    lsn0 = t["lsn"].to_numpy()
    n = len(pid0)
    order = np.lexsort((lsn0, pid0))
    rc, _ = dict_codes(t["repo"])
    pcc, pcard = dict_codes(t["path"])
    # (pid, key) combo via structured unique — no overflow concern
    arr = np.empty(n, dtype=[("p", "i8"), ("k", "i8"), ("q", "i8")])
    arr["p"], arr["k"], arr["q"] = pid0[order], rc[order], pcc[order]
    _, cid = np.unique(arr, return_inverse=True)
    K = int(cid.max()) + 1
    pos = np.arange(n)

    op_arr = t["op"].combine_chunks()
    if isinstance(op_arr, pa.ChunkedArray):
        op_arr = op_arr.chunk(0) if op_arr.num_chunks else pa.array([], type=pa.string())
    od = pc.dictionary_encode(pc.fill_null(op_arr, ""))
    op_idx = np.asarray(od.indices, dtype=np.int64)[order]
    opvals = od.dictionary.to_pylist()
    i_code = opvals.index("I") if "I" in opvals else -2
    d_code = opvals.index("D") if "D" in opvals else -2

    reset_m = (op_idx == i_code) | (op_idx == d_code)
    lr = np.full(K, -1, dtype=np.int64)         # last reset pos per key
    np.maximum.at(lr, cid[reset_m], pos[reset_m])
    lastp = np.zeros(K, dtype=np.int64)         # last kept pos per key
    np.maximum.at(lastp, cid, pos)
    has_reset = lr >= 0
    reset_is_i = np.zeros(K, dtype=bool)
    reset_is_i[has_reset] = op_idx[lr[has_reset]] == i_code

    def gather(name: str, idxs: np.ndarray) -> list:
        """Column values at per-key source positions; -1 → None."""
        safe = np.where(idxs >= 0, idxs, 0)
        vals = t[name].take(pa.array(order[safe])).to_pylist()
        return [v if i >= 0 else None for v, i in zip(vals, idxs)]

    out: dict[str, list] = {
        "repo": gather("repo", lastp), "path": gather("path", lastp),
    }
    for c in ("commit", "lang", "content"):
        nullm = np.asarray(pc.is_null(t[c]).combine_chunks(),
                           dtype=bool)[order]
        validc = (~nullm) & (pos > lr[cid])
        w = np.full(K, -1, dtype=np.int64)
        np.maximum.at(w, cid[validc], pos[validc])
        src = np.where(w >= 0, w, np.where(reset_is_i, lr, -1))
        out[c] = gather(c, src)

    # merged evolved mapping in final-name space; rows that matter: resets
    # (I replaces the whole mapping, D clears it) + non-trivial patches
    ver_end = SchemaRegistry(all_entries).version
    extra_null = np.asarray(pc.is_null(t["extra"]).combine_chunks(),
                            dtype=bool)[order]
    extra_trivial = np.asarray(
        pc.equal(pc.fill_null(t["extra"].combine_chunks(), "{}"), "{}"),
        dtype=bool)[order]
    needs = reset_m | ~(extra_null | extra_trivial)
    extras: list[str] = ["{}"] * K
    if needs.any():
        registry = SchemaRegistry(all_entries)
        rename_cache: dict[int, dict[str, str]] = {}
        sel = np.flatnonzero(needs)               # pos order = lsn order
        e_vals = t["extra"].take(pa.array(order[sel])).to_pylist()
        v_vals = t["schema_ver"].take(pa.array(order[sel])).to_pylist()
        accs: dict[int, dict] = {}
        for sp, ex, ver in zip(sel, e_vals, v_vals):
            c = int(cid[sp])
            o = op_idx[sp]
            if o == d_code:
                accs[c] = {}
                continue
            ver = int(ver)
            m = rename_cache.get(ver)
            if m is None:
                m = registry.rename_into(ver)
                rename_cache[ver] = m
            vals = json.loads(ex) if ex else {}
            if o == i_code:                        # full replacement
                accs[c] = {m[k]: v for k, v in vals.items() if k in m}
            else:                                  # patch: non-null sets
                acc = accs.setdefault(c, {})
                acc.update({m[k]: v for k, v in vals.items()
                            if k in m and v is not None})
        for c, acc in accs.items():
            extras[c] = json.dumps(acc, sort_keys=True)

    # DDL defaults (add_column with "default"): the oracle backfills every
    # row PRESENT at the DDL lsn L. Keys present only via prior state are
    # handled by the backfilled-state inheritance (_reset=False); here we
    # inject for keys whose own epoch chain establishes presence at L —
    # last pre-L event is I/U (not D) — unless a post-L reset wipes the
    # row (I full image / D). Nothing can write the column before L (it
    # did not exist; strict rename mapping drops unknown keys), so
    # setdefault never overrides a real post-L write.
    registry_d = SchemaRegistry(all_entries)
    lsn0o = lsn0[order]
    for e in registry_d.entries:
        a = e["ddl"]
        if (e.get("rejected") or a["action"] != "add_column"
                or "default" not in a):
            continue
        fname = registry_d.rename_into(e["schema_ver"] + 1).get(a["name"])
        if not fname:
            continue
        L = e["lsn"]
        prem = lsn0o < L
        if not prem.any():
            continue
        lastpre = np.full(K, -1, dtype=np.int64)
        np.maximum.at(lastpre, cid[prem], pos[prem])
        present = (lastpre >= 0) & (op_idx[np.maximum(lastpre, 0)] != d_code)
        reset_after = has_reset.copy()
        reset_after[has_reset] = lsn0o[lr[has_reset]] > L
        for ck in np.flatnonzero(present & ~reset_after):
            acc = json.loads(extras[ck])
            if acc.get(fname) is None:
                acc[fname] = a["default"]
                extras[int(ck)] = json.dumps(acc, sort_keys=True)

    out["lsn"] = lsn0[order[lastp]].tolist()
    out["pid"] = pid0[order[lastp]].tolist()
    out["op"] = np.where(op_idx[lastp] == d_code, "D", "U").tolist()
    out["extra"] = extras
    out["schema_ver"] = [ver_end] * K
    out["_reset"] = has_reset.tolist()
    return pd.DataFrame(out, columns=_PATCH_COLS)


def _cleanup_exchange(ex_dir: str) -> None:
    """Remove a consumed epoch's spill directory (best effort — leftovers
    are transient and re-created deterministically). Plain paths use
    shutil; scheme paths delete through the resolved pyarrow filesystem."""
    if "://" not in ex_dir:
        import shutil as _shutil

        _shutil.rmtree(ex_dir, ignore_errors=True)
        return
    from thor_ray.state.storage import PyArrowFSStorage, storage_for

    store = storage_for(ex_dir)
    if isinstance(store, PyArrowFSStorage):
        try:
            store.fs.delete_dir(store._map(ex_dir))
        except (OSError, FileNotFoundError):
            pass


def _apply_slot(batch: pd.DataFrame, *, ex_dir: str, ctx: dict,
                n_slots: int, num_partitions: int) -> pd.DataFrame:
    """Stage 2 of the spill exchange: one slot's files → apply every owned
    pid (slot s owns {p : p % n_slots == s}), INCLUDING pids with no events
    this epoch (empty fold advances their watermark / applies DDL — the
    role markers play in the shuffle paths)."""
    empty_w = pd.DataFrame({c: pd.Series(dtype="object") for c in APPLY_COLS}
                           | {"lsn": pd.Series(dtype="int64"),
                              "schema_ver": pd.Series(dtype="int64"),
                              "pid": pd.Series(dtype="int64")})
    # scheme-routed exchange dirs (s3://, file://) list/read through the
    # storage layer — workers auto-resolve the scheme via pyarrow.fs;
    # plain paths keep the mmap-friendly OSFile fast path
    remote = "://" in ex_dir
    store = storage_for(ex_dir)
    outs = []
    for slot in batch["slot"].tolist():
        files = store.list(
            os.path.join(ex_dir, f"slot={slot:05d}", "b-*.arrow"))
        tables = []
        for f in files:
            if remote:
                tables.append(pa.ipc.open_stream(
                    pa.BufferReader(store.read_bytes(f))).read_all())
                continue
            with pa.OSFile(f, "rb") as fh:
                tables.append(pa.ipc.open_stream(fh).read_all())
        reduced: dict[int, tuple[pd.DataFrame, dict]] = {}
        if tables:
            reduced = _reduce_slot_events(pa.concat_tables(tables), ctx=ctx,
                                          num_partitions=num_partitions)
        for pid in range(slot, num_partitions, n_slots):
            winners, stats = reduced.get(pid, (empty_w, _EMPTY_STATS))
            outs.append(_fold_partition(winners, stats, ctx=ctx, pid=pid))
    if not outs:
        return pd.DataFrame()
    return pd.concat(outs, ignore_index=True)


def _apply_block(block: pd.DataFrame, *, ctx: dict) -> pd.DataFrame:
    """Apply every whole partition present in one hash-repartitioned block.

    The key-based repartition guarantees all rows of a pid land in exactly
    one block, so a block is a bundle of complete partitions — iterating
    them here costs one task per block instead of one per partition."""
    out = [
        _apply_partition_group(g, ctx=ctx)
        for _, g in block.groupby("pid", sort=True)
    ]
    return pd.concat(out, ignore_index=True)


def _apply_partition_group(group: pd.DataFrame, *, ctx: dict,
                           pid: int | None = None) -> pd.DataFrame:
    """Fold one partition's epoch slice into its state; returns a one-row
    manifest-candidate frame. Idempotent: deterministic output file name per
    (pid, epoch); only the later manifest swap commits."""
    pid = int(group["pid"].iloc[0]) if pid is None else pid
    man = ctx["manifests"].get(pid)
    watermark = man["upto_lsn"] if man else 0

    ev = group[group["op"] != "NOOP"]
    n_in = len(ev)
    ev = ev[ev["lsn"] > watermark]
    n_wm_dropped = n_in - len(ev)
    ev = ev.sort_values("lsn", kind="stable").drop_duplicates("lsn", keep="first")
    n_dup = n_in - n_wm_dropped - len(ev)
    counts = ev["op"].value_counts().to_dict()
    shards = sorted(int(s) for s in ev["shard"].dropna().unique()) if len(ev) else []
    if ctx.get("update_mode") == "patch" and len(ev):
        winners = _patch_fold_table(
            pa.Table.from_pandas(ev[APPLY_COLS + ["pid"]],
                                 preserve_index=False),
            ctx["all_entries"])
    else:
        winners = ev.drop_duplicates(["repo", "path"], keep="last")
    stats = {"n_I": int(counts.get("I", 0)), "n_U": int(counts.get("U", 0)),
             "n_D": int(counts.get("D", 0)), "n_dup": int(n_dup),
             "n_wm_dropped": int(n_wm_dropped), "n_events": int(n_in),
             "shards": shards}
    return _fold_partition(winners, stats, ctx=ctx, pid=pid)


def _fold_partition(winners: pd.DataFrame, stats: dict, *, ctx: dict,
                    pid: int) -> pd.DataFrame:
    """Merge pre-reduced last-writer-wins winners into the partition state.

    `winners` has one row per touched (repo, path) — the epoch's surviving
    event per key, lsn-ascending — with the APPLY_COLS columns. The
    reduction to winners happens either in pandas (_apply_partition_group,
    sort/hash shuffles) or vectorized in Arrow/numpy (_reduce_slot_events,
    spill path) — this fold is shared."""
    man = ctx["manifests"].get(pid)
    ver_start = man["schema_ver"] if man else 0
    if ctx.get("preserve_position"):   # standalone compaction: watermarks
        epoch = man["epoch"] if man else 0   # and epochs must NOT move
        hi = man["upto_lsn"] if man else 0
    else:
        epoch, hi = ctx["epoch"], ctx["hi"]
    epoch_ddls: list[dict] = ctx["epoch_ddls"]
    registry = SchemaRegistry(ctx["all_entries"])
    ver_end = registry.version
    evolved_final = registry.columns_at(ver_end)
    types_final = registry.types_at(ver_end)

    # Guard by ver_start: on an epoch re-run (restore path) a partition that
    # already committed this epoch is at ver_end — re-applying add_column
    # would wipe its values. Only not-yet-seen transitions apply; policy-
    # rejected entries hold a version slot but have no state effect (and
    # must not force a delta-mode compaction).
    applied_ddls = [d for d in epoch_ddls
                    if d["schema_ver"] >= ver_start and not d.get("rejected")]
    mode = ctx.get("write_mode", "cow")
    compact_every = ctx.get("compact_every", 8)
    prior_files = man["files"] if man else []

    force = bool(ctx.get("force_compact")) and (
        len(prior_files) > 1 or bool(ctx.get("force_single")))
    changed = (len(winners) > 0) or bool(applied_ddls) or force
    if not changed:
        new_files, row_count, chash = prior_files, \
            (man["row_count"] if man else 0), (man["content_hash"] if man else "")
    else:
        winners = winners.copy()
        reset_np = (winners.pop("_reset").to_numpy(dtype=bool)
                    if "_reset" in winners.columns else None)
        wcols = _materialize_evolved(winners, registry, evolved_final)
        winners = winners[["repo", "path", "commit", "lang", "content", "op", "lsn"]]
        for c in evolved_final:
            winners[c] = wcols[c]
        state0: pd.DataFrame | None = None
        if reset_np is not None and (~reset_np).any():
            # patch mode: pure-patch winners (no I/D reset this epoch)
            # inherit still-null columns from the prior state, so every
            # written row is a FULL image (merge-on-read / changefeed /
            # time travel stay wholesale-row). Costs a state read per
            # epoch even in delta mode — the documented patch-mode tax.
            state0 = _state_with_ddls(prior_files, applied_ddls,
                                      registry.columns_at(ver_start))
            pure = ~reset_np
            cols_payload = ["commit", "lang", "content"] + evolved_final
            have = [c for c in cols_payload if c in state0.columns]
            j = winners.loc[pure, ["repo", "path"]].merge(
                state0[["repo", "path"] + have],
                on=["repo", "path"], how="left")
            for c in have:
                cur = winners.loc[pure, c].to_numpy(dtype=object)
                inh = j[c].to_numpy(dtype=object)
                winners.loc[pure, c] = np.where(pd.notna(cur), cur, inh)
        winners = winners.rename(columns={"lsn": "_lsn", "op": "_op"})
        winners["_sha"] = ""
        live = winners["_op"] != "D"
        winners.loc[live, "_sha"] = _sha256_series(winners.loc[live, "content"])

        out_dir = os.path.join(ctx["lake_dir"], f"part={pid:05d}")
        os.makedirs(out_dir, exist_ok=True)
        final_path = os.path.join(out_dir, f"state-e{epoch:06d}.parquet")
        # delta mode (LSM write path): append a winners-only delta file —
        # tombstones included — and merge on read; compact to a single file
        # when a DDL must rewrite schemas (keeps the per-partition file-set
        # schema-uniform), the level-0 run grows past compact_every, or —
        # under compact_policy="size" — the level-0 bytes outgrow
        # compact_ratio × the base file (size-tiered LSM amortization).
        size_trigger = False
        if (mode == "delta" and ctx.get("compact_policy") == "size"
                and len(prior_files) > 1):
            sizes = [os.path.getsize(f) for f in prior_files
                     if os.path.exists(f)]
            base_b = max(sizes, default=0)
            size_trigger = (sum(sizes) - base_b) > \
                ctx.get("compact_ratio", 1.0) * base_b
        compact = (mode != "delta") or bool(applied_ddls) \
            or (len(prior_files) + 1 > compact_every) \
            or size_trigger or force
        if compact:
            retain = bool(ctx.get("retain_tombstones"))
            state = state0 if state0 is not None else _state_with_ddls(
                prior_files, applied_ddls, registry.columns_at(ver_start),
                keep_tombstones=retain)
            # an incremental-snapshot chunk file carries only BASE_COLS;
            # evolved columns a DDL added in an EARLIER epoch exist in the
            # compacted sibling files but may be absent from a snap-only
            # concat — reindex so the selection below is total
            for c in evolved_final:
                if c not in state.columns:
                    state[c] = None
            merged = pd.concat(
                [state[BASE_COLS + evolved_final + ["_lsn", "_sha", "_op"]],
                 winners],
                ignore_index=True,
            )
            merged = merged.sort_values("_lsn", kind="stable").drop_duplicates(
                ["repo", "path"], keep="last")
            if retain:
                # incremental snapshot in progress: winning tombstones stay
                # in the compacted file (with their _lsn) so a base-image
                # chunk (_lsn=0) arriving later cannot resurrect a deleted
                # key; run_incremental's finalize drops them
                merged = merged.sort_values(["repo", "path"], kind="stable")
            else:
                merged = merged[merged["_op"] != "D"]
                merged = merged.assign(_op="U").sort_values(
                    ["repo", "path"], kind="stable")
            _write_state_file(merged, final_path, evolved_final, types_final)
            new_files, row_count = [final_path], len(merged)
            live_sha = merged.loc[merged["_op"] != "D", "_sha"] if retain \
                else merged["_sha"]
            chash = _content_hash(live_sha) if ctx["compute_content_hash"] else ""
        else:
            delta = winners.sort_values(["repo", "path"], kind="stable")
            _write_state_file(delta, final_path, evolved_final, types_final,
                              kind="delta")
            new_files, row_count, chash = prior_files + [final_path], -1, ""

    return pd.DataFrame(
        [{
            "pid": pid, "epoch": epoch, "upto_lsn": hi, "schema_ver": ver_end,
            "files": json.dumps(new_files), "row_count": row_count,
            "content_hash": chash,
            "n_I": stats["n_I"], "n_U": stats["n_U"], "n_D": stats["n_D"],
            "n_dup": stats["n_dup"], "n_wm_dropped": stats["n_wm_dropped"],
            "n_events": stats["n_events"],
            "input_shards": json.dumps(stats["shards"]),
        }]
    )


def _write_state_file(df: pd.DataFrame, final_path: str, evolved: list[str],
                      types: dict[str, str] | None = None,
                      kind: str = "full") -> None:
    tbl = pa.Table.from_pandas(
        df.astype({c: "object" for c in BASE_COLS + evolved}),
        schema=_state_schema(evolved, types), preserve_index=False)
    # footer markers: thor_kind "delta" = one epoch's change rows (a
    # changefeed segment, read by sources.lake.read_changefeed); "full" =
    # a merged compaction product (whole-state, NOT changes). thor_bloom =
    # key bloom for point-lookup file skipping (state/bloom.py) — built
    # over ALL written rows incl. tombstones, with the lake's pinned
    # routing hash (one vectorized pass; negligible vs the parquet write).
    from thor_ray.state import bloom as _bloom
    from thor_ray.stages.smt import stable_hash
    kh = stable_hash(pa.table({
        "repo": pa.array(df["repo"], pa.string()),
        "path": pa.array(df["path"], pa.string())}), ["repo", "path"])
    blob = _bloom.build(kh, impl=_hash_impl())
    tbl = tbl.replace_schema_metadata({
        b"thor_kind": kind.encode(),
        b"thor_bloom": _bloom.encode_footer(blob)})
    # deterministic final name: a retried task overwrites, never dups
    storage_for(final_path).put_atomic(
        final_path, lambda tmp: pq.write_table(tbl, tmp))


def _read_state(files: list[str], keep_tombstones: bool = False) -> pd.DataFrame:
    """Merge-on-read: newest (_lsn) row per key wins; tombstones drop
    (kept, still winning, while an incremental snapshot retains them)."""
    from thor_ray.sources.lake import merge_state_frames

    return merge_state_frames(
        [pq.read_table(f).to_pandas() for f in files],
        drop_tombstones=not keep_tombstones)


def _state_with_ddls(prior_files: list[str], applied_ddls: list[dict],
                     start_cols: list[str],
                     keep_tombstones: bool = False) -> pd.DataFrame:
    """Prior partition state with this epoch's accepted DDLs folded in
    (column add → null, or the DDL's DEFAULT backfilled onto existing
    rows — MySQL ALTER ADD COLUMN semantics, later events unchanged;
    an incremental-snapshot chunk landing AFTER the DDL fold carries
    nulls, the same documented window rule as renames;
    drop → discarded, rename → carried over;
    alter_type values cast at the write — the output schema carries the
    widened type, nothing to do in-frame)."""
    state = _read_state(prior_files, keep_tombstones) if prior_files \
        else _empty_state(start_cols)
    for d in applied_ddls:
        a = d["ddl"]
        if a["action"] == "add_column":
            state[a["name"]] = a.get("default")
        elif a["action"] == "drop_column":
            state = state.drop(columns=[a["name"]], errors="ignore")
        elif a["action"] == "rename_column":
            state = state.rename(columns={a["name"]: a["new_name"]})
    return state


def _empty_state(evolved: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series(dtype="object") for c in BASE_COLS + evolved}
        | {"_lsn": pd.Series(dtype="int64"), "_sha": pd.Series(dtype="object"),
           "_op": pd.Series(dtype="object")}
    )


def _materialize_evolved(winners: pd.DataFrame, registry: SchemaRegistry,
                         evolved_final: list[str]) -> dict[str, list]:
    """Winner rows' evolved-column values: parse `extra` (full replacement at
    the event's schema version), mapping names through later renames.

    Python loop over *winners only* (≤ distinct keys touched per partition
    per epoch — already reduced by last-writer-wins), not over all events."""
    out: dict[str, list] = {c: [] for c in evolved_final}
    if not evolved_final:
        return out
    rename_cache: dict[int, dict[str, str]] = {}
    dflt_cache: dict[int, dict[str, object]] = {}

    def later_defaults(ver: int) -> dict[str, object]:
        """Columns ADDED after this event's version whose add_column DDL
        carries a DEFAULT: the row image written at `ver` predates the
        column, so the DDL backfill applies to it (same rule as prior
        state — the oracle folds in lsn order, event first, DDL after)."""
        d = dflt_cache.get(ver)
        if d is None:
            d = {}
            for e in registry.entries:
                a = e["ddl"]
                if (e["schema_ver"] >= ver and not e.get("rejected")
                        and a["action"] == "add_column"
                        and "default" in a):
                    fname = registry.rename_into(
                        e["schema_ver"] + 1).get(a["name"])
                    if fname:
                        d[fname] = a["default"]
            dflt_cache[ver] = d
        return d

    for extra, ver, op in zip(winners["extra"], winners["schema_ver"], winners["op"]):
        if op == "D" or extra is None or extra == "{}":
            ver = int(ver)
            dflt = None if op == "D" else later_defaults(ver)
            for c in evolved_final:
                out[c].append(None if op == "D" else dflt.get(c))
            continue
        ver = int(ver)
        m = rename_cache.get(ver)
        if m is None:
            m = registry.rename_into(ver)
            rename_cache[ver] = m
        vals = json.loads(extra)
        # strict mapping: a key absent from m was DROPPED after this event's
        # version — its value must not leak into a later same-named column
        row = {m[k]: v for k, v in vals.items() if k in m}
        dflt = later_defaults(ver)
        for c in evolved_final:
            v = row.get(c)
            out[c].append(v if v is not None else dflt.get(c))
    return out


# ----------------------------------------------------------------------------
# the pipeline driver object
# ----------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def _hash_shuffle_ctx():
    """Key-based repartition needs ShuffleStrategy.HASH_SHUFFLE; aggregator
    actors get fractional CPUs so the pool can't starve upstream reads on
    small clusters (observed deadlock at 4 CPUs with 1-CPU aggregators)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    prev_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = min(
        0.5, max(0.05, (ncpu / 2) / max(ncpu * 2, 8)))
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev_strategy
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = prev_cpus


def _hash_impl() -> str:
    try:
        import polars  # noqa: F401
        return "polars-xxh"
    except ImportError:
        return "fnv1a"


class CdcPipeline:
    def __init__(self, cfg: CdcConfig):
        self.cfg = cfg
        self.reports: list[EpochReport] = []
        self.replay_wall_sec: float = 0.0  # epoch-loop wall of the last run()
        self._writer_gen: int | None = None  # fencing token (lazy)

    def _fence(self) -> None:
        """Acquire the writer generation on first commit; fail closed if a
        newer writer has taken the lake since (exactly-once under zombie
        drivers — see state/manifest.py fencing section)."""
        if not self.cfg.fencing:
            return
        from thor_ray.state import (FencedWriterError, acquire_writer_gen,
                                    current_writer_gen)
        if self._writer_gen is None:
            self._writer_gen = acquire_writer_gen(self.cfg.lake_dir)
            return
        cur = current_writer_gen(self.cfg.lake_dir)
        if cur != self._writer_gen:
            raise FencedWriterError(
                f"writer gen {self._writer_gen} superseded by {cur} on "
                f"{self.cfg.lake_dir}; this pipeline must stop")

    def _check_engine_meta(self) -> None:
        """Routing is hash-based; a lake written under one hash impl must
        not be resumed under another (keys would re-route and duplicate)."""
        p = os.path.join(self.cfg.lake_dir, "_schema", "engine.json")
        meta = {"hash_impl": _hash_impl(), "num_partitions": self.cfg.num_partitions,
                "route": list(self.cfg.route) if self.cfg.route else None,
                "route_on": self.cfg.route_on}
        if os.path.exists(p):
            with open(p) as f:
                prev = json.load(f)
            # lakes written before the demux tier carry no "route" key;
            # absent == None (unrouted), not a mismatch — ditto route_on
            prev.setdefault("route", None)
            prev.setdefault("route_on", "key")
            if prev != meta:
                raise RuntimeError(
                    f"lake engine meta mismatch: lake={prev}, runtime={meta}")
        else:
            os.makedirs(os.path.dirname(p), exist_ok=True)
            storage_for(p).put_bytes(p, json.dumps(meta).encode())

    # ---- bootstrap / recover --------------------------------------------
    def bootstrap(self, base: "ray.data.Dataset | str | None" = None) -> None:
        """Epoch 0: partition the base table into the lake (or init empty).

        Idempotent: skipped if manifests already exist (restore path)."""
        cfg = self.cfg
        if load_manifests(cfg.lake_dir):
            return
        os.makedirs(cfg.lake_dir, exist_ok=True)
        self._fence()
        P = cfg.num_partitions
        if base is None:
            for pid in range(P):
                m = Manifest(pid, 0, 0, 0, [], 0, "", {})
                write_manifest(cfg.lake_dir, m)
                if cfg.retain_snapshots:
                    archive_manifest(cfg.lake_dir, m)
            SchemaRegistry().save(cfg.lake_dir)
            return

        lake_dir, compute_hash = cfg.lake_dir, cfg.compute_content_hash

        rt, r_on = cfg.route, cfg.route_on

        def route(t: pa.Table) -> pa.Table:
            h = None
            if rt is not None:   # demux: bootstrap only this route's keys
                hr = stable_hash(t, ["repo"] if r_on == "repo"
                                 else ["repo", "path"])
                keep = route_of(hr, rt[1]) == rt[0]
                if r_on == "key":
                    h = hr[keep]
                t = t.filter(pa.array(keep))
            if h is None:
                h = stable_hash(t, ["repo", "path"])
            pid = h % P
            return t.append_column("pid", pa.array(pid, type=pa.int64()))

        def init_group(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["pid"].iloc[0])
            g = g[g["repo"] != ""]  # drop marker rows
            g = g[BASE_COLS].copy().sort_values(["repo", "path"], kind="stable")
            g["_lsn"] = 0
            g["_sha"] = _sha256_series(g["content"]) if len(g) else pd.Series(dtype="object")
            g["_op"] = "U"
            out_dir = os.path.join(lake_dir, f"part={pid:05d}")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, "state-e000000.parquet")
            tbl = pa.Table.from_pandas(g, schema=_state_schema([]), preserve_index=False)
            storage_for(path).put_atomic(
                path, lambda tmp: pq.write_table(tbl, tmp))
            return pd.DataFrame([{
                "pid": pid, "files": json.dumps([path]), "row_count": len(g),
                "content_hash": _content_hash(g["_sha"]) if compute_hash and len(g) else "",
            }])

        def init_block(block: pd.DataFrame) -> pd.DataFrame:
            return pd.concat([init_group(g) for _, g in block.groupby("pid", sort=True)],
                             ignore_index=True)

        markers = pa.table({
            **{c: pa.array([""] * P, type=pa.string()) for c in BASE_COLS},
            "pid": pa.array(list(range(P)), type=pa.int64()),
        })
        if cfg.shuffle == "hash":
            with _hash_shuffle_ctx():
                if isinstance(base, str):
                    base = ray.data.read_parquet(base)
                cand = (
                    base.map_batches(route, batch_format="pyarrow")
                    .union(ray.data.from_arrow(markers))
                    .repartition(num_blocks=cfg.n_apply_blocks(), keys=["pid"])
                    .map_batches(init_block, batch_format="pandas", batch_size=None)
                    .to_pandas()
                )
        else:
            if isinstance(base, str):
                base = ray.data.read_parquet(base)
            cand = (
                base.map_batches(route, batch_format="pyarrow")
                .union(ray.data.from_arrow(markers))
                .groupby("pid")
                .map_groups(init_group, batch_format="pandas")
                .to_pandas()
            )
        for r in cand.itertuples(index=False):
            m = Manifest(
                int(r.pid), 0, 0, 0, json.loads(r.files), int(r.row_count),
                r.content_hash, {"counts": {}, "input_shards": []})
            write_manifest(cfg.lake_dir, m)
            if cfg.retain_snapshots:
                archive_manifest(cfg.lake_dir, m)
        SchemaRegistry().save(cfg.lake_dir)

    # ---- epoch loop ------------------------------------------------------
    def run(self, base: "ray.data.Dataset | str | None" = None,
            max_epochs: int | None = None, until_lsn: int | None = None,
            complete: bool = True) -> list[EpochReport]:
        """Bootstrap (or recover from manifests) and replay the log.

        complete=True (default): the log is finished — drain to its global
        max lsn. complete=False: the log may still be GROWING — drain only
        to the safe frontier (slowest shard's max lsn minus a skew
        allowance); committing past it would watermark-drop events a
        lagging shard delivers later. Safe to kill and re-run: resumes from
        committed manifests."""
        cfg = self.cfg
        self._check_engine_meta()
        self.bootstrap(base)
        manifests = load_manifests(cfg.lake_dir)
        if until_lsn is not None:
            max_l = until_lsn
        elif complete:
            max_l = binlog_src.max_lsn(cfg.binlog_dir)
        else:
            max_l = binlog_src.safe_frontier(
                cfg.binlog_dir, slack=cfg.epoch_size // 4)
        # resume from the WATERMARK grid position: a previous run may have
        # committed a partial tail epoch (upto_lsn < epoch*E); re-entering
        # that epoch re-reads its range and the per-partition watermark
        # drops what was already applied
        min_upto = min(m.upto_lsn for m in manifests.values())
        first = min_upto // cfg.epoch_size + 1
        epochs = []
        e = first
        while (e - 1) * cfg.epoch_size < max_l:
            if max_epochs is not None and len(epochs) >= max_epochs:
                break
            epochs.append(e)
            e += 1

        t_replay = time.perf_counter()
        if cfg.shuffle == "spill" and cfg.pipeline_epochs \
                and len(epochs) > 1 and not cfg.txn_atomic:
            # software pipeline: stage 1 (read+route+spill) of epoch N+1
            # runs concurrently with stage 2 (apply+commit) of epoch N —
            # both are Ray jobs sharing the cluster; the per-epoch barrier
            # cost is paid once, not per epoch. Crash-safe: a spilled but
            # uncommitted epoch is simply re-spilled on restart
            # (content-derived spill names overwrite; lsn-dedup absorbs).
            from concurrent.futures import ThreadPoolExecutor

            def bounds(ep: int) -> tuple[int, int]:
                return (ep - 1) * cfg.epoch_size, min(ep * cfg.epoch_size, max_l)

            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(self._run_spill, epochs[0], *bounds(epochs[0]))
                for i, ep in enumerate(epochs):
                    spilled = fut.result()
                    if i + 1 < len(epochs):
                        nxt = epochs[i + 1]
                        fut = pool.submit(self._run_spill, nxt, *bounds(nxt))
                    self.run_epoch(ep, manifests, ceiling=max_l,
                                   prespilled=spilled)
                    manifests = load_manifests(cfg.lake_dir)
        else:
            for ep in epochs:
                self.run_epoch(ep, manifests, ceiling=max_l)
                manifests = load_manifests(cfg.lake_dir)
        # honest throughput denominator under pipelining: overlapped epoch
        # walls double-count, so bench uses this end-to-end replay wall
        self.replay_wall_sec = round(time.perf_counter() - t_replay, 4)
        return self.reports

    # ---- incremental snapshot (DBLog-style snapshot-while-tailing) --------
    def run_incremental(self, base: "ray.data.Dataset | str",
                        n_chunks: int = 8, max_epochs: int | None = None,
                        until_lsn: int | None = None,
                        complete: bool = True) -> list[EpochReport]:
        """Snapshot-while-tailing: bootstrap the lake EMPTY and fold the
        base table in as key-disjoint chunks interleaved with live binlog
        epochs — the DBLog / Debezium incremental-snapshot shape (snapshot
        a table without pausing the change stream), re-expressed for a
        partitioned LSM lake.

        DBLog dedups chunk rows against events inside a low/high watermark
        window because its chunks are read from the LIVE table (earlier
        changes are already in the chunk image). Here the chunk is a
        STATIC base image, so the rule is simpler and stricter: a chunk
        row is older than every event and must lose to ANY event that ever
        touched its key. That falls out of the existing LSM merge by
        injecting each chunk as a delta file at _lsn=0 (every event lsn is
        >= 1), with one extra obligation: delete tombstones are RETAINED
        through every fold until the last chunk lands — a compaction that
        dropped a D would let a later chunk resurrect the deleted key.
        Readers are unaffected (merge-on-read filters tombstones; single-
        file reads take the merge path while the snapshot sidecar says
        active); the finalize step rewrites every partition tombstone-free
        and then flips the flag.

        Crash-safe/resumable: chunk progress persists in
        _schema/snapshot.json, chunk files have deterministic names (a
        retried injection overwrites), and manifest file-list appends are
        idempotent. Epochs resume from the committed watermark as in
        run(). full update_mode only: a patch U folded before its base
        chunk arrives could not inherit the base image's column values.

        Mid-snapshot reads see all applied events but only the injected
        chunks' base rows (the documented DBLog behavior); the final state
        equals oracle.apply_events(events, initial=base) exactly.
        """
        cfg = self.cfg
        if cfg.update_mode != "full":
            raise ValueError(
                "run_incremental requires update_mode='full': a partial-"
                "image U applied before its key's base chunk arrives "
                "cannot inherit the base row's values")
        self._check_engine_meta()
        self.bootstrap(None)   # EMPTY lake; no-op on resume
        return self._snapshot_run(base, n_chunks, max_epochs, until_lsn,
                                  complete, fresh=True)

    def adhoc_snapshot(self, source: "ray.data.Dataset | str",
                       n_chunks: int = 4,
                       predicate=None,
                       max_epochs: int | None = None,
                       until_lsn: int | None = None,
                       complete: bool = True) -> list[EpochReport]:
        """Ad-hoc re-snapshot of a LIVE lake — the Debezium
        `execute-snapshot` signal shape (re-deliver base images for lost
        or late rows without pausing the stream).

        CONTRACT on `source`: it must be a read of the live source table
        taken at or after this lake's committed watermark — i.e. it
        REFLECTS every event already applied (Debezium reads the live
        table for exactly this reason). Then the _lsn=0 injection is
        sound with no retroactive tombstones: a key deleted BEFORE the
        snapshot started is absent from the source image (never
        re-injected), a key deleted DURING it is protected by the same
        tombstone retention as run_incremental, and a key present in
        both source and state keeps the state row (they agree by the
        contract, and the event row outranks). Keys present only in the
        source — the lost/late rows — are restored.

        `predicate` (optional, Callable[[pa.Table], BooleanArray])
        narrows the snapshot to matching source rows — the signal's
        additional-condition. Each chunk applies it before routing.

        Starts a NEW snapshot generation (chunk files are
        snap-g{gen}-c{chunk}); an in-progress generation must finish
        first (call run_incremental / adhoc_snapshot again to resume)."""
        cfg = self.cfg
        if cfg.update_mode != "full":
            raise ValueError(
                "adhoc_snapshot requires update_mode='full': a partial-"
                "image U applied before its key's source chunk arrives "
                "cannot inherit the source row's values")
        self._check_engine_meta()
        if not load_manifests(cfg.lake_dir):
            raise ValueError(
                "adhoc_snapshot needs a live lake (no manifests found); "
                "use run_incremental for a first-time snapshot")
        return self._snapshot_run(source, n_chunks, max_epochs, until_lsn,
                                  complete, fresh=False, predicate=predicate)

    def _snapshot_run(self, base, n_chunks, max_epochs, until_lsn, complete,
                      fresh: bool, predicate=None) -> list[EpochReport]:
        cfg = self.cfg
        chunks = self._plan_chunks(base, n_chunks)
        if predicate is not None:
            def filtered(thunk):
                def make():
                    return thunk().map_batches(
                        lambda t: t.filter(predicate(t)),
                        batch_format="pyarrow")
                return make
            chunks = [filtered(th) for th in chunks]
        meta = read_snapshot_meta(cfg.lake_dir)
        if meta is not None:
            meta.setdefault("generation", 0)
        if meta is None or (not meta["active"] and not fresh):
            gen_ = 0 if meta is None else meta["generation"] + 1
            meta = {"generation": gen_, "n_chunks": len(chunks),
                    "done": 0, "active": True}
            write_snapshot_meta(cfg.lake_dir, meta)
        elif meta["active"] and meta["n_chunks"] != len(chunks):
            raise ValueError(
                f"resuming an in-progress snapshot with a different chunk "
                f"plan ({meta['n_chunks']} committed vs {len(chunks)} "
                f"requested) would skip or repeat key ranges")

        manifests = load_manifests(cfg.lake_dir)
        if until_lsn is not None:
            max_l = until_lsn
        elif complete:
            max_l = binlog_src.max_lsn(cfg.binlog_dir)
        else:
            max_l = binlog_src.safe_frontier(
                cfg.binlog_dir, slack=cfg.epoch_size // 4)
        min_upto = min(m.upto_lsn for m in manifests.values())
        first = min_upto // cfg.epoch_size + 1
        epochs = []
        e = first
        while (e - 1) * cfg.epoch_size < max_l:
            if max_epochs is not None and len(epochs) >= max_epochs:
                break
            epochs.append(e)
            e += 1

        def inject_next() -> None:
            nonlocal manifests
            if meta["active"] and meta["done"] < len(chunks):
                self._inject_chunk(meta["done"], chunks[meta["done"]](),
                                   generation=meta["generation"])
                meta["done"] += 1
                write_snapshot_meta(cfg.lake_dir, meta)
                # the injection appended snap files to the ON-DISK
                # manifests; the next run_epoch must fold from the fresh
                # view or its commit would drop the chunk's file reference
                # (and with it the chunk's rows) from the partition
                manifests = load_manifests(cfg.lake_dir)

        t_replay = time.perf_counter()
        # interleave: one chunk up front, one after every epoch, the
        # remainder (short logs) after the loop — any order is correct
        # (chunks always lose the merge); interleaving bounds the extra
        # read-amplification each epoch's fold pays for the snap deltas
        inject_next()
        for ep in epochs:
            self.run_epoch(ep, manifests, ceiling=max_l)
            manifests = load_manifests(cfg.lake_dir)
            inject_next()
        while meta["active"] and meta["done"] < len(chunks):
            inject_next()
        if meta["active"]:
            # drop retained tombstones everywhere FIRST, then flip the
            # flag — a crash in between leaves active=true, so readers
            # keep the tombstone-filtering merge path (conservative)
            self.compact(all_partitions=True, _retain_tombstones=False)
            meta["active"] = False
            write_snapshot_meta(cfg.lake_dir, meta)
        self.replay_wall_sec = round(time.perf_counter() - t_replay, 4)
        return self.reports

    def _plan_chunks(self, base: "ray.data.Dataset | str",
                     n_chunks: int) -> list:
        """Deterministic key-disjoint chunk plan; list of thunks so chunk
        reads stay lazy. A path base with >= n_chunks parquet files splits
        BY FILE (each chunk reads only its slice — no rescans; at 100 TB
        the base is always many files). Otherwise chunks are hash-mod key
        slices, each a filtered scan of the base (documented n_chunks×
        read amplification, only ever paid at test scale)."""
        import glob as _glob

        if isinstance(base, str):
            files = sorted(_glob.glob(os.path.join(base, "*.parquet"))) \
                if os.path.isdir(base) else [base]
            if not files:
                raise ValueError(f"no parquet files under {base}")
            if len(files) >= n_chunks:
                groups = [list(g) for g in np.array_split(
                    np.array(files, dtype=object), n_chunks)]
                return [
                    (lambda fs=g: ray.data.read_parquet(fs))
                    for g in groups if len(g)
                ]
            def base_ds() -> "ray.data.Dataset":
                return ray.data.read_parquet(files)
        else:
            def base_ds() -> "ray.data.Dataset":
                return base

        def chunk_thunk(c: int):
            def make() -> "ray.data.Dataset":
                def filt(t: pa.Table) -> pa.Table:
                    h = stable_hash(t, ["repo", "path"])
                    # >>16 decorrelates the chunk slice from pid = h % P
                    sel = (h >> np.uint64(16)) % np.uint64(n_chunks) \
                        == np.uint64(c)
                    return t.filter(pa.array(sel))
                return base_ds().map_batches(filt, batch_format="pyarrow")
            return make

        return [chunk_thunk(c) for c in range(n_chunks)]

    def _inject_chunk(self, chunk_id: int, ds: "ray.data.Dataset",
                      generation: int = 0) -> None:
        """Distributed write of one snapshot chunk: route rows to their
        lake partition, append one delta file per touched partition at
        _lsn=0 (loses every merge against real events), swap manifests.
        Idempotent: deterministic file names + append-if-absent."""
        cfg = self.cfg
        P = cfg.num_partitions
        rt = cfg.route
        lake_dir = cfg.lake_dir
        # evolved columns present in BOTH the source image and the current
        # registry ride along (an ad-hoc repair image read from a live,
        # already-evolved table); anything else in the image is dropped and
        # missing evolved columns stay null — the oracle's value for a base
        # row after add_column. (A rename DURING the snapshot window nulls
        # the chunk's values for that column at the next fold — the image
        # predates the rename; documented, matches Debezium's "snapshot
        # reflects the schema at read time".)
        _reg = SchemaRegistry.load(cfg.lake_dir)
        evolved_now = _reg.columns_at(_reg.version)
        types_now = _reg.types_at(_reg.version)

        def route(t: pa.Table) -> pa.Table:
            if rt is not None:   # demux: this route's keys only
                t = t.filter(pa.array(_route_mask(t, rt, cfg.route_on)))
            h = stable_hash(t, ["repo", "path"])
            return t.append_column("pid", pa.array(h % P, type=pa.int64()))

        def write_group(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"pid": pd.Series(dtype="int64"),
                                  "path": pd.Series(dtype="object"),
                                  "rows": pd.Series(dtype="int64")})
            if not len(g):
                return empty
            pid = int(g["pid"].iloc[0])
            carry = [c for c in evolved_now if c in g.columns]
            g = g[BASE_COLS + carry].copy().sort_values(
                ["repo", "path"], kind="stable")
            for c in evolved_now:
                if c not in g.columns:
                    g[c] = None
            g = g[BASE_COLS + evolved_now]
            g["_lsn"] = 0
            g["_sha"] = _sha256_series(g["content"])
            g["_op"] = "U"
            out_dir = os.path.join(lake_dir, f"part={pid:05d}")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(
                out_dir, f"snap-g{generation:03d}-c{chunk_id:04d}.parquet")
            tbl = pa.Table.from_pandas(
                g, schema=_state_schema(evolved_now, types_now),
                preserve_index=False)
            storage_for(path).put_atomic(
                path, lambda tmp: pq.write_table(tbl, tmp))
            return pd.DataFrame([{"pid": pid, "path": path, "rows": len(g)}])

        cand = (ds.map_batches(route, batch_format="pyarrow")
                .groupby("pid")
                .map_groups(write_group, batch_format="pandas")
                .to_pandas())
        manifests = load_manifests(cfg.lake_dir)
        for r in cand.itertuples(index=False):
            m = manifests[int(r.pid)]
            if r.path not in m.files:
                m.files.append(r.path)
            m.row_count = -1        # live count unknown until the next fold
            m.content_hash = ""
            write_manifest(cfg.lake_dir, m)
            if cfg.retain_snapshots:
                # the chunk is "as of lsn 0" — logically part of every
                # retained epoch's state; re-archiving the CURRENT epoch
                # keeps table_at(now) == base ∪ events<=now and protects
                # the snap file from gc via the history set
                archive_manifest(cfg.lake_dir, m)

    def _make_router(self, epoch: int):
        """The stateless pre-apply chain: DLQ split + pid routing."""
        cfg = self.cfg
        P = cfg.num_partitions
        stages = []
        rules, names = [], []
        if cfg.dlq:
            rules += _dlq_rules(cfg.update_mode)
            names += ["op_verb", "key_present", "content_present"]
        if cfg.constraints:
            rules += [r for _, r in cfg.constraints]
            names += [f"check:{n}" for n, _ in cfg.constraints]
        if rules:
            stages.append(chain_mod.dlq_stage(
                os.path.join(cfg.lake_dir, "_dlq"),
                rules=rules,
                tag=f"e{epoch}-",
                # the _violation marker only when CHECK constraints are
                # configured — keeps the plain-DLQ file schema unchanged
                names=names if cfg.constraints else None,
            ))

        rt, r_on = cfg.route, cfg.route_on

        def route(t: pa.Table) -> pa.Table:
            h = None
            if rt is not None:
                # demux filter FIRST, so a corrupt event lands in exactly
                # one route's DLQ (null keys hash via fill_null → one route)
                hr = stable_hash(t, ["repo"] if r_on == "repo"
                                 else ["repo", "path"])
                keep = route_of(hr, rt[1]) == rt[0]
                # key-routed fast path: reuse the full-key hash for pid.
                # DLQ stages drop rows without exposing the mask, and
                # repo-routing hashes a different column set — recompute.
                if r_on == "key" and not stages:
                    h = hr[keep]
                t = t.filter(pa.array(keep))
            for s in stages:
                t = s(t)
            if h is None:
                h = stable_hash(t, ["repo", "path"])
            pid = h % P
            return t.append_column("pid", pa.array(pid, type=pa.int64()))

        return route

    def _run_spill(self, epoch: int, lo: int, hi: int) -> tuple[str, int]:
        """Stage 1 of the spill exchange for one epoch: read + route +
        per-slot spill. Independent of manifests/registry state, so it can
        run concurrently with the PREVIOUS epoch's apply (pipeline_epochs)."""
        from functools import partial

        cfg = self.cfg
        ex_dir = os.path.join(cfg.exchange_root(), f"e{epoch:06d}")
        n_slots = cfg.n_apply_blocks()
        ds = binlog_src.read_epoch(cfg.binlog_dir, lo, hi,
                                   override_num_blocks=cfg.n_read_blocks(),
                                   columns=APPLY_COLS,
                                   tolerant=cfg.text_errors == "dlq")
        (ds.map_batches(self._make_router(epoch), batch_format="pyarrow")
           .map_batches(partial(_spill_stage1, ex_dir=ex_dir, n_slots=n_slots),
                        batch_format="pyarrow")
           .sum("rows", ignore_nulls=True))  # execution barrier
        return ex_dir, n_slots

    def run_epoch(self, epoch: int, manifests: dict[int, Manifest] | None = None,
                  ceiling: int | None = None,
                  prespilled: tuple[str, int] | None = None) -> EpochReport:
        cfg = self.cfg
        t0 = time.perf_counter()
        manifests = manifests or load_manifests(cfg.lake_dir)
        P = cfg.num_partitions
        lo = (epoch - 1) * cfg.epoch_size
        # clamp the committed watermark to what the caller knows is fully
        # delivered (the run's drain ceiling; standalone calls use the
        # observed log end): committing upto_lsn past delivered data would
        # silently watermark-drop events that arrive later in that range
        if ceiling is None:
            ceiling = binlog_src.max_lsn(cfg.binlog_dir)
        # unconditional clamp: ceiling==0 (empty / not-yet-delivered binlog)
        # must clamp hi to 0, not fall through to epoch*epoch_size — that
        # would be exactly the watermark overcommit this guard prevents
        hi = min(epoch * cfg.epoch_size, ceiling)
        if cfg.txn_atomic:
            # a previous epoch may have deferred a straddling txn's tail
            # below this epoch's grid lo — extend the read window back to
            # the committed watermark (the lsn-dedup filter absorbs any
            # already-applied overlap), then clamp hi to a txn boundary
            if manifests:
                lo = min(lo, min(m.upto_lsn for m in manifests.values()))
            hi = max(binlog_src.txn_boundary(cfg.binlog_dir, lo, hi), lo)

        registry = SchemaRegistry.load(cfg.lake_dir)
        t_ddl = time.perf_counter()
        epoch_ddls = binlog_src.read_ddl_events(cfg.binlog_dir, lo, hi)
        t_ddl = time.perf_counter() - t_ddl
        # compatibility gate BEFORE the merge: violators keep their slot
        # (version numbering) but are stamped rejected — pure function of
        # (stored registry, batch, policy), so crash/replay re-stamps the
        # same way and the lsn-keyed merge stays idempotent
        epoch_ddls = registry.apply_policy(epoch_ddls, cfg.ddl_policy)
        n_ddl_rejected = sum(1 for e in epoch_ddls if e.get("rejected"))
        full_registry = registry.merged(epoch_ddls)  # lsn-dedup: re-run safe
        # persist BEFORE any manifest swap: a crash between manifests and a
        # late registry save would lose this epoch's DDLs forever (partition
        # schema_ver would point past the end of the stored timeline). The
        # registry is lsn-keyed and idempotent, so saving early is safe.
        full_registry.save(cfg.lake_dir)
        if epoch_ddls and cfg.metrics:
            self._write_schema_changes(epoch, epoch_ddls, full_registry)

        ctx = {
            "lake_dir": cfg.lake_dir, "epoch": epoch, "hi": hi,
            "manifests": {pid: {
                "upto_lsn": m.upto_lsn, "schema_ver": m.schema_ver,
                "files": m.files, "row_count": m.row_count,
                "content_hash": m.content_hash,
            } for pid, m in manifests.items()},
            "epoch_ddls": epoch_ddls, "all_entries": full_registry.entries,
            "compute_content_hash": cfg.compute_content_hash,
            "write_mode": cfg.write_mode, "compact_every": cfg.compact_every,
            "compact_policy": cfg.compact_policy,
            "compact_ratio": cfg.compact_ratio,
            "update_mode": cfg.update_mode,
            "retain_tombstones": snapshot_active(cfg.lake_dir),
        }

        route = self._make_router(epoch)

        # marker rows guarantee every partition emits a manifest candidate
        # (and applies DDL) even with zero data events this epoch
        from thor_ray.gen import EVENT_SCHEMA

        marker = pa.table({
            "lsn": pa.array([-1] * P, type=pa.int64()),
            "op": pa.array(["NOOP"] * P),
            **{c: pa.array([None] * P, type=EVENT_SCHEMA.field(c).type)
               for c in ["repo", "path", "commit", "lang", "content", "extra"]},
            "schema_ver": pa.array([0] * P, type=pa.int32()),
            "shard": pa.array([-1] * P, type=pa.int32()),
            "pid": pa.array(list(range(P)), type=pa.int64()),
        }).select(APPLY_COLS + ["pid"])

        from functools import partial

        # ONE wide step: hash repartition on pid (cheaper than a sort-based
        # groupby); every pid's rows land whole in exactly one block, so the
        # apply fn handles a bundle of complete partitions per task.
        t_apply = time.perf_counter()
        if cfg.shuffle == "spill":
            # stage 1 (skipped when run() prespilled it concurrently with
            # the previous epoch's apply)
            ex_dir, n_slots = prespilled or self._run_spill(epoch, lo, hi)
            # stage 2: one task per slot
            slots = pa.table({"slot": pa.array(list(range(n_slots)), type=pa.int64())})
            cand = (
                ray.data.from_arrow(slots)
                .repartition(n_slots)
                .map_batches(partial(_apply_slot, ex_dir=ex_dir, ctx=ctx,
                                     n_slots=n_slots, num_partitions=P),
                             batch_format="pandas", batch_size=None)
                .to_pandas()
            )
            _cleanup_exchange(ex_dir)
        elif cfg.shuffle == "hash":
            with _hash_shuffle_ctx():
                # context is captured at dataset creation — the read must
                # happen inside this block for the repartition to plan
                ds = binlog_src.read_epoch(
                    cfg.binlog_dir, lo, hi,
                    override_num_blocks=cfg.n_read_blocks(),
                    columns=APPLY_COLS,
                    tolerant=cfg.text_errors == "dlq")
                cand = (
                    ds.map_batches(route, batch_format="pyarrow")
                    .union(ray.data.from_arrow(marker))
                    .repartition(num_blocks=cfg.n_apply_blocks(), keys=["pid"])
                    .map_batches(partial(_apply_block, ctx=ctx),
                                 batch_format="pandas", batch_size=None)
                    .to_pandas()
                )
        else:
            ds = binlog_src.read_epoch(cfg.binlog_dir, lo, hi,
                                       override_num_blocks=cfg.n_read_blocks(),
                                       columns=APPLY_COLS,
                                       tolerant=cfg.text_errors == "dlq")
            cand = (
                ds.map_batches(route, batch_format="pyarrow")
                .union(ray.data.from_arrow(marker))
                .groupby("pid")
                .map_groups(partial(_apply_partition_group, ctx=ctx),
                            batch_format="pandas")
                .to_pandas()
            )
        t_apply = time.perf_counter() - t_apply

        # ---- commit: atomic per-partition manifest swaps --------------------
        t_commit = time.perf_counter()
        self._fence()
        for r in cand.itertuples(index=False):
            m = Manifest(
                partition_id=int(r.pid), epoch=epoch, upto_lsn=int(r.upto_lsn),
                schema_ver=int(r.schema_ver), files=json.loads(r.files),
                row_count=int(r.row_count), content_hash=r.content_hash,
                lineage={
                    "input_shards": json.loads(r.input_shards),
                    "counts": {"I": int(r.n_I), "U": int(r.n_U), "D": int(r.n_D),
                               "DDL": len(epoch_ddls),
                               "ddl_rejected": n_ddl_rejected,
                               "dup_dropped": int(r.n_dup)},
                },
            )
            write_manifest(cfg.lake_dir, m)
            if cfg.retain_snapshots:
                archive_manifest(cfg.lake_dir, m)
        committed = load_manifests(cfg.lake_dir)
        if cfg.retain_snapshots:
            prune_history(cfg.lake_dir, epoch - cfg.retain_snapshots + 1)
        gc_lake(cfg.lake_dir, committed)
        t_commit = time.perf_counter() - t_commit

        wall = time.perf_counter() - t0
        n_events = int(cand["n_events"].sum())
        rep = EpochReport(
            epoch=epoch, lo=lo, hi=hi, n_events=n_events,
            n_applied={**{k: int(cand[f"n_{k}"].sum())
                          for k in ("I", "U", "D", "dup")},
                       "ddl_rejected": n_ddl_rejected},
            wall_sec=round(wall, 4),
            events_per_sec=round(n_events / wall, 1) if wall > 0 else 0.0,
            phase_sec={"ddl": round(t_ddl, 3), "apply": round(t_apply, 3),
                       "commit": round(t_commit, 3)},
        )
        self.reports.append(rep)
        if cfg.metrics:
            self._write_lineage(epoch, cand, rep)
        return rep

    def _write_lineage(self, epoch: int, cand: pd.DataFrame, rep: EpochReport) -> None:
        """Per-epoch lineage JSONL (deterministic per-epoch file → idempotent
        on re-run; SURVEY.md §2.1 S4)."""
        d = os.path.join(self.cfg.lake_dir, "_lineage")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"epoch-{epoch:06d}.jsonl")
        lines = [json.dumps({"type": "epoch", **rep.__dict__})]
        for r in cand.itertuples(index=False):
            lines.append(json.dumps({
                "type": "partition", "epoch": epoch, "pid": int(r.pid),
                "rows": int(r.row_count), "events": int(r.n_events),
                "counts": {"I": int(r.n_I), "U": int(r.n_U), "D": int(r.n_D),
                           "dup_dropped": int(r.n_dup)},
                "input_shards": json.loads(r.input_shards),
                "content_hash": r.content_hash,
            }))
        storage_for(path).put_bytes(path, ("\n".join(lines) + "\n").encode())

    def _write_schema_changes(self, epoch: int, epoch_ddls: list[dict],
                              registry: SchemaRegistry) -> None:
        """Schema-change feed (the Debezium schema-history-topic analogue):
        one JSONL record per DDL folded this epoch, with the post-change
        column set/types resolved from the registry — what a downstream
        sink consumer needs to evolve its own target schema in step.
        Deterministic per-epoch file name + atomic replace → idempotent on
        crash/replay, exactly like the lineage feed. Written right after
        the early registry save so the feed never claims a change the
        stored timeline doesn't have."""
        slot_of = {e["lsn"]: i for i, e in enumerate(registry.entries)}
        d = os.path.join(self.cfg.lake_dir, "_schema_changes")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"epoch-{epoch:06d}.jsonl")
        lines = []
        for e in sorted(epoch_ddls, key=lambda e: e["lsn"]):
            ver_after = slot_of[e["lsn"]] + 1
            lines.append(json.dumps({
                "type": "schema_change", "epoch": epoch,
                "lsn": int(e["lsn"]), "schema_ver": ver_after,
                "ddl": e["ddl"],
                "rejected": e.get("rejected"),
                "columns_after": registry.columns_at(ver_after),
                "types_after": registry.types_at(ver_after),
            }))
        storage_for(path).put_bytes(
            path, ("\n".join(lines) + "\n").encode() if lines else b"")

    def schema_changes(self) -> list[dict]:
        """Read the full schema-change feed, lsn-ordered."""
        d = os.path.join(self.cfg.lake_dir, "_schema_changes")
        recs: list[dict] = []
        for p in sorted(glob.glob(os.path.join(d, "epoch-*.jsonl"))):
            with open(p) as f:
                recs.extend(json.loads(ln) for ln in f if ln.strip())
        return sorted(recs, key=lambda r: r["lsn"])

    def _write_heartbeat(self, max_lsn: int, frontier: int) -> None:
        """Liveness heartbeat (Debezium heartbeat-topic analogue): one
        appended JSONL record per follow() poll — proof the tail loop is
        alive and how far behind the log head its commits are, even across
        polls that apply nothing. Wall-clock telemetry by design (ops
        surface, not replay state): the exactly-once machinery never reads
        it back."""
        ms = load_manifests(self.cfg.lake_dir)
        wm = min((m.upto_lsn for m in ms.values()), default=0)
        rec = {"type": "heartbeat", "ts_ms": int(time.time() * 1000),
               "max_lsn": int(max_lsn), "safe_frontier": int(frontier),
               "committed_watermark": int(wm),
               "lag_lsn": int(max(max_lsn - wm, 0))}
        os.makedirs(self.cfg.lake_dir, exist_ok=True)
        with open(os.path.join(self.cfg.lake_dir, "_heartbeat.jsonl"),
                  "a") as f:
            f.write(json.dumps(rec) + "\n")

    def follow(self, poll_sec: float = 2.0, idle_polls: int = 3,
               frontier_slack: int | None = None,
               base: "ray.data.Dataset | str | None" = None,
               on_apply: "list | None" = None) -> list[EpochReport]:
        """Continuous tail: poll the binlog dir for log growth (new segment
        files) and apply new COMPLETE epochs as they appear — micro-batch
        streaming (Kafka consumer-loop analogue).

        While the log may still grow, epochs are only committed up to the
        safe frontier (the slowest shard's max lsn minus a skew allowance):
        committing past it would advance watermarks over events a lagging
        shard hasn't delivered yet. Once `idle_polls` polls see no growth
        the log is deemed finished and the tail past the frontier is
        drained. Safe to kill/restart any time (resume-from-manifests).

        ``on_apply``: zero-arg callables invoked after every run() that
        applied new epochs — the connected-pipeline hook that keeps
        downstream consumers current with the stream (e.g.
        ``SecondaryIndex(...).advance``, ``IncrementalView(...).advance``,
        a replicate_lake lambda). Each consumer owns its exactly-once
        resume state, so a crash between apply and hook, or a hook
        failure, is repaired by the next invocation — follow() therefore
        lets hook exceptions propagate (fail fast, resume clean)."""
        if frontier_slack is None:
            frontier_slack = self.cfg.epoch_size // 4
        idle = 0
        seen = -1

        def fire_hooks() -> None:
            for fn in (on_apply or []):
                fn()

        while idle < idle_polls:
            now = binlog_src.max_lsn(self.cfg.binlog_dir)
            frontier = binlog_src.safe_frontier(
                self.cfg.binlog_dir, slack=frontier_slack)
            if now > seen:
                seen = now
                # only epochs fully below the frontier
                complete = (frontier // self.cfg.epoch_size) * self.cfg.epoch_size
                if complete > 0:
                    n_before = len(self.reports)
                    self.run(base=base, until_lsn=complete)
                    if len(self.reports) > n_before:
                        fire_hooks()
                idle = 0
            else:
                idle += 1
                if idle < idle_polls:
                    time.sleep(poll_sec)
            if self.cfg.metrics:
                # liveness + lag record every poll, applied or idle
                self._write_heartbeat(now, frontier)
        # log stopped growing: drain everything (final partial epoch incl.)
        n_before = len(self.reports)
        self.run(base=base)
        if len(self.reports) > n_before or on_apply:
            fire_hooks()
        return self.reports

    def compact(self, all_partitions: bool = False,
                _retain_tombstones: "bool | None" = None) -> int:
        """Force-merge every partition's delta run into one state file —
        the LSM maintenance command for write_mode='delta' (read-optimize a
        lake without waiting for a DDL or the compact_every threshold).
        Watermarks/epochs do NOT move; one distributed task bundle folds
        each partition with an empty winner set; manifests swap atomically
        (crash between file write and swap is safe — merge-on-read of the
        old file set plus an overwritten level file is idempotent).
        Returns the number of partitions compacted.

        all_partitions=True folds single-file partitions too — needed by
        run_incremental's finalize, where a compacted file may still hold
        retained tombstone rows that must be rewritten away."""
        cfg = self.cfg
        self._fence()   # a zombie's maintenance command must fail closed
        manifests = load_manifests(cfg.lake_dir)
        registry = SchemaRegistry.load(cfg.lake_dir)
        todo = [pid for pid, m in manifests.items()
                if all_partitions or len(m.files) > 1]
        if not todo:
            return 0
        ctx = {
            "lake_dir": cfg.lake_dir, "epoch": 0, "hi": 0,
            "preserve_position": True, "force_compact": True,
            "force_single": all_partitions,
            "manifests": {pid: {
                "upto_lsn": m.upto_lsn, "schema_ver": m.schema_ver,
                "epoch": m.epoch, "files": m.files, "row_count": m.row_count,
                "content_hash": m.content_hash,
            } for pid, m in manifests.items()},
            "epoch_ddls": [], "all_entries": registry.entries,
            "compute_content_hash": cfg.compute_content_hash,
            "write_mode": cfg.write_mode, "compact_every": cfg.compact_every,
            "compact_policy": cfg.compact_policy,
            "compact_ratio": cfg.compact_ratio,
            "update_mode": cfg.update_mode,
            # run_incremental's finalize passes False explicitly: it drops
            # the retained tombstones BEFORE flipping the snapshot's active
            # flag (readers keep using the tombstone-filtering merge path
            # until every file is clean — crash between the two is safe)
            "retain_tombstones": snapshot_active(cfg.lake_dir)
            if _retain_tombstones is None else _retain_tombstones,
        }
        empty_w = pd.DataFrame(
            {c: pd.Series(dtype="object") for c in APPLY_COLS}
            | {"lsn": pd.Series(dtype="int64"),
               "schema_ver": pd.Series(dtype="int64")})

        def fold_block(block: pd.DataFrame) -> pd.DataFrame:
            return pd.concat(
                [_fold_partition(empty_w, dict(_EMPTY_STATS), ctx=ctx,
                                 pid=int(p)) for p in block["pid"]],
                ignore_index=True)

        pids = pa.table({"pid": pa.array(sorted(todo), type=pa.int64())})
        cand = (ray.data.from_arrow(pids)
                .repartition(min(len(todo), cfg.n_apply_blocks()))
                .map_batches(fold_block, batch_format="pandas",
                             batch_size=None)
                .to_pandas())
        for r in cand.itertuples(index=False):
            m = Manifest(
                partition_id=int(r.pid), epoch=int(r.epoch),
                upto_lsn=int(r.upto_lsn), schema_ver=int(r.schema_ver),
                files=json.loads(r.files), row_count=int(r.row_count),
                content_hash=r.content_hash,
                lineage={"input_shards": [], "counts": {"compaction": 1}})
            write_manifest(cfg.lake_dir, m)
            if cfg.retain_snapshots:
                # same epoch, new physical layout: the archive follows the
                # compaction (logical snapshot content is unchanged)
                archive_manifest(cfg.lake_dir, m)
        gc_lake(cfg.lake_dir, load_manifests(cfg.lake_dir))
        return len(todo)

    def lag_report(self) -> pd.DataFrame:
        """Consumer-lag observability (the Kafka `consumer-groups
        --describe` shape): one row per binlog shard with its newest
        delivered lsn, the lake's slowest- and fastest-partition
        watermarks, and the lag (shard frontier minus slowest watermark —
        events delivered but not yet committed). Metadata-only: parquet
        footers + manifest JSON, never data; safe to poll while follow()
        runs."""
        from thor_ray.sources import binlog as _bl

        manifests = load_manifests(self.cfg.lake_dir)
        lo_wm = min((m.upto_lsn for m in manifests.values()), default=0)
        hi_wm = max((m.upto_lsn for m in manifests.values()), default=0)
        fr = _bl.shard_frontiers(self.cfg.binlog_dir)
        rows = [{
            "shard": s, "frontier_lsn": f,
            "watermark_lo": lo_wm, "watermark_hi": hi_wm,
            "lag": max(f - lo_wm, 0),
        } for s, f in sorted(fr.items())]
        return pd.DataFrame(rows, columns=["shard", "frontier_lsn",
                                           "watermark_lo", "watermark_hi",
                                           "lag"])

    def repartition_lake(self, dst_dir: str, new_partitions: int) -> int:
        """Online partition-count migration (scale the lake out or in)
        WITHOUT replaying the binlog: fold every partition's live state
        (merge-on-read, tombstone-free), re-route each row by the SAME
        stable key hash mod the new partition count, and write a fresh
        lake — epoch-tagged state files, manifests, schema registry, and
        engine meta — under ``dst_dir``. A pipeline constructed on the new
        lake with ``num_partitions=new_partitions`` resumes from the SAME
        binlog at the preserved watermark, so rebalancing is a one-off
        state-sized rewrite, never a log replay.

        Requires a QUIESCED lake (every partition at one watermark — true
        after any completed ``run()``): mixed watermarks would force the
        new lake to the minimum and re-apply the gap. Snapshot history and
        changefeed segments do not migrate (the new lake's history starts
        at the migration epoch). Shuffle shape: one key-hash exchange of
        the state (the same wide step as bootstrap); per-group work is a
        single sorted parquet write. Returns rows migrated."""
        cfg = self.cfg
        manifests = load_manifests(cfg.lake_dir)
        if not manifests:
            raise RuntimeError("repartition_lake: source lake has no manifests")
        uptos = {m.upto_lsn for m in manifests.values()}
        if len(uptos) != 1:
            raise RuntimeError(
                f"repartition_lake: lake not quiesced (watermarks {sorted(uptos)}); "
                "run() to a boundary first")
        upto = uptos.pop()
        epoch = max(m.epoch for m in manifests.values())
        registry = SchemaRegistry.load(cfg.lake_dir)
        evolved = registry.columns_at(registry.version)
        types = registry.types_at(registry.version)
        ver = registry.version
        P = new_partitions
        compute_hash = cfg.compute_content_hash

        from thor_ray.sources.lake import read_lake
        ds = read_lake(cfg.lake_dir, manifests=manifests, keep_internal=True)

        def route(t: pa.Table) -> pa.Table:
            pid = stable_hash(t, ["repo", "path"]) % P
            return t.append_column("pid", pa.array(pid, type=pa.int64()))

        cols = BASE_COLS + evolved + ["_lsn", "_sha", "_op"]

        def write_group(g: pd.DataFrame) -> pd.DataFrame:
            pid = int(g["pid"].iloc[0])
            g = g[cols].sort_values(["repo", "path"], kind="stable")
            out_dir = os.path.join(dst_dir, f"part={pid:05d}")
            os.makedirs(out_dir, exist_ok=True)
            path = os.path.join(out_dir, f"state-e{epoch:06d}.parquet")
            _write_state_file(g, path, evolved, types)
            return pd.DataFrame([{
                "pid": pid, "files": json.dumps([path]), "row_count": len(g),
                "content_hash": _content_hash(g["_sha"])
                if compute_hash and len(g) else "",
            }])

        total = 0
        seen: dict[int, "pd.Series"] = {}
        if ds.count():
            cand = (ds.map_batches(route, batch_format="pyarrow")
                    .groupby("pid")
                    .map_groups(write_group, batch_format="pandas")
                    .to_pandas())
            seen = {int(r.pid): r for r in cand.itertuples(index=False)}
        os.makedirs(dst_dir, exist_ok=True)
        for pid in range(P):
            r = seen.get(pid)
            m = Manifest(
                partition_id=pid, epoch=epoch, upto_lsn=upto,
                schema_ver=ver,
                files=json.loads(r.files) if r is not None else [],
                row_count=int(r.row_count) if r is not None else 0,
                content_hash=r.content_hash if r is not None else "",
                lineage={"input_shards": [],
                         "counts": {"repartitioned_from": cfg.num_partitions}})
            write_manifest(dst_dir, m)
            if cfg.retain_snapshots:
                archive_manifest(dst_dir, m)
            total += m.row_count
        registry.save(dst_dir)
        meta_dir = os.path.join(dst_dir, "_schema")
        os.makedirs(meta_dir, exist_ok=True)
        meta = {"hash_impl": _hash_impl(), "num_partitions": P,
                "route": list(cfg.route) if cfg.route else None}
        p = os.path.join(meta_dir, "engine.json")
        storage_for(p).put_bytes(p, json.dumps(meta).encode())
        return total

    def delete_where(self, expr: str) -> int:
        """Retention / right-to-be-forgotten: append tombstone (op='D')
        events for every live lake key matching `expr` (a Ray Dataset
        filter expression over the final-table columns) to the BINLOG at
        fresh lsns — the lake is never mutated out-of-band; the deletes
        flow through the normal exactly-once apply path (watermarks,
        dedup, crash-restore) on the next run().

        Scale shape: the matching keys never land on the driver — one
        distributed filter+project over the lake, a shard-salted groupby,
        and one segment file written per shard group. Unique lsns without
        global coordination: shard s's k-th tombstone gets
        base + 1 + s + k*n_shards (interleaved, all > the observed log
        end). Batch semantics: issue while the log is quiescent, then
        run(); in follow mode a lagging shard with no tombstones keeps
        safe_frontier below the new lsns until its next data segment.
        Returns the number of tombstones written."""
        cfg = self.cfg
        base_lsn, fmt, n_shards = self._binlog_layout()
        from thor_ray.gen import EVENT_SCHEMA, _EPOCH_TS_US

        keys = (self.final_table()
                .filter(expr=expr)
                .select_columns(["repo", "path"]))

        # Idempotence across calls: a re-issued delete before the next
        # run() would otherwise re-tombstone every key at fresh lsns (the
        # first call raised max_lsn, so the segment names differ). Suppress
        # keys that already hold a TRAILING pending tombstone — lsn above
        # both the commit watermark and the last data event, so no pending
        # insert can resurrect them — via a distributed anti-join.
        wm = min((m.upto_lsn for m in
                  load_manifests(cfg.lake_dir).values()), default=0)
        data_max = max(
            (binlog_src._file_max_lsn(p)
             for p in binlog_src.shard_files(cfg.binlog_dir)
             if "-del" not in os.path.basename(p)), default=0)
        pend_lo = max(wm, data_max)
        if pend_lo < base_lsn:
            pending = (binlog_src.read_epoch(
                cfg.binlog_dir, pend_lo, base_lsn,
                columns=["lsn", "op", "repo", "path"])
                .filter(expr="op == 'D'")
                .select_columns(["repo", "path"]))
            from thor_ray.ops.relational import hash_join
            keys = hash_join(keys, pending, on=("repo", "path"),
                             join_type="left_anti")

        def tag(t: pa.Table) -> pa.Table:
            s = stable_hash(t, ["repo", "path"]) % n_shards
            return t.append_column("shard", pa.array(s, type=pa.int32()))

        binlog_dir, registry_ver = cfg.binlog_dir, \
            SchemaRegistry.load(cfg.lake_dir).version

        def write_segment(g: pd.DataFrame) -> pd.DataFrame:
            s = int(g["shard"].iloc[0])
            k = len(g)
            lsn = base_lsn + 1 + s + np.arange(k, dtype=np.int64) * n_shards
            t = pa.table({
                "lsn": pa.array(lsn),
                "txn": pa.array(np.zeros(k, dtype=np.int64)),
                "op": pa.array(["D"] * k),
                "repo": pa.array(g["repo"], type=pa.string()),
                "path": pa.array(g["path"], type=pa.string()),
                "commit": pa.nulls(k, type=pa.string()),
                "lang": pa.nulls(k, type=pa.string()),
                "content": pa.nulls(k, type=pa.large_string()),
                "extra": pa.array(["{}"] * k, type=pa.large_string()),
                "ddl": pa.nulls(k, type=pa.string()),
                "ts": pa.array(_EPOCH_TS_US + lsn * 1000).cast(
                    pa.timestamp("us")),
                "schema_ver": pa.array(
                    np.full(k, registry_ver, dtype=np.int32)),
                "shard": pa.array(np.full(k, s, dtype=np.int32)),
            }, schema=EVENT_SCHEMA)
            # deterministic per (shard, base_lsn): a retried task on the
            # same call overwrites; a re-issued call is deduped upstream
            # by the pending-tombstone anti-join
            name = f"shard-{s:04d}-del{base_lsn:010d}.{fmt}"
            _write_binlog_segment(t, os.path.join(binlog_dir, name), fmt)
            return pd.DataFrame([{"shard": s, "n": k}])

        out = (keys.map_batches(tag, batch_format="pyarrow")
               .groupby("shard")
               .map_groups(write_segment, batch_format="pandas")
               .to_pandas())
        return int(out["n"].sum()) if len(out) else 0

    def update_where(self, expr: str, set_fn,
                     ident: str | None = None) -> int:
        """Distributed UPDATE (the other half of delete_where's
        out-of-band write tier): append full-image op='U' events for
        every live lake row matching ``expr``, with ``set_fn`` — a
        vectorized ``pa.Table -> pa.Table`` transform over the matched
        rows (same rows and columns back; the primary key must come back
        unchanged) — applied. The events land in the BINLOG at fresh
        lsns; the lake is never mutated out-of-band, the updates ride
        the normal exactly-once apply path (watermarks, dedup,
        crash-restore) on the next run().

        Idempotent re-issue: the update identity (``ident``; default
        sha1(expr) + the lake's slowest commit watermark) is encoded in
        the segment names — re-issuing the SAME update against the
        unchanged lake overwrites its own segments at the SAME lsns
        (the merge_branch pattern) instead of appending a second copy
        at the raised log end. Two DIFFERENT updates issued between
        runs need distinct ``ident``s (or a run() in between, which
        moves the watermark and so the default identity).

        Scale shape: matched rows never land on the driver — one
        distributed filter over the lake's merge-on-read path, set_fn
        inside map_batches, a shard-salted groupby, one segment file
        written per shard group. Returns the event count."""
        cfg = self.cfg
        from thor_ray.gen import EVENT_SCHEMA, _EPOCH_TS_US

        base_lsn, fmt, n_shards = self._binlog_layout()
        reg = SchemaRegistry.load(cfg.lake_dir)
        evolved = list(reg.columns_at(reg.version))
        registry_ver = reg.version
        wm = min((m.upto_lsn for m in
                  load_manifests(cfg.lake_dir).values()), default=0)
        if ident is None:
            ident = f"{hashlib.sha1(expr.encode()).hexdigest()[:8]}w{wm}"
        prior = glob.glob(os.path.join(
            cfg.binlog_dir, f"shard-*-upd{ident}-*.{fmt}"))
        if prior:
            base_lsn = int(os.path.basename(prior[0]).rsplit("-", 1)[1]
                           .split(".")[0])

        def apply_set(t: pa.Table) -> pa.Table:
            out = set_fn(t)
            if (not isinstance(out, pa.Table) or out.num_rows != t.num_rows
                    or set(out.column_names) != set(t.column_names)):
                raise ValueError(
                    "update_where set_fn must return the same rows and "
                    "columns (got "
                    f"{type(out).__name__}"
                    f"{' ' + str(out.column_names) if isinstance(out, pa.Table) else ''})")
            for k in ("repo", "path"):
                if out.num_rows and not pc.all(
                        pc.equal(out[k], t[k])).as_py():
                    raise ValueError(
                        f"update_where set_fn must not modify the "
                        f"primary key column {k!r}")
            s = stable_hash(out, ["repo", "path"]) % n_shards
            return out.append_column("shard", pa.array(s, type=pa.int32()))

        binlog_dir = cfg.binlog_dir

        def write_segment(g: pd.DataFrame) -> pd.DataFrame:
            from thor_ray.stages.envelope import _json_encode_struct
            s = int(g["shard"].iloc[0])
            k = len(g)
            lsn = base_lsn + 1 + s + np.arange(k, dtype=np.int64) * n_shards
            if evolved:
                gt = pa.Table.from_pandas(
                    g[evolved].astype(object).where(
                        pd.notna(g[evolved]), None),
                    preserve_index=False)
                extra = _json_encode_struct(gt, evolved).to_pandas()
            else:
                extra = pd.Series(["{}"] * k)

            def payload(col: str, typ) -> pa.Array:
                v = g[col] if col in g.columns else pd.Series([None] * k)
                return pa.array(v.astype(object).where(pd.notna(v), None),
                                type=typ)

            t = pa.table({
                "lsn": pa.array(lsn),
                "txn": pa.array(np.zeros(k, dtype=np.int64)),
                "op": pa.array(["U"] * k),
                "repo": pa.array(g["repo"], type=pa.string()),
                "path": pa.array(g["path"], type=pa.string()),
                "commit": payload("commit", pa.string()),
                "lang": payload("lang", pa.string()),
                "content": payload("content", pa.large_string()),
                "extra": pa.array(list(extra), type=pa.large_string()),
                "ddl": pa.nulls(k, type=pa.string()),
                "ts": pa.array(_EPOCH_TS_US + lsn * 1000).cast(
                    pa.timestamp("us")),
                "schema_ver": pa.array(
                    np.full(k, registry_ver, dtype=np.int32)),
                "shard": pa.array(np.full(k, s, dtype=np.int32)),
            }, schema=EVENT_SCHEMA)
            name = f"shard-{s:04d}-upd{ident}-{base_lsn:010d}.{fmt}"
            _write_binlog_segment(t, os.path.join(binlog_dir, name), fmt)
            return pd.DataFrame([{"shard": s, "n": k}])

        out = (self.final_table()
               .filter(expr=expr)
               .map_batches(apply_set, batch_format="pyarrow")
               .groupby("shard")
               .map_groups(write_segment, batch_format="pandas")
               .to_pandas())
        return int(out["n"].sum()) if len(out) else 0

    def ingest_dataset(self, ds: "ray.data.Dataset", ident: str,
                       op: str = "U") -> int:
        """Bulk load (UPSERT/DELETE INTO … SELECT): append one event per
        row of an arbitrary Ray Dataset to the BINLOG at fresh
        interleaved lsns — fully distributed (rows never land on the
        driver; shard-salted groupby, one atomic segment per shard) —
        riding the normal exactly-once apply path on the next run().

        ``ds`` columns: ``repo``/``path`` (required, non-null) plus any
        subset of the payload columns (``commit``/``lang``/``content``
        and registry-evolved columns); unknown columns are refused.
        Events are FULL images (the engine's wire contract): a payload
        column absent from ``ds`` becomes NULL on every loaded key —
        include the columns you want preserved, or run the lake in
        patch update_mode. ``op``: 'I' | 'U' | 'D' (payload ignored
        for 'D'). ``ident`` names the load: a re-issued ingest
        with the same ident before the next run() overwrites its own
        segments at the same lsns (merge_branch pattern) — distinct
        loads need distinct idents. Returns the event count."""
        cfg = self.cfg
        from thor_ray.gen import EVENT_SCHEMA, _EPOCH_TS_US

        if op not in ("I", "U", "D"):
            raise ValueError(f"op must be I/U/D, got {op!r}")
        if not ident or any(c in ident for c in "/\\.-"):
            raise ValueError(f"invalid ingest ident {ident!r} — no path "
                             "separators, dots or dashes (it names the "
                             "segment files)")
        base_lsn, fmt, n_shards = self._binlog_layout()
        reg = SchemaRegistry.load(cfg.lake_dir)
        evolved = list(reg.columns_at(reg.version))
        registry_ver = reg.version
        known = {"repo", "path", "commit", "lang", "content", *evolved}
        cols = ds.schema().names
        unknown = sorted(set(cols) - known)
        if unknown:
            raise ValueError(f"ingest_dataset: unknown columns {unknown} "
                             f"(lake schema: {sorted(known)})")
        if "repo" not in cols or "path" not in cols:
            raise ValueError("ingest_dataset needs repo and path columns")
        prior = glob.glob(os.path.join(
            cfg.binlog_dir, f"shard-*-ing{ident}-*.{fmt}"))
        if prior:
            base_lsn = int(os.path.basename(prior[0]).rsplit("-", 1)[1]
                           .split(".")[0])

        def tag(t: pa.Table) -> pa.Table:
            for k in ("repo", "path"):
                if t[k].null_count:
                    raise ValueError(f"ingest_dataset: null {k} in input")
            s = stable_hash(t, ["repo", "path"]) % n_shards
            return t.append_column("shard", pa.array(s, type=pa.int32()))

        binlog_dir, present = cfg.binlog_dir, set(cols)

        def write_segment(g: pd.DataFrame) -> pd.DataFrame:
            from thor_ray.stages.envelope import _json_encode_struct
            s = int(g["shard"].iloc[0])
            k = len(g)
            lsn = base_lsn + 1 + s + np.arange(k, dtype=np.int64) * n_shards
            ev_here = [c for c in evolved if c in present]
            if ev_here and op != "D":
                gt = pa.Table.from_pandas(
                    g[ev_here].astype(object).where(
                        pd.notna(g[ev_here]), None),
                    preserve_index=False)
                extra = _json_encode_struct(gt, ev_here).to_pandas()
            else:
                extra = pd.Series(["{}"] * k)

            def payload(col: str, typ) -> pa.Array:
                if op == "D" or col not in present:
                    return pa.nulls(k, type=typ)
                v = g[col]
                return pa.array(v.astype(object).where(pd.notna(v), None),
                                type=typ)

            t = pa.table({
                "lsn": pa.array(lsn),
                "txn": pa.array(np.zeros(k, dtype=np.int64)),
                "op": pa.array([op] * k),
                "repo": pa.array(g["repo"], type=pa.string()),
                "path": pa.array(g["path"], type=pa.string()),
                "commit": payload("commit", pa.string()),
                "lang": payload("lang", pa.string()),
                "content": payload("content", pa.large_string()),
                "extra": pa.array(list(extra), type=pa.large_string()),
                "ddl": pa.nulls(k, type=pa.string()),
                "ts": pa.array(_EPOCH_TS_US + lsn * 1000).cast(
                    pa.timestamp("us")),
                "schema_ver": pa.array(
                    np.full(k, registry_ver, dtype=np.int32)),
                "shard": pa.array(np.full(k, s, dtype=np.int32)),
            }, schema=EVENT_SCHEMA)
            name = f"shard-{s:04d}-ing{ident}-{base_lsn:010d}.{fmt}"
            _write_binlog_segment(t, os.path.join(binlog_dir, name), fmt)
            return pd.DataFrame([{"shard": s, "n": k}])

        out = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("shard")
               .map_groups(write_segment, batch_format="pandas")
               .to_pandas())
        return int(out["n"].sum()) if len(out) else 0

    def archive_binlog(self) -> int:
        """Retire binlog segments every partition has committed past (max
        lsn <= the lake's slowest-partition watermark) into
        ``binlog/_archive/``, keeping each shard's newest segment so the
        shard stays visible to safe_frontier. Pure metadata operation —
        no Ray tasks, no data read beyond parquet footers (text tiers:
        one lsn-column parse per candidate file)."""
        ms = load_manifests(self.cfg.lake_dir)
        if not ms:
            return 0
        wm = min(m.upto_lsn for m in ms.values())
        return binlog_src.archive_binlog(self.cfg.binlog_dir, wm)

    def _binlog_layout(self) -> "tuple[int, str, int]":
        """(max lsn, wire format, shard count) of the binlog — the shape
        facts every out-of-band segment writer needs."""
        cfg = self.cfg
        base_lsn = binlog_src.max_lsn(cfg.binlog_dir)
        fmt = binlog_src.binlog_format(cfg.binlog_dir)
        exp = binlog_src.expected_shards(cfg.binlog_dir)
        n_shards = len(exp) if exp else max(
            1, len({os.path.basename(p)[:10]
                    for p in binlog_src.shard_files(cfg.binlog_dir)}))
        return base_lsn, fmt, n_shards

    def replay_dlq(self, fix: "object | None" = None) -> int:
        """Kafka-Connect-style DLQ reprocessing: run the dead-lettered
        events through a repair transform (`fix`: a
        ``Callable[[pa.Table], pa.Table]``), re-validate, and re-inject
        the now-valid ones into the BINLOG at fresh lsns so they ride the
        normal exactly-once apply path on the next run(). Rows the fix
        does not repair stay dead-lettered (consolidated back into the
        DLQ); consumed originals are archived under ``_dlq/replayed/``.

        Semantics match Kafka DLQ re-produce: a repaired event becomes
        the LATEST version of its key (last-writer-wins at replay time),
        even if a newer legitimate update landed while it sat in the DLQ.
        Within one replay, same-key events keep their original relative
        order (fresh lsns are assigned in original-lsn order per shard).

        Crash window: dying between the segment write and the archive
        step makes a re-issued replay write the same repaired payloads
        again at higher lsns — duplicates with identical content that the
        upsert folds to the same final row (benign, documented).

        Returns the number of events re-injected."""
        import glob as _glob

        from thor_ray.ops.relational import dedup_by_key

        cfg = self.cfg
        dlq_dir = os.path.join(cfg.lake_dir, "_dlq")
        files = sorted(_glob.glob(os.path.join(dlq_dir, "dlq-*.parquet")))
        if not files:
            return 0
        base_lsn, fmt, n_shards = self._binlog_layout()
        from thor_ray.gen import EVENT_SCHEMA

        ds = ray.data.read_parquet(files)

        def strip_marker(t: pa.Table) -> pa.Table:
            # CHECK-constraint DLQ rows carry the _violation marker; the
            # fix and the re-injected wire events must not see it
            if "_violation" in t.column_names:
                t = t.drop_columns(["_violation"])
            return t

        ds = ds.map_batches(strip_marker, batch_format="pyarrow")
        # at-least-once delivery can dead-letter one event several times
        # (and across epochs): one replay per original lsn. DLQ rows carry
        # the APPLY_COLS projection (no txn/ddl/ts), so order on lsn itself
        ds = dedup_by_key(ds, ["lsn"], "lsn")
        if fix is not None:
            ds = ds.map_batches(fix, batch_format="pyarrow")
        # still-invalid rows after the fix go to a side dir (so the glob
        # above never races its own output), merged back into the DLQ at
        # the end; re-validation includes the configured CHECK constraints
        pend = dlq_dir + ".pending"
        rules = _dlq_rules(cfg.update_mode)
        names = ["op_verb", "key_present", "content_present"]
        if cfg.constraints:
            rules += [r for _, r in cfg.constraints]
            names += [f"check:{n}" for n, _ in cfg.constraints]
        ds = ds.map_batches(
            chain_mod.dlq_stage(pend, rules, tag=f"rpl{base_lsn}-",
                                names=names if cfg.constraints else None),
            batch_format="pyarrow")

        binlog_dir = cfg.binlog_dir

        def tag(t: pa.Table) -> pa.Table:
            s = stable_hash(t, ["repo", "path"]) % n_shards
            return t.append_column("_rs", pa.array(s, type=pa.int64()))

        def write_segment(g: pd.DataFrame) -> pd.DataFrame:
            # original-lsn order within the shard → same-key events keep
            # their original relative order under the fresh lsns
            g = g.sort_values("lsn", kind="stable")
            s = int(g["_rs"].iloc[0])
            k = len(g)
            lsn = base_lsn + 1 + s + np.arange(k, dtype=np.int64) * n_shards
            from thor_ray.gen import _EPOCH_TS_US
            # DLQ rows carry the APPLY_COLS projection; synthesize the
            # wire-only fields (txn/ddl/ts) like delete_where does
            synth = {
                "lsn": pa.array(lsn),
                "txn": pa.array(np.zeros(k, dtype=np.int64)),
                "ddl": pa.nulls(k, type=pa.string()),
                "ts": pa.array(_EPOCH_TS_US + lsn * 1000).cast(
                    pa.timestamp("us")),
                "shard": pa.array(np.full(k, s, dtype=np.int32)),
            }
            cols = {f.name: synth[f.name] if f.name in synth else
                    pa.array(g[f.name], type=f.type, from_pandas=True)
                    for f in EVENT_SCHEMA}
            t = pa.table(cols, schema=EVENT_SCHEMA)
            # deterministic per (shard, base_lsn): a retried task on the
            # same call overwrites, never duplicates
            name = f"shard-{s:04d}-rpl{base_lsn:010d}.{fmt}"
            _write_binlog_segment(t, os.path.join(binlog_dir, name), fmt)
            return pd.DataFrame([{"shard": s, "n": k}])

        out = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("_rs")
               .map_groups(write_segment, batch_format="pandas")
               .to_pandas())
        n = int(out["n"].sum()) if len(out) else 0

        # commit the consumption: archive originals, surface the remainder
        arch = os.path.join(dlq_dir, "replayed")
        os.makedirs(arch, exist_ok=True)
        for f in files:
            os.replace(f, os.path.join(arch, os.path.basename(f)))
        for f in _glob.glob(os.path.join(pend, "dlq-*.parquet")):
            os.replace(f, os.path.join(dlq_dir, os.path.basename(f)))
        if os.path.isdir(pend) and not os.listdir(pend):
            os.rmdir(pend)
        return n

    # ---- results ---------------------------------------------------------
    def final_table(self, keep_internal: bool = False) -> "ray.data.Dataset":
        from thor_ray.sources.lake import read_lake

        return read_lake(self.cfg.lake_dir, keep_internal=keep_internal)

    def snapshots(self) -> list[int]:
        """Epochs readable via table_at (requires retain_snapshots > 0)."""
        from thor_ray.state import snapshot_epochs

        return snapshot_epochs(self.cfg.lake_dir)

    def restore(self, epoch: int | None = None,
                tag: str | None = None) -> int:
        """Point-in-time RESTORE (Delta-RESTORE analogue): make a
        retained snapshot the lake's head IN PLACE — manifests,
        watermarks and the schema registry roll back to the epoch;
        archives and savepoint tags past it are pruned (they describe a
        rolled-back future). A subsequent run() re-applies the binlog
        from the restored watermark — the rewind-and-replay repair loop:
        quarantine bad segments, restore, re-run. State files from the
        rolled-back epochs stay on disk and are overwritten
        deterministically by the replay (the same crash-orphan rule the
        exactly-once design already relies on).

        Downstream consumers (changefeed groups, sinks, views) that
        consumed past the restore point hold offsets into a rewritten
        future — seek()/rebuild() them explicitly; restore does not
        touch their state. Returns the restored epoch."""
        import glob as _glob

        from thor_ray.state import (delete_tag, load_manifests_at,
                                    snapshot_active)
        from thor_ray.state.manifest import _history_dir  # noqa: SLF001

        cfg = self.cfg
        if tag is not None:
            if epoch is not None:
                raise ValueError("pass epoch or tag, not both")
            tags = self.tags()
            if tag not in tags:
                raise KeyError(f"no savepoint tag {tag!r} "
                               f"(have {sorted(tags)})")
            epoch = tags[tag]
        if epoch is None:
            raise ValueError("restore needs an epoch or a tag")
        if snapshot_active(cfg.lake_dir):
            raise ValueError("cannot restore while an incremental "
                             "snapshot is in progress")
        cur = load_manifests(cfg.lake_dir)
        ms_k = load_manifests_at(cfg.lake_dir, epoch)
        missing = sorted(set(cur) - set(ms_k))
        if not cur or missing:
            raise ValueError(
                f"epoch {epoch} is not a restorable snapshot for "
                f"partitions {missing or 'all'} — retention must cover it")
        self._fence()   # take over; a zombie writer's commits fail closed
        ver_k = max(m.schema_ver for m in ms_k.values())
        reg = SchemaRegistry.load(cfg.lake_dir)
        # entries carry their PRE-application version (entry index ==
        # schema_ver): the entry producing version v carries v-1, so the
        # rollback keeps strictly-below-ver_k entries
        reg.entries = [e for e in reg.entries
                       if e["schema_ver"] < ver_k]
        reg.save(cfg.lake_dir)
        for m in ms_k.values():
            write_manifest(cfg.lake_dir, m)
        for p in _glob.glob(os.path.join(
                _history_dir(cfg.lake_dir), "part-*-e*.json")):
            ep = int(os.path.basename(p).rsplit("-e", 1)[1]
                     [:-len(".json")])
            if ep > epoch:
                os.remove(p)
        for name, te in list(self.tags().items()):
            if te > epoch:
                delete_tag(cfg.lake_dir, name)
        from thor_ray.state import record_restore
        record_restore(cfg.lake_dir, epoch)
        return epoch

    def unload(self, out_dir: str, by: str = "lang",
               epoch: int | None = None, tag: str | None = None,
               columns: "list[str] | None" = None,
               cluster_by: "list[str] | None" = None) -> pd.DataFrame:
        """Snapshot unload: export the lake's state (live, AS OF a
        retained ``epoch``, or AS OF a savepoint ``tag``) as a clean
        hive-partitioned parquet dataset for downstream analytics engines
        — one ``<by>=<value>/`` directory per value, resumable (a re-run
        skips complete partitions), optionally column-pruned and
        clustered for row-group stat pruning. One distributed pass;
        the groupby on ``by`` is the only wide step. Returns the
        per-partition report from write_partitioned."""
        from thor_ray.sources.sink import write_partitioned

        if tag is not None:
            if epoch is not None:
                raise ValueError("pass epoch or tag, not both")
            ds = self.table_at_tag(tag)
        elif epoch is not None:
            ds = self.table_at(epoch)
        else:
            ds = self.final_table()
        if columns is not None:
            need = {by, *(cluster_by or [])} - set(columns)
            ds = ds.select_columns(sorted(set(columns) | need))
        return write_partitioned(ds, out_dir, by, cluster_by=cluster_by)

    def status(self) -> dict:
        """One-call ops summary — METADATA ONLY (manifests, registry,
        markers, parquet footers; no Ray jobs, no data reads): epochs and
        watermarks, binlog frontier and lag, schema version, retained
        snapshots, savepoint tags, consumer-group offsets, DLQ backlog."""
        import glob as _glob

        from thor_ray.sources.lake import consumer_groups
        from thor_ray.state import (SchemaRegistry, list_tags,
                                    snapshot_epochs)

        cfg = self.cfg
        ms = load_manifests(cfg.lake_dir)
        eps = [m.epoch for m in ms.values()]
        wms = [m.upto_lsn for m in ms.values()]
        max_l = binlog_src.max_lsn(cfg.binlog_dir)
        frontier = binlog_src.safe_frontier(cfg.binlog_dir)
        wm_min = min(wms, default=0)
        reg = SchemaRegistry.load(cfg.lake_dir)
        groups = consumer_groups(cfg.lake_dir)
        cur = min(eps, default=0)
        return {
            "lake": cfg.lake_dir,
            "partitions": len(ms),
            "epoch": {"min": min(eps, default=0), "max": max(eps, default=0)},
            "watermark": {"min": wm_min, "max": max(wms, default=0)},
            "rows": sum(m.row_count for m in ms.values()
                        if m.row_count >= 0),
            "binlog": {"dir": cfg.binlog_dir,
                       "format": binlog_src.binlog_format(cfg.binlog_dir),
                       "shards": len(binlog_src.shard_frontiers(
                           cfg.binlog_dir)),
                       "max_lsn": max_l,
                       "safe_frontier": frontier,
                       "lag_events": max(max_l - wm_min, 0)},
            "schema_version": reg.version,
            "snapshots": snapshot_epochs(cfg.lake_dir),
            "tags": list_tags(cfg.lake_dir),
            "consumer_groups": {g: {"epoch": e, "lag": cur - e}
                                for g, e in groups.items()},
            "dlq_files": len(_glob.glob(os.path.join(
                cfg.lake_dir, "_dlq", "dlq-*.parquet"))),
            "producer": self._producer_status(),
        }

    def _producer_status(self) -> "dict | None":
        """BinlogProducer state file, when the log has one (write edge)."""
        p = os.path.join(self.cfg.binlog_dir, "_producer.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            st = json.load(f)
        return {"next_lsn": st.get("next_lsn"),
                "schema_ver": st.get("schema_ver"),
                "writer_gen": st.get("writer_gen")}

    def tag(self, name: str, epoch: int | None = None,
            replace: bool = False) -> int:
        """Create a named savepoint (Iceberg-tag analogue) at `epoch`
        (default: the newest retained snapshot). The tag pins its
        archives — and through them the data files — against retention
        pruning and gc until delete_tag, so table_at_tag / branching at
        the tagged epoch stay valid indefinitely. Returns the epoch."""
        from thor_ray.state import create_tag, snapshot_epochs

        if epoch is None:
            eps = snapshot_epochs(self.cfg.lake_dir)
            if not eps:
                raise ValueError("no retained snapshots to tag — set "
                                 "CdcConfig.retain_snapshots > 0")
            epoch = eps[-1]
        create_tag(self.cfg.lake_dir, name, epoch, replace=replace)
        return epoch

    def tags(self) -> dict[str, int]:
        from thor_ray.state import list_tags

        return list_tags(self.cfg.lake_dir)

    def delete_tag(self, name: str) -> bool:
        from thor_ray.state import delete_tag

        return delete_tag(self.cfg.lake_dir, name)

    def table_at_tag(self, name: str,
                     keep_internal: bool = False) -> "ray.data.Dataset":
        """The lake AS OF a named savepoint tag."""
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"no savepoint tag {name!r} "
                           f"(have {sorted(tags)})")
        return self.table_at(tags[name], keep_internal=keep_internal)

    def table_at(self, epoch: int,
                 keep_internal: bool = False) -> "ray.data.Dataset":
        """Time travel: the lake AS OF `epoch` (newest retained snapshot
        per partition with epoch <= requested). Same merge-on-read path as
        final_table — one task per partition, no shuffle."""
        from thor_ray.sources.lake import read_lake_at

        return read_lake_at(self.cfg.lake_dir, epoch,
                            keep_internal=keep_internal)
