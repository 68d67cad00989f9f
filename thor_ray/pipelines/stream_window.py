"""Event-time windowed aggregation over the binlog stream, with
watermarks, allowed lateness, and a late-event side count — the
Flink/Kafka-Streams tumbling-window consumer shape (SURVEY.md §2.9 W1–W3)
as a streaming companion to the batch window queries (q19/q32/q35).

``WindowedAggregator`` tails the change-event log directly (the Kafka
topic analogue — not the lake): each ``advance()`` consumes the lsn range
``(committed, max_lsn]`` as one micro-batch, folds per-(window, group)
partials into its open-window state, advances the event-time watermark

    watermark = max(event ts seen) − allowed_lateness

and EMITS (finalizes) every open window whose end ≤ watermark. Events
that arrive for an already-finalized window are *late*: they are counted
per batch (the side-output metric) and excluded from emitted results —
exactly the Flink ``sideOutputLateData`` contract at micro-batch
granularity. Lateness is judged against the watermark COMMITTED by the
previous batch (within a batch, delivery order carries no information —
the binlog is at-least-once and out-of-order within bounded skew).

Scale shape: the only corpus-sized work is one streaming ``map_batches``
pass over the batch's events in which every Ray batch emits ONE
window×group-sized partial row set (count + byte sum + max ts — the
combiner); the driver folds kilobytes. Open-window state is bounded by
(windows in flight × groups), independent of event count.

Exactly-once: state and emit files are written under deterministic
batch-sequence names (``emit-b{seq}``, ``open-b{seq}``), the JSON
manifest is swapped LAST — a crashed ``advance()`` re-run overwrites the
same files and commits once (IVM protocol; see pipelines/ivm.py).
``follow(on_apply=[wagg.advance])`` keeps it current with the stream.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import time

from thor_ray.pipelines.ivm import _atomic_json

_MANIFEST = "_window_manifest.json"


def _put_parquet(df: pd.DataFrame, path: str) -> None:
    """Publish a consumer state/emit parquet through the storage
    interface (atomic temp+fsync+rename locally; an object-store backend
    maps it to a single conditional PUT) instead of a direct final-name
    ``to_parquet`` — closes the STORAGE.md portability gap the round-3
    advisor flagged: these files must be whole and durable BEFORE the
    manifest that references them is swapped in."""
    from thor_ray.state.storage import storage_for

    storage_for(path).put_atomic(
        path, lambda tmp: df.to_parquet(tmp, index=False), durable=True)


def _beat(out_dir: str, rec: dict) -> None:
    """Append one ops-telemetry line per advance() (the consumer-side
    heartbeat-topic analogue of pipelines/cdc.py::_write_heartbeat) —
    never read back by the exactly-once machinery."""
    with open(os.path.join(out_dir, "_telemetry.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")



def _slim_events(binlog_dir: str, lo: int, hi: int, gcol: str,
                 dedup: bool, fanout: int = 64, dcol: str | None = None):
    """(lsn, ts, grp, b) slim dataset for the range (lo, hi] — column
    pruning at the read, byte lengths off the Arrow offsets. With
    ``dedup`` (the default in the consumers), at-least-once re-delivered
    copies are dropped by lsn in ONE coarse-salt shuffle of these four
    narrow columns (C-level drop_duplicates inside each salt group) —
    the consumer-side W4 duplicate drop, so window counts are
    exactly-once like the lake itself. dedup=False skips the shuffle and
    counts delivered copies (the cheap at-least-once tier)."""
    from thor_ray.sources import binlog as B

    cols = ["lsn", "ts", gcol, "content"]
    if dcol is not None and dcol not in cols:
        cols.append(dcol)
    ds = B.read_epoch(binlog_dir, lo, hi, columns=cols)
    keep = ["lsn", "ts", "grp", "b"] + (["d"] if dcol is not None else [])

    def slim(t: pa.Table) -> pa.Table:
        nb = pa.compute.binary_length(t["content"]).fill_null(0)
        out = {
            "lsn": t["lsn"],
            "ts": t["ts"].cast(pa.int64()),
            # null group labels become "" — pandas groupby drops NaN keys
            # by default, which would silently lose rows from both live
            # and late counts (every event must be accounted once)
            "grp": pa.compute.fill_null(t[gcol].cast(pa.string()), ""),
            "b": nb.cast(pa.int64()),
        }
        if dcol is not None:
            out["d"] = t[dcol].cast(pa.string())
        return pa.table(out)

    s = ds.map_batches(slim, batch_format="pyarrow")
    if not dedup:
        return s

    def salt(t: pa.Table) -> pa.Table:
        return t.append_column("dsalt", pa.compute.cast(
            pa.compute.bit_wise_and(t["lsn"], fanout - 1), pa.int32()))

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("lsn")[keep]

    return (s.map_batches(salt, batch_format="pyarrow")
            .groupby("dsalt").map_groups(dd, batch_format="pandas"))


def _retention_guard(binlog_dir: str, lo: int, on_retention: str,
                     out_dir: str, kind: str) -> int:
    """OffsetOutOfRange fence: if segments above `lo` were archived, fail
    loudly (default) or seek to the retention floor, recording the skipped
    range in telemetry. Returns the (possibly advanced) lower bound."""
    from thor_ray.sources import binlog as B

    floor = B.retention_floor(binlog_dir)
    if lo >= floor:
        return lo
    if on_retention == "seek":
        _beat(out_dir, {"kind": kind, "retention_seek": True,
                        "skipped_from": lo, "skipped_to": floor})
        return floor
    raise B.RetentionGapError(
        f"{kind} consumer committed upto lsn {lo} but {binlog_dir} only "
        f"retains lsns > {floor} (archive_binlog retired earlier "
        "segments); re-seed the consumer or construct it with "
        "on_retention='seek' to accept the loss")


class WindowedAggregator:
    """Tumbling or hopping/sliding event-time windows (count +
    content-byte sum per group) maintained incrementally from the binlog.

    Parameters
    ----------
    binlog_dir : the change-event log to tail.
    out_dir : state/emit directory (created).
    window_us : window width in event-time microseconds.
    lateness_us : allowed lateness subtracted from max event ts to form
        the watermark (0 = emit as soon as a later window is seen).
    group_col : event column to group by inside each window ('op',
        'repo', 'shard', ...). Labels are normalized to STRING in the
        outputs (the slim exchange schema is fixed — an int32 'shard'
        groups as "0", "1", ...).
    slide_us : hop size for SLIDING windows (must divide window_us; each
        event then lands in window_us // slide_us overlapping windows —
        the combiner fanout grows by that factor, the protocol is
        unchanged). None (default) = tumbling.
    """

    def __init__(self, binlog_dir: str, out_dir: str, window_us: int,
                 lateness_us: int = 0, group_col: str = "op",
                 slide_us: int | None = None, on_retention: str = "error",
                 dedup: bool = True, distinct_col: str | None = None,
                 hll_p: int = 12):
        self.binlog_dir = binlog_dir
        self.out_dir = out_dir
        self.on_retention = on_retention
        self.dedup = dedup
        self.distinct_col = distinct_col
        self.hll_p = int(hll_p)
        self.window_us = int(window_us)
        self.lateness_us = int(lateness_us)
        self.group_col = group_col
        self.slide_us = int(window_us) if slide_us is None else int(slide_us)
        if self.window_us % self.slide_us:
            raise ValueError(
                f"slide_us={self.slide_us} must divide "
                f"window_us={self.window_us}")
        os.makedirs(out_dir, exist_ok=True)

    # -- manifest -----------------------------------------------------
    def _load(self) -> dict:
        p = os.path.join(self.out_dir, _MANIFEST)
        if not os.path.exists(p):
            return {"seq": 0, "upto_lsn": 0, "max_ts": None,
                    "watermark": None, "late_events": 0,
                    "config": {"window_us": self.window_us,
                               "lateness_us": self.lateness_us,
                               "group_col": self.group_col,
                               "slide_us": self.slide_us,
                               "distinct_col": self.distinct_col}}
        with open(p) as f:
            man = json.load(f)
        cfg = man["config"]
        if (cfg["window_us"] != self.window_us
                or cfg["lateness_us"] != self.lateness_us
                or cfg["group_col"] != self.group_col
                or cfg.get("slide_us", cfg["window_us"]) != self.slide_us
                or cfg.get("distinct_col") != self.distinct_col):
            raise ValueError(
                f"window config changed since {p} was written "
                f"({cfg} vs window_us={self.window_us}, "
                f"lateness_us={self.lateness_us}, "
                f"group_col={self.group_col!r}, "
                f"slide_us={self.slide_us}); use a fresh out_dir")
        return man

    def _open_state(self, man: dict) -> pd.DataFrame:
        if man["seq"] == 0:
            base = {
                "win": pd.Series(dtype="int64"),
                "grp": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "bytes": pd.Series(dtype="int64")}
            if self.distinct_col is not None:
                base["regs"] = pd.Series(dtype="object")
            return pd.DataFrame(base)
        return pd.read_parquet(os.path.join(
            self.out_dir, f"open-b{man['seq']:06d}.parquet"))

    # -- advance ------------------------------------------------------
    def advance(self, complete: bool = False, slack: int = 0) -> dict:
        """Consume one micro-batch; returns {"emitted": k, "late": j,
        "watermark": ts_us | None}. No-op when caught up.

        complete=False (default, the ``follow(on_apply=...)`` mode): the
        log may still be growing — consume only up to the SAFE frontier
        (slowest declared shard minus ``slack``), the same lsn-watermark
        contract the pipeline's own tail uses, so a lagging shard's
        undelivered lower-lsn events are never skipped. complete=True:
        the log is finished — drain to its global max lsn."""
        from thor_ray.sources import binlog as B

        t_adv = time.perf_counter()
        man = self._load()
        hi = B.max_lsn(self.binlog_dir) if complete \
            else B.safe_frontier(self.binlog_dir, slack)
        lo = _retention_guard(self.binlog_dir, int(man["upto_lsn"]),
                              self.on_retention, self.out_dir, "window")
        if hi <= lo:
            _beat(self.out_dir, {"kind": "window", "seq": man["seq"],
                                 "upto_lsn": lo, "noop": True,
                                 "watermark": man["watermark"]})
            return {"emitted": 0, "late": 0, "watermark": man["watermark"]}

        wm_committed = man["watermark"]  # late-judgment frontier
        w_us = self.window_us
        s_us = self.slide_us
        k = w_us // s_us                 # windows per event (1 = tumbling)
        gcol = self.group_col
        dcol = self.distinct_col
        hll_p = self.hll_p
        wm_bc = -1 if wm_committed is None else int(wm_committed)

        def part(t: pa.Table) -> pa.Table:
            from thor_ray.ops.sketch import _bucket_rank
            from thor_ray.stages.smt import stable_hash

            ts = t["ts"].to_numpy(zero_copy_only=False)
            grp = t["grp"].to_numpy(zero_copy_only=False)
            nbytes = t["b"].to_numpy(zero_copy_only=False)
            if dcol is not None and len(t):
                dh = stable_hash(
                    pa.table({"d": t["d"]}), ["d"]).astype(np.uint64)
            else:
                dh = np.zeros(len(t), dtype=np.uint64)
            # sliding: an event at ts belongs to the k windows starting
            # at (ts//s - j)*s for j in [0, k) — vectorized repeat+offset
            base = (ts // s_us) * s_us
            if k == 1:
                win = base
            else:
                win = (np.repeat(base, k)
                       - np.tile(np.arange(k, dtype=np.int64) * s_us,
                                 len(ts)))
                grp = np.repeat(grp, k)
                nbytes = np.repeat(nbytes, k)
                dh = np.repeat(dh, k)
            late = win + w_us <= wm_bc      # window already finalized
            # late-EVENT count (Flink sideOutputLateData: one record per
            # late event): judge only the newest window copy (j=0, the
            # latest-ending window) — older late copies are still dropped
            # from the fold but don't re-count the same event
            if k == 1:
                newest = np.ones(len(win), dtype=bool)
            else:
                newest = np.tile(np.arange(k, dtype=np.int64) == 0,
                                 len(ts))
            df = pd.DataFrame({"win": win, "grp": grp, "b": nbytes,
                               "late": late, "l1": late & newest})
            g = df.groupby(["win", "grp", "late"], as_index=False).agg(
                n=("b", "size"), bytes=("b", "sum"), late1=("l1", "sum"))
            if dcol is not None and len(df):
                # one 2^p register blob per (win, grp, late) row — a
                # single np.maximum.at over (row-code, bucket), the
                # approx_distinct_by combiner shape
                codes, uniq = pd.factorize(
                    pd.Series(list(zip(df["win"], df["grp"],
                                       df["late"]))))
                idx, rank = _bucket_rank(dh, hll_p)
                regs = np.zeros((len(uniq), 1 << hll_p), dtype=np.int8)
                np.maximum.at(regs, (codes, idx), rank)
                by_key = {kk: regs[i].tobytes()
                          for i, kk in enumerate(uniq)}
                g["regs"] = [by_key[(w, gr, lt)] for w, gr, lt in
                             zip(g["win"], g["grp"], g["late"])]
            elif dcol is not None:
                g["regs"] = pd.Series(dtype="object")
            g["max_ts"] = int(ts.max()) if len(ts) else -1
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = (_slim_events(self.binlog_dir, lo, hi, gcol, self.dedup,
                              dcol=dcol)
                 .map_batches(part, batch_format="pyarrow").to_pandas())

        seq = int(man["seq"]) + 1
        open_df = self._open_state(man)
        n_late = 0
        batch_max_ts = man["max_ts"]
        if len(parts):
            n_late = int(parts["late1"].sum())
            live = parts[~parts["late"]]
            if dcol is None:
                fold = pd.concat(
                    [open_df, live[["win", "grp", "n", "bytes"]]],
                    ignore_index=True).groupby(
                        ["win", "grp"], as_index=False).agg(
                            n=("n", "sum"), bytes=("bytes", "sum"))
            else:
                cat = pd.concat(
                    [open_df, live[["win", "grp", "n", "bytes", "regs"]]],
                    ignore_index=True)
                rows = []
                m = 1 << hll_p
                # Python loop over OPEN WINDOWS (state-sized, not
                # event-sized); registers merge with elementwise max
                for (w, gr), gg in cat.groupby(["win", "grp"],
                                               sort=False):
                    merged = np.frombuffer(
                        b"".join(gg["regs"]), dtype=np.int8)                         .reshape(len(gg), m).max(axis=0)
                    rows.append({"win": w, "grp": gr,
                                 "n": int(gg["n"].sum()),
                                 "bytes": int(gg["bytes"].sum()),
                                 "regs": merged.tobytes()})
                fold = pd.DataFrame(rows)
            open_df = fold
            m = int(parts["max_ts"].max())
            batch_max_ts = m if batch_max_ts is None \
                else max(int(batch_max_ts), m)

        watermark = None if batch_max_ts is None \
            else int(batch_max_ts) - self.lateness_us
        if watermark is not None and len(open_df):
            done = open_df["win"] + w_us <= watermark
            emit = open_df[done].sort_values(
                ["win", "grp"], kind="stable").reset_index(drop=True)
            open_df = open_df[~done].reset_index(drop=True)
        else:
            emit = open_df.iloc[0:0]
        if dcol is not None:
            from thor_ray.ops.sketch import _hll_estimate
            emit = emit.copy()
            emit["ndv"] = [int(round(_hll_estimate(
                np.frombuffer(r, dtype=np.int8)))) for r in emit["regs"]]
            emit = emit.drop(columns=["regs"])

        # deterministic names, manifest swap last (exactly-once)
        _put_parquet(emit, os.path.join(
            self.out_dir, f"emit-b{seq:06d}.parquet"))
        _put_parquet(
            open_df.sort_values(["win", "grp"], kind="stable")
            .reset_index(drop=True),
            os.path.join(self.out_dir, f"open-b{seq:06d}.parquet"))
        man.update({"seq": seq, "upto_lsn": hi, "max_ts": batch_max_ts,
                    "watermark": watermark,
                    "late_events": int(man["late_events"]) + n_late})
        _atomic_json(os.path.join(self.out_dir, _MANIFEST), man)
        # superseded open-state files are dead after the swap
        for f in glob.glob(os.path.join(self.out_dir, "open-b*.parquet")):
            if f != os.path.join(self.out_dir,
                                 f"open-b{seq:06d}.parquet"):
                os.remove(f)
        _beat(self.out_dir, {
            "kind": "window", "seq": seq, "upto_lsn": hi,
            "watermark": watermark, "emitted": int(len(emit)),
            "open": int(len(open_df)), "late": n_late,
            "wall_sec": round(time.perf_counter() - t_adv, 4)})
        return {"emitted": int(len(emit)), "late": n_late,
                "watermark": watermark}

    # -- reads --------------------------------------------------------
    def emitted(self, since_seq: int = 0,
                upto_seq: int | None = None) -> pd.DataFrame:
        """Finalized windows in emission order (stable across re-runs:
        deterministic batch files). ``since_seq``/``upto_seq`` page by
        advance batch — a long-running follow() accumulates thousands of
        emit files, and a downstream poller should read only
        ``since_seq=last_seen`` (its own durable offset), not re-concat
        history every call."""
        man = self._load()
        hi = int(man["seq"]) if upto_seq is None else min(
            int(upto_seq), int(man["seq"]))
        frames = [pd.read_parquet(os.path.join(
            self.out_dir, f"emit-b{s:06d}.parquet"))
            for s in range(max(1, int(since_seq) + 1), hi + 1)]
        frames = [f for f in frames if len(f)]
        if not frames:
            # empty fallback must carry the EMITTED schema, not the
            # open-state one: with distinct_col set, emit frames have an
            # int64 'ndv' and no 'regs' — a paging poller hitting an idle
            # window (since_seq=last_seen) reads this on every call
            empty = self._open_state({"seq": 0})
            if self.distinct_col is not None:
                empty = empty.drop(columns=["regs"])
                empty["ndv"] = pd.Series(dtype="int64")
            return empty
        return pd.concat(frames, ignore_index=True)

    def open_windows(self) -> pd.DataFrame:
        return self._open_state(self._load())

    def late_events(self) -> int:
        return int(self._load()["late_events"])


def _merge_clusters(df: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    """Merge per-group [start, end] clusters whose gap ≤ gap_us into
    sessions (sessionization = connected components on the time line, so
    clusters from ANY partition of the events merge associatively to the
    sessions of the union — counts and byte sums just add)."""
    if not len(df):
        return df
    df = df.sort_values(["grp", "start"], kind="stable")
    out = []
    for grp, g in df.groupby("grp", sort=False):
        s = g["start"].to_numpy()
        e = g["end"].to_numpy()
        n = g["n"].to_numpy()
        b = g["bytes"].to_numpy()
        # cumulative running max of end defines the chain; a new session
        # starts where start - max(prev ends) > gap
        run_end = np.maximum.accumulate(e)
        brk = np.r_[True, s[1:] - run_end[:-1] > gap_us]
        sid = np.cumsum(brk) - 1
        agg = pd.DataFrame({"sid": sid, "s": s, "e": e, "n": n, "b": b}) \
            .groupby("sid", as_index=False).agg(
                start=("s", "min"), end=("e", "max"),
                n=("n", "sum"), bytes=("b", "sum"))
        agg.insert(0, "grp", grp)
        out.append(agg[["grp", "start", "end", "n", "bytes"]])
    return pd.concat(out, ignore_index=True)


class SessionAggregator:
    """Gap-based event-time SESSION windows maintained incrementally from
    the binlog — the merging-window tier of :class:`WindowedAggregator`
    (Flink session windows with watermark emission).

    Per micro-batch, each Ray batch emits its own per-group session
    CLUSTERS ([min ts, max ts], count, byte sum) — cluster rows, never
    events — and the driver merges them with the open sessions by
    interval chaining (associative, so any partition of the events folds
    to the same sessions). A session is EMITTED once
    ``end + gap ≤ watermark``: no in-order event can extend it (anything
    later than the watermark starts a new session by definition). Events
    at or below the committed watermark might have extended an
    already-emitted session, so they are counted LATE and excluded —
    the same side-output contract as the tumbling tier.

    Exactly-once protocol (deterministic ``semit-b{seq}`` /
    ``sopen-b{seq}`` files + manifest swap) is shared with
    WindowedAggregator.
    """

    def __init__(self, binlog_dir: str, out_dir: str, gap_us: int,
                 lateness_us: int = 0, group_col: str = "op",
                 on_retention: str = "error", dedup: bool = True):
        self.binlog_dir = binlog_dir
        self.out_dir = out_dir
        self.on_retention = on_retention
        self.dedup = dedup
        self.gap_us = int(gap_us)
        self.lateness_us = int(lateness_us)
        self.group_col = group_col
        os.makedirs(out_dir, exist_ok=True)

    _MAN = "_session_manifest.json"

    def _load(self) -> dict:
        p = os.path.join(self.out_dir, self._MAN)
        if not os.path.exists(p):
            return {"seq": 0, "upto_lsn": 0, "max_ts": None,
                    "watermark": None, "late_events": 0,
                    "config": {"gap_us": self.gap_us,
                               "lateness_us": self.lateness_us,
                               "group_col": self.group_col}}
        with open(p) as f:
            man = json.load(f)
        if man["config"] != {"gap_us": self.gap_us,
                             "lateness_us": self.lateness_us,
                             "group_col": self.group_col}:
            raise ValueError(f"session config changed since {p} was "
                             "written; use a fresh out_dir")
        return man

    def _open_state(self, man: dict) -> pd.DataFrame:
        if man["seq"] == 0:
            return pd.DataFrame({
                "grp": pd.Series(dtype="object"),
                "start": pd.Series(dtype="int64"),
                "end": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "bytes": pd.Series(dtype="int64")})
        return pd.read_parquet(os.path.join(
            self.out_dir, f"sopen-b{man['seq']:06d}.parquet"))

    def advance(self, complete: bool = False, slack: int = 0) -> dict:
        from thor_ray.sources import binlog as B

        t_adv = time.perf_counter()
        man = self._load()
        hi = B.max_lsn(self.binlog_dir) if complete \
            else B.safe_frontier(self.binlog_dir, slack)
        lo = _retention_guard(self.binlog_dir, int(man["upto_lsn"]),
                              self.on_retention, self.out_dir, "session")
        if hi <= lo:
            _beat(self.out_dir, {"kind": "session", "seq": man["seq"],
                                 "upto_lsn": lo, "noop": True,
                                 "watermark": man["watermark"]})
            return {"emitted": 0, "late": 0,
                    "watermark": man["watermark"]}

        gap_us = self.gap_us
        gcol = self.group_col
        wm_bc = -1 if man["watermark"] is None else int(man["watermark"])

        def part(t: pa.Table) -> pa.Table:
            ts = t["ts"].to_numpy(zero_copy_only=False)
            grp = t["grp"].to_numpy(zero_copy_only=False)
            nbytes = t["b"].to_numpy(zero_copy_only=False)
            late = ts <= wm_bc
            df = pd.DataFrame({"grp": grp, "ts": ts, "b": nbytes,
                               "late": late})
            n_late = int(late.sum())
            df = df[~df["late"]]
            if len(df):
                df = df.sort_values(["grp", "ts"], kind="stable")
                gvals = df["grp"].to_numpy()
                tv = df["ts"].to_numpy()
                brk = np.r_[True, (gvals[1:] != gvals[:-1])
                            | (tv[1:] - tv[:-1] > gap_us)]
                sid = np.cumsum(brk) - 1
                cl = pd.DataFrame({
                    "sid": sid, "grp": gvals, "ts": tv,
                    "b": df["b"].to_numpy()}).groupby(
                        ["sid", "grp"], as_index=False).agg(
                            start=("ts", "min"), end=("ts", "max"),
                            n=("b", "size"), bytes=("b", "sum"))
                cl = cl[["grp", "start", "end", "n", "bytes"]]
            else:
                cl = pd.DataFrame({"grp": pd.Series(dtype="object"),
                                   "start": pd.Series(dtype="int64"),
                                   "end": pd.Series(dtype="int64"),
                                   "n": pd.Series(dtype="int64"),
                                   "bytes": pd.Series(dtype="int64")})
            # one MARKER row per source batch carries the side counters
            # (late count, max ts); cluster rows carry zeros — summing
            # over all rows is then exact with no cross-batch dedup
            cl["late_n"] = 0
            cl["max_ts"] = -1
            marker = pd.DataFrame([{
                "grp": None, "start": -1, "end": -1, "n": 0, "bytes": 0,
                "late_n": n_late,
                "max_ts": int(ts.max()) if len(ts) else -1}])
            cl = pd.concat([cl, marker], ignore_index=True)
            return pa.Table.from_pandas(cl, preserve_index=False)

        parts = (_slim_events(self.binlog_dir, lo, hi, gcol, self.dedup)
                 .map_batches(part, batch_format="pyarrow").to_pandas())

        seq = int(man["seq"]) + 1
        open_df = self._open_state(man)
        n_late = 0
        batch_max_ts = man["max_ts"]
        if len(parts):
            n_late = int(parts["late_n"].sum())
            live = parts[parts["grp"].notna()]
            fold = pd.concat(
                [open_df, live[["grp", "start", "end", "n", "bytes"]]
                 .astype({"start": "int64", "end": "int64",
                          "n": "int64", "bytes": "int64"})],
                ignore_index=True)
            open_df = _merge_clusters(fold, gap_us)
            m = int(parts["max_ts"].max())
            if m >= 0:
                batch_max_ts = m if batch_max_ts is None \
                    else max(int(batch_max_ts), m)

        watermark = None if batch_max_ts is None \
            else int(batch_max_ts) - self.lateness_us
        if watermark is not None and len(open_df):
            done = open_df["end"] + gap_us <= watermark
            emit = open_df[done].sort_values(
                ["grp", "start"], kind="stable").reset_index(drop=True)
            open_df = open_df[~done].reset_index(drop=True)
        else:
            emit = open_df.iloc[0:0]

        _put_parquet(emit, os.path.join(
            self.out_dir, f"semit-b{seq:06d}.parquet"))
        _put_parquet(
            open_df.sort_values(["grp", "start"], kind="stable")
            .reset_index(drop=True),
            os.path.join(self.out_dir, f"sopen-b{seq:06d}.parquet"))
        man.update({"seq": seq, "upto_lsn": hi, "max_ts": batch_max_ts,
                    "watermark": watermark,
                    "late_events": int(man["late_events"]) + n_late})
        _atomic_json(os.path.join(self.out_dir, self._MAN), man)
        for f in glob.glob(os.path.join(self.out_dir,
                                        "sopen-b*.parquet")):
            if f != os.path.join(self.out_dir,
                                 f"sopen-b{seq:06d}.parquet"):
                os.remove(f)
        _beat(self.out_dir, {
            "kind": "session", "seq": seq, "upto_lsn": hi,
            "watermark": watermark, "emitted": int(len(emit)),
            "open": int(len(open_df)), "late": n_late,
            "wall_sec": round(time.perf_counter() - t_adv, 4)})
        return {"emitted": int(len(emit)), "late": n_late,
                "watermark": watermark}

    def emitted(self, since_seq: int = 0,
                upto_seq: int | None = None) -> pd.DataFrame:
        """Finalized sessions; pages by advance batch like
        WindowedAggregator.emitted."""
        man = self._load()
        hi = int(man["seq"]) if upto_seq is None else min(
            int(upto_seq), int(man["seq"]))
        frames = [pd.read_parquet(os.path.join(
            self.out_dir, f"semit-b{s:06d}.parquet"))
            for s in range(max(1, int(since_seq) + 1), hi + 1)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return self._open_state({"seq": 0})
        return pd.concat(frames, ignore_index=True)

    def open_sessions(self) -> pd.DataFrame:
        return self._open_state(self._load())

    def late_events(self) -> int:
        return int(self._load()["late_events"])


class IntervalJoinStream:
    """Stream-stream interval join over two binlogs — the Kafka-Streams
    KStream-KStream / Flink ``intervalJoin`` shape: a left event ``l``
    matches right events ``r`` of the same key with

        r.ts ∈ [l.ts + lo_us, l.ts + hi_us]        (lo may be negative)

    maintained incrementally. Each ``advance()`` consumes both logs'
    next lsn ranges; NEW left events match against the full right state
    (old + new), new right events against the OLD left state only — every
    in-order pair is produced exactly once. State is pruned by the
    watermark: a right event is dead once ``r.ts < wm + lo_us`` (no
    future in-order left can reach back to it), a left event once
    ``l.ts + hi_us < wm`` — so state size is bounded by the interval
    span × event rate, independent of stream length. Events at or below
    the committed watermark may have lost pruned partners; they are
    counted LATE and excluded (the side-output contract).

    The corpus-sized work is distributed: each Ray batch of new events
    matches against the broadcast (``ray.put``) state with per-key
    sort + searchsorted — only (key, lsn, ts) triples ever reach the
    driver-held state, never payloads. Scale path past a driver-held
    state: partition both logs by key hash and run one IntervalJoinStream
    per partition (the demux route family gives exactly this layout).

    Exactly-once: ``jmatch-b{seq}`` / ``jstate-b{seq}`` deterministic
    files + manifest swap (the shared IVM protocol).
    """

    _MAN = "_ijoin_manifest.json"

    def __init__(self, left_dir: str, right_dir: str, out_dir: str,
                 lo_us: int, hi_us: int, key_col: str = "repo",
                 lateness_us: int = 0, on_retention: str = "error",
                 key_route: "tuple[int, int] | None" = None):
        self.on_retention = on_retention
        if lo_us > hi_us:
            raise ValueError(f"lo_us={lo_us} > hi_us={hi_us}")
        self.left_dir, self.right_dir = left_dir, right_dir
        self.out_dir = out_dir
        self.lo_us, self.hi_us = int(lo_us), int(hi_us)
        self.key_col = key_col
        self.lateness_us = int(lateness_us)
        # (route_id, n_routes): consume only this key partition — the
        # demux scale tier (PartitionedIntervalJoin) runs one instance
        # per route so no instance holds more than 1/n of the state
        self.key_route = key_route
        os.makedirs(out_dir, exist_ok=True)

    def _cfg(self) -> dict:
        return {"lo_us": self.lo_us, "hi_us": self.hi_us,
                "key_col": self.key_col,
                "lateness_us": self.lateness_us,
                "key_route": list(self.key_route)
                if self.key_route else None}

    def _load(self) -> dict:
        p = os.path.join(self.out_dir, self._MAN)
        if not os.path.exists(p):
            return {"seq": 0, "upto_l": 0, "upto_r": 0, "max_ts": None,
                    "watermark": None, "late_events": 0,
                    "config": self._cfg()}
        with open(p) as f:
            man = json.load(f)
        stored = dict(man["config"])
        stored.setdefault("key_route", None)  # pre-route manifests
        if stored != self._cfg():
            raise ValueError(f"interval-join config changed since {p} "
                             "was written; use a fresh out_dir")
        return man

    def _state(self, man: dict) -> pd.DataFrame:
        if man["seq"] == 0:
            return pd.DataFrame({"side": pd.Series(dtype="object"),
                                 "key": pd.Series(dtype="object"),
                                 "lsn": pd.Series(dtype="int64"),
                                 "ts": pd.Series(dtype="int64")})
        return pd.read_parquet(os.path.join(
            self.out_dir, f"jstate-b{man['seq']:06d}.parquet"))

    @staticmethod
    def _gather(binlog_dir: str, lo: int, hi: int, key_col: str,
                wm_bc: int, key_route: "tuple[int, int] | None" = None
                ) -> tuple[pd.DataFrame, int, int]:
        """(key, lsn, ts) triples of the new range (distributed read +
        column prune; the driver receives id-sized rows, no payloads),
        plus (n_late, max_ts). ``key_route`` filters to one key
        partition inside the map (vectorized stable-hash route — the
        same mix the lake demux uses)."""
        from thor_ray.sources import binlog as B

        def slim(t: pa.Table) -> pa.Table:
            if key_route is not None:
                from thor_ray.pipelines.cdc import route_of
                from thor_ray.stages.smt import stable_hash

                rid, n = key_route
                h = stable_hash(pa.table({"k": t[key_col]}), ["k"])
                t = t.filter(pa.array(route_of(h, n) == rid))
            ts = t["ts"].cast(pa.int64())
            return pa.table({"key": t[key_col].cast(pa.string()),
                             "lsn": t["lsn"], "ts": ts})

        empty = pd.DataFrame({"key": pd.Series(dtype="object"),
                              "lsn": pd.Series(dtype="int64"),
                              "ts": pd.Series(dtype="int64")})
        if hi <= lo:
            return (empty, 0, -1)
        df = (B.read_epoch(binlog_dir, lo, hi,
                           columns=["lsn", "ts", key_col])
              .map_batches(slim, batch_format="pyarrow").to_pandas())
        if not len(df):
            return (empty, 0, -1)
        # at-least-once re-delivery: duplicate copies keep their lsn, and
        # an lsn is consumed in exactly one range — dedup here is the
        # consumer's W4 duplicate-drop (a pair must be produced once)
        df = df.drop_duplicates("lsn").reset_index(drop=True)
        late = df["ts"].to_numpy() <= wm_bc
        return (df[~late].reset_index(drop=True), int(late.sum()),
                int(df["ts"].max()))

    @staticmethod
    def _match(lefts: pd.DataFrame, rights: pd.DataFrame,
               lo_us: int, hi_us: int) -> pd.DataFrame:
        """All (l, r) same-key pairs with r.ts ∈ [l.ts+lo, l.ts+hi] —
        per-key sort + searchsorted, vectorized over the window spans."""
        cols = ["key", "l_lsn", "l_ts", "r_lsn", "r_ts"]
        if not len(lefts) or not len(rights):
            return pd.DataFrame(columns=cols)
        out = []
        r_by_key = {k: g.sort_values("ts", kind="stable")
                    for k, g in rights.groupby("key", sort=False)}
        for k, lg in lefts.groupby("key", sort=False):
            rg = r_by_key.get(k)
            if rg is None:
                continue
            rts = rg["ts"].to_numpy()
            rlsn = rg["lsn"].to_numpy()
            lts = lg["ts"].to_numpy()
            llsn = lg["lsn"].to_numpy()
            i0 = np.searchsorted(rts, lts + lo_us, side="left")
            i1 = np.searchsorted(rts, lts + hi_us, side="right")
            cnt = i1 - i0
            keep = cnt > 0
            if not keep.any():
                continue
            reps = cnt[keep]
            idx = (np.repeat(i0[keep], reps)
                   + _concat_ranges(reps))
            out.append(pd.DataFrame({
                "key": k,
                "l_lsn": np.repeat(llsn[keep], reps),
                "l_ts": np.repeat(lts[keep], reps),
                "r_lsn": rlsn[idx],
                "r_ts": rts[idx]}))
        if not out:
            return pd.DataFrame(columns=cols)
        return pd.concat(out, ignore_index=True)[cols]

    def advance(self, complete: bool = False, slack: int = 0) -> dict:
        from thor_ray.sources import binlog as B

        man = self._load()
        hi_l = B.max_lsn(self.left_dir) if complete \
            else B.safe_frontier(self.left_dir, slack)
        hi_r = B.max_lsn(self.right_dir) if complete \
            else B.safe_frontier(self.right_dir, slack)
        t_adv = time.perf_counter()
        lo_l = _retention_guard(self.left_dir, int(man["upto_l"]),
                                self.on_retention, self.out_dir,
                                "interval_join")
        lo_r = _retention_guard(self.right_dir, int(man["upto_r"]),
                                self.on_retention, self.out_dir,
                                "interval_join")
        if hi_l <= lo_l and hi_r <= lo_r:
            _beat(self.out_dir, {"kind": "interval_join",
                                 "seq": man["seq"], "noop": True,
                                 "watermark": man["watermark"]})
            return {"matches": 0, "late": 0,
                    "watermark": man["watermark"]}

        wm_bc = -1 if man["watermark"] is None else int(man["watermark"])
        new_l, late_l, mts_l = self._gather(
            self.left_dir, lo_l, hi_l, self.key_col, wm_bc,
            self.key_route)
        new_r, late_r, mts_r = self._gather(
            self.right_dir, lo_r, hi_r, self.key_col, wm_bc,
            self.key_route)

        state = self._state(man)
        old_l = state[state["side"] == "L"][["key", "lsn", "ts"]]
        old_r = state[state["side"] == "R"][["key", "lsn", "ts"]]

        # new L × (old R + new R), then new R × old L — exactly once
        all_r = pd.concat([old_r, new_r], ignore_index=True)
        m1 = self._match(new_l, all_r, self.lo_us, self.hi_us)
        # right-perspective: l.ts ∈ [r.ts - hi, r.ts - lo]
        m2 = self._match(new_r, old_l, -self.hi_us, -self.lo_us)
        m2 = m2.rename(columns={"l_lsn": "r_lsn", "l_ts": "r_ts",
                                "r_lsn": "l_lsn", "r_ts": "l_ts"})
        matches = pd.concat([m1, m2[m1.columns]], ignore_index=True) \
            .sort_values(["key", "l_lsn", "r_lsn"], kind="stable") \
            .reset_index(drop=True)

        # watermark + state pruning (explicit None check: a stored
        # max_ts of 0 is a real timestamp, `or -1` would regress it)
        prev_max = -1 if man["max_ts"] is None else int(man["max_ts"])
        batch_max = max(prev_max, mts_l, mts_r)
        watermark = None if batch_max < 0 \
            else batch_max - self.lateness_us
        keep_l = pd.concat([old_l, new_l], ignore_index=True)
        keep_r = all_r
        if watermark is not None:
            keep_l = keep_l[keep_l["ts"] + self.hi_us >= watermark]
            keep_r = keep_r[keep_r["ts"] >= watermark + self.lo_us]
        nstate = pd.concat([keep_l.assign(side="L"),
                            keep_r.assign(side="R")], ignore_index=True)
        nstate = nstate[["side", "key", "lsn", "ts"]].sort_values(
            ["side", "key", "lsn"], kind="stable").reset_index(drop=True)

        seq = int(man["seq"]) + 1
        _put_parquet(matches, os.path.join(
            self.out_dir, f"jmatch-b{seq:06d}.parquet"))
        _put_parquet(nstate, os.path.join(
            self.out_dir, f"jstate-b{seq:06d}.parquet"))
        man.update({"seq": seq, "upto_l": hi_l, "upto_r": hi_r,
                    "max_ts": batch_max if batch_max >= 0 else None,
                    "watermark": watermark,
                    "late_events": int(man["late_events"])
                    + late_l + late_r})
        _atomic_json(os.path.join(self.out_dir, self._MAN), man)
        for f in glob.glob(os.path.join(self.out_dir,
                                        "jstate-b*.parquet")):
            if f != os.path.join(self.out_dir,
                                 f"jstate-b{seq:06d}.parquet"):
                os.remove(f)
        _beat(self.out_dir, {
            "kind": "interval_join", "seq": seq, "upto_l": hi_l,
            "upto_r": hi_r, "watermark": watermark,
            "matches": int(len(matches)), "state": int(len(nstate)),
            "late": late_l + late_r,
            "wall_sec": round(time.perf_counter() - t_adv, 4)})
        return {"matches": int(len(matches)),
                "late": late_l + late_r, "watermark": watermark}

    def matches(self, since_seq: int = 0,
                upto_seq: int | None = None) -> pd.DataFrame:
        """Matched pairs; pages by advance batch like
        WindowedAggregator.emitted."""
        man = self._load()
        hi = int(man["seq"]) if upto_seq is None else min(
            int(upto_seq), int(man["seq"]))
        frames = [pd.read_parquet(os.path.join(
            self.out_dir, f"jmatch-b{s:06d}.parquet"))
            for s in range(max(1, int(since_seq) + 1), hi + 1)]
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame(columns=["key", "l_lsn", "l_ts",
                                         "r_lsn", "r_ts"])
        return pd.concat(frames, ignore_index=True)

    def late_events(self) -> int:
        return int(self._load()["late_events"])


class HeavyHittersConsumer:
    """Streaming top-k heavy hitters over the binlog — a Misra-Gries
    summary of ``group_col`` maintained incrementally with the same
    exactly-once micro-batch protocol as the window consumers (the
    Kafka-Streams KTable-of-counts-with-bounded-state analogue).

    Per ``advance()``, each Ray batch emits its EXACT per-label counts
    (a vectorized combiner — label-cardinality-sized rows, never
    events); the driver folds them into the persistent k-counter sketch
    and applies one Misra-Gries reduction (subtract the (k+1)-th
    largest weight, drop non-positives). Standard MG guarantees hold
    cumulatively: every label with true frequency > N/(k+1) of the N
    consumed events is present, and each kept counter undercounts its
    true frequency by at most ``error_bound()`` = the total weight ever
    subtracted. ``dedup=True`` (default) counts exactly-once by lsn
    (the consumers' shared slim-dedup shuffle tier).

    Exactly-once: deterministic ``hh-b{seq}.parquet`` state files + a
    manifest swapped LAST (the shared IVM protocol) — a crashed
    advance() re-runs idempotently. ``follow(on_apply=[hh.advance])``
    keeps it current with the stream."""

    _MAN = "_hh_manifest.json"

    def __init__(self, binlog_dir: str, out_dir: str, k: int = 16,
                 group_col: str = "op", on_retention: str = "error",
                 dedup: bool = True):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.binlog_dir = binlog_dir
        self.out_dir = out_dir
        self.k = int(k)
        self.group_col = group_col
        self.on_retention = on_retention
        self.dedup = dedup
        os.makedirs(out_dir, exist_ok=True)

    def _load(self) -> dict:
        p = os.path.join(self.out_dir, self._MAN)
        if not os.path.exists(p):
            return {"seq": 0, "upto_lsn": 0, "n_events": 0,
                    "subtracted": 0,
                    "config": {"k": self.k, "group_col": self.group_col}}
        with open(p) as f:
            man = json.load(f)
        if man["config"] != {"k": self.k, "group_col": self.group_col}:
            raise ValueError(f"heavy-hitters config changed since {p} "
                             "was written; use a fresh out_dir")
        return man

    def _state(self, man: dict) -> pd.DataFrame:
        if man["seq"] == 0:
            return pd.DataFrame({"grp": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.read_parquet(os.path.join(
            self.out_dir, f"hh-b{man['seq']:06d}.parquet"))

    def advance(self, complete: bool = False, slack: int = 0) -> dict:
        from thor_ray.sources import binlog as B

        t_adv = time.perf_counter()
        man = self._load()
        hi = B.max_lsn(self.binlog_dir) if complete \
            else B.safe_frontier(self.binlog_dir, slack)
        lo = _retention_guard(self.binlog_dir, int(man["upto_lsn"]),
                              self.on_retention, self.out_dir, "hh")
        if hi <= lo:
            _beat(self.out_dir, {"kind": "hh", "seq": man["seq"],
                                 "upto_lsn": lo, "noop": True})
            return {"events": 0, "hitters": None}

        def part(t: pa.Table) -> pa.Table:
            if not len(t):   # typed empty: np.unique of [] yields a
                return pa.table({"grp": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            g = t["grp"].to_numpy(zero_copy_only=False)
            ug, cnt = np.unique(g, return_counts=True)
            return pa.table({"grp": pa.array(ug.astype(object),
                                             type=pa.string()),
                             "n": pa.array(cnt.astype(np.int64))})

        parts = (_slim_events(self.binlog_dir, lo, hi, self.group_col,
                              self.dedup)
                 .map_batches(part, batch_format="pyarrow").to_pandas())
        n_new = int(parts["n"].sum()) if len(parts) else 0
        fold = pd.concat([self._state(man), parts], ignore_index=True) \
            .groupby("grp", as_index=False)["n"].sum() if len(parts) \
            else self._state(man)
        subtracted = int(man["subtracted"])
        if len(fold) > self.k:
            # one MG reduction: subtract the (k+1)-th largest weight
            w = np.sort(fold["n"].to_numpy())[::-1]
            cut = int(w[self.k])
            fold = fold.assign(n=fold["n"] - cut)
            fold = fold[fold["n"] > 0].reset_index(drop=True)
            subtracted += cut
        fold = fold.sort_values(["n", "grp"], ascending=[False, True],
                                kind="stable").reset_index(drop=True)

        seq = int(man["seq"]) + 1
        _put_parquet(fold, os.path.join(
            self.out_dir, f"hh-b{seq:06d}.parquet"))
        man.update({"seq": seq, "upto_lsn": hi,
                    "n_events": int(man["n_events"]) + n_new,
                    "subtracted": subtracted})
        _atomic_json(os.path.join(self.out_dir, self._MAN), man)
        for f in glob.glob(os.path.join(self.out_dir, "hh-b*.parquet")):
            if f != os.path.join(self.out_dir, f"hh-b{seq:06d}.parquet"):
                os.remove(f)
        _beat(self.out_dir, {
            "kind": "hh", "seq": seq, "upto_lsn": hi, "events": n_new,
            "hitters": int(len(fold)), "subtracted": subtracted,
            "wall_sec": round(time.perf_counter() - t_adv, 4)})
        return {"events": n_new, "hitters": int(len(fold))}

    def hitters(self) -> pd.DataFrame:
        """Current summary: (grp, n) where n is a LOWER bound on the
        label's exactly-once frequency; true count <= n + error_bound()."""
        return self._state(self._load())

    def error_bound(self) -> int:
        return int(self._load()["subtracted"])

    def n_events(self) -> int:
        return int(self._load()["n_events"])


class PartitionedIntervalJoin:
    """Key-hash-partitioned interval join — the scale tier of
    :class:`IntervalJoinStream` (whose docstring names exactly this
    layout): N independent per-route joins over the SAME two logs, each
    consuming only keys with ``route_of(stable_hash(key), n) == i``, so
    no instance holds more than ~1/N of the interval state and the
    per-route state fits any driver. Matched pairs always share a key,
    hence a route — the union of the routes' matches equals the
    unpartitioned join exactly (asserted in tests). Each route keeps
    its own watermark / manifest under ``out_dir/route=<i>/`` (the
    Kafka-partition semantics: a sparse route's watermark lags
    independently), and the whole family advances with one call —
    sequential here; on a cluster each route is its own driver process,
    exactly like the lake demux family."""

    def __init__(self, left_dir: str, right_dir: str, out_dir: str,
                 lo_us: int, hi_us: int, n_routes: int,
                 key_col: str = "repo", lateness_us: int = 0,
                 on_retention: str = "error"):
        if n_routes < 1:
            raise ValueError(f"n_routes must be >= 1, got {n_routes}")
        self.parts = [
            IntervalJoinStream(
                left_dir, right_dir,
                os.path.join(out_dir, f"route={i:03d}"),
                lo_us, hi_us, key_col=key_col, lateness_us=lateness_us,
                on_retention=on_retention, key_route=(i, n_routes))
            for i in range(n_routes)]

    def advance(self, complete: bool = False, slack: int = 0) -> dict:
        tot = {"matches": 0, "late": 0, "watermark": None}
        for p in self.parts:
            r = p.advance(complete=complete, slack=slack)
            tot["matches"] += r["matches"]
            tot["late"] += r["late"]
            if r["watermark"] is not None:
                tot["watermark"] = r["watermark"] if tot["watermark"] \
                    is None else min(tot["watermark"], r["watermark"])
        return tot

    def matches(self, since_seq: int = 0,
                upto_seq: "int | None" = None) -> pd.DataFrame:
        frames = [p.matches(since_seq, upto_seq) for p in self.parts]
        return pd.concat(frames, ignore_index=True).sort_values(
            ["key", "l_lsn", "r_lsn"], kind="stable").reset_index(
                drop=True)

    def late_events(self) -> int:
        return sum(p.late_events() for p in self.parts)


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0) ++ [0..c1) ++ ... as one vector (offset-vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def consumer_seq(out_dir: str, manifest_name: str) -> int:
    """Current advance-batch sequence of a stream consumer's out_dir —
    the offset a paging reader should persist alongside its own state."""
    p = os.path.join(out_dir, manifest_name)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["seq"])
