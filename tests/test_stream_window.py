"""Event-time windowed aggregation consumer (pipelines/stream_window.py):
oracle recount equality, stepwise == one-shot over a growing log, late
side-output accounting on a hand-built out-of-order fixture, and
torn-commit idempotence (IVM exactly-once protocol)."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen
from thor_ray.pipelines.stream_window import WindowedAggregator

W_US = 200_000  # 200 lsn at the generator's 1 ms/lsn event-time cadence


def _write_log(work: str, n_events: int = 3_000, seed: int = 9,
               **kw) -> str:
    base = gen.gen_base_table(n_repos=10, paths_per_repo=8, seed=seed)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=n_events, n_shards=3, seed=seed, **kw))
    bdir = os.path.join(work, "binlog")
    log.write(bdir)
    return bdir


def _recount(bdir: str, w_us: int, lateness_us: int) -> tuple:
    """Driver-side oracle: fold every data event EXACTLY once — the
    consumer's default lsn dedup drops the log's at-least-once
    re-delivered copies, so the oracle keeps one copy per lsn too."""
    frames = [pq.read_table(f, columns=["lsn", "op", "ts", "content"])
              .to_pandas()
              for f in sorted(glob.glob(
                  os.path.join(bdir, "shard-*.parquet")))]
    ev = pd.concat(frames, ignore_index=True)
    ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn").copy()
    ts = ev["ts"].astype("int64")
    ev["win"] = (ts // w_us) * w_us
    ev["b"] = [len(c.encode()) if isinstance(c, str) else 0
               for c in ev["content"]]
    g = ev.groupby(["win", "op"], as_index=False).agg(
        n=("b", "size"), bytes=("b", "sum"))
    g = g.rename(columns={"op": "grp"})
    wm = int(ts.max()) - lateness_us
    done = g["win"] + w_us <= wm
    emitted = g[done].sort_values(["win", "grp"]).reset_index(drop=True)
    open_w = g[~done].sort_values(["win", "grp"]).reset_index(drop=True)
    return emitted, open_w, wm


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["win", "grp"], kind="stable") \
        .reset_index(drop=True).astype(
            {"win": "int64", "n": "int64", "bytes": "int64"})


def test_windowed_aggregator_matches_recount(ray_session, tmp_path):
    work = str(tmp_path)
    bdir = _write_log(work)
    lateness = 3 * W_US
    w = WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US,
                           lateness_us=lateness, group_col="op")
    rep = w.advance(complete=True)
    emitted, open_w, wm = _recount(bdir, W_US, lateness)
    assert rep["watermark"] == wm
    pd.testing.assert_frame_equal(_norm(w.emitted()), _norm(emitted))
    pd.testing.assert_frame_equal(_norm(w.open_windows()), _norm(open_w))
    assert w.late_events() == 0          # generator ts is monotone in lsn
    # caught-up advance is a no-op
    assert w.advance(complete=True) == {
        "emitted": 0, "late": 0, "watermark": wm}


def test_stepwise_equals_oneshot(ray_session, tmp_path):
    """A log delivered segment-by-segment: safe-frontier micro-batches
    only consume what EVERY declared shard has delivered (no advance
    while a declared shard is empty — the ADVICE-round-1 contract), and
    the stepwise totals converge to the one-shot fold."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=2_000, seed=11)
    staged = os.path.join(work, "staged")
    os.makedirs(staged)
    segs0, segs1 = [], []
    shard_names = set()
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        # the delivery contract (BinlogProducer): a shard's later segments
        # carry strictly higher lsns — sort before splitting so the staged
        # halves honor it (the raw file is bounded-skew shuffled inside)
        t = pq.read_table(f).sort_by("lsn")
        stem = os.path.basename(f)[:-len(".parquet")]
        shard_names.add(stem[:10])
        half = len(t) // 2
        segs0.append((f"{stem}-a.parquet", t.slice(0, half)))
        segs1.append((f"{stem}-b.parquet", t.slice(half)))
    with open(os.path.join(staged, "_shards.json"), "w") as f:
        json.dump({"shards": sorted(shard_names)}, f)

    w = WindowedAggregator(staged, os.path.join(work, "w_step"), W_US,
                           lateness_us=W_US, group_col="op")
    assert w.advance()["emitted"] == 0   # nothing delivered yet
    pq.write_table(segs0[0][1], os.path.join(staged, segs0[0][0]))
    assert w.advance()["emitted"] == 0   # declared shards still empty
    for name, t in segs0[1:]:
        pq.write_table(t, os.path.join(staged, name))
        w.advance()
    for name, t in segs1:
        pq.write_table(t, os.path.join(staged, name))
        w.advance()
    w.advance(complete=True)             # drain past the safe frontier

    w1 = WindowedAggregator(bdir, os.path.join(work, "w_once"), W_US,
                            lateness_us=W_US, group_col="op")
    w1.advance(complete=True)

    def fold(agg):
        full = pd.concat([agg.emitted(), agg.open_windows()],
                         ignore_index=True)
        return _norm(full.groupby(["win", "grp"], as_index=False).agg(
            n=("n", "sum"), bytes=("bytes", "sum")))

    pd.testing.assert_frame_equal(fold(w), fold(w1))
    # stepwise emitted set is a prefix-consistent subset: nothing emitted
    # twice, and every one-shot-emitted window eventually emitted
    e_step = _norm(w.emitted())
    assert not e_step.duplicated(["win", "grp"]).any()
    e_once = _norm(w1.emitted())
    merged = e_once.merge(e_step, on=["win", "grp"],
                          suffixes=("_once", "_step"))
    assert len(merged) == len(e_once)
    assert (merged["n_once"] == merged["n_step"]).all()


def test_late_events_side_output(ray_session, tmp_path):
    """Hand-built out-of-order log: a second segment delivers events whose
    windows were already finalized — they are COUNTED late and excluded
    from emitted results; in-lateness stragglers still fold in."""
    work = str(tmp_path)
    bdir = os.path.join(work, "binlog")
    os.makedirs(bdir)
    base_ts = 1_600_000_000_000_000     # divisible by W_US

    def seg(path, rows):
        cols = {n: [] for n in gen.EVENT_SCHEMA.names}
        for lsn, ts_off, op in rows:
            cols["lsn"].append(lsn); cols["txn"].append(lsn)
            cols["op"].append(op); cols["repo"].append("r")
            cols["path"].append(f"p{lsn}"); cols["commit"].append("c")
            cols["lang"].append("py"); cols["content"].append("xyz")
            cols["extra"].append("{}"); cols["ddl"].append(None)
            cols["ts"].append(base_ts + ts_off)
            cols["schema_ver"].append(0); cols["shard"].append(0)
        pq.write_table(pa.table(cols, schema=gen.EVENT_SCHEMA),
                       os.path.join(bdir, path))

    # batch 1: events in windows 0 and 2; watermark = base+2.5w →
    # window 0 (end base+w) finalizes, window 2 (end base+3w) stays open
    seg("shard-0000-seg0.parquet",
        [(1, 50_000, "I"), (2, 2 * W_US + W_US // 2, "I")])
    w = WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US,
                           lateness_us=0, group_col="op")
    r1 = w.advance(complete=True)
    assert r1["late"] == 0 and r1["emitted"] == 1
    # batch 2: lsn 3 falls into the finalized window 0 → LATE; lsn 4
    # lands in the still-open window 2 → folds in
    seg("shard-0000-seg1.parquet",
        [(3, 60_000, "I"), (4, 2 * W_US + W_US // 4, "I")])
    r2 = w.advance(complete=True)
    assert r2["late"] == 1
    assert w.late_events() == 1
    open_w = w.open_windows()
    assert int(open_w.loc[open_w["win"] == base_ts + 2 * W_US,
                          "n"].sum()) == 2
    emitted = w.emitted()
    # the late event never mutated the emitted window-0 row
    assert int(emitted.loc[emitted["win"] == base_ts, "n"].sum()) == 1


def test_torn_commit_replays_idempotently(ray_session, tmp_path):
    """A crash after state files land but BEFORE the manifest swap: the
    re-run overwrites the same deterministic files and commits once."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=1_500, seed=13)
    odir = os.path.join(work, "wagg")
    w = WindowedAggregator(bdir, odir, W_US, lateness_us=W_US)
    w.advance(complete=True)
    man_path = os.path.join(odir, "_window_manifest.json")
    committed = json.load(open(man_path))
    want = _norm(w.emitted())

    # torn commit: seq-1 emit/open files exist, manifest never swapped
    os.remove(man_path)
    w2 = WindowedAggregator(bdir, odir, W_US, lateness_us=W_US)
    w2.advance(complete=True)
    assert json.load(open(man_path)) == committed
    pd.testing.assert_frame_equal(_norm(w2.emitted()), want)

    # config drift against a committed manifest is refused
    with pytest.raises(ValueError, match="config changed"):
        WindowedAggregator(bdir, odir, W_US * 2).advance(complete=True)


def test_sliding_windows_match_recount(ray_session, tmp_path):
    """slide_us = window/4: every event lands in 4 overlapping windows;
    emitted+open totals equal a fanout recount, and the per-window event
    totals sum to 4x the tumbling totals."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=1_200, seed=19)
    lateness = W_US
    k = 4
    w = WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US,
                           lateness_us=lateness, group_col="op",
                           slide_us=W_US // k)
    w.advance(complete=True)

    frames = [pq.read_table(f, columns=["lsn", "op", "ts", "content"])
              .to_pandas()
              for f in glob.glob(os.path.join(bdir, "shard-*.parquet"))]
    ev = pd.concat(frames, ignore_index=True)
    ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn").copy()
    ts = ev["ts"].astype("int64").to_numpy()
    import numpy as np
    s = W_US // k
    rows = []
    for j in range(k):
        win = (ts // s) * s - j * s
        rows.append(pd.DataFrame({
            "win": win, "grp": ev["op"].to_numpy(),
            "b": [len(c.encode()) if isinstance(c, str) else 0
                  for c in ev["content"]]}))
    allw = pd.concat(rows, ignore_index=True)
    g = allw.groupby(["win", "grp"], as_index=False).agg(
        n=("b", "size"), bytes=("b", "sum"))
    full = pd.concat([w.emitted(), w.open_windows()], ignore_index=True)
    pd.testing.assert_frame_equal(_norm(full), _norm(g))
    assert int(full["n"].sum()) == k * len(ev)

    # slide that doesn't divide the window is refused up front
    with pytest.raises(ValueError, match="must divide"):
        WindowedAggregator(bdir, os.path.join(work, "bad"), W_US,
                           slide_us=W_US // 3 + 1)


def test_property_random_configs_and_schedules(ray_session, tmp_path):
    """Seeded randomized matrix: random window/lateness/slide configs and
    random segment-delivery schedules (per-shard lsn order preserved).
    Invariants: (a) emitted+open fold == full fanout recount, (b) a
    window row never changes after emission, (c) late events are exactly
    the recount's post-watermark stragglers when lateness=0 and delivery
    is in-order (the generator's monotone-ts case → always 0)."""
    import numpy as np

    rng = np.random.RandomState(23)
    work = str(tmp_path)
    bdir = _write_log(work, n_events=1_500, seed=29)
    shard_tables = {}
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        shard_tables[os.path.basename(f)[:10]] = \
            pq.read_table(f).sort_by("lsn")

    for trial in range(3):
        w_us = int(rng.choice([100_000, 250_000, 400_000]))
        k = int(rng.choice([1, 2, 4]))
        lateness = int(rng.choice([0, w_us, 3 * w_us]))
        staged = os.path.join(work, f"staged{trial}")
        os.makedirs(staged)
        with open(os.path.join(staged, "_shards.json"), "w") as f:
            json.dump({"shards": sorted(shard_tables)}, f)
        w = WindowedAggregator(
            staged, os.path.join(work, f"w{trial}"), w_us,
            lateness_us=lateness, group_col="op",
            slide_us=w_us // k)

        # random delivery: each shard split at random points, delivered
        # round-robin with random advance() calls interleaved
        cursors = {s: 0 for s in shard_tables}
        seg_i = 0
        emitted_seen = {}
        while any(cursors[s] < len(shard_tables[s]) for s in cursors):
            s = rng.choice(sorted(cursors))
            t = shard_tables[s]
            if cursors[s] >= len(t):
                continue
            step = int(rng.randint(1, max(2, len(t) // 2)))
            chunk = t.slice(cursors[s], step)
            cursors[s] += step
            pq.write_table(chunk, os.path.join(
                staged, f"{s}-r{seg_i:03d}.parquet"))
            seg_i += 1
            if rng.rand() < 0.6:
                w.advance()
                for _, r in w.emitted().iterrows():
                    key = (int(r["win"]), r["grp"])
                    if key in emitted_seen:
                        assert emitted_seen[key] == (
                            int(r["n"]), int(r["bytes"])), \
                            f"trial {trial}: emitted row mutated {key}"
                    emitted_seen[key] = (int(r["n"]), int(r["bytes"]))
        w.advance(complete=True)

        # fanout recount over everything
        ev = pd.concat([t.to_pandas() for t in shard_tables.values()],
                       ignore_index=True)
        ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn")
        ts = ev["ts"].astype("int64").to_numpy()
        s_us = w_us // k
        rows = []
        for j in range(k):
            rows.append(pd.DataFrame({
                "win": (ts // s_us) * s_us - j * s_us,
                "grp": ev["op"].to_numpy(),
                "b": [len(c.encode()) if isinstance(c, str) else 0
                      for c in ev["content"]]}))
        g = pd.concat(rows, ignore_index=True).groupby(
            ["win", "grp"], as_index=False).agg(
                n=("b", "size"), bytes=("b", "sum"))
        full = pd.concat([w.emitted(), w.open_windows()],
                         ignore_index=True)
        pd.testing.assert_frame_equal(_norm(full), _norm(g))
        assert w.late_events() == 0, trial


from thor_ray.pipelines.stream_window import SessionAggregator  # noqa: E402

GAP_US = 150_000


def _session_recount(bdir: str, gap_us: int, lateness_us: int) -> tuple:
    """Pandas oracle: sessionize ALL data events per group, then split by
    the final watermark (end + gap <= wm emitted)."""
    import numpy as np
    frames = [pq.read_table(f, columns=["lsn", "op", "ts", "content"])
              .to_pandas()
              for f in sorted(glob.glob(
                  os.path.join(bdir, "shard-*.parquet")))]
    ev = pd.concat(frames, ignore_index=True)
    ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn").copy()
    ev["ts"] = ev["ts"].astype("int64")
    ev["b"] = [len(c.encode()) if isinstance(c, str) else 0
               for c in ev["content"]]
    rows = []
    for grp, g in ev.groupby("op"):
        g = g.sort_values("ts", kind="stable")
        tv = g["ts"].to_numpy()
        brk = np.r_[True, tv[1:] - tv[:-1] > gap_us]
        sid = np.cumsum(brk) - 1
        agg = pd.DataFrame({"sid": sid, "ts": tv,
                            "b": g["b"].to_numpy()}).groupby(
            "sid", as_index=False).agg(start=("ts", "min"),
                                       end=("ts", "max"),
                                       n=("b", "size"),
                                       bytes=("b", "sum"))
        agg.insert(0, "grp", grp)
        rows.append(agg[["grp", "start", "end", "n", "bytes"]])
    alls = pd.concat(rows, ignore_index=True)
    wm = int(ev["ts"].max()) - lateness_us
    done = alls["end"] + gap_us <= wm
    return (alls[done].reset_index(drop=True),
            alls[~done].reset_index(drop=True), wm)


def _snorm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["grp", "start"], kind="stable") \
        .reset_index(drop=True).astype(
            {"start": "int64", "end": "int64",
             "n": "int64", "bytes": "int64"})


def test_session_aggregator_matches_recount(ray_session, tmp_path):
    work = str(tmp_path)
    bdir = _write_log(work, n_events=2_500, seed=31)
    s = SessionAggregator(bdir, os.path.join(work, "sagg"), GAP_US,
                          lateness_us=2 * GAP_US)
    rep = s.advance(complete=True)
    emitted, open_s, wm = _session_recount(bdir, GAP_US, 2 * GAP_US)
    assert rep["watermark"] == wm
    pd.testing.assert_frame_equal(_snorm(s.emitted()), _snorm(emitted))
    pd.testing.assert_frame_equal(_snorm(s.open_sessions()),
                                  _snorm(open_s))
    assert s.late_events() == 0
    assert s.advance(complete=True)["emitted"] == 0


def test_session_stepwise_equals_oneshot(ray_session, tmp_path):
    """Segment-wise delivery (per-shard lsn order): merged emitted+open
    sessions equal the one-shot fold — the interval-cluster merge is
    associative across any batch split."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=2_000, seed=37)
    staged = os.path.join(work, "staged")
    os.makedirs(staged)
    shard_names = set()
    segs = []
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        t = pq.read_table(f).sort_by("lsn")
        stem = os.path.basename(f)[:-len(".parquet")]
        shard_names.add(stem[:10])
        third = max(1, len(t) // 3)
        for j in range(3):
            seg = t.slice(j * third) if j == 2 else t.slice(j * third, third)
            segs.append((f"{stem}-{j}.parquet", seg))
    with open(os.path.join(staged, "_shards.json"), "w") as f:
        json.dump({"shards": sorted(shard_names)}, f)

    s = SessionAggregator(staged, os.path.join(work, "s_step"), GAP_US,
                          lateness_us=3 * GAP_US)
    for name, t in segs:
        pq.write_table(t, os.path.join(staged, name))
        s.advance()
    s.advance(complete=True)

    s1 = SessionAggregator(bdir, os.path.join(work, "s_once"), GAP_US,
                           lateness_us=3 * GAP_US)
    s1.advance(complete=True)

    def fold(agg):
        full = pd.concat([agg.emitted(), agg.open_sessions()],
                         ignore_index=True)
        return _snorm(full)

    pd.testing.assert_frame_equal(fold(s), fold(s1))
    assert s.late_events() == 0


def test_session_late_and_extension(ray_session, tmp_path):
    """Hand-built stream: an event beyond gap starts a new session; an
    event ≤ committed watermark is late (it might have extended an
    emitted session); an in-lateness event EXTENDS an open session."""
    work = str(tmp_path)
    bdir = os.path.join(work, "binlog")
    os.makedirs(bdir)
    base = 1_600_000_000_000_000
    g = GAP_US

    def seg(path, rows):
        cols = {n: [] for n in gen.EVENT_SCHEMA.names}
        for lsn, ts_off in rows:
            cols["lsn"].append(lsn); cols["txn"].append(lsn)
            cols["op"].append("I"); cols["repo"].append("r")
            cols["path"].append(f"p{lsn}"); cols["commit"].append("c")
            cols["lang"].append("py"); cols["content"].append("abc")
            cols["extra"].append("{}"); cols["ddl"].append(None)
            cols["ts"].append(base + ts_off)
            cols["schema_ver"].append(0); cols["shard"].append(0)
        pq.write_table(pa.table(cols, schema=gen.EVENT_SCHEMA),
                       os.path.join(bdir, path))

    # batch 1: session A = {0, g//2}; then a far event at 10g → new
    # session B; wm = 10g → A (end g//2, +g <= 10g) emits, B stays open
    seg("shard-0000-s0.parquet", [(1, 0), (2, g // 2), (3, 10 * g)])
    s = SessionAggregator(bdir, os.path.join(work, "sagg"), g,
                          lateness_us=0)
    r1 = s.advance(complete=True)
    assert r1["emitted"] == 1 and r1["late"] == 0
    assert len(s.open_sessions()) == 1
    # batch 2: ts g//4 <= wm → LATE; ts 10g + g//2 extends open B
    seg("shard-0000-s1.parquet", [(4, g // 4), (5, 10 * g + g // 2)])
    r2 = s.advance(complete=True)
    assert r2["late"] == 1 and s.late_events() == 1
    ob = s.open_sessions()
    assert len(ob) == 1 and int(ob["n"].iloc[0]) == 2
    assert int(ob["end"].iloc[0]) == base + 10 * g + g // 2
    # emitted session A unchanged
    em = s.emitted()
    assert len(em) == 1 and int(em["n"].iloc[0]) == 2


from thor_ray.pipelines.stream_window import IntervalJoinStream  # noqa: E402


def _ij_recount(ldir, rdir, lo_us, hi_us):
    """Brute-force oracle: all same-key (l, r) pairs with
    r.ts in [l.ts+lo, l.ts+hi], over every data event of both logs."""
    def load(d):
        frames = [pq.read_table(f, columns=["op", "repo", "lsn", "ts"])
                  .to_pandas()
                  for f in sorted(glob.glob(os.path.join(
                      d, "shard-*.parquet")))]
        ev = pd.concat(frames, ignore_index=True)
        ev = ev[ev["op"] != "DDL"].copy()
        ev["ts"] = ev["ts"].astype("int64")
        # the consumer's W4 duplicate drop: one copy per lsn
        return ev.drop_duplicates("lsn").reset_index(drop=True)
    L, R = load(ldir), load(rdir)
    m = L.merge(R, on="repo", suffixes=("_l", "_r"))
    m = m[(m["ts_r"] >= m["ts_l"] + lo_us)
          & (m["ts_r"] <= m["ts_l"] + hi_us)]
    out = m.rename(columns={"repo": "key", "lsn_l": "l_lsn",
                            "ts_l": "l_ts", "lsn_r": "r_lsn",
                            "ts_r": "r_ts"})
    return out[["key", "l_lsn", "l_ts", "r_lsn", "r_ts"]]


def _ij_norm(df):
    return df.sort_values(["key", "l_lsn", "r_lsn"], kind="stable") \
        .reset_index(drop=True).astype(
            {"l_lsn": "int64", "l_ts": "int64",
             "r_lsn": "int64", "r_ts": "int64"})


def test_interval_join_matches_recount(ray_session, tmp_path):
    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=8, paths_per_repo=6, seed=41)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=600, n_shards=2, ddl_every=0, seed=43)).write(ldir)
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=600, n_shards=2, ddl_every=0, seed=47)).write(rdir)
    lo, hi = -40_000, 40_000
    j = IntervalJoinStream(ldir, rdir, os.path.join(work, "ij"),
                           lo, hi, key_col="repo")
    rep = j.advance(complete=True)
    want = _ij_recount(ldir, rdir, lo, hi)
    got = j.matches()
    assert rep["late"] == 0
    pd.testing.assert_frame_equal(_ij_norm(got), _ij_norm(want))
    # no pair is ever produced twice
    assert not got.duplicated(["key", "l_lsn", "r_lsn"]).any()
    # caught-up advance is a no-op
    assert j.advance(complete=True)["matches"] == 0


def test_interval_join_stepwise_equals_oneshot(ray_session, tmp_path):
    """Both logs delivered in per-shard halves with lateness covering the
    span: the stepwise union of matches equals the one-shot set (each
    in-order pair produced exactly once across micro-batches)."""
    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=8, paths_per_repo=6, seed=51)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=500, n_shards=2, ddl_every=0, seed=53)).write(ldir)
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=500, n_shards=2, ddl_every=0, seed=59)).write(rdir)
    lo, hi = -30_000, 30_000

    def stage(src, dst):
        os.makedirs(dst)
        segs = []
        names = set()
        for f in sorted(glob.glob(os.path.join(src, "shard-*.parquet"))):
            t = pq.read_table(f).sort_by("lsn")
            stem = os.path.basename(f)[:-len(".parquet")]
            names.add(stem[:10])
            half = len(t) // 2
            segs.append((f"{stem}-a.parquet", t.slice(0, half)))
            segs.append((f"{stem}-b.parquet", t.slice(half)))
        with open(os.path.join(dst, "_shards.json"), "w") as f:
            json.dump({"shards": sorted(names)}, f)
        return segs

    lstage, rstage = os.path.join(work, "Ls"), os.path.join(work, "Rs")
    lsegs, rsegs = stage(ldir, lstage), stage(rdir, rstage)
    j = IntervalJoinStream(lstage, rstage, os.path.join(work, "ij"),
                           lo, hi, key_col="repo",
                           lateness_us=10_000_000)
    for (ln, lt), (rn, rt) in zip(lsegs, rsegs):
        pq.write_table(lt, os.path.join(lstage, ln))
        j.advance()
        pq.write_table(rt, os.path.join(rstage, rn))
        j.advance()
    j.advance(complete=True)

    j1 = IntervalJoinStream(ldir, rdir, os.path.join(work, "ij1"),
                            lo, hi, key_col="repo",
                            lateness_us=10_000_000)
    j1.advance(complete=True)
    pd.testing.assert_frame_equal(_ij_norm(j.matches()),
                                  _ij_norm(j1.matches()))
    assert j.late_events() == 0


def test_interval_join_late_and_pruning(ray_session, tmp_path):
    """lateness=0 hand-built streams: watermark pruning drops dead state,
    an event at/below the committed watermark is LATE, an in-order event
    still matches live state."""
    work = str(tmp_path)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    os.makedirs(ldir); os.makedirs(rdir)
    base = 1_600_000_000_000_000
    S = 100_000                      # span: lo=-S, hi=+S

    def seg(d, path, rows):
        cols = {n: [] for n in gen.EVENT_SCHEMA.names}
        for lsn, ts_off in rows:
            cols["lsn"].append(lsn); cols["txn"].append(lsn)
            cols["op"].append("I"); cols["repo"].append("k")
            cols["path"].append(f"p{lsn}"); cols["commit"].append("c")
            cols["lang"].append("py"); cols["content"].append("x")
            cols["extra"].append("{}"); cols["ddl"].append(None)
            cols["ts"].append(base + ts_off)
            cols["schema_ver"].append(0); cols["shard"].append(0)
        pq.write_table(pa.table(cols, schema=gen.EVENT_SCHEMA),
                       os.path.join(d, path))

    # batch 1: l1@0 matches r1@50ms; r2@100s drives wm to 100s and both
    # l1 (0 + S < wm) and r1 (50ms < wm - S) are pruned; r2 survives
    seg(ldir, "shard-0000-a.parquet", [(1, 0)])
    seg(rdir, "shard-0000-a.parquet", [(1, 50_000), (2, 100_000_000)])
    j = IntervalJoinStream(ldir, rdir, os.path.join(work, "ij"),
                           -S, S, key_col="repo", lateness_us=0)
    r1 = j.advance(complete=True)
    assert r1["matches"] == 1 and r1["late"] == 0
    # batch 2: l2 just under r2 (in-order, matches surviving r2);
    # l3 at 40s <= wm -> LATE (its partners may be pruned)
    seg(ldir, "shard-0000-b.parquet",
        [(2, 100_000_000 + 20_000), (3, 40_000_000)])
    r2 = j.advance(complete=True)
    assert r2["matches"] == 1
    assert r2["late"] == 1 and j.late_events() == 1
    m = _ij_norm(j.matches())
    assert len(m) == 2
    assert set(zip(m["l_lsn"], m["r_lsn"])) == {(1, 1), (2, 2)}

    # torn commit: manifest removed, re-advance with no new data is a
    # deterministic no-op re-run from the prior committed state
    man = os.path.join(work, "ij", "_ijoin_manifest.json")
    committed = json.load(open(man))
    os.remove(man)
    j2 = IntervalJoinStream(ldir, rdir, os.path.join(work, "ij"),
                            -S, S, key_col="repo", lateness_us=0)
    j2.advance(complete=True)
    assert json.load(open(man))["upto_l"] == committed["upto_l"]
    pd.testing.assert_frame_equal(_ij_norm(j2.matches()), m)


def test_merge_clusters_property():
    """_merge_clusters == brute-force union-find sessionization on random
    interval sets (pure kernel, no Ray)."""
    import numpy as np

    from thor_ray.pipelines.stream_window import _merge_clusters

    rng = np.random.RandomState(61)
    for trial in range(25):
        gap = int(rng.randint(1, 50))
        n = int(rng.randint(1, 40))
        starts = rng.randint(0, 500, n)
        lens = rng.randint(0, 30, n)
        df = pd.DataFrame({
            "grp": rng.choice(["a", "b"], n),
            "start": starts, "end": starts + lens,
            "n": rng.randint(1, 5, n),
            "bytes": rng.randint(0, 100, n)})
        got = _merge_clusters(df.astype(
            {"start": "int64", "end": "int64",
             "n": "int64", "bytes": "int64"}), gap)

        # brute union-find over intervals
        for grp, g in df.groupby("grp"):
            rows = list(g.itertuples(index=False))
            parent = list(range(len(rows)))

            def find(x):
                while parent[x] != x:
                    x = parent[x]
                return x
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    a, b = rows[i], rows[j]
                    lo = max(a.start, b.start)
                    hi = min(a.end, b.end)
                    if lo - hi <= gap:      # gap between intervals <= gap
                        parent[find(i)] = find(j)
            comp = {}
            for i, r in enumerate(rows):
                comp.setdefault(find(i), []).append(r)
            want = sorted(
                (min(r.start for r in rs), max(r.end for r in rs),
                 sum(r.n for r in rs), sum(r.bytes for r in rs))
                for rs in comp.values())
            gg = got[got["grp"] == grp]
            have = sorted(zip(gg["start"], gg["end"], gg["n"],
                              gg["bytes"]))
            assert have == want, (trial, grp)


def test_concat_ranges_kernel():
    import numpy as np

    from thor_ray.pipelines.stream_window import _concat_ranges
    assert _concat_ranges(np.array([3, 0, 2])).tolist() == [0, 1, 2, 0, 1]
    assert _concat_ranges(np.array([0])).tolist() == []
    rng = np.random.RandomState(67)
    c = rng.randint(0, 6, 20)
    out = _concat_ranges(c)
    want = [i for k in c for i in range(k)]
    assert out.tolist() == want


def test_interval_join_random_bands(ray_session, tmp_path):
    """Random (lo, hi) bands — asymmetric, one-sided, zero-width — all
    equal the brute-force recount in a one-shot drain."""
    import numpy as np

    rng = np.random.RandomState(71)
    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=6, paths_per_repo=5, seed=73)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=300, n_shards=2, ddl_every=0, seed=79)).write(ldir)
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=300, n_shards=2, ddl_every=0, seed=83)).write(rdir)
    bands = [(-50_000, 50_000), (0, 80_000), (-80_000, 0), (0, 0),
             (int(rng.randint(-100_000, 0)), int(rng.randint(0, 100_000)))]
    for i, (lo, hi) in enumerate(bands):
        j = IntervalJoinStream(ldir, rdir,
                               os.path.join(work, f"ij{i}"), lo, hi,
                               key_col="repo")
        j.advance(complete=True)
        want = _ij_recount(ldir, rdir, lo, hi)
        pd.testing.assert_frame_equal(_ij_norm(j.matches()),
                                      _ij_norm(want)), (lo, hi)


def test_stream_telemetry_heartbeat(ray_session, tmp_path):
    """Every advance — including caught-up no-ops — appends one
    telemetry line (the consumer heartbeat analogue)."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=600, seed=93)
    w = WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US)
    w.advance(complete=True)
    w.advance(complete=True)             # no-op
    lines = [json.loads(ln) for ln in open(
        os.path.join(work, "wagg", "_telemetry.jsonl"))]
    assert len(lines) == 2
    assert lines[0]["kind"] == "window" and lines[0]["seq"] == 1
    assert "wall_sec" in lines[0] and lines[0]["emitted"] >= 0
    assert lines[1].get("noop") is True


def test_retention_gap_fence(ray_session, tmp_path):
    """OffsetOutOfRange analogue: a consumer whose committed offset fell
    below the archive retention floor fails loudly; on_retention='seek'
    jumps the gap, records it in telemetry, and processes the rest."""
    import shutil

    from thor_ray.sources.binlog import RetentionGapError, retention_floor

    work = str(tmp_path)
    bdir = os.path.join(work, "binlog")
    os.makedirs(bdir)
    # two lsn-ordered segments of one shard; retire the first
    full = _write_log(os.path.join(work, "src"), n_events=800, seed=97)
    t = pa.concat_tables([pq.read_table(f) for f in sorted(
        glob.glob(os.path.join(full, "shard-*.parquet")))]).sort_by("lsn")
    half = len(t) // 2
    pq.write_table(t.slice(0, half),
                   os.path.join(bdir, "shard-0000-a.parquet"))
    pq.write_table(t.slice(half),
                   os.path.join(bdir, "shard-0000-b.parquet"))
    os.makedirs(os.path.join(bdir, "_archive"))
    shutil.move(os.path.join(bdir, "shard-0000-a.parquet"),
                os.path.join(bdir, "_archive", "shard-0000-a.parquet"))
    floor = retention_floor(bdir)
    assert floor > 0

    w = WindowedAggregator(bdir, os.path.join(work, "werr"), W_US)
    with pytest.raises(RetentionGapError, match="only retains"):
        w.advance(complete=True)

    ws = WindowedAggregator(bdir, os.path.join(work, "wseek"), W_US,
                            on_retention="seek")
    rep = ws.advance(complete=True)
    assert rep["watermark"] is not None
    n_remaining = len(t.slice(half)["lsn"].unique())
    total = int(ws.emitted()["n"].sum() + ws.open_windows()["n"].sum())
    assert total == n_remaining          # exactly the retained suffix
    beats = [json.loads(ln) for ln in open(
        os.path.join(work, "wseek", "_telemetry.jsonl"))]
    assert any(b.get("retention_seek") for b in beats)


def test_windowed_distinct_hll(ray_session, tmp_path):
    """distinct_col: one mergeable HLL per open window — the emitted ndv
    is within the sketch's error bound of the exact per-window distinct
    count, and stepwise delivery produces BIT-identical estimates to the
    one-shot fold (register merges are associative)."""
    import numpy as np

    work = str(tmp_path)
    bdir = _write_log(work, n_events=3_000, seed=113)
    w = WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US,
                           lateness_us=0, group_col="op",
                           distinct_col="repo")
    w.advance(complete=True)
    em = w.emitted()
    assert len(em) and "ndv" in em.columns

    # exact recount per (win, grp) over unique-lsn events
    frames = [pq.read_table(f, columns=["lsn", "op", "ts", "repo"])
              .to_pandas()
              for f in sorted(glob.glob(
                  os.path.join(bdir, "shard-*.parquet")))]
    ev = pd.concat(frames, ignore_index=True)
    ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn")
    ev["win"] = (ev["ts"].astype("int64") // W_US) * W_US
    exact = ev.groupby(["win", "op"])["repo"].nunique()
    for _, r in em.iterrows():
        ex = int(exact.loc[(r["win"], r["grp"])])
        assert abs(int(r["ndv"]) - ex) <= max(2, 0.06 * ex), \
            (r["win"], r["grp"], r["ndv"], ex)

    # stepwise (per-shard halves) == one-shot, bit-identical ndv
    staged = os.path.join(work, "staged")
    os.makedirs(staged)
    names = set()
    segs = []
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        t = pq.read_table(f).sort_by("lsn")
        stem = os.path.basename(f)[:-len(".parquet")]
        names.add(stem[:10])
        half = len(t) // 2
        segs += [(f"{stem}-a.parquet", t.slice(0, half)),
                 (f"{stem}-b.parquet", t.slice(half))]
    with open(os.path.join(staged, "_shards.json"), "w") as f:
        json.dump({"shards": sorted(names)}, f)
    ws = WindowedAggregator(staged, os.path.join(work, "w_step"), W_US,
                            lateness_us=0, group_col="op",
                            distinct_col="repo")
    for name, t in segs:
        pq.write_table(t, os.path.join(staged, name))
        ws.advance()
    ws.advance(complete=True)
    a = em.sort_values(["win", "grp"]).reset_index(drop=True)
    b = ws.emitted().sort_values(["win", "grp"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["win", "grp", "n", "ndv"]], b[["win", "grp", "n", "ndv"]])

    # config fence covers distinct_col
    with pytest.raises(ValueError, match="config changed"):
        WindowedAggregator(bdir, os.path.join(work, "wagg"), W_US,
                           lateness_us=0).advance(complete=True)
    _ = np


def test_emitted_paging(ray_session, tmp_path):
    """emitted(since_seq=…) pages by advance batch: a poller reading each
    new page exactly once reconstructs the full emitted set."""
    work = str(tmp_path)
    bdir = _write_log(work, n_events=1_200, seed=127)
    staged = os.path.join(work, "staged")
    os.makedirs(staged)
    names = set()
    segs = []
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        t = pq.read_table(f).sort_by("lsn")
        stem = os.path.basename(f)[:-len(".parquet")]
        names.add(stem[:10])
        half = len(t) // 2
        segs += [(f"{stem}-a.parquet", t.slice(0, half)),
                 (f"{stem}-b.parquet", t.slice(half))]
    with open(os.path.join(staged, "_shards.json"), "w") as f:
        json.dump({"shards": sorted(names)}, f)

    from thor_ray.pipelines.stream_window import consumer_seq
    w = WindowedAggregator(staged, os.path.join(work, "wagg"), W_US,
                           lateness_us=W_US)
    pages = []
    last = 0
    for name, t in segs:
        pq.write_table(t, os.path.join(staged, name))
        w.advance()
        cur = consumer_seq(w.out_dir, "_window_manifest.json")
        page = w.emitted(since_seq=last, upto_seq=cur)
        if len(page):
            pages.append(page)
        last = cur
    w.advance(complete=True)
    cur = consumer_seq(w.out_dir, "_window_manifest.json")
    page = w.emitted(since_seq=last, upto_seq=cur)
    if len(page):
        pages.append(page)
    got = pd.concat(pages, ignore_index=True) if pages else w.emitted()
    pd.testing.assert_frame_equal(_norm(got), _norm(w.emitted()))


def test_partitioned_interval_join_equals_unpartitioned(ray_session,
                                                        tmp_path):
    """The demux scale tier: the union of N per-key-route interval joins
    equals the unpartitioned join exactly (pairs share a key, hence a
    route), each route holds only its keys' state, and the family stays
    exactly-once across re-advances."""
    from thor_ray.pipelines.stream_window import PartitionedIntervalJoin

    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=10, paths_per_repo=5, seed=61)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=600, n_shards=2, ddl_every=0, seed=67)).write(ldir)
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=600, n_shards=2, ddl_every=0, seed=71)).write(rdir)
    lo, hi = -40_000, 40_000

    flat = IntervalJoinStream(ldir, rdir, os.path.join(work, "flat"),
                              lo, hi, key_col="repo")
    flat.advance(complete=True)
    want = _ij_norm(flat.matches())

    pj = PartitionedIntervalJoin(ldir, rdir, os.path.join(work, "pj"),
                                 lo, hi, n_routes=3, key_col="repo")
    rep = pj.advance(complete=True)
    got = _ij_norm(pj.matches())
    pd.testing.assert_frame_equal(got, want)
    assert rep["matches"] == len(want)
    # routes genuinely partition the key space (no route sees them all,
    # no key in two routes)
    per_route = [set(p.matches()["key"]) for p in pj.parts]
    nonempty = [s for s in per_route if s]
    assert len(nonempty) >= 2
    for i in range(len(per_route)):
        for k in range(i + 1, len(per_route)):
            assert not (per_route[i] & per_route[k])
    # caught up: the family advance is a no-op
    assert pj.advance(complete=True)["matches"] == 0
    assert pj.late_events() == 0


def test_partitioned_interval_join_stepwise(ray_session, tmp_path):
    """Staged delivery through the partitioned family: per-route
    watermarks advance independently, yet the stepwise union of route
    matches equals the one-shot unpartitioned join (exactly-once across
    micro-batches AND routes)."""
    from thor_ray.pipelines.stream_window import PartitionedIntervalJoin

    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=9, paths_per_repo=5, seed=73)
    ldir, rdir = os.path.join(work, "L"), os.path.join(work, "R")
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=500, n_shards=2, ddl_every=0, seed=79)).write(ldir)
    gen.gen_binlog(base, gen.BinlogConfig(
        n_events=500, n_shards=2, ddl_every=0, seed=83)).write(rdir)
    lo, hi = -30_000, 30_000

    def stage(src, dst):
        os.makedirs(dst)
        segs, names = [], set()
        for f in sorted(glob.glob(os.path.join(src, "shard-*.parquet"))):
            t = pq.read_table(f).sort_by("lsn")
            stem = os.path.basename(f)[:-len(".parquet")]
            names.add(stem[:10])
            half = len(t) // 2
            segs.append((f"{stem}-a.parquet", t.slice(0, half)))
            segs.append((f"{stem}-b.parquet", t.slice(half)))
        with open(os.path.join(dst, "_shards.json"), "w") as f:
            json.dump({"shards": sorted(names)}, f)
        return segs

    lstage, rstage = os.path.join(work, "Ls"), os.path.join(work, "Rs")
    lsegs, rsegs = stage(ldir, lstage), stage(rdir, rstage)
    pj = PartitionedIntervalJoin(lstage, rstage, os.path.join(work, "pj"),
                                 lo, hi, n_routes=3, key_col="repo",
                                 lateness_us=10_000_000)
    for (ln, lt), (rn, rt) in zip(lsegs, rsegs):
        pq.write_table(lt, os.path.join(lstage, ln))
        pj.advance()
        pq.write_table(rt, os.path.join(rstage, rn))
        pj.advance()
    pj.advance(complete=True)

    flat = IntervalJoinStream(ldir, rdir, os.path.join(work, "flat"),
                              lo, hi, key_col="repo",
                              lateness_us=10_000_000)
    flat.advance(complete=True)
    pd.testing.assert_frame_equal(_ij_norm(pj.matches()),
                                  _ij_norm(flat.matches()))
    assert pj.late_events() == 0


def test_heavy_hitters_consumer(ray_session, tmp_path):
    """Misra-Gries streaming top-k: (1) every kept counter lower-bounds
    the exact exactly-once frequency with slack <= error_bound(); (2)
    every label with true frequency > N/(k+1) is present; (3) stepwise
    delivery keeps the invariants; (4) a torn commit (state written,
    manifest not swapped) replays idempotently."""
    from thor_ray.pipelines.stream_window import HeavyHittersConsumer

    work = str(tmp_path)
    base = gen.gen_base_table(n_repos=12, paths_per_repo=6, seed=87)
    bdir = os.path.join(work, "binlog")
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=4_000, n_shards=3, dup_rate=0.08, ddl_every=0,
        seed=89))
    log.write(bdir)

    # exact exactly-once frequencies of the group column ('repo')
    ev = pd.concat([s.to_pandas() for s in log.shards], ignore_index=True)
    ev = ev[ev["op"] != "DDL"].drop_duplicates("lsn")
    exact = ev["repo"].value_counts()
    N = int(len(ev))

    k = 6
    hh = HeavyHittersConsumer(bdir, os.path.join(work, "hh"), k=k,
                              group_col="repo")
    hh.advance(complete=True)
    got = hh.hitters().set_index("grp")["n"]
    err = hh.error_bound()
    assert hh.n_events() == N
    for grp, n in got.items():
        assert n <= exact[grp] <= n + err, (grp, n, exact[grp], err)
    for grp, true_n in exact.items():
        if true_n > N / (k + 1):
            assert grp in got.index, (grp, true_n, N)

    # stepwise (per-shard halves) preserves the invariants
    stage_dir = os.path.join(work, "staged")
    os.makedirs(stage_dir)
    names = set()
    segs = []
    for f in sorted(glob.glob(os.path.join(bdir, "shard-*.parquet"))):
        t = pq.read_table(f).sort_by("lsn")
        stem = os.path.basename(f)[:-len(".parquet")]
        names.add(stem[:10])
        half = len(t) // 2
        segs.append((f"{stem}-a.parquet", t.slice(0, half)))
        segs.append((f"{stem}-b.parquet", t.slice(half)))
    with open(os.path.join(stage_dir, "_shards.json"), "w") as f:
        json.dump({"shards": sorted(names)}, f)
    hh2 = HeavyHittersConsumer(stage_dir, os.path.join(work, "hh2"),
                               k=k, group_col="repo")
    for name, t in segs:
        pq.write_table(t, os.path.join(stage_dir, name))
        hh2.advance()
    hh2.advance(complete=True)
    got2 = hh2.hitters().set_index("grp")["n"]
    err2 = hh2.error_bound()
    assert hh2.n_events() == N
    for grp, n in got2.items():
        assert n <= exact[grp] <= n + err2
    for grp, true_n in exact.items():
        if true_n > N / (k + 1):
            assert grp in got2.index

    # torn commit: delete the manifest after an advance — the state file
    # exists but the commit never landed; a fresh consumer re-runs the
    # same range and converges to the same summary
    man_path = os.path.join(work, "hh3", "_hh_manifest.json")
    hh3 = HeavyHittersConsumer(bdir, os.path.join(work, "hh3"), k=k,
                               group_col="repo")
    hh3.advance(complete=True)
    want3 = hh3.hitters()
    os.remove(man_path)
    hh3b = HeavyHittersConsumer(bdir, os.path.join(work, "hh3"), k=k,
                                group_col="repo")
    hh3b.advance(complete=True)
    pd.testing.assert_frame_equal(hh3b.hitters(), want3)
    # config fence
    with pytest.raises(ValueError, match="config changed"):
        HeavyHittersConsumer(bdir, os.path.join(work, "hh3"), k=k + 1,
                             group_col="repo").advance(complete=True)
