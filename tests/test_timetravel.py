"""Time travel: the lake AS OF any retained epoch equals the oracle fold
of the event-log PREFIX up to that epoch's lsn boundary (snapshot archives
+ gc protection, SURVEY.md §2.1 S3 / §2.9 W5 exactly-once state)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.state import snapshot_epochs

EPOCH = 1_500
N_EVENTS = 6_000


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ttfix"))
    base = gen.gen_base_table(n_repos=20, paths_per_repo=15, seed=31)
    cfg = gen.BinlogConfig(n_events=N_EVENTS, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=2_500,
                           delete_rate=0.08, update_rate=0.5, seed=31)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    return {"dir": d, "base": base, "base_path": base_path,
            "binlog_dir": binlog_dir,
            "events": pa.concat_tables(log.shards), "max_lsn": log.max_lsn}


def oracle_at(fixture, epoch: int) -> pd.DataFrame:
    """Single-process fold of the log prefix an epoch-k snapshot covers."""
    hi = min(epoch * EPOCH, fixture["max_lsn"])
    prefix = fixture["events"].filter(pc.less_equal(
        fixture["events"]["lsn"], hi))
    expected, _ = oracle.apply_events(prefix, initial=fixture["base"])
    return expected


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.where(pd.notna(df), None)
    return df.sort_values(["repo", "path"]).reset_index(drop=True)[
        sorted(df.columns)]


def run_pipe(fixture, lake_dir: str, **cfg_kw) -> CdcPipeline:
    cfg = CdcConfig(lake_dir=lake_dir, binlog_dir=fixture["binlog_dir"],
                    num_partitions=6, epoch_size=EPOCH, **cfg_kw)
    pipe = CdcPipeline(cfg)
    pipe.run(base=fixture["base_path"])
    return pipe


def assert_snapshot_matches(pipe: CdcPipeline, fixture, epoch: int):
    got = normalize(pipe.table_at(epoch).to_pandas())
    exp = normalize(oracle_at(fixture, epoch))
    assert list(got.columns) == list(exp.columns), \
        (epoch, list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (epoch, len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_snapshots_match_oracle_prefixes(ray_session, fixture, tmp_path):
    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    eps = pipe.snapshots()
    # epoch 0 (bootstrap) through the final epoch are all retained
    assert eps[0] == 0 and eps[-1] == N_EVENTS // EPOCH
    for k in eps:
        assert_snapshot_matches(pipe, fixture, k)
    # a requested epoch between snapshots resolves to the newest <= it
    got = normalize(pipe.table_at(eps[-1] + 5).to_pandas())
    exp = normalize(oracle_at(fixture, eps[-1]))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def oracle_diff(a: pd.DataFrame, b: pd.DataFrame) -> set[tuple]:
    """(repo, path, change) triples from two oracle-folded states."""
    vis = sorted((set(a.columns) | set(b.columns)) - {"repo", "path"})
    mg = a.merge(b, on=["repo", "path"], how="outer",
                 suffixes=("_a", "_b"), indicator=True)
    na = pd.Series(pd.NA, index=mg.index)

    def side(c, suffix, present):
        if f"{c}{suffix}" in mg.columns:
            return mg[f"{c}{suffix}"]
        return mg[c] if (present and c in mg.columns) else na

    changed = pd.Series(False, index=mg.index)
    for c in vis:
        va, vb = side(c, "_a", c in a.columns), side(c, "_b", c in b.columns)
        changed |= ~((va == vb) | (va.isna() & vb.isna()))
    out = set()
    for r, p, m, ch in zip(mg["repo"], mg["path"], mg["_merge"], changed):
        if m == "right_only":
            out.add((r, p, "I"))
        elif m == "left_only":
            out.add((r, p, "D"))
        elif ch:
            out.add((r, p, "U"))
    return out


def test_snapshot_diff_matches_oracle(ray_session, fixture, tmp_path):
    from thor_ray.sources.lake import snapshot_diff

    lake = str(tmp_path / "lake")
    pipe = run_pipe(fixture, lake, retain_snapshots=99)
    last = N_EVENTS // EPOCH
    for k in range(1, last + 1):
        got = snapshot_diff(lake, k - 1, k).to_pandas()
        exp = oracle_diff(oracle_at(fixture, k - 1), oracle_at(fixture, k))
        assert set(zip(got["repo"], got["path"], got["change"])) == exp, k
        # last-writer metadata: live changes carry the winner's lsn (a DDL
        # rename can change a row visibly WITHOUT a new per-row write, so
        # lsn_b is not necessarily inside epoch k's window); deletes have
        # no b-side row
        assert got.loc[got["change"].isin(["I", "U"]), "lsn_b"].notna().all()
        assert got.loc[got["change"] == "D", "lsn_b"].isna().all()
    # a snapshot diffed against itself is empty
    assert snapshot_diff(lake, last, last).count() == 0


def test_retention_prunes_and_protects(ray_session, fixture, tmp_path):
    lake = str(tmp_path / "lake")
    pipe = run_pipe(fixture, lake, retain_snapshots=2)
    last = N_EVENTS // EPOCH
    eps = snapshot_epochs(lake)
    # only the trailing window is retained; pre-window epochs are pruned
    assert eps == [last - 1, last]
    with pytest.raises(ValueError):
        pipe.table_at(last - 2)
    # gc kept every file the retained snapshots reference
    for k in eps:
        assert_snapshot_matches(pipe, fixture, k)


def test_delta_mode_time_travel(ray_session, fixture, tmp_path):
    """Snapshot reads merge the delta run AS OF the epoch — older delta
    files survive gc while a snapshot references them."""
    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99,
                    write_mode="delta", compact_every=3)
    for k in pipe.snapshots():
        assert_snapshot_matches(pipe, fixture, k)
    # compaction rewrites the CURRENT epoch's physical layout only; every
    # snapshot still folds to the same logical state afterwards
    pipe.compact()
    for k in pipe.snapshots():
        assert_snapshot_matches(pipe, fixture, k)


def test_lake_lookup_partition_pruned(ray_session, fixture, tmp_path):
    """Point lookups return exactly the oracle's rows for present keys,
    nothing for absent ones, and read ONLY the owning partitions' files."""
    import thor_ray.sources.lake as lake_mod
    from thor_ray.sources.lake import lake_lookup
    from thor_ray.state import load_manifests

    lake = str(tmp_path / "lake")
    run_pipe(fixture, lake)
    exp = oracle_at(fixture, 10**9).sort_values(["repo", "path"])
    some = exp.iloc[[0, 7, 31]][["repo", "path"]].values.tolist()
    keys = [tuple(k) for k in some] + [("no-such-repo", "nope.py")]

    read_files = []
    orig = lake_mod.pq.read_table

    def spy(path, *a, **kw):
        read_files.append(path)
        return orig(path, *a, **kw)

    lake_mod.pq.read_table = spy
    try:
        got = lake_lookup(lake, keys)
    finally:
        lake_mod.pq.read_table = orig

    want = exp.merge(pd.DataFrame(some, columns=["repo", "path"]),
                     on=["repo", "path"]).reset_index(drop=True)
    got = normalize(got)
    want = normalize(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # pruning: only the <=3 owning partitions' file runs were opened
    ms = load_manifests(lake)
    all_files = {f for m in ms.values() for f in m.files}
    assert set(read_files) <= all_files
    touched_parts = {p.split("part=")[1].split("/")[0] for p in read_files}
    # at most one partition per lookup key (the absent key's owning
    # partition must be checked too), strictly fewer than the lake's
    assert len(touched_parts) <= len(keys) < len(ms)


def test_enrich_with_lake_matches_broadcast(ray_session, fixture, tmp_path):
    """Actor-pool stream-table enrichment == a plain left merge against
    the FULL lake state: same rows, lake_ cols attached, absent keys
    NULL, stream row count preserved (dup keys in the stream stay dups)."""
    import ray
    from thor_ray.sources.lake import enrich_with_lake, read_lake

    lake = str(tmp_path / "lake")
    run_pipe(fixture, lake)

    ev = fixture["events"].select(["lsn", "repo", "path"]).slice(0, 800)
    absent = pa.table({"lsn": pa.array([10**9, 10**9 + 1], pa.int64()),
                       "repo": pa.array(["no-such", "no-such2"]),
                       "path": pa.array(["x.py", "y.py"])})
    stream = pa.concat_tables([ev, absent])

    ds = ray.data.from_arrow(stream)
    got = enrich_with_lake(ds, lake, ["lang", "content"],
                           concurrency=2, batch_size=256).to_pandas()

    full = read_lake(lake).to_pandas()[["repo", "path", "lang", "content"]]
    want = stream.to_pandas().merge(
        full.rename(columns={"lang": "lake_lang",
                             "content": "lake_content"}),
        on=["repo", "path"], how="left")

    assert len(got) == len(stream)
    key = ["lsn", "repo", "path"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # absent keys survive with NULL enrichment
    miss = got[got["repo"] == "no-such"]
    assert len(miss) == 1 and miss["lake_lang"].isna().all()


def test_maintained_counts_match_recount(ray_session, fixture, tmp_path):
    """Materialized-view maintenance: per-repo counts folded from the
    changefeed alone equal a fresh recount of every snapshot."""
    from thor_ray.sources.lake import maintain_group_counts, snapshot_diff

    lake = str(tmp_path / "lake")
    pipe = run_pipe(fixture, lake, retain_snapshots=99)
    view = None
    # seed from epoch 0 by diffing an empty base? epoch 0 IS the bootstrap
    # state — seed by recounting it once, then maintain incrementally
    base = pipe.table_at(0).to_pandas()
    view = base.groupby("repo", as_index=False).size() \
        .rename(columns={"size": "n"})
    view["n"] = view["n"].astype("int64")
    view = view.sort_values("repo").reset_index(drop=True)
    last = N_EVENTS // EPOCH
    for k in range(1, last + 1):
        diff = snapshot_diff(lake, k - 1, k).to_pandas()
        view = maintain_group_counts(view, diff, key="repo")
        truth = pipe.table_at(k).to_pandas().groupby(
            "repo", as_index=False).size().rename(columns={"size": "n"})
        truth["n"] = truth["n"].astype("int64")
        truth = truth.sort_values("repo").reset_index(drop=True)
        pd.testing.assert_frame_equal(view.reset_index(drop=True), truth,
                                      check_dtype=False)


def test_read_changefeed_matches_delta_semantics(ray_session, fixture,
                                                 tmp_path):
    """CDC-out from the LSM runs: folding the changefeed rows last-wins
    per key over the full epoch range reproduces the lake's live state;
    every row's lsn sits inside its epoch's bounds; DDL/compacted epochs
    and cow lakes are refused loudly."""
    from thor_ray.sources import read_changefeed

    # no-DDL log so no epoch is force-compacted
    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=33)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=0,
                           delete_rate=0.1, update_rate=0.5, seed=33)
    log = gen.gen_binlog(base, cfg)
    d = str(tmp_path / "nd")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)
    n_epochs = -(-log.max_lsn // EPOCH)

    cf = read_changefeed(lake, 0).to_pandas()
    assert set(cf["op"]) <= {"I", "U", "D"}
    # every change row inside its epoch's lsn slice
    assert ((cf["lsn"] > (cf["epoch"] - 1) * EPOCH)
            & (cf["lsn"] <= cf["epoch"] * EPOCH)).all()
    # folding the feed last-wins per key == the lake's live state
    fold = cf.sort_values("lsn", kind="stable") \
        .drop_duplicates(["repo", "path"], keep="last")
    fold = fold[fold["op"] != "D"].drop(columns=["op", "lsn", "epoch"])
    got = normalize(fold)
    want = normalize(
        pipe.final_table().to_pandas()[sorted(fold.columns)]
    )
    # bootstrap rows never touched by any event aren't in the feed
    touched = got.merge(want, how="inner")
    assert len(touched) == len(got)  # every folded row is a live lake row
    # and a tail slice works standalone
    tail = read_changefeed(lake, n_epochs - 2).to_pandas()
    assert set(tail["epoch"]) <= {n_epochs - 1, n_epochs}
    # bad ranges are refused
    with pytest.raises(ValueError):
        read_changefeed(lake, n_epochs)      # empty range
    # compaction folds the runs -> the feed refuses (full-state marker)
    pipe.compact()
    with pytest.raises(ValueError):
        read_changefeed(lake, 0)

    # a cow lake holds full-state files only -> refused
    lake2 = os.path.join(d, "lake_cow")
    pipe2 = CdcPipeline(CdcConfig(
        lake_dir=lake2, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="cow"))
    pipe2.run(base=base_path)
    with pytest.raises(ValueError):
        read_changefeed(lake2, 0)


def test_changefeed_consumer_groups(ray_session, fixture, tmp_path):
    """Kafka consumer-group semantics over the changefeed: durable
    offsets, at-least-once re-delivery on uncommitted polls, independent
    groups, max_epochs paging, lag, and folding all polled batches
    reproduces the event-touched lake rows."""
    from thor_ray.sources import ChangefeedConsumer, consumer_groups

    base = gen.gen_base_table(n_repos=12, paths_per_repo=8, seed=44)
    cfgb = gen.BinlogConfig(n_events=4_500, n_shards=3, dup_rate=0.05,
                            shuffle_window=96, ddl_every=0,
                            delete_rate=0.1, update_rate=0.5, seed=44)
    log = gen.gen_binlog(base, cfgb)
    d = str(tmp_path / "cg")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)
    n_epochs = -(-log.max_lsn // EPOCH)

    c = ChangefeedConsumer(lake, "indexer")
    assert c.committed() == 0 and c.lag() == n_epochs
    # page by 1 epoch; crash-sim: poll twice without commit re-delivers
    ds1, upto1 = c.poll(max_epochs=1)
    ds1b, upto1b = c.poll(max_epochs=1)
    assert upto1 == upto1b == 1
    pd.testing.assert_frame_equal(
        normalize(ds1.to_pandas()), normalize(ds1b.to_pandas()),
        check_dtype=False)
    frames = []
    while True:
        ds, upto = c.poll(max_epochs=1)
        if ds is None:
            break
        frames.append(ds.to_pandas())
        c.commit(upto)
    assert c.committed() == n_epochs and c.lag() == 0
    assert c.poll() == (None, n_epochs)
    with pytest.raises(ValueError):
        c.commit(1)   # moving backwards refused

    # a second group is independent and sees the identical feed
    c2 = ChangefeedConsumer(lake, "metrics")
    assert c2.committed() == 0
    ds_all, upto_all = c2.poll()
    assert upto_all == n_epochs
    def norm_feed(df):
        # the feed has one row per (key, epoch): lsn makes the sort total
        df = df.where(pd.notna(df), None)
        return df.sort_values(["repo", "path", "lsn"]).reset_index(
            drop=True)[sorted(df.columns)]
    pd.testing.assert_frame_equal(
        norm_feed(pd.concat(frames, ignore_index=True)),
        norm_feed(ds_all.to_pandas()), check_dtype=False)
    c2.commit(upto_all)
    assert consumer_groups(lake) == {"indexer": n_epochs,
                                     "metrics": n_epochs}

    # folding every polled batch last-wins == the event-touched live rows
    cf = pd.concat(frames, ignore_index=True)
    fold = cf.sort_values("lsn", kind="stable") \
        .drop_duplicates(["repo", "path"], keep="last")
    fold = fold[fold["op"] != "D"].drop(columns=["op", "lsn", "epoch"])
    live = pipe.final_table().to_pandas()[sorted(fold.columns)]
    touched = normalize(fold).merge(normalize(live), how="inner")
    assert len(touched) == len(fold)

    # admin offset reset: seek rewinds (commit never does), redelivers
    # the identical epoch-1 batch, and seek(0) replays from the start
    c.seek(0)
    assert c.committed() == 0 and c.lag() == n_epochs
    ds_r, upto_r = c.poll(max_epochs=1)
    assert upto_r == 1
    pd.testing.assert_frame_equal(
        normalize(ds_r.to_pandas()), normalize(frames[0]),
        check_dtype=False)
    c.seek(n_epochs)
    assert c.poll() == (None, n_epochs)
    with pytest.raises(ValueError):
        c.seek(-1)


def test_export_changefeed_envelopes_roundtrip(ray_session, fixture,
                                               tmp_path):
    """CDC-out to the Debezium wire: export the changefeed as envelope
    JSONL segments, parse them back with ExtractNewRecordState (rewrite
    mode, key-coalesced deletes), fold last-wins per key — must equal the
    lake's live state. Re-export skips every finished epoch directory."""
    import glob as _glob
    import json

    import pyarrow.json as pajson

    from thor_ray.sources import export_changefeed_envelopes
    from thor_ray.stages import extract_new_record_state

    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=34)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=0,
                           delete_rate=0.1, update_rate=0.5, seed=34)
    log = gen.gen_binlog(base, cfg)
    d = str(tmp_path / "env")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)

    out_dir = os.path.join(d, "wire")
    rep = export_changefeed_envelopes(lake, out_dir, source_name="ttlake")
    n_epochs = -(-log.max_lsn // EPOCH)
    assert rep == {"epochs_written": n_epochs, "epochs_skipped": 0}
    # resume: nothing rewritten
    rep2 = export_changefeed_envelopes(lake, out_dir)
    assert rep2 == {"epochs_written": 0, "epochs_skipped": n_epochs}

    files = sorted(_glob.glob(os.path.join(out_dir, "epoch=*", "*.json")))
    assert files
    recs = pa.concat_tables([pajson.read_json(p) for p in files])
    # wire sanity: every value is a full envelope with source provenance
    v0 = json.loads(recs["value"][0].as_py())
    assert set(v0) == {"before", "after", "op", "ts_ms", "source"}
    assert v0["source"]["name"] == "ttlake"

    unwrap = extract_new_record_state(delete_mode="rewrite",
                                      add_source_fields=["lsn"],
                                      key_col="key")
    flat = unwrap(recs).to_pandas()
    fold = flat.sort_values("__lsn", kind="stable") \
        .drop_duplicates(["repo", "path"], keep="last")
    fold = fold[fold["__deleted"] == "false"] \
        .drop(columns=["op", "__lsn", "__deleted"])
    want = normalize(pipe.final_table().to_pandas())
    got = normalize(fold)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_savepoint_tags(ray_session, fixture, tmp_path):
    """Named savepoints (Iceberg-tag analogue): a tag pins its archives
    against prune_history and its data files against gc, so reading at
    the tag stays oracle-correct after retention passes; delete_tag
    releases the pin."""
    from thor_ray.state import (gc_lake, load_manifests, prune_history,
                                snapshot_epochs)

    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    lake = pipe.cfg.lake_dir
    eps = pipe.snapshots()
    k = eps[len(eps) // 2]
    assert 0 < k < eps[-1]
    assert pipe.tag("release-1", k) == k
    assert pipe.tags() == {"release-1": k}
    with pytest.raises(ValueError, match="already exists"):
        pipe.tag("release-1", eps[-1])
    # default epoch = the newest retained snapshot; replace moves a tag
    assert pipe.tag("tip") == eps[-1]
    assert pipe.tag("tip", k, replace=True) == k
    assert pipe.delete_tag("tip")
    assert not pipe.delete_tag("tip")

    # retention prune far past the tag: tagged archives survive, others go
    removed = prune_history(lake, eps[-1])
    assert removed > 0
    gc_lake(lake, load_manifests(lake))
    got = normalize(pipe.table_at_tag("release-1").to_pandas())
    exp = normalize(oracle_at(fixture, k))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # deleting the tag releases the pin: the next prune drops its archives
    assert pipe.delete_tag("release-1")
    assert prune_history(lake, eps[-1]) > 0
    assert snapshot_epochs(lake) == [eps[-1]]
    # and tagging the now-unretained epoch is refused
    with pytest.raises(ValueError, match="not a readable snapshot"):
        pipe.tag("too-old", k)
    with pytest.raises(KeyError):
        pipe.table_at_tag("release-1")


def test_sink_connector(ray_session, tmp_path):
    """Kafka-Connect sink-connector shape: consumer-group offsets + SMT
    chain + exactly-once per-epoch segments. Union of the written
    segments == the transformed changefeed; a lost offset (seek back)
    re-delivers but the rename-skip keeps the output exactly-once."""
    import glob as _glob

    from thor_ray.sources import SinkConnector
    from thor_ray.sources.lake import read_changefeed
    from thor_ray.stages import TransformChain
    from thor_ray.stages.smt import drop_fields, mask_field

    base = gen.gen_base_table(n_repos=12, paths_per_repo=8, seed=45)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=4_500, n_shards=3, dup_rate=0.05, shuffle_window=96,
        ddl_every=0, delete_rate=0.1, update_rate=0.5, seed=45))
    d = str(tmp_path / "sc")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)
    n_epochs = -(-log.max_lsn // EPOCH)

    chain = TransformChain(mask_field(["commit"], "***"),
                           drop_fields(["content"]))
    out = os.path.join(d, "sink_out")
    sink = SinkConnector(lake, out, "exporter", chain=chain)
    r = sink.advance()
    assert r == {"epochs_written": n_epochs, "epochs_skipped": 0,
                 "committed": n_epochs}
    assert sink.consumer.committed() == n_epochs

    def norm_feed(df):
        df = df.where(pd.notna(df), None)
        return df.sort_values(["repo", "path", "lsn"]).reset_index(
            drop=True)[sorted(df.columns)]

    files = _glob.glob(os.path.join(out, "epoch=*", "*.parquet"))
    got = norm_feed(pd.concat([pq.read_table(f).to_pandas() for f in files],
                              ignore_index=True))
    want = norm_feed(read_changefeed(lake, 0, n_epochs)
                     .map_batches(chain, batch_format="pyarrow").to_pandas())
    assert (got["commit"].dropna() == "***").all()
    assert "content" not in got.columns
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # caught up: another advance is a no-op
    assert sink.advance() == {"epochs_written": 0, "epochs_skipped": 0,
                              "committed": n_epochs}
    # crash-sim: offset lost → re-delivery skips every existing segment
    sink.consumer.seek(0)
    mtimes = {f: os.path.getmtime(f) for f in files}
    r2 = sink.advance()
    assert r2 == {"epochs_written": 0, "epochs_skipped": n_epochs,
                  "committed": n_epochs}
    assert {f: os.path.getmtime(f) for f in files} == mtimes

    # jsonl wire tier round-trips the same rows
    sink_j = SinkConnector(lake, os.path.join(d, "sink_jsonl"),
                           "exporter-jsonl", chain=chain, fmt="jsonl",
                           max_epochs_per_poll=2)
    total = 0
    while True:
        rj = sink_j.advance()
        total += rj["epochs_written"]
        if rj["committed"] == n_epochs:
            break
    assert total == n_epochs
    jf = _glob.glob(os.path.join(d, "sink_jsonl", "epoch=*", "*.json"))
    gj = pd.concat([pd.read_json(f, lines=True) for f in jf],
                   ignore_index=True)
    assert len(gj) == len(want)


def test_sink_connector_on_fold_diff(ray_session, tmp_path):
    """Self-healing sink: epochs whose delta runs a DDL compaction folded
    are repaired from retained snapshots (on_fold='diff'); folding the
    sink's segments converges to the live event-touched state. The
    default policy still fails loudly."""
    import glob as _glob

    from thor_ray.sources import SinkConnector

    base = gen.gen_base_table(n_repos=12, paths_per_repo=8, seed=46)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=6_000, n_shards=3, dup_rate=0.0, shuffle_window=64,
        ddl_every=2_500, delete_rate=0.08, update_rate=0.5, seed=46))
    d = str(tmp_path / "sf")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000,
        retain_snapshots=99))
    pipe.run(base=base_path)
    n_epochs = -(-log.max_lsn // EPOCH)
    # the DDLs forced at least one compaction: a plain sink fails loudly
    strict = SinkConnector(lake, os.path.join(d, "strict"), "strict")
    with pytest.raises(ValueError, match="folded|compact"):
        strict.advance()

    sink = SinkConnector(lake, os.path.join(d, "out"), "healer",
                         on_fold="diff")
    r = sink.advance()
    assert r["committed"] == n_epochs and r["epochs_written"] == n_epochs
    files = _glob.glob(os.path.join(d, "out", "epoch=*", "*.parquet"))
    segs = [pq.read_table(f).to_pandas() for f in files]
    feed = pd.concat(segs, ignore_index=True)

    # fold: last epoch wins per key; deletes drop
    last = (feed.sort_values("epoch")
            .groupby(["repo", "path"], as_index=False).last())
    folded = last[last["op"] != "D"]
    live = pipe.final_table().to_pandas()
    ev = pa.concat_tables(log.shards).to_pandas()
    touched = set(map(tuple, ev.loc[ev["op"] != "DDL",
                                    ["repo", "path"]].dropna().values))
    exp = live[[tuple(k) in touched for k in
                zip(live["repo"], live["path"])]]

    def norm(df, cols):
        df = df[cols].copy().where(pd.notna(df[cols]), None)
        return df.sort_values(["repo", "path"]).reset_index(drop=True)

    cols = sorted(set(exp.columns) & set(folded.columns))
    pd.testing.assert_frame_equal(norm(folded, cols), norm(exp, cols),
                                  check_dtype=False)
    # deleted keys are absent from the fold
    assert set(map(tuple, folded[["repo", "path"]].values)) == \
        set(map(tuple, exp[["repo", "path"]].values))


def test_status_summary(ray_session, fixture, tmp_path):
    """status(): metadata-only ops rollup with the load-bearing fields."""
    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    pipe.tag("rel", pipe.snapshots()[-1])
    s = pipe.status()
    assert s["partitions"] == 6 and s["epoch"]["min"] == s["epoch"]["max"]
    assert s["watermark"]["min"] == N_EVENTS
    assert s["binlog"]["max_lsn"] == fixture["max_lsn"]
    assert s["binlog"]["lag_events"] == 0
    assert s["rows"] == pipe.final_table().count()
    assert s["tags"] == {"rel": pipe.snapshots()[-1]}
    assert s["snapshots"] == pipe.snapshots()
    assert s["dlq_files"] == 0 and s["consumer_groups"] == {}
    assert s["producer"] is None  # no write-edge state on this log


def test_branch_at_tag(ray_session, fixture, tmp_path):
    """create_branch(at_tag=…): a tagged savepoint is a durable branch
    point — the branch equals the oracle prefix at the tagged epoch."""
    from thor_ray.sources import create_branch
    from thor_ray.sources.lake import read_lake

    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    eps = pipe.snapshots()
    k = eps[len(eps) // 2]
    pipe.tag("cut", k)
    br = str(tmp_path / "branch")
    info = create_branch(pipe.cfg.lake_dir, br, at_tag="cut")
    assert info["fork_epoch"] == k
    got = normalize(read_lake(br).to_pandas())
    exp = normalize(oracle_at(fixture, k))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    with pytest.raises(KeyError, match="no savepoint tag"):
        create_branch(pipe.cfg.lake_dir, str(tmp_path / "b2"),
                      at_tag="missing")
    with pytest.raises(ValueError, match="not both"):
        create_branch(pipe.cfg.lake_dir, str(tmp_path / "b3"),
                      at_epoch=k, at_tag="cut")


def test_unload_snapshot(ray_session, fixture, tmp_path):
    """unload(): hive-partitioned export of live / tagged state matches
    the oracle; a re-run skips every completed partition."""
    import glob as _glob

    import pyarrow.dataset as pads

    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    eps = pipe.snapshots()
    k = eps[len(eps) // 2]
    pipe.tag("cut", k)

    out = str(tmp_path / "unload_live")
    rep = pipe.unload(out, by="lang")
    live = normalize(pipe.final_table().to_pandas())
    assert int(rep["rows"].sum()) == len(live)
    back = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    back["lang"] = back["lang"].astype(live["lang"].dtype)
    pd.testing.assert_frame_equal(normalize(back), live,
                                  check_dtype=False)
    # resume: everything skipped
    rep2 = pipe.unload(out, by="lang")
    assert int(rep2["skipped"].sum()) == len(rep2)

    # tagged unload == oracle prefix; column pruning keeps the by-column
    out_t = str(tmp_path / "unload_tag")
    pipe.unload(out_t, by="lang", tag="cut", columns=["repo", "path"])
    back_t = pads.dataset(out_t, partitioning="hive").to_table().to_pandas()
    exp_t = oracle_at(fixture, k)
    assert sorted(back_t.columns) == ["lang", "path", "repo"]
    assert len(back_t) == len(exp_t)
    with pytest.raises(ValueError, match="not both"):
        pipe.unload(str(tmp_path / "x"), epoch=k, tag="cut")


def test_restore_in_place(ray_session, fixture, tmp_path):
    """Point-in-time RESTORE: the lake rolls back to a retained epoch in
    place (manifests + watermarks + registry; future archives and
    dangling tags pruned), then a plain run() replays the binlog back to
    the full state — the rewind-and-replay repair loop."""
    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    eps = pipe.snapshots()
    k = eps[len(eps) // 2]
    assert 0 < k < eps[-1]
    pipe.tag("good", k)
    pipe.tag("late", eps[-1])
    full = normalize(pipe.final_table().to_pandas())

    assert pipe.restore(tag="good") == k
    got = normalize(pipe.final_table().to_pandas())
    exp_k = normalize(oracle_at(fixture, k))
    # registry rolled back with the state: the column set is epoch-k's
    assert list(got.columns) == list(exp_k.columns)
    pd.testing.assert_frame_equal(got, exp_k, check_dtype=False)
    # future archives pruned, dangling tag dropped, anchored tag kept
    assert pipe.snapshots()[-1] == k
    assert pipe.tags() == {"good": k}

    # replaying the (unchanged) binlog reconverges to the full state and
    # rebuilds the pruned history
    pipe.run()
    got2 = normalize(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got2, full, check_dtype=False)
    assert pipe.snapshots()[-1] == eps[-1]
    assert_snapshot_matches(pipe, fixture, k)

    with pytest.raises(ValueError, match="not both"):
        pipe.restore(epoch=k, tag="good")
    with pytest.raises(KeyError):
        pipe.restore(tag="nope")
    with pytest.raises(ValueError, match="needs an epoch"):
        pipe.restore()


def test_fsck_audits_history_and_tags(ray_session, fixture, tmp_path):
    """fsck covers the time-travel promise: missing snapshot files and
    dangling tags are errors, a clean retained lake passes."""
    import glob as _glob

    from thor_ray.sources import fsck
    from thor_ray.state import create_tag
    from thor_ray.state.manifest import _atomic_write, _tags_path

    pipe = run_pipe(fixture, str(tmp_path / "lake"), retain_snapshots=99)
    lake = pipe.cfg.lake_dir
    k = pipe.snapshots()[len(pipe.snapshots()) // 2]
    create_tag(lake, "rel", k)
    r = fsck(lake)
    assert r["ok"], r["errors"]

    # a dangling tag (epoch with no retained archives) is an error
    _atomic_write(_tags_path(lake), {"rel": k, "ghost": -3})
    r2 = fsck(lake)
    assert not r2["ok"]
    assert any("ghost" in e for e in r2["errors"])
    _atomic_write(_tags_path(lake), {"rel": k})

    # an archive whose snapshot file was deleted out-of-band is an error
    victim = None
    ms_now = {f for m in __import__("thor_ray.state", fromlist=["x"])
              .load_manifests(lake).values() for f in m.files}
    for f in sorted(_glob.glob(os.path.join(lake, "part=*",
                                            "state-e*.parquet"))):
        if f not in ms_now:
            victim = f
            break
    assert victim is not None
    os.remove(victim)
    r3 = fsck(lake)
    assert not r3["ok"]
    assert any("missing snapshot file" in e for e in r3["errors"])


def test_restore_then_sink_reset(ray_session, tmp_path):
    """Restore × sink: rolled-back epochs leave STALE sink segments the
    exactly-once skip would keep forever; sink.reset(to_epoch) drops
    them and rewinds the group, so the re-advance exports the rewritten
    feed and the fold converges to the live state."""
    import glob as _glob

    from thor_ray.sources import SinkConnector
    from thor_ray.sources.lake import read_changefeed
    from thor_ray.state import load_manifests

    base = gen.gen_base_table(n_repos=12, paths_per_repo=8, seed=48)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=4_500, n_shards=3, ddl_every=0, delete_rate=0.08,
        update_rate=0.5, seed=48))
    d = str(tmp_path / "rs")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000,
        retain_snapshots=99))
    pipe.run(base=base_path)
    n_epochs = min(m.epoch for m in load_manifests(lake).values())

    sink = SinkConnector(lake, os.path.join(d, "out"), "exporter")
    sink.advance()
    k = n_epochs - 1
    pipe.restore(epoch=k)
    removed = sink.reset(k)
    assert removed == n_epochs - k
    assert sink.consumer.committed() == k

    pipe.run()   # rewrites epochs k+1.. (same binlog → same content here)
    r = sink.advance()
    assert r["committed"] == n_epochs and r["epochs_written"] == \
        n_epochs - k

    def norm_feed(df):
        df = df.where(pd.notna(df), None)
        return df.sort_values(["repo", "path", "lsn"]).reset_index(
            drop=True)[sorted(df.columns)]

    files = _glob.glob(os.path.join(d, "out", "epoch=*", "*.parquet"))
    sunk = pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)
    feed = read_changefeed(lake, 0, n_epochs).to_pandas()
    pd.testing.assert_frame_equal(norm_feed(sunk), norm_feed(feed),
                                  check_dtype=False)


def test_restore_fences_consumers(ray_session, tmp_path):
    """Restore fencing: indexes and views that advanced before a
    point-in-time restore fail loudly (stale state) instead of serving
    pre-restore epochs; a rebuild re-anchors and clears the fence."""
    import shutil as _shutil

    from thor_ray.pipelines.ivm import IncrementalView
    from thor_ray.sources.secondary import SecondaryIndex

    base = gen.gen_base_table(n_repos=10, paths_per_repo=8, seed=49)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=4_500, n_shards=3, ddl_every=0, delete_rate=0.06,
        update_rate=0.5, seed=49))
    d = str(tmp_path / "rf")
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000,
        retain_snapshots=99))
    pipe.run(base=base_path)
    n_epochs = pipe.snapshots()[-1]

    idx = SecondaryIndex(lake, os.path.join(d, "idx"), "lang")
    idx.advance()
    view = IncrementalView(lake, os.path.join(d, "view"), "lang")
    view.advance()

    pipe.restore(epoch=n_epochs - 1)
    pipe.run()   # reconverge (same binlog)
    with pytest.raises(ValueError, match="restored"):
        idx.advance()
    with pytest.raises(ValueError, match="restored"):
        idx.probe("py")
    with pytest.raises(ValueError, match="restored"):
        view.advance()

    # rebuild re-anchors: fresh index dir builds clean and serves
    _shutil.rmtree(os.path.join(d, "idx"))
    idx2 = SecondaryIndex(lake, os.path.join(d, "idx"), "lang")
    idx2.advance()
    df = pipe.final_table().to_pandas()
    v = sorted(df["lang"].dropna().unique())[0]
    exp = df.loc[df["lang"] == v, ["repo", "path"]] \
        .sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(idx2.probe_local(v), exp)
    # view.rebuild() re-anchors from the live lake and matches a recount
    v2 = view.rebuild()
    counts = df.groupby("lang").size().astype("int64")
    got = v2.set_index("lang")["n_rows"].astype("int64")
    assert got.sort_index().equals(counts.sort_index()), (got, counts)
    view.advance()   # fence cleared by the rebuild's fresh stamp


def test_sink_connector_wire_tier(tmp_path):
    """fmt='wire': the sink frames the chain's Debezium envelopes into
    magic|schema-id|payload binary parquet segments; decode_wire +
    ExtractNewRecordState over the union of segments reproduces the
    changefeed exactly (the registry-versioned converter boundary)."""
    import glob as _glob

    import numpy as np

    from thor_ray.sources import SinkConnector
    from thor_ray.sources.lake import read_changefeed
    from thor_ray.stages import (TransformChain, decode_wire,
                                 extract_new_record_state,
                                 to_change_envelope)

    base = gen.gen_base_table(n_repos=10, paths_per_repo=6, seed=46)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=3_000, n_shards=3, dup_rate=0.05, shuffle_window=96,
        ddl_every=0, delete_rate=0.1, update_rate=0.5, seed=46))
    d = str(tmp_path)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=4,
        epoch_size=EPOCH, write_mode="delta", compact_every=1_000_000))
    pipe.run(base=base_path)
    n_epochs = -(-log.max_lsn // EPOCH)

    chain = TransformChain(to_change_envelope(
        key_cols=["repo", "path"],
        payload_cols=["repo", "path", "commit", "lang", "content"],
        op_col="op", source_cols=["lsn"], source_name="lake"))
    out = os.path.join(d, "sink_wire")
    sink = SinkConnector(lake, out, "wire-exporter", chain=chain,
                         fmt="wire")
    r = sink.advance()
    assert r["epochs_written"] == n_epochs

    files = sorted(_glob.glob(os.path.join(out, "epoch=*", "*.parquet")))
    seg = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="default")
    assert set(seg.column_names) == {"key_wire", "value_wire"}
    assert seg.schema.field("value_wire").type in (pa.binary(),
                                                   pa.large_binary())
    dec = decode_wire()(seg.combine_chunks())
    ps = pa.schema([("repo", pa.string()), ("path", pa.string()),
                    ("commit", pa.string()), ("lang", pa.string()),
                    ("content", pa.string())])
    flat = extract_new_record_state(
        delete_mode="rewrite", add_source_fields=["lsn"],
        payload_schema=ps, key_col="key")(dec).to_pandas()

    want = read_changefeed(lake, 0, n_epochs).to_pandas()
    key = ["repo", "path", "__lsn"]
    flat = flat.rename(columns={"__lsn": "__lsn"}).sort_values(
        ["repo", "path", "__lsn"]).reset_index(drop=True)
    want = want.sort_values(["repo", "path", "lsn"]).reset_index(drop=True)
    assert len(flat) == len(want)
    assert (flat["__lsn"].to_numpy() == want["lsn"].to_numpy()).all()
    # delete rows recover identity from the wire key; live rows carry
    # the full payload byte-for-byte
    live_f = flat[flat["__deleted"] == "false"].reset_index(drop=True)
    live_w = want[want["op"] != "D"].reset_index(drop=True)
    for c in ("repo", "path", "commit", "lang", "content"):
        assert live_f[c].tolist() == live_w[c].tolist()
    del_f = flat[flat["__deleted"] == "true"]
    del_w = want[want["op"] == "D"]
    assert del_f[["repo", "path"]].values.tolist() == \
        del_w[["repo", "path"]].values.tolist()
