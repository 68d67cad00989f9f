"""Follower-lake replication: a replica maintained purely from the
primary's changefeed equals the primary's live state (SURVEY.md §2.1 S3
exactly-once + S7b CDC-out composed into a read replica — the
MirrorMaker / read-replica shape)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from thor_ray import gen
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.sources import (ChangefeedConsumer, fsck, lake_lookup,
                              read_lake, replicate_lake)

EPOCH = 1_500


def _mk_primary(d: str, ddl_every: int = 0) -> CdcPipeline:
    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=47)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=ddl_every,
                           delete_rate=0.1, update_rate=0.5, seed=47)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=os.path.join(d, "lake"), binlog_dir=binlog_dir,
        num_partitions=6, epoch_size=EPOCH, write_mode="delta",
        compact_every=1_000_000, retain_snapshots=99))
    pipe.run(base=base_path)
    return pipe


def _state(lake: str) -> pd.DataFrame:
    df = read_lake(lake).to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)[
        sorted(df.columns)]


@pytest.fixture(scope="module")
def primary(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("replfix"))
    return _mk_primary(d)


def test_replica_matches_primary_and_chains(ray_session, primary, tmp_path):
    src = primary.cfg.lake_dir
    rep = str(tmp_path / "replica")

    # seed = snapshot + tail: one pull copies the full current file run
    r1 = replicate_lake(src, rep)
    assert r1["caught_up"] and r1["stopped"] is None
    assert r1["epochs_applied"] == r1["upto_epoch"] > 0
    assert ChangefeedConsumer(src, "replica-default").committed() \
        == r1["upto_epoch"]

    want = _state(src)
    pd.testing.assert_frame_equal(_state(rep), want)

    # replica is a full lake: fsck-clean, point lookups route
    chk = fsck(rep)
    assert chk["ok"], chk["errors"]
    key = (want["repo"].iloc[0], want["path"].iloc[0])
    hit = lake_lookup(rep, [key])
    assert len(hit) == 1

    # caught-up re-pull is a no-op
    r3 = replicate_lake(src, rep)
    assert r3["epochs_applied"] == 0 and r3["caught_up"]

    # replicas chain: the replica serves its own changefeed
    rep2 = str(tmp_path / "replica2")
    rr = replicate_lake(rep, rep2)
    assert rr["caught_up"]
    pd.testing.assert_frame_equal(_state(rep2), want)


def test_replica_torn_apply_redelivery_idempotent(ray_session, primary,
                                                  tmp_path):
    """Torn apply (one partition's manifest never swapped) resumes from the
    slowest partition and re-delivers the gap; the re-apply overwrites
    identically — never duplicates."""
    from thor_ray.state import load_manifests
    from thor_ray.state.manifest import write_manifest

    src = primary.cfg.lake_dir
    rep = str(tmp_path / "replica")
    replicate_lake(src, rep, group="crashy")
    want = _state(rep)
    n_files = len(glob.glob(os.path.join(rep, "part=*", "*.parquet")))
    done = min(m.epoch for m in load_manifests(rep).values())

    # simulate the crash: one partition's manifest is two epochs behind
    m = load_manifests(rep)[0]
    m.epoch = done - 2
    m.files = [f for f in m.files
               if int(os.path.basename(f)[7:13]) <= done - 2]
    write_manifest(rep, m)

    r = replicate_lake(src, rep, group="crashy")
    assert r["epochs_applied"] == 2 and r["caught_up"]
    assert ChangefeedConsumer(src, "replica-crashy").committed() == done
    pd.testing.assert_frame_equal(_state(rep), want)
    assert len(glob.glob(os.path.join(rep, "part=*", "*.parquet"))) \
        == n_files  # overwritten, never duplicated


def test_replica_column_projection(ray_session, primary, tmp_path):
    src = primary.cfg.lake_dir
    rep = str(tmp_path / "replica")
    replicate_lake(src, rep, group="slim", columns=["lang"])
    got = _state(rep)
    want = _state(src)[["lang", "path", "repo"]]
    pd.testing.assert_frame_equal(got, want)


def test_replica_compaction_midstream(ray_session, primary, tmp_path):
    """compact_lake folds the replica's run files without a pipeline;
    replication resumes on top of the compacted file, and the compacted
    replica deep-fscks clean (row_count/content_hash restored)."""
    from thor_ray.sources import compact_lake

    src = primary.cfg.lake_dir
    rep = str(tmp_path / "replica")
    replicate_lake(src, rep, group="compacted", max_epochs=2)
    n = compact_lake(rep)
    assert n > 0
    # every partition folded to a single file
    ms = __import__("thor_ray.state", fromlist=["load_manifests"]) \
        .load_manifests(rep)
    assert all(len(m.files) == 1 for m in ms.values())

    r = replicate_lake(src, rep, group="compacted")
    assert r["caught_up"]
    pd.testing.assert_frame_equal(_state(rep), _state(src))
    compact_lake(rep)
    chk = fsck(rep, deep=True)
    assert chk["ok"], chk["errors"]


def test_replica_wrong_source_refused(ray_session, primary, tmp_path):
    src = primary.cfg.lake_dir
    rep = str(tmp_path / "replica")
    replicate_lake(src, rep)
    other = _mk_primary(str(tmp_path / "other"))
    with pytest.raises(ValueError, match="not a replica of"):
        replicate_lake(other.cfg.lake_dir, rep)


def test_compact_upto_tiered_retention(ray_session, tmp_path):
    """Partial compaction folds epochs ≤ E into one base run per
    partition while the tail changefeed keeps serving; consumers behind E
    block it (Kafka-retention rule); replicas seed from the compacted
    primary via the snapshot+tail path and still chain."""
    from thor_ray.sources import compact_upto, read_changefeed
    from thor_ray.state import load_manifests

    pipe = _mk_primary(str(tmp_path / "p"))
    lake = pipe.cfg.lake_dir
    want = _state(lake)
    cur = min(m.epoch for m in load_manifests(lake).values())
    assert cur >= 4

    def feed(lk, after):
        df = read_changefeed(lk, after).to_pandas()
        return df.sort_values(["lsn", "repo", "path"]) \
            .reset_index(drop=True)[sorted(df.columns)]

    tail = feed(lake, 2)
    ChangefeedConsumer(lake, "g1").commit(2)

    # a consumer still at 2 blocks folding epoch 3's changefeed away
    with pytest.raises(ValueError, match="behind"):
        compact_upto(lake, 3)

    n = compact_upto(lake, 2)
    assert n > 0
    ms = load_manifests(lake)
    assert all(len(m.files) == 1 + (m.epoch - 2) for m in ms.values())
    pd.testing.assert_frame_equal(_state(lake), want)   # state unchanged
    pd.testing.assert_frame_equal(feed(lake, 2), tail)  # tail feed intact
    with pytest.raises(ValueError, match="compaction product"):
        read_changefeed(lake, 1)   # folded range refused loudly
    assert compact_upto(lake, 2) == 0   # idempotent no-op
    # pre-fold runs stay on disk ONLY because the snapshot archives
    # reference them (retain_snapshots=99): gc protects time travel
    t1 = pipe.table_at(1).to_pandas()
    assert len(t1) > 0   # pre-fold epoch still time-travel readable

    # a fresh replica seeds from the compacted primary (snapshot + tail)
    rep = str(tmp_path / "replica")
    r = replicate_lake(lake, rep)
    assert r["caught_up"]
    pd.testing.assert_frame_equal(_state(rep), want)
    pd.testing.assert_frame_equal(feed(rep, 2), tail)   # replica chains

    # full catch-up fold needs force while g1 lags; then single-file state
    with pytest.raises(ValueError, match="behind"):
        compact_upto(lake, cur)
    compact_upto(lake, cur, force=True)
    ms = load_manifests(lake)
    assert all(len(m.files) == 1 for m in ms.values())
    pd.testing.assert_frame_equal(_state(lake), want)
    chk = fsck(lake, deep=True)
    assert chk["ok"], chk["errors"]


def test_replica_rebases_over_ddl_boundary(ray_session, tmp_path):
    """An incremental pull that runs into a DDL-compacted epoch rebases
    onto that epoch's full-state compaction product and keeps tailing —
    never silently skipping change rows. (A FRESH replica rides over
    historical DDLs the same way — its seed is a file-run snapshot.)"""
    d = str(tmp_path / "pddl")
    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=47)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=4_000,
                           delete_rate=0.1, update_rate=0.5, seed=47)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=os.path.join(d, "lake"), binlog_dir=binlog_dir,
        num_partitions=6, epoch_size=EPOCH, write_mode="delta",
        compact_every=1_000_000, retain_snapshots=99))
    src = pipe.cfg.lake_dir
    rep = str(tmp_path / "replica")

    # seed while the primary is at epoch 1 (pre-DDL)
    pipe.run(base=base_path, max_epochs=1)
    r = replicate_lake(src, rep)
    assert r["caught_up"] and r["upto_epoch"] == 1

    # primary advances through the DDL epoch (forced full compaction);
    # the incremental pull REBASES onto the epoch's compaction product
    # and keeps tailing — no manual re-seed
    pipe.run()
    r = replicate_lake(src, rep)
    assert r["caught_up"] and r["stopped"] is None
    pd.testing.assert_frame_equal(_state(rep), _state(src))
    # superseded pre-rebase runs were removed from the replica
    from thor_ray.state import load_manifests
    ms = load_manifests(rep)
    n_disk = len(glob.glob(os.path.join(rep, "part=*", "*.parquet")))
    assert n_disk == sum(len(m.files) for m in ms.values())

    # and the replica still serves the post-DDL tail changefeed
    from thor_ray.sources import read_changefeed
    ddl_epoch = min(_run_epoch(m.files[0]) for m in ms.values())
    tail_rep = read_changefeed(rep, ddl_epoch).to_pandas()
    tail_src = read_changefeed(src, ddl_epoch).to_pandas()
    key = ["lsn", "repo", "path"]
    pd.testing.assert_frame_equal(
        tail_rep.sort_values(key).reset_index(drop=True),
        tail_src.sort_values(key).reset_index(drop=True))


def _run_epoch(path: str) -> int:
    return int(os.path.basename(path)[7:13])


def test_replica_reseeds_over_retention_gap(ray_session, tmp_path):
    """A replica behind a compact_upto that already gc'd the runs it
    needed falls back to a full snapshot re-seed in place."""
    from thor_ray.sources import compact_upto
    from thor_ray.state import load_manifests

    d = str(tmp_path / "p")
    base = gen.gen_base_table(n_repos=15, paths_per_repo=10, seed=47)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=0,
                           delete_rate=0.1, update_rate=0.5, seed=47)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=os.path.join(d, "lake"), binlog_dir=binlog_dir,
        num_partitions=6, epoch_size=EPOCH, write_mode="delta",
        compact_every=1_000_000))
    src = pipe.cfg.lake_dir
    rep = str(tmp_path / "replica")

    pipe.run(base=base_path, max_epochs=1)
    replicate_lake(src, rep)                  # seeded at epoch 1
    pipe.run()                                # primary advances to cur
    cur = min(m.epoch for m in load_manifests(src).values())
    compact_upto(src, cur, force=True)        # folds + gc's the gap

    r = replicate_lake(src, rep)
    assert r["caught_up"] and r["stopped"] is None
    pd.testing.assert_frame_equal(_state(rep), _state(src))
    ms = load_manifests(rep)
    assert all(len(m.files) == 1 and m.row_count >= 0 for m in ms.values())
    chk = fsck(rep, deep=True)                # mirrored manifests verify
    assert chk["ok"], chk["errors"]


def test_replica_reseeds_after_primary_restore(ray_session, tmp_path):
    """Restore self-heal: a point-in-time restore rewrites primary
    epochs; the replica detects the bumped restore count and falls back
    to a full snapshot re-seed instead of serving stale runs."""
    base = gen.gen_base_table(n_repos=10, paths_per_repo=8, seed=52)
    log = gen.gen_binlog(base, gen.BinlogConfig(
        n_events=4_500, n_shards=3, ddl_every=0, delete_rate=0.06,
        update_rate=0.5, seed=52))
    d = str(tmp_path)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=6,
        epoch_size=1_500, write_mode="delta", compact_every=1_000_000,
        retain_snapshots=99))
    pipe.run(base=base_path)
    n_epochs = pipe.snapshots()[-1]

    replica = os.path.join(d, "replica")
    r1 = replicate_lake(lake, replica)
    assert r1["caught_up"]

    pipe.restore(epoch=n_epochs - 1)
    pipe.run()   # reconverge
    r2 = replicate_lake(lake, replica)
    assert r2["caught_up"]

    def norm(ds):
        df = ds.to_pandas()
        df = df.where(pd.notna(df), None)
        return df.sort_values(["repo", "path"]).reset_index(drop=True)[
            sorted(df.columns)]

    pd.testing.assert_frame_equal(norm(read_lake(replica)),
                                  norm(pipe.final_table()),
                                  check_dtype=False)
    # the identity file now records the primary's restore count — the
    # next replicate is incremental again (not a re-seed)
    import json as _json
    with open(os.path.join(replica, "_schema", "replica.json")) as f:
        assert _json.load(f)["src_restores"] == 1
    r3 = replicate_lake(lake, replica)
    assert r3["epochs_applied"] == 0 and r3["caught_up"]
