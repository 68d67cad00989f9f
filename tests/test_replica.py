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

    # incremental catch-up in two pulls
    r1 = replicate_lake(src, rep, max_epochs=2)
    assert r1["epochs_applied"] == 2 and not r1["caught_up"]
    r2 = replicate_lake(src, rep)
    assert r2["caught_up"] and r2["stopped"] is None
    assert ChangefeedConsumer(src, "replica-default").committed() \
        == r2["upto_epoch"]

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


def test_replica_stops_at_compaction_boundary(ray_session, tmp_path):
    """A DDL epoch compacts its runs; replication consumes the maximal
    level-0 prefix and reports the boundary instead of silently skipping
    change rows."""
    pipe = _mk_primary(str(tmp_path / "pddl"), ddl_every=2_500)
    src = pipe.cfg.lake_dir
    rep = str(tmp_path / "replica")
    r = replicate_lake(src, rep)
    assert r["stopped"] is not None and "compaction" in r["stopped"]
    assert not r["caught_up"]
    assert r["upto_epoch"] >= 1
    # everything before the boundary is faithfully applied
    got = _state(rep)
    want = pipe.table_at(r["upto_epoch"]).to_pandas()
    want = want.sort_values(["repo", "path"]).reset_index(drop=True)[
        sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want)
