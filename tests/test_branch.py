"""Zero-copy lake branching (sources/branch.py): hardlinked creation,
independent divergence (branch replays on, source unchanged; source
writes, branch unchanged), cross-lake diff equality, merge-back via
binlog injection (value equality vs a pandas oracle), conflict
detection, merge idempotence, and fork-file GC protection.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(["repo", "path"], kind="stable") \
        .reset_index(drop=True)


@pytest.fixture()
def halfway(ray_session, tmp_path):
    """A lake replayed to lsn 4000 of an 8000-event log (delta mode)."""
    info = gen.write_fixture(
        str(tmp_path / "fixture"), n_keys=700,
        cfg=gen.BinlogConfig(n_events=8_000, n_shards=3, ddl_every=0,
                             delete_rate=0.06, seed=11))
    pipe = CdcPipeline(CdcConfig(
        lake_dir=str(tmp_path / "lake"), binlog_dir=info["binlog_dir"],
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    pipe.run(base=info["base"], until_lsn=4_000)
    return pipe, info


def test_branch_zero_copy_and_divergence(halfway, tmp_path):
    from thor_ray.sources.branch import create_branch, lake_diff

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    meta = create_branch(pipe.cfg.lake_dir, bdir)
    assert meta["partitions"] == 8 and meta["files"] > 0

    # zero-copy: data files are hardlinks (same inode), not copies
    f = glob.glob(os.path.join(bdir, "part=*", "state-e*.parquet"))[0]
    assert os.stat(f).st_nlink >= 2

    src_before = normalize(pipe.final_table().to_pandas())
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=pipe.cfg.binlog_dir,
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    bq = normalize(bpipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(bq, src_before)   # branch == fork image

    # branch replays the rest of the log; source must not move
    bpipe.run()
    exp_full, _ = oracle.apply_events(
        pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(
            os.path.join(info["binlog_dir"], "shard-*.parquet")))],
            ignore_index=True),
        initial=pd.read_parquet(info["base"]))
    pd.testing.assert_frame_equal(
        normalize(bpipe.final_table().to_pandas()), normalize(exp_full),
        check_dtype=False)
    pd.testing.assert_frame_equal(
        normalize(pipe.final_table().to_pandas()), src_before)

    # cross-lake diff == pandas comparison of the two finals
    d = lake_diff(pipe.cfg.lake_dir, bdir).to_pandas()
    a, b = src_before, normalize(bpipe.final_table().to_pandas())
    mg = a.merge(b, on=["repo", "path"], how="outer",
                 suffixes=("_a", "_b"), indicator=True)
    vis = [c for c in a.columns if c not in ("repo", "path")]
    changed = pd.Series(False, index=mg.index)
    for c in vis:
        va, vb = mg[f"{c}_a"], mg[f"{c}_b"]
        changed |= ~((va == vb) | (va.isna() & vb.isna()))
    exp_keys = mg[(mg["_merge"] != "both") | changed][["repo", "path"]]
    got_keys = d[["repo", "path"]]
    pd.testing.assert_frame_equal(
        got_keys.sort_values(["repo", "path"]).reset_index(drop=True),
        exp_keys.sort_values(["repo", "path"]).reset_index(drop=True))
    # direction tags: rows only in branch are I, only in source are D
    only_b = mg[mg["_merge"] == "right_only"][["repo", "path"]]
    if len(only_b):
        tag = d.merge(only_b, on=["repo", "path"])["change"]
        assert (tag == "I").all()


def test_source_writes_do_not_leak_into_branch(halfway, tmp_path):
    from thor_ray.sources.branch import create_branch

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir)
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=pipe.cfg.binlog_dir,
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    before = normalize(bpipe.final_table().to_pandas())

    # source continues its replay AND compacts (gc unlinks its names)
    pipe.run()
    from thor_ray.sources.lake import compact_lake
    compact_lake(pipe.cfg.lake_dir)
    after = normalize(bpipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(after, before)


def test_merge_branch_applies_changes(halfway, tmp_path):
    from thor_ray.sources.branch import create_branch, merge_branch

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir)
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=pipe.cfg.binlog_dir,
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    bpipe.run()                                 # branch diverges
    branch_now = normalize(bpipe.final_table().to_pandas())
    target_before = normalize(pipe.final_table().to_pandas())

    n = merge_branch(bdir, pipe, strategy="theirs")
    assert n > 0
    # idempotent re-issue before run(): identical segments, same count
    assert merge_branch(bdir, pipe, strategy="theirs") == n
    pipe.run()

    # oracle: branch changes (vs fork image) overwrite the target
    fork = target_before.set_index(["repo", "path"])
    bnow = branch_now.set_index(["repo", "path"])
    both = fork.index.intersection(bnow.index)
    changed = bnow.loc[both][(bnow.loc[both] != fork.loc[both]).any(axis=1)
                             | (bnow.loc[both].isna()
                                != fork.loc[both].isna()).any(axis=1)]
    created = bnow.loc[bnow.index.difference(fork.index)]
    deleted = fork.index.difference(bnow.index)
    exp = pd.concat([fork.drop(index=deleted).drop(index=changed.index),
                     changed, created]).sort_index().reset_index()
    got = normalize(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got, normalize(exp), check_dtype=False)
    # and the merged target now equals the branch (target had no own
    # changes since the fork in this scenario)
    pd.testing.assert_frame_equal(got, branch_now, check_dtype=False)


def test_merge_conflict_detection(halfway, tmp_path):
    from thor_ray.sources.branch import create_branch, merge_branch

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir)
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=pipe.cfg.binlog_dir,
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    bpipe.run()
    # target moves too: replay the same tail on the source → conflicts
    pipe.run()
    with pytest.raises(ValueError, match="merge conflict"):
        merge_branch(bdir, pipe, strategy="fail_on_conflict")
    # 'theirs' proceeds; after apply target == branch (same tail applied)
    merge_branch(bdir, pipe, strategy="theirs")
    pipe.run()
    pd.testing.assert_frame_equal(
        normalize(pipe.final_table().to_pandas()),
        normalize(bpipe.final_table().to_pandas()), check_dtype=False)


def test_branch_at_snapshot_epoch(ray_session, tmp_path):
    """Branch from a RETAINED time-travel snapshot: the branch equals the
    historical state, not the head, and replays forward from the
    snapshot watermark to the full oracle."""
    from thor_ray.sources.branch import create_branch
    from thor_ray.sources.lake import read_lake_at
    from thor_ray.state import load_manifests, snapshot_epochs

    info = gen.write_fixture(
        str(tmp_path / "fixture"), n_keys=600,
        cfg=gen.BinlogConfig(n_events=6_000, n_shards=3, ddl_every=0,
                             delete_rate=0.05, seed=13))
    pipe = CdcPipeline(CdcConfig(
        lake_dir=str(tmp_path / "lake"), binlog_dir=info["binlog_dir"],
        num_partitions=8, epoch_size=1_500, write_mode="delta",
        compact_every=1_000_000, retain_snapshots=8))
    pipe.run(base=info["base"])
    eps = snapshot_epochs(pipe.cfg.lake_dir)
    mid = eps[len(eps) // 2]
    assert mid < max(m.epoch for m in
                     load_manifests(pipe.cfg.lake_dir).values())

    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir, at_epoch=mid)
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=info["binlog_dir"], num_partitions=8,
        epoch_size=1_500, write_mode="delta", compact_every=1_000_000))
    hist = normalize(read_lake_at(pipe.cfg.lake_dir, mid).to_pandas())
    pd.testing.assert_frame_equal(
        normalize(bpipe.final_table().to_pandas()), hist)
    # forward replay from the snapshot watermark reaches the head state
    bpipe.run()
    pd.testing.assert_frame_equal(
        normalize(bpipe.final_table().to_pandas()),
        normalize(pipe.final_table().to_pandas()), check_dtype=False)
    # epoch before any retained archive -> loud error (as-of semantics:
    # an epoch PAST the head legitimately branches the head)
    with pytest.raises(ValueError, match="retained snapshot"):
        create_branch(pipe.cfg.lake_dir, str(tmp_path / "b2"),
                      at_epoch=-1)


def test_delete_branch_safety(halfway, tmp_path):
    from thor_ray.sources.branch import create_branch, delete_branch

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir)
    before = normalize(pipe.final_table().to_pandas())
    # refuses a non-branch dir (never point it at a real lake)
    with pytest.raises(ValueError, match="not a branch"):
        delete_branch(pipe.cfg.lake_dir)
    n = delete_branch(bdir)
    assert n > 0 and not os.path.exists(bdir)
    # hardlink semantics: the source's bytes are untouched
    pd.testing.assert_frame_equal(
        normalize(pipe.final_table().to_pandas()), before)


def test_fork_files_survive_branch_compaction(halfway, tmp_path):
    from thor_ray.sources.branch import (create_branch,
                                         load_fork_manifests, merge_branch)
    from thor_ray.sources.lake import compact_lake

    pipe, info = halfway
    bdir = str(tmp_path / "branch")
    create_branch(pipe.cfg.lake_dir, bdir)
    bpipe = CdcPipeline(CdcConfig(
        lake_dir=bdir, binlog_dir=pipe.cfg.binlog_dir,
        num_partitions=8, epoch_size=2_000, write_mode="delta",
        compact_every=1_000_000))
    bpipe.run()
    compact_lake(bdir)                  # gc must spare fork-referenced files
    for m in load_fork_manifests(bdir).values():
        for f in m.files:
            assert os.path.exists(f), f"fork file gc'ed: {f}"
    # merge still works after branch compaction
    assert merge_branch(bdir, pipe, strategy="theirs") > 0
