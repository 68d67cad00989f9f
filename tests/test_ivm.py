"""Incremental materialized-view maintenance (pipelines/ivm.py):
equivalence with full recompute, stepwise == one-shot incrementality,
crash-window idempotence, and the rebuild re-anchor path.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pytest


def _expected(df: pd.DataFrame, group_col: str = "lang") -> pd.DataFrame:
    m = df["content"].map(lambda c: len(c.encode("utf-8"))
                          if isinstance(c, str) else 0)
    out = (pd.DataFrame({group_col: df[group_col], "m": m})
           .groupby(group_col, as_index=False)
           .agg(n_rows=("m", "size"), m_sum=("m", "sum")))
    out["n_rows"] = out["n_rows"].astype("int64")
    out["m_sum"] = out["m_sum"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


@pytest.fixture(scope="module")
def pipe(ray_session):
    from thor_ray.pipelines.flagship import run_flagship
    return run_flagship("/tmp/thor_ray_ivm", n_keys=1_500, n_events=12_000,
                        n_shards=3, num_partitions=8, epoch_size=3_000,
                        ddl_every=0, write_mode="delta",
                        compact_every=1_000_000)


@pytest.fixture()
def view_dir(tmp_path):
    return str(tmp_path / "view")


def test_ivm_matches_recompute(pipe, view_dir):
    from thor_ray.pipelines.ivm import IncrementalView
    iv = IncrementalView(pipe.cfg.lake_dir, view_dir)
    got = iv.advance()
    exp = _expected(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # advance with nothing new is a no-op
    again = iv.advance()
    pd.testing.assert_frame_equal(again.reset_index(drop=True), exp)


def test_ivm_stepwise_equals_oneshot_and_midpoint(pipe, view_dir, tmp_path):
    from thor_ray.pipelines.ivm import IncrementalView
    from thor_ray.sources.lake import read_changefeed

    iv = IncrementalView(pipe.cfg.lake_dir, view_dir)
    mid = iv._lake_epoch() // 2
    got_mid = iv.advance(upto_epoch=mid)

    # independent mid-epoch oracle: bootstrap image + changefeed fold
    import glob as _glob
    boot = pd.concat([
        pd.read_parquet(f, columns=["repo", "path", "lang", "content",
                                    "_op", "_lsn"])
        for f in _glob.glob(os.path.join(pipe.cfg.lake_dir, "part=*",
                                         "state-e000000.parquet"))
    ]).rename(columns={"_op": "op", "_lsn": "lsn"})
    cf = read_changefeed(pipe.cfg.lake_dir, 0, mid).to_pandas()
    st = pd.concat([boot, cf[boot.columns]], ignore_index=True) \
        .sort_values("lsn", kind="stable") \
        .drop_duplicates(["repo", "path"], keep="last")
    st = st[st["op"] != "D"]
    pd.testing.assert_frame_equal(got_mid.reset_index(drop=True),
                                  _expected(st))

    got_full = iv.advance()
    one_shot = IncrementalView(pipe.cfg.lake_dir,
                               str(tmp_path / "oneshot")).advance()
    pd.testing.assert_frame_equal(got_full.reset_index(drop=True),
                                  one_shot.reset_index(drop=True))


def test_ivm_group_migration_occurs(pipe):
    """The fixture's updates re-draw lang — the view must be exercising
    the debit-old-group/credit-new-group path, not just count drift."""
    from thor_ray.sources.lake import read_changefeed
    cf = read_changefeed(pipe.cfg.lake_dir, 0).to_pandas()
    u = cf[cf["op"] == "U"].sort_values("lsn", kind="stable")
    first = u.drop_duplicates(["repo", "path"], keep="first")
    last = u.drop_duplicates(["repo", "path"], keep="last")
    j = first.merge(last, on=["repo", "path"], suffixes=("_a", "_b"))
    assert (j["lang_a"] != j["lang_b"]).any()


def test_ivm_crash_window_idempotent(pipe, view_dir):
    """Partition ledgers written but manifest not swapped (crash window):
    re-running advance() overwrites them and commits the same view."""
    from thor_ray.pipelines.ivm import (IncrementalView,
                                        _advance_partition)
    iv = IncrementalView(pipe.cfg.lake_dir, view_dir)
    mid = iv._lake_epoch() // 2
    iv.advance(upto_epoch=mid)
    man = iv._load()
    full = iv._lake_epoch()
    # simulate the crashed run: every partition's work is on disk, no swap
    for pid_s, ledger in man["keys"].items():
        _advance_partition(int(pid_s), lake_dir=pipe.cfg.lake_dir,
                           view_dir=view_dir, group_col="lang",
                           metric="content_bytes", e0=mid, e1=full,
                           ledger_file=ledger)
    assert iv.epoch() == mid            # still uncommitted
    got = iv.advance()
    exp = _expected(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_ivm_rebuild_and_reanchor(pipe, view_dir):
    from thor_ray.pipelines.ivm import IncrementalView
    iv = IncrementalView(pipe.cfg.lake_dir, view_dir, group_col="repo",
                         metric="rows")
    got = iv.rebuild()
    df = pipe.final_table().to_pandas()
    exp = (df.groupby("repo", as_index=False)
           .agg(n_rows=("repo", "size")))
    exp["m_sum"] = exp["n_rows"] = exp["n_rows"].astype("int64")
    exp = exp[["repo", "n_rows", "m_sum"]] \
        .sort_values("repo").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # anchored at lake head: a further advance is a no-op
    pd.testing.assert_frame_equal(iv.advance().reset_index(drop=True), exp)


def test_ivm_spec_mismatch_raises(pipe, view_dir):
    from thor_ray.pipelines.ivm import IncrementalView
    IncrementalView(pipe.cfg.lake_dir, view_dir).advance()
    with pytest.raises(ValueError, match="maintains"):
        IncrementalView(pipe.cfg.lake_dir, view_dir,
                        group_col="repo").view()


def test_ivm_gc_keeps_only_live_files(pipe, view_dir):
    from thor_ray.pipelines.ivm import IncrementalView
    import glob
    iv = IncrementalView(pipe.cfg.lake_dir, view_dir)
    mid = iv._lake_epoch() // 2
    iv.advance(upto_epoch=mid)
    iv.advance()
    views = glob.glob(os.path.join(view_dir, "view-e*.parquet"))
    assert len(views) == 1
    for d in glob.glob(os.path.join(view_dir, "keys", "part=*")):
        assert len(os.listdir(d)) == 1


def _expected_rows(df: pd.DataFrame, group_col: str = "lang") -> pd.DataFrame:
    out = (df.groupby(group_col, as_index=False).size()
           .rename(columns={"size": "n_rows"}))
    out["n_rows"] = out["n_rows"].astype("int64")
    out["m_sum"] = out["n_rows"]
    return out.sort_values(group_col).reset_index(drop=True)


def test_retraction_view_matches_recompute(pipe, view_dir):
    """Ledger-free retraction IVM over the before-image feed: one-shot
    advance == full recount; caught-up advance is a no-op."""
    from thor_ray.pipelines.ivm import RetractionView
    rv = RetractionView(pipe.cfg.lake_dir, view_dir, metric="rows")
    got = rv.advance()
    exp = _expected_rows(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    again = rv.advance()
    pd.testing.assert_frame_equal(again.reset_index(drop=True), exp)


def test_retraction_view_stepwise_and_crash(pipe, tmp_path):
    """Epoch-at-a-time advances equal the one-shot result at every
    midpoint (each checked against the lake's time-travel recount), and a
    crash between view write and manifest swap re-derives identically."""
    from thor_ray.pipelines.ivm import RetractionView
    from thor_ray.state import load_manifests

    last = min(m.epoch for m in load_manifests(pipe.cfg.lake_dir).values())
    vd = str(tmp_path / "rv_step")
    rv = RetractionView(pipe.cfg.lake_dir, vd, metric="content_bytes")
    for e in range(1, last + 1):
        got = rv.advance(upto_epoch=e)
        # stepwise == a fresh one-shot advance to the same midpoint
        one = RetractionView(pipe.cfg.lake_dir,
                             str(tmp_path / f"rv_one_{e}"),
                             metric="content_bytes").advance(upto_epoch=e)
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      one.reset_index(drop=True))
    assert rv.epoch() == last
    exp = _expected(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(rv.view().reset_index(drop=True), exp)

    # crash window: the new view file landed but the manifest swap didn't
    # (GC only runs AFTER the swap, so the committed view is still on
    # disk) — re-advance must overwrite the leftover and commit cleanly
    vd2 = str(tmp_path / "rv_crash")
    rv2 = RetractionView(pipe.cfg.lake_dir, vd2, metric="content_bytes")
    mid = last - 1
    rv2.advance(upto_epoch=mid)
    assert rv2.epoch() == mid
    stale = os.path.join(vd2, f"view-e{last:06d}.parquet")
    pd.DataFrame({"lang": ["bogus"], "n_rows": [999],
                  "m_sum": [999]}).to_parquet(stale, index=False)
    got = rv2.advance(upto_epoch=last)
    exp = _expected(pipe.final_table().to_pandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    pd.testing.assert_frame_equal(
        pd.read_parquet(stale).reset_index(drop=True), exp)

    # wrong-config guard
    with pytest.raises(ValueError):
        RetractionView(pipe.cfg.lake_dir, vd2, metric="rows").view()
