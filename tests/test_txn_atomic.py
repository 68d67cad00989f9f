"""Transaction-atomic epoch boundaries (CdcConfig.txn_atomic): no commit
watermark ever splits a multi-event transaction, the deferred tail lands
in the next epoch, and the drained lake still equals the oracle."""

from __future__ import annotations

import os

import pyarrow as pa
import pandas as pd
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.sources import binlog as binlog_src


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("txnfix"))
    base = gen.gen_base_table(n_repos=20, paths_per_repo=10, seed=21)
    cfg = gen.BinlogConfig(n_events=8_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=64, ddl_every=2_500,
                           delete_rate=0.06, update_rate=0.5, seed=21)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    events = pa.concat_tables(log.shards)
    expected, _ = oracle.apply_events(events, initial=base)
    import pyarrow.parquet as pq
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    txn_by_lsn = dict(zip(events["lsn"].to_pylist(),
                          events["txn"].to_pylist()))
    return {"dir": d, "base_path": base_path, "binlog_dir": binlog_dir,
            "expected": expected, "max_lsn": log.max_lsn,
            "txn_by_lsn": txn_by_lsn}


def _is_txn_boundary(fix, h: int) -> bool:
    """No txn has events both at/below and above h."""
    below = {t for l, t in fix["txn_by_lsn"].items() if l <= h}
    above = {t for l, t in fix["txn_by_lsn"].items() if l > h}
    return not (below & above)


def test_txn_boundary_fn(fix, ray_session):
    """The clamp returns the largest boundary ≤ hi, and hi itself when
    hi is already a boundary or the log ends there."""
    mx = fix["max_lsn"]
    assert binlog_src.txn_boundary(fix["binlog_dir"], 0, mx) == mx
    clamped_any = False
    for hi in [700, 1500, 2300, 3100, 5250]:
        h = binlog_src.txn_boundary(fix["binlog_dir"], 0, hi)
        assert h <= hi
        assert _is_txn_boundary(fix, h), (hi, h)
        if h < hi:
            clamped_any = True
            # maximality: every lsn in (h, hi] would split a txn …
            # sufficient check: h+… the straddling txn covers (h, >hi]
            assert not _is_txn_boundary(fix, hi)
    assert clamped_any  # the grid points weren't all accidental boundaries


def test_txn_atomic_replay_matches_oracle(fix, ray_session, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = CdcConfig(lake_dir=lake, binlog_dir=fix["binlog_dir"],
                    num_partitions=4, epoch_size=1_700, shuffle="sort",
                    txn_atomic=True, compute_content_hash=False)
    pipe = CdcPipeline(cfg)
    pipe.run(base=fix["base_path"])

    # every committed epoch bound is a txn boundary
    clamped = 0
    for r in pipe.reports:
        assert _is_txn_boundary(fix, r.hi), r
        if r.hi not in (r.epoch * cfg.epoch_size, fix["max_lsn"]):
            clamped += 1
    assert clamped >= 1, [r.hi for r in pipe.reports]
    # full drain: last epoch reaches the log end
    assert pipe.reports[-1].hi == fix["max_lsn"]

    got = pipe.final_table().to_pandas()
    exp = fix["expected"]
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = exp.where(pd.notna(exp), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(exp.columns)]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_txn_atomic_mid_run_kill_resume(fix, ray_session, tmp_path):
    """Stop after two epochs (watermark mid-log on a txn boundary),
    resume to drain — still oracle-equal; the resumed epoch re-covers the
    deferred tail below its grid lo."""
    lake = str(tmp_path / "lake2")
    cfg = CdcConfig(lake_dir=lake, binlog_dir=fix["binlog_dir"],
                    num_partitions=4, epoch_size=1_700, shuffle="sort",
                    txn_atomic=True, compute_content_hash=False)
    pipe = CdcPipeline(cfg)
    pipe.run(base=fix["base_path"], max_epochs=2)
    upto = max(r.hi for r in pipe.reports)
    assert upto < fix["max_lsn"]
    assert _is_txn_boundary(fix, upto)

    pipe2 = CdcPipeline(cfg)
    pipe2.run(base=fix["base_path"])
    got = pipe2.final_table().to_pandas()
    exp = fix["expected"]
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = exp.where(pd.notna(exp), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
