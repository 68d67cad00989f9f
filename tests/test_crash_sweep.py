"""Systematic crash-point sweep over the commit path.

The torn-commit tests pin ONE adversarial window (stage-then-crash on a
named manifest). This sweep generalizes it: crash at the K-th
driver-side storage publish for a spread of K across the whole replay,
then resume with healthy storage and require oracle equality every
time. Driver-side publishes are the transactional boundary (manifests,
registry saves, lineage/metrics feeds — worker-side data files are
deterministic-name idempotent by design and gated by these), so
crash-anywhere-converge over them is the exactly-once claim in its
strongest testable form.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.state.storage import LocalFSStorage, set_default_storage


class CountingStorage(LocalFSStorage):
    def __init__(self):
        self.count = 0

    def put_atomic(self, final_path, stage, durable=True):
        self.count += 1
        super().put_atomic(final_path, stage, durable=durable)


class CrashAtNthPut(LocalFSStorage):
    """Crashes the N-th driver-side publish (counting put_atomic AND
    put_bytes, which routes through it) BEFORE anything is staged."""

    def __init__(self, n: int):
        self.n = n
        self.count = 0

    def put_atomic(self, final_path, stage, durable=True):
        self.count += 1
        if self.count == self.n:
            raise RuntimeError(
                f"injected crash at driver publish #{self.n}: {final_path}")
        super().put_atomic(final_path, stage, durable=durable)


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("crash_sweep")
    base = gen.gen_base_table(n_repos=6, paths_per_repo=8, seed=31)
    cfg = gen.BinlogConfig(n_events=5_000, n_shards=3, dup_rate=0.08,
                           shuffle_window=128, ddl_every=1_500,
                           delete_rate=0.08, update_rate=0.5, seed=31)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = str(tmp / "binlog")
    log.write(binlog_dir)
    base_path = str(tmp / "base.parquet")
    pq.write_table(base, base_path)
    expected, _ = oracle.apply_events(pa.concat_tables(log.shards),
                                      initial=base)
    return {"binlog_dir": binlog_dir, "base_path": base_path,
            "expected": expected}


def _cfg(fix, lake):
    return CdcConfig(lake_dir=lake, binlog_dir=fix["binlog_dir"],
                     num_partitions=4, epoch_size=1_200, shuffle="sort",
                     compute_content_hash=False)


def _assert_oracle_equal(pipe, fix):
    got = pipe.final_table().to_pandas()
    exp = fix["expected"]
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = exp.where(pd.notna(exp), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_crash_at_every_sampled_commit_point_then_resume(
        fix, ray_session, tmp_path):
    # 1. clean run to count the driver-side publish sequence
    counter = CountingStorage()
    prev = set_default_storage(counter)
    try:
        pipe = CdcPipeline(_cfg(fix, str(tmp_path / "lake_count")))
        pipe.run(base=fix["base_path"])
        total = counter.count
    finally:
        set_default_storage(prev)
    assert total > 10, f"expected a real publish sequence, got {total}"

    # 2. crash at ~8 points spread over the whole sequence (incl. the
    #    first and the last publish), resume healthy, require oracle
    #    equality each time
    points = sorted({1, total} | {max(1, round(total * i / 7))
                                  for i in range(1, 7)})
    for k in points:
        lake = str(tmp_path / f"lake_k{k}")
        crasher = CrashAtNthPut(k)
        prev = set_default_storage(crasher)
        try:
            with pytest.raises(RuntimeError, match="injected crash"):
                CdcPipeline(_cfg(fix, lake)).run(base=fix["base_path"])
        finally:
            set_default_storage(prev)
        assert crasher.count == k
        # resume with healthy storage on the SAME lake
        pipe2 = CdcPipeline(_cfg(fix, lake))
        pipe2.run(base=fix["base_path"])
        _assert_oracle_equal(pipe2, fix)


def test_double_crash_then_resume(fix, ray_session, tmp_path):
    """Crash, partially resume, crash AGAIN mid-resume, then drain —
    the compounding-failure case a single-crash sweep can't cover."""
    lake = str(tmp_path / "lake_double")
    prev = set_default_storage(CrashAtNthPut(9))
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            CdcPipeline(_cfg(fix, lake)).run(base=fix["base_path"])
    finally:
        set_default_storage(prev)
    prev = set_default_storage(CrashAtNthPut(5))
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            CdcPipeline(_cfg(fix, lake)).run(base=fix["base_path"])
    finally:
        set_default_storage(prev)
    pipe = CdcPipeline(_cfg(fix, lake))
    pipe.run(base=fix["base_path"])
    _assert_oracle_equal(pipe, fix)
