"""Footer-bloom file skipping for lake point lookups (state/bloom.py +
sources.lake._bloom_prune): no false negatives ever, measurable pruning
on an LSM run, lookups identical with and without the filter."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline
from thor_ray.sources.lake import lake_lookup
from thor_ray.state import bloom


def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, size=5_000, dtype=np.int64)
    others = rng.integers(0, 2**63, size=20_000, dtype=np.int64)
    others = others[~np.isin(others, members)]
    blob = bloom.build(members, impl="polars")
    assert bloom.might_contain(blob, members, "polars").all()
    fpp = bloom.might_contain(blob, others, "polars").mean()
    assert fpp < 0.05, fpp
    # impl mismatch and malformed blob degrade to all-True (never prune)
    assert bloom.might_contain(blob, others, "fnv").all()
    assert bloom.might_contain(b"junk", others, "polars").all()
    # empty filter: nothing is a member except via degradation paths
    empty = bloom.build(np.empty(0, dtype=np.int64), impl="polars")
    assert not bloom.might_contain(empty, members, "polars").any()


@pytest.fixture(scope="module")
def lsm_lake(tmp_path_factory, ray_session):
    """Delta-mode lake with a long uncompacted run per partition, so the
    point-read path has files to skip."""
    d = str(tmp_path_factory.mktemp("bloomlake"))
    # wide keyspace (4000 keys, ~2 events each): a given key appears in
    # only a couple of the ~10 delta runs, so blooms have files to skip —
    # with a hot-key fixture every file genuinely contains the key and
    # pruning (correctly) does nothing
    base = gen.gen_base_table(n_repos=200, paths_per_repo=20, seed=31)
    cfg = gen.BinlogConfig(n_events=8_000, n_shards=3, dup_rate=0.04,
                           shuffle_window=64, ddl_every=0,
                           delete_rate=0.05, update_rate=0.5, seed=31)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    lake = os.path.join(d, "lake")
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=4,
        epoch_size=800, write_mode="delta", compact_every=64))
    pipe.run(base=base_path)
    expected, _ = oracle.apply_events(
        __import__("pyarrow").concat_tables(log.shards), initial=base)
    return {"lake": lake, "expected": expected}


def test_lookup_prunes_and_matches(lsm_lake):
    exp = lsm_lake["expected"]
    # a present key, a deleted/absent key, and a never-existed key
    present = [tuple(exp.iloc[0][["repo", "path"]]),
               tuple(exp.iloc[-1][["repo", "path"]])]
    absent = [("repo-zz", "no/such/file.py")]
    stats: dict = {}
    got = lake_lookup(lsm_lake["lake"], present + absent, stats=stats)
    assert len(got) == 2
    for (r, p) in present:
        row = got[(got["repo"] == r) & (got["path"] == p)]
        assert len(row) == 1
        want = exp[(exp["repo"] == r) & (exp["path"] == p)].iloc[0]
        assert row.iloc[0]["content"] == want["content"]
    # the LSM run is long (compact_every=64, ~10 epochs of deltas):
    # a 2-key lookup must skip most run files
    assert stats["files_total"] > 8, stats
    assert stats["files_read"] < stats["files_total"] / 2, stats


def test_lookup_absent_key_reads_nothing(lsm_lake):
    """A never-written key should bloom-miss every run file (up to fpp),
    so the read set collapses to (almost) nothing."""
    stats: dict = {}
    got = lake_lookup(lsm_lake["lake"],
                      [("repo-zz", "nowhere.py")], stats=stats)
    assert len(got) == 0
    # one partition's run consulted; nearly all files skipped
    assert stats["files_read"] <= max(1, stats["files_total"] // 4), stats


def test_lookup_sweep_matches_oracle(lsm_lake):
    """Every live key round-trips through the pruned path (the no-false-
    negative property end-to-end, not just in the unit test)."""
    exp = lsm_lake["expected"]
    keys = [tuple(r) for r in exp[["repo", "path"]].itertuples(index=False)]
    got = lake_lookup(lsm_lake["lake"], keys)
    assert len(got) == len(exp)
    g = got.sort_values(["repo", "path"]).reset_index(drop=True)
    e = exp.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_series_equal(g["content"], e["content"])
