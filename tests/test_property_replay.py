"""Property-style replay equivalence over varied generator configs
(SURVEY.md §5.4): whatever the mix of rates / shards / skew / DDL cadence,
the distributed replay must equal the oracle fold. Seeded configs rather
than hypothesis so every run is deterministic and bounded."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline

CONFIGS = [
    # no DDL at all, heavy duplicates
    dict(n_events=6_000, n_shards=2, dup_rate=0.30, shuffle_window=32,
         ddl_every=0, delete_rate=0.05, update_rate=0.5, seed=21),
    # delete-heavy churn (keys vanish and reappear)
    dict(n_events=6_000, n_shards=8, dup_rate=0.02, shuffle_window=256,
         ddl_every=1_500, delete_rate=0.30, update_rate=0.30, seed=22),
    # DDL-dense (rename chains), single shard, max skew window
    dict(n_events=6_000, n_shards=1, dup_rate=0.10, shuffle_window=1_024,
         ddl_every=500, delete_rate=0.05, update_rate=0.6, seed=23),
    # insert-only append log with corruption
    dict(n_events=6_000, n_shards=4, dup_rate=0.05, shuffle_window=64,
         ddl_every=0, delete_rate=0.0, update_rate=0.0, new_key_rate=0.9,
         corrupt_rate=0.03, seed=24),
    # DDL defaults + widening + drops (backfill interplay with the
    # full DDL cycle)
    dict(n_events=6_000, n_shards=3, dup_rate=0.08, shuffle_window=128,
         ddl_every=1_000, ddl_defaults=True, ddl_widens=True,
         ddl_drops=True, delete_rate=0.08, update_rate=0.45, seed=25),
    # HOT-KEY SKEW (round-4 verdict #4): one repo takes 50% of events
    # and one path is the hottest single key (25% of all events) —
    # hash(repo, path) partitioning must still replay to oracle
    # equality with no per-partition hot-spot correctness drift
    dict(n_events=6_000, n_shards=4, dup_rate=0.10, shuffle_window=256,
         ddl_every=1_500, delete_rate=0.10, update_rate=0.50,
         hot_frac=0.5, hot_key_frac=0.5, seed=26),
]


@pytest.mark.parametrize("i", range(len(CONFIGS)))
def test_replay_equivalence(ray_session, tmp_path, i):
    cfg = gen.BinlogConfig(**CONFIGS[i])
    base = gen.gen_base_table(n_repos=8, paths_per_repo=10, seed=cfg.seed)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = str(tmp_path / "binlog")
    log.write(binlog_dir)
    expected, _ = oracle.apply_events(pa.concat_tables(log.shards), initial=base)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)

    # alternate engine configs across cases too
    pipe = CdcPipeline(CdcConfig(
        lake_dir=str(tmp_path / "lake"), binlog_dir=binlog_dir,
        num_partitions=[4, 16, 8, 32, 8, 16][i],
        epoch_size=[1_700, 2_000, 900, 6_000, 1_000, 1_500][i],
        shuffle=["spill", "sort", "spill", "sort", "spill", "spill"][i],
        write_mode=["cow", "delta", "delta", "cow", "delta", "delta"][i]))
    pipe.run(base=base_path)

    got = pipe.final_table().to_pandas()
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = expected.where(pd.notna(expected), None) \
        .sort_values(["repo", "path"]).reset_index(drop=True)[sorted(expected.columns)]
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert oracle.content_sha(got).tolist() == oracle.content_sha(exp).tolist()
