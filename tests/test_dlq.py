"""Dead-letter queue: malformed events are routed aside, never applied,
never silently dropped (SURVEY.md §2.1 S5; Connect errors.tolerance=all)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle
from thor_ray.pipelines import CdcConfig, CdcPipeline


def test_corrupt_events_hit_dlq_not_lake(ray_session, tmp_path):
    base = gen.gen_base_table(n_repos=10, paths_per_repo=10, seed=4)
    cfg = gen.BinlogConfig(n_events=5_000, n_shards=4, dup_rate=0.03,
                           shuffle_window=64, ddl_every=2_000,
                           corrupt_rate=0.02, seed=4)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = str(tmp_path / "binlog")
    log.write(binlog_dir)
    events = pa.concat_tables(log.shards)
    n_corrupt = len([o for o in events.column("op").to_pylist() if o == "X"])
    assert n_corrupt > 0

    expected, _ = oracle.apply_events(events, initial=base)

    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    lake = str(tmp_path / "lake")
    pipe = CdcPipeline(CdcConfig(lake_dir=lake, binlog_dir=binlog_dir,
                                 num_partitions=8, epoch_size=1_250))
    pipe.run(base=base_path)

    got = pipe.final_table().to_pandas()
    got = got.where(pd.notna(got), None).sort_values(["repo", "path"]) \
        .reset_index(drop=True)[sorted(got.columns)]
    exp = expected.where(pd.notna(expected), None) \
        .sort_values(["repo", "path"]).reset_index(drop=True)[sorted(expected.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # every malformed event (minus duplicate deliveries) landed in the DLQ
    dlq_files = glob.glob(os.path.join(lake, "_dlq", "*.parquet"))
    assert dlq_files
    dlq = pa.concat_tables([pq.read_table(f) for f in dlq_files]).to_pandas()
    dlq = dlq.drop_duplicates("lsn")
    corrupt_lsns = {
        r["lsn"] for r in events.to_pylist()
        if r["op"] not in ("I", "U", "D", "DDL")
        or (r["op"] != "DDL" and r["repo"] is None)
        or (r["op"] in ("I", "U") and r["content"] is None)
    }
    assert set(dlq["lsn"]) == corrupt_lsns
