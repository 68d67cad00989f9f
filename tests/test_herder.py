"""Two CONCURRENT driver processes racing one lake (docs/HERDER.md §3).

The in-process zombie test (test_cdc.py::test_writer_fencing) proves the
fence logic; this proves the deployment story: two OS processes, each
with its own Ray session, start the same replay on the same lake with
fencing on. Exactly one must survive to drain the log; a loser must exit
via FencedWriterError (never corrupt state); and the survivor's final
table must equal the clean single-writer oracle byte-for-byte.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from thor_ray import gen, oracle

_DRIVER = r"""
import json, os, sys
import ray

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline
from thor_ray.state import FencedWriterError

lake, binlog, base = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = CdcConfig(lake_dir=lake, binlog_dir=binlog, num_partitions=8,
                epoch_size=2_000)
pipe = CdcPipeline(cfg)
outcome = {"role": sys.argv[4]}
try:
    pipe.run(base=base)
    outcome["result"] = "completed"
    outcome["n_events"] = sum(r.n_events for r in pipe.reports)
except FencedWriterError as e:
    outcome["result"] = "fenced"
    outcome["error"] = str(e)
print("OUTCOME:" + json.dumps(outcome))
ray.shutdown()
"""


def test_two_concurrent_drivers_one_survivor(tmp_path):
    d = str(tmp_path)
    base = gen.gen_base_table(n_repos=12, paths_per_repo=10, seed=21)
    cfg = gen.BinlogConfig(n_events=6_000, n_shards=3, dup_rate=0.05,
                           shuffle_window=96, ddl_every=2_000,
                           delete_rate=0.06, update_rate=0.5, seed=21)
    log = gen.gen_binlog(base, cfg)
    binlog_dir = os.path.join(d, "binlog")
    log.write(binlog_dir)
    base_path = os.path.join(d, "base.parquet")
    pq.write_table(base, base_path)
    expected, _ = oracle.apply_events(pa.concat_tables(log.shards),
                                      initial=base)
    lake = os.path.join(d, "lake")

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "RAY_DEDUP_LOGS": "0",
           "PYTHONPATH": repo_root + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    script = os.path.join(d, "driver.py")
    with open(script, "w") as f:
        f.write(_DRIVER)
    procs = [
        subprocess.Popen([sys.executable, script, lake, binlog_dir,
                          base_path, name],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for name in ("driver-a", "driver-b")
    ]
    outcomes = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        lines = [ln for ln in out.splitlines() if ln.startswith("OUTCOME:")]
        assert lines, f"driver produced no outcome; stderr tail:\n{err[-2000:]}"
        outcomes.append(json.loads(lines[-1][len("OUTCOME:"):]))

    results = sorted(o["result"] for o in outcomes)
    # at least one driver drains the log; a loser is FENCED, never crashed
    assert "completed" in results, outcomes
    assert results in (["completed", "fenced"],
                       ["completed", "completed"]), outcomes
    # NOTE: ["completed", "completed"] is legal — if one driver finishes
    # the whole replay before the other commits again, the slow driver's
    # remaining epochs see an already-advanced watermark and apply as
    # no-ops; exactly-once is about STATE, not about who gets fenced.

    # the lake equals the clean single-writer oracle
    from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline

    final = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=binlog_dir, num_partitions=8,
        epoch_size=2_000, fencing=False)).final_table().to_pandas()

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        cols = sorted(df.columns)
        return df[cols].sort_values(["repo", "path"], kind="stable") \
            .reset_index(drop=True)

    want = norm(expected.to_pandas() if hasattr(expected, "to_pandas")
                else expected)
    got = norm(final)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False)
