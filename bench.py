"""Benchmark harness (driver contract + SURVEY.md §7 M6).

Plain run: times the headline CDC replay (events/s) plus representative
operator queries over $GRAFT_SF_DIR, printing ONE JSON line.

--scaling: runs the same job in fresh processes at num_cpus=8 and 32 and
reports both throughputs + scaling efficiency (the in-sandbox stand-in for
the north_rule's N vs 4N cluster sizes — no multi-node cluster exists here;
see BASELINE.md).

This script OWNS its Ray session (unlike __ray_entry__).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline replay size; scaling mode raises it so the 32-cpu run is >= 60 s
N_EVENTS = int(os.environ.get("GRAFT_BENCH_EVENTS", "1000000"))
N_KEYS = int(os.environ.get("GRAFT_BENCH_KEYS", "100000"))

BENCH_QUERIES = ["q01_pricing_summary", "q03_join_orders_customer",
                 "q11_sort_limit", "q18_json_extract", "q24_partial_agg",
                 "q31_ann_brute", "q40_minhash_pairs"]


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from thor_ray import gen
    from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline
    import thor_ray.queries as Q

    # ---- headline: CDC replay ------------------------------------------
    fixture_dir = f"/tmp/thor_ray_bench/ev{N_EVENTS}_k{N_KEYS}"
    info = gen.write_fixture(
        fixture_dir, n_keys=N_KEYS,
        cfg=gen.BinlogConfig(n_events=N_EVENTS, n_shards=16, dup_rate=0.05,
                             shuffle_window=512, ddl_every=max(N_EVENTS // 4, 1),
                             content_len=(64, 384), seed=42))
    # warm page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq
    for f in sorted(os.listdir(info["binlog_dir"])):
        pq.read_table(os.path.join(info["binlog_dir"], f))

    lake_dir = f"/tmp/thor_ray_bench/lake_{NUM_CPUS}"
    import shutil
    shutil.rmtree(lake_dir, ignore_errors=True)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake_dir, binlog_dir=info["binlog_dir"],
        num_partitions=max(NUM_CPUS * 4, 32),
        epoch_size=max(N_EVENTS // 4, 1),
        compute_content_hash=True))
    t0 = time.perf_counter()
    pipe.run(base=info["base"])
    cdc_sec = time.perf_counter() - t0
    n_applied = sum(r.n_events for r in pipe.reports)
    events_per_sec = n_applied / cdc_sec if cdc_sec else 0.0

    # ---- operator queries over the sf dir ------------------------------
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _ = Q.QUERIES[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize()
        q_times[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    total = round(cdc_sec + sum(q_times.values()), 3)
    return {
        "metric": "cdc_replay_plus_operator_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": {"cdc_replay": round(cdc_sec, 3), **q_times},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "cdc_events_applied": int(n_applied),
        "cdc_events_per_sec": round(events_per_sec, 1),
    }


def run_scaling() -> dict:
    """Same input, fresh processes at 8 then 32 CPUs (the N→4N evidence)."""
    ev = os.environ.get("GRAFT_SCALING_EVENTS", "4000000")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_EVENTS=ev)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tp_lo = lo["cdc_events_per_sec"]
    tp_hi = hi["cdc_events_per_sec"]
    eff = (tp_hi / tp_lo) / (32 / 8) if tp_lo else 0.0
    return {
        "metric": "cdc_scaling_8_to_32_cpus",
        "events": int(ev),
        "events_per_sec_8": tp_lo, "events_per_sec_32": tp_hi,
        "cdc_sec_8": lo["queries"]["cdc_replay"],
        "cdc_sec_32": hi["queries"]["cdc_replay"],
        "speedup": round(tp_hi / tp_lo, 3) if tp_lo else 0.0,
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
