"""Long-horizon state-growth soak (round-4 verdict #5).

50+ micro-batch epochs of delta-mode replay against a growing ~1M-key
lake on /dev/shm (weather-immune), recording the per-epoch events/s
series. The claim under test: throughput does NOT degrade with epoch
count — i.e. the delta write path is O(delta) per epoch with compaction
amortizing the level-0 run, not O(state) (the cow-vs-delta crossover
argument, run long enough for compaction to actually cycle,
compact_every=8 → ~6 compactions per partition over 50 epochs).

Usage:  python tools/state_soak.py [--epochs 50] [--events 2000000]
Prints ONE JSON line:
  {"metric": "cdc_state_soak", "epochs": N, "per_epoch_evps": [...],
   "q1_evps": ..., "q4_evps": ..., "late_over_early": ...,
   "n_compactions": ..., "lake_keys_final": ...}
`late_over_early` is mean(last-quarter)/mean(first-quarter) per-epoch
rate — >= ~0.8 means no monotone decline (early epochs also carry
actor-pool warmup, so >1 is common). Results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from thor_ray import gen
    from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline

    fixture = f"/tmp/thor_ray_bench/soak_ev{args.events}_k{args.keys}"
    info = gen.write_fixture(
        fixture, n_keys=args.keys,
        cfg=gen.BinlogConfig(n_events=args.events, n_shards=16,
                             dup_rate=0.05, shuffle_window=512,
                             ddl_every=0,   # DDL forces compaction every
                             # epoch at micro-batch cadence — disable so
                             # the soak measures the compact_every cycle
                             content_len=(64, 384), seed=42))
    lake = "/dev/shm/thor_ray_soak/lake"
    shutil.rmtree("/dev/shm/thor_ray_soak", ignore_errors=True)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake, binlog_dir=info["binlog_dir"],
        num_partitions=128, shuffle="spill",
        epoch_size=max(args.events // args.epochs, 1),
        compute_content_hash=True, write_mode="delta"))
    t0 = time.perf_counter()
    pipe.run(base=info["base"])
    wall = time.perf_counter() - t0

    # drop sub-half-size epochs (the remainder tail batch) from the RATE
    # series — a 30-event tail epoch measures scheduling overhead, not
    # throughput; its events still count in the totals
    full = max(args.events // args.epochs, 1)
    evps = [round(r.events_per_sec, 1) for r in pipe.reports
            if r.n_events >= full // 2]
    n = len(evps)
    q = max(n // 4, 1)
    q1 = sum(evps[:q]) / q
    q4 = sum(evps[-q:]) / q
    # surviving level-0 run length per partition: compaction cadence held
    # iff files-per-partition stays bounded by compact_every (folds keep
    # cycling), not ~n_epochs (runaway run growth)
    from thor_ray.state import manifest as M
    mans = M.load_manifests(lake)
    files_per_part = [len(m.files) for m in mans.values()]
    final = pipe.final_table()
    out = {
        "metric": "cdc_state_soak",
        "epochs": n,
        "events": int(sum(r.n_events for r in pipe.reports)),
        "wall_sec": round(wall, 2),
        "overall_evps": round(sum(r.n_events for r in pipe.reports) /
                              max(pipe.replay_wall_sec, 1e-9), 1),
        "per_epoch_evps": evps,
        "q1_evps": round(q1, 1),
        "q4_evps": round(q4, 1),
        "late_over_early": round(q4 / max(q1, 1e-9), 3),
        "max_files_per_partition": max(files_per_part, default=0),
        "mean_files_per_partition": round(
            sum(files_per_part) / max(len(files_per_part), 1), 2),
        "lake_keys_final": int(final.count()),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    shutil.rmtree("/dev/shm/thor_ray_soak", ignore_errors=True)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
