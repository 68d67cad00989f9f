"""Flagship runner: generate (cached) fixture → bootstrap → replay binlog.

Used by ``__ray_entry__.entry()`` (smoke tier), the ``cdc_replay`` query
(rows-only correctness tier) and ``bench.py`` (throughput tier). Does NOT
own the Ray session (driver contract, __ray_entry__.py:11-13).
"""

from __future__ import annotations

import os
import shutil

from thor_ray import gen
from thor_ray.pipelines.cdc import CdcConfig, CdcPipeline


def run_flagship(
    work_dir: str,
    n_keys: int = 2_000,
    n_events: int = 20_000,
    n_shards: int = 4,
    num_partitions: int = 16,
    epoch_size: int = 5_000,
    seed: int = 42,
    fresh_lake: bool = True,
    dup_rate: float = 0.05,
    shuffle_window: int = 256,
    ddl_every: int = 8_000,
    content_len: tuple[int, int] = (64, 512),
    compute_content_hash: bool = True,
    **cfg_kw,
) -> CdcPipeline:
    fixture_dir = os.path.join(work_dir, "fixture")
    info = gen.write_fixture(
        fixture_dir,
        n_keys=n_keys,
        cfg=gen.BinlogConfig(
            n_events=n_events, n_shards=n_shards, dup_rate=dup_rate,
            shuffle_window=shuffle_window, ddl_every=ddl_every,
            content_len=content_len, seed=seed,
        ),
        seed=seed,
    )
    lake_dir = os.path.join(work_dir, "lake")
    if fresh_lake and os.path.exists(lake_dir):
        shutil.rmtree(lake_dir)
    pipe = CdcPipeline(CdcConfig(
        lake_dir=lake_dir,
        binlog_dir=info["binlog_dir"],
        num_partitions=num_partitions,
        epoch_size=epoch_size,
        compute_content_hash=compute_content_hash,
        **cfg_kw,
    ))
    pipe.run(base=info["base"])
    return pipe
