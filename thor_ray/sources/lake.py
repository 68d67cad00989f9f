"""Lake table readers (SURVEY.md §2.1 S1).

State files carry two internal columns: ``_lsn`` (last-writer lsn per key,
the merge tiebreaker) and ``_sha`` (cached sha256(content), so manifests'
content hashes are incremental — only changed rows are re-hashed each
epoch, SURVEY.md §7)."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

import ray.data

INTERNAL_COLS = ["_lsn", "_sha"]


def read_lake(lake_dir: str, manifests: dict | None = None,
              keep_internal: bool = False, **read_kwargs) -> "ray.data.Dataset":
    """Current committed lake state as a Dataset (manifest-listed files)."""
    from thor_ray.state import load_manifests

    ms = manifests if manifests is not None else load_manifests(lake_dir)
    files = [f for m in ms.values() for f in (m.files if hasattr(m, "files") else m["files"])]
    if not files:
        return ray.data.from_items([])
    # partitioning=None: the part=NNNNN dirs are layout, not hive columns
    ds = ray.data.read_parquet(files, partitioning=None, **read_kwargs)
    if not keep_internal:
        ds = ds.drop_columns([c for c in INTERNAL_COLS if c in ds.schema().names])
    return ds


def read_partition_state(files: list[str]) -> pd.DataFrame:
    """One partition's current state, inside an apply task (pyarrow read)."""
    if not files:
        return pd.DataFrame()
    import pyarrow as pa

    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables).to_pandas()
