"""Resumable partitioned Parquet sink (build brief: "write partitioned
Parquet — one directory per input shard / key range — so a failed run can
skip finished partitions; never one giant file").

Each partition value gets its own directory and a deterministic file name;
writes go to a temp name and `os.replace` in (atomic on POSIX, and the same
commit discipline as the CDC lake manifests), so a partition directory with
its final file present is COMPLETE and a re-run skips it. On a cluster the
out_dir must be shared storage (S3/NFS), same as the lake.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset


def write_partitioned(ds: Dataset, out_dir: str, by: str,
                      overwrite: bool = False,
                      row_group_size: int = 16_384) -> pd.DataFrame:
    """Write one `<by>=<value>/data.parquet` per distinct key value; returns
    a per-partition report (value, rows, skipped). Use a COARSE key (date
    bucket, shard id, hash range) — one directory per distinct value; salt
    or bucket a fine key upstream. The groupby is the one wide step; each
    group writes independently, so a re-run after a crash rewrites only the
    partitions whose final file is missing."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        val = g[by].iloc[0]
        if os.sep in str(val) or str(val).startswith(".."):
            # a raw '/' (or '..') in the key value would nest or escape the
            # one-dir-per-value layout; make the caller bucket/encode it
            raise ValueError(
                f"write_partitioned: key value {val!r} contains a path "
                "separator; encode or bucket the key first")
        d = os.path.join(out_dir, f"{by}={val}")
        final = os.path.join(d, "data.parquet")
        if not overwrite and os.path.exists(final):
            return pd.DataFrame([{"value": str(val), "rows": len(g),
                                  "skipped": True}])
        os.makedirs(d, exist_ok=True)
        tmp = final + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp,
                       row_group_size=row_group_size)
        # fsync before the rename: a final-named file must never hold
        # partial contents after a crash, or resume would skip it forever
        # (same discipline as state/manifest.py::_atomic_write)
        with open(tmp, "rb+") as f:
            os.fsync(f.fileno())
        os.replace(tmp, final)
        return pd.DataFrame([{"value": str(val), "rows": len(g),
                              "skipped": False}])

    rep = ds.groupby(by).map_groups(write_group,
                                    batch_format="pandas").to_pandas()
    if rep.empty:
        return pd.DataFrame(columns=["value", "rows", "skipped"])
    return rep.sort_values("value").reset_index(drop=True)
