"""Shared Ray-2.49 workarounds for block-level warts (SURVEY.md §4.2).

Hash-shuffle partitions with no keys materialize as EMPTY, SCHEMA-LESS
blocks; concatenating or acero-joining them raises (and mixed schemas
trigger the executor's "RefBundle with a different schema" warning).
Every gather of a shuffled Dataset routes through ``nonempty_blocks`` /
``concat_nonempty`` so the guard lives in one place."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def nonempty_blocks(ds: Dataset) -> list[pa.Table]:
    """Materialized arrow blocks of ``ds`` with the schema-less empties
    dropped. Driver-sized: call only on output-sized datasets (candidate
    pairs, edge lists, aggregates). Pandas-format blocks (map_groups
    stages) come back unconverted from to_arrow_refs — normalized here."""
    import ray

    out: list[pa.Table] = []
    for t in ray.get(ds.to_arrow_refs()):
        if isinstance(t, pd.DataFrame):
            if len(t):
                out.append(pa.Table.from_pandas(t, preserve_index=False))
        elif t.num_rows:
            out.append(t)
    return out


def concat_nonempty(ds: Dataset, empty: pa.Table | None = None) -> pa.Table:
    """One arrow table from a (possibly shuffled) Dataset, ignoring
    schema-less empty blocks; ``empty`` supplies the schema when every
    block is empty (required — a schema-less gather is the bug this
    helper exists to prevent)."""
    blocks = nonempty_blocks(ds)
    if not blocks:
        if empty is None:
            raise ValueError(
                "concat_nonempty: all blocks empty and no `empty` "
                "schema table supplied")
        return empty
    return pa.concat_tables(blocks, promote_options="default")


def to_pandas_nonempty(ds: Dataset, empty: pd.DataFrame) -> pd.DataFrame:
    """`ds.to_pandas()` that survives all-empty shuffle outputs (Ray
    drops 0-row columns, yielding a column-less frame downstream code
    KeyErrors on) — falls back to the supplied empty frame's schema."""
    df = concat_nonempty(ds, empty=pa.Table.from_pandas(
        empty, preserve_index=False)).to_pandas()
    return df
