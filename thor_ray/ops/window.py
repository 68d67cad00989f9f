"""Event-time windowing over a keyed stream (SURVEY.md §2.9 W1).

Ray Data has no native event-time windows; these are the standard
compositions: tumbling = grouped agg on truncated ts (see
queries.q19_window_tumbling), session = per-key gap detection inside
map_groups over the ts-sorted group. Partitioning assumption: one key's
history fits in one task (salt hot keys upstream otherwise)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def sessionize(ds: Dataset, key: str, ts_col: str, gap: pd.Timedelta,
               agg: bool = True) -> Dataset:
    """Assign gap-based session ids per key; with agg=True returns one row
    per (key, session_id): n_events + span_us, else the events with a
    session_id column."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        new_session = g[ts_col].diff() > gap
        g = g.assign(session_id=new_session.cumsum().astype("int64"))
        if not agg:
            return g
        out = g.groupby("session_id", sort=True).agg(
            n_events=(ts_col, "size"),
            start=(ts_col, "min"),
            end=(ts_col, "max"),
        ).reset_index()
        out["span_us"] = ((out["end"] - out["start"])
                          // pd.Timedelta(microseconds=1)).astype("int64")
        out.insert(0, key, g[key].iloc[0])
        return out[[key, "session_id", "n_events", "span_us"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def hopping_window(ds: Dataset, ts_col: str, size_us: int, hop_us: int,
                   out: str = "win_start") -> Dataset:
    """Hopping (sliding) event-time windows: replicate each row into every
    window containing it (size must be a multiple of hop; each row lands in
    size/hop windows), emitting `out` = window-start timestamp. Caller
    aggregates with a plain groupby(out) — the replication is a stateless
    vectorized map, the ONLY wide step is that downstream groupby.

    Window membership: ws = floor(ts/hop)*hop - i*hop for i in 0..m-1,
    always satisfying ws <= ts < ws + size."""
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    m = size_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t[ts_col], pa.int64()).to_numpy()
        base = (ts_us // hop_us) * hop_us
        wins = np.concatenate([base - i * hop_us for i in range(m)])
        idx = np.tile(np.arange(len(t), dtype=np.int64), m)
        rep = t.take(pa.array(idx))
        return rep.append_column(
            out, pc.cast(pa.array(wins), pa.timestamp("us")))

    return ds.map_batches(expand, batch_format="pyarrow")
