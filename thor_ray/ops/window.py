"""Event-time windowing over a keyed stream (SURVEY.md §2.9 W1).

Ray Data has no native event-time windows; these are the standard
compositions: tumbling = grouped agg on truncated ts (see
queries.q19_window_tumbling), session = per-key gap detection inside
map_groups over the ts-sorted group. Partitioning assumption: one key's
history fits in one task (salt hot keys upstream otherwise)."""

from __future__ import annotations

import numpy as np
import pandas as pd

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
