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


def time_range_agg(ds: Dataset, key: str, ts_col: str, val_col: str,
                   interval: pd.Timedelta) -> Dataset:
    """Per-row trailing time-RANGE aggregate: for every event, the avg and
    count of `val_col` over the same key's events with
    ``ts ∈ [ts_row - interval, ts_row]`` — SQL's
    ``RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW`` frame,
    including equal-ts peers (the RANGE-mode CURRENT ROW = last-peer rule).

    Vectorized per key: one sort by ts, cumulative sums, then two
    np.searchsorted calls give every row's frame bounds — O(n log n) per
    key, no per-row Python. Same partitioning assumption as sessionize:
    one key's history fits one task."""
    iv_ns = np.int64(interval // pd.Timedelta(nanoseconds=1))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[ns]").view("int64")
        v = g[val_col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        csum = np.concatenate([[0.0], np.cumsum(np.where(ok, v, 0.0))])
        cnt = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
        lo = np.searchsorted(ts, ts - iv_ns, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        n_nonnull = cnt[hi] - cnt[lo]
        avg = np.divide(csum[hi] - csum[lo],
                        np.maximum(n_nonnull, 1), dtype=np.float64)
        return g.assign(
            range_avg=np.where(n_nonnull > 0, avg, np.nan),
            range_n=(hi - lo).astype("int64"))

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
