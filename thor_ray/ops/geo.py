"""Geospatial operators over point columns.

The fixtures carry no coordinates, so queries derive deterministic integer
coordinates from key columns with pure integer arithmetic (SQL-replayable
bit-for-bit); the operators here take coordinate COLUMNS as given and stay
agnostic of how they were produced.

Design for scale (SURVEY.md §2.8 family):

- ``grid_cell`` is map-only (one multiply+divide per row) — the geo
  analogue of the q88 histogram bucketing: density / aggregation over
  cells needs only a tiny cell-keyed groupby after it, never a spatial
  shuffle.
- ``nearest_site`` broadcasts the (small) site table once via ``ray.put``
  and resolves the argmin per batch with ONE (b,2)×(s,2) squared-distance
  matrix — the classic broadcast-join shape for small-side spatial
  assignment. Integer coordinates make the distance exact int64, so
  tie-breaks (lowest site id) are deterministic at any cluster size.
- ``haversine_km`` is the exact great-circle kernel (vectorized numpy
  doubles) for when coordinates are real degrees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

EARTH_RADIUS_KM = 6371.0


def grid_cell(t: pa.Table, lat_col: str, lon_col: str, cell: int,
              out_col: str = "cell", width: int = 1000) -> pa.Table:
    """Append an integer grid-cell id: ``(lat // cell) * width +
    (lon // cell)`` over integer coordinate columns. Map-only; floor
    division (callers keep coordinates non-negative so SQL's truncating
    ``//`` agrees)."""
    la = t[lat_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = t[lon_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cid = (la // cell) * width + (lo // cell)
    return t.append_column(out_col, pa.array(cid, type=pa.int64()))


def nearest_site(t: pa.Table, sites: "np.ndarray | ray.ObjectRef",
                 lat_col: str, lon_col: str,
                 out_col: str = "site_id") -> pa.Table:
    """Assign each row to the nearest of a broadcast site set by squared
    planar distance (exact int64 on integer coordinates). ``sites`` is an
    (s, 2) int array ordered by site id — np.argmin takes the FIRST
    minimum, which is then the lowest site id (deterministic ties).

    Pass a ``ray.put`` handle from the driver so the site matrix ships
    once per node, not once per batch."""
    s = ray.get(sites) if isinstance(sites, ray.ObjectRef) else sites
    la = t[lat_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = t[lon_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # (b, s) squared distances; int64 exact (coords fit in ~2^16)
    dy = la[:, None] - s[None, :, 0]
    dx = lo[:, None] - s[None, :, 1]
    best = np.argmin(dy * dy + dx * dx, axis=1).astype(np.int64)
    return t.append_column(out_col, pa.array(best, type=pa.int64()))


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in km between degree coordinates
    (vectorized doubles; standard haversine formula)."""
    p1, p2 = np.radians(np.asarray(lat1, dtype=np.float64)), \
        np.radians(np.asarray(lat2, dtype=np.float64))
    dphi = p2 - p1
    dlmb = np.radians(np.asarray(lon2, dtype=np.float64)
                      - np.asarray(lon1, dtype=np.float64))
    a = np.sin(dphi / 2.0) ** 2 \
        + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def grid_density(ds: Dataset, lat_col: str, lon_col: str, cell: int,
                 weight_col: str | None = None,
                 width: int = 1000) -> Dataset:
    """Per-cell density: map-side cell assignment + per-batch combiner
    partials (count and optional int weight sum) → ONE tiny groupby over
    the cell-count-sized key space. The geo aggregation never shuffles
    row-sized data."""
    def part(t: pa.Table) -> pa.Table:
        t = grid_cell(t, lat_col, lon_col, cell, width=width)
        cols = [t["cell"]]
        names = ["cell"]
        if weight_col is not None:
            cols.append(t[weight_col])
            names.append(weight_col)
        g = pa.table(dict(zip(names, cols))).group_by("cell")
        if weight_col is not None:
            agg = g.aggregate([("cell", "count"), (weight_col, "sum")])
            return agg.select(["cell", "cell_count", f"{weight_col}_sum"]) \
                .rename_columns(["cell", "n", "w"])
        agg = g.aggregate([("cell", "count")])
        return agg.select(["cell", "cell_count"]).rename_columns(["cell", "n"])

    from ray.data.aggregate import Sum
    parts = ds.map_batches(part, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    if weight_col is not None:
        aggs.append(Sum("w", alias_name="w"))
    return parts.groupby("cell").aggregate(*aggs)
