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


def travel_distance(ds: Dataset, key_col: str, ts_col: str, ord_col: str,
                    lat_col: str, lon_col: str, fanout: int = 64,
                    unit: float = 1e6) -> Dataset:
    """Per-key trajectory length: haversine over consecutive points in
    (ts, ord) order. One coarse-salt shuffle (key % fanout → ~fanout Ray
    groups at any key count), consecutive-segment distances vectorized
    inside each group, each segment ROUNDED to 1/unit and summed as exact
    integers — so the per-key total is independent of summation order
    (float sums are not) and replays bit-for-bit in SQL."""
    import pyarrow.compute as pc

    def salt(t: pa.Table) -> pa.Table:
        s = pc.cast(pc.bit_wise_and(t[key_col], fanout - 1), pa.int32())
        return t.append_column("ksalt", s)

    def dist(g: "object") -> "object":
        import pandas as pd
        g = g.sort_values([key_col, ts_col, ord_col], kind="stable")
        keys = g[key_col].to_numpy()
        if len(keys) == 0:
            return pd.DataFrame({key_col: keys,
                                 "dist_km": np.array([], dtype=np.float64)})
        la = g[lat_col].to_numpy(dtype=np.float64)
        lo = g[lon_col].to_numpy(dtype=np.float64)
        km = haversine_km(la[:-1], lo[:-1], la[1:], lo[1:])
        same = keys[1:] == keys[:-1]
        # round half-away to 1/unit, exact int sum per key
        v = km * unit
        fl = np.floor(v)
        seg = (fl + (v - fl >= 0.5)).astype(np.int64) * same
        tot = pd.Series(seg).groupby(keys[:-1]).sum()
        first_of_key = np.r_[True, keys[1:] != keys[:-1]]
        uk = keys[first_of_key]
        out = pd.DataFrame({key_col: uk})
        # .to_numpy(): the reindexed Series carries KEY values as its
        # index — direct assignment would align on out's positional index
        out["dist_km"] = (tot.reindex(uk).fillna(0).astype(np.int64)
                          .to_numpy() / unit)
        return out

    return (ds.map_batches(salt, batch_format="pyarrow")
            .groupby("ksalt").map_groups(dist, batch_format="pandas"))


def grid_hotspots(ds: Dataset, lat_col: str, lon_col: str, cell: int,
                  min_count: int, width: int = 1000) -> "object":
    """Grid-DBSCAN hotspot clustering: cells with ≥ min_count points are
    dense; clusters are connected components of 8-adjacent dense cells.

    The corpus-sized work is ONE grid_density pass (map-side cell
    assignment + tiny cell-keyed groupby); the component fold runs on the
    dense-cell table, which is output-sized (bounded by the grid, not the
    data). For grids too large for the driver, feed the dense-cell
    adjacency pairs to ops/graph.py::connected_components instead — the
    semantics here are the same. Returns a pandas frame
    (cell, cluster, n) with cluster = min cell id of the component."""
    dense = grid_density(ds, lat_col, lon_col, cell,
                         width=width).to_pandas()
    dense = dense[dense["n"] >= min_count].reset_index(drop=True)
    cells = dense["cell"].to_numpy().astype(np.int64)
    cellset = {}
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in cells:
        parent[int(c)] = int(c)
        cellset[int(c)] = True
    for c in cells:
        cy, cx = divmod(int(c), width)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = cy + dy, cx + dx
                # bounds check: column wraparound would alias cell
                # (y, 0)-1 onto (y-1, width-1) — a false adjacency
                if ny < 0 or nx < 0 or nx >= width:
                    continue
                nb = ny * width + nx
                if nb != c and nb in cellset:
                    union(int(c), nb)
    import pandas as pd
    out = pd.DataFrame({
        "cell": cells,
        "cluster": [find(int(c)) for c in cells],
        "n": dense["n"].to_numpy(),
    })
    return out.sort_values("cell").reset_index(drop=True)
