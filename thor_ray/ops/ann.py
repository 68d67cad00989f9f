"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (ray.put once, read per task), per-block local top-k,
tiny final sort. Scale path: IVF — coarse centroids from a driver-side
sample (the only non-distributed step, O(sample)), batches probe only the
nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def vec_matrix(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """(n, d) float64 matrix from a list<float>/fixed_size_list column with
    NO per-row Python: flatten + reshape over the Arrow buffers (the old
    ``np.stack(col.to_pylist())`` built n Python lists per batch)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
    else:
        lens = pc.list_value_length(arr).to_numpy()
        d = int(lens[0])
        if not (lens == d).all():
            raise ValueError("ragged embedding column; expected uniform dim")
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    return flat.reshape(n, d).astype(np.float64, copy=False)


def brute_topk(ds: Dataset, query: np.ndarray, k: int, vec_col: str = "embedding",
               id_col: str = "vec_id", round_to: int = 4) -> Dataset:
    """Exact cosine top-k of `query` (1, d) against every row.

    The query matrix is broadcast via ray.put; each batch computes a
    (batch, d) @ (d,) score and keeps its local top-k, so the final global
    sort sees k × num_blocks rows."""
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    qref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        vecs = vec_matrix(t[vec_col])
        cos = np.round(_normalize(vecs) @ qv, round_to)
        ids = t[id_col].to_numpy()
        # select by (rounded cos desc, id asc) — the oracle's exact order,
        # so rounded ties at the k boundary cannot diverge
        order = np.lexsort((ids, -cos))[: min(k, len(cos))]
        return pa.table({
            id_col: t[id_col].take(pa.array(order)),
            "cos": pa.array(cos[order]),
        })

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["cos", id_col], descending=[True, False]).limit(k))


class IvfIndex:
    """Coarse IVF state: centroids trained on a sample (numpy k-means)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids.astype(np.float64))

    @staticmethod
    def train(sample: np.ndarray, n_cells: int, iters: int = 10,
              seed: int = 42) -> "IvfIndex":
        rng = np.random.default_rng(seed)
        x = _normalize(sample.astype(np.float64))
        cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    cent[c] = x[m].mean(axis=0)
            cent = _normalize(cent)
        return IvfIndex(cent)

    def assign(self, vecs: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(vecs) @ self.centroids.T, axis=1)


def ivf_topk(ds: Dataset, query: np.ndarray, k: int, n_cells: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id",
             sample_limit: int = 10_000, seed: int = 42,
             round_to: int = 4) -> Dataset:
    """Approximate cosine top-k: probe only the `nprobe` cells nearest the
    query. Batches outside probed cells are masked before the matmul —
    at scale, pre-assign the cell as a partition column at write time so
    the read itself prunes (documented scale path)."""
    sample = np.stack(
        ds.limit(sample_limit).to_pandas()[vec_col].tolist()).astype(np.float64)
    index = IvfIndex.train(sample, n_cells=n_cells, seed=seed)
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    probe_cells = np.argsort(-(index.centroids @ q))[:nprobe]
    iref = ray.put((index.centroids, set(int(c) for c in probe_cells), q))

    def score(t: pa.Table) -> pa.Table:
        centroids, cells, qv = ray.get(iref)
        nv = _normalize(vec_matrix(t[vec_col]))
        assign = np.argmax(nv @ centroids.T, axis=1)
        mask = np.isin(assign, list(cells))
        cos = nv[mask] @ qv
        ids = t[id_col].to_numpy()[mask]
        order = np.argsort(-cos, kind="stable")[: min(k, len(cos))]
        return pa.table({
            id_col: pa.array(ids[order]),
            "cos": pa.array(np.round(cos[order], round_to)),
        })

    return (ds.map_batches(score, batch_format="pyarrow")
            .sort(["cos", id_col], descending=[True, False]).limit(k))
