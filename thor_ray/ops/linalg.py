"""Distributed dense linear algebra over embedding columns.

PCA via sufficient statistics: the only distributed work is a map-only
moment pass — each batch emits ONE row holding (n, Σx, Σxxᵀ) for its
vectors (2 + d + d² doubles, independent of batch row count) — followed
by a two-level combine (salted groupby, then a fanout-sized driver
fold). The eigendecomposition runs on the d×d covariance driver-side:
O(d³) with d = embedding dim, never data-sized. Nothing corpus-sized
ever leaves the cluster, and adding nodes only adds moment tasks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from thor_ray.ops.ann import vec_matrix


def _moment_partial(vec_col: str, fanout: int):
    def partial(t: pa.Table) -> pa.Table:
        x = vec_matrix(t[vec_col]).astype(np.float64, copy=False)
        n = x.shape[0]
        s1 = x.sum(axis=0)
        s2 = (x.T @ x).reshape(-1)
        # deterministic content-derived salt (balanced enough for a
        # combiner key; correctness is salt-independent — sums combine)
        salt = int(np.uint64(abs(float(s1[0])) * 1e6) % np.uint64(fanout)) \
            if s1.size else 0
        return pa.table({
            "salt": pa.array([salt], pa.int32()),
            "n": pa.array([n], pa.int64()),
            "s1": pa.array([s1.tolist()], pa.list_(pa.float64())),
            "s2": pa.array([s2.tolist()], pa.list_(pa.float64())),
        })
    return partial


def _combine(group):
    import pandas as pd
    n = int(group["n"].sum())
    s1 = np.sum(np.stack([np.asarray(v) for v in group["s1"]]), axis=0)
    s2 = np.sum(np.stack([np.asarray(v) for v in group["s2"]]), axis=0)
    return pd.DataFrame({"salt": [int(group["salt"].iloc[0])], "n": [n],
                         "s1": [s1.tolist()], "s2": [s2.tolist()]})


def moments(ds: Dataset, vec_col: str, fanout: int = 32):
    """(n, Σx, ΣxxT) over a vector column: map-only partials (one
    constant-size row per batch), salted combine to ≤fanout rows, final
    fold driver-side. Returns (n, s1[d], s2[d,d])."""
    rows = (ds.map_batches(_moment_partial(vec_col, fanout),
                           batch_format="pyarrow")
            .groupby("salt").map_groups(_combine, batch_format="pandas")
            .to_pandas())   # ≤ fanout rows of (2 + d + d²) doubles
    n = int(rows["n"].sum())
    s1 = np.sum(np.stack([np.asarray(v) for v in rows["s1"]]), axis=0)
    d = s1.shape[0]
    s2 = np.sum(np.stack([np.asarray(v) for v in rows["s2"]]),
                axis=0).reshape(d, d)
    return n, s1, s2


def pca_fit(ds: Dataset, vec_col: str, k: int,
            fanout: int = 32) -> dict:
    """Exact covariance PCA (not sketched): covariance from the moment
    pass, `eigh` on the d×d matrix driver-side. Components are
    sign-normalized (largest-|entry| coordinate positive) so the result
    is orientation-deterministic. Returns dict(mean[d], components[k,d],
    explained_variance[k], explained_variance_ratio[k], n)."""
    n, s1, s2 = moments(ds, vec_col, fanout)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 vectors")
    mean = s1 / n
    cov = (s2 - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    evr_den = float(w.sum())
    comps = v[:, order].T               # (k, d)
    # sign fix: make the largest-magnitude loading positive per component
    flip = np.sign(comps[np.arange(len(order)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ev = w[order]
    return {"mean": mean, "components": comps, "explained_variance": ev,
            "explained_variance_ratio": ev / evr_den, "n": n}


def pca_transform(ds: Dataset, vec_col: str, model: dict,
                  out_col: str = "pc", keep: list[str] | None = None
                  ) -> Dataset:
    """Project vectors onto fitted components: broadcast the (k,d) model
    once (ray.put), map-only matmul per batch, emit list<float> scores."""
    import ray as _ray
    ref = _ray.put((model["mean"], model["components"]))

    def project(t: pa.Table) -> pa.Table:
        mean, comps = _ray.get(ref)
        x = vec_matrix(t[vec_col]).astype(np.float64, copy=False)
        p = (x - mean) @ comps.T
        cols = {c: t[c] for c in (keep or
                                  [c for c in t.column_names
                                   if c != vec_col])}
        cols[out_col] = pa.array(p.tolist(),
                                 pa.list_(pa.float64()))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def dim_variance(ds: Dataset, vec_col: str, fanout: int = 32):
    """Per-dimension sample variance from the same moment pass (the
    covariance diagonal) — the SQL-checkable slice of the PCA statistics.
    Returns np.ndarray[d]."""
    n, s1, s2 = moments(ds, vec_col, fanout)
    mean = s1 / n
    return (np.diag(s2) - n * mean * mean) / (n - 1)
