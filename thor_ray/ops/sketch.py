"""Mergeable sketches (SURVEY.md §2.5 G4): approximate distinct via HLL.

The scale pattern: each batch emits ONE serialized sketch row, sketches
merge associatively in a tiny reduce — the wide exchange moves kilobytes
regardless of input size (ray_guide 'Aggregation at scale')."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from thor_ray.stages.smt import stable_hash


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Vectorized HLL register fold for one batch of 63-bit hashes."""
    m = 1 << p
    idx = (hashes & np.uint64(m - 1)).astype(np.int64)
    rest = (hashes.astype(np.uint64) >> np.uint64(p)) | (np.uint64(1) << np.uint64(63 - p))
    # rank = position of least-significant set bit + 1 (von-Neumann trick)
    lsb = (rest & (~rest + np.uint64(1))).astype(np.float64)
    rank = (np.log2(lsb) + 1).astype(np.int64)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def approx_distinct(ds: Dataset, cols: list[str], precision: int = 12) -> int:
    """Approximate COUNT(DISTINCT cols); relative error ≈ 1.04/√(2^p)."""
    p = precision

    import pyarrow.compute as pc

    def sketch(t: pa.Table) -> pa.Table:
        st = pa.table({c: pc.cast(t[c], pa.string()) for c in cols})
        h = stable_hash(st, cols).astype(np.uint64)
        return pa.table({"regs": pa.array([_hll_registers(h, p).tobytes()],
                                          type=pa.binary())})

    merged = np.zeros(1 << p, dtype=np.int8)
    for batch in ds.map_batches(sketch, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for blob in batch["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.int8))
    return int(round(_hll_estimate(merged)))


def approx_quantiles(ds: Dataset, col: str, qs: list[float],
                     n_centroids: int = 256) -> dict[float, float]:
    """Mergeable quantile sketch (t-digest-style): each batch emits ONE row
    of `n_centroids` equally-spaced within-batch quantile centroids plus
    its count; the driver merges by weighted quantile over all centroids.
    The exchange moves n_centroids×8 bytes per BATCH regardless of input
    size — the same scale shape as the HLL above. Accuracy is bounded by
    within-batch interpolation (~1/n_centroids of a batch's mass); the
    unit test pins <1% relative rank error vs exact on the fixtures."""
    nc = n_centroids

    def sketch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        x = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        x = np.sort(x[~np.isnan(x)])
        if not len(x):
            return pa.table({"vals": pa.array([], type=pa.binary()),
                             "n": pa.array([], type=pa.int64())})
        pos = np.linspace(0, len(x) - 1, nc)
        vals = np.interp(pos, np.arange(len(x)), x)
        return pa.table({"vals": pa.array([vals.tobytes()], type=pa.binary()),
                         "n": pa.array([len(x)], type=pa.int64())})

    cents, weights = [], []
    for batch in ds.map_batches(sketch, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for blob, n in zip(batch["vals"].to_pylist(), batch["n"].to_pylist()):
            v = np.frombuffer(blob, dtype=np.float64)
            cents.append(v)
            weights.append(np.full(len(v), n / len(v)))
    if not cents:
        return {q: float("nan") for q in qs}
    v = np.concatenate(cents)
    w = np.concatenate(weights)
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w) - w / 2.0
    cum /= cum[-1] + w[-1] / 2.0
    return {q: float(np.interp(q, cum, v)) for q in qs}
