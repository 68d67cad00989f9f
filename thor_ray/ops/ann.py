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
        if len(t) == 0:           # empty block: (0,0) matrix can't matmul
            return pa.table({id_col: t[id_col],
                             "cos": pa.array([], type=pa.float64())})
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


def brute_topk_multi(ds: Dataset, queries: np.ndarray, query_ids: list,
                     k: int, vec_col: str = "embedding",
                     id_col: str = "vec_id", round_to: int = 4) -> Dataset:
    """Exact cosine top-k for a BATCH of query vectors at once — the real
    similarity-search workload shape (candidate retrieval fans out many
    probes; issuing them one brute_topk at a time re-reads the table m
    times).

    The (m, d) query matrix is broadcast ONCE via ray.put; each batch does
    a single (b, d) @ (d, m) matmul and keeps its local top-k PER QUERY
    via one column-wise lexsort on (rounded cos desc, id asc) over the
    score matrix — the oracle's exact order, tie-safe at the k boundary —
    so the reduce sees m × k × num_blocks rows. Final per-query resolution groups on
    query_id — m groups, answer-sized, never data-sized. Output:
    (query_id, id_col, cos), exactly k rows per query."""
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids)
    if len(qids) != len(Q):
        raise ValueError("query_ids must match queries' row count")
    qref = ray.put(Q)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:           # empty block: (0,0) matrix can't matmul
            return pa.table({"query_id": pa.array(qids[:0]),
                             id_col: t[id_col],
                             "cos": pa.array([], type=pa.float64())})
        Qm = ray.get(qref)
        m = len(Qm)
        vecs = vec_matrix(t[vec_col])
        cos = np.round(_normalize(vecs) @ Qm.T, round_to)     # (b, m)
        ids = t[id_col].to_numpy()
        kk = min(k, len(ids))
        # per-query local top-k in one shot: column-wise lexsort on
        # (rounded cos desc, id asc) — the oracle's exact order
        order = np.lexsort((np.broadcast_to(ids[:, None], cos.shape),
                            -cos), axis=0)[:kk]               # (kk, m)
        qid_out = np.repeat(qids, kk)
        row = order.T.ravel()                                 # query-major
        return pa.table({
            "query_id": pa.array(qid_out),
            id_col: t[id_col].take(pa.array(row)),
            "cos": pa.array(cos[row, np.repeat(np.arange(m), kk)]),
        })

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", id_col], ascending=[False, True],
                             kind="stable").head(k)

    return (ds.map_batches(score, batch_format="pyarrow")
            .groupby("query_id").map_groups(head, batch_format="pandas"))


def ivf_build(ds: Dataset, index_dir: str, n_cells: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              sample_limit: int = 10_000, seed: int = 42) -> dict:
    """Build a cell-partitioned ANN index on storage: centroids trained on
    a bounded driver-side sample, then every row written under
    ``cell=<c>/`` via a single distributed pass — so a search READS only
    its probed cells (the scale path ivf_topk's per-query scan can't give).

    Returns {"index_dir", "n_cells", "dim"}; centroids persist alongside
    the data (``_centroids.npy``) so searches need no retraining."""
    import os

    sample = np.stack(
        ds.limit(sample_limit).to_pandas()[vec_col].tolist()).astype(np.float64)
    index = IvfIndex.train(sample, n_cells=n_cells, seed=seed)
    cref = ray.put(index.centroids)

    def assign(t: pa.Table) -> pa.Table:
        nv = _normalize(vec_matrix(t[vec_col]))
        cell = np.argmax(nv @ ray.get(cref).T, axis=1).astype(np.int64)
        return t.append_column("cell", pa.array(cell))

    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["cell"])
    np.save(os.path.join(index_dir, "_centroids.npy"), index.centroids)
    return {"index_dir": index_dir, "n_cells": len(index.centroids),
            "dim": index.centroids.shape[1]}


def ivf_probe_dirs(index_dir: str, query: np.ndarray, nprobe: int
                   ) -> tuple[list[str], np.ndarray]:
    """The cell directories a search for `query` must read (and the
    normalized query) — exposed separately so tests can assert the pruned
    read touches fewer files than the full index."""
    import glob
    import os

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    cells = np.argsort(-(centroids @ q))[:nprobe]
    dirs = [d for c in cells
            if glob.glob((d := os.path.join(index_dir, f"cell={int(c)}"))
                         + "/*.parquet")]
    return dirs, q


def ivf_search(index_dir: str, query: np.ndarray, k: int, nprobe: int = 4,
               vec_col: str = "embedding", id_col: str = "vec_id",
               round_to: int = 4) -> Dataset:
    """Search a built IVF index: read ONLY the `nprobe` nearest cell
    partitions (row-group/file pruning at the source), then exact cosine
    top-k within them. Complements ivf_topk (ad-hoc scan, no index)."""
    import glob
    import ray.data as rd

    dirs, q = ivf_probe_dirs(index_dir, query, nprobe)
    files = sorted(f for d in dirs for f in glob.glob(d + "/*.parquet"))
    # columns= prunes the read; do NOT also pass partitioning=None — the
    # combination hits a Ray 2.49 parquet-datasource bug (UnboundLocalError
    # on partition_columns); hive inference of `cell` is suppressed by the
    # column projection alone
    ds = rd.read_parquet(files, columns=[id_col, vec_col])
    return brute_topk(ds, q, k, vec_col=vec_col, id_col=id_col,
                      round_to=round_to)


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


def kmeans(ds: Dataset, vec_col: str, k: int, iters: int = 10,
           seed: int = 42, init_sample: int = 4_096) -> dict:
    """Distributed spherical (cosine) k-means over the WHOLE dataset —
    the scale tier of IvfIndex.train's driver-sample trainer.

    Each Lloyd iteration is ONE streaming map_batches pass: a batch
    assigns its rows to the nearest centroid with a single (b,d)@(d,k)
    matmul and emits k partial rows (vector sum + count + similarity sum
    — the combiner), so the driver folds k×num_batches tiny rows per
    iteration and broadcasts the next centroids via ray.put. Nothing
    row-sized ever reaches the driver; empty cells keep their previous
    centroid. Returns {"centroids" (k, d) unit-norm, "inertia": [per-iter
    mean cosine distance, nonincreasing on a fixed assignment metric]}."""
    rng = np.random.default_rng(seed)
    sample = _normalize(vec_matrix(
        ds.limit(init_sample).to_pandas()[vec_col].pipe(
            lambda s: pa.array(s.tolist()))))
    # farthest-point seeding (k-means++ shape, deterministic): random init
    # can drop two seeds in one cluster and Lloyd's never escapes the
    # merged-cluster local optimum
    first = int(rng.integers(len(sample)))
    chosen = [sample[first]]
    best = sample @ chosen[0]
    for _ in range(min(k, len(sample)) - 1):
        nxt = int(np.argmin(best))
        chosen.append(sample[nxt])
        best = np.maximum(best, sample @ chosen[-1])
    cent = np.stack(chosen)
    d = cent.shape[1]
    inertia: list[float] = []

    for _ in range(iters):
        cref = ray.put(cent)

        def part(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            v = _normalize(vec_matrix(t[vec_col]))
            sims = v @ c.T
            a = np.argmax(sims, axis=1)
            best = sims[np.arange(len(v)), a]
            sums = np.zeros((len(c), v.shape[1]), dtype=np.float64)
            np.add.at(sums, a, v)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "cell": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(counts),
                "sim": pa.array(np.bincount(a, weights=best,
                                            minlength=len(c))),
                "vsum": pa.array([row.tobytes() for row in sums],
                                 type=pa.binary()),
            })

        rows = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        g = rows.groupby("cell", sort=True)
        n = g["n"].sum().to_numpy()
        stot = g["sim"].sum().to_numpy()
        vs = np.zeros((len(cent), d), dtype=np.float64)
        for cell, gg in g:
            vs[int(cell)] = np.frombuffer(
                b"".join(gg["vsum"]), dtype=np.float64
            ).reshape(len(gg), d).sum(axis=0)
        live = n > 0
        cent = cent.copy()
        cent[live] = _normalize(vs[live] / n[live, None])
        inertia.append(float(1.0 - stot.sum() / max(n.sum(), 1)))

    return {"centroids": cent, "inertia": inertia}


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression ANN tier: IVF prunes
# WHICH vectors to scan; PQ shrinks WHAT each scan touches (d×4 bytes →
# m bytes per vector), the standard pairing for billion-vector corpora.
# ---------------------------------------------------------------------------

def _lloyd_l2(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Plain L2 Lloyd's on a driver-sized sample with deterministic
    farthest-point seeding (same rationale as kmeans() above)."""
    first = int(rng.integers(len(x)))
    chosen = [x[first]]
    d2 = ((x - chosen[0]) ** 2).sum(axis=1)
    for _ in range(min(k, len(x)) - 1):
        nxt = int(np.argmax(d2))
        chosen.append(x[nxt])
        d2 = np.minimum(d2, ((x - chosen[-1]) ** 2).sum(axis=1))
    cent = np.stack(chosen)
    for _ in range(iters):
        dist = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)
        for j in range(len(cent)):
            sel = a == j
            if sel.any():
                cent[j] = x[sel].mean(axis=0)
    return cent


def pq_train(ds: Dataset, vec_col: str = "embedding", m: int = 8,
             k: int = 16, iters: int = 10, seed: int = 7,
             sample: int = 4_096) -> np.ndarray:
    """Train PQ codebooks (m, k, d/m): split unit-normalized vectors
    into m subspaces, run L2 k-means per subspace on a BOUNDED driver
    sample (ds.limit — the same scale contract as IvfIndex.train; the
    codebook is a few KB however big the corpus is)."""
    x = _normalize(vec_matrix(pa.array(
        ds.limit(sample).to_pandas()[vec_col].tolist())))
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    dsub = d // m
    return np.stack([
        _lloyd_l2(np.ascontiguousarray(x[:, j * dsub:(j + 1) * dsub]),
                  k, iters, rng)
        for j in range(m)])


def pq_encode(ds: Dataset, codebooks: np.ndarray,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> Dataset:
    """Encode every vector to m uint8 codes (one binary cell per row —
    m bytes, a 32×-ish compression at d=64/m=8). Vectorized per batch:
    one (b, k) distance matrix per subspace via the ‖x‖²−2x·C+‖C‖²
    expansion; codebooks ride ONE ray.put broadcast."""
    cref = ray.put(codebooks)

    def enc(t: pa.Table) -> pa.Table:
        cb = ray.get(cref)
        m, k, dsub = cb.shape
        if len(t) == 0:
            return pa.table({id_col: t[id_col],
                             "code": pa.array([], type=pa.binary(m))})
        x = _normalize(vec_matrix(t[vec_col]))
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            c = cb[j]
            d2 = (xs * xs).sum(axis=1, keepdims=True) \
                - 2.0 * (xs @ c.T) + (c * c).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), len(x),
            [None, pa.py_buffer(codes.tobytes())])
        return pa.table({id_col: t[id_col], "code": fsb})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(codes: Dataset, query: np.ndarray, codebooks: np.ndarray,
            k: int = 10, id_col: str = "vec_id",
            round_to: int = 6) -> "pd.DataFrame":
    """Asymmetric-distance (ADC) top-k over PQ codes: the query is
    expanded ONCE into an (m, k) lookup table of subspace distances;
    each batch decodes its m-byte codes zero-copy (np.frombuffer) and
    sums m table lookups per row — no float vector is ever read. Local
    top-k per block, tiny global sort (the brute_topk contract)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = cb.shape
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    lut = np.stack([((cb[j] - q[j * dsub:(j + 1) * dsub]) ** 2)
                    .sum(axis=1) for j in range(m)])
    lref = ray.put(lut)

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: t[id_col],
                             "adist": pa.array([], pa.float64())})
        lt = ray.get(lref)
        arr = t["code"].combine_chunks()
        c = np.frombuffer(arr.buffers()[1], dtype=np.uint8)[
            arr.offset * m:(arr.offset + len(arr)) * m] \
            .reshape(len(arr), m)
        dist = np.zeros(len(t), dtype=np.float64)
        for j in range(m):
            dist += lt[j][c[:, j]]
        dist = np.round(dist, round_to)
        ids = t[id_col].to_numpy()
        order = np.lexsort((ids, dist))[: min(k, len(ids))]
        return pa.table({id_col: t[id_col].take(pa.array(order)),
                         "adist": pa.array(dist[order])})

    out = (codes.map_batches(score, batch_format="pyarrow")
           .sort(["adist", id_col]).limit(k))
    return out.to_pandas()


def sq_train(ds: Dataset, vec_col: str = "embedding") -> dict:
    """Scalar (int8) quantization bounds: per-dimension [min, max] from
    ONE distributed pass — each batch emits a 2×d partial, the driver
    folds the output-sized partials. The memory tier between raw floats
    and PQ codes (4 B/dim → 1 B/dim, vs PQ's ~1 bit/dim)."""
    def part(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"lo": pa.array([], pa.binary()),
                             "hi": pa.array([], pa.binary())})
        v = vec_matrix(t[vec_col])
        return pa.table({"lo": pa.array([v.min(axis=0).tobytes()]),
                         "hi": pa.array([v.max(axis=0).tobytes()])})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack([np.frombuffer(b, np.float64)
                          for b in parts["lo"]]), axis=0)
    hi = np.max(np.stack([np.frombuffer(b, np.float64)
                          for b in parts["hi"]]), axis=0)
    return {"lo": lo, "scale": np.maximum(hi - lo, 1e-12) / 255.0}


def sq_encode(ds: Dataset, bounds: dict, vec_col: str = "embedding",
              id_col: str = "vec_id") -> Dataset:
    """int8-per-dimension codes: code = round((x − lo)/scale) − 128."""
    bref = ray.put(bounds)

    def enc(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        if len(t) == 0:
            return pa.table({id_col: t[id_col],
                             "code": pa.array([], pa.binary())})
        v = vec_matrix(t[vec_col])
        q = np.clip(np.round((v - b["lo"]) / b["scale"]), 0, 255) - 128
        q = q.astype(np.int8)
        return pa.table({id_col: t[id_col],
                         "code": pa.array([q[i].tobytes()
                                           for i in range(len(q))],
                                          pa.binary())})
    return ds.map_batches(enc, batch_format="pyarrow")


def sq_topk(codes: Dataset, query: np.ndarray, bounds: dict, k: int,
            id_col: str = "vec_id") -> pd.DataFrame:
    """Cosine top-k over dequantized int8 codes (per-block top-k, tiny
    final sort — same shape as brute_topk, 4× less data moved)."""
    q = _normalize(np.asarray(query, np.float64).reshape(1, -1))[0]
    bref = ray.put((q, bounds))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: t[id_col],
                             "cos": pa.array([], pa.float64())})
        qv, b = ray.get(bref)
        mat = np.stack([np.frombuffer(c, np.int8) for c in
                        t["code"].to_pylist()]).astype(np.float64)
        v = (mat + 128.0) * b["scale"] + b["lo"]
        cos = np.round(_normalize(v) @ qv, 6)
        tt = pa.table({id_col: t[id_col], "cos": pa.array(cos)})
        idx = pc.select_k_unstable(
            tt, k=min(k, len(tt)),
            sort_keys=[("cos", "descending"), (id_col, "ascending")])
        return tt.take(idx)

    out = codes.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["cos", id_col], ascending=[False, True],
                           kind="stable").head(k).reset_index(drop=True)
