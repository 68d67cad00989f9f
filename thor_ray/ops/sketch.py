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


def _bucket_rank(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per 63-bit hash, vectorized."""
    m = 1 << p
    idx = (hashes & np.uint64(m - 1)).astype(np.int64)
    rest = (hashes.astype(np.uint64) >> np.uint64(p)) | (np.uint64(1) << np.uint64(63 - p))
    # rank = position of least-significant set bit + 1 (von-Neumann trick)
    lsb = (rest & (~rest + np.uint64(1))).astype(np.float64)
    rank = (np.log2(lsb) + 1).astype(np.int8)
    return idx, rank


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Vectorized HLL register fold for one batch of 63-bit hashes."""
    idx, rank = _bucket_rank(hashes, p)
    regs = np.zeros(1 << p, dtype=np.int8)
    np.maximum.at(regs, idx, rank)
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
    return int(round(_hll_estimate(
        _dataset_registers(ds, cols, precision))))


def approx_distinct_by(ds: Dataset, key: str, cols: list[str],
                       precision: int = 12, fanout: int = 64) -> Dataset:
    """Grouped approximate COUNT(DISTINCT cols): one mergeable HLL per key
    (SURVEY.md §2.5 G4, the per-group companion of approx_distinct).

    Scale shape: each batch emits one 2^p-byte register blob PER KEY IT
    CONTAINS (a single np.maximum.at over (key-code, bucket) — no per-row
    Python), so the exchange carries sketch rows, never data rows. The
    shuffle groups on a coarse salt of the key (task count ∝ fanout, the
    LSH-family pattern); exact keys merge inside with elementwise max.
    The Python loop in the merge is over keys-in-salt-group — sketch-space.
    Memory: a batch touching K keys holds K×2^p bytes (p=12 → 4 KB/key);
    lower `precision` for very-high-cardinality keys."""
    import pyarrow.compute as pc

    p = precision
    m = 1 << p

    def sketch(t: pa.Table) -> pa.Table:
        st = pa.table({c: pc.cast(t[c], pa.string()) for c in cols})
        h = stable_hash(st, cols).astype(np.uint64)
        codes, uniq = pd.factorize(
            t[key].to_pandas(), use_na_sentinel=False)
        idx, rank = _bucket_rank(h, p)
        regs = np.zeros((len(uniq), m), dtype=np.int8)
        np.maximum.at(regs, (codes, idx), rank)
        ku = pa.array(uniq)
        ks = stable_hash(pa.table({key: pc.cast(ku, pa.string())}), [key])
        return pa.table({
            key: ku,
            "ksalt": pa.array((ks % np.uint64(fanout)).astype(np.int32)),
            "regs": pa.array([r.tobytes() for r in regs], type=pa.binary()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False, dropna=False):
            regs = np.frombuffer(b"".join(gg["regs"]), dtype=np.int8)
            merged = regs.reshape(len(gg), m).max(axis=0)
            rows.append({key: k,
                         "approx_distinct": int(round(_hll_estimate(merged)))})
        return pd.DataFrame(rows)

    return (ds.map_batches(sketch, batch_format="pyarrow")
            .groupby("ksalt").map_groups(merge, batch_format="pandas"))


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
    est = _merge_centroids(np.concatenate(cents), np.concatenate(weights), qs)
    return dict(zip(qs, est))


def _merge_centroids(v: np.ndarray, w: np.ndarray,
                     qs: list[float]) -> list[float]:
    """Weighted mid-point quantile over merged centroid samples (the
    associative reduce shared by the global and grouped sketches)."""
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w) - w / 2.0
    cum /= cum[-1] + w[-1] / 2.0
    return [float(np.interp(q, cum, v)) for q in qs]


def approx_quantiles_by(ds: Dataset, key: str, col: str, qs: list[float],
                        n_centroids: int = 64, fanout: int = 64) -> Dataset:
    """Grouped mergeable quantile sketch — the per-key companion of
    approx_quantiles (as approx_distinct_by is to approx_distinct).

    Scale shape: each batch emits one `n_centroids`-double centroid row
    PER KEY IT CONTAINS (one sort + segmented interp; the Python loop is
    over keys-in-batch, sketch-space, never rows). The shuffle groups on
    a coarse salt of the key so task count stays ∝ fanout at any key
    count; exact keys merge inside with the weighted-quantile reduce.
    The exchange carries n_centroids×8 B per (batch, key) — kilobytes —
    regardless of input size. Output: one row per key with one float64
    column per requested quantile, named `p{100q:g}` (e.g. p50, p99).
    Accuracy bounded by within-batch interpolation (~1/n_centroids of a
    batch's per-key mass); unit test pins the error vs exact."""
    import pyarrow.compute as pc

    nc = n_centroids
    out_cols = [f"p{100 * q:g}" for q in qs]

    def sketch(t: pa.Table) -> pa.Table:
        df = pa.table({key: t[key],
                       col: pc.cast(t[col], pa.float64())}).to_pandas()
        df = df.dropna(subset=[col]).sort_values([key, col], kind="stable")
        ks = df[key].to_numpy()
        xs = df[col].to_numpy()
        if not len(ks):
            return pa.table({key: pa.array([], type=t.schema.field(key).type),
                             "ksalt": pa.array([], type=pa.int32()),
                             "vals": pa.array([], type=pa.binary()),
                             "n": pa.array([], type=pa.int64())})
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(ks)])
        blobs = []
        for s, c in zip(starts, counts):
            x = xs[s:s + c]
            pos = np.linspace(0, c - 1, nc)
            blobs.append(np.interp(pos, np.arange(c), x).tobytes())
        ku = pa.array(ks[starts])
        kh = stable_hash(pa.table({key: pc.cast(ku, pa.string())}), [key])
        return pa.table({
            key: ku,
            "ksalt": pa.array((kh % np.uint64(fanout)).astype(np.int32)),
            "vals": pa.array(blobs, type=pa.binary()),
            "n": pa.array(counts, type=pa.int64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, gg in g.groupby(key, sort=False, dropna=False):
            v = np.frombuffer(b"".join(gg["vals"]), dtype=np.float64)
            n = gg["n"].to_numpy(dtype=np.float64)
            w = np.repeat(n / nc, nc)
            est = _merge_centroids(v, w, qs)
            rows.append({key: k, **dict(zip(out_cols, est))})
        return pd.DataFrame(rows)

    return (ds.map_batches(sketch, batch_format="pyarrow")
            .groupby("ksalt").map_groups(merge, batch_format="pandas"))


# --- Bloom filter (join prefilter) ----------------------------------------

def _bloom_hashes(t: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams per value (Kirsch-Mitzenmacher:
    index_i = h1 + i*h2 gives k independent-enough probes from two)."""
    import pyarrow.compute as pc

    st = pa.table({col: pc.cast(t[col], pa.string())})
    h1 = np.asarray(stable_hash(st, [col])).astype(np.uint64)
    # splitmix64 finalizer — h2 must be a full avalanche of h1, not an
    # affine function of it (affine probes collide together and blew the
    # false-positive rate 15x past the analytic bound)
    with np.errstate(over="ignore"):
        z = h1 + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    return h1, h2


def bloom_build(ds: Dataset, col: str, num_bits: int = 1 << 23,
                k: int = 4) -> np.ndarray:
    """Mergeable Bloom filter over a key column, as a packed uint64 bit
    array (num_bits=2^23 → 1 MB; false-positive ≈ (1-e^(-kn/m))^k, ~0.24%
    at n=1M). Each batch emits ONE serialized filter row; rows OR-merge in
    a DISTRIBUTED tree (fan-in 32 per level) so the driver receives a
    bounded handful of blobs no matter how many input blocks there are —
    a linear driver OR at 1 MB/block would itself be O(input)."""
    m = np.uint64(num_bits)
    words = num_bits >> 6

    def sketch(t: pa.Table) -> pa.Table:
        h1, h2 = _bloom_hashes(t, col)
        bits = np.zeros(words, dtype=np.uint64)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % m
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    def or_blobs(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t["bits"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], type=pa.binary())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow").materialize()
    fanin = 32
    while blobs.count() > fanin:
        blobs = blobs.repartition(
            max(1, blobs.count() // fanin)) \
            .map_batches(or_blobs, batch_format="pyarrow",
                         batch_size=None).materialize()
    merged = np.zeros(words, dtype=np.uint64)
    for batch in blobs.iter_batches(batch_format="pyarrow"):
        for blob in batch["bits"].to_pylist():
            merged |= np.frombuffer(blob, dtype=np.uint64)
    return merged


def bloom_prefilter(ds: Dataset, col: str, bloom: np.ndarray,
                    k: int = 4, invert: bool = False) -> Dataset:
    """Keep rows whose key is PROBABLY in the filter (superset of the true
    matches — false positives pass, never false negatives), so it is safe
    as a pre-shuffle reducer before an exact hash/semi join: broadcast the
    filter once (ray.put, ~1 MB), drop the guaranteed-non-matching rows
    map-side, then join exactly on what remains. invert=True keeps the
    DEFINITE non-members (exact for anti-join misses). num_bits is derived
    from the filter itself (len*64) — a caller-supplied mismatch with the
    build would silently break the no-false-negative guarantee; k must
    still match the build's."""
    import ray as _ray

    m = np.uint64(len(bloom) * 64)
    ref = _ray.put(bloom)

    def fn(t: pa.Table) -> pa.Table:
        bits = _ray.get(ref)
        h1, h2 = _bloom_hashes(t, col)
        hit = np.ones(len(t), dtype=bool)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % m
            w = bits[(idx >> np.uint64(6)).astype(np.int64)]
            hit &= ((w >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
        return t.filter(pa.array(~hit if invert else hit))

    return ds.map_batches(fn, batch_format="pyarrow")


def heavy_hitters(ds: Dataset, col: str, k: int = 20,
                  capacity: int = 4096) -> pd.DataFrame:
    """Approximate top-k heavy hitters (SpaceSaving-style, mergeable):
    each batch emits its `capacity` highest exact within-batch counts (a
    C-level value_counts — the combiner; dropna=False so a heavy null key
    counts) PLUS one marker row carrying the batch's dropped-tail bound;
    the driver sums candidates and returns the top k.

    Guarantee (per row): n <= true count <= n + max_undercount, where
    max_undercount = sum of dropped-tail bounds over the batches where the
    value was NOT reported (a value absent from a batch's top-`capacity`
    missed at most that batch's largest dropped count). Any value with
    true count > N/capacity is present. Bounded memory: capacity+1 rows
    per batch through the exchange, never value-cardinality.
    vocab_topk is the exact tier; this is the bounded-memory one."""
    cap = capacity

    def partial(t: pa.Table) -> pd.DataFrame:
        vc = t[col].to_pandas().value_counts(dropna=False)
        tail_max = int(vc.iloc[cap]) if len(vc) > cap else 0
        top = vc.iloc[:cap]
        rows = pd.DataFrame({col: top.index, "n": top.to_numpy("int64"),
                             "tail": np.int64(tail_max), "kind": "v"})
        marker = pd.DataFrame([{col: None, "n": np.int64(0),
                                "tail": np.int64(tail_max), "kind": "t"}])
        return pd.concat([rows, marker], ignore_index=True)

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total_tail = int(rows.loc[rows["kind"] == "t", "tail"].sum())
    v = rows[rows["kind"] == "v"]
    agg = v.groupby(col, dropna=False).agg(
        n=("n", "sum"), seen_tail=("tail", "sum")).reset_index()
    # tails of batches where the value WAS reported cannot have missed it
    agg["max_undercount"] = (total_tail - agg["seen_tail"]).astype("int64")
    agg = agg.drop(columns=["seen_tail"]) \
        .sort_values(["n", col], ascending=[False, True], kind="stable") \
        .head(k).reset_index(drop=True)
    agg["n"] = agg["n"].astype("int64")
    return agg


def heavy_hitters_by(ds: Dataset, key: str, col: str, k: int = 10,
                     capacity: int = 1024) -> Dataset:
    """Per-GROUP approximate top-k heavy hitters — the grouped tier of
    heavy_hitters, same SpaceSaving-style bound per key: for each reported
    row, n <= true count <= n + max_undercount, and any value whose true
    count within its key exceeds N_key/capacity is present.

    Scale shape: each batch emits at most (capacity + 1) combiner rows per
    key it contains (exact within-batch counts plus one dropped-tail
    marker per key that overflowed), so the one shuffle moves
    combiner-sized partials — never value cardinality — and the merge runs
    DISTRIBUTED in groupby(key).map_groups on those candidates (nothing
    lands on the driver, unlike the global sketch's tiny final fold)."""
    cap = capacity

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({key: t[key].to_pandas(),
                           col: t[col].to_pandas()})
        vc = (df.groupby([key, col], dropna=False, sort=False)
              .size().rename("n").reset_index())
        vc = vc.sort_values([key, "n"], ascending=[True, False],
                            kind="stable")
        r = vc.groupby(key, dropna=False).cumcount()
        kept = vc[(r < cap).to_numpy()].copy()
        dropped = vc[(r >= cap).to_numpy()]
        tails = (dropped.groupby(key, dropna=False)["n"].max()
                 .rename("tail").reset_index())
        kept = kept.merge(tails, on=key, how="left")
        kept["tail"] = kept["tail"].fillna(0).astype("int64")
        kept["kind"] = "v"
        if len(tails):
            markers = tails.copy()
            markers[col] = None
            markers["n"] = np.int64(0)
            markers["kind"] = "t"
            kept = pd.concat(
                [kept, markers[[key, col, "n", "tail", "kind"]]],
                ignore_index=True)
        kept["n"] = kept["n"].astype("int64")
        return kept

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        total_tail = int(g.loc[g["kind"] == "t", "tail"].sum())
        v = g[g["kind"] == "v"]
        agg = v.groupby(col, dropna=False).agg(
            n=("n", "sum"), seen_tail=("tail", "sum")).reset_index()
        # tails of batches where the value WAS reported cannot have
        # missed it (mirrors the global sketch's bound)
        agg["max_undercount"] = (total_tail - agg["seen_tail"]) \
            .astype("int64")
        agg = agg.drop(columns=["seen_tail"]) \
            .sort_values(["n", col], ascending=[False, True],
                         kind="stable").head(k).reset_index(drop=True)
        agg.insert(0, key, g[key].iloc[0])
        agg["n"] = agg["n"].astype("int64")
        return agg

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(key).map_groups(merge, batch_format="pandas"))


def _dataset_registers(ds: Dataset, cols: list[str], p: int) -> np.ndarray:
    """Fold a dataset into one merged HLL register array (one sketch row
    per batch through the exchange, kilobytes regardless of input)."""
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
    return merged


def approx_set_overlap(a: Dataset, b: Dataset, cols: list[str],
                       precision: int = 12) -> dict:
    """Approximate set-overlap statistics between two key sets: |A|, |B|,
    |A∪B| (elementwise register max — HLL sketches union losslessly) and
    |A∩B| by inclusion–exclusion, plus the Jaccard estimate. Two sketch
    folds + a register max; nothing data-sized leaves the workers. The
    intersection inherits HLL error on each term (worst for small
    overlaps — use an exact semi join when precision matters)."""
    ra = _dataset_registers(a, cols, precision)
    rb = _dataset_registers(b, cols, precision)
    na = _hll_estimate(ra)
    nb = _hll_estimate(rb)
    nu = _hll_estimate(np.maximum(ra, rb))
    ni = max(0.0, na + nb - nu)
    return {"n_a": int(round(na)), "n_b": int(round(nb)),
            "n_union": int(round(nu)), "n_intersection": int(round(ni)),
            "jaccard": round(ni / nu, 4) if nu > 0 else 0.0}


_CM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _cm_lanes(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) bucket indices from one 64-bit hash per key: each lane
    remixes with a distinct odd constant (splitmix-style), so lanes are
    pairwise-independent enough for the CM bound. Vectorized."""
    out = np.empty((depth, len(h)), dtype=np.int64)
    x = h.astype(np.uint64)
    for i in range(depth):
        v = (x ^ np.uint64(i * 0x9E3779B9 + 1)) * _CM_MIX
        v ^= v >> np.uint64(29)
        out[i] = (v % np.uint64(width)).astype(np.int64)
    return out


def count_min_build(ds: Dataset, cols: list[str], width: int = 2048,
                    depth: int = 4) -> np.ndarray:
    """Mergeable Count-Min sketch of key occurrence counts: each batch
    folds into ONE (depth × width) int64 counter table (vectorized
    bincount per lane) and tables simply ADD — so the distributed fold
    ships kilobytes per batch regardless of input size. Point estimates
    (count_min_query) never undercount; overcount ≤ 2N/width with
    probability ≥ 1 − 2^-depth."""
    import pyarrow.compute as pc

    def sketch(t: pa.Table) -> pa.Table:
        st = pa.table({c: pc.cast(t[c], pa.string()) for c in cols})
        h = stable_hash(st, cols).astype(np.uint64)
        lanes = _cm_lanes(h, depth, width)
        tbl = np.zeros((depth, width), dtype=np.int64)
        for i in range(depth):
            tbl[i] = np.bincount(lanes[i], minlength=width)
        return pa.table({"cm": pa.array([tbl.tobytes()], type=pa.binary())})

    merged = np.zeros((depth, width), dtype=np.int64)
    for batch in ds.map_batches(sketch, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for blob in batch["cm"].to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64) \
                .reshape(depth, width)
    return merged


def count_min_query(sketch: np.ndarray, keys: list,
                    cols: list[str] | None = None) -> np.ndarray:
    """Point-frequency estimates (min over lanes) for string keys against
    a count_min_build table. Keys are hashed exactly as the build pass
    hashed the (stringified) columns."""
    depth, width = sketch.shape
    kt = pa.table({"k": pa.array([str(k) for k in keys], type=pa.string())})
    h = stable_hash(kt, ["k"]).astype(np.uint64)
    lanes = _cm_lanes(h, depth, width)
    ests = np.min(
        np.stack([sketch[i, lanes[i]] for i in range(depth)]), axis=0)
    return ests.astype(np.int64)


def _mg_compress(keys: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries decrement rule, vectorized: if more than k entries,
    subtract the (k+1)-th largest count from every entry and drop the
    non-positive ones. Each call decrements every surviving counter by
    the same amount, preserving the MG invariant (underestimate by at
    most the total decrement)."""
    if len(keys) <= k:
        return keys, counts
    order = np.argsort(counts, kind="stable")[::-1]
    dec = int(counts[order[k]])
    keep = counts > dec
    return keys[keep], counts[keep] - dec


def misra_gries(ds: Dataset, col: str, k: int = 64) -> pd.DataFrame:
    """Misra-Gries heavy-hitters summary over ``col`` (SURVEY.md §2.5 G4
    companion to HLL/count-min): a deterministic, MERGEABLE summary of at
    most ``k`` (item, est) pairs.

    Guarantee (Misra-Gries 1982; mergeability per Agarwal et al.,
    "Mergeable Summaries", PODS'12): for every item,
    ``true - n/(k+1) <= est <= true`` with n the stream length, and any
    item with frequency > n/(k+1) is present in the summary.

    Scale shape: each batch emits an exact (item, count) table compressed
    to k entries (one C-level arrow group_by + one argsort on <=distinct
    rows); the partials — at most k rows per batch — shuffle through ONE
    tiny groupby(item) Sum, and the final decrement runs driver-side on
    <= k x num_blocks rows. The wide exchange never carries more than
    k rows per block regardless of input size.
    """
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"item": t[col]}).group_by("item") \
            .aggregate([("item", "count")])
        keys = g["item"].combine_chunks().to_numpy(zero_copy_only=False)
        counts = g["item_count"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keys, counts = _mg_compress(keys, counts, k)
        return pa.table({"item": pa.array(keys),
                         "est": pa.array(counts, pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("item").aggregate(Sum("est", alias_name="est"))
              .to_pandas())
    keys = merged["item"].to_numpy()
    counts = merged["est"].to_numpy().astype(np.int64)
    keys, counts = _mg_compress(keys, counts, k)
    out = pd.DataFrame({"item": keys, "est": counts})
    return out.sort_values(["est", "item"], ascending=[False, True],
                           kind="stable").reset_index(drop=True)
