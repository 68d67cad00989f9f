"""Sequence packing for LLM training-data preparation.

Packs variable-length documents into fixed-capacity training sequences
(greedy first-fit in a deterministic order), the step between a deduped /
filtered corpus and a token-budgeted training shard. Shape:

    bucket = stable_hash(id) % n_buckets        (map-only)
    shuffle on bucket                           (ONE wide step)
    per bucket: sort by id, greedy cumulative-sum packing (C-level)

Determinism: the assignment is a pure function of (id set, token counts,
capacity, n_buckets, seed) — independent of block layout, cluster size or
re-run, because each bucket packs its documents in id order. The
per-bucket loop iterates over emitted SEQUENCES (searchsorted on the
cumsum per cut), not rows, so a bucket of n docs costs O(n + s·log n).

Scale note: n_buckets is the shuffle fanout — size it ∝ cluster CPUs
(default 64 ≈ 2× a 32-CPU node). Packing quality is per-bucket (a doc
never crosses buckets), which costs a little tail fragmentation —
bounded by one underfull final sequence per bucket — in exchange for
full parallelism and determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from thor_ray.ops.sample import _stable_hash64


def _greedy_cuts(tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Start index of each packed sequence for docs taken IN ORDER.
    A doc larger than capacity gets a sequence of its own (never split,
    never dropped — the caller can filter oversize docs beforehand)."""
    n = len(tokens)
    cs = np.cumsum(tokens, dtype=np.int64)
    starts = []
    i = 0
    base = np.int64(0)
    while i < n:
        starts.append(i)
        j = int(np.searchsorted(cs, base + capacity, side="right"))
        if j <= i:  # oversize doc: emit it alone
            j = i + 1
        base = cs[j - 1]
        i = j
    return np.asarray(starts, dtype=np.int64)


def pack_sequences(ds: Dataset, id_col: str = "doc_id",
                   count_col: str | None = None, text_col: str = "text",
                   capacity: int = 2048, n_buckets: int = 64,
                   seed: int = 0) -> Dataset:
    """Assign each document to a fixed-capacity training sequence.

    Returns one row per document: (id_col, n_tokens, seq_id, seq_pos)
    where seq_id is "{bucket}-{k}" and seq_pos the document's slot within
    its sequence. Every input document appears exactly once; sequence
    token totals never exceed `capacity` except for single oversize docs.

    count_col: an existing token-count column; if None, a whitespace-run
    token count is computed from text_col (map-only, RE2 kernel).
    """
    if count_col is None:
        from thor_ray.ops.text import token_count
        ds = token_count(ds, text_col=text_col, out="n_tokens")
        count_col = "n_tokens"

    def bucketize(t: pa.Table) -> pa.Table:
        h = _stable_hash64(t, id_col, str(seed))
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.cast(t[count_col], pa.int64()),
            "bucket": pa.array(b),
        })

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        starts = _greedy_cuts(toks, capacity)
        n = len(g)
        seq_idx = np.zeros(n, dtype=np.int64)
        seq_idx[starts[1:]] = 1
        seq_idx = np.cumsum(seq_idx)
        pos = np.arange(n, dtype=np.int64) - starts[seq_idx]
        bucket = int(g["bucket"].iloc[0])
        labels = np.char.add(f"{bucket}-",
                             seq_idx.astype(np.int64).astype("U"))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": toks,
            "seq_id": labels,
            "seq_pos": pos,
        })

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket").map_groups(pack_bucket, batch_format="pandas"))
