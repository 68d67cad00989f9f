"""Deterministic sampling operators (SURVEY.md §2.6 O4 extensions).

Hash-threshold sampling keeps a row iff hash(id, seed) < fraction — a pure
function of the row, so the keep-set is IDENTICAL at any cluster size,
batch split, or re-run (the property a resumable 100-TB pipeline needs;
`Dataset.random_sample` is seeded but block-layout-dependent). Map-only:
no shuffle, no driver state.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from thor_ray.stages.smt import stable_hash


def _md5_keep_mask(ids, seed: int, thresholds: np.ndarray) -> np.ndarray:
    """hex(md5(f"{id}_{seed}"))[:8] < threshold — reproducible in ANY SQL
    engine (DuckDB: substr(md5(id || '_seed'), 1, 8) < 'xxxxxxxx')."""
    out = np.empty(len(ids), dtype=bool)
    for i, (v, thr) in enumerate(zip(ids, thresholds)):
        out[i] = hashlib.md5(f"{v}_{seed}".encode()).hexdigest()[:8] < thr
    return out


def fraction_hex(fraction: float) -> str:
    """The md5 threshold string for a keep fraction: an 8-hex-digit prefix
    bound, except fraction >= 1.0 → "g", which sorts after every hex
    digest (int(1.0 * 16**8) would format to NINE digits and compare
    lexicographically BELOW most 8-digit prefixes, silently dropping ~94%
    of a keep-everything stratum)."""
    if fraction >= 1.0:
        return "g"
    return format(max(int(fraction * 16**8), 0), "08x")


def stratified_sample(ds: Dataset, strata_col: str,
                      fractions: "float | dict[str, float]",
                      id_col: str, seed: int = 42,
                      hash_fn: str = "stable") -> Dataset:
    """Per-stratum Bernoulli sample, deterministic in (id_col, seed).

    fractions: one float for every stratum, or {stratum: fraction}
    (strata missing from the dict keep nothing — explicit is safer than a
    silent 100% default). hash_fn="stable" uses the engine's vectorized
    64-bit stable_hash (the fast path); "md5" compares a per-row md5 hex
    prefix against the fraction's hex threshold — slower, but bit-exactly
    reproducible in any SQL engine (the q69 oracle runs it in DuckDB)."""
    frac_map = fractions if isinstance(fractions, dict) else None
    frac_scalar = None if frac_map is not None else float(fractions)

    def fn(t: pa.Table) -> pa.Table:
        if frac_map is not None:
            fr = t[strata_col].to_pandas().map(frac_map).fillna(0.0) \
                .to_numpy(dtype=np.float64)
        else:
            fr = np.full(len(t), frac_scalar)
        if hash_fn == "md5":
            thr = np.array([fraction_hex(f) for f in fr])
            keep = _md5_keep_mask(t[id_col].to_pylist(), seed, thr)
        else:
            ht = pa.table({
                id_col: pc.cast(t[id_col], pa.string()),
                "_seed": pa.array([str(seed)] * len(t)),
            })
            h = np.asarray(stable_hash(ht, [id_col, "_seed"])).astype(np.uint64)
            # stable_hash is a non-negative int64 (top bit clear), so the
            # full-width quotient is NOT uniform on [0,1); the low 32 bits
            # of the 64-bit mix are (verified empirically on 100k keys)
            u = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / float(2**32)
            keep = u < fr
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
