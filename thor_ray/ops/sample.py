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


def _stable_hash64(t: pa.Table, id_col: str, seed_token: str) -> np.ndarray:
    """Vectorized 64-bit stable hash of (id, seed_token) as uint64 — THE
    single source of hash-derived randomness for every deterministic
    sampler/bucketer (stratified_sample, assign_splits, weighted_mixture,
    pack_sequences). Keep it one function: the uniformity subtleties below
    must not fork."""
    ht = pa.table({
        id_col: pc.cast(t[id_col], pa.string()),
        "_seed": pa.array([seed_token] * len(t)),
    })
    return np.asarray(stable_hash(ht, [id_col, "_seed"])).astype(np.uint64)


def _hash_u01(t: pa.Table, id_col: str, seed_token: str) -> np.ndarray:
    """Uniform-[0,1) draw per row from _stable_hash64. stable_hash is a
    NON-NEGATIVE int64 (top bit clear) so the full-width quotient is not
    uniform; the low 32 bits of the mix are (verified empirically on 100k
    keys)."""
    h = _stable_hash64(t, id_col, seed_token)
    return (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / float(2**32)


def _md5_hex8(ids, seed) -> np.ndarray:
    """Per-row 8-hex-digit md5 prefix of f"{id}_{seed}" — the SQL-replayable
    tier (DuckDB: substr(md5(CAST(id AS VARCHAR) || '_seed'), 1, 8))."""
    out = np.empty(len(ids), dtype="<U8")
    for i, v in enumerate(ids):
        out[i] = hashlib.md5(f"{v}_{seed}".encode()).hexdigest()[:8]
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
            keep = _md5_hex8(t[id_col].to_pylist(), seed) < thr
        else:
            keep = _hash_u01(t, id_col, str(seed)) < fr
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def assign_splits(ds: Dataset, id_col: str, fractions: dict[str, float],
                  seed: int = 42, out: str = "split",
                  hash_fn: str = "stable") -> Dataset:
    """Deterministic train/val/test split labels: each row gets the label
    whose cumulative-fraction interval its hash falls in. A pure function
    of (id, seed) — the assignment is identical at any cluster size, block
    layout, or re-run, and rows never switch splits when the corpus grows
    (the property shuffle-based splitting loses). Map-only, no shuffle.

    fractions: ordered {label: fraction}; the LAST label absorbs the
    remainder, so fractions may sum to < 1.0 only if that is intended.
    hash_fn="stable" is the fast vectorized tier; "md5" is bit-exactly
    replayable in any SQL engine (the q91 oracle).
    """
    labels = list(fractions.keys())
    if len(labels) < 2:
        raise ValueError("assign_splits needs >= 2 labels")
    fr = [float(fractions[l]) for l in labels]
    if min(fr) < 0:
        raise ValueError(f"negative split fraction in {fractions}")
    if sum(fr[:-1]) > 1.0 + 1e-9:
        # the last label absorbs the remainder, so everything BEFORE it
        # must fit in [0, 1] or later labels are silently starved
        raise ValueError(f"split fractions before the last label sum to "
                         f"{sum(fr[:-1])} > 1: {fractions}")
    cum = np.cumsum(fr[:-1])
    lab_arr = pa.array(labels, type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        if hash_fn == "md5":
            hexs = _md5_hex8(t[id_col].to_pylist(), seed)
            thr = np.array([fraction_hex(c) for c in cum])
            idx = np.searchsorted(thr, hexs, side="right")
        else:
            u = _hash_u01(t, id_col, str(seed))
            idx = np.searchsorted(cum, u, side="right")
        return t.append_column(
            out, pc.take(lab_arr, pa.array(idx, type=pa.int64())))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_mixture(sources: "list[tuple[Dataset, float]]", id_col: str,
                     seed: int = 42, rep_col: str = "rep",
                     hash_fn: str = "stable") -> Dataset:
    """Weighted source mixture for training-corpus composition: weight w
    emits floor(w) full copies of a source plus a deterministic
    Bernoulli(frac(w)) sample — i.e. w=2.5 oversamples a source 2.5×,
    w=0.3 downsamples it to 30%. Each copy is tagged with `rep_col` so
    downstream sharding/packing can keep epochs distinct.

    The fractional draw hashes (id, seed, source_index, rep) so copies are
    independent of each other and of any other sampler using the same
    seed. Union of map-only stages: no shuffle, no driver materialization;
    Ray unions the block lists lazily. Deterministic at any parallelism.
    """
    if not sources:
        raise ValueError("weighted_mixture needs at least one source")
    if any(w < 0 for _, w in sources):
        raise ValueError(f"negative mixture weight in "
                         f"{[w for _, w in sources]}")
    if all(w == 0 for _, w in sources):
        raise ValueError("all mixture weights are zero")
    parts: list[Dataset] = []

    for si, (src, w) in enumerate(sources):
        full = int(np.floor(w))
        frac = float(w) - full
        if full == 0 and frac == 0:
            continue
        token = f"{seed}_{si}_{full}"

        def replicate(t: pa.Table, _tok=token, _fr=frac,
                      _full=full) -> pa.Table:
            # ALL copies from this one batch — the source is read once,
            # not once per rep (full corpus scans are the scale cost)
            out = [t.append_column(rep_col, pa.array(
                       np.full(len(t), rep, dtype=np.int64)))
                   for rep in range(_full)]
            if _fr > 0:
                if hash_fn == "md5":
                    mask = _md5_hex8(t[id_col].to_pylist(), _tok) \
                        < fraction_hex(_fr)
                else:
                    mask = _hash_u01(t, id_col, _tok) < _fr
                kept = t.filter(pa.array(mask))
                out.append(kept.append_column(rep_col, pa.array(
                    np.full(len(kept), _full, dtype=np.int64))))
            return pa.concat_tables(out)

        parts.append(src.map_batches(replicate, batch_format="pyarrow"))
    if len(parts) == 1:
        return parts[0]
    return parts[0].union(*parts[1:])


def sample_fixed_k(ds: Dataset, id_col: str = "doc_id", k: int = 20,
                   seed: int = 5) -> Dataset:
    """Deterministic uniform k-sample (reservoir-sample semantics, exactly
    SQL-replayable): rank every row by the md5 hex of its id and keep the
    global k smallest, tie-broken by id. Per-block local top-k first, so
    the final sort sees k × num_blocks rows — never the corpus. The md5
    tier is the bit-exact DuckDB twin
    (ORDER BY substr(md5(id || '_seed'), 1, 8), id LIMIT k)."""
    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hexs = _md5_hex8(ids, seed)
        order = np.lexsort((np.asarray(ids), hexs))[: min(k, len(hexs))]
        return pa.table({id_col: t[id_col].take(pa.array(order)),
                         "_rk": pa.array(hexs[order])})

    return (ds.map_batches(local, batch_format="pyarrow")
            .sort(["_rk", id_col]).limit(k).select_columns([id_col]))
