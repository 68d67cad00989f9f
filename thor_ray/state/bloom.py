"""Per-state-file key bloom filters for point-lookup file skipping.

Each state/delta file written by the CDC apply embeds a small bloom
filter of its (repo, path) keys in the parquet FOOTER metadata
(`thor_bloom`, base64) — no sidecar files, atomic with the file itself,
readable with a footer-only metadata fetch. `lake_lookup` tests its query
keys against each run file's bloom and skips files that can contain none
of them: in delta (LSM) mode a partition holds up to `compact_every` run
files and a point read usually touches 1–2 of them.

Safety: a bloom has NO false negatives, so skipping a negative file can
never hide a key's newest version or its tombstone (tombstone rows carry
the key and are built into the writing file's bloom). The key hash is the
lake's pinned routing hash (`stages.smt.stable_hash`; `_routing_guard`
refuses lakes pinned under a different impl) and the blob carries the
impl tag — on any mismatch the filter reports "might contain" and the
read degrades to the unpruned path.

Vectorized end-to-end: one `stable_hash` pass per written file (~3 M
rows/s via polars xxhash), splitmix64-derived double hashing, numpy
bit-ops — never a per-row Python loop.
"""

from __future__ import annotations

import base64
import struct

import numpy as np

_MAGIC = b"TB1"
_K = 7                      # hash probes; with ~10 bits/key -> ~1% fpp
_BITS_PER_KEY = 10


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives the second hash for double hashing
    h_i = h1 + i*h2 (Kirsch-Mitzenmacher)."""
    z = x.astype(np.uint64, copy=True)
    z = (z + np.uint64(0x9E3779B97F4A7C15))
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z | np.uint64(1)          # odd, never 0


def build(key_hash: np.ndarray, impl: str,
          bits_per_key: int = _BITS_PER_KEY) -> bytes:
    """Bloom blob over pre-hashed keys (int64/uint64 from stable_hash).
    `impl` tags the hash implementation ("polars" | "fnv"); readers under
    a different impl must not prune."""
    h1 = key_hash.astype(np.uint64, copy=False)
    n = len(h1)
    m = max(64, -(-bits_per_key * max(n, 1) // 64) * 64)   # mult of 64
    bits = np.zeros(m, dtype=bool)
    if n:
        h2 = _splitmix64(h1)
        probes = np.arange(1, _K + 1, dtype=np.uint64)
        idx = (h1[:, None] + probes[None, :] * h2[:, None]) % np.uint64(m)
        bits[idx.ravel()] = True
    bm = np.packbits(bits, bitorder="little").tobytes()
    tag = impl.encode()
    return _MAGIC + struct.pack("<BBQ", _K, len(tag), m) + tag + bm


def might_contain(blob: bytes, key_hash: np.ndarray,
                  impl: str) -> np.ndarray:
    """Per-key membership test. Returns all-True (no pruning) for a
    malformed blob or a hash-impl mismatch — degrading is always safe."""
    n = len(key_hash)
    yes = np.ones(n, dtype=bool)
    try:
        if blob[:3] != _MAGIC:
            return yes
        k, tl, m = struct.unpack("<BBQ", blob[3:13])
        if blob[13:13 + tl].decode() != impl:
            return yes
        bm = np.frombuffer(blob[13 + tl:], dtype=np.uint8)
        bits = np.unpackbits(bm, bitorder="little")[:m].astype(bool)
    except Exception:
        return yes
    if n == 0:
        return yes
    h1 = key_hash.astype(np.uint64, copy=False)
    h2 = _splitmix64(h1)
    probes = np.arange(1, k + 1, dtype=np.uint64)
    idx = (h1[:, None] + probes[None, :] * h2[:, None]) % np.uint64(m)
    return bits[idx].all(axis=1)


def encode_footer(blob: bytes) -> bytes:
    """Parquet footer metadata values must be UTF-8 — base64 the blob."""
    return base64.b64encode(blob)


def decode_footer(val: bytes) -> bytes:
    return base64.b64decode(val)
