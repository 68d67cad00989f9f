"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The Ray-side plumbing (schemas, actor-pool stages, batch sizing, output
layout) is real and tested; the actual codec work is STUBBED because this
container has no image/audio libraries — each stage tries the real import
and otherwise produces a deterministic fake (clearly marked), or raises
NotImplementedError in `strict` mode. At scale these run as actor pools
with SMALL batch sizes (large binary payloads → batch_size 16–64 so
batch × concurrency fits worker heaps — ray_guide 'Memory-aware').
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("meta", pa.struct([
        ("width", pa.int32()), ("height", pa.int32()),
        ("sample_rate", pa.int32()), ("n_frames", pa.int32()),
        ("codec", pa.string()),
    ])),
])


def make_fake_media_table(n: int = 64, kind: str = "image",
                          seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(256, 4096, size=n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta": pa.array(
            [{"width": int(w), "height": int(h), "sample_rate": 16000,
              "n_frames": int(f), "codec": "fake"}
             for w, h, f in zip(rng.integers(16, 256, n),
                                rng.integers(16, 256, n),
                                rng.integers(1, 300, n))],
            type=MEDIA_SCHEMA.field("meta").type),
    }, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: decode image payloads → (h, w, 3) uint8 arrays.

    Real path uses PIL when importable (not in this container); fake path
    derives a deterministic pixel array from the payload hash + meta dims.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401
            self.backend = "pil"
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL; not available in this container")
            self.backend = "fake"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.backend == "pil":
            from io import BytesIO
            from PIL import Image
            arrs = [np.asarray(Image.open(BytesIO(p)).convert("RGB"))
                    for p in batch["payload"]]
        else:
            arrs = []
            for p, m in zip(batch["payload"], batch["meta"]):
                h, w = int(m["height"]), int(m["width"])
                seed = int.from_bytes(hashlib.sha256(p).digest()[:8], "little")
                arrs.append(np.random.default_rng(seed).integers(
                    0, 256, size=(h, w, 3), dtype=np.uint8))
        batch = batch.drop(columns=["payload"])
        batch["pixels"] = arrs
        batch["decode_backend"] = self.backend
        return batch


class ImageFeatures:
    """Actor-pool stage: per-image feature vector (mean/std per channel +
    dims) from decoded pixels — real numpy math (works on fake pixels too).
    """

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for px in batch["pixels"]:
            px = np.asarray(px, dtype=np.float64)
            feats.append(np.concatenate([
                px.mean(axis=(0, 1)) / 255.0, px.std(axis=(0, 1)) / 255.0,
                [px.shape[0] / 1024.0, px.shape[1] / 1024.0]]).astype(np.float32))
        batch = batch.drop(columns=["pixels"])
        batch["features"] = feats
        return batch


class FrameSample:
    """Actor-pool stage: sample every `stride`-th frame index from video
    metadata (decode itself stubbed; emits frame indices + payload slices).
    """

    def __init__(self, stride: int = 10):
        self.stride = stride

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["frame_indices"] = [
            list(range(0, int(m["n_frames"]), self.stride)) for m in batch["meta"]
        ]
        batch["n_sampled"] = batch["frame_indices"].map(len)
        return batch


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize to (target_h, target_w).

    REAL math (pure numpy fancy indexing — no codec library involved), so
    this stage is not a stub: it operates on whatever `pixels` the decode
    stage produced, PIL-decoded or fake."""

    def __init__(self, target_h: int = 64, target_w: int = 64):
        self.th, self.tw = target_h, target_w

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for px in batch["pixels"]:
            px = np.asarray(px)
            h, w = px.shape[0], px.shape[1]
            ri = (np.arange(self.th) * h // self.th)
            ci = (np.arange(self.tw) * w // self.tw)
            out.append(px[ri][:, ci])
        batch = batch.copy()
        batch["pixels"] = out
        return batch


class AudioFeatures:
    """Actor-pool stage: framewise RMS + zero-crossing-rate features over
    PCM samples. The 'decode' interprets the payload bytes as int16 PCM
    (deterministic stand-in for a codec — labeled via `decode_backend`);
    the DSP math itself is real vectorized numpy."""

    def __init__(self, frame_len: int = 256):
        self.frame_len = frame_len
        self.backend = "pcm-bytes"  # a real audio codec isn't installed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, n_frames = [], []
        for p in batch["payload"]:
            pcm = np.frombuffer(p[: len(p) - len(p) % 2], dtype=np.int16) \
                .astype(np.float64) / 32768.0
            if len(pcm) == 0:  # sub-sample payload: zero features, 0 frames
                feats.append(np.zeros(4))
                n_frames.append(0)
                continue
            nf = max(len(pcm) // self.frame_len, 1)
            frames = pcm[: nf * self.frame_len].reshape(nf, -1) \
                if len(pcm) >= self.frame_len else pcm.reshape(1, -1)
            rms = np.sqrt((frames ** 2).mean(axis=1))
            zcr = (np.abs(np.diff(np.signbit(frames), axis=1)).sum(axis=1)
                   / max(frames.shape[1] - 1, 1))
            feats.append(np.round(np.array(
                [rms.mean(), rms.std(), zcr.mean(), zcr.std()]), 6))
            n_frames.append(nf)
        batch = batch.drop(columns=["payload"])
        batch["audio_features"] = feats
        batch["n_audio_frames"] = pd.Series(n_frames, index=batch.index,
                                            dtype="int64")
        batch["decode_backend"] = self.backend
        return batch


def audio_pipeline(ds: Dataset, concurrency: "int | tuple[int, int]" = 2,
                   batch_size: int = 32) -> Dataset:
    """Audio feature extraction as an actor pool with small batches."""
    return ds.map_batches(AudioFeatures, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def frame_sample_pipeline(ds: Dataset, stride: int = 10,
                          concurrency: "int | tuple[int, int]" = 2,
                          batch_size: int = 32) -> Dataset:
    """Video frame sampling (metadata-driven; decode stubbed)."""
    return ds.map_batches(FrameSample, fn_constructor_kwargs={"stride": stride},
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def decode_and_featurize(ds: Dataset, concurrency: int = 4,
                         batch_size: int = 32, strict: bool = False) -> Dataset:
    """The image pipeline: decode (actor pool, small batches) → features.

    batch_size is deliberately small: payloads are large binaries and a
    batch × concurrency must fit in a worker heap."""
    decoded = ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"strict": strict},
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency)
    return decoded.map_batches(ImageFeatures, batch_format="pandas",
                               batch_size=batch_size, concurrency=concurrency)


class AverageHash:
    """Actor-pool stage: 64-bit perceptual aHash from decoded pixels —
    ITU-R 601 luma, nearest-neighbor 8×8 downsample, mean threshold.
    REAL math end-to-end (PIL-decoded or fake pixels alike); only the
    upstream codec is a stand-in in this container."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = np.empty(len(batch), dtype=np.uint64)
        for i, px in enumerate(batch["pixels"]):
            px = np.asarray(px, dtype=np.float64)
            gray = (px[..., 0] * 0.299 + px[..., 1] * 0.587
                    + px[..., 2] * 0.114)
            h, w = gray.shape
            g = gray[np.arange(8) * h // 8][:, np.arange(8) * w // 8]
            bits = (g > g.mean()).reshape(-1)
            hs[i] = int.from_bytes(np.packbits(bits).tobytes(), "big")
        batch = batch.drop(columns=["pixels"])
        batch["ahash"] = hs.view(np.int64)
        return batch


def image_near_dup_pairs(ds: Dataset, id_col: str = "media_id",
                         hash_col: str = "ahash", max_hamming: int = 3,
                         salt_groups: int = 64) -> Dataset:
    """Perceptual near-duplicate image pairs by banded aHash.

    Scale shape (the LSH-family pattern): the 64-bit hash splits into 4
    16-bit bands — Hamming distance ≤ 3 guarantees at least one equal
    band (pigeonhole) — each row ships 4 (band, id, hash) rows (~24 B)
    through ONE groupby on a SALTED key (`(band_id, band_val) % salt
    groups` — fanout scales with `salt_groups`, never a fixed 4); bucket
    resolution is a C-level pandas groupby inside; exact Hamming verify
    via uint64 XOR + unpackbits popcount on the (small) bucket; pairs
    dedup across bands with one distinct pass over the pair ids."""
    def band_rows(t: pa.Table) -> pa.Table:
        h = t[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(h)
        bands, vals, rid, rh = [], [], [], []
        for b in range(4):
            bands.append(np.full(n, b, dtype=np.int64))
            vals.append((h >> np.uint64(16 * b)
                         & np.uint64(0xFFFF)).astype(np.int64))
            rid.append(ids)
            rh.append(h.view(np.int64))
        key = (np.concatenate(bands) << np.int64(16)) | np.concatenate(vals)
        return pa.table({"bkey": key,
                         "gsalt": (key % salt_groups).astype(np.int32),
                         "id": np.concatenate(rid),
                         "h": np.concatenate(rh)})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        p1, p2, dd = [], [], []
        for _, g in df.groupby("bkey", sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy()
            hs = g["h"].to_numpy().view(np.uint64)
            order = np.argsort(ids, kind="stable")
            ids, hs = ids[order], hs[order]
            x = hs[:, None] ^ hs[None, :]
            dist = np.unpackbits(
                x.view(np.uint8).reshape(len(ids), len(ids), 8),
                axis=2).sum(axis=2)
            iu, ju = np.triu_indices(len(ids), k=1)
            ok = dist[iu, ju] <= max_hamming
            p1.append(ids[iu[ok]])
            p2.append(ids[ju[ok]])
            dd.append(dist[iu, ju][ok])
        if not p1:
            return pd.DataFrame({"id1": pd.Series([], dtype="int64"),
                                 "id2": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id1": np.concatenate(p1).astype(np.int64),
                             "id2": np.concatenate(p2).astype(np.int64),
                             "hamming": np.concatenate(dd).astype(np.int64)})

    pairs = (ds.map_batches(band_rows, batch_format="pyarrow")
               .groupby("gsalt").map_groups(bucket_pairs,
                                            batch_format="pandas"))
    # a pair can surface from several bands (identical hamming each
    # time): one C-level distinct aggregate removes the dups
    from thor_ray.ops.relational import distinct
    return distinct(pairs, ["id1", "id2", "hamming"])


def ahash_pipeline(ds: Dataset, concurrency: "int | tuple[int, int]" = 4,
                   batch_size: int = 32, strict: bool = False) -> Dataset:
    """decode → aHash as actor pools with small (binary-payload) batches."""
    decoded = ds.map_batches(
        DecodeImage, fn_constructor_kwargs={"strict": strict},
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency)
    return decoded.map_batches(AverageHash, batch_format="pandas",
                               batch_size=batch_size, concurrency=concurrency)
