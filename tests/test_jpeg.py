"""Baseline JPEG codec (thor_ray/ops/jpeg.py): round-trip error bounds,
structural stream checks, unsupported-feature refusals, and the decode
pipeline's backend labels over real JPEG fixtures — the round-3
verdict's "real JPEG tier" acceptance (q49/q150 end-to-end with labels
asserted)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from thor_ray.ops import multimodal as MM
from thor_ray.ops.jpeg import jpeg_decode, jpeg_encode


def _smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.stack([
        xx * 255 / max(w - 1, 1),
        yy * 255 / max(h - 1, 1),
        128 + 100 * np.sin(xx / rng.uniform(4, 9))
        * np.cos(yy / rng.uniform(4, 9))], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestRoundTrip:
    def test_smooth_image_q90_tight_error(self):
        img = _smooth(48, 80)
        dec = jpeg_decode(jpeg_encode(img, quality=90))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert dec.shape == img.shape
        assert err.max() <= 12 and err.mean() < 2.0

    def test_flat_color_exact(self):
        flat = np.full((16, 24, 3), 137, dtype=np.uint8)
        assert (jpeg_decode(jpeg_encode(flat, 90)) == flat).all()

    def test_non_multiple_of_8_dims(self):
        # edge-replicated padding must not bleed into the cropped output
        for h, w in [(1, 1), (7, 9), (13, 5), (17, 33)]:
            img = _smooth(h, w, seed=h * 100 + w)
            dec = jpeg_decode(jpeg_encode(img, quality=92))
            assert dec.shape == (h, w, 3)
            assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0

    def test_grayscale(self):
        g = np.linspace(0, 255, 40 * 56).reshape(40, 56).astype(np.uint8)
        dec = jpeg_decode(jpeg_encode(g, quality=90))
        assert dec.shape == (40, 56, 3)
        assert (dec[:, :, 0] == dec[:, :, 1]).all()
        assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    def test_quality_monotone(self):
        img = _smooth(32, 32, seed=3)
        errs, sizes = [], []
        for q in (30, 60, 90):
            enc = jpeg_encode(img, quality=q)
            sizes.append(len(enc))
            errs.append(np.abs(jpeg_decode(enc).astype(int)
                               - img.astype(int)).mean())
        assert sizes[0] < sizes[2]      # higher quality = more bytes
        assert errs[0] > errs[2]        # and less error

    def test_noise_high_quality_bounded(self):
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = jpeg_decode(jpeg_encode(noise, quality=95))
        assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 8.0


class TestStreamStructure:
    def test_markers_present(self):
        enc = jpeg_encode(_smooth(16, 16), 90)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0",
                       b"\xff\xc4", b"\xff\xda"):
            assert marker in enc

    def test_refusals_name_the_feature(self):
        with pytest.raises(ValueError, match="SOI"):
            jpeg_decode(b"not a jpeg at all")
        # progressive SOF2 stream header
        prog = (b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01"
                b"\x01\x11\x00")
        with pytest.raises(ValueError, match="progressive"):
            jpeg_decode(prog)
        # 2x2-subsampled SOF0
        sub = (b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x10\x00\x10\x01"
               b"\x01\x22\x00")
        with pytest.raises(ValueError, match="subsampling"):
            jpeg_decode(sub)

    def test_encoder_input_validation(self):
        with pytest.raises(ValueError, match="uint8"):
            jpeg_encode(np.zeros((8, 8, 3), dtype=np.float32))
        with pytest.raises(ValueError, match="shape"):
            jpeg_encode(np.zeros((8, 8, 4), dtype=np.uint8))


class TestPipelineBackendLabels:
    def test_decode_pipeline_mixed_codecs(self, ray_session):
        import ray

        png = MM.make_fake_media_table(8, codec="png")
        import pyarrow as pa

        jpg = MM.make_fake_media_table(8, codec="jpeg", seed=5)
        jpg = jpg.set_column(0, "media_id",
                             pa.array(np.arange(100, 108, dtype=np.int64)))
        ds = ray.data.from_arrow(pa.concat_tables([png, jpg]))
        out = MM.decode_and_featurize(ds, concurrency=2,
                                      batch_size=8).to_pandas()
        by_id = dict(zip(out["media_id"], out["decode_backend"]))
        assert all(by_id[i] == "stdlib-png" for i in range(8))
        assert all(by_id[i] == "py-jpeg" for i in range(100, 108))
        assert out["features"].map(len).eq(8).all()

    def test_q49_q150_run_with_jpeg_tier(self, ray_session):
        from thor_ray.queries import (q49_multimodal_features,
                                      q150_image_neardup)

        q49 = q49_multimodal_features("/root/testdata/sf0.001").to_pandas()
        assert set(q49["backend"]) == {"stdlib-png", "py-jpeg"}
        assert len(q49) == 64

        q150 = q150_image_neardup("/root/testdata/sf0.001").to_pandas()
        # planted identical payloads (both codecs) must pair at hamming 0
        zero = q150[q150["hamming"] == 0]
        pairs = set(zip(zero["id1"], zero["id2"]))
        for k in range(8):          # png dups planted as 1000..1007
            assert (k, 1000 + k) in pairs or (1000 + k, k) in pairs
        for k in range(8):          # jpeg dups planted as 1008..1015
            assert (100 + k, 1008 + k) in pairs \
                or (1008 + k, 100 + k) in pairs


class TestProperties:
    def test_random_images_roundtrip_bounded(self):
        """Property sweep: random smooth images at random sizes/qualities
        round-trip within a quantization-error bound that scales with
        quality."""
        rng = np.random.default_rng(42)
        for _ in range(12):
            h = int(rng.integers(1, 50))
            w = int(rng.integers(1, 50))
            q = int(rng.integers(60, 98))
            img = _smooth(h, w, seed=int(rng.integers(1 << 30)))
            dec = jpeg_decode(jpeg_encode(img, quality=q))
            assert dec.shape == (h, w, 3)
            err = np.abs(dec.astype(int) - img.astype(int)).mean()
            assert err < (60 if q < 75 else 25) / max(q / 50, 1), \
                (h, w, q, err)

    def test_fuzz_decoder_clean_valueerror_contract(self):
        """Arbitrary byte soup (including JPEG-signature-prefixed soup)
        either raises ValueError or decodes — no other exception class
        leaks, no hang. Truncations of a VALID stream must also fail
        with ValueError only."""
        rng = np.random.default_rng(7)
        for i in range(30):
            blob = bytes(rng.integers(0, 256, int(rng.integers(4, 400)),
                                      dtype=np.uint8))
            if i % 2:
                blob = b"\xff\xd8" + blob
            try:
                out = jpeg_decode(blob)
                assert out.ndim == 3       # survived: must be an image
            except ValueError:
                pass                        # the ONLY allowed refusal
        enc = jpeg_encode(_smooth(24, 24), 90)
        for cut in (3, 20, len(enc) // 2, len(enc) - 3):
            with pytest.raises(ValueError):
                jpeg_decode(enc[:cut])
