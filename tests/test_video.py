"""Real video tier (round-4 verdict #3): MJPEG-in-AVI container codec,
DecodeVideo actor stage, and the mixed PNG+JPEG+video near-dup fixture
with backend labels asserted."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from thor_ray.ops import multimodal as mm


def _smooth_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = rng.uniform(50, 180, size=3)
    out = []
    for k in range(n):
        img = np.stack([
            base[0] + 40 * np.sin((xx + 2 * k) / 5.0),
            base[1] + yy * 60 / max(h, 1) + 2 * k,
            base[2] + 40 * np.cos(yy / 6.0)], axis=-1)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


class TestAviCodec:
    def test_roundtrip_within_jpeg_error(self):
        frames = _smooth_frames(6, 20, 15, seed=3)
        data = mm.avi_encode_mjpeg(frames, fps=12)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        out = mm.avi_frames(data)
        assert len(out) == 6
        for a, b in zip(frames, out):
            assert b.shape == a.shape and b.dtype == np.uint8
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 12

    def test_stride_and_count(self):
        data = mm.avi_encode_mjpeg(_smooth_frames(7, 16, 16), fps=10)
        assert mm.avi_n_frames(data) == 7
        assert len(mm.avi_frames(data, stride=3)) == 3  # frames 0,3,6

    def test_odd_sized_jpeg_chunks_are_word_aligned(self):
        # a 1-frame stream whose JPEG payload has odd length must still
        # parse (RIFF pads chunks to even sizes)
        frames = _smooth_frames(1, 13, 11, seed=9)
        data = mm.avi_encode_mjpeg(frames)
        assert len(mm.avi_frames(data)) == 1

    def test_not_avi_raises(self):
        with pytest.raises(ValueError, match="RIFF"):
            mm.avi_frames(b"\x00" * 64)
        with pytest.raises(ValueError):
            mm.avi_frames(b"RIFF\x10\x00\x00\x00WAVEdata")

    def test_truncated_avi_raises(self):
        data = mm.avi_encode_mjpeg(_smooth_frames(3, 16, 16))
        with pytest.raises(ValueError):
            mm.avi_frames(data[: len(data) // 2])

    def test_dim_mismatch_rejected(self):
        with pytest.raises(ValueError, match="dims"):
            mm.avi_encode_mjpeg([np.zeros((8, 8, 3), np.uint8),
                                 np.zeros((9, 8, 3), np.uint8)])


class TestDecodeVideoStage:
    def test_real_decode_with_stride(self, ray_session):
        t = mm.make_fake_media_table(12, kind="video", codec="mjpeg-avi",
                                     seed=11)
        out = mm.video_pipeline(ray.data.from_arrow(t), stride=2,
                                concurrency=2, batch_size=4).to_pandas()
        assert set(out["decode_backend"]) == {"py-mjpeg-avi"}
        for _, r in out.iterrows():
            nf = int(r["meta"]["n_frames"])
            assert r["n_sampled"] == len(range(0, nf, 2))
            f0 = np.asarray(r["frames"][0])
            assert f0.shape == (int(r["meta"]["height"]),
                                int(r["meta"]["width"]), 3)

    def test_unparseable_payload_fakes_nonstrict(self, ray_session):
        t = mm.make_fake_media_table(4, kind="video", codec="fake")
        out = mm.video_pipeline(ray.data.from_arrow(t), stride=10,
                                concurrency=1, batch_size=4).to_pandas()
        assert set(out["decode_backend"]) == {"fake"}
        for _, r in out.iterrows():
            nf = max(int(r["meta"]["n_frames"]), 1)
            assert r["n_sampled"] == len(range(0, nf, 10))

    def test_strict_raises_on_unparseable(self):
        dec = mm.DecodeVideo(stride=1, strict=True)
        batch = pd.DataFrame({
            "payload": [b"not-a-container"],
            "meta": [{"height": 8, "width": 8, "n_frames": 3}]})
        with pytest.raises(ValueError):
            dec(batch)


def test_mixed_png_jpeg_video_near_dup_with_backend_labels(ray_session):
    """The round-4 verdict's 'done' fixture: planted near-dups across all
    three REAL codec tiers; every backend label is a real tier (no fake
    left for shipped fixture kinds) and planted pairs come back."""
    from thor_ray.ops.multimodal import (AverageHash, ahash_pipeline,
                                         image_near_dup_pairs,
                                         video_first_frame_as_image)

    png = mm.make_fake_media_table(10, kind="image", codec="png")
    jpg = mm.make_fake_media_table(10, kind="image", codec="jpeg", seed=9)
    jpg = jpg.set_column(0, "media_id",
                         pa.array(np.arange(100, 110, dtype=np.int64)))
    vid = mm.make_fake_media_table(10, kind="video", codec="mjpeg-avi",
                                   seed=21)
    vid = vid.set_column(0, "media_id",
                         pa.array(np.arange(200, 210, dtype=np.int64)))
    # plant 2 duplicates of each codec under fresh ids
    dup = pa.concat_tables([png.slice(0, 2), jpg.slice(0, 2),
                            vid.slice(0, 2)]).set_column(
        0, "media_id", pa.array(np.arange(1000, 1006, dtype=np.int64)))
    images = pa.concat_tables([png, jpg, dup.slice(0, 4)])
    videos = pa.concat_tables([vid, dup.slice(4, 2)])

    hashed_img = ahash_pipeline(ray.data.from_arrow(images),
                                concurrency=2, batch_size=8)
    first = video_first_frame_as_image(ray.data.from_arrow(videos),
                                       concurrency=2, batch_size=4)
    hashed_vid = first.map_batches(AverageHash, batch_format="pandas",
                                   batch_size=8, concurrency=2)
    img_pd = hashed_img.to_pandas()
    vid_pd = hashed_vid.to_pandas()
    assert set(img_pd["decode_backend"]) == {"stdlib-png", "py-jpeg"}
    assert set(vid_pd["decode_backend"]) == {"py-mjpeg-avi"}

    cols = ["media_id", "ahash"]
    hashed = ray.data.from_pandas(
        pd.concat([img_pd[cols], vid_pd[cols]], ignore_index=True))
    pairs = image_near_dup_pairs(hashed, "media_id", "ahash",
                                 max_hamming=3).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs["id1"], pairs["id2"])}
    exact = pairs[pairs["hamming"] == 0]
    assert len(exact) >= 6   # all six planted identical payloads
    # planted duplicates: png ids 0,1 ↔ 1000,1001; jpeg 100,101 ↔
    # 1002,1003; video 200,201 ↔ 1004,1005
    for want in [(0, 1000), (1, 1001), (100, 1002), (101, 1003),
                 (200, 1004), (201, 1005)]:
        assert want in got, f"planted pair {want} missing"


def test_q54_real_video_rows(ray_session):
    from thor_ray.queries import q54_video_frame_sample
    out = q54_video_frame_sample("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 48
    assert set(out["decode_backend"]) == {"py-mjpeg-avi"}
    assert (out["n_sampled"] ==
            ((out["n_frames"] + 3) // 4)).all()   # ceil(nf / stride=4)


def test_avi_roundtrip_property():
    """Property: any stack of smooth uint8 frames round-trips through
    encode→decode with frame count, dims and bounded JPEG error
    preserved (hypothesis over dims/frame-count/content phase)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(min_value=9, max_value=40),
           st.integers(min_value=9, max_value=40),
           st.integers(min_value=1, max_value=6),
           st.integers(min_value=0, max_value=10**6))
    def prop(h, w, n, seed):
        frames = _smooth_frames(n, h, w, seed=seed)
        data = mm.avi_encode_mjpeg(frames, fps=8)
        out = mm.avi_frames(data)
        assert len(out) == n == mm.avi_n_frames(data)
        for a, b in zip(frames, out):
            assert b.shape == (h, w, 3) and b.dtype == np.uint8
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 16
        # stride never exceeds count, always includes frame 0
        assert len(mm.avi_frames(data, stride=n)) == 1

    prop()
