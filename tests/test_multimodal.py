"""Multimodal stages: real resize; stubbed audio/video with real
Ray plumbing (schema, actor signature, batch shapes)."""

import numpy as np
import pyarrow as pa
import pytest

from polipus_ray.ops.multimodal import (
    AudioDecode,
    ImageResize,
    VideoFrameSample,
    audio_stage,
    fake_audio,
    fake_video,
    resize_stage,
    video_stage,
)
from polipus_ray.synth.images import decode_image, encode_image


def _img_table(n=6):
    rng = np.random.default_rng(5)
    blobs = [encode_image(rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8), "raw") for _ in range(n)]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "bytes": pa.array(blobs, pa.binary())})


def test_resize_local():
    out = ImageResize(out_w=8, out_h=8)(_img_table())
    for b in out["bytes"].to_pylist():
        px, w, h, fmt = decode_image(b)
        assert (w, h) == (8, 8) and px.shape == (8, 8, 3)


def test_resize_stage_on_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_img_table(12))
    out = resize_stage(ds, out_w=8, out_h=8).to_pandas()
    assert len(out) == 12 and (out["w"] == 8).all()


def test_audio_stub_and_stage(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "bytes": pa.array([fake_audio(i) for i in range(4)], pa.binary())})
    out = audio_stage(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 4 and (out["rate"] == 8000).all() and (out["n_samples"] == 800).all()
    # the codec seam is a clearly-marked stub
    with pytest.raises(NotImplementedError):
        AudioDecode()._decode_audio_impl(b"RIFFxxxxWAVE")


def test_video_stub_and_stage(ray_session):
    import ray.data

    t = pa.table({"doc_id": pa.array(range(3), pa.int64()), "bytes": pa.array([fake_video(i) for i in range(3)], pa.binary())})
    out = video_stage(ray.data.from_arrow(t), every_k=4).to_pandas()
    # 12 frames sampled every 4 -> 3 frames per video
    assert len(out) == 9
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8]
    px, w, h, fmt = decode_image(out["frame_bytes"].iloc[0])
    assert (w, h) == (8, 8)
    with pytest.raises(NotImplementedError):
        VideoFrameSample()._decode_video_impl(b"\x00\x00\x00 ftypmp42")
