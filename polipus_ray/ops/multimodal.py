"""Multimodal column stages — image resize (real), audio decode and
video frame-sample (STUBBED: the container ships no codec libraries).

The pattern for every modality is identical and fully exercised here:
an opaque ``binary`` column + typed metadata columns, transformed by
an actor-pool ``map_batches`` stage (decoder state built once per
actor in ``__init__``), small ``batch_size`` because rows are
payload-heavy, ``batch_format="pyarrow"`` so bytes stay zero-copy
until the kernel touches them.

STUB POLICY: ``AudioDecode`` and ``VideoFrameSample`` raise
``NotImplementedError`` for real formats and accept only the
deterministic in-repo fake payloads (``fake_audio``/``fake_video``),
so the Ray-side plumbing — schema, actor signature, batch shapes,
output layout — is real and tested while the codec call is a
clearly-marked seam (swap the ``_decode_*_impl`` method when a codec
library is available)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..synth.images import decode_image, encode_image

# ---------------------------------------------------------------------------
# image resize (REAL: numpy nearest-neighbor on the in-repo codec)
# ---------------------------------------------------------------------------


class ImageResize:
    """Decode -> nearest-neighbor resize to (out_w, out_h) -> re-encode
    (same fmt).  Output replaces bytes/w/h columns."""

    def __init__(self, out_w: int = 16, out_h: int = 16, id_col: str = "doc_id"):
        self.out_w = out_w
        self.out_h = out_h
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs, ws, hs, fmts = [], [], [], [], []
        id_vals = batch[self.id_col].to_pylist()  # decoded once per batch
        for i, data in enumerate(batch["bytes"].to_pylist()):
            ids.append(id_vals[i])
            if data is None:
                blobs.append(None)
                ws.append(None)
                hs.append(None)
                fmts.append(None)
                continue
            px, w, h, fmt = decode_image(data)
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            small = px[np.ix_(yi, xi)]
            blobs.append(encode_image(np.ascontiguousarray(small), fmt))
            ws.append(self.out_w)
            hs.append(self.out_h)
            fmts.append(fmt)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )


def resize_stage(ds, out_w: int = 16, out_h: int = 16, id_col: str = "doc_id", concurrency: int | tuple[int, int] = (1, 4)):
    # autoscaling (min, max) rather than a fixed pool size: see
    # images.decode_stage — a fixed min can deadlock the executor when
    # other actors already hold the session's CPUs
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# audio (STUB codec, real plumbing)
# ---------------------------------------------------------------------------

_AUDIO_MAGIC = b"PAUD"


def fake_audio(seed: int, n_samples: int = 800, rate: int = 8000) -> bytes:
    """Deterministic fake 'audio': int16 mono samples."""
    rng = np.random.default_rng([99, seed])
    samples = rng.integers(-(1 << 12), 1 << 12, size=n_samples, dtype=np.int16)
    return _AUDIO_MAGIC + int(rate).to_bytes(4, "little") + samples.tobytes()


class AudioDecode:
    """Actor-pool audio decode -> (id, rate, n_samples, rms).  Real
    formats (wav/mp3/flac...) raise NotImplementedError at the seam."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def _decode_audio_impl(self, data: bytes) -> tuple[int, np.ndarray]:
        if data[:4] != _AUDIO_MAGIC:
            raise NotImplementedError("real audio codecs unavailable in this container; only PAUD fake payloads decode")
        rate = int.from_bytes(data[4:8], "little")
        return rate, np.frombuffer(data, dtype=np.int16, offset=8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rates, ns, rms = [], [], [], []
        id_vals = batch[self.id_col].to_pylist()  # decoded once per batch
        for i, data in enumerate(batch["bytes"].to_pylist()):
            ids.append(id_vals[i])
            rate, samples = self._decode_audio_impl(data)
            rates.append(rate)
            ns.append(len(samples))
            rms.append(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(ns, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# video frame sampling (STUB codec, real plumbing)
# ---------------------------------------------------------------------------

_VIDEO_MAGIC = b"PVID"


def fake_video(seed: int, n_frames: int = 12, w: int = 8, h: int = 8) -> bytes:
    """Deterministic fake 'video': n_frames raw RGB frames."""
    rng = np.random.default_rng([77, seed])
    frames = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
    hdr = _VIDEO_MAGIC + n_frames.to_bytes(2, "little") + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    return hdr + frames.tobytes()


class VideoFrameSample:
    """Actor-pool frame sampler: every k-th frame re-encoded as a PRAY
    image row (flat_map shape: one input row -> several frame rows)."""

    def __init__(self, every_k: int = 4, id_col: str = "doc_id"):
        self.every_k = every_k
        self.id_col = id_col

    def _decode_video_impl(self, data: bytes) -> np.ndarray:
        if data[:4] != _VIDEO_MAGIC:
            raise NotImplementedError("real video codecs unavailable in this container; only PVID fake payloads decode")
        n = int.from_bytes(data[4:6], "little")
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return np.frombuffer(data, dtype=np.uint8, offset=10).reshape(n, h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, blobs = [], [], []
        id_vals = batch[self.id_col].to_pylist()  # decoded once per batch
        for i, data in enumerate(batch["bytes"].to_pylist()):
            vid = id_vals[i]
            frames = self._decode_video_impl(data)
            for j in range(0, len(frames), self.every_k):
                ids.append(vid)
                fidx.append(j)
                blobs.append(encode_image(np.ascontiguousarray(frames[j]), "raw"))
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_bytes": pa.array(blobs, pa.binary()),
            }
        )


def audio_stage(ds, id_col: str = "doc_id", concurrency: int | tuple[int, int] = (1, 2)):
    return ds.map_batches(AudioDecode, fn_constructor_kwargs={"id_col": id_col}, batch_format="pyarrow", batch_size=64, concurrency=concurrency)


def video_stage(ds, every_k: int = 4, id_col: str = "doc_id", concurrency: int | tuple[int, int] = (1, 2)):
    return ds.map_batches(
        VideoFrameSample, fn_constructor_kwargs={"every_k": every_k, "id_col": id_col}, batch_format="pyarrow", batch_size=16, concurrency=concurrency
    )
