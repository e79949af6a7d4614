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

from ..synth.images import _HDR, _LOSSLESS, _LOSSY, _MAGIC, _QSTEP, encode_image, image_header_groups

# ---------------------------------------------------------------------------
# image resize (REAL: numpy nearest-neighbor on the in-repo codec)
# ---------------------------------------------------------------------------


class ImageResize:
    """Decode -> nearest-neighbor resize to (out_w, out_h) -> re-encode
    (same fmt).  Output replaces bytes/w/h columns.

    Vectorized end to end (the fetcher's ``_verify_payloads`` pattern):
    the subsample indices COMPOSE into the shape-group gather, so only
    the out_h x out_w x 3 bytes each output row keeps are ever copied
    out of the Arrow binary buffer (a full-image gather would move the
    whole payload to keep ~1% of it); the re-encode is ONE flat uint8
    buffer scatter wrapped zero-copy into the output BinaryArray — no
    per-row decode/encode, no per-row ``to_pylist`` of payload bytes.
    Null input rows stay null; an undecodable non-null payload raises
    (same contract as the per-row ``decode_image``)."""

    def __init__(self, out_w: int = 16, out_h: int = 16, id_col: str = "doc_id"):
        self.out_w = out_w
        self.out_h = out_h
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        col = batch["bytes"]
        ok, fmts, shape_groups, data, starts = image_header_groups(col)
        valid = (
            pc.is_valid(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col).to_numpy(zero_copy_only=False)
            if n
            else np.zeros(0, bool)
        )
        if (valid & ~ok).any():
            raise ValueError("not a PRAY image")
        known = _LOSSY | _LOSSLESS  # same contract as encode_image
        bad = [f for f in np.unique(fmts[ok]) if f not in known] if ok.any() else []
        if bad:
            raise NotImplementedError(f"image format {bad[0]!r} (real codecs not available in this container)")
        m2 = self.out_h * self.out_w * 3
        row_size = _HDR + m2
        out_offs = np.zeros(n + 1, np.int32)
        np.cumsum(np.where(ok, row_size, 0), out=out_offs[1:])
        buf = np.zeros(int(out_offs[-1]), np.uint8)
        # fmt tags re-encoded from the U4 array in one S4 view (no
        # per-row .encode()): 'raw ' etc. are space-padded ascii
        fmt_pad = np.char.ljust(fmts.astype("U4"), 4)
        fmt_all = np.ascontiguousarray(fmt_pad.astype("S4")).view(np.uint8).reshape(n, 4)
        lossy_mask = np.isin(fmts, list(_LOSSY))
        for sel, h, w in shape_groups:
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            # composed subsample gather: only the kept pixels move
            body = _HDR + ((yi[:, None] * w + xi[None, :])[:, :, None] * 3 + np.arange(3)).ravel()
            payload = data[starts[sel, None] + body]  # (N, m2)
            rows = np.empty((len(sel), row_size), np.uint8)
            rows[:, :4] = np.frombuffer(_MAGIC, np.uint8)
            rows[:, 4:8] = fmt_all[sel]
            rows[:, 8] = self.out_w & 0xFF
            rows[:, 9] = self.out_w >> 8
            rows[:, 10] = self.out_h & 0xFF
            rows[:, 11] = self.out_h >> 8
            lossy = lossy_mask[sel]
            if lossy.any():  # same floor-quantization as encode_image
                payload = payload.copy()
                payload[lossy] = (payload[lossy] // _QSTEP) * _QSTEP
            rows[:, _HDR:] = payload
            buf[out_offs[sel][:, None] + np.arange(row_size)] = rows
        validity = pa.py_buffer(np.packbits(ok, bitorder="little").tobytes()) if not ok.all() else None
        blobs = pa.Array.from_buffers(
            pa.binary(), n, [validity, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(buf.tobytes())],
            null_count=int((~ok).sum()),
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "bytes": blobs,
                "w": pa.array(np.full(n, self.out_w, np.int32), pa.int32(), mask=~ok),
                "h": pa.array(np.full(n, self.out_h, np.int32), pa.int32(), mask=~ok),
                "fmt": pa.array([f if o else None for f, o in zip(fmts, ok)], pa.string()),
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
