"""Vectorized MD5 (RFC 1321) over numpy uint32 lanes.

The dedup operators' shared Python/SQL hash is ``md5(s)[:8]`` read
big-endian (dedup.py ``_h64``; DuckDB oracle
``('0x'||substr(md5(s),1,16))::UBIGINT``).  md5 is load-bearing —
the DuckDB oracles replicate every hash bit-for-bit — so the batching
fix is to vectorize md5 itself, not to swap the hash: one message is
one-or-more 64-byte compression calls, and the compression function
is 64 rounds of uint32 add/rotate/boolean ops that numpy runs over N
messages at once.

Lanes are processed in 16k-message chunks: each round allocates
O(lanes) temporaries, and at 16k lanes (64 KB per uint32 array) the
working set stays cache-resident — measured 2.1x faster than one
monolithic 1M-lane pass (0.40 vs 0.84 s per 1M 5-byte messages), the
same cache-residency economics as the simhash unpackbits kernel and
the 512-image DCT verify chunks.  All arithmetic is uint32 (numpy
wraps mod 2^32 natively); boolean round functions use the 3-op
xor/and/xor forms to cut temporaries.  Parity with ``hashlib.md5``
is pinned by tests/test_ops.py over random lengths 0..200 (1, 2 and
3+ block messages, including the empty message).
"""

from __future__ import annotations

import numpy as np

# round constants K[i] = floor(abs(sin(i+1)) * 2^32) and per-round
# left-rotate amounts, straight from RFC 1321
_K = np.floor(np.abs(np.sin(np.arange(1, 65))) * (1 << 32)).astype(np.uint64).astype(np.uint32)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# message-word index per round: g(i) by MD5 round family
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)
_IV = (np.uint32(0x67452301), np.uint32(0xEFCDAB89), np.uint32(0x98BADCFE), np.uint32(0x10325476))

# lanes per pass: 64 KB/uint32 temp array -> cache-resident rounds
_LANE_CHUNK = 16384


def _compress(X: np.ndarray, a0, b0, c0, d0, F: np.ndarray, T: np.ndarray):
    """One MD5 compression over N parallel 64-byte blocks, in place.

    ``X``: (N, 16) uint32 little-endian message words; ``a0..d0`` the
    running state vectors (mutated: the final addition folds back into
    them); ``F``/``T`` caller-provided (N,) uint32 scratch."""
    A, B, C, D = a0.copy(), b0.copy(), c0.copy(), d0.copy()
    for i in range(64):
        if i < 16:
            # (B & C) | (~B & D)  ==  D ^ (B & (C ^ D))
            np.bitwise_xor(C, D, out=F)
            np.bitwise_and(F, B, out=F)
            np.bitwise_xor(F, D, out=F)
        elif i < 32:
            # (D & B) | (~D & C)  ==  C ^ (D & (B ^ C))
            np.bitwise_xor(B, C, out=F)
            np.bitwise_and(F, D, out=F)
            np.bitwise_xor(F, C, out=F)
        elif i < 48:
            np.bitwise_xor(B, C, out=F)
            np.bitwise_xor(F, D, out=F)
        else:
            # C ^ (B | ~D)
            np.bitwise_not(D, out=F)
            np.bitwise_or(F, B, out=F)
            np.bitwise_xor(F, C, out=F)
        F += A  # uint32 wraps mod 2^32
        F += _K[i]
        F += X[:, _G[i]]
        A, D, C = D, C, B
        s = int(_S[i])
        np.left_shift(F, np.uint32(s), out=T)
        np.right_shift(F, np.uint32(32 - s), out=F)
        np.bitwise_or(T, F, out=T)
        B = B + T
    a0 += A
    b0 += B
    c0 += C
    d0 += D


def _u64_from_state(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """First 8 digest bytes big-endian -> uint64.  The digest serializes
    each state word little-endian, so bytes 0-7 are LE(a) then LE(b);
    reading those big-endian is (bswap(a) << 32) | bswap(b)."""
    return (a.byteswap().astype(np.uint64) << np.uint64(32)) | b.byteswap().astype(np.uint64)


def _digest_from_state(a, b, c, d) -> np.ndarray:
    """Full 16-byte digest rows: each state word serialized LE —
    written through a uint32 view of the output, no intermediate
    copies (ascontiguousarray per word measured 0.8 s per 100k-row
    crawl round)."""
    k = len(a)
    out = np.empty((k, 16), np.uint8)
    v = out.view("<u4")  # (k, 4) little-endian word view
    v[:, 0] = a
    v[:, 1] = b
    v[:, 2] = c
    v[:, 3] = d
    return out


def md5_u64_fixed(msgs: np.ndarray, digest: bool = False) -> np.ndarray:
    """md5(m)[:8] big-endian as uint64 for N equal-length messages
    (or, with ``digest=True``, the full digests as an (N, 16) uint8).

    ``msgs``: (N, L) uint8 with L <= 55 (single-block after padding).
    This is the hot path for char n-gram shingles (L = n <= 8)."""
    n, L = msgs.shape
    if L > 55:
        raise ValueError("md5_u64_fixed handles single-block messages (L <= 55)")
    out = np.empty((n, 16), np.uint8) if digest else np.empty(n, np.uint64)
    bitlen = np.frombuffer(np.uint64(8 * L).astype("<u8").tobytes(), dtype=np.uint8)
    for s0 in range(0, n, _LANE_CHUNK):
        m = msgs[s0 : s0 + _LANE_CHUNK]
        k = len(m)
        block = np.zeros((k, 64), dtype=np.uint8)
        block[:, :L] = m
        block[:, L] = 0x80
        block[:, 56:64] = bitlen
        X = block.view("<u4").reshape(k, 16)
        a, b, c, d = (np.full(k, v, np.uint32) for v in _IV)
        _compress(X, a, b, c, d, np.empty(k, np.uint32), np.empty(k, np.uint32))
        out[s0 : s0 + k] = _digest_from_state(a, b, c, d) if digest else _u64_from_state(a, b)
    return out


def md5_u64_concat(buf: np.ndarray, offsets: np.ndarray, lengths: np.ndarray, digest: bool = False) -> np.ndarray:
    """md5(m)[:8] big-endian as uint64 for N variable-length messages
    packed back-to-back in one uint8 buffer.

    Messages are grouped by padded block count; each group runs the
    vectorized compression block-by-block in lane chunks (multi-block
    messages chain state across their blocks).  Used for word n-grams,
    simhash word hashes and minhash band keys, whose lengths vary."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(offsets)
    out = np.empty((n, 16), np.uint8) if digest else np.empty(n, np.uint64)
    if n == 0:
        return out
    nblocks = (lengths + 9 + 63) // 64  # ceil((len + 1 + 8) / 64)
    # single-block messages: group by exact length and gather each
    # group as rows of a sliding-window view — a plain fancy index
    # into the fixed-length kernel, no per-message padding masks
    # (measured ~4x faster than the masked path on ~20-byte grams)
    single = nblocks == 1
    if single.any():
        slens = lengths[single]
        for L in np.unique(slens):
            sel = np.flatnonzero(single & (lengths == L))
            if L == 0:
                out[sel] = md5_u64_fixed(np.empty((len(sel), 0), np.uint8), digest=digest)
                continue
            win = np.lib.stride_tricks.sliding_window_view(buf, int(L))
            out[sel] = md5_u64_fixed(win[offsets[sel]], digest=digest)
        if single.all():
            return out
    for nb in np.unique(nblocks[~single]):
        sel = np.flatnonzero(nblocks == nb)
        for s0 in range(0, len(sel), _LANE_CHUNK):
            sub = sel[s0 : s0 + _LANE_CHUNK]
            ls = lengths[sub]
            m = len(sub)
            padded = np.zeros((m, int(nb) * 64), dtype=np.uint8)
            # gather the message bytes: one fancy-index over flat positions
            maxlen = int(ls.max())
            if maxlen:
                cols = np.arange(maxlen)
                valid = cols[None, :] < ls[:, None]
                src = offsets[sub][:, None] + cols[None, :]
                padded[:, :maxlen][valid] = buf[src[valid]]
            padded[np.arange(m), ls] = 0x80
            padded[:, -8:] = (ls * 8).astype("<u8").view(np.uint8).reshape(m, 8)
            words = padded.view("<u4").reshape(m, int(nb), 16)
            a, b, c, d = (np.full(m, v, np.uint32) for v in _IV)
            F, T = np.empty(m, np.uint32), np.empty(m, np.uint32)
            for bi in range(int(nb)):
                _compress(words[:, bi, :], a, b, c, d, F, T)
            out[sub] = _digest_from_state(a, b, c, d) if digest else _u64_from_state(a, b)
    return out


def md5_u64_strs(strs: list[str], errors: str = "strict") -> np.ndarray:
    """md5(s.encode())[:8] big-endian as uint64 per string — the
    batched equivalent of dedup's scalar ``_h64``.  ``errors``:
    utf-8 error handler — the crawl hashes URLs with
    ``surrogatepass`` (urltools.hash64 parity)."""
    if not strs:
        return np.empty(0, np.uint64)
    parts = [s.encode("utf-8", errors) for s in strs]
    lengths = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    ends = np.cumsum(lengths)
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return md5_u64_concat(buf, ends - lengths, lengths)


def md5_digest_strs(strs: list[str], errors: str = "strict") -> np.ndarray:
    """Full md5 digests as an (N, 16) uint8 array — the batched
    equivalent of ``hashlib.md5(s.encode()).digest()`` per string
    (the crawl's page uuid, urltools.uuid_of parity)."""
    if not strs:
        return np.empty((0, 16), np.uint8)
    parts = [s.encode("utf-8", errors) for s in strs]
    lengths = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    ends = np.cumsum(lengths)
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return md5_u64_concat(buf, ends - lengths, lengths, digest=True)


def _arrow_bytes_view(arr):
    """(data uint8, offsets int64) views of an Arrow string array's
    underlying UTF-8 buffer — zero Python-object round trips.  Arrow
    strings are valid UTF-8 by construction, so hashing the buffer is
    bit-identical to hashing ``s.encode("utf-8")`` per value."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("md5 over Arrow buffers requires a null-free array")
    off_dtype = np.int64 if (pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], off_dtype)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs


def md5_u64_arrow(arr) -> np.ndarray:
    """md5(s)[:8] big-endian as uint64 per value of an Arrow string
    array, hashed directly off the array's UTF-8 buffer (no per-value
    encode/len Python calls — those cost ~3x the hashing itself)."""
    data, offs = _arrow_bytes_view(arr)
    return md5_u64_concat(data, offs[:-1], np.diff(offs))


def md5_digest_arrow(arr) -> np.ndarray:
    """Full (N, 16) uint8 md5 digests per value of an Arrow string
    array, off the array's UTF-8 buffer."""
    data, offs = _arrow_bytes_view(arr)
    return md5_u64_concat(data, offs[:-1], np.diff(offs), digest=True)
