"""Postings block codec — numpy-vectorized FOR bitpacking.

The reference delegates postings compression to Lucene50PostingsFormat
(/root/reference/src/main/java/org/elasticsearch/index/codec/postingsformat/
Elasticsearch090PostingsFormat.java:42-54): docID deltas + term frequencies in
FOR-compressed blocks of 128 with per-block skip data. We reproduce the same
layout idea — per (term, block): delta-gap docIDs bit-packed at the block's
minimal bit width, tfs likewise, plus block-max metadata (max_tf, min
effective doc length) used by block-max WAND pruning at query time.

All pack/unpack paths are pure numpy (unpackbits/packbits) — no Python loops
over values.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene50 FOR block size


def pack_u32(values: np.ndarray) -> bytes:
    """Bit-pack a uint32 array at its minimal bit width.

    Layout: 1 byte bit-width w (0..32), then ceil(n*w/8) bytes of the
    big-endian bit stream. n is NOT stored (callers know block sizes).
    w=0 encodes an all-zeros block in 1 byte.
    """
    v = np.ascontiguousarray(values, dtype=np.uint32)
    if v.size == 0:
        return b"\x00"
    maxv = int(v.max())
    w = int(maxv).bit_length()
    if w == 0:
        return b"\x00"
    # view each uint32 as 4 big-endian bytes -> 32 bits -> keep low w bits
    as_bytes = v.astype(">u4").view(np.uint8).reshape(-1, 4)
    bits = np.unpackbits(as_bytes, axis=1)[:, 32 - w :]
    packed = np.packbits(bits.ravel())
    return bytes([w]) + packed.tobytes()


def unpack_u32(buf: bytes, n: int) -> np.ndarray:
    """Inverse of pack_u32 for a block of n values."""
    w = buf[0]
    if w == 0:
        return np.zeros(n, dtype=np.uint32)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=1), count=n * w)
    bits = bits.reshape(n, w)
    pad = np.zeros((n, 32 - w), dtype=np.uint8)
    full = np.concatenate([pad, bits], axis=1)
    return np.packbits(full, axis=1).view(">u4").ravel().astype(np.uint32)


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Ascending local doc ids -> gaps (first value kept absolute)."""
    d = np.asarray(doc_ids, dtype=np.uint32)
    out = np.empty_like(d)
    out[0] = d[0]
    np.subtract(d[1:], d[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64)).astype(np.uint32)


def pack_f32(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f4").tobytes()


def unpack_f32(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<f4")
