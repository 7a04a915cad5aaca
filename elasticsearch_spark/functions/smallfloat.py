"""Lucene SmallFloat byte315 codec, vectorized with numpy.

Reproduces Lucene 5's lossy 1-byte norm encoding used by BM25Similarity:
the index stores ``floatToByte315(1/sqrt(fieldLength))`` and the scorer
decodes it through a 256-entry table ``NORM_TABLE[b] = 1/(byte315ToFloat(b)^2)``
— i.e. the *effective* doc length seen by the score formula is a lossy
round-trip of the true token count.

Reference behavior (public Lucene 5.0 SmallFloat/BM25Similarity semantics, as
wired by /root/reference src/main/java/org/elasticsearch/index/similarity/
BM25SimilarityProvider.java): exact score parity requires reproducing this
round-trip, cf. SURVEY.md §7.1 hazard 2.

floatToByte315(f):  bits = floatToRawIntBits(f); smallfloat = bits >> 21;
                    clamp to [((63-15)<<3), ((63-15)<<3)+0x100) → byte
byte315ToFloat(b):  bits = (b&0xff) << 21; bits += (63-15) << 24 → float
"""

from __future__ import annotations

import numpy as np

_EXP_OFFSET = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized Lucene SmallFloat.floatToByte315. Input float32 array."""
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> (24 - 3)
    out = (smallfloat - _EXP_OFFSET).astype(np.int64)
    # underflow: zero or denormal-small → 0 for f<=0 else 1
    under = smallfloat <= _EXP_OFFSET
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow → 255
    out = np.where(smallfloat >= _EXP_OFFSET + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized Lucene SmallFloat.byte315ToFloat."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << (24 - 3)) + ((63 - 15) << 24)
    f = bits.view(np.float32).copy()
    f[b == 0] = 0.0
    return f


def norm_table() -> np.ndarray:
    """BM25Similarity.NORM_TABLE: byte → effective field length (float32).

    NORM_TABLE[0] is defined by Lucene as decode of byte 0 → 0; entry 0 is
    never produced for a non-empty doc (1/sqrt(dl) > 0).
    """
    decoded = byte315_to_float(np.arange(256, dtype=np.uint8))
    with np.errstate(divide="ignore"):
        table = 1.0 / (decoded.astype(np.float64) ** 2)
    table[0] = np.inf  # byte 0 = "no value"; never hit for real docs
    return table


_NORM_TABLE = norm_table()


def effective_doc_length(dl: np.ndarray, quantize: bool = True) -> np.ndarray:
    """Doc length as seen by the BM25 scorer: byte315 round-trip of 1/sqrt(dl).

    dl: int array of true token counts (>=0). Returns float64. dl==0 maps to
    effective length of byte encode(inf)→255 path; in practice empty docs
    score 0 for every term so the value is irrelevant, but keep it finite.
    """
    dl = np.asarray(dl)
    if not quantize:
        return dl.astype(np.float64)
    inv_sqrt = np.zeros(dl.shape, dtype=np.float32)
    nz = dl > 0
    inv_sqrt[nz] = (1.0 / np.sqrt(dl[nz].astype(np.float64))).astype(np.float32)
    codes = float_to_byte315(inv_sqrt)
    out = _NORM_TABLE[codes]
    out = np.where(dl > 0, out, 0.0)
    return out


def quantized_length_ranges(max_dl: int = 1 << 16) -> list[tuple[int, int, float]]:
    """Contiguous (lo, hi, dl_eff) ranges of the dl → effective-length map.

    Used to generate a ≤256-row lookup CTE so a SQL oracle (DuckDB) can
    reproduce the quantization exactly. Covers dl in [1, max_dl]; callers
    must ensure doc lengths stay below max_dl (asserted in the builder).
    """
    dl = np.arange(1, max_dl + 1, dtype=np.int64)
    eff = effective_doc_length(dl, quantize=True)
    ranges: list[tuple[int, int, float]] = []
    start = 0
    for i in range(1, len(dl) + 1):
        if i == len(dl) or eff[i] != eff[start]:
            ranges.append((int(dl[start]), int(dl[i - 1]), float(eff[start])))
            start = i
    return ranges
