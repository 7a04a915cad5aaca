"""byte315 norm quantization — golden values.

Hand-checkable against Lucene SmallFloat/BM25Similarity.NORM_TABLE semantics
(SURVEY.md §7.1 hazard 2): NORM_TABLE[b] = 1/byte315ToFloat(b)^2.
"""

import numpy as np

from elasticsearch_spark.functions.smallfloat import (
    byte315_to_float,
    effective_doc_length,
    float_to_byte315,
    quantized_length_ranges,
)


def test_roundtrip_idempotent():
    b = np.arange(1, 256, dtype=np.uint8)
    assert np.array_equal(float_to_byte315(byte315_to_float(b)), b)


def test_golden_effective_lengths():
    # dl=1 → 1.0 (exact); dl=3,4 share a bucket (4.0); powers of 2 regions
    got = effective_doc_length(np.array([1, 2, 3, 4, 5, 10, 50, 100, 1000]))
    expect = [1.0, 2.56, 4.0, 4.0, 5.224489795918367, 10.24, 64.0,
              113.77777777777777, 1024.0]
    assert np.allclose(got, expect, rtol=1e-12)


def test_quantization_monotone_and_lossy():
    dl = np.arange(1, 5000)
    eff = effective_doc_length(dl)
    assert (np.diff(eff) >= 0).all()  # monotone
    assert len(np.unique(eff)) < 64  # lossy: ≤256 codes, far fewer here
    assert (eff >= dl).any() and (eff != dl).any()


def test_no_quantize_passthrough():
    dl = np.array([7, 13, 999])
    assert np.array_equal(effective_doc_length(dl, quantize=False), dl.astype(float))


def test_ranges_cover_exactly():
    ranges = quantized_length_ranges(10000)
    # contiguous cover of [1, 10000]
    assert ranges[0][0] == 1 and ranges[-1][1] == 10000
    for (lo1, hi1, _), (lo2, _, _) in zip(ranges, ranges[1:]):
        assert lo2 == hi1 + 1
    # each range value matches pointwise computation
    for lo, hi, eff in ranges[:20]:
        assert effective_doc_length(np.array([lo]))[0] == eff
        assert effective_doc_length(np.array([hi]))[0] == eff
