"""Postings codec round-trip (FOR bitpack + delta), incl. property tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_spark.index.codec import (
    delta_decode,
    delta_encode,
    pack_f32,
    pack_u32,
    unpack_f32,
    unpack_u32,
)


def test_basic_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, 2, 127, 128, 129, 1000):
        docs = np.sort(rng.choice(1 << 20, size=n, replace=False)).astype(np.uint32)
        gaps = delta_encode(docs)
        assert np.array_equal(delta_decode(unpack_u32(pack_u32(gaps), n)), docs)


def test_zero_block():
    z = np.zeros(77, dtype=np.uint32)
    buf = pack_u32(z)
    assert len(buf) == 1
    assert np.array_equal(unpack_u32(buf, 77), z)


def test_f32_roundtrip():
    v = np.array([1.0, 2.56, 64.0, 113.7778], dtype=np.float32)
    assert np.array_equal(unpack_f32(pack_f32(v)), v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1), min_size=1, max_size=300)
)
def test_pack_u32_property(values):
    v = np.array(values, dtype=np.uint32)
    assert np.array_equal(unpack_u32(pack_u32(v), len(v)), v)


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=1 << 22), min_size=1, max_size=500)
)
def test_delta_property(doc_set):
    docs = np.array(sorted(doc_set), dtype=np.uint32)
    assert np.array_equal(delta_decode(delta_encode(docs)), docs)
