"""Varbyte/delta codec round-trip properties (SURVEY §7.2 stage 2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gazetteer_search_spark.index import codec


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    buf = codec.varbyte_encode(arr)
    out = codec.varbyte_decode(buf, len(values))
    assert np.array_equal(out, arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500),
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(values):
    ids = np.unique(np.array(values, dtype=np.int64))
    base = int(ids[0])
    buf = codec.delta_varbyte_encode(ids, base)
    out = codec.delta_varbyte_decode(buf, len(ids), base)
    assert np.array_equal(out, ids)


def test_single_byte_values_compact():
    arr = np.arange(100, dtype=np.int64)
    assert len(codec.varbyte_encode(arr)) == 100  # all < 128 -> 1 byte each


def test_delta_compression_wins():
    # dense sorted ids: deltas are tiny -> ~1 byte per id vs 8 raw
    ids = np.arange(10_000, dtype=np.int64) * 3 + 1_000_000_000
    buf = codec.delta_varbyte_encode(ids, int(ids[0]))
    assert len(buf) < 10_000 * 2


def test_f64_roundtrip():
    vals = np.array([0.0, 1.5, -2.25, 1e300], dtype=np.float64)
    assert np.array_equal(codec.f64_decode(codec.f64_encode(vals), 4), vals)
