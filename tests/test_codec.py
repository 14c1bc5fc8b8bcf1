import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from seekr_ray.codec import (
    decode_doc_ids,
    decode_position_lists,
    encode_doc_ids,
    encode_position_lists,
    pack_f64,
    unpack_f64,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_single():
    for v in [0, 1, 127, 128, 16383, 16384, 2**32, 2**63 - 1, 2**64 - 1]:
        arr = np.array([v], dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(arr)).tolist() == [v]


def test_varbyte_large_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 2**62, size=1_000_000, dtype=np.uint64)
    buf = varbyte_encode(arr)
    out = varbyte_decode(buf, count=arr.size)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varbyte_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_doc_ids_roundtrip():
    ids = np.array([0, 1, 5, 1000, 2**40 + 3, 2**40 + 4], dtype=np.uint64)
    np.testing.assert_array_equal(decode_doc_ids(encode_doc_ids(ids), 6), ids)
    assert decode_doc_ids(encode_doc_ids(np.empty(0, dtype=np.uint64))).size == 0


def test_position_lists_roundtrip():
    lists = [[0, 3, 7], [], [1], [0, 1, 2, 3, 100], []]
    lens_enc, vals_enc = encode_position_lists(lists)
    out = decode_position_lists(lens_enc, vals_enc)
    assert len(out) == len(lists)
    for got, want in zip(out, lists):
        assert got.tolist() == want


def test_position_lists_all_empty():
    lens_enc, vals_enc = encode_position_lists([[], []])
    out = decode_position_lists(lens_enc, vals_enc)
    assert [o.tolist() for o in out] == [[], []]


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), max_size=30).map(
            lambda l: sorted(set(l))
        ),
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_position_lists_property(lists):
    lens_enc, vals_enc = encode_position_lists(lists)
    out = decode_position_lists(lens_enc, vals_enc)
    assert [o.tolist() for o in out] == lists


def test_pack_f64_bit_exact():
    vals = np.array([0.1 + 0.2, 1e-300, np.pi, 0.0, -1.5])
    out = unpack_f64(pack_f64(vals))
    np.testing.assert_array_equal(out, vals)


def test_varbyte_count_mismatch_raises():
    buf = varbyte_encode(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(ValueError):
        varbyte_decode(buf, count=2)
