"""Golden varbyte vectors ported from the reference test suite
(lib/invertedindex/encode_decode_test.go:11-43) + round-trip and
delta-mode properties."""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from searty_spark.codec import (
    decode_posting_list,
    encode_posting_list,
    varbyte_decode,
    varbyte_encode,
)

GOLDEN = [
    (0, [0]),
    (1, [1]),
    (12, [12]),
    (127, [127]),
    (128, [129, 0]),
    (12345, [224, 57]),
    (12345678, [133, 241, 194, 78]),
]


@pytest.mark.parametrize("value,expected", GOLDEN)
def test_varbyte_golden(value, expected):
    got = varbyte_encode(np.array([value], dtype=np.uint64))
    assert list(got) == expected
    assert varbyte_decode(got).tolist() == [value]


def test_varbyte_stream_concat():
    vals = np.array([v for v, _ in GOLDEN], dtype=np.uint64)
    enc = varbyte_encode(vals)
    assert list(enc) == [b for _, bs in GOLDEN for b in bs]
    assert varbyte_decode(enc).tolist() == vals.tolist()


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_posting_list_roundtrip_reference_case():
    # ref encode_decode_test.go:59-83: docs (1,[10,20]), (2,[3,5,8])
    docs = np.array([1, 2], dtype=np.uint64)
    poss = [np.array([10, 20]), np.array([3, 5, 8])]
    for delta in (False, True):
        blob = encode_posting_list(docs, poss, delta=delta)
        d, p = decode_posting_list(blob, delta=delta)
        assert d.tolist() == [1, 2]
        assert [x.tolist() for x in p] == [[10, 20], [3, 5, 8]]


def test_posting_list_absolute_layout():
    # absolute (reference-compatible) layout: count, doc, npos, pos...
    blob = encode_posting_list(
        np.array([1, 2], dtype=np.uint64), [np.array([10, 20]), np.array([3, 5, 8])], delta=False
    )
    assert varbyte_decode(blob).tolist() == [2, 1, 2, 10, 20, 2, 3, 3, 5, 8]


def test_posting_list_delta_layout():
    blob = encode_posting_list(
        np.array([5, 9], dtype=np.uint64), [np.array([10, 20]), np.array([3, 5, 8])], delta=True
    )
    # docs: 5, 9-5=4; positions: 10, 20-10=10; 3, 5-3=2, 8-5=3
    assert varbyte_decode(blob).tolist() == [2, 5, 2, 10, 10, 4, 3, 3, 2, 3]


def test_corruption_check():
    with pytest.raises(ValueError):
        encode_posting_list(np.array([2, 1], dtype=np.uint64), [np.array([0]), np.array([0])])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.lists(st.integers(min_value=0, max_value=2**20), min_size=1, max_size=8),
        ),
        max_size=40,
    )
)
def test_posting_list_roundtrip_property(raw):
    seen, docs, poss = set(), [], []
    for d, ps in sorted(raw):
        if d in seen:
            continue
        seen.add(d)
        docs.append(d)
        poss.append(np.array(sorted(ps), dtype=np.uint64))
    docs = np.array(docs, dtype=np.uint64)
    for delta in (False, True):
        d2, p2 = decode_posting_list(encode_posting_list(docs, poss, delta=delta), delta=delta)
        assert d2.tolist() == docs.tolist()
        assert [x.tolist() for x in p2] == [x.tolist() for x in poss]
