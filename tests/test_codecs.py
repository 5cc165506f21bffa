"""Varbyte / delta-gap codec tests: round-trip, byte-layout vectors matching the
reference convention (MSB on the LAST byte of each integer,
``HW2/engine/listio.py:246-256``), and hypothesis property tests."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from web_search_engine_ray.functions import codecs


def ref_vb_encode(values):
    """Reference-semantics scalar varbyte encoder (transliterated contract of
    HW2/engine/listio.py:244-256 — written fresh, used only as a test oracle)."""
    out = bytearray()
    for x in values:
        assert x >= 0
        while True:
            b = x & 0x7F
            x >>= 7
            if x == 0:
                out.append(b | 0x80)
                break
            out.append(b)
    return bytes(out)


def test_known_vectors():
    # 0 -> 0x80; 1 -> 0x81; 127 -> 0xFF; 128 -> 0x00 0x81 ; 300 -> 0x2C 0x82
    assert codecs.vb_encode(np.array([0], dtype=np.uint64)) == b"\x80"
    assert codecs.vb_encode(np.array([1], dtype=np.uint64)) == b"\x81"
    assert codecs.vb_encode(np.array([127], dtype=np.uint64)) == b"\xff"
    assert codecs.vb_encode(np.array([128], dtype=np.uint64)) == b"\x00\x81"
    assert codecs.vb_encode(np.array([300], dtype=np.uint64)) == b"\x2c\x82"


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_vb_matches_reference_layout(values):
    enc = codecs.vb_encode(np.array(values, dtype=np.uint64))
    assert enc == ref_vb_encode(list(values))
    dec = codecs.vb_decode(enc)
    assert dec.tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(gaps, base_extra):
    docids = np.cumsum(np.array(gaps, dtype=np.uint64)) + np.uint64(base_extra)
    base = int(base_extra)
    enc = codecs.encode_docids(docids, base)
    dec = codecs.decode_docids(enc, base)
    assert dec.tolist() == docids.tolist()


def test_delta_rejects_nonmonotonic():
    with pytest.raises(ValueError):
        codecs.delta_encode(np.array([5, 3], dtype=np.uint64), 0)
    with pytest.raises(ValueError):
        codecs.delta_encode(np.array([5], dtype=np.uint64), 9)


def test_vb_sizes():
    vals = np.array([0, 127, 128, 2**14 - 1, 2**14, 2**63], dtype=np.uint64)
    sizes = codecs.vb_sizes(vals)
    enc_lens = [len(codecs.vb_encode(vals[i : i + 1])) for i in range(vals.size)]
    assert sizes.tolist() == enc_lens


def test_empty():
    assert codecs.vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert codecs.vb_decode(b"").size == 0
