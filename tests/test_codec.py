"""Varint + delta-gap codec roundtrip properties (SURVEY.md §5 strategy (a))."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pyterrier_pisa_spark.operators.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    back = varint_decode(varint_encode(arr))
    assert back.tolist() == [v for v in values]


def test_varint_known_bytes():
    # LEB128 single-byte / multi-byte boundaries
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert varint_decode(b"\xac\x02").tolist() == [300]
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").tolist() == []


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=200, unique=True)
)
def test_delta_roundtrip(docids):
    d = np.sort(np.array(docids, dtype=np.int64))
    assert delta_decode(delta_encode(d)).tolist() == d.tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=0,
        max_size=128,
    )
)
def test_block_roundtrip(postings):
    seen = {}
    for d, t in postings:
        seen[d] = t
    docids = np.array(sorted(seen), dtype=np.int64)
    tfs = np.array([seen[d] for d in sorted(seen)], dtype=np.int64)
    db, tb = encode_block(docids, tfs)
    d2, t2 = decode_block(db, tb, len(docids))
    assert d2.tolist() == docids.tolist()
    assert t2.tolist() == tfs.tolist()


def test_compression_actually_compresses():
    # dense ascending docids -> gaps of 1 -> 1 byte each
    docids = np.arange(10_000, dtype=np.int64) * 3 + 7
    tfs = np.ones(10_000, dtype=np.int64)
    db, tb = encode_block(docids, tfs)
    assert len(db) < 10_050  # ~1 byte per gap (gap=3)
    assert len(tb) == 10_000


def test_bytepack_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyterrier_pisa_spark.operators.codec import bytepack_decode, bytepack_encode

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
    def roundtrip(vals):
        a = np.array(vals, dtype=np.uint64)
        assert (bytepack_decode(bytepack_encode(a), len(a)) == a).all()

    roundtrip()


def test_codec_registry():
    import pytest as _pytest

    from pyterrier_pisa_spark.operators.codec import ENCODINGS, get_codec

    assert set(ENCODINGS) == {"varint", "bytepack", "bitpack"}
    assert get_codec(None).name == "varint"
    with _pytest.raises(ValueError, match="unknown index encoding"):
        get_codec("simd9000")


def test_decode_segments_roundtrip_both_codecs():
    """Segment-batched decode (the kernels' read path) must reproduce the
    per-block decode exactly for every registered codec, including empty and
    single-value blocks."""
    import numpy as np

    from pyterrier_pisa_spark.operators.codec import ENCODINGS, delta_decode_segments

    rng = np.random.default_rng(3)
    blocks = [rng.integers(0, 1 << 20, size=n).astype(np.uint64)
              for n in (1, 128, 7, 300, 1)]
    counts = np.array([len(b) for b in blocks], dtype=np.int64)
    for name, codec in ENCODINGS.items():
        bufs = [codec.encode(b) for b in blocks]
        got = codec.decode_segments(bufs, counts)
        np.testing.assert_array_equal(got, np.concatenate(blocks), err_msg=name)

    # per-segment cumsum == per-block cumsum
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    flat = np.concatenate(blocks).astype(np.int64)
    seg = delta_decode_segments(flat, starts)
    exp = np.concatenate([np.cumsum(b.astype(np.int64)) for b in blocks])
    np.testing.assert_array_equal(seg, exp)


def test_bitpack_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyterrier_pisa_spark.operators.codec import bitpack_decode, bitpack_encode

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
    def roundtrip(vals):
        a = np.array(vals, dtype=np.uint64)
        assert (bitpack_decode(bitpack_encode(a), len(a)) == a).all()

    roundtrip()


def test_bitpack_density():
    """Per-block bit width: 128 gaps of max 7 pack at 3 bits/value (+1 header
    byte), denser than both varint (1 B/value) and bytepack."""
    import numpy as np

    from pyterrier_pisa_spark.operators.codec import (bitpack_encode,
                                                      bytepack_encode,
                                                      varint_encode)

    gaps = np.full(128, 7, dtype=np.uint64)
    bp = bitpack_encode(gaps)
    assert len(bp) == 1 + (128 * 3 + 7) // 8  # 49 bytes
    assert len(bp) < len(varint_encode(gaps)) < len(bytepack_encode(gaps)) + 1
    # width-0 stream (all zeros)
    z = np.zeros(50, dtype=np.uint64)
    from pyterrier_pisa_spark.operators.codec import bitpack_decode
    assert (bitpack_decode(bitpack_encode(z), 50) == z).all()
