"""Round-trip tests for the stdlib-only REAL image/video decoders
(``decoder='real'`` in operators/multimodal.py).

The encoders here are test-side: a minimal PNG writer (stdlib zlib/struct,
per-row filter type chosen by the test so all five filter reversals are
exercised) and a minimal uncompressed-AVI writer (RIFF + BI_RGB 24-bit DIB
frames). Encoding with filter f and asserting pixel equality after decode
verifies the decoder inverts the spec'd forward filters exactly.
"""

import struct
import zlib

import numpy as np
import pytest

from pyterrier_pisa_spark.operators.multimodal import (
    _decode_avi_frames,
    _decode_png,
    attach_media_meta,
    decode_image_features,
    resize_images,
    sample_frames,
)


# ---------- test-side encoders ----------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(cur: np.ndarray, prev: np.ndarray, f: int, bpp: int) -> bytes:
    """Forward PNG filter per the spec — the inverse of what the decoder does."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.empty_like(cur)
    for i in range(cur.size):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (cur[i] - pred) & 0xFF
    return out.astype(np.uint8).tobytes()


def encode_png(px: np.ndarray, ctype: int, filters=None,
               palette: np.ndarray | None = None) -> bytes:
    """Minimal PNG writer: bit depth 8, no interlace. ``px`` is (h, w) for
    ctype 0/3, (h, w, ch) otherwise; ``filters`` is a per-row filter-type
    list (default all 0)."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    h, w = px.shape[0], px.shape[1]
    flat = px.reshape(h, w * ch).astype(np.uint8)
    filters = filters or [0] * h
    prev = np.zeros(w * ch, dtype=np.uint8)
    raw = b""
    for y in range(h):
        raw += bytes([filters[y]]) + _filter_row(flat[y], prev, filters[y], ch)
        prev = flat[y]
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if ctype == 3:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return out


def encode_avi(frames: list[np.ndarray], bottom_up: bool = True) -> bytes:
    """Minimal uncompressed AVI: LIST hdrl (avih + strl/strf BITMAPINFOHEADER,
    BI_RGB 24-bit) + LIST movi with one '00db' DIB chunk per frame."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    bih = struct.pack("<iiihhIIiiII", 40, w, h if bottom_up else -h, 1, 24,
                      0, stride * h, 0, 0, 0, 0)
    avih = struct.pack("<IIIIIIIIIIIIII", 33333, 0, 0, 0, len(frames), 0, 1,
                       stride * h, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + b"\x00" * 48

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(typ: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", typ + body)

    movi_body = b""
    for px in frames:
        rows = px[::-1] if bottom_up else px  # store bottom-up like real DIBs
        dib = b""
        for row in rows:
            line = row[:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
            dib += line + b"\x00" * (stride - len(line))
        movi_body += chunk(b"00db", dib)

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bih)))
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rng_px(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------- PNG decoder unit tests ----------

@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_each_filter_roundtrip(f):
    px = _rng_px(9, 7, 3, seed=f)
    got = _decode_png(encode_png(px, ctype=2, filters=[f] * 9))
    np.testing.assert_array_equal(got, px)


def test_png_mixed_filters_roundtrip():
    px = _rng_px(10, 13, 3, seed=42)
    got = _decode_png(encode_png(px, ctype=2, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    np.testing.assert_array_equal(got, px)


def test_png_grayscale_expands_to_rgb():
    px = _rng_px(5, 6, 1, seed=1)
    got = _decode_png(encode_png(px, ctype=0, filters=[4] * 5))
    np.testing.assert_array_equal(got, np.repeat(px[..., None], 3, axis=2))


def test_png_palette():
    palette = _rng_px(16, 3, 1, seed=2).reshape(16, 3)
    idx = (_rng_px(6, 6, 1, seed=3) % 16).astype(np.uint8)
    got = _decode_png(encode_png(idx, ctype=3, filters=[1] * 6, palette=palette))
    np.testing.assert_array_equal(got, palette[idx])


def test_png_rgba_drops_alpha():
    px = _rng_px(4, 5, 4, seed=4)
    got = _decode_png(encode_png(px, ctype=6, filters=[2] * 4))
    np.testing.assert_array_equal(got, px[..., :3])


def test_png_16bit_raises_not_implemented():
    px = _rng_px(3, 3, 3, seed=5)
    b = encode_png(px, ctype=2)
    # patch the IHDR bit depth byte (offset: 8 sig + 8 len/typ + 8 w/h)
    b = b[:24] + bytes([16]) + b[25:]
    with pytest.raises(NotImplementedError, match="bit depth"):
        _decode_png(b)


# ---------- AVI decoder unit tests ----------

@pytest.mark.parametrize("bottom_up", [True, False])
def test_avi_frames_roundtrip(bottom_up):
    frames = [_rng_px(6, 5, 3, seed=10 + i) for i in range(4)]
    got = _decode_avi_frames(encode_avi(frames, bottom_up=bottom_up))
    assert len(got) == 4
    for g, e in zip(got, frames):
        np.testing.assert_array_equal(g, e)


def test_avi_compressed_raises():
    frames = [_rng_px(4, 4, 3, seed=0)]
    b = encode_avi(frames)
    b = b.replace(b"00db", b"00dc")
    with pytest.raises(NotImplementedError, match="compressed AVI"):
        _decode_avi_frames(b)


# ---------- Spark-side real paths ----------

def test_real_image_features_and_resize_spark(spark):
    px0 = _rng_px(12, 8, 3, seed=20)
    px1 = _rng_px(7, 9, 3, seed=21)
    df = spark.createDataFrame(
        [(0, encode_png(px0, 2, filters=[4] * 12)), (1, encode_png(px1, 2))],
        schema="id long, payload binary")

    feats = {r["id"]: np.array(r["features"])
             for r in decode_image_features(df, dim=15, decoder="real").collect()}
    for rid, px in ((0, px0), (1, px1)):
        p = px.astype(np.float64)
        exp = np.concatenate([
            p.mean(axis=(0, 1)), p.std(axis=(0, 1)),
            np.percentile(p, [10, 50, 90], axis=(0, 1)).ravel(),
        ]).astype(np.float32)
        np.testing.assert_allclose(feats[rid], exp, rtol=1e-6)

    rs = {r["id"]: r for r in
          resize_images(df, height=4, width=4, decoder="real").collect()}
    for rid, px in ((0, px0), (1, px1)):
        got = np.frombuffer(bytes(rs[rid]["resized"]), np.uint8).reshape(4, 4, 3)
        yi = (np.arange(4) * px.shape[0]) // 4
        xi = (np.arange(4) * px.shape[1]) // 4
        np.testing.assert_array_equal(got, px[yi][:, xi])


def test_real_sample_frames_spark(spark):
    frames = [_rng_px(5, 4, 3, seed=30 + i) for i in range(6)]
    df = spark.createDataFrame([(7, encode_avi(frames))],
                               schema="id long, payload binary")
    rows = sorted(sample_frames(df, n_frames=3, decoder="real").collect(),
                  key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    # evenly spaced picks over 6 frames: indices 0, 2, 4
    for r, fi in zip(rows, (0, 2, 4)):
        got = np.frombuffer(bytes(r["frame"]), np.uint8).reshape(
            r["height"], r["width"], 3)
        np.testing.assert_array_equal(got, frames[fi])


def test_avi_media_type_sniffed(spark):
    df = spark.createDataFrame(
        [(0, encode_avi([_rng_px(4, 4, 3, seed=1)])),
         (1, b"RIFF\x08\x00\x00\x00WAVEdata")],
        schema="id long, payload binary")
    out = {r["id"]: r["media_type"] for r in attach_media_meta(df).collect()}
    assert out[0] == "video/avi"
    assert out[1] == "audio/wav"
