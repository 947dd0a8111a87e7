"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

The container has no third-party codecs (PIL/soundfile/av), so the DECODE
step is pluggable with two genuinely different backends:

* ``decoder='fake'`` — deterministic stand-in (seeded from the payload
  bytes) that keeps every Spark-side contract real — schema, partitioning,
  UDF signature, Arrow batch shape — and stays the twin the DuckDB oracle
  entries pin.
* ``decoder='real'`` — GENUINE stdlib-only decoding for the formats the
  standard library can express: RIFF/WAVE audio (``wave``), PNG images
  (``zlib`` + ``struct`` + numpy: all five scanline filters, color types
  0/2/3/4/6 at bit depth 8), and uncompressed RIFF/AVI video (BI_RGB 24-bit
  DIB frames). Compressed formats (jpeg/mp3/h264/...) still raise
  ``NotImplementedError`` with guidance until a codec lib is installed.

  attach_media_meta    sniff magic bytes -> (media_type, byte_len, sha256)
  decode_image_features   binary -> fixed-dim float feature vector
  resize_images           binary -> binary (raw RGB; real path resamples PNG)
  sample_frames           video binary -> N frame rows (explode pattern)
  audio_features          binary -> (duration_s, n_windows, mfcc-ish vector)
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]


def attach_media_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — pure Column ops. RIFF
    containers are disambiguated by their form type (bytes 9-12): WAVE ->
    audio/wav, 'AVI ' -> video/avi."""
    c = F.col(bin_col)
    media = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        hexpfx = magic.hex()
        media = F.when(F.hex(F.substring(c, 1, len(magic))) == hexpfx.upper(), F.lit(mtype)).otherwise(media)
    is_riff = F.hex(F.substring(c, 1, 4)) == b"RIFF".hex().upper()
    form = F.hex(F.substring(c, 9, 4))
    media = (
        F.when(is_riff & (form == b"AVI ".hex().upper()), F.lit("video/avi"))
        .when(is_riff, F.lit("audio/wav"))
        .otherwise(media)
    )
    return (
        df.withColumn("media_type", media)
        .withColumn("byte_len", F.length(c).cast("long"))
        .withColumn("payload_sha256", F.sha2(c, 256))
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pixels seeded from the payload hash (stable across
    partitions/retries)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering (spec §6: None/Sub/Up/Average/Paeth).
    Up is vectorized row-wise; Sub vectorizes as a per-lane cumulative sum
    mod 256 (mod distributes over addition). Average/Paeth carry a serial
    dependency on the already-reconstructed left pixel so they loop per
    byte — fine for the small-image regime this runs at."""
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        cur = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            cur = (cur.reshape(-1, bpp).cumsum(axis=0) & 0xFF).ravel()
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {f}")
        prev = cur
        out[y] = cur.astype(np.uint8)
    return out


def _decode_png(b: bytes) -> np.ndarray:
    """REAL decode of a PNG payload with stdlib ``zlib`` + ``struct`` only:
    returns (h, w, 3) uint8 RGB. Supports bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced; alpha is
    dropped. 16-bit and Adam7-interlaced images raise NotImplementedError."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat: list[bytes] = []
    plte = None
    hdr = None
    while pos + 8 <= len(b):
        ln, typ = struct.unpack(">I4s", b[pos:pos + 8])
        pos += 8
        data = b[pos:pos + ln]
        if len(data) < ln:
            raise ValueError("corrupt PNG: truncated chunk")
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = hdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit depth {depth} / interlace {interlace} unsupported by the "
            "stdlib decoder; install PIL for the full format")
    try:
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"corrupt PNG: color type {ctype}") from None
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: wrong decompressed size")
    px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        return plte[px[..., 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # RGB / RGBA


def _nn_resample(px: np.ndarray, h: int, w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (h, w, 3)."""
    yi = (np.arange(h) * px.shape[0]) // h
    xi = (np.arange(w) * px.shape[1]) // w
    return px[yi][:, xi]


def _riff_chunks(b: bytes, pos: int, end: int):
    """Iterate (fourcc, payload_start, size) over a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc, size = struct.unpack("<4sI", b[pos:pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def _decode_avi_frames(b: bytes) -> list[np.ndarray]:
    """REAL decode of an uncompressed RIFF/AVI payload with stdlib ``struct``
    only: returns the video stream's frames as (h, w, 3) uint8 RGB arrays.
    Supports BI_RGB 24-bit DIB frames ('##db' chunks); compressed codecs
    raise NotImplementedError."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height
        for fourcc, dpos, size in _riff_chunks(b, pos, end):
            if fourcc == b"LIST":
                walk(dpos + 4, dpos + size)  # skip the 4-byte list type
            elif fourcc == b"strf" and width is None and size >= 16:
                # BITMAPINFOHEADER: biSize, biWidth, biHeight, biPlanes,
                # biBitCount, biCompression, ...
                _, bw, bh, _, bits = struct.unpack("<iiihh", b[dpos:dpos + 16])
                comp = struct.unpack("<I", b[dpos + 16:dpos + 20])[0] if size >= 20 else 0
                if comp != 0 or bits != 24:
                    raise NotImplementedError(
                        f"AVI codec {comp}/bits {bits} unsupported by the stdlib "
                        "decoder (BI_RGB 24-bit only); install av/ffmpeg")
                width, height = bw, bh
            elif fourcc[2:4] == b"db":  # ##db: uncompressed DIB frame
                frames.append(b[dpos:dpos + size])
            elif fourcc[2:4] == b"dc":
                raise NotImplementedError(
                    "compressed AVI frames ('##dc') unsupported by the stdlib "
                    "decoder; install av/ffmpeg")

    walk(12, len(b))
    if width is None or not frames:
        raise ValueError("corrupt AVI: no video stream format / frames")
    h = abs(height)
    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    out = []
    for fb in frames:
        arr = np.frombuffer(fb, np.uint8)
        if arr.size < h * stride:
            raise ValueError("corrupt AVI: short frame")
        px = arr[: h * stride].reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
        if height > 0:  # positive biHeight = bottom-up rows
            px = px[::-1]
        out.append(px[:, :, ::-1].copy())  # BGR -> RGB
    return out


def decode_image_features(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                          dim: int = 16, decoder: str = "fake") -> DataFrame:
    """binary -> ``array<float>`` feature vector via mapInPandas (Arrow
    batches; numpy kernel). ``decoder='real'`` GENUINELY decodes PNG payloads
    (stdlib zlib+struct — no codec lib required); jpeg/gif still raise until
    a codec lib is installed. The pooling kernel (channel mean/std/percentile
    -> dim) is shared by both paths, so the fake twin pins its semantics."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[bin_col]:
                b = bytes(payload)
                if decoder == "real":
                    if not b.startswith(_PNG_SIG):
                        raise NotImplementedError(
                            "real image decode supports PNG payloads only in "
                            "this environment (no image codec lib); install "
                            "PIL for jpeg/gif")
                    px = _decode_png(b).astype(np.float64)
                else:
                    px = _fake_pixels(b, 32, 32).astype(np.float64)
                # channel-wise mean/std pooled into a fixed-dim vector
                pooled = np.concatenate([
                    px.mean(axis=(0, 1)), px.std(axis=(0, 1)),
                    np.percentile(px, [10, 50, 90], axis=(0, 1)).ravel(),
                ])
                v = np.resize(pooled, dim).astype(np.float32)
                feats.append(v)
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema=f"id long, features array<float>"
    )


def resize_images(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                  height: int = 64, width: int = 64, decoder: str = "fake") -> DataFrame:
    """binary -> resized binary (raw top-down RGB bytes, both paths).
    ``decoder='real'`` decodes PNG genuinely and resamples nearest-neighbor
    (deterministic); non-PNG raises until a codec lib is installed."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[bin_col]:
                b = bytes(p)
                if decoder == "real":
                    if not b.startswith(_PNG_SIG):
                        raise NotImplementedError(
                            "real resize supports PNG payloads only in this "
                            "environment; install PIL for other formats")
                    out.append(_nn_resample(_decode_png(b), height, width)
                               .astype(np.uint8).tobytes())
                else:
                    out.append(_fake_pixels(b, height, width).tobytes())
            yield pd.DataFrame({"id": pdf[id_col], "resized": out,
                                "height": height, "width": width})

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema="id long, resized binary, height int, width int"
    )


def sample_frames(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                  n_frames: int = 4, decoder: str = "fake") -> DataFrame:
    """video binary -> N frame rows per video (the explode pattern: one input
    row fans out to n_frames output rows inside the Arrow kernel).
    ``decoder='real'`` GENUINELY parses uncompressed RIFF/AVI payloads
    (stdlib struct; BI_RGB 24-bit DIB frames) and samples ``n_frames``
    evenly-spaced frames (fewer rows if the video is shorter); compressed
    codecs raise until av/ffmpeg is installed. Frames are raw top-down RGB
    bytes with height/width columns in both paths."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, frames, hs, ws = [], [], [], [], []
            for id_, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                if decoder == "real":
                    all_frames = _decode_avi_frames(b)
                    take = min(n_frames, len(all_frames))
                    picks = [(i * len(all_frames)) // take for i in range(take)]
                    for i, fi in enumerate(picks):
                        px = all_frames[fi]
                        ids.append(id_)
                        fidx.append(i)
                        frames.append(px.tobytes())
                        hs.append(px.shape[0])
                        ws.append(px.shape[1])
                else:
                    for i in range(n_frames):
                        ids.append(id_)
                        fidx.append(i)
                        frames.append(_fake_pixels(b + bytes([i]), 16, 16).tobytes())
                        hs.append(16)
                        ws.append(16)
            yield pd.DataFrame({"id": ids, "frame_idx": fidx, "frame": frames,
                                "height": hs, "width": ws})

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema="id long, frame_idx int, frame binary, height int, width int"
    )


def _decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a RIFF/WAVE payload with the stdlib ``wave`` module:
    returns (mono float64 samples in [-1, 1], sample_rate). PCM 8/16/32-bit;
    multi-channel is averaged to mono. No third-party codec needed."""
    import io
    import wave

    with wave.open(io.BytesIO(b)) as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 1:  # unsigned 8-bit
        sig = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        sig = (sig - 128.0) / 128.0
    elif width == 2:
        sig = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        sig = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if nch > 1:
        sig = sig[: (sig.size // nch) * nch].reshape(-1, nch).mean(axis=1)
    return sig, rate


def audio_features(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                   n_coeffs: int = 8, decoder: str = "fake",
                   window: int = 512) -> DataFrame:
    """binary -> (duration_s, n_windows, coeffs). ``decoder='real'`` GENUINELY
    decodes RIFF/WAVE payloads (stdlib ``wave`` + numpy — no codec lib
    required): duration from the header, Hann-windowed rFFT magnitude
    spectrum averaged over windows, first ``n_coeffs`` log-magnitude bins as
    the feature vector. Compressed formats (mp3/ogg/...) still raise until a
    codec lib is installed; the fake path stays the deterministic
    schema-identical twin used by the oracle tests."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(window) / window)
        for pdf in batches:
            rows = {"id": [], "duration_s": [], "n_windows": [], "coeffs": []}
            for id_, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                if decoder == "real":
                    if not b.startswith(b"RIFF"):
                        raise NotImplementedError(
                            "real audio decode supports WAV (RIFF) payloads "
                            "only in this environment; install soundfile/av "
                            "for compressed formats")
                    sig, rate = _decode_wav(b)
                    dur = round(sig.size / float(rate), 4)
                    if sig.size < window:
                        # sub-window (incl. zero-frame) payloads: zero-pad to
                        # one full analysis window instead of letting reshape
                        # blow up on a short tail
                        sig = np.pad(sig, (0, window - sig.size))
                    nw = max(1, sig.size // window)
                    frames = sig[: nw * window].reshape(nw, window) * hann
                    mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
                    co = np.log1p(mag[:n_coeffs]).astype(np.float32)
                    if co.size < n_coeffs:
                        co = np.pad(co, (0, n_coeffs - co.size))
                else:
                    dur = round(len(b) / 16000.0, 4)
                    sig8 = np.frombuffer(hashlib.sha256(b).digest(),
                                         dtype=np.uint8).astype(np.float64)
                    nw = max(1, len(b) // window)
                    co = np.resize(sig8, n_coeffs).astype(np.float32)
                rows["id"].append(id_)
                rows["duration_s"].append(dur)
                rows["n_windows"].append(nw)
                rows["coeffs"].append(co)
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema="id long, duration_s double, n_windows long, coeffs array<float>"
    )
