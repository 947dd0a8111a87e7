"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the DECODE step is pluggable:
``decoder='fake'`` is a deterministic stand-in (seeded from the payload
bytes) that keeps every Spark-side contract real — schema, partitioning, UDF
signature, Arrow batch shape — while ``decoder='real'`` raises
``NotImplementedError`` until a codec (PIL/soundfile/av) is installed.

  attach_media_meta    sniff magic bytes -> (media_type, byte_len, sha256)
  decode_image_features   binary -> fixed-dim float feature vector
  resize_images           binary -> binary (deterministic fake resample)
  sample_frames           video binary -> N frame rows (explode pattern)
  audio_features          binary -> (duration_s, n_windows, mfcc-ish vector)
"""

from __future__ import annotations

import hashlib
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
    """Typed metadata for an opaque binary column — pure Column ops."""
    c = F.col(bin_col)
    media = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        hexpfx = magic.hex()
        media = F.when(F.hex(F.substring(c, 1, len(magic))) == hexpfx.upper(), F.lit(mtype)).otherwise(media)
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


def decode_image_features(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                          dim: int = 16, decoder: str = "fake") -> DataFrame:
    """binary -> ``array<float>`` feature vector via mapInPandas (Arrow
    batches; numpy kernel). 'real' decoder stub raises until a codec lib is
    installed — the Spark plumbing is identical either way."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "no image codec in this environment; install PIL and "
                    "replace _fake_pixels with Image.open(io.BytesIO(payload))"
                )
            feats = []
            for payload in pdf[bin_col]:
                px = _fake_pixels(bytes(payload), 32, 32).astype(np.float64)
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
    """binary -> resized binary (raw RGB bytes in the fake path)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("install PIL for real resampling")
            out = [
                _fake_pixels(bytes(p), height, width).tobytes() for p in pdf[bin_col]
            ]
            yield pd.DataFrame({"id": pdf[id_col], "resized": out,
                                "height": height, "width": width})

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema="id long, resized binary, height int, width int"
    )


def sample_frames(df: DataFrame, bin_col: str = "payload", id_col: str = "id",
                  n_frames: int = 4, decoder: str = "fake") -> DataFrame:
    """video binary -> N frame rows per video (the explode pattern: one input
    row fans out to n_frames output rows inside the Arrow kernel)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("install av/ffmpeg for real frame sampling")
            ids, fidx, frames = [], [], []
            for id_, payload in zip(pdf[id_col], pdf[bin_col]):
                for i in range(n_frames):
                    ids.append(id_)
                    fidx.append(i)
                    frames.append(_fake_pixels(bytes(payload) + bytes([i]), 16, 16).tobytes())
            yield pd.DataFrame({"id": ids, "frame_idx": fidx, "frame": frames})

    return df.select(id_col, bin_col).mapInPandas(
        _kernel, schema="id long, frame_idx int, frame binary"
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
