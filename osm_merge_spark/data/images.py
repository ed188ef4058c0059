"""Deterministic image payload codec — stdlib-only (zlib), no PIL.

The input contract (BASELINE.json input_hint) is an Iceberg-style table of
image+caption pairs: (image_id, bytes, w, h, fmt, caption, phash). This
module provides a real, deterministic codec so the per-row invariant
"decoded-pixel PSNR ≥ 40 dB" is *actually computed*, not faked:

  - fmt='png'  — real RFC-2083 PNG (8-bit RGB, filter 0), encoded/decoded
                 with zlib + struct. Lossless → PSNR = ∞.
  - fmt='qnt'  — toy lossy codec: RGB quantized to step 6 then
                 zlib-compressed. MSE = (6²-1)/12 ≈ 2.9 → PSNR ≈ 43 dB,
                 exercising the ≥40 dB tolerance path the way JPEG would.

Pixels are derived deterministically from a 64-bit seed (splitmix-style),
so any row can be re-synthesized independently on any executor — no state,
no files, embarrassingly parallel at 10^12 rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QNT_STEP = 6  # lossy quantization step; PSNR ≈ 10*log10(255^2/ (step^2-1)/12) ≈ 43 dB


def _splitmix(seed: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — deterministic uint64 stream."""
    z = (seed + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def pixels_for_seed(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixel block for a row seed."""
    n = w * h * 3
    words = _splitmix(np.arange(n // 8 + 1, dtype=np.uint64) + np.uint64(seed * 2654435761 + 1))
    return words.view(np.uint8)[:n].reshape(h, w, 3).copy()


# -- PNG (lossless) ----------------------------------------------------------
def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.concatenate([np.zeros((h, 1), np.uint8), px.reshape(h, w * 3)], axis=1)]
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    assert buf[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(buf):
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", payload[:8])
            assert payload[8] == 8 and payload[9] == 2, "only 8-bit RGB"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "only filter-0 scanlines supported"
    return raw[:, 1:].reshape(h, w, 3).copy()


# -- QNT (toy lossy) ---------------------------------------------------------
def encode_qnt(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = (px.astype(np.int32) // QNT_STEP).astype(np.uint8)
    return struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qnt(buf: bytes) -> np.ndarray:
    w, h = struct.unpack(">II", buf[:8])
    q = np.frombuffer(zlib.decompress(buf[8:]), np.uint8).reshape(h, w, 3)
    # dequantize to bin centers (clipped) — bounded error |e| <= step/2
    return np.clip(q.astype(np.int32) * QNT_STEP + QNT_STEP // 2, 0, 255).astype(np.uint8)


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(px)
    if fmt == "qnt":
        return encode_qnt(px)
    raise NotImplementedError(f"fmt={fmt!r}: real JPEG needs an image lib not in this env")


def decode(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "qnt":
        return decode_qnt(buf)
    raise NotImplementedError(f"fmt={fmt!r}")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
