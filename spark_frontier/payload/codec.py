"""Deterministic image codec + PSNR for the image+caption graft axis.

BASELINE.json input_hint mandates an input table
``(image_id, bytes:binary, w, h, fmt, caption, phash)`` with a per-row
invariant: decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats) and
caption equality.

STUB SEAM — this container has no PIL/libjpeg/libwebp, so real
PNG/JPEG/WebP codecs are replaced by a self-contained deterministic codec
with the same *shape*: "png" is lossless (zlib over raw RGB), "jpeg" and
"webp" are lossy (uniform quantization then zlib), so PSNR is a real
computation with real lossy error, not a mock. In production, swap
``encode_image``/``decode_image`` for PIL calls — every Spark-side
signature (binary in, HxWx3 uint8 out, Arrow batch transport) is unchanged.

All functions here run INSIDE Arrow UDF batches (payload/validate.py,
analytics/multimodal.py); nothing touches Python rows at the DataFrame
level, and encoded ``bytes`` never enter a shuffle — operators carry
``image_id`` and join the payload back late (SURVEY.md §7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"SFIM"
_LOSSY_STEP = 4  # quantization step → PSNR ≈ 10*log10(255²/ (step²/12)) ≈ 47 dB


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic HxWx3 uint8 pixels: gradients + seeded noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """fmt ∈ {png, jpeg, webp}. png lossless; jpeg/webp quantize (lossy)."""
    h, w, _ = pixels.shape
    if fmt == "png":
        payload, code = pixels.tobytes(), 0
    else:
        q = (pixels.astype(np.int16) // _LOSSY_STEP * _LOSSY_STEP
             + _LOSSY_STEP // 2).clip(0, 255).astype(np.uint8)
        payload, code = q.tobytes(), 1
    return MAGIC + struct.pack("<BHH", code, w, h) + zlib.compress(payload, 1)


def decode_image(data: bytes) -> np.ndarray:
    """binary -> HxWx3 uint8. Raises ValueError on bad magic (the
    validator's decode-failure branch)."""
    if data is None or len(data) < 9 or data[:4] != MAGIC:
        raise ValueError("not an SFIM payload")
    _, w, h = struct.unpack("<BHH", data[4:9])
    raw = zlib.decompress(data[9:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """Average-hash perceptual fingerprint: grayscale → 8x8 mean-pool →
    above-median bits → int64. Deterministic, comparable across encodes."""
    gray = pixels.astype(np.float64).mean(axis=-1)
    h, w = gray.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > np.median(blocks)).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64
