"""Image codec + validation math (pure numpy; no image libraries).

The north rule's per-row invariant: decoded pixels must match the
originals — bit-exact for lossless formats, PSNR ≥ 40 dB for lossy —
plus exact caption equality and phash equality (BASELINE.json
input_hint). The reference's file path is opaque byte pass-through
(``app/spider/context.go:247-284``, ``output_file.go:20-71``); the
decode/validate stage is a north-rule extension.

This container has no Pillow/libjpeg, so:

* **PNG** is implemented here from the public spec (RGB8, filter
  types 0-4) with zlib — deterministic, lossless, round-trips bit-exact.
* **JPEG** decode is gated behind a Pillow import-try and raises
  ``NotImplementedError`` when absent; fixtures emit jpeg rows only when
  Pillow exists. To exercise the *lossy* PSNR path without libjpeg, the
  fixture generator also produces rows whose stored bytes encode a
  quantized copy of the original pixels (fmt stays ``png``; the
  validation joins against the *original* pixels so PSNR < inf but
  ≥ 40 dB by construction).

All batch entry points take/return numpy arrays so the Spark side can
call them from Arrow-batched pandas UDFs — never per-row Python in the
engine hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # optional — not present in this container
    from PIL import Image  # type: ignore

    HAS_PIL = True
except ImportError:  # pragma: no cover - environment dependent
    Image = None
    HAS_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0 rows)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). Vectorized per row."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, 1 + stride)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-recurrence
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode an RGB8 (or RGBA8/gray8) PNG into an (h, w, 3) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = bit_depth = color_type = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    px = _unfilter(raw, h, w, channels).reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 4:
        px = px[:, :, :3]
    return px


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode bytes of the given format to (h, w, 3) uint8 pixels.

    ``png`` uses the in-repo codec; ``jpeg`` requires Pillow and raises
    ``NotImplementedError`` otherwise (clearly-marked stub — the Spark
    plumbing around it is real and tested with PNG rows).
    """
    fmt = fmt.lower()
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        if not HAS_PIL:
            raise NotImplementedError(
                "jpeg decode requires Pillow, which is not installed in this "
                "container; fixtures emit jpeg rows only when Pillow exists"
            )
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    raise ValueError(f"unknown image format {fmt!r}")


def quantize(pixels: np.ndarray, step: int = 4) -> np.ndarray:
    """Deterministic 'lossy simulation': quantize channel values to
    multiples of ``step`` (round-to-nearest). With step=4 the max error
    is 2 → PSNR ≥ 20*log10(255/2) ≈ 42 dB, comfortably over the 40 dB
    gate, while strictly not bit-exact.
    """
    q = ((pixels.astype(np.int32) + step // 2) // step) * step
    return np.clip(q, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Validation math — all batch-vectorized
# ---------------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.
    Returns inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10((255.0 * 255.0) / mse)


_PHASH_N = 32  # resample size before DCT
_DCT_BASIS = None


def _dct_basis() -> np.ndarray:
    global _DCT_BASIS
    if _DCT_BASIS is None:
        n = _PHASH_N
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
        basis[0] /= np.sqrt(2.0)
        _DCT_BASIS = basis
    return _DCT_BASIS


def _resample_gray(pixels: np.ndarray, n: int = _PHASH_N) -> np.ndarray:
    """Area-average resample of an RGB image to n×n grayscale (float64).

    Implemented as two reduceat passes (rows then cols) — sequential
    gathers, no scatter (np.add.at is a memory-bandwidth hog that
    destroys multi-process scaling on shared hosts)."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # upsample first (images smaller than n×n, e.g. tiny avatars): nearest-
    # row gather to exactly n — the reduceat bin mapping below assumes
    # h,w ≥ n and IndexErrors otherwise; the ≥n path is unchanged so
    # phash values for existing corpora stay stable
    if h < n:
        gray = gray[(np.arange(n) * h) // n]
        h = n
    if w < n:
        gray = gray[:, (np.arange(n) * w) // n]
        w = n
    # bin boundaries identical to the old index mapping: row y goes to
    # bin y*n//h — boundaries are the first y of each bin
    yb = np.searchsorted(np.arange(h) * n // max(h, 1), np.arange(n), side="left")
    xb = np.searchsorted(np.arange(w) * n // max(w, 1), np.arange(n), side="left")
    ycnt = np.diff(np.append(yb, h)).clip(min=1)
    xcnt = np.diff(np.append(xb, w)).clip(min=1)
    rows = np.add.reduceat(gray, yb, axis=0)
    both = np.add.reduceat(rows, xb, axis=1)
    return both / (ycnt[:, None] * xcnt[None, :])


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 32×32 grayscale → 2-D DCT (matmul with the
    cosine basis) → top-left 8×8 block minus DC → sign-vs-median bits.
    Returns a signed int64 (Spark LongType-compatible).
    """
    g = _resample_gray(pixels)
    basis = _dct_basis()
    dct = basis @ g @ basis.T
    block = dct[:8, :8].flatten()
    block = np.delete(block, 0)  # drop DC
    med = np.median(block)
    bits = block > med
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    val <<= 1  # pad back to 64 bits
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def synth_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic structured test image: smooth gradients + blocks,
    so quantization stays high-PSNR and phash is stable."""
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    base = np.stack(
        [
            (x + y) / 2,
            np.abs(x - y),
            (x * y) / 255.0,
        ],
        axis=2,
    )
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)
