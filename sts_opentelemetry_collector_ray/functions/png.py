"""Pure-stdlib PNG codec — proves the media decoder seam on REAL bytes.

The container has no PIL/ffmpeg, but PNG needs only ``zlib`` + ``struct``:
IDAT is zlib-compressed scanlines, each prefixed by one of five filter bytes
(None/Sub/Up/Average/Paeth, RFC 2083 §6). ``decode_png`` reconstructs pixels
for 8-bit greyscale / RGB / RGBA, non-interlaced — the common feature-pipeline
subset; anything else raises loudly.

``png_feature_decoder`` adapts the decoder to the ``MediaDecodeActor``
injection seam (`stages/multimodal.py`): a ``(payload, media_type) ->
np.ndarray`` callable returning per-channel mean/std features of the DECODED
pixels, so ``strict=True`` runs end-to-end on real image bytes.

``encode_png`` exists to mint real fixtures deterministically (tests encode the
same pixels under every filter type; all five byte streams must decode back to
identical pixels, which exercises each reconstruction path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type (8-bit, the supported subset)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (per RFC 2083): nearest of left/up/upper-left to a+b-c,
    ties resolved left, then up."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, 1|3|4) uint8 array as a real PNG, applying
    ``filter_type`` (0..4) to every scanline. Filtering is lossless whatever
    the choice — different ``filter_type`` values produce different byte
    streams for the SAME pixels, which is exactly what the decode tests need."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    bpp = ch  # bytes per pixel at bit depth 8
    raw = px.reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left.astype(np.int16) + prev.astype(np.int16)) // 2).astype(np.uint8)
        else:
            filt = cur - _paeth(left, prev, upleft)
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 9)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte payload to an (h, w, channels) uint8 array.

    Supports bit depth 8, color types 0 (grey) / 2 (RGB) / 6 (RGBA),
    non-interlaced — raises ValueError on anything else (fail loudly, never
    mis-decode). All five scanline filters are reconstructed."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}): only 8-bit grey/RGB/RGBA non-interlaced"
        )
    ch = _CHANNELS[color_type]
    bpp = ch
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG scanline payload is {len(raw)} B, expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorized over the scanline
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the reconstructed LEFT pixel → sequential
            # per pixel-column, vectorized across the pixel's channels
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(0, stride, bpp):
                left = cur[x - bpp : x] if x else np.zeros(bpp, np.uint8)
                up = prev[x : x + bpp]
                upleft = prev[x - bpp : x] if x else np.zeros(bpp, np.uint8)
                seg = line[x : x + bpp]
                if ftype == 1:
                    cur[x : x + bpp] = seg + left
                elif ftype == 3:
                    cur[x : x + bpp] = seg + (
                        (left.astype(np.int16) + up.astype(np.int16)) // 2
                    ).astype(np.uint8)
                else:
                    cur[x : x + bpp] = seg + _paeth(left, up, upleft)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def png_feature_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """The `MediaDecodeActor` seam adapter: decode REAL PNG bytes and return an
    8-dim feature vector over the decoded pixels — per-channel means padded to
    4, then per-channel stds padded to 4 (channels beyond the image's are 0).
    Deterministic; raises on non-PNG payloads (a strict pipeline should never
    silently feature-extract undecodable bytes)."""
    px = decode_png(payload).astype(np.float64) / 255.0
    ch = px.shape[2]
    means = np.zeros(4)
    stds = np.zeros(4)
    means[:ch] = px.mean(axis=(0, 1))
    stds[:ch] = px.std(axis=(0, 1))
    return np.concatenate([means, stds])


def png_decoder_factory():
    """Zero-arg factory for ``MediaDecodeActor(decoder_factory=...)`` — runs
    once per actor (the load-once seam), returning the per-payload decode fn."""
    return png_feature_decoder
