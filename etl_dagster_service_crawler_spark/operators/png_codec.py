"""Pure-python PNG codec (stdlib zlib + numpy) — the in-container
fallback for the multimodal decode/resize seam.

The cluster image installs pillow and the operators use it (the fast
path); THIS module exists so the decode path is genuinely executable —
not an importorskip stub — in environments without an imaging library,
including this build/test container (r8 verdict item 8). Scope is
deliberately the engine's own fixture format: 8-bit PNG, color types
RGB(2)/RGBA(6)/gray(0), no interlace, all five standard scanline
filters on decode, filter-0 on encode. Anything else raises a clear
ValueError naming what was seen.

Format reference: the public PNG specification (RFC 2083 / W3C
PNG). No third-party code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 HxWx3 RGB (or HxW gray) array -> PNG bytes, filter 0 per
    scanline, one zlib-deflated IDAT. Deterministic: same array, same
    bytes (zlib level fixed)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"encode_png expects HxW or HxWx3 uint8, got {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    flat = a.reshape(h, w * channels)
    for row in flat:
        raw.append(0)  # filter type 0 (None)
        raw.extend(row.tobytes())
    idat = zlib.compress(bytes(raw), 6)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse the five standard PNG scanline filters."""
    stride = w * channels
    bpp = channels  # bytes per pixel at bit depth 8
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the in-progress row: per-byte loop
            # (fixture-scale images; the cluster path is pillow)
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                if ftype == 1:  # Sub
                    v = line[i] + left
                elif ftype == 3:  # Average
                    v = line[i] + ((left + up) >> 1)
                else:  # Paeth
                    ul = int(prev[i - bpp]) if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    v = line[i] + pred
                cur[i] = v & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = cur
    return out.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 RGB array (gray broadcast to 3
    channels, alpha dropped). Supports bit depth 8, color types
    0/2/6, no interlace — the engine's fixture envelope; anything
    else raises ValueError naming the field."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload (bad magic)")
    pos = len(PNG_MAGIC)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    expected = h * (w * channels + 1)
    if len(raw) != expected:
        raise ValueError(
            f"PNG payload length {len(raw)} != expected {expected}"
        )
    arr = _unfilter(raw, h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels == 4:
        arr = arr[:, :, :3]
    return arr


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (the fallback policy —
    pillow's default resampling differs; within one engine the choice
    just has to be stable)."""
    src_h, src_w = arr.shape[:2]
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return arr[rows][:, cols]
