"""PNG codec (RFC 2083 / ISO 15948) in pure Python + numpy + stdlib zlib.

PNG needs no external codec library: the container format is length-
prefixed CRC'd chunks, the pixel stream is zlib DEFLATE (stdlib), and
the only image-specific machinery is the five scanline filters. Both
directions are implemented, so the roundtrip is LOSSLESS and testable
bit-for-bit with no reference codec.

Scope: 8-bit truecolor (RGB) and truecolor+alpha (RGBA) and greyscale,
non-interlaced — what ``encode_png`` emits plus the overwhelmingly
common subset of third-party files. Palette, 16-bit, and Adam7
interlaced files raise ``NotImplementedError`` honestly; malformed
files (bad magic/CRC/length/truncated DEFLATE) raise ``ValueError``.

The decoder vectorizes everything except the scanline-filter recurrence
(Sub/Up/Average/Paeth are defined row-recursively; Up is vectorized
per-row, the rest run per-scanline over numpy rows). The encoder uses
filter type 0 (None) for every scanline — larger files than libpng's
heuristics, but bit-exact and simple; compression still comes from
DEFLATE itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode H×W×3 (RGB), H×W×4 (RGBA), or H×W (grey) uint8 as PNG.
    Lossless: ``decode_png(encode_png(px)) == px`` exactly."""
    if pixels.ndim == 2:
        color_type, nchan = 0, 1
        px = pixels[:, :, None]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type, nchan = 2, 3
        px = pixels
    elif pixels.ndim == 3 and pixels.shape[2] == 4:
        color_type, nchan = 6, 4
        px = pixels
    else:
        raise ValueError("encode_png expects H x W[, {1|3|4}] uint8")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) prepended to each raw scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * nchan)], axis=1
    ).tobytes()
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth_row(out_row: np.ndarray, prev: np.ndarray, fdat: np.ndarray, bpp: int) -> None:
    """In-place Paeth defilter of one scanline (sequential in x by spec)."""
    n = len(fdat)
    for i in range(n):
        a = int(out_row[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out_row[i] = (int(fdat[i]) + pred) & 0xFF


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG to H×W×3 uint8 RGB (grey replicates channels; alpha
    is dropped after decode — the pixel contract of ``decode_image``)."""
    if buf[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = len(_MAGIC)
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(buf):
        if pos + 8 > len(buf):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(buf):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("bad IHDR compression/filter method")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            raise NotImplementedError("palette PNG")
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bit_depth != 8:
        raise NotImplementedError(f"{bit_depth}-bit PNG (only 8-bit here)")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG")
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if nchan is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad DEFLATE stream: {e}") from None
    stride = w * nchan
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    fdata = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = nchan  # bytes per pixel at 8-bit depth
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(ftypes[y])
        row = fdata[y]
        if ft == 0:  # None
            out[y] = row
        elif ft == 1:  # Sub
            o = out[y]
            o[:bpp] = row[:bpp]
            for i in range(bpp, stride):
                o[i] = (int(row[i]) + int(o[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256, per spec
        elif ft == 3:  # Average
            o = out[y]
            for i in range(stride):
                a = int(o[i - bpp]) if i >= bpp else 0
                o[i] = (int(row[i]) + (a + int(prev[i])) // 2) & 0xFF
        elif ft == 4:  # Paeth
            _paeth_row(out[y], prev, row, bpp)
        else:
            raise ValueError(f"bad filter type {ft}")
        prev = out[y]
    px = out.reshape(h, w, nchan)
    if color_type == 0:
        return np.repeat(px, 3, axis=2).copy()
    if color_type == 4:  # grey+alpha → replicate luma, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # RGB / RGBA→RGB
