"""Pure-Python GIF87a codec — real LZW, no third-party imagery libs.

Closes the one format ``llmdata.multimodal.decode_image`` documented as
falling back to the byte-truncation stand-in: GIF adds the third
compression CLASS to the codec family — dictionary coding (LZW), next to
DEFLATE + scanline prediction (PNG) and DCT + Huffman (JPEG) — so the
multimodal pipeline certifies a decoder per class, not per container.

Scope (honest feature guards, same policy as the other codecs):

* GIF87a/GIF89a header, logical screen descriptor, GLOBAL color table.
* One image block, non-interlaced, no local color table.
* GIF89a extension blocks are SKIPPED (transparency is a render-time
  concern; the pixel indices decode identically).
* Interlaced images and local color tables raise ``NotImplementedError``.

The LZW implementation follows the GIF spec's variable-width convention
(no "early change"): the decoder widens the code size when the next
table slot reaches ``2^width``; the encoder — one step ahead of the
decoder — widens at ``2^width + 1``; both reset on CLEAR at table
overflow (width cap 12). Bit packing is LSB-first; pixel data rides
≤255-byte sub-blocks.
"""

from __future__ import annotations


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code <= 0xFFF:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # table full: spec-compliant CLEAR + reset
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
        # mirror the decoder: it will add one entry after this code and
        # widen if that entry fills the current width
        if next_code <= 0xFFF:
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0
    out = bytearray()

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) <= 0xFFF:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def encode_gif(indices, palette) -> bytes:
    """Encode an ``H×W`` array of palette indices + an RGB ``palette``
    (length a power of two, 2..256) as a single-image GIF87a payload."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    if n < 2 or n & (n - 1):
        raise ValueError("palette length must be a power of two >= 2")
    size_field = n.bit_length() - 2  # 2^(field+1) entries
    mcs = max(2, n.bit_length() - 1)  # LZW minimum code size (spec floor 2)
    out = bytearray(b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | size_field)  # GCT present, 2^(field+1) colors
    out += bytes([0, 0])  # background index, aspect
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)  # no local table, not interlaced
    out.append(mcs)
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes):
    """Decode a GIF87a/89a payload to an ``H×W×3`` uint8 RGB array.
    Single image, global color table, non-interlaced (feature guards
    raise on the rest); 89a extension blocks are skipped.

    Truncation contract: like the other codecs, any out-of-bounds read on
    a truncated payload surfaces as ``ValueError('truncated GIF')`` so
    resize_images/_one can take the ``codec='corrupt'`` fallback instead
    of failing the Spark task with an IndexError."""
    try:
        return _decode_gif_inner(data)
    except IndexError as exc:
        raise ValueError("truncated GIF") from exc


def _decode_gif_inner(data: bytes):
    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    if not flags & 0x80:
        raise NotImplementedError("GIF without a global color table")
    n_colors = 2 << (flags & 0x07)
    palette = np.frombuffer(data[pos : pos + 3 * n_colors], dtype=np.uint8).reshape(
        n_colors, 3
    )
    pos += 3 * n_colors
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # 89a extension: label + sub-blocks, skip
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block == 0x3B:
            raise ValueError("GIF trailer before any image block")
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        break
    w = int.from_bytes(data[pos + 5 : pos + 7], "little")
    h = int.from_bytes(data[pos + 7 : pos + 9], "little")
    iflags = data[pos + 9]
    if iflags & 0x80:
        raise NotImplementedError("local color tables not supported")
    if iflags & 0x40:
        raise NotImplementedError("interlaced GIF not supported")
    if w * h == 0 or w > sw * 16 or h > sh * 16:
        raise ValueError("bad GIF geometry")
    pos += 10
    mcs = data[pos]
    pos += 1
    lzw = bytearray()
    while True:
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        lzw += data[pos : pos + ln]
        pos += ln
    idx = np.frombuffer(_lzw_decode(bytes(lzw), mcs, w * h), dtype=np.uint8)
    if (idx >= n_colors).any():
        raise ValueError("palette index out of range")
    return palette[idx].reshape(h, w, 3)
