"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row-by-row. ``decode_image`` is a REAL
pure-Python/numpy codec for four formats — P6 PPM, uncompressed
24/32-bit BMP, baseline 4:4:4 JPEG (``llmdata.jpeg``), and 8-bit PNG
(``llmdata.png``, stdlib zlib) — each with BOTH encode and decode, so
decode→resize→encode is end to end genuine for those; every other
format (GIF/TIFF/WebP/…) raises ``NotImplementedError`` because the
codec libraries aren't in this container, and ``resize_images``
falls back to a deterministic byte-truncation stand-in so the
Spark-side plumbing — schema, batching, partition sizing — still runs
on arbitrary payloads.

Scale notes: binary payloads dominate row size, so feature extraction
should run on a layout partitioned for ~128 MB input splits; the output
(small feature rows) is naturally re-coalesced by AQE. Never collect
binary columns to the driver.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


_PPM_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*(\d+)")


def _ppm_tokens(buf: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read *n* whitespace/comment-separated ASCII integers from *buf*."""
    vals = []
    pos = start
    for _ in range(n):
        m = _PPM_TOKEN.match(buf, pos)
        if not m:
            raise ValueError("truncated PPM header")
        vals.append(int(m.group(1)))
        pos = m.end()
    return vals, pos


def decode_image(content: bytes):
    """Decode an image payload to an ``H×W×3`` uint8 numpy array.

    Real decoders for the four formats that need no codec library:

    * **P6 PPM** (binary netpbm, maxval ≤ 255, ``#`` comments allowed)
    * **BMP**, uncompressed (BI_RGB) 24/32-bit BITMAPINFOHEADER,
      bottom-up or top-down, with the standard 4-byte row padding;
      BGR(A) is converted to RGB
    * **JPEG**, baseline sequential 8-bit with 1×1 sampling (4:4:4 or
      greyscale) — the pure-numpy T.81 codec in ``llmdata.jpeg``
      (progressive/subsampled files raise ``NotImplementedError``
      honestly rather than decoding wrong pixels)
    * **PNG**, 8-bit grey/RGB/RGBA non-interlaced — ``llmdata.png``
      over stdlib zlib; all five scanline filters; CRC-checked
      (palette/16-bit/Adam7 raise ``NotImplementedError``)
    * **GIF**, 87a/89a single-image with a global color table — real
      variable-width LZW in ``llmdata.gif`` (interlace/local tables
      raise ``NotImplementedError``; 89a extensions are skipped)

    Anything else (TIFF/WebP/…) raises ``NotImplementedError`` — those
    codecs aren't in this container; swap in PIL/libvips at deploy time.
    Malformed payloads of a recognized format raise ``ValueError``.
    """
    import numpy as np

    if content is None or len(content) < 2:
        raise ValueError("empty payload")
    if content[:2] == b"\xff\xd8":
        from securities_pricing_data_pipeline_spark.llmdata.jpeg import decode_jpeg

        return decode_jpeg(bytes(content))
    if content[:4] == b"\x89PNG":
        from securities_pricing_data_pipeline_spark.llmdata.png import decode_png

        return decode_png(bytes(content))
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from securities_pricing_data_pipeline_spark.llmdata.gif import decode_gif

        return decode_gif(bytes(content))
    if content[:2] == b"P6":
        (maybe_wh, pos) = _ppm_tokens(content, 2, 3)
        width, height, maxval = maybe_wh
        if maxval > 255 or maxval <= 0 or width <= 0 or height <= 0:
            raise ValueError(f"unsupported PPM geometry {width}x{height}/{maxval}")
        pos += 1  # exactly one whitespace byte after maxval
        need = width * height * 3
        raw = content[pos : pos + need]
        if len(raw) != need:
            raise ValueError("truncated PPM pixel data")
        return np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3).copy()
    if content[:2] == b"BM":
        if len(content) < 54:
            raise ValueError("truncated BMP header")
        data_off = int.from_bytes(content[10:14], "little")
        width = int.from_bytes(content[18:22], "little", signed=True)
        height = int.from_bytes(content[22:26], "little", signed=True)
        bpp = int.from_bytes(content[28:30], "little")
        compression = int.from_bytes(content[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        bottom_up = height > 0
        height = abs(height)
        if width <= 0 or height <= 0:
            raise ValueError("bad BMP geometry")
        nchan = bpp // 8
        stride = (width * nchan + 3) & ~3
        need = stride * height
        raw = content[data_off : data_off + need]
        if len(raw) != need:
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
        px = rows[:, : width * nchan].reshape(height, width, nchan)
        if bottom_up:
            px = px[::-1]
        return px[:, :, 2::-1].copy()  # BGR(A) → RGB, alpha dropped
    raise NotImplementedError(
        "only P6 PPM, uncompressed BMP, baseline JPEG, 8-bit PNG, and "
        "single-image GIF are decodable here"
    )


def encode_ppm(pixels) -> bytes:
    """Encode an ``H×W×3`` uint8 array as a binary P6 PPM payload."""
    h, w = pixels.shape[0], pixels.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def resize_nearest(pixels, width: int, height: int):
    """Nearest-neighbor resample: output pixel (j, i) reads source pixel
    (floor(j·H/height), floor(i·W/width)) — pure integer index math, so
    the result is bit-deterministic and independently recomputable."""
    import numpy as np

    src_h, src_w = pixels.shape[0], pixels.shape[1]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return pixels[rows][:, cols]


def extract_features(assets: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Deterministic byte-level 'features' per asset via mapInPandas.

    Replace `_featurize` with a real decode→embed step in production; the
    Arrow batch shape, schema contract, and partition behavior stay the
    same.
    """
    import pandas as pd

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                    "digest": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return assets.mapInPandas(_featurize, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Uniform frame sampling: each asset's payload → ``n_frames`` rows.

    Real video decoders aren't in this container, so a frame is a
    deterministic contiguous byte slice (frame *i* of *n* covers bytes
    ``[i·total/n, (i+1)·total/n)``); swap the slicer for an ffmpeg/pyav
    keyframe extractor in production — the Arrow batch shape, the
    one-input-row→n-output-rows explode, and the schema contract are the
    production plumbing. Rows fan out inside ``mapInPandas`` so the frame
    bytes never pass through the driver.
    """
    import pandas as pd

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_content = [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                total = len(content) if content is not None else 0
                for i in range(n_frames):
                    start = i * total // n_frames
                    end = (i + 1) * total // n_frames
                    out_ids.append(asset_id)
                    out_idx.append(i)
                    out_content.append(None if content is None else content[start:end])
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "content": out_content}
            )

    return assets.mapInPandas(_sample, FRAME_SCHEMA)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize each asset payload to ``width × height``.

    Payloads that ``decode_image`` understands (P6 PPM, uncompressed
    24/32-bit BMP, baseline 4:4:4 JPEG, 8-bit PNG, single-image GIF)
    take the REAL path:
    decode → nearest-neighbor resample → re-encode as P6, with
    ``meta['codec']`` recording the source format. Unsupported formats
    (TIFF/WebP/…) fall back to the
    deterministic byte-truncation stand-in (``meta['codec'] = 'raw'``)
    so arbitrary binaries still flow through the same Arrow-batched
    plumbing; swap the decoder for PIL/libvips at deploy time to widen
    format support. A RECOGNIZED container whose payload fails to decode
    (truncated PPM/BMP) also takes the stand-in path but is marked
    ``meta['codec'] = 'corrupt'`` with the decode error preserved in
    ``meta['decode_error']`` — corruption stays distinguishable from
    mere lack of codec support in downstream data-quality passes.
    """
    import pandas as pd

    cap = width * height

    def _one(b: bytes | None) -> tuple[bytes | None, str, str | None]:
        if b is None:
            return None, "raw", None
        try:
            px = decode_image(bytes(b))
            head = bytes(b[:4])
            codec = (
                "bmp" if head[:2] == b"BM"
                else "jpeg" if head[:2] == b"\xff\xd8"
                else "png" if head == b"\x89PNG"
                else "gif" if head[:3] == b"GIF"
                else "ppm"
            )
            return encode_ppm(resize_nearest(px, width, height)), codec, None
        except NotImplementedError:
            return bytes(b[:cap]), "raw", None
        except ValueError as e:
            return bytes(b[:cap]), "corrupt", str(e)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            done = pdf["content"].map(_one)
            pdf["content"] = done.map(lambda t: t[0])
            pdf["meta"] = [
                {
                    **(m or {}),
                    "resized": f"{width}x{height}",
                    "codec": t[1],
                    **({"decode_error": t[2]} if t[2] else {}),
                }
                for m, t in zip(pdf["meta"], done)
            ]
            yield pdf

    return assets.mapInPandas(_resize, ASSET_SCHEMA)


def frame_digests(frames: DataFrame) -> DataFrame:
    """Per-frame audit row (size + digest) with JVM-side functions.

    The digest is md5 of the UPPERCASE HEX of the frame bytes — DuckDB's
    md5 only accepts VARCHAR, so hashing the hex string is the
    cross-engine-checkable formulation (both engines emit uppercase hex).
    """
    return frames.select(
        "asset_id",
        "frame_idx",
        F.octet_length(F.col("content")).cast("int").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("frame_digest"),
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary plumbing is exercised against real testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("meta"),
    )


def image_dhash(
    assets: DataFrame,
    id_col: str = "asset_id",
    grid_w: int = 11,
    grid_h: int = 6,
) -> DataFrame:
    """60-bit perceptual difference-hash (dHash, Krawetz 2013) per image:
    decode → nearest-neighbor downscale to ``grid_h × grid_w`` (the
    ``resize_nearest`` kernel — pure integer index math, so every pixel
    is independently recomputable) → integer grayscale ((r+g+b) div 3)
    → bit k = i·(grid_w−1)+j set iff gray[i,j] > gray[i,j+1]. The
    default 6×11 grid yields 60 bits — the repo's portable-hash width
    (bit 59 tops out below 2^63 in BOTH engines; DuckDB raises on a
    64-bit left shift, the reason ``portable_hash60`` exists).

    Returns (id, simhash) — schema-compatible with
    ``simhash_near_dups(sigs=...)``, so perceptual image dedup reuses
    the exact text-SimHash pigeonhole pipeline: 4×16-bit blocks,
    bucketed candidate pairing (enforced skew cap), exact Hamming
    verify. Decode+hash runs in one Arrow-batched mapInPandas (the
    decode is the Python boundary already); everything after the 8-byte
    signature is JVM-side."""
    import pandas as pd

    n_bits = grid_h * (grid_w - 1)
    if n_bits > 60:
        raise ValueError(f"{grid_h}x{grid_w} grid needs {n_bits} > 60 bits")

    def _hash(batches):
        import numpy as np

        weights = np.left_shift(np.int64(1), np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            ids: list[int] = []
            sigs: list[int] = []
            for aid, buf in zip(pdf[id_col], pdf["content"]):
                px = decode_image(bytes(buf))
                g = resize_nearest(px, grid_w, grid_h).astype(np.int64)
                gray = g.sum(axis=2) // 3
                bits = (gray[:, :-1] > gray[:, 1:]).flatten()
                ids.append(int(aid))
                sigs.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame({"id": ids, "simhash": sigs})

    return assets.select(F.col(id_col), "content").mapInPandas(
        _hash, "id long, simhash long"
    )
