"""MJPEG-in-AVI video columns: real container parse + real frame decode.

Video was the one modality whose decode step was a stand-in (byte-slice
"frames" in ``multimodal.sample_frames``). Motion-JPEG inside AVI closes
that gap with zero external dependencies: AVI is RIFF chunk parsing
(same discipline as the WAV codec) and each ``00dc`` frame chunk is a
baseline JPEG — which ``llmdata.jpeg`` already decodes. Both directions
are real: ``encode_avi_mjpeg`` writes a minimal-but-valid AVI (RIFF/
AVI / hdrl with avih+strl / movi LIST of 00dc chunks), and
``extract_frames_avi`` walks any AVI's movi LIST and returns the raw
JPEG payloads, which decode to pixels.

Non-MJPEG codecs inside AVI surface naturally: the frame bytes won't
start with an SOI marker and ``decode_image`` raises — honest, per the
multimodal contract. Malformed RIFF raises ``ValueError``.

Scale shape: frame extraction and decode run inside Arrow-batched
``mapInPandas`` — one input row fans out to n frame rows executor-side,
payload bytes never visit the driver, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack baseline-JPEG payloads into a minimal valid MJPEG AVI."""
    if not jpeg_frames:
        raise ValueError("no frames")
    n = len(jpeg_frames)

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/sec, padding, flags (HASINDEX off)
        n, 0, 1, 0,        # total frames, initial frames, streams, buf size
        width, height,
        0, 0, 0, 0,        # reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def extract_frames_avi(buf: bytes) -> list[bytes]:
    """Walk an AVI's movi LIST and return the video frame payloads
    (``##dc``/``##db`` chunks) in stream order."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_end = pos + 8 + length
            if body_end > end:
                raise ValueError(f"truncated {tag!r} chunk")
            if tag == b"LIST":
                walk(data, pos + 12, body_end)
            elif len(tag) == 4 and tag[2:4] in (b"dc", b"db"):
                frames.append(data[pos + 8 : body_end])
            pos = body_end + (length & 1)

    walk(buf, 12, len(buf))
    return frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("mean_units", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


def decode_video_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Real video frame sampling: parse each payload's AVI container,
    take ``n_frames`` uniformly spaced frames (frame ``i`` of ``n`` is
    stream index ``i·total//n``), DECODE each through the image codec,
    and emit per-frame geometry plus the exact integer pixel-sum mean
    numerator (Σ all RGB values — int64-exact, so an oracle can bound
    or recompute it). Undecodable containers yield one row with status
    'corrupt'; frames whose codec is unsupported yield status
    'unsupported' — media QA stays distinguishable, nothing crashes the
    sweep."""
    import pandas as pd

    from securities_pricing_data_pipeline_spark.llmdata.multimodal import decode_image

    def _rows(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("asset_id", "frame_idx", "width", "height", "mean_units", "status")}

            def emit(aid, idx, w, h, mu, st):
                out["asset_id"].append(aid)
                out["frame_idx"].append(idx)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_units"].append(mu)
                out["status"].append(st)

            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                aid = int(aid)
                try:
                    frames = extract_frames_avi(bytes(content))
                except (ValueError, TypeError):
                    emit(aid, 0, None, None, None, "corrupt")
                    continue
                total = len(frames)
                picks = sorted({i * total // n_frames for i in range(n_frames)} & set(range(total))) if total else []
                if not picks:
                    emit(aid, 0, None, None, None, "corrupt")
                    continue
                for idx in picks:
                    try:
                        px = decode_image(frames[idx])
                        emit(aid, idx, px.shape[1], px.shape[0],
                             int(px.astype(np.int64).sum()), "ok")
                    except NotImplementedError:
                        emit(aid, idx, None, None, None, "unsupported")
                    except ValueError:
                        emit(aid, idx, None, None, None, "corrupt")
            yield pd.DataFrame(out)

    return assets.mapInPandas(_rows, VIDEO_FRAME_SCHEMA)


def video_frame_dhash(
    assets: DataFrame,
    id_col: str = "asset_id",
    n_frames: int = 4,
    grid_w: int = 11,
    grid_h: int = 6,
) -> DataFrame:
    """Per-frame 60-bit perceptual dHash of a video column — the video
    rung of the perceptual-dedup family (text SimHash, image dHash,
    audio energy dHash): walk the real AVI container, take ``n_frames``
    uniformly spaced frames (the decode_video_frames pick rule), decode
    each through the image codec, and compute the SAME
    resize_nearest → integer-grayscale → row-difference hash
    ``multimodal.image_dhash`` uses, one row per (asset, frame).

    Output (id, frame_idx, pick_idx, simhash) — ``frame_idx`` is the
    ORIGINAL container frame index (provenance: which frame was
    sampled), ``pick_idx`` is the DENSE 0..n_picked−1 pick ordinal.
    Consumers packing (id, frame) into one key must pack on
    ``pick_idx`` with stride ≥ n_frames: frame_idx values are
    ``i·total//n_frames`` and exceed any fixed small stride for long
    videos (ADVICE r11 — ``id*8 + frame_idx`` aliases neighboring ids
    once a video has more than 8 frames). The signature column is
    pluggable into ``simhash_near_dups(sigs=...)`` after that packing,
    so video near-dup detection = "any pair of sampled frames within
    Hamming ≤ k", found by the standard 4×16-bit pigeonhole with NO new
    LSH machinery. Container extraction + decode + hash run in ONE
    Arrow-batched mapInPandas; downstream pairing touches only 20-byte
    signature rows (pin this frame before pairing — the
    dedup_audio_phash lesson)."""
    import pandas as pd

    from securities_pricing_data_pipeline_spark.llmdata.multimodal import (
        decode_image,
        resize_nearest,
    )

    n_bits = grid_h * (grid_w - 1)
    if n_bits > 60:
        raise ValueError(f"{grid_h}x{grid_w} grid needs {n_bits} > 60 bits")

    def _hash(batches):
        weights = np.left_shift(np.int64(1), np.arange(n_bits, dtype=np.int64))
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            picks_out: list[int] = []
            sigs: list[int] = []
            for aid, content in zip(pdf[id_col], pdf["content"]):
                aid = int(aid)
                frames = extract_frames_avi(bytes(content))
                total = len(frames)
                picks = sorted(
                    {i * total // n_frames for i in range(n_frames)}
                    & set(range(total))
                )
                for pick, idx in enumerate(picks):
                    px = decode_image(frames[idx])
                    g = resize_nearest(px, grid_w, grid_h).astype(np.int64)
                    gray = g.sum(axis=2) // 3
                    bits = (gray[:, :-1] > gray[:, 1:]).flatten()
                    ids.append(aid)
                    idxs.append(idx)
                    picks_out.append(pick)
                    sigs.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "pick_idx": picks_out,
                    "simhash": sigs,
                }
            )

    return assets.select(F.col(id_col), "content").mapInPandas(
        _hash, "id long, frame_idx long, pick_idx long, simhash long"
    )
