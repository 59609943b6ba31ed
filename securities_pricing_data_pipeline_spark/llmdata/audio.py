"""WAV (RIFF PCM) audio columns: real codec + feature extraction.

Audio completes the multimodal set (image codecs live in
``multimodal``/``jpeg``/``png``; video frame-sampling in ``multimodal``).
WAV-PCM needs no codec library — the container is RIFF chunk parsing and
the payload is raw little-endian PCM — so encode and decode are both
genuine here; compressed formats (MP3/AAC/FLAC/μ-law…) raise
``NotImplementedError`` honestly, malformed RIFF raises ``ValueError``.

Feature extraction follows the engine's exact-parity discipline: the
emitted features (sample count, sum of squared samples, zero-crossing
count) are INTEGER aggregates of int16 samples — bit-stable across
engines, so a DuckDB oracle can recompute them arithmetically for
synthesized payloads (sum of squares for int16 fits int64 up to ~8.6e9
samples per asset). RMS/dBFS are one division away downstream.

Scale shape: decode + feature fold run inside Arrow-batched
``mapInPandas`` — embarrassingly parallel, no shuffle; the output is
narrow feature rows, so the binary payloads never move again after the
scan.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 mono ``[n]`` or multichannel ``[n, ch]`` PCM as WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0 or s.shape[1] == 0:
        raise ValueError("encode_wav expects [n] or [n, ch] int16")
    n, ch = s.shape
    payload = s.reshape(-1).tobytes()  # interleaved frames
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to ``(samples[n, ch] int16, sample_rate)``.

    Compressed/float/8- or 24-bit formats raise ``NotImplementedError``;
    truncated or malformed RIFF raises ``ValueError``.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 WAV decodable here (format={audio_format}, bits={bits})"
        )
    if ch == 0 or len(data) % (2 * ch) != 0:
        raise ValueError("data chunk not a whole number of frames")
    s = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return s.copy(), rate


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sumsq_units", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("codec", T.StringType(), False),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """Integer-exact per-asset audio features via Arrow-batched
    ``mapInPandas``: sample count, Σ sample² (RMS numerator, exact in
    int64), and zero-crossing count over channel 0 (a crossing is a
    sign-bit change between consecutive samples, with 0 counted as
    non-negative). Undecodable payloads survive with null features and
    ``codec`` = 'unsupported' or 'corrupt' — the resize_images
    data-quality contract."""
    import pandas as pd

    def _one(b):
        if b is None:
            return (None, None, None, None, "corrupt")
        try:
            s, rate = decode_wav(bytes(b))
        except NotImplementedError:
            return (None, None, None, None, "unsupported")
        except ValueError:
            return (None, None, None, None, "corrupt")
        c0 = s[:, 0].astype(np.int64)
        nonneg = c0 >= 0
        zc = int((nonneg[1:] != nonneg[:-1]).sum())
        return (rate, s.shape[0], int((c0 * c0).sum()), zc, "wav")

    def _feat(batches):
        for pdf in batches:
            done = pdf["content"].map(_one)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": done.map(lambda t: t[0]),
                    "n_samples": done.map(lambda t: t[1]),
                    "sumsq_units": done.map(lambda t: t[2]),
                    "zero_crossings": done.map(lambda t: t[3]),
                    "codec": done.map(lambda t: t[4]),
                }
            )

    return assets.mapInPandas(_feat, AUDIO_FEATURE_SCHEMA)


def audio_dhash(
    assets: DataFrame,
    id_col: str = "asset_id",
    n_frames: int = 61,
    frame_len: int = 32,
) -> DataFrame:
    """60-bit perceptual audio fingerprint — the acoustic sibling of
    ``multimodal.image_dhash`` (energy-envelope difference hash, the
    shape Haitsma & Kalker 2002 band-energy fingerprints reduce to with
    one band): decode channel 0 through the real RIFF parser, split the
    first ``n_frames × frame_len`` samples into fixed frames, compute
    each frame's exact integer energy Σs² (int64 — no FFT, no floats, so
    the value is independently recomputable from the sample arithmetic),
    and set bit f iff energy[f] > energy[f+1]. 61 frames → 60 bits, the
    portable-hash width both engines can shift without overflow.

    Returns (id, simhash) — pluggable into ``simhash_near_dups(sigs=)``,
    so audio near-dup detection reuses the identical 4×16-bit pigeonhole
    LSH + Hamming verify the text and image modalities use. Assets
    shorter than the analysis window raise (synthesizers control
    length); real pipelines pad or gate upstream."""
    import pandas as pd

    n_bits = n_frames - 1
    if n_bits > 60:
        raise ValueError(f"{n_frames} frames need {n_bits} > 60 bits")
    need = n_frames * frame_len

    def _hash(batches):
        for pdf in batches:
            ids: list[int] = []
            sigs: list[int] = []
            for aid, buf in zip(pdf[id_col], pdf["content"]):
                s, _rate = decode_wav(bytes(buf))
                c0 = s[: need, 0].astype(np.int64)
                if c0.shape[0] < need:
                    raise ValueError(
                        f"asset {aid}: {c0.shape[0]} samples < {need} needed"
                    )
                e = (c0 * c0).reshape(n_frames, frame_len).sum(axis=1)
                bits = e[:-1] > e[1:]
                weights = np.left_shift(np.int64(1), np.arange(n_bits, dtype=np.int64))
                ids.append(int(aid))
                sigs.append(int(np.dot(bits.astype(np.int64), weights)))
            yield pd.DataFrame({"id": ids, "simhash": sigs})

    return assets.select(F.col(id_col), "content").mapInPandas(
        _hash, "id long, simhash long"
    )
