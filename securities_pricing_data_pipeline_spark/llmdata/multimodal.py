"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row-by-row. The actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` by default, and ``extract_features`` uses a
deterministic byte-level extractor so the Spark-side plumbing — schema,
batching, partition sizing — is real and tested end to end.

Scale notes: binary payloads dominate row size, so feature extraction
should run on a layout partitioned for ~128 MB input splits; the output
(small feature rows) is naturally re-coalesced by AQE. Never collect
binary columns to the driver.
"""

from __future__ import annotations

import hashlib
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


def decode_image(content: bytes):  # pragma: no cover - stub
    """Real decoder hook (PIL/libvips at deploy time). Stubbed here."""
    raise NotImplementedError("image codecs are not available in this environment")


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
    """Resize plumbing: payload → fixed-size thumbnail buffer.

    The decode→resample→encode step needs PIL/libvips (absent here), so
    the deterministic stand-in truncates the payload to the ``width ×
    height`` buffer size; schema (same asset row, replaced content +
    meta) and Arrow batching are production-shaped. ``decode_image``
    raising NotImplementedError marks the real hook.
    """
    import pandas as pd

    cap = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = pdf["content"].map(lambda b: None if b is None else b[:cap])
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**(m or {}), "resized": f"{width}x{height}"}
            )
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
