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


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary plumbing is exercised against real testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")).alias("meta"),
    )
