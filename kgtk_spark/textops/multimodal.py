"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched ``mapInPandas`` stages.
The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the
decode step is a clearly-marked stub: ``extract_features_stub`` computes
deterministic byte-level features (length, sha-derived checksum bucket,
a fixed-width byte histogram) through the exact schema / partitioning /
batch shape a real extractor would use — swap the inner function for a
real decoder on a cluster with the codec libs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str = "text", media_type: str = "image/fake"
) -> DataFrame:
    """Demo payload builder: encodes a string column as the binary blob
    (stand-in for real WARC media bytes) + typed metadata struct."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("checksum"),
        ),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy_bucket", T.IntegerType()),
        T.StructField("histogram", T.ArrayType(T.IntegerType())),
    ]
)


def _decode_real(payload: bytes):
    """The real decoder hook. Not available in this container."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/av) not present in "
        "this environment; extract_features_stub uses deterministic "
        "byte-level features instead"
    )


def extract_features_stub(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", bins: int = 16
) -> DataFrame:
    """Arrow-batched feature extraction with a deterministic fake decode.

    Real Spark plumbing (mapInPandas, fixed output schema, per-batch
    numpy); fake inner transform (byte histogram instead of pixels).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, buckets, hists = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr // (256 // bins), minlength=bins)[:bins]
                digest = hashlib.sha256(b).digest()
                ids.append(int(i))
                sizes.append(len(b))
                buckets.append(int(digest[0]) % bins)
                hists.append([int(x) for x in hist])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": sizes,
                    "byte_entropy_bucket": buckets,
                    "histogram": hists,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )
