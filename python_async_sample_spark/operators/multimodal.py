"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. The decode libraries are not in this
container, so the *decode step itself* is stubbed (deterministic fake or
``NotImplementedError``) while everything Spark-side — schema, batch shape,
partitioning, UDF signatures — is real and tested.

At 100 TB the payload column dominates IO: kernels select only the columns
they need (column pruning keeps untouched payloads unread in parquet), and
feature extraction emits small fixed-width rows so downstream stages never
re-shuffle blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Wrap an existing binary column into the (payload, meta) convention."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    ).withColumnRenamed(payload_col, "payload")


def decode_stub(payload: bytes, fmt: str) -> bytes:
    """Real decoders (PIL/ffmpeg/soundfile) are not installed here.

    Raises so callers relying on true decoding fail loudly; the feature
    kernels below use deterministic byte-level fakes instead.
    """
    raise NotImplementedError(
        f"media decode for format={fmt!r} requires codec libraries not in this image"
    )


def extract_features(df: DataFrame, id_col: str) -> DataFrame:
    """Per-payload features via mapInPandas: byte length, an 8-bucket byte
    histogram, and a deterministic content digest. Stands in for real image
    feature extraction; the dataflow (binary in → fixed-width row out) is
    exactly the production shape."""
    out_schema = (
        f"{id_col} bigint, n_bytes bigint, digest string, "
        "hist array<bigint>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                hist = [0] * 8
                for byte in b:
                    hist[byte >> 5] += 1
                rows.append(
                    {
                        id_col: doc_id,
                        "n_bytes": len(b),
                        "digest": hashlib.md5(b).hexdigest(),
                        "hist": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "digest", "hist"])

    return df.select(id_col, "payload").mapInPandas(kernel, schema=out_schema)


def sample_frames(
    df: DataFrame, id_col: str, every_n_bytes: int = 64, frame_bytes: int = 16
) -> DataFrame:
    """Frame-sampling analog: emit one row per sampled "frame" (byte slice)
    of each payload — the explode-shaped dataflow video frame extraction
    produces. Deterministic byte slicing stands in for codec frame decode."""
    out_schema = f"{id_col} bigint, frame_no int, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    out.append(
                        {id_col: doc_id, "frame_no": i, "frame": b[off : off + frame_bytes]}
                    )
            yield pd.DataFrame(out, columns=[id_col, "frame_no", "frame"])

    return df.select(id_col, "payload").mapInPandas(kernel, schema=out_schema)
