"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels. Decoding goes through a pluggable
``MediaDecoder`` seam: production injects a codec-backed implementation;
this container defaults to a deterministic byte-level fake
(``FakeByteDecoder``) plus a stdlib-only REAL header decoder for BMP/WAV
(``HeaderDecoder``) proving the seam end-to-end. Everything Spark-side —
schema, batch shape, partitioning, UDF signatures — is identical whichever
decoder is plugged in.

At 100 TB the payload column dominates IO: kernels select only the columns
they need (column pruning keeps untouched payloads unread in parquet), and
feature extraction emits small fixed-width rows so downstream stages never
re-shuffle blobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

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


@dataclass(frozen=True)
class Decoded:
    """Decoder-independent result record a decode kernel emits per payload."""

    media_type: str  # image / audio
    format: str
    width: int | None = None
    height: int | None = None
    channels: int | None = None
    sample_rate: int | None = None
    n_samples: int | None = None
    mean_value: float | None = None  # mean pixel / |sample| from real content


class MediaDecoder:
    """Pluggable decode seam. Production swaps in a codec-backed
    implementation (PIL/ffmpeg/soundfile); the Spark dataflow — schema,
    batching, partitioning — is identical whichever decoder is injected."""

    def decode(self, payload: bytes, fmt: str) -> Decoded:  # pragma: no cover
        raise NotImplementedError(
            f"media decode for format={fmt!r} requires codec libraries not in this image"
        )


class FakeByteDecoder(MediaDecoder):
    """Default, codec-free stand-in: deterministically 'decodes' any payload
    as a 1×N 8-bit gray image whose pixels are the raw bytes. Keeps every
    gate query runnable in this container with stable values."""

    def decode(self, payload: bytes, fmt: str) -> Decoded:
        b = bytes(payload)
        return Decoded(
            media_type="image",
            format=fmt,
            width=len(b),
            height=1 if b else 0,
            channels=1,
            mean_value=(sum(b) / len(b)) if b else None,
        )


class HeaderDecoder(MediaDecoder):
    """Stdlib-only REAL decoder: full pixel/sample decode for uncompressed
    BMP images and PCM WAV audio, plus header-level decode (dimensions,
    channels — magic-byte parsing, no codec) for PNG, JPEG and GIF. Proves
    the seam carries genuinely decoded features end-to-end without codec
    libraries; pixel-level decode of the compressed formats would slot in
    behind the same method. Other formats raise, loudly, like the
    production decoder would for an unsupported codec."""

    def decode(self, payload: bytes, fmt: str) -> Decoded:
        b = bytes(payload)
        if fmt == "bmp":
            return self._bmp(b)
        if fmt == "wav":
            return self._wav(b)
        if fmt == "png":
            return self._png(b)
        if fmt in ("jpeg", "jpg"):
            return self._jpeg(b)
        if fmt == "gif":
            return self._gif(b)
        raise NotImplementedError(f"HeaderDecoder cannot decode format={fmt!r}")

    @staticmethod
    def _png(b: bytes) -> Decoded:
        # PNG: 8-byte signature, then the IHDR chunk (must be first):
        # 4-byte length, b"IHDR", width/height (big-endian u32),
        # bit depth, color type
        import struct

        if b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
            raise ValueError("not a PNG payload")
        width, height = struct.unpack_from(">II", b, 16)
        bit_depth, color_type = b[24], b[25]
        channel_map = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
        if color_type not in channel_map:
            raise ValueError(f"unknown PNG color type {color_type}")
        channels = channel_map[color_type]
        del bit_depth
        return Decoded(
            media_type="image", format="png",
            width=width, height=height, channels=channels,
        )

    @staticmethod
    def _jpeg(b: bytes) -> Decoded:
        # JPEG: walk the marker stream to the first SOFn (start-of-frame)
        # segment, which carries height/width (big-endian u16) + components
        import struct

        if b[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload")
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                i += 1  # 0xFF fill byte before a marker — skip it
                continue
            if marker == 0xD9:
                break  # EOI before any SOF
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack_from(">H", b, i + 2)[0]
            # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 10 > len(b):
                    # truncated mid-SOF: keep the decoder's ValueError
                    # contract (struct.error would fail the Arrow task)
                    raise ValueError("truncated JPEG SOF segment")
                height, width = struct.unpack_from(">HH", b, i + 5)
                channels = b[i + 9]
                return Decoded(
                    media_type="image", format="jpeg",
                    width=width, height=height, channels=channels,
                )
            i += 2 + seg_len
        raise ValueError("JPEG payload has no SOF marker")

    @staticmethod
    def _gif(b: bytes) -> Decoded:
        # GIF87a/89a: 6-byte signature, then logical-screen width/height
        # (little-endian u16)
        import struct

        if b[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF payload")
        width, height = struct.unpack_from("<HH", b, 6)
        return Decoded(
            media_type="image", format="gif",
            width=width, height=height, channels=3,
        )

    @staticmethod
    def _bmp(b: bytes) -> Decoded:
        import struct

        if b[:2] != b"BM":
            raise ValueError("not a BMP payload")
        pixel_off = struct.unpack_from("<I", b, 10)[0]
        width, height = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        pixels = b[pixel_off:]
        return Decoded(
            media_type="image",
            format="bmp",
            width=width,
            height=abs(height),
            channels=bpp // 8,
            mean_value=(sum(pixels) / len(pixels)) if pixels else None,
        )

    @staticmethod
    def _wav(b: bytes) -> Decoded:
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(b)) as w:
            channels, sampwidth = w.getnchannels(), w.getsampwidth()
            rate, n = w.getframerate(), w.getnframes()
            frames = w.readframes(n)
        if sampwidth == 2:
            vals = struct.unpack(f"<{len(frames) // 2}h", frames)
            mean = (sum(abs(v) for v in vals) / len(vals)) if vals else None
        else:
            mean = (sum(frames) / len(frames)) if frames else None
        return Decoded(
            media_type="audio",
            format="wav",
            channels=channels,
            sample_rate=rate,
            n_samples=n,
            mean_value=mean,
        )


DECODED_SCHEMA = (
    "media_type string, format string, width int, height int, channels int, "
    "sample_rate int, n_samples int, mean_value double"
)


def decode_media(
    df: DataFrame,
    id_col: str,
    decoder: MediaDecoder | None = None,
    fmt_col: str = "media_meta",
) -> DataFrame:
    """Decode every payload through the injected ``decoder`` (default: the
    deterministic byte-level fake) — one Arrow batch in, one fixed-width
    feature row out per payload; blobs never leave the kernel."""
    decoder = decoder if decoder is not None else FakeByteDecoder()
    out_schema = f"{id_col} bigint, {DECODED_SCHEMA}"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, fmt in zip(
                pdf[id_col], pdf["payload"], pdf["_fmt"]
            ):
                d = decoder.decode(bytes(payload), fmt)
                rows.append({id_col: doc_id, **vars(d)})
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "media_type", "format", "width", "height",
                    "channels", "sample_rate", "n_samples", "mean_value",
                ],
            )

    return df.select(
        id_col, "payload", F.col(f"{fmt_col}.format").alias("_fmt")
    ).mapInPandas(kernel, schema=out_schema)


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


def media_phash(df: DataFrame, id_col: str) -> DataFrame:
    """64-bit average-hash (aHash) per payload: the decoded pixel/sample
    byte stream is resampled into 64 buckets and each bit records whether
    its bucket's mean exceeds the global mean.

    The standard perceptual fingerprint for media dedup at corpus scale:
    fixed-width, mergeable, and near-dup payloads land within a few bits.
    Identical payloads hash identically by construction — the completeness
    invariant the q87 gate query enforces in-plan. Runs as one Arrow kernel
    over the payload column; only (id, 64-bit hash) leaves it.
    """
    import numpy as np

    out_schema = f"{id_col} bigint, phash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b) == 0:
                    ids.append(doc_id)
                    hashes.append(0)
                    continue
                # resample to 64 buckets (pad to a multiple of 64)
                pad = (-len(b)) % 64
                v = np.pad(b, (0, pad), mode="edge").astype(np.float64)
                buckets = v.reshape(64, -1).mean(axis=1)
                bits = buckets > v.mean()
                h = 0
                for i, bit in enumerate(bits):
                    if bit:
                        h |= 1 << i
                # to signed 64-bit for Spark's LongType
                ids.append(doc_id)
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return df.select(id_col, "payload").mapInPandas(kernel, schema=out_schema)
