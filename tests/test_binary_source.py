"""binaryFile source → multimodal decode seam, end to end on real files."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from python_async_sample_spark.operators.multimodal import (
    HeaderDecoder,
    attach_media,
    decode_media,
)
from python_async_sample_spark.sources.readers import read_binary_dir
from tests.test_multimodal import _bmp_bytes, _gif_bytes, _png_bytes, _wav_bytes


def test_binary_dir_to_decoded_features(spark):
    d = tempfile.mkdtemp(prefix="binsrc_")
    files = {
        "a.bmp": _bmp_bytes(5, 2, 10),
        "b.wav": _wav_bytes(16000, [100, -100]),
        "c.png": _png_bytes(320, 200),
        "d.gif": _gif_bytes(4, 4),
    }
    for name, payload in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)

    raw = read_binary_dir(spark, d)
    rows = {os.path.basename(r.path): r for r in raw.collect()}
    assert set(rows) == set(files)
    assert rows["a.bmp"].fmt == "bmp" and bytes(rows["a.bmp"].content) == files["a.bmp"]
    assert all(r.length == len(files[n]) for n, r in rows.items())

    # feed the decode seam: per-file format drives decoder dispatch
    # (decode_media ids are bigint — derive a stable id from the path)
    ids = raw.select(
        F.xxhash64("path").alias("doc_id"), "path", "fmt", F.col("content").alias("blob")
    )
    id_to_name = {r.doc_id: os.path.basename(r.path) for r in ids.collect()}
    decoded = {}
    for fmt in ("bmp", "wav", "png", "gif"):
        sub = attach_media(
            ids.where(F.col("fmt") == fmt).select("doc_id", "blob"),
            "blob",
            "audio" if fmt == "wav" else "image",
            fmt,
        )
        for r in decode_media(sub, "doc_id", HeaderDecoder()).collect():
            decoded[id_to_name[r.doc_id]] = r
    assert (decoded["a.bmp"].width, decoded["a.bmp"].height) == (5, 2)
    assert decoded["b.wav"].sample_rate == 16000
    assert (decoded["c.png"].width, decoded["c.png"].height) == (320, 200)
    assert (decoded["d.gif"].width, decoded["d.gif"].height) == (4, 4)


def test_binary_dir_glob_and_size_guard(spark):
    d = tempfile.mkdtemp(prefix="binsrc2_")
    with open(os.path.join(d, "small.bmp"), "wb") as f:
        f.write(_bmp_bytes(2, 2, 1))
    with open(os.path.join(d, "big.bmp"), "wb") as f:
        f.write(_bmp_bytes(64, 64, 1))
    with open(os.path.join(d, "other.txt"), "wb") as f:
        f.write(b"not media")

    only_bmp = read_binary_dir(spark, d, glob="*.bmp")
    assert {os.path.basename(r.path) for r in only_bmp.collect()} == {
        "small.bmp",
        "big.bmp",
    }

    capped = read_binary_dir(spark, d, glob="*.bmp", max_bytes=200)
    rows = {os.path.basename(r.path): r for r in capped.collect()}
    # over-cap rows are KEPT as dead-letterable metadata rows (NULL content)
    assert set(rows) == {"small.bmp", "big.bmp"}
    assert rows["small.bmp"].content is not None
    assert rows["big.bmp"].content is None


def test_oversized_files_kept_with_null_content(spark, tmp_path):
    """Review fix: rows over max_bytes keep (path, length, fmt) with NULL
    content — dead-letterable, never silently vanished."""
    from python_async_sample_spark.sources.readers import read_binary_dir

    small, big = tmp_path / "a.bin", tmp_path / "b.bin"
    small.write_bytes(b"x" * 10)
    big.write_bytes(b"y" * 1000)
    df = read_binary_dir(spark, str(tmp_path), max_bytes=100)
    rows = {r["length"]: r for r in df.collect()}
    assert set(rows) == {10, 1000}
    assert rows[10]["content"] is not None
    assert rows[1000]["content"] is None and rows[1000]["path"].endswith("b.bin")
