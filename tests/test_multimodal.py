"""Multimodal decode seam: the same Spark dataflow must carry features from
whichever decoder is injected — the deterministic byte-level fake (default)
or a real stdlib-only BMP/WAV header decoder."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from python_async_sample_spark.operators.multimodal import (
    FakeByteDecoder,
    HeaderDecoder,
    attach_media,
    decode_media,
)


def _bmp_bytes(width: int, height: int, value: int) -> bytes:
    """Minimal 24-bpp uncompressed BMP with constant pixel value."""
    row = bytes([value] * (width * 3))
    pad = b"\x00" * ((4 - len(row) % 4) % 4)
    pixels = (row + pad) * height
    header_size = 14 + 40
    file_size = header_size + len(pixels)
    file_header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def _wav_bytes(rate: int, samples: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _media_df(spark, rows):
    # rows: (id, payload, fmt)
    dfs = []
    for i, payload, fmt in rows:
        df = spark.createDataFrame([(i, bytearray(payload))], "doc_id long, blob binary")
        dfs.append(attach_media(df, "blob", "image" if fmt == "bmp" else "audio", fmt))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def test_real_header_decoder_end_to_end(spark):
    bmp = _bmp_bytes(width=7, height=3, value=100)
    wav = _wav_bytes(rate=8000, samples=[1000, -1000, 500, -500])
    df = _media_df(spark, [(1, bmp, "bmp"), (2, wav, "wav")])

    rows = {r.doc_id: r for r in decode_media(df, "doc_id", HeaderDecoder()).collect()}
    img, aud = rows[1], rows[2]
    # genuinely parsed from the BMP header/pixel array, not byte-fakes
    assert (img.media_type, img.width, img.height, img.channels) == ("image", 7, 3, 3)
    assert img.mean_value == pytest.approx(100 * 21 * 3 / (24 * 3))  # row padding zeros
    assert (aud.media_type, aud.channels, aud.sample_rate, aud.n_samples) == (
        "audio", 1, 8000, 4,
    )
    assert aud.mean_value == pytest.approx(750.0)  # mean |int16 sample|


def test_default_fake_decoder_is_deterministic(spark):
    df = _media_df(spark, [(1, b"\x00\x02\x04", "bin")])
    r = decode_media(df, "doc_id").collect()[0]
    assert (r.media_type, r.width, r.height, r.channels) == ("image", 3, 1, 1)
    assert r.mean_value == pytest.approx(2.0)
    again = decode_media(df, "doc_id", FakeByteDecoder()).collect()[0]
    assert r == again


def test_unsupported_format_fails_loudly(spark):
    df = _media_df(spark, [(1, b"RIFF....WEBP", "webp")])
    with pytest.raises(Exception, match="cannot decode format='webp'"):
        decode_media(df, "doc_id", HeaderDecoder()).collect()


def _png_bytes(width: int, height: int, color_type: int = 2) -> bytes:
    import zlib

    ihdr = struct.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _jpeg_bytes(width: int, height: int, channels: int = 3) -> bytes:
    # SOI, APP0 (JFIF stub), DQT stub, SOF0, EOI — enough of a marker
    # stream to exercise the walk (length-bearing segments before SOF0)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof_payload = bytes([8]) + struct.pack(">HH", height, width) + bytes([channels])
    sof_payload += bytes([1, 0x11, 0]) * channels
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _gif_bytes(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def test_header_decoder_png_jpeg_gif(spark):
    df = _media_df(
        spark,
        [
            (1, _png_bytes(640, 480), "png"),
            (2, _jpeg_bytes(1920, 1080), "jpeg"),
            (3, _gif_bytes(13, 7), "gif"),
            (4, _png_bytes(2, 2, color_type=6), "png"),  # RGBA
        ],
    )
    rows = {r.doc_id: r for r in decode_media(df, "doc_id", HeaderDecoder()).collect()}
    assert (rows[1].format, rows[1].width, rows[1].height, rows[1].channels) == (
        "png", 640, 480, 3,
    )
    assert (rows[2].format, rows[2].width, rows[2].height, rows[2].channels) == (
        "jpeg", 1920, 1080, 3,
    )
    assert (rows[3].format, rows[3].width, rows[3].height, rows[3].channels) == (
        "gif", 13, 7, 3,
    )
    assert rows[4].channels == 4

    # corrupt magic bytes fail loudly, not silently
    bad = _media_df(spark, [(9, b"\x89PNX" + b"\x00" * 30, "png")])
    with pytest.raises(Exception, match="not a PNG payload"):
        decode_media(bad, "doc_id", HeaderDecoder()).collect()


def test_media_phash_invariants(spark):
    from python_async_sample_spark.operators.multimodal import attach_media, media_phash

    base = b"A" * 600 + b"B" * 424  # 1024 bytes, strong block structure
    near = b"A" * 600 + b"B" * 400 + b"C" * 24  # tail perturbation
    far = bytes(range(256)) * 4
    df = attach_media(
        spark.createDataFrame(
            [(1, base), (2, base), (3, near), (4, far), (5, b"")],
            "doc_id long, blob binary",
        ),
        "blob",
        media_type="image",
        fmt="png",
    )
    h = {r["doc_id"]: r["phash"] for r in media_phash(df, "doc_id").collect()}
    assert h[1] == h[2]  # identical payloads hash identically
    assert h[5] == 0  # empty payload → zero hash
    ham_near = bin((h[1] ^ h[3]) & (2**64 - 1)).count("1")
    ham_far = bin((h[1] ^ h[4]) & (2**64 - 1)).count("1")
    assert ham_near <= 3  # tail perturbation stays within blocking reach
    assert ham_far > ham_near  # unrelated content is farther away


def test_jpeg_fill_bytes_and_eoi(spark):
    """0xFF fill bytes before markers are legal JPEG padding; the marker
    walk must skip them, and an EOI before any SOF must fail loudly."""
    filled = b"\xff\xd8" + b"\xff\xff\xff" + _jpeg_bytes(64, 32)[2:]
    df = _media_df(spark, [(1, filled, "jpeg")])
    r = decode_media(df, "doc_id", HeaderDecoder()).collect()[0]
    assert (r.width, r.height) == (64, 32)

    no_sof = b"\xff\xd8\xff\xd9"
    bad = _media_df(spark, [(2, no_sof, "jpeg")])
    with pytest.raises(Exception, match="no SOF"):
        decode_media(bad, "doc_id", HeaderDecoder()).collect()


def _png_full(width, height, channels, scanlines):
    """Hand-build a real PNG from (filter_type, filtered_bytes) rows —
    filters are applied BY HAND in the fixtures below, so the decoder's
    unfiltering is certified against independently-written data, never
    against our own encoder."""
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">II", width, height) + bytes([8, color_type, 0, 0, 0])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = b"".join(bytes([f]) + bytes(line) for f, line in scanlines)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_pixel_decode_all_filter_types_golden():
    """Golden unfilter test (VERDICT r3 item 3): a 3×5 gray image whose
    rows use filter types 0,1,2,3,4 with hand-computed filtered bytes;
    the decoder must recover the exact intended pixel matrix."""
    from python_async_sample_spark.operators.multimodal import HeaderDecoder

    # intended pixels (3 wide, 5 tall):
    # row0: 10  20  30   filter 0 (None)   → stored 10 20 30
    # row1: 15  25  35   filter 1 (Sub)    → stored 15, 25-15=10, 35-25=10
    # row2: 20  30  40   filter 2 (Up)     → stored 20-15=5, 30-25=5, 40-35=5
    # row3: 25  35  45   filter 3 (Average): left0=0,up=20→pred 10, stored 15;
    #        x=35 left=25 up=30 → pred 27, stored 8; x=45 left=35 up=40 → 37, stored 8
    # row4: 30  40  50   filter 4 (Paeth): x=30 a=0 b=25 c=0 → pred 25, stored 5;
    #        x=40 a=30 b=35 c=25 → p=40 pa=10 pb=5 pc=15 → pred 35, stored 5;
    #        x=50 a=40 b=45 c=35 → p=50 pa=10 pb=5 pc=15 → pred 45, stored 5
    png = _png_full(3, 5, 1, [
        (0, [10, 20, 30]),
        (1, [15, 10, 10]),
        (2, [5, 5, 5]),
        (3, [15, 8, 8]),
        (4, [5, 5, 5]),
    ])
    d = HeaderDecoder().decode(png, "png")
    want = [10, 20, 30, 15, 25, 35, 20, 30, 40, 25, 35, 45, 30, 40, 50]
    assert (d.width, d.height, d.channels) == (3, 5, 1)
    assert d.mean_value == pytest.approx(sum(want) / len(want))
    # and the raw matrix itself, via the unfilter helper
    pix = HeaderDecoder._png_unfilter(
        b"".join(bytes([f]) + bytes(l) for f, l in [
            (0, [10, 20, 30]), (1, [15, 10, 10]), (2, [5, 5, 5]),
            (3, [15, 8, 8]), (4, [5, 5, 5]),
        ]), 3, 5, 1)
    assert list(pix) == want


def test_png_pixel_decode_rgb_sub_filter_uses_channel_offset():
    """Sub's 'left' is the same CHANNEL of the previous pixel, not the
    previous byte — an off-by-channels bug here decodes garbage for RGB."""
    from python_async_sample_spark.operators.multimodal import HeaderDecoder

    # one row, two RGB pixels: (10, 100, 200) then (20, 110, 210)
    # filter 1 (Sub): first pixel verbatim; second stores +10 per channel
    png = _png_full(2, 1, 3, [(1, [10, 100, 200, 10, 10, 10])])
    d = HeaderDecoder().decode(png, "png")
    want = [10, 100, 200, 20, 110, 210]
    assert (d.width, d.height, d.channels) == (2, 1, 3)
    assert d.mean_value == pytest.approx(sum(want) / len(want))


def test_png_pixel_decode_palette_maps_through_plte():
    import zlib

    from python_async_sample_spark.operators.multimodal import HeaderDecoder

    # 2×2 palette image, indices [[0,1],[1,0]]; palette: 0→(255,0,0), 1→(0,0,255)
    ihdr = struct.pack(">II", 2, 2) + bytes([8, 3, 0, 0, 0])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = b"\x00\x00\x01" + b"\x00\x01\x00"
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    d = HeaderDecoder().decode(png, "png")
    assert (d.width, d.height, d.channels) == (2, 2, 3)
    # pixels: 2×(255,0,0) + 2×(0,0,255) → mean = (255+255+255+255)/12
    assert d.mean_value == pytest.approx(1020 / 12)


def test_png_encoder_roundtrips_through_decoder():
    """encode_png is certified by decoding: mean equals the source bytes'
    mean exactly, multi-row, RGB and gray."""
    from python_async_sample_spark.operators.multimodal import HeaderDecoder, encode_png

    data = bytes(range(200)) * 3  # 600 bytes
    png = encode_png(data, width=20, height=10, channels=3)
    d = HeaderDecoder().decode(png, "png")
    assert (d.width, d.height, d.channels) == (20, 10, 3)
    assert d.mean_value == pytest.approx(sum(data) / len(data))

    gray = encode_png(data[:120], width=40, height=3, channels=1)
    g = HeaderDecoder().decode(gray, "png")
    assert (g.width, g.height, g.channels, g.mean_value) == (
        40, 3, 1, pytest.approx(sum(data[:120]) / 120))


def test_png_interlaced_or_16bit_refuses_loudly():
    import zlib

    from python_async_sample_spark.operators.multimodal import HeaderDecoder

    def build(depth, interlace):
        ihdr = struct.pack(">II", 1, 1) + bytes([depth, 0, 0, 0, interlace])

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00\x07"))
                + chunk(b"IEND", b""))

    with pytest.raises(NotImplementedError, match="bit depth 8"):
        HeaderDecoder().decode(build(16, 0), "png")
    with pytest.raises(NotImplementedError, match="interlace"):
        HeaderDecoder().decode(build(8, 1), "png")


def test_resize_images_png_golden(spark):
    """Nearest-neighbor resize of a known 4×4 gray PNG to 2×2: the output
    pixels must be exactly src[(y*4)//2][(x*4)//2] = {0,2,8,10}, the
    payload must re-decode as a real 2×2 PNG, and metadata must carry the
    new dimensions."""
    from python_async_sample_spark.operators.multimodal import (
        HeaderDecoder,
        attach_media,
        encode_png,
        resize_images,
    )

    src = bytes(range(16))  # 4x4 gray, pixel value = row*4+col
    payload = encode_png(src, 4, 4, 1)
    df = attach_media(
        spark.createDataFrame([(1, payload)], "doc_id bigint, p binary"),
        "p", "image", "png",
    )
    out = resize_images(df, "doc_id", 2, 2).collect()
    assert len(out) == 1
    row = out[0]
    assert row["media_meta"]["width"] == 2 and row["media_meta"]["height"] == 2
    assert row["media_meta"]["format"] == "png"
    w, h, c, pix = HeaderDecoder._png_pixels(bytes(row["payload"]))
    assert (w, h, c) == (2, 2, 1)
    assert list(pix) == [0, 2, 8, 10]

    # upscale replicates on the integer grid: 2x2 -> 4x4
    small = encode_png(bytes([10, 20, 30, 40]), 2, 2, 1)
    df2 = attach_media(
        spark.createDataFrame([(2, small)], "doc_id bigint, p binary"),
        "p", "image", "png",
    )
    up = resize_images(df2, "doc_id", 4, 4).collect()[0]
    _, _, _, pix4 = HeaderDecoder._png_pixels(bytes(up["payload"]))
    assert list(pix4) == [10, 10, 20, 20, 10, 10, 20, 20,
                          30, 30, 40, 40, 30, 30, 40, 40]


def test_resize_images_bmp_golden(spark):
    """BMP path: the kernel must undo 4-byte row padding and bottom-up
    row order before resampling — a 2×2 24-bpp BMP downsized to 1×1 must
    yield the TOP-LEFT pixel, not the bottom-left the raw byte order
    would suggest."""
    import struct

    from python_async_sample_spark.operators.multimodal import (
        HeaderDecoder,
        attach_media,
        resize_images,
    )

    # 2x2 BGR, rows stored bottom-up with 8-byte stride (2*3 padded to 8)
    top = [(1, 2, 3), (4, 5, 6)]      # logical top row, pixels (B,G,R)
    bot = [(7, 8, 9), (10, 11, 12)]   # logical bottom row
    rows_on_disk = [bot, top]         # bottom-up storage
    pix = b""
    for r in rows_on_disk:
        line = b"".join(bytes(p) for p in r)
        pix += line + b"\x00" * (8 - len(line))
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 0, 0, 0, 0)
    )
    payload = header + pix
    # sanity: the pixel reader sees the logical TOP row first
    w, h, c, flat = HeaderDecoder._bmp_pixels(payload)
    assert (w, h, c) == (2, 2, 3)
    assert list(flat[:3]) == [1, 2, 3]

    df = attach_media(
        spark.createDataFrame([(3, payload)], "doc_id bigint, p binary"),
        "p", "image", "bmp",
    )
    out = resize_images(df, "doc_id", 1, 1).collect()[0]
    _, _, _, one = HeaderDecoder._png_pixels(bytes(out["payload"]))
    assert list(one) == [1, 2, 3]  # top-left pixel, channels preserved


def test_resize_images_refuses_codec_formats(spark):
    """Formats needing real codec libs raise inside the kernel — the
    honest stub contract the brief requires (plumbing real, decode
    swappable)."""
    import pytest as _p

    from python_async_sample_spark.operators.multimodal import (
        attach_media,
        resize_images,
    )

    df = attach_media(
        spark.createDataFrame([(4, b"\xff\xd8rest")], "doc_id bigint, p binary"),
        "p", "image", "jpeg",
    )
    with _p.raises(Exception, match="codec|NotImplemented"):
        resize_images(df, "doc_id", 2, 2).collect()
    with _p.raises(ValueError, match="positive"):
        resize_images(df, "doc_id", 0, 2)


def test_media_ahash_portable_golden_and_contracts(spark):
    """Integer-exact aHash (q225's kernel): a hand-computable 128-byte
    image must produce the exactly-predicted signature through the REAL
    PNG encode→decode path, and the contract violations (pixel count not
    a multiple of 64, non-gray PNG) must fail loudly."""
    import pytest

    from python_async_sample_spark.operators.multimodal import (
        encode_png,
        media_ahash_portable,
    )

    # blocks of 2 bytes: block i = bytes (2i, 2i+1). Make blocks 0..31
    # carry value 10 and blocks 32..63 carry value 20 -> total = 64*30,
    # threshold 64*sum_b > 64*30 <=> sum_b > 30: exactly the high half.
    px = bytes([10] * 64 + [20] * 64)
    expected = sum(1 << i for i in range(32, 64))
    expected_signed = expected - (1 << 64) if expected >= (1 << 63) else expected
    blob = encode_png(px, 16, 8, channels=1)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    [row] = media_ahash_portable(df, "doc_id").collect()
    assert row["phash"] == expected_signed

    # all-equal pixels: strict > means NO bit is set (mean ties are 0)
    flat = encode_png(bytes([7] * 128), 16, 8, channels=1)
    df2 = spark.createDataFrame([(2, bytearray(flat))], "doc_id long, blob binary")
    assert media_ahash_portable(df2, "doc_id").collect()[0]["phash"] == 0

    # pixel count not a multiple of 64 fails loudly
    bad = encode_png(bytes([1] * 90), 10, 9, channels=1)
    df3 = spark.createDataFrame([(3, bytearray(bad))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="multiple of 64"):
        media_ahash_portable(df3, "doc_id").collect()

    # non-gray (RGB) PNG fails loudly
    rgb = encode_png(bytes([1] * 192), 8, 8, channels=3)
    df4 = spark.createDataFrame([(4, bytearray(rgb))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="gray"):
        media_ahash_portable(df4, "doc_id").collect()
