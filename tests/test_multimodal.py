from __future__ import annotations

import pytest

from rwa_calculator_spark.operators.multimodal import (
    decode_image,
    documents_as_binary,
    extract_features,
    fake_image_features,
)
from rwa_calculator_spark.sources.star import load_table


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_features_deterministic():
    assert fake_image_features(b"abc") == (3, 97, 97 * 31 * 31 + 98 * 31 + 99)
    assert fake_image_features(b"") == (0, -1, 0)


def test_binary_pipeline_schema_and_values(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    bin_df = documents_as_binary(d)
    assert dict(bin_df.dtypes)["payload"] == "binary"
    assert "struct" in dict(bin_df.dtypes)["meta"]
    feats = extract_features(bin_df)
    rows = {r.doc_id: r for r in feats.collect()}
    for r in d.collect():
        n, first, checksum = fake_image_features(r.text.encode("utf-8"))
        got = rows[r.doc_id]
        assert (got.n_bytes, got.first_byte, got.checksum) == (n, first, checksum)


def test_image_header_parsing(spark):
    import struct
    import zlib

    from pyspark.sql import functions as F

    from rwa_calculator_spark.operators.multimodal import (
        extract_image_metadata,
        parse_image_header,
    )

    def png_bytes(w, h):
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    def jpeg_bytes(w, h):
        sof = b"\xff\xc0" + struct.pack(">H", 8 + 3) + b"\x08" + struct.pack(">HH", h, w)
        return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof

    assert parse_image_header(png_bytes(640, 480)) == ("png", 640, 480)
    assert parse_image_header(jpeg_bytes(1024, 768)) == ("jpeg", 1024, 768)
    assert parse_image_header(b"not an image")[0] == "unknown"

    rows = [(1, png_bytes(640, 480)), (2, jpeg_bytes(320, 240)), (3, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.format, r.width, r.height) for r in extract_image_metadata(df).collect()}
    assert got == {1: ("png", 640, 480), 2: ("jpeg", 320, 240), 3: ("unknown", -1, -1)}


def test_png_codec_roundtrip_all_shapes():
    """encode→decode is the identity for grey / RGB / RGBA arrays."""
    import numpy as np

    from rwa_calculator_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(42)
    for shape in [(7, 5), (1, 1), (8, 6, 3), (4, 9, 4), (32, 17, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = decode_png(encode_png(px))
        assert (back == px.reshape(px.shape[0], px.shape[1], -1)).all(), shape


def test_png_decoder_handles_all_five_filters():
    """A PNG whose rows use filters 1-4 (Sub/Up/Average/Paeth) — written
    by a reference-faithful encoder here — must decode to the original
    pixels; real-world encoders emit exactly these."""
    import struct
    import zlib

    import numpy as np

    from rwa_calculator_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    flat = px.reshape(4, 12)
    rows, prev = [], np.zeros(12, dtype=int)
    for y, f in enumerate([1, 2, 3, 4]):
        row = flat[y].astype(int)
        enc = np.zeros(12, dtype=np.uint8)
        for x in range(12):
            a = row[x - 3] if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (row[x] - pred) & 0xFF
        rows.append(bytes([f]) + enc.tobytes())
        prev = flat[y]

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(payload) == px).all()


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import numpy as np
    import pytest

    from rwa_calculator_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth is declared out of scope, not silently mis-decoded
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(deep)
    # decode_image: PNG path real, JPEG path honestly stubbed
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(encode_png(px)).shape == (2, 2, 3)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jpegdata")


def test_resize_and_features():
    import numpy as np

    from rwa_calculator_spark.operators.multimodal import (
        encode_png,
        image_features,
        resize_nearest,
    )

    px = np.arange(96, dtype=np.uint8).reshape(8, 4, 3)
    w, h, ch, luma, std = image_features(encode_png(px))
    assert (w, h, ch) == (4, 8, 3)
    expect_luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean()
    assert abs(luma - expect_luma) < 1e-6
    small = resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    # nearest-neighbour picks exact source pixels, never interpolates
    assert all(v in px for v in small.flatten())
