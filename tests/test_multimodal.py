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
