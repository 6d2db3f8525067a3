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
