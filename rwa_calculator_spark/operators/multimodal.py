"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque `binary` columns with typed metadata structs.
The Spark-side machinery — schema, partition-preserving mapInPandas with
Arrow batches, UDF signatures, batch shapes — is real and tested; the
actual media decode is STUBBED (image/audio libraries are not in this
container): `decode_image` raises NotImplementedError and
`fake_image_features` is the deterministic stand-in used by tests and the
`multimodal_features` query.

At 100 TB: binary payloads never pass through the driver; mapInPandas
streams Arrow batches executor-side, and `spark.sql.files.maxPartitionBytes`
bounds the per-task payload. Feature outputs are narrow typed columns, so
everything downstream of extraction is ordinary columnar compute.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, first_byte long, checksum long"


def decode_image(payload: bytes):
    """Real decode (PIL/libvips) — not available in this container."""
    raise NotImplementedError(
        "media decode requires an image library not present in this environment; "
        "swap this stub for PIL.Image.open(io.BytesIO(payload)) in production"
    )


def fake_image_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode→feature-extract: byte length,
    first byte, and a rolling checksum (stable across engines/platforms)."""
    n = len(payload)
    first = payload[0] if n else -1
    checksum = 0
    for by in payload:
        checksum = (checksum * 31 + by) % 1_000_003
    return n, first, checksum


def extract_features(binary_df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over a binary column: one Arrow batch
    in, one narrow typed batch out. This is the exact pipeline shape a real
    decoder plugs into (replace fake_image_features with the real op)."""
    from rwa_calculator_spark.utils import ensure_workers_can_import

    ensure_workers_can_import(binary_df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[bin_col].map(fake_image_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": feats.map(lambda t: t[0]),
                    "first_byte": feats.map(lambda t: t[1]),
                    "checksum": feats.map(lambda t: t[2]),
                }
            )

    return binary_df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def documents_as_binary(documents: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal source: utf-8 payload bytes
    plus typed metadata — the schema a real image/audio table would carry."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("content_lang"),
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("content_length"),
        ).alias("meta"),
    )


def parse_image_header(payload: bytes) -> tuple[str, int, int]:
    """Real (stdlib-only) metadata extraction from image byte headers:
    (format, width, height) for PNG and baseline/progressive JPEG, without
    any decode library — the metadata half of decode is genuinely
    implementable today; only pixel decode stays stubbed."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return ("jpeg", -1, -1)
    return ("unknown", -1, -1)


IMAGE_META_SCHEMA = "doc_id long, format string, width long, height long"


def extract_image_metadata(binary_df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """mapInPandas over binary payloads → typed image metadata columns."""
    from rwa_calculator_spark.utils import ensure_workers_can_import

    ensure_workers_can_import(binary_df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[bin_col].map(parse_image_header)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "format": meta.map(lambda t: t[0]),
                    "width": meta.map(lambda t: t[1]),
                    "height": meta.map(lambda t: t[2]),
                }
            )

    return binary_df.mapInPandas(batches, schema=IMAGE_META_SCHEMA)
