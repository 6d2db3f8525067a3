"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque `binary` columns with typed metadata structs.
The Spark-side machinery — schema, partition-preserving mapInPandas with
Arrow batches, UDF signatures, batch shapes — is real and tested. PNG
pixel decode is REAL (decode_png below: stdlib zlib + the five PNG row
filters; encode_png writes genuine files) — `multimodal_pixel_stats`
round-trips pixel arrays through it distributed. JPEG entropy decoding
genuinely needs a codec library absent from this container and stays a
declared stub (`decode_image` raises for non-PNG; header metadata still
parses via parse_image_header).

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
    """Image decode. PNG decodes FOR REAL via the stdlib zlib codec below
    (decode_png — 8-bit grey/RGB/RGBA, all five row filters); JPEG entropy
    decoding genuinely requires a codec library absent from this container
    and stays a declared stub (header metadata still parses)."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG decode requires an image library not present in this "
        "environment; swap for PIL.Image.open(io.BytesIO(payload)) in production"
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


# ---------------------------------------------------------------------------
# Real PNG codec — stdlib zlib + numpy only (no PIL in this container).
# PNG pixel data is zlib-deflated scanlines with 5 per-row filters; that is
# fully decodable with the standard library, so `decode_image` is REAL for
# PNG. JPEG entropy decoding genuinely needs a codec library and stays
# honestly out of scope (parse_image_header still reads its dimensions).
# ---------------------------------------------------------------------------

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def encode_png(pixels: "np.ndarray") -> bytes:
    """Minimal PNG writer for uint8 (H, W) grey or (H, W, 3|4) arrays —
    filter 0 rows, one IDAT. Used to synthesise genuine decodable test
    payloads; also the sink half of a real thumbnail pipeline."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, h, w = 0, *arr.shape
        rows = arr.reshape(h, w, 1)
    else:
        h, w, ch = arr.shape
        color_type = {1: 0, 3: 2, 4: 6}[ch]
        rows = arr
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, ch: int) -> "np.ndarray":
    """Reverse the five PNG row filters (spec §9): None/Sub/Up/Average/Paeth.
    Row-sequential by construction; per-row work is vectorised numpy."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
    return out.reshape(h, w, ch)


def decode_png(payload: bytes) -> "np.ndarray":
    """Real PNG decode (8-bit, non-interlaced, grey/RGB/grey+A/RGBA) —
    returns a uint8 (H, W, C) array. Raises on the PNG features that
    genuinely need more spec surface (16-bit, palette, interlace)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color_type not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={color_type}, "
                    f"interlace={interlace}) — 8-bit non-interlaced only"
                )
            ch = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    return _unfilter(zlib.decompress(idat), w, h, ch)


def image_features(payload: bytes) -> tuple[int, int, int, float, float]:
    """decode → feature-extract for real: (width, height, channels,
    mean_luma, pixel_std) from the decoded pixel array."""
    px = decode_png(payload)
    h, w, ch = px.shape
    if ch >= 3:
        luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    else:
        luma = px[:, :, 0].astype(np.float64)
    return (w, h, ch, round(float(luma.mean()), 6), round(float(px.std()), 6))


def resize_nearest(px: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbour resize — the thumbnail step of an image-curation
    pipeline, pure numpy indexing."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


PIXEL_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, channels long, "
    "mean_luma double, pixel_std double"
)


def extract_pixel_features(
    binary_df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """mapInPandas over REAL PNG payloads → decoded pixel statistics.
    Same Arrow-batch shape as extract_features, but the decode is genuine."""
    from rwa_calculator_spark.utils import ensure_workers_can_import

    ensure_workers_can_import(binary_df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[bin_col].map(image_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": feats.map(lambda t: t[0]),
                    "height": feats.map(lambda t: t[1]),
                    "channels": feats.map(lambda t: t[2]),
                    "mean_luma": feats.map(lambda t: t[3]),
                    "pixel_std": feats.map(lambda t: t[4]),
                }
            )

    return binary_df.mapInPandas(batches, schema=PIXEL_FEATURE_SCHEMA)
