"""Sinks (SURVEY §2.1 S10-S15, S17) — the reference's MySQL insert/update
surface re-expressed as parquet writers + id-assignment expressions.

Mutation model: Spark storage is immutable, so
- S10/S11 (row + bulk insert with autoincrement ids) become one APPEND of
  a whole DataFrame with DETERMINISTIC ids (content hash via md5_60, or
  max+row_number sequences via operators.get_or_create) — the
  row-at-a-time `lib/database.py:146-186` loop becomes a single write job.
- S12 (UPDATE ... WHERE) becomes snapshot overwrite (catalog.write_snapshot)
  or dynamic PARTITION overwrite (`overwrite_partitions`): partition the
  table on the mutation key so an update rewrites one partition, not the
  world (`lib/database.py:188-208`).
- S13 (S3) is a path scheme: Spark reads/writes `s3a://` natively; the
  engine provides the reference's URL-rewrite expression
  (`lib/aws_s3.py:93-257` path -> s3 URL mapping).
- S14/S15 (protobuf chunks, PNG previews) are binary-encoding expressions/
  UDFs producing `binary` columns; the bytes are written with any
  DataFrame writer (parquet keeps them splittable; foreachPartition can
  emit one object per row when a filesystem layout is required).
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType


def append_with_ids(
    df: DataFrame,
    path: str,
    id_col: str = "id",
    natural_key: Column | None = None,
) -> None:
    """S10/S11: bulk append with deterministic ids (md5_60 of the natural
    key — reproducible across runs/executors, no autoincrement
    coordination; SURVEY §7.3)."""
    from loris_mri_spark.functions.texthash import md5_60

    if natural_key is not None:
        df = df.withColumn(id_col, md5_60(natural_key))
    df.write.mode("append").parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """S12 at scale: dynamic partition overwrite — only the partitions
    present in ``df`` are replaced (the UPDATE-one-upload pattern:
    partition on TarchiveID/upload id)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def to_s3_url(path_col: Column | str, bucket: str) -> Column:
    """S13: the reference's local-path -> S3 URL rewrite
    (`push_imaging_files_to_s3_pipeline.py`; `aws_s3.py:93-257`). Reading/
    writing the returned URLs is native (s3a://) when the cluster has the
    S3 filesystem connector; no engine code is required."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.concat(
        F.lit(f"s3://{bucket}/"), F.regexp_replace(c, r"^.*?([^/]+/[^/]+)$", "$1")
    )


def encode_float_chunk(
    index_col: Column, downsampling_col: Column, samples_col: Column
) -> Column:
    """S14: FloatChunk binary encoding (`chunking.py:134-157` writes
    protobuf `FloatChunk(index, downsampling, samples)` blobs). The engine
    encodes the same record with a fixed little-endian layout
    [i32 index][i32 downsampling][i32 n][f32 * n] — a public,
    dependency-free framing the viewer shim can read; swap in protobuf
    serialization inside the same UDF when the runtime has it."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _enc(idx: pd.Series, ds: pd.Series, samples: pd.Series) -> pd.Series:
        out = []
        for i, d, s in zip(idx, ds, samples):
            vals = [float(x) for x in s]
            out.append(
                struct.pack("<iii", int(i), int(d), len(vals))
                + struct.pack(f"<{len(vals)}f", *vals)
            )
        return pd.Series(out)

    return _enc(index_col, downsampling_col, samples_col)


def decode_float_chunk(payload: bytes) -> tuple[int, int, list[float]]:
    """Round-trip decoder for tests/viewer shims."""
    index, ds, n = struct.unpack_from("<iii", payload, 0)
    vals = list(struct.unpack_from(f"<{n}f", payload, 12))
    return index, ds, vals


def png_preview(gray_rows: list[list[int]]) -> bytes:
    """S15: minimal REAL grayscale PNG encoder (stdlib zlib/struct) — the
    reference renders ortho-slice previews via nilearn
    (`imaging.py:1176-1219`); the engine's preview sink writes true PNG
    bytes so any viewer opens them. The pixel source is the caller's
    (real slice data, or a deterministic thumbnail of it)."""
    h = len(gray_rows)
    w = len(gray_rows[0]) if h else 0

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(row) for row in gray_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def png_preview_udf(content_col: Column, size: int = 8) -> Column:
    """Preview-sink UDF: derive a deterministic ``size x size`` grayscale
    thumbnail from a binary column and encode it as a real PNG."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def _png(content: pd.Series) -> pd.Series:
        out = []
        for blob in content:
            b = bytes(blob)
            rows = [
                [b[(r * size + c) % len(b)] if b else 0 for c in range(size)]
                for r in range(size)
            ]
            out.append(png_preview(rows))
        return pd.Series(out)

    return _png(content_col)
