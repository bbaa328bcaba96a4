"""Binary-sink integrity checks (S14 chunk framing, S15 PNG structure)."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table
from loris_mri_spark.sinks import decode_float_chunk, encode_float_chunk, png_preview_udf

workload.load_all()


def test_float_chunk_golden_wire_bytes():
    """Byte-identical to chunk_pb2.FloatChunk(...).SerializeToString():
    golden vectors derived from the proto3 wire spec for the message
    `int64 index=1; int64 downsampling=2; int64 cutoff=3;
    repeated float samples=4` (packed)."""
    from loris_mri_spark.sinks import pb_encode_float_chunk

    got = pb_encode_float_chunk(3, 2, 4, [1.0, -2.5, 0.0, 3.14])
    want = bytes.fromhex(
        "0803" "1002" "1804" "2210"
        "0000803f" "000020c0" "00000000" "c3f54840"
    )
    assert got == want
    # proto3 zero-value omission: index=0 and empty samples drop out
    assert pb_encode_float_chunk(0, 1, 2, []) == bytes.fromhex("1001" "1802")
    # multi-byte varint: 300 = 0xAC 0x02
    assert pb_encode_float_chunk(300, 0, 0, []) == bytes.fromhex("08ac02")


def test_float_chunk_roundtrip(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(5)
    enc = e.select(
        "vec_id",
        F.col("embedding").alias("samples"),
        encode_float_chunk(F.lit(7), F.lit(2), F.col("embedding")).alias("payload"),
    ).collect()
    for r in enc:
        idx, ds, cutoff, vals = decode_float_chunk(bytes(r["payload"]))
        assert (idx, ds) == (7, 2)
        assert cutoff == 64 and len(vals) == 64
        for a, b in zip(vals, r["samples"]):
            assert abs(a - b) < 1e-6


def test_png_preview_is_valid_png(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(3)
    rows = d.select(png_preview_udf(F.encode("text", "utf-8")).alias("png")).collect()
    for r in rows:
        b = bytes(r["png"])
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        # walk chunks, verify CRCs, find IHDR 8x8 grayscale + IDAT inflates
        pos = 8
        seen = []
        while pos < len(b):
            (length,) = struct.unpack_from(">I", b, pos)
            tag = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
            assert crc == (zlib.crc32(tag + data) & 0xFFFFFFFF)
            seen.append(tag)
            if tag == b"IHDR":
                w, h, depth, color = struct.unpack_from(">IIBB", data, 0)
                assert (w, h, depth, color) == (8, 8, 8, 0)
            if tag == b"IDAT":
                raw = zlib.decompress(data)
                assert len(raw) == 8 * 9  # 8 rows x (1 filter byte + 8 px)
            pos += 12 + length
        assert seen[0] == b"IHDR" and seen[-1] == b"IEND" and b"IDAT" in seen


def test_s13_fs_transfer_semantics(spark, tmp_path):
    """The aws_s3.py upload/download/delete/exists surface on Hadoop
    FileSystem with file:// scheme — identical calls hit s3a:// on a
    connector-equipped cluster."""
    from loris_mri_spark.sinks import fs_copy, fs_delete, fs_exists

    src = tmp_path / "src.txt"
    src.write_bytes(b"scan payload")
    src_url = f"file://{src}"
    dst_url = f"file://{tmp_path}/remote/uploaded.txt"

    assert fs_exists(spark, src_url)
    assert not fs_exists(spark, dst_url)
    fs_copy(spark, src_url, dst_url)                # upload
    assert fs_exists(spark, dst_url)
    back_url = f"file://{tmp_path}/back.txt"
    fs_copy(spark, dst_url, back_url)               # download
    assert (tmp_path / "back.txt").read_bytes() == b"scan payload"
    assert fs_delete(spark, dst_url) is True        # delete
    assert not fs_exists(spark, dst_url)
    assert fs_delete(spark, dst_url) is False       # idempotent delete


def test_write_keyed_store_embeds_bloom_filter(spark, tmp_path):
    """The bloom-filtered store write must (a) round-trip identically and
    (b) actually embed the filter — pinned via the on-disk footprint
    delta, since this pyarrow build does not surface bloom offsets."""
    import glob
    import os

    from loris_mri_spark.sinks import write_keyed_store

    df = spark.range(2000).selectExpr(
        "md5(cast(id as string)) AS fingerprint"
    ).coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.parquet(plain)
    write_keyed_store(df, bloomed, "fingerprint", expected_ndv=2000)

    a = sorted(r["fingerprint"] for r in spark.read.parquet(plain).collect())
    b = sorted(r["fingerprint"] for r in spark.read.parquet(bloomed).collect())
    assert a == b and len(a) == 2000

    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    # an ndv=2000 split-block bloom adds >= 1 KiB per file
    assert size(bloomed) >= size(plain) + 1024


def test_encode_float_chunk_arrow_matches_row_encoder(spark):
    """The r10 arrow_udf expression encoder must be BYTE-IDENTICAL to
    pb_encode_float_chunk per row across the wire-format edges: zero
    index (field omitted), varint boundaries (127/128/300), empty
    sample arrays, negative/zero/fractional float32 values, and ragged
    lengths — the same equivalence contract the writer kernels pin in
    tests/test_pyds.py, here for the Column path."""
    import struct as _struct

    from loris_mri_spark.sinks import pb_encode_float_chunk

    rows = [
        (0, 1, [1.5, -2.25, 0.0]),
        (1, 0, []),
        (127, 2, [3.14159, 2.71828]),
        (128, 300, [0.0]),
        (300, 7, [float(i) * 0.5 - 8.0 for i in range(37)]),
        (2**33, 1, [1e-30, -1e30]),
        (5, 5, [0.1]),
    ]
    df = spark.createDataFrame(
        rows, "index long, downsampling long, samples array<float>"
    )
    got = {
        r["index"]: bytes(r["payload"])
        for r in df.select(
            "index",
            encode_float_chunk(
                F.col("index"), F.col("downsampling"), F.col("samples")
            ).alias("payload"),
        ).collect()
    }
    for idx, ds, samples in rows:
        f32 = [
            _struct.unpack("<f", _struct.pack("<f", x))[0] for x in samples
        ]
        expected = pb_encode_float_chunk(idx, ds, len(f32), f32)
        assert got[idx] == expected, (idx, ds, len(samples))
