"""NIfTI-1 header reader — SURVEY §2.1 S4.

Reference: `/root/reference/python/lib/imaging_lib/nifti.py:7-30` loads
shape/zooms via nibabel and projects xstep..zstep / xspace..zspace / time
(`imaging.py:1221-1258`). The NIfTI-1 header is a PUBLIC fixed 348-byte
struct, so the engine parses it with stdlib `struct` — no nibabel needed
for the header surface; gzipped files are handled transparently (gzip
magic sniff).

Spark-first shape: binaryFile scan + Arrow-batched mapInPandas, same as
the DICOM source; output is the narrow spatial-parameter table the
insertion pipeline joins on.
"""

from __future__ import annotations

import gzip
import io
import struct
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

NIFTI_SCHEMA = (
    "path string, is_nifti boolean, ndim int, xspace int, yspace int, "
    "zspace int, time int, xstep double, ystep double, zstep double, "
    "datatype int"
)


def parse_nifti_bytes(content: bytes) -> dict[str, Any]:
    """Parse a NIfTI-1 header (optionally gzipped). Returns the fields the
    reference projects into the files table (imaging.py:1221-1258)."""
    if content[:2] == b"\x1f\x8b":
        try:
            content = gzip.GzipFile(fileobj=io.BytesIO(content)).read(352)
        except Exception:
            return {"is_nifti": False}
    if len(content) < 348:
        return {"is_nifti": False}
    magic = content[344:348]
    if magic not in (b"n+1\x00", b"ni1\x00"):
        return {"is_nifti": False}
    dim = struct.unpack_from("<8h", content, 40)
    (datatype,) = struct.unpack_from("<h", content, 70)
    pixdim = struct.unpack_from("<8f", content, 76)
    ndim = dim[0]
    return {
        "is_nifti": True,
        "ndim": ndim,
        "xspace": dim[1] if ndim >= 1 else None,
        "yspace": dim[2] if ndim >= 2 else None,
        "zspace": dim[3] if ndim >= 3 else None,
        "time": dim[4] if ndim >= 4 else None,
        "xstep": round(float(pixdim[1]), 6) if ndim >= 1 else None,
        "ystep": round(float(pixdim[2]), 6) if ndim >= 2 else None,
        "zstep": round(float(pixdim[3]), 6) if ndim >= 3 else None,
        "datatype": datatype,
    }


def _parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [c.split(" ")[0] for c in NIFTI_SCHEMA.split(", ")]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            rows.append({"path": path, **parse_nifti_bytes(bytes(content))})
        out = pd.DataFrame(rows)
        for c in ("ndim", "xspace", "yspace", "zspace", "time", "datatype"):
            out[c] = out.get(c).astype("Int32") if c in out else None
        for c in ("xstep", "ystep", "zstep"):
            out[c] = out.get(c).astype("float64") if c in out else None
        yield out[cols]


def read_nifti_headers(spark: SparkSession, path_glob: str) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.nii*")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_partition, schema=NIFTI_SCHEMA)
