"""MINC (S5) and ECAT7 PET (S6) readers — native stdlib parsers.

MINC1 is NetCDF classic (CDF-1/CDF-2) — a PUBLIC, fully documented binary
layout (magic 'CDF\\x01'/'CDF\\x02', big-endian dim/attribute/variable
lists). The reference fetches header fields like
``acquisition:repetition_time`` by shelling out to ``mincheader`` per file
(`uploadNeuroDB/NeuroDB/MincUtilities.pm:93-129`); parsing the header
in-process removes that per-file subprocess entirely — the same
stdlib-struct treatment this repo already applies to NIfTI/EDF/DICOM.

ECAT7 ``.v`` is likewise public: a 512-byte big-endian main header (magic
'MATRIX72v') followed by 512-byte directory blocks of 4-int entries and
per-matrix subheaders. The reference parses the same surface out of
``lmhdr`` text (`uploadNeuroDB/NeuroDB/HRRT.pm:125-343`: scan_start_time,
system_type, patient_name, facility_name, ...), proving the field set;
here the bytes are decoded directly.

Spark-first shape: binaryFile scan -> Arrow-batched mapInPandas, one task
per file batch, no temp files, no subprocess — embarrassingly parallel at
100 TB. Files that fail to parse become classification rows
(``is_readable = false``), never job failures (the QC violation-row
discipline).
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# MINC1 / NetCDF-classic header parser
# --------------------------------------------------------------------------

_NC_TYPE_FMT = {1: "b", 2: "s", 3: "h", 4: "i", 5: "f", 6: "d"}
_NC_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}

MINC_SCHEMA = (
    "path string, is_readable boolean, variable string, attribute string, "
    "value_str string, value_num double"
)


class _Cur:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.p = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.p)
        self.p += 4
        return v

    def name(self) -> str:
        n = self.i4()
        raw = self.b[self.p : self.p + n]
        self.p += n + ((4 - n % 4) % 4)
        return raw.decode("ascii", "replace")

    def values(self, nc_type: int, nelems: int) -> tuple[str | None, float | None]:
        if nc_type not in _NC_TYPE_SIZE or nelems < 0:
            raise ValueError(f"corrupt attribute: type={nc_type}")
        size = _NC_TYPE_SIZE[nc_type]
        raw = self.b[self.p : self.p + size * nelems]
        self.p += size * nelems + ((4 - (size * nelems) % 4) % 4)
        if nc_type == 2:  # NC_CHAR -> string
            return raw.decode("ascii", "replace").rstrip("\x00 _"), None
        fmt = ">" + str(nelems) + _NC_TYPE_FMT[nc_type]
        vals = struct.unpack(fmt, raw)
        if nelems == 1:
            return None, float(vals[0])
        # Multi-valued numeric attribute (e.g. valid_range): keep the str
        # form; value_num carries the first element.
        return ",".join(repr(float(v)) for v in vals), float(vals[0])


def parse_minc1_bytes(content: bytes) -> list[dict[str, Any]]:
    """Flatten a NetCDF-classic header into (variable, attribute, value)
    rows — global attributes under variable '', dimensions under
    variable '<dims>' with their length as value_num. Returns [] if the
    magic doesn't match (not MINC1 / NetCDF classic)."""
    if len(content) < 8 or content[:3] != b"CDF" or content[3] not in (1, 2):
        return []
    cur = _Cur(content)
    cur.p = 4
    cur.i4()  # numrecs
    rows: list[dict[str, Any]] = []

    def att_list(varname: str) -> None:
        tag, n = cur.i4(), cur.i4()
        if tag == 0 and n == 0:
            return
        for _ in range(n):
            aname = cur.name()
            nc_type = cur.i4()
            nelems = cur.i4()
            s, d = cur.values(nc_type, nelems)
            rows.append(
                {"variable": varname, "attribute": aname,
                 "value_str": s, "value_num": d}
            )

    try:
        tag, ndims = cur.i4(), cur.i4()
        if tag not in (0, 0x0A):
            return []
        for _ in range(ndims):
            dname = cur.name()
            dlen = cur.i4()
            rows.append(
                {"variable": "<dims>", "attribute": dname,
                 "value_str": None, "value_num": float(dlen)}
            )
        att_list("")  # global attributes
        tag, nvars = cur.i4(), cur.i4()
        if tag not in (0, 0x0B):
            return []
        for _ in range(nvars):
            vname = cur.name()
            vnd = cur.i4()
            for _ in range(vnd):
                cur.i4()  # dimids
            att_list(vname)
            cur.i4()  # nc_type
            cur.i4()  # vsize
            cur.i4()  # begin (CDF-1: 4 bytes; header-only parse stops here)
    except (struct.error, ValueError, IndexError):
        return []
    return rows


def read_minc_headers(spark: SparkSession, path_glob: str) -> DataFrame:
    """S5: per-file MINC1 header explosion -> one row per
    (variable, attribute). ``is_readable=false`` rows classify non-MINC1
    files (e.g. MINC2/HDF5, which needs an injected reader) instead of
    failing the scan."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mnc")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in MINC_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = parse_minc1_bytes(bytes(content))
                if not parsed:
                    rows.append(
                        {"path": path, "is_readable": False, "variable": None,
                         "attribute": None, "value_str": None,
                         "value_num": None}
                    )
                    continue
                for r in parsed:
                    rows.append({"path": path, "is_readable": True, **r})
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=MINC_SCHEMA)


def minc_field(df: DataFrame, variable: str, attribute: str, out: str) -> DataFrame:
    """fetch_header_info semantics (MincUtilities.pm:93-129): one field per
    file, null when absent."""
    return (
        df.filter((F.col("variable") == variable) & (F.col("attribute") == attribute))
        .select("path", F.coalesce("value_str", F.col("value_num").cast("string")).alias(out))
    )


# --------------------------------------------------------------------------
# ECAT7 parser
# --------------------------------------------------------------------------

ECAT_SCHEMA = (
    "path string, is_readable boolean, original_filename string, "
    "sw_version int, system_type int, file_type int, scan_start_time bigint, "
    "isotope_name string, isotope_halflife double, patient_id string, "
    "patient_name string, patient_age double, patient_weight double, "
    "study_description string, facility_name string, num_planes int, "
    "num_frames int, num_gates int, num_bed_pos int, plane_separation double, "
    "n_matrices int"
)

ECAT_MATRIX_SCHEMA = (
    "path string, matnum int, start_block int, end_block int, status int, "
    "data_type int, num_dimensions int, x_dim int, y_dim int, z_dim int, "
    "scale_factor double"
)


def _cstr(raw: bytes) -> str:
    return raw.split(b"\x00", 1)[0].decode("ascii", "replace").strip()


def parse_ecat7_main_header(content: bytes) -> dict[str, Any] | None:
    """Decode the 512-byte big-endian ECAT7 main header (public layout;
    the field surface HRRT.pm:125-343 reads from `lmhdr`)."""
    if len(content) < 512 or not content.startswith(b"MATRIX72v"):
        return None
    return {
        "original_filename": _cstr(content[14:46]),
        "sw_version": struct.unpack_from(">H", content, 46)[0],
        "system_type": struct.unpack_from(">H", content, 48)[0],
        "file_type": struct.unpack_from(">H", content, 50)[0],
        "scan_start_time": int(struct.unpack_from(">I", content, 62)[0]),
        "isotope_name": _cstr(content[66:74]),
        "isotope_halflife": round(struct.unpack_from(">f", content, 74)[0], 4),
        "patient_id": _cstr(content[166:182]),
        "patient_name": _cstr(content[182:214]),
        "patient_age": round(struct.unpack_from(">f", content, 216)[0], 4),
        "patient_weight": round(struct.unpack_from(">f", content, 224)[0], 4),
        "study_description": _cstr(content[296:328]),
        "facility_name": _cstr(content[332:352]),
        "num_planes": struct.unpack_from(">H", content, 352)[0],
        "num_frames": struct.unpack_from(">H", content, 354)[0],
        "num_gates": struct.unpack_from(">H", content, 356)[0],
        "num_bed_pos": struct.unpack_from(">H", content, 358)[0],
        "plane_separation": round(struct.unpack_from(">f", content, 424)[0], 6),
    }


def parse_ecat7_directory(content: bytes) -> list[dict[str, Any]]:
    """Walk the ECAT7 directory chain (512-byte blocks of 4-int entries;
    entry 0 = [nfree, next_block, prev_block, nused]) and decode each
    matrix's image subheader (data_type/dims/scale at its start block)."""
    out: list[dict[str, Any]] = []
    block = 2  # 1-based: block 1 = main header, directory starts at 2
    seen = set()
    while block not in seen:
        seen.add(block)
        off = (block - 1) * 512
        if off + 512 > len(content):
            break
        nxt = struct.unpack_from(">i", content, off + 4)[0]
        nused = struct.unpack_from(">i", content, off + 12)[0]
        for e in range(1, min(nused, 31) + 1):
            matnum, start, end, status = struct.unpack_from(
                ">iiii", content, off + 16 * e
            )
            row: dict[str, Any] = {
                "matnum": matnum, "start_block": start,
                "end_block": end, "status": status,
                "data_type": None, "num_dimensions": None, "x_dim": None,
                "y_dim": None, "z_dim": None, "scale_factor": None,
            }
            sh_off = (start - 1) * 512
            if 0 <= sh_off and sh_off + 512 <= len(content):
                dt, nd, x, y, z = struct.unpack_from(">5H", content, sh_off)
                row.update(
                    data_type=dt, num_dimensions=nd, x_dim=x, y_dim=y,
                    z_dim=z,
                    scale_factor=round(
                        struct.unpack_from(">f", content, sh_off + 26)[0], 6
                    ),
                )
            out.append(row)
        if nxt in (0, 2) or nxt in seen:
            break
        block = nxt
    return out


def read_ecat_headers(spark: SparkSession, path_glob: str) -> DataFrame:
    """S6: ECAT7 main headers, one row per .v file."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.v")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in ECAT_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                hdr = parse_ecat7_main_header(b)
                if hdr is None:
                    rows.append({"path": path, "is_readable": False})
                    continue
                rows.append(
                    {"path": path, "is_readable": True,
                     "n_matrices": len(parse_ecat7_directory(b)), **hdr}
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=ECAT_SCHEMA)


def read_ecat_matrices(spark: SparkSession, path_glob: str) -> DataFrame:
    """S6: directory + subheader explosion, one row per stored matrix
    (frame/gate/bed) — the per-frame surface ecat2minc conversion walks."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.v")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in ECAT_MATRIX_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                if parse_ecat7_main_header(b) is None:
                    continue
                for r in parse_ecat7_directory(b):
                    rows.append({"path": path, **r})
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=ECAT_MATRIX_SCHEMA)
