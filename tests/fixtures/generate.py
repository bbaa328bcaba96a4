"""Deterministic fixture generator for the ingest-layer sources (S1-S8).

Run from the repo root: python tests/fixtures/generate.py
Regenerates every fixture byte-identically (seeded); fixtures are committed
so driver-run queries can read them without a generation step.

Formats produced with stdlib only:
- NIfTI-1 files (S4): the real 348-byte header struct + tiny voxel payload
  (`/root/reference/python/lib/imaging_lib/nifti.py:7-30` reads exactly
  these fields via nibabel; the struct layout is the public NIfTI-1 spec).
- Minimal explicit-VR little-endian DICOM files (S1/S2): 128-byte
  preamble, 'DICM', then (group, element, VR, length, value) tags —
  enough structure for a real header scan
  (`loris_dicom_importer/.../summary_get.py:21-63`).
- BIDS events.tsv / participants.tsv / JSON sidecars (S8)
  (`loris_bids_importer/.../events.py:81-155`).
- A .tar.gz archive of the DICOM dir (S3) (`imaging.py:1150-1174`).
"""

from __future__ import annotations

import gzip
import io
import json
import math
import os
import struct
import tarfile

HERE = os.path.dirname(os.path.abspath(__file__))


def _mkdir(p: str) -> str:
    os.makedirs(p, exist_ok=True)
    return p


# ---------------------------------------------------------------------------
# NIfTI-1 (public spec: 348-byte header; fields used by the reference:
# dim[1..4] -> x/y/z/time, pixdim[1..3] -> steps).
# ---------------------------------------------------------------------------
def write_nifti(path: str, dims: tuple[int, int, int, int], pixdims: tuple[float, float, float], datatype: int = 4) -> None:
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)  # sizeof_hdr
    ndim = 4 if dims[3] > 1 else 3
    dim = [ndim, dims[0], dims[1], dims[2], dims[3], 1, 1, 1]
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, datatype)  # datatype (4 = int16)
    bitpix = {2: 8, 4: 16, 8: 32, 16: 32, 64: 64}[datatype]
    struct.pack_into("<h", hdr, 72, bitpix)
    pixdim = [1.0, pixdims[0], pixdims[1], pixdims[2], 2.0, 1.0, 1.0, 1.0]
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    hdr[344:348] = b"n+1\x00"  # magic
    nvox = dims[0] * dims[1] * dims[2] * dims[3]
    payload = struct.pack(f"<{nvox}h", *[(i * 7) % 1024 for i in range(nvox)])
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00\x00\x00\x00" + payload)


# ---------------------------------------------------------------------------
# Minimal explicit-VR little-endian DICOM.
# ---------------------------------------------------------------------------
def _tag(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b" " if vr in (b"LO", b"SH", b"PN", b"DA", b"TM", b"UI", b"CS", b"DS", b"IS") else b"\x00"
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def write_dicom(path: str, patient: str, study_uid: str, series_uid: str,
                series_num: int, series_desc: str, instance: int,
                echo_ms: float, tr_ms: float) -> None:
    body = b"".join([
        _tag(0x0008, 0x0060, b"CS", b"MR"),                       # Modality
        _tag(0x0008, 0x103E, b"LO", series_desc.encode()),        # SeriesDescription
        _tag(0x0010, 0x0010, b"PN", patient.encode()),            # PatientName
        _tag(0x0018, 0x0080, b"DS", f"{tr_ms:.2f}".encode()),     # RepetitionTime
        _tag(0x0018, 0x0081, b"DS", f"{echo_ms:.2f}".encode()),   # EchoTime
        _tag(0x0020, 0x000D, b"UI", study_uid.encode()),          # StudyInstanceUID
        _tag(0x0020, 0x000E, b"UI", series_uid.encode()),         # SeriesInstanceUID
        _tag(0x0020, 0x0011, b"IS", str(series_num).encode()),    # SeriesNumber
        _tag(0x0020, 0x0013, b"IS", str(instance).encode()),      # InstanceNumber
        _tag(0x7FE0, 0x0010, b"OW", bytes((i * 13 + instance) % 251 for i in range(64))),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)


# ---------------------------------------------------------------------------
# EDF (European Data Format, public spec: fixed-width ASCII header +
# 2-byte LE samples) — the EEG raw source S7.
# ---------------------------------------------------------------------------
def write_edf(path: str, channels: list[str], n_records: int, spr: int) -> None:
    ns = len(channels)

    def pad(s: str, n: int) -> bytes:
        return s[:n].ljust(n).encode("ascii")

    header_bytes = 256 + 256 * ns
    hdr = b"".join([
        pad("0", 8), pad("SUB001 F X LORIS", 80), pad("Startdate 01-JAN-2024", 80),
        pad("01.01.24", 8), pad("00.00.00", 8), pad(str(header_bytes), 8),
        pad("", 44), pad(str(n_records), 8), pad("1", 8), pad(str(ns), 4),
    ])
    fields = [
        (16, channels), (80, ["transducer"] * ns), (8, ["uV"] * ns),
        (8, ["-100"] * ns), (8, ["100"] * ns), (8, ["-2048"] * ns),
        (8, ["2047"] * ns), (80, ["HP:0.1Hz"] * ns), (8, [str(spr)] * ns),
        (32, [""] * ns),
    ]
    for width, vals in fields:
        hdr += b"".join(pad(v, width) for v in vals)
    data = b""
    for r in range(n_records):
        for c in range(ns):
            samples = [((r * spr + k) * (7 + 3 * c)) % 4000 - 2000 for k in range(spr)]
            data += struct.pack(f"<{spr}h", *samples)
    with open(path, "wb") as f:
        f.write(hdr + data)


def write_edf_plus(path: str, channels: list[str], n_records: int,
                   spr: int, annotations: list[tuple[float, float, str]]) -> None:
    """EDF+C: regular signal channels plus one 'EDF Annotations' channel
    carrying TALs (+onset[\\x15duration]\\x14text\\x14\\x00); every record
    leads with the record-timekeeping TAL (empty text)."""
    ns = len(channels) + 1
    ann_spr = 32  # 64 bytes of TAL space per record

    def pad(s: str, n: int) -> bytes:
        return s[:n].ljust(n).encode("ascii")

    header_bytes = 256 + 256 * ns
    hdr = b"".join([
        pad("0", 8), pad("SUB007 F X LORIS", 80), pad("Startdate 03-JAN-2024", 80),
        pad("03.01.24", 8), pad("00.00.00", 8), pad(str(header_bytes), 8),
        pad("EDF+C", 44), pad(str(n_records), 8), pad("1", 8), pad(str(ns), 4),
    ])
    labels = channels + ["EDF Annotations"]
    fields = [
        (16, labels), (80, ["transducer"] * len(channels) + [""]),
        (8, ["uV"] * len(channels) + [""]),
        (8, ["-100"] * len(channels) + ["-1"]),
        (8, ["100"] * len(channels) + ["1"]),
        (8, ["-2048"] * len(channels) + ["-32768"]),
        (8, ["2047"] * len(channels) + ["32767"]),
        (80, ["HP:0.1Hz"] * len(channels) + [""]),
        (8, [str(spr)] * len(channels) + [str(ann_spr)]),
        (32, [""] * ns),
    ]
    for width, vals in fields:
        hdr += b"".join(pad(v, width) for v in vals)
    by_record: dict[int, list[tuple[float, float, str]]] = {}
    for onset, dur, text in annotations:
        by_record.setdefault(int(onset), []).append((onset, dur, text))
    data = b""
    for r in range(n_records):
        for c in range(len(channels)):
            samples = [((r * spr + k) * (13 + 7 * c)) % 4000 - 2000
                       for k in range(spr)]
            data += struct.pack(f"<{spr}h", *samples)
        tal = f"+{r}\x14\x14\x00".encode("ascii")
        for onset, dur, text in by_record.get(r, []):
            tal += (f"+{onset:g}\x15{dur:g}\x14{text}\x14\x00"
                    .encode("ascii"))
        data += tal.ljust(2 * ann_spr, b"\x00")
    with open(path, "wb") as f:
        f.write(hdr + data)


def write_bdf(path: str, channels: list[str], n_records: int, spr: int) -> None:
    """BioSemi BDF: the EDF header layout with ident 0xFF+'BIOSEMI',
    '24BIT' reserved field and 3-byte little-endian signed samples."""
    ns = len(channels)

    def pad(s: str, n: int) -> bytes:
        return s[:n].ljust(n).encode("ascii")

    header_bytes = 256 + 256 * ns
    hdr = b"".join([
        b"\xffBIOSEMI", pad("SUB005 M X LORIS", 80),
        pad("Startdate 02-JAN-2024", 80),
        pad("02.01.24", 8), pad("00.00.00", 8), pad(str(header_bytes), 8),
        pad("24BIT", 44), pad(str(n_records), 8), pad("1", 8), pad(str(ns), 4),
    ])
    fields = [
        (16, channels), (80, ["active electrode"] * ns), (8, ["uV"] * ns),
        (8, ["-262144"] * ns), (8, ["262143"] * ns), (8, ["-8388608"] * ns),
        (8, ["8388607"] * ns), (80, ["HP:DC"] * ns), (8, [str(spr)] * ns),
        (32, [""] * ns),
    ]
    for width, vals in fields:
        hdr += b"".join(pad(v, width) for v in vals)
    data = bytearray()
    for r in range(n_records):
        for c in range(ns):
            for k in range(spr):
                # exceeds int16 range on purpose: proves 24-bit decode
                v = ((r * spr + k) * (1001 + 37 * c)) % 2_000_000 - 1_000_000
                data += int(v).to_bytes(3, "little", signed=True)
    with open(path, "wb") as f:
        f.write(hdr + bytes(data))


def write_brainvision(base: str, channels: list[str],
                      sampling_interval_us: int, n_samples: int) -> None:
    """BrainVision triplet: INI-style .vhdr header, .vmrk marker file and
    multiplexed int16 .eeg binary (the vendor's Core Data Format 1.0)."""
    name = os.path.basename(base)
    vhdr = [
        "Brain Vision Data Exchange Header File Version 1.0",
        "[Common Infos]",
        "Codepage=UTF-8",
        f"DataFile={name}.eeg",
        f"MarkerFile={name}.vmrk",
        "DataFormat=BINARY",
        "DataOrientation=MULTIPLEXED",
        f"NumberOfChannels={len(channels)}",
        f"SamplingInterval={sampling_interval_us}",
        "[Binary Infos]",
        "BinaryFormat=INT_16",
        "[Channel Infos]",
    ]
    for i, ch in enumerate(channels):
        vhdr.append(f"Ch{i + 1}={ch},,0.5,uV")
    with open(base + ".vhdr", "w", newline="\r\n") as f:
        f.write("\n".join(vhdr) + "\n")

    vmrk = [
        "Brain Vision Data Exchange Marker File, Version 1.0",
        "[Common Infos]",
        "Codepage=UTF-8",
        f"DataFile={name}.eeg",
        "[Marker Infos]",
        "Mk1=New Segment,,1,1,0",
        f"Mk2=Stimulus,S  1,{n_samples // 4},1,0",
        f"Mk3=Response,R  8,{n_samples // 2},1,2",
    ]
    with open(base + ".vmrk", "w", newline="\r\n") as f:
        f.write("\n".join(vmrk) + "\n")

    data = bytearray()
    for k in range(n_samples):
        for c in range(len(channels)):
            data += struct.pack("<h", (k * (11 + 5 * c)) % 3000 - 1500)
    with open(base + ".eeg", "wb") as f:
        f.write(bytes(data))


def _itag(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    """Implicit-VR little-endian element: (group, elem, len32, value) —
    no VR bytes on the wire; `vr` only picks the pad byte."""
    if len(value) % 2:
        value += b" " if vr in (b"LO", b"SH", b"PN", b"DA", b"TM", b"UI", b"CS", b"DS", b"IS") else b"\x00"
    return struct.pack("<HHI", group, elem, len(value)) + value


# ---------------------------------------------------------------------------
# MINC2 (S5): MINC volumes since 2.0 are HDF5 files — a PUBLIC binary
# format (HDF5 File Format Specification). This writer emits the same
# subset HDF5 1.8-era `mincreate` produces: version-0 superblock,
# old-style groups (local heap + v1 B-tree + SNOD symbol tables), v1
# object headers, inline attribute messages. Structure mirrors MINC2:
# /minc-2.0/{dimensions,info} groups whose children are datasets carrying
# the header attributes the reference extracts via mincheader
# (MincUtilities.pm:54-129).
# ---------------------------------------------------------------------------
_H5_UNDEF = 0xFFFFFFFFFFFFFFFF


def _h5_pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _h5_dt_float64() -> bytes:
    # class 1 (float) v1: IEEE LE double (order LE, implied mantissa norm,
    # sign bit 63), props: offset 0, precision 64, exp 52/11, man 0/52,
    # bias 1023.
    return struct.pack("<B3BI", 0x11, 0x20, 0x3F, 0x00, 8) + struct.pack(
        "<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023
    )


def _h5_dt_int32() -> bytes:
    # class 0 (fixed-point) v1: LE, signed; props: offset 0, precision 32.
    return struct.pack("<B3BI", 0x10, 0x08, 0x00, 0x00, 4) + struct.pack(
        "<HH", 0, 32
    )


def _h5_dt_string(n: int) -> bytes:
    # class 3 (string) v1: null-terminated, ASCII.
    return struct.pack("<B3BI", 0x13, 0x00, 0x00, 0x00, n)


def _h5_ds_scalar() -> bytes:
    return struct.pack("<BBB5x", 1, 0, 0)  # v1, rank 0, no maxdims


def _h5_msg(mtype: int, body: bytes) -> bytes:
    body = _h5_pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _h5_attr_msg(name: str, value) -> bytes:
    nm = name.encode("ascii") + b"\x00"
    if isinstance(value, float):
        dt, data = _h5_dt_float64(), struct.pack("<d", value)
    elif isinstance(value, int):
        dt, data = _h5_dt_int32(), struct.pack("<i", value)
    else:
        raw = str(value).encode("ascii")
        dt, data = _h5_dt_string(len(raw)), raw
    ds = _h5_ds_scalar()
    body = (
        struct.pack("<BBHHH", 1, 0, len(nm), len(dt), len(ds))
        + _h5_pad8(nm)
        + _h5_pad8(dt)
        + _h5_pad8(ds)
        + data
    )
    return _h5_msg(0x000C, body)


def _h5_object_header(messages: list[bytes]) -> bytes:
    block = b"".join(messages)
    # v1 prefix: version, reserved, nmsgs, refcount, header size, then a
    # 4-byte pad so messages start 8-aligned.
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(block)) + block


class _H5File:
    """Sequential allocator over a bytearray; superblock written last."""

    def __init__(self) -> None:
        self.buf = bytearray(b"\x00" * 96)  # reserve v0 superblock space

    def alloc(self, data: bytes) -> int:
        addr = len(self.buf)
        self.buf += data
        return addr

    def dataset(self, attrs: dict) -> int:
        msgs = [
            _h5_msg(0x0001, _h5_ds_scalar()),  # dataspace
            _h5_msg(0x0003, _h5_dt_int32()),  # datatype
            # layout v3 contiguous, no data allocated
            _h5_msg(0x0008, struct.pack("<BBQQ", 3, 1, _H5_UNDEF, 0)),
        ] + [_h5_attr_msg(k, v) for k, v in attrs.items()]
        return self.alloc(_h5_object_header(msgs))

    def group(self, children: dict) -> int:
        """children: name -> object header address (pre-built)."""
        names = sorted(children)
        heap_data = bytearray(b"\x00" * 8)  # offset 0: empty string
        offs = {}
        for n in names:
            offs[n] = len(heap_data)
            heap_data += n.encode("ascii") + b"\x00"
        heap_data = bytearray(_h5_pad8(bytes(heap_data)))
        heap_data_addr = len(self.buf) + 32  # heap header is 32 bytes
        heap_addr = self.alloc(
            b"HEAP"
            + struct.pack("<B3x", 0)
            + struct.pack("<QQQ", len(heap_data), len(heap_data), heap_data_addr)
            + heap_data
        )
        stes = b"".join(
            struct.pack("<QQII16x", offs[n], children[n], 0, 0) for n in names
        )
        snod_addr = self.alloc(
            b"SNOD" + struct.pack("<BBH", 1, 0, len(names)) + stes
        )
        btree_addr = self.alloc(
            b"TREE"
            + struct.pack("<BBH", 0, 0, 1)
            + struct.pack("<QQ", _H5_UNDEF, _H5_UNDEF)
            + struct.pack("<QQQ", 0, snod_addr, 0)
        )
        return self.alloc(
            _h5_object_header(
                [_h5_msg(0x0011, struct.pack("<QQ", btree_addr, heap_addr))]
            )
        )

    def finish(self, root_addr: int) -> bytes:
        sb = (
            b"\x89HDF\r\n\x1a\n"
            + struct.pack("<BBBBBBBxHHI", 0, 0, 0, 0, 0, 8, 8, 4, 16, 0)
            + struct.pack("<QQQQ", 0, _H5_UNDEF, len(self.buf), _H5_UNDEF)
            + struct.pack("<QQII16x", 0, root_addr, 0, 0)
        )
        assert len(sb) <= 96
        self.buf[: len(sb)] = sb
        return bytes(self.buf)


def write_minc2(path: str, dims: list[tuple[str, int]],
                groups: dict[str, dict]) -> None:
    """Emit a MINC2-shaped HDF5 file: /minc-2.0/dimensions/<dim> datasets
    (length/step/start/spacing/units attrs), /minc-2.0/info/<var>
    datasets (acquisition/patient/study attrs)."""
    f = _H5File()
    dim_children = {}
    for d, (name, length) in enumerate(dims):
        dim_children[name] = f.dataset(
            {"length": int(length), "step": 1.0 + d * 0.2,
             "start": -90.0 + d, "spacing": "regular__", "units": "mm"}
        )
    info_children = {g: f.dataset(atts) for g, atts in groups.items()}
    minc_grp = f.group(
        {
            "dimensions": f.group(dim_children),
            "info": f.group(info_children),
        }
    )
    root = f.group({"minc-2.0": minc_grp})
    with open(path, "wb") as out:
        out.write(f.finish(root))


def write_implicit_dicom(path: str, patient: str, study_uid: str,
                         series_uid: str, series_num: int, series_desc: str,
                         instance: int, echo_ms: float, tr_ms: float) -> None:
    """Implicit-VR little-endian DICOM (transfer syntax 1.2.840.10008.1.2,
    the DICOM default): proper PS3.10 file-meta group (explicit VR)
    declaring the syntax, then a VR-less dataset — including a
    defined-length nested sequence so the reader's SQ-sniffing heuristic
    (value starts with an item tag) is exercised."""
    ts = b"1.2.840.10008.1.2\x00"  # UI pads with NUL to even length
    meta = b"".join([
        _tag(0x0002, 0x0010, b"UI", ts),
    ])
    meta = _tag(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta
    inner = _itag(0x0008, 0x1090, b"LO", b"SCANNER3000")  # ManufacturerModelName
    item = struct.pack("<HHI", 0xFFFE, 0xE000, len(inner)) + inner
    sq = struct.pack("<HHI", 0x0008, 0x1111, len(item)) + item  # defined-len SQ
    body = b"".join([
        _itag(0x0008, 0x0060, b"CS", b"MR"),
        _itag(0x0008, 0x103E, b"LO", series_desc.encode()),
        _itag(0x0010, 0x0010, b"PN", patient.encode()),
        sq,
        _itag(0x0018, 0x0080, b"DS", f"{tr_ms:.2f}".encode()),
        _itag(0x0018, 0x0081, b"DS", f"{echo_ms:.2f}".encode()),
        _itag(0x0020, 0x000D, b"UI", study_uid.encode()),
        _itag(0x0020, 0x000E, b"UI", series_uid.encode()),
        _itag(0x0020, 0x0011, b"IS", str(series_num).encode()),
        _itag(0x0020, 0x0013, b"IS", str(instance).encode()),
        _itag(0x7FE0, 0x0010, b"OW", bytes((i * 7 + instance) % 251 for i in range(64))),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def write_enhanced_dicom(path: str) -> None:
    """Enhanced-DICOM-style file: timing tags live ONLY inside a nested
    functional-groups sequence (S2 fallback target)."""
    inner = b"".join([
        _tag(0x0018, 0x0080, b"DS", b"1200.00"),
        _tag(0x0018, 0x0081, b"DS", b"15.50"),
    ])
    item = struct.pack("<HHI", 0xFFFE, 0xE000, len(inner)) + inner
    sq = struct.pack("<HH2sHI", 0x5200, 0x9229, b"SQ", 0, len(item)) + item
    body = b"".join([
        _tag(0x0008, 0x0060, b"CS", b"MR"),
        _tag(0x0008, 0x103E, b"LO", b"enhanced_multiframe"),
        _tag(0x0010, 0x0010, b"PN", b"SUB002"),
        _tag(0x0020, 0x000D, b"UI", b"1.2.840.99999.2"),
        _tag(0x0020, 0x000E, b"UI", b"1.2.840.99999.2.1"),
        _tag(0x0020, 0x0011, b"IS", b"1"),
        _tag(0x0020, 0x0013, b"IS", b"1"),
        sq,
        _tag(0x7FE0, 0x0010, b"OW", bytes(range(32))),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + body)


# ---------------------------------------------------------------------------
# MINC1 (S5): MINC volumes are NetCDF classic (CDF-1) files — a PUBLIC
# binary format (magic 'CDF\x01', big-endian, dim/gatt/var lists). The
# reference fetches header fields like acquisition:repetition_time via
# `mincheader` (MincUtilities.pm:93-129); this writer lays down the same
# group-variable/attribute structure with stdlib struct.
# ---------------------------------------------------------------------------
NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


def _nc_pad(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _nc_name(name: str) -> bytes:
    raw = name.encode("ascii")
    return struct.pack(">i", len(raw)) + _nc_pad(raw)


def _nc_att(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode("ascii")
        return _nc_name(name) + struct.pack(">ii", NC_CHAR, len(raw)) + _nc_pad(raw)
    if isinstance(value, float):
        return _nc_name(name) + struct.pack(">iid", NC_DOUBLE, 1, value)
    if isinstance(value, list):  # list of doubles
        body = struct.pack(f">{len(value)}d", *value)
        return _nc_name(name) + struct.pack(">ii", NC_DOUBLE, len(value)) + body
    return _nc_name(name) + struct.pack(">iii", NC_INT, 1, int(value))


def _nc_att_list(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)  # ABSENT
    return struct.pack(">ii", 0x0C, len(atts)) + b"".join(
        _nc_att(k, v) for k, v in atts.items()
    )


def write_minc1(path: str, dims: list[tuple[str, int]],
                groups: dict[str, dict], image_type: int = NC_SHORT) -> None:
    """Emit a CDF-1 file: spatial dims, group variables (acquisition/
    patient/study) holding their attributes, dimension variables with
    step/start, and an `image` variable with a deterministic payload."""
    header = bytearray()
    header += b"CDF\x01" + struct.pack(">i", 0)  # magic + numrecs
    header += struct.pack(">ii", 0x0A, len(dims))  # NC_DIMENSION list
    for name, length in dims:
        header += _nc_name(name) + struct.pack(">i", length)
    header += _nc_att_list({"history": "generated by tests/fixtures/generate.py"})

    # Variables: scalar NC_INT group vars + dim vars + the image var.
    nvox = 1
    for _, length in dims:
        nvox *= length
    img_size = nvox * _NC_SIZES[image_type]
    img_size += (4 - img_size % 4) % 4
    var_defs: list[tuple[str, list[int], dict, int, int]] = []
    for gname, atts in groups.items():
        var_defs.append((gname, [], atts, NC_INT, 4))
    for d, (name, _length) in enumerate(dims):
        var_defs.append(
            (name, [], {"step": 1.0 + d * 0.2, "start": -90.0 + d,
                        "spacing": "regular__", "units": "mm"}, NC_INT, 4)
        )
    var_defs.append(
        ("image", list(range(len(dims))),
         {"valid_range": [0.0, 4095.0], "signtype": "signed__"},
         image_type, img_size)
    )

    # Two passes: sizes of var entries depend only on their own content,
    # so compute the header length first, then assign begin offsets.
    def var_entry(name, dimids, atts, nc_type, vsize, begin):
        e = _nc_name(name) + struct.pack(">i", len(dimids))
        e += b"".join(struct.pack(">i", d) for d in dimids)
        e += _nc_att_list(atts)
        e += struct.pack(">iii", nc_type, vsize, begin)
        return e

    entries0 = [var_entry(*vd, 0) for vd in var_defs]
    header_len = len(header) + 8 + sum(len(e) for e in entries0)
    begins, off = [], header_len
    for _, _, _, _, vsize in var_defs:
        begins.append(off)
        off += vsize
    body = struct.pack(">ii", 0x0B, len(var_defs)) + b"".join(
        var_entry(*vd, b) for vd, b in zip(var_defs, begins)
    )
    data = bytearray()
    for i, (_, _, _, nc_type, vsize) in enumerate(var_defs):
        if nc_type == NC_INT:
            data += struct.pack(">i", i)
        else:
            vals = [(j * 13) % 2048 for j in range(nvox)]
            data += _nc_pad(struct.pack(f">{nvox}h", *vals))
    with open(path, "wb") as f:
        f.write(bytes(header) + body + bytes(data))


# ---------------------------------------------------------------------------
# ECAT7 (S6): PET `.v` container — PUBLIC layout (512-byte big-endian main
# header, magic 'MATRIX72v', then 512-byte directory blocks of 4-int
# entries). The reference reads the same surface out of `lmhdr` text
# (HRRT.pm:125-343: scan_start_time, system_type, patient_name,
# facility_name...).
# ---------------------------------------------------------------------------
def write_ecat7(path: str, patient_name: str, patient_id: str,
                scan_start_time: int, system_type: int = 328,
                facility_name: str = "BIC-MNI_MCGILL",
                isotope_name: str = "C-11", isotope_halflife: float = 1223.0,
                study_description: str = "FDG dynamic",
                n_frames: int = 2, vol_dims: tuple = (8, 8, 4)) -> None:
    mh = bytearray(512)
    mh[0:14] = b"MATRIX72v\x00\x00\x00\x00\x00"
    mh[14:46] = os.path.basename(path).encode("ascii")[:32].ljust(32, b"\x00")
    struct.pack_into(">H", mh, 46, 72)                   # sw_version
    struct.pack_into(">H", mh, 48, system_type)
    struct.pack_into(">H", mh, 50, 7)                    # file_type: 16-bit volume
    struct.pack_into(">I", mh, 62, scan_start_time)
    mh[66:74] = isotope_name.encode()[:8].ljust(8, b"\x00")
    struct.pack_into(">f", mh, 74, isotope_halflife)
    struct.pack_into(">f", mh, 144, 1.0)                 # calibration factor
    mh[166:182] = patient_id.encode()[:16].ljust(16, b"\x00")
    mh[182:214] = patient_name.encode()[:32].ljust(32, b"\x00")
    struct.pack_into(">f", mh, 216, 61.0)                # patient_age
    struct.pack_into(">f", mh, 224, 72.5)                # patient_weight
    mh[296:328] = study_description.encode()[:32].ljust(32, b"\x00")
    mh[332:352] = facility_name.encode()[:20].ljust(20, b"\x00")
    struct.pack_into(">H", mh, 352, vol_dims[2])         # num_planes
    struct.pack_into(">H", mh, 354, n_frames)
    struct.pack_into(">H", mh, 356, 1)                   # num_gates
    struct.pack_into(">H", mh, 358, 1)                   # num_bed_pos
    struct.pack_into(">f", mh, 424, 2.4375)              # plane_separation

    nvox = vol_dims[0] * vol_dims[1] * vol_dims[2]
    data_blocks = (nvox * 2 + 511) // 512
    # Directory block: entry 0 = [nfree, next_dir_block, prev_dir_block,
    # nused]; entries i = [matnum, start_block, end_block, status].
    dir_block = bytearray(512)
    struct.pack_into(">iiii", dir_block, 0, 31 - n_frames, 2, 2, n_frames)
    blocks = []
    nxt = 3  # block 1 = main header, block 2 = directory (1-based)
    for f_i in range(1, n_frames + 1):
        start, end = nxt, nxt + data_blocks  # subheader + data
        struct.pack_into(">iiii", dir_block, 16 * f_i, f_i, start, end, 1)
        sub = bytearray(512)
        struct.pack_into(">H", sub, 0, 6)                # data_type SunShort
        struct.pack_into(">H", sub, 2, 3)                # num_dimensions
        struct.pack_into(">HHH", sub, 4, *vol_dims)      # x/y/z dims
        struct.pack_into(">f", sub, 26, 0.5 * f_i)       # scale_factor
        payload = struct.pack(
            f">{nvox}h", *[((j * 7) + f_i) % 1024 for j in range(nvox)]
        )
        blocks.append(bytes(sub) + payload.ljust(data_blocks * 512, b"\x00"))
        nxt = end + 1
    with open(path, "wb") as f:
        f.write(bytes(mh) + bytes(dir_block) + b"".join(blocks))


# ---------------------------------------------------------------------------
# EEGLAB .set (S7 second format): MATLAB Level-5 MAT-file — PUBLIC layout
# (128-byte header, then data elements; miMATRIX holding the EEG struct).
# The reference loads these via MNE's read_raw_eeglab
# (python/lib/physio/chunking.py:29-41); the fields read are EEG.nbchan,
# .srate, .pnts, .trials, .chanlocs(labels), .data.
# ---------------------------------------------------------------------------
miINT8, miINT32, miUINT32, miDOUBLE, miMATRIX = 1, 5, 6, 9, 14
mxSTRUCT, mxCHAR, mxDOUBLE = 2, 4, 6


def _mat_element(mtype: int, payload: bytes) -> bytes:
    pad = (8 - len(payload) % 8) % 8
    return struct.pack("<ii", mtype, len(payload)) + payload + b"\x00" * pad


def _mat_matrix(name: str, cls: int, body: bytes, dims: tuple[int, int]) -> bytes:
    flags = _mat_element(miUINT32, struct.pack("<II", cls, 0))
    dim_el = _mat_element(miINT32, struct.pack("<ii", *dims))
    name_el = _mat_element(miINT8, name.encode("ascii"))
    payload = flags + dim_el + name_el + body
    return _mat_element(miMATRIX, payload)


def _mat_double_scalar(name: str, v: float) -> bytes:
    return _mat_matrix(name, mxDOUBLE, _mat_element(miDOUBLE, struct.pack("<d", v)), (1, 1))


def _mat_char_row(name: str, s: str) -> bytes:
    # mxCHAR stored as uint16 code units (miUINT16 = 4)
    payload = b"".join(struct.pack("<H", ord(c)) for c in s)
    return _mat_matrix(name, mxCHAR, _mat_element(4, payload), (1, len(s)))


def write_eeglab_set(path: str, channels: list[str], srate: float,
                     pnts: int, trials: int = 1) -> None:
    """Minimal MAT v5 file holding scalar EEG fields + a chanlocs-like
    labels struct array + the data matrix (nbchan x pnts doubles)."""
    nb = len(channels)
    # chanlocs: 1 x nb struct array with single field 'labels'
    fieldname_len = _mat_element(miINT32, struct.pack("<i", 32))
    fieldnames = _mat_element(miINT8, b"labels".ljust(32, b"\x00"))
    chan_bodies = b"".join(_mat_char_row("", ch) for ch in channels)
    chanlocs = _mat_matrix("chanlocs", mxSTRUCT,
                           fieldname_len + fieldnames + chan_bodies, (1, nb))
    data_vals = [
        math.sin(0.25 * t + c) * 50.0 for t in range(pnts) for c in range(nb)
    ]  # column-major: nb x pnts
    data = _mat_matrix(
        "data", mxDOUBLE,
        _mat_element(miDOUBLE, struct.pack(f"<{nb * pnts}d", *data_vals)),
        (nb, pnts),
    )
    elements = (
        _mat_double_scalar("nbchan", float(nb))
        + _mat_double_scalar("srate", srate)
        + _mat_double_scalar("pnts", float(pnts))
        + _mat_double_scalar("trials", float(trials))
        + chanlocs
        + data
    )
    header = (b"MATLAB 5.0 MAT-file, generated by tests/fixtures/generate.py"
              .ljust(116, b" ")) + b"\x00" * 8 + struct.pack("<H", 0x0100) + b"IM"
    with open(path, "wb") as f:
        f.write(header + elements)


# ---------------------------------------------------------------------------
# PCM WAV (multimodal audio column): canonical RIFF/WAVE/fmt/data layout,
# 16-bit mono/stereo PCM — stdlib struct only.
# ---------------------------------------------------------------------------
def write_wav(path: str, sample_rate: int, channels: int, n_frames: int,
              freq_step: int) -> None:
    samples = []
    for t in range(n_frames):
        for c in range(channels):
            samples.append(((t * freq_step + c * 7) % 2000) - 1000)
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# CTF MEG .ds/.res4 (S7 third format): the CTF resource file layout is
# PUBLIC (CTF MEG File Format docs; independently implemented by MNE's
# mne/io/ctf/res4.py): 8-byte magic 'MEG41RS\0', three 256-byte strings
# (appName, dataOrigin, dataDescription), int16 no_trials_avgd, two
# 255-byte strings (data_time, data_date), then the gSetUp block at offset
# 1288: int32 no_samples, int16 no_channels, 2 pad bytes, f64 sample_rate,
# f64 epoch duration, int16 no_trials.
# ---------------------------------------------------------------------------
def write_ctf_res4(path: str, app_name: str, data_date: str, data_time: str,
                   n_samples: int, n_channels: int, sample_rate: float,
                   duration: float, n_trials: int) -> None:
    buf = bytearray(1320)
    buf[0:8] = b"MEG41RS\x00"
    buf[8:264] = app_name.encode("ascii")[:256].ljust(256, b"\x00")
    buf[264:520] = b"test-origin".ljust(256, b"\x00")
    buf[520:776] = b"fixture dataset".ljust(256, b"\x00")
    struct.pack_into(">h", buf, 776, 0)  # no_trials_avgd
    buf[778:1033] = data_time.encode()[:255].ljust(255, b"\x00")
    buf[1033:1288] = data_date.encode()[:255].ljust(255, b"\x00")
    struct.pack_into(">i", buf, 1288, n_samples)
    struct.pack_into(">h", buf, 1292, n_channels)
    struct.pack_into(">d", buf, 1296, sample_rate)
    struct.pack_into(">d", buf, 1304, duration)
    struct.pack_into(">h", buf, 1312, n_trials)
    with open(path, "wb") as f:
        f.write(bytes(buf))


# The companion .meg4 data file (same CTF docs; MNE's mne/io/ctf/read.py
# reads the identical layout): 8-byte magic 'MEG41CP\x00', then raw int32
# BIG-endian samples ordered (trial, channel, sample) — for each trial,
# each channel's no_samples values are consecutive.
def write_ctf_meg4(path: str, n_trials: int, n_channels: int,
                   n_samples: int) -> None:
    vals = [
        t * 1000 + c * 100 + s - 50
        for t in range(n_trials)
        for c in range(n_channels)
        for s in range(n_samples)
    ]
    with open(path, "wb") as f:
        f.write(b"MEG41CP\x00" + struct.pack(f">{len(vals)}i", *vals))


def write_dtiprep_protocol(path: str) -> None:
    """DTIPrep protocol XML (DTI.pm:232-291 documents the shape XML::Simple
    reads: nested <entry parameter=...> with repeated <value> children)."""
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<ProtocolSettings>\n"
        '  <entry parameter="QC_QCOutputDirectory"/>\n'
        '  <entry parameter="QC_QCedDWIFileNameSuffix">'
        "<value>_QCed.nrrd</value></entry>\n"
        '  <entry parameter="QC_reportFileNameSuffix">'
        "<value>_QCReport.txt</value></entry>\n"
        '  <entry parameter="QC_badGradientPercentageTolerance">'
        "<value>0.2</value></entry>\n"
        '  <entry parameter="IMAGE_bCheck">\n'
        "    <value>Yes</value>\n"
        '    <entry parameter="IMAGE_size">'
        "<value>96</value><value>96</value><value>65</value></entry>\n"
        '    <entry parameter="IMAGE_reportFileMode"><value>1</value></entry>\n'
        "  </entry>\n"
        '  <entry parameter="DIFFUSION_bCheck"><value>Yes</value></entry>\n'
        '  <entry parameter="DTI_bCompute"><value>Yes</value></entry>\n'
        "</ProtocolSettings>\n"
    )
    with open(path, "w", newline="") as f:
        f.write(xml)


def write_dtiprep_qc_xml(
    path: str, statuses: list[str], nested: bool = False
) -> None:
    """DTIPrep *_XMLQCResult.xml QC report: a "DWI Check" entry holding one
    gradient_NNNN entry per direction with its <processing> status
    (DTI.pm:1165-1193 counts EXCLUDE_* statuses from exactly this shape).
    With ``nested`` the first two gradients carry the sub-entries /
    multi-<value> children real reports have — DTI.pm still counts them
    ONCE per gradient key, which the s18b filter must reproduce."""

    def grad(i: int, s: str) -> str:
        if nested and i == 0:
            return (
                f'    <entry parameter="gradient_{i:04d}">'
                f"<processing>{s}</processing>\n"
                '      <entry parameter="Original DWI gradient direction">'
                "<value>0.707</value><value>0.707</value><value>0</value>"
                "</entry>\n"
                '      <entry parameter="QC_Index">'
                "<processing>EXCLUDE_SLICECHECK</processing></entry>\n"
                "    </entry>\n"
            )
        if nested and i == 1:
            return (
                f'    <entry parameter="gradient_{i:04d}">'
                f"<processing>{s}</processing>"
                "<value>ok</value><value>replicate</value></entry>\n"
            )
        return (
            f'    <entry parameter="gradient_{i:04d}">'
            f"<processing>{s}</processing></entry>\n"
        )

    grads = "".join(grad(i, s) for i, s in enumerate(statuses))
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<QCResultSettings>\n"
        '  <entry parameter="ImageInformation">\n'
        '    <entry parameter="IMAGE_size">'
        "<value>96</value><value>96</value><value>65</value></entry>\n"
        "  </entry>\n"
        '  <entry parameter="DWI Check">\n'
        f"{grads}"
        "  </entry>\n"
        "</QCResultSettings>\n"
    )
    with open(path, "w", newline="") as f:
        f.write(xml)


def main() -> None:
    # --- DICOM study: 2 series x 3 instances + 1 non-dicom stray file
    ddir = _mkdir(os.path.join(HERE, "dicom"))
    study = "1.2.840.99999.1"
    for s, (desc, tr, te) in enumerate(
        [("t1w_mprage", 2300.0, 2.98), ("rest_bold", 800.0, 30.0)], start=1
    ):
        series = f"{study}.{s}"
        for inst in range(1, 4):
            write_dicom(
                os.path.join(ddir, f"MR.{s}.{inst}.dcm"),
                patient="SUB001", study_uid=study, series_uid=series,
                series_num=s, series_desc=desc, instance=inst,
                echo_ms=te, tr_ms=tr,
            )
    with open(os.path.join(ddir, "README.txt"), "wb") as f:
        f.write(b"not a dicom file\n")

    # --- NIfTI files (one per series) + a gzipped variant
    ndir = _mkdir(os.path.join(HERE, "nifti"))
    write_nifti(os.path.join(ndir, "sub-01_T1w.nii"), (8, 8, 4, 1), (1.0, 1.0, 1.2))
    write_nifti(os.path.join(ndir, "sub-01_task-rest_bold.nii"), (4, 4, 2, 6), (3.0, 3.0, 3.0))
    with open(os.path.join(ndir, "sub-01_T1w.nii"), "rb") as f:
        raw = f.read()
    buf = io.BytesIO()
    with gzip.GzipFile(filename="", mtime=0, fileobj=buf, mode="wb") as z:
        z.write(raw)
    with open(os.path.join(ndir, "sub-02_T1w.nii.gz"), "wb") as f:
        f.write(buf.getvalue())

    # --- BIDS TSV/JSON
    bdir = _mkdir(os.path.join(HERE, "bids"))
    with open(os.path.join(bdir, "participants.tsv"), "w") as f:
        f.write("participant_id\tage\tsex\tsite\n")
        for i, (a, s, site) in enumerate(
            [(31, "F", "MTL"), (27, "M", "MTL"), (45, "F", "OTT"), (38, "M", "OTT")],
            start=1,
        ):
            f.write(f"sub-{i:02d}\t{a}\t{s}\t{site}\n")
    for sub in range(1, 3):
        with open(os.path.join(bdir, f"sub-{sub:02d}_task-rest_events.tsv"), "w") as f:
            f.write("onset\tduration\ttrial_type\tresponse_time\textra_col\n")
            for k in range(6):
                onset = round(0.5 * k + sub, 2)
                rt = "n/a" if k % 3 == 2 else f"{0.2 + 0.05 * k:.2f}"
                f.write(f"{onset}\t0.5\t{'go' if k % 2 == 0 else 'stop'}\t{rt}\tx{k}\n")
    sidecar = {
        "RepetitionTime": 0.8,
        "EchoTime": 0.03,
        "TaskName": "rest",
        "SliceTiming": [0.0, 0.2, 0.4],
    }
    with open(os.path.join(bdir, "sub-01_task-rest_bold.json"), "w") as f:
        json.dump(sidecar, f, sort_keys=True)
    sidecar["EchoTime"] = 0.035
    with open(os.path.join(bdir, "sub-02_task-rest_bold.json"), "w") as f:
        json.dump(sidecar, f, sort_keys=True)

    # --- tar.gz archive of the DICOM dir (deterministic: fixed mtime/order)
    adir = _mkdir(os.path.join(HERE, "archive"))
    tar_path = os.path.join(adir, "study.tar.gz")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for name in sorted(os.listdir(ddir)):
            full = os.path.join(ddir, name)
            info = tarfile.TarInfo(name=f"study/{name}")
            info.size = os.path.getsize(full)
            info.mtime = 0
            with open(full, "rb") as f:
                tar.addfile(info, f)
    gzbuf = io.BytesIO()
    with gzip.GzipFile(filename="", mtime=0, fileobj=gzbuf, mode="wb") as z:
        z.write(buf.getvalue())
    with open(tar_path, "wb") as f:
        f.write(gzbuf.getvalue())

    # --- enhanced DICOM (S2 nested-tag fallback)
    edicom = _mkdir(os.path.join(HERE, "dicom_enhanced"))
    write_enhanced_dicom(os.path.join(edicom, "MR.enh.1.dcm"))

    # --- implicit-VR DICOM (the 1.2.840.10008.1.2 default syntax)
    idicom = _mkdir(os.path.join(HERE, "dicom_implicit"))
    for inst in range(1, 3):
        write_implicit_dicom(
            os.path.join(idicom, f"MR.imp.{inst}.dcm"),
            patient="SUB003", study_uid="1.2.840.99999.3",
            series_uid="1.2.840.99999.3.1", series_num=1,
            series_desc="t2w_flair_implicit", instance=inst,
            echo_ms=90.0, tr_ms=9000.0,
        )

    # --- explicit-VR big-endian DICOM (1.2.840.10008.1.2.2, retired)
    bedicom = _mkdir(os.path.join(HERE, "dicom_be"))
    for inst in range(1, 3):
        write_bigendian_dicom(
            os.path.join(bedicom, f"MR.x.{inst}.dcm"),
            patient="SUB008", study_uid="1.2.840.99999.4",
            series_uid="1.2.840.99999.4.1", series_num=1,
            series_desc="t1w_be", instance=inst,
            echo_ms=12.5, tr_ms=2500.0,
        )

    # --- deflated explicit-VR LE DICOM (1.2.840.10008.1.2.1.99)
    dfdicom = _mkdir(os.path.join(HERE, "dicom_deflate"))
    for inst in range(1, 3):
        write_deflated_dicom(
            os.path.join(dfdicom, f"MR.x.{inst}.dcm"),
            patient="SUB009", study_uid="1.2.840.99999.5",
            series_uid="1.2.840.99999.5.1", series_num=1,
            series_desc="t1w_deflated", instance=inst,
            echo_ms=12.5, tr_ms=2500.0,
        )

    # --- encapsulated pixel data (JPEG 2000 transfer syntax, PS3.5 A.4)
    endicom = _mkdir(os.path.join(HERE, "dicom_encap"))
    for inst in range(1, 3):
        write_encapsulated_dicom(
            os.path.join(endicom, f"MR.j2k.{inst}.dcm"), inst
        )

    # --- grayscale baseline JPEGs (native T.81 decode; flat blocks with
    # q_DC=8 make the lossy pipeline exact — see write_jpeg_gray_flat)
    jdir = _mkdir(os.path.join(HERE, "jpeg"))
    for inst in range(1, 3):
        write_jpeg_gray_flat(os.path.join(jdir, f"img-{inst}.jpg"), inst)
        write_jpeg_ycbcr_flat(os.path.join(jdir, f"color-{inst}.jpg"), inst)
        write_jpeg_420_flat(os.path.join(jdir, f"sub420-{inst}.jpg"), inst)

    # --- AVI/MJPEG clips (RIFF container walk + per-frame JPEG decode)
    vdir = _mkdir(os.path.join(HERE, "video"))
    for inst in range(1, 3):
        write_avi_mjpeg(os.path.join(vdir, f"clip-{inst}.avi"), inst)

    # --- RLE transfer syntax (native PackBits decode, PS3.5 Annex G)
    rldicom = _mkdir(os.path.join(HERE, "dicom_rle"))
    for inst in range(1, 3):
        write_rle_dicom(os.path.join(rldicom, f"MR.rle.{inst}.dcm"), inst)

    # --- encapsulated baseline-JPEG transfer syntax (native T.81 decode
    # composed with the PS3.5 A.4 container walk)
    jpdicom = _mkdir(os.path.join(HERE, "dicom_jpeg"))
    for inst in range(1, 3):
        write_jpeg_dicom(os.path.join(jpdicom, f"MR.jpg.{inst}.dcm"), inst)

    # --- EDF (EEG raw, S7)
    edir = _mkdir(os.path.join(HERE, "eeg"))
    write_edf(os.path.join(edir, "sub-01_task-rest_eeg.edf"),
              ["EEG Fp1", "EEG Fp2", "ECG"], n_records=4, spr=64)

    # --- EDF+C with an annotations channel (TAL events -> BIDS events);
    # own directory so the plain-EDF golden scans stay scoped
    epdir = _mkdir(os.path.join(HERE, "eeg_plus"))
    write_edf_plus(os.path.join(epdir, "sub-07_task-rest_eeg.edf"),
                   ["EEG Fz", "EEG Pz"], n_records=3, spr=16,
                   annotations=[(0.5, 0.2, "Stimulus A"),
                                (1.25, 0.0, "Response"),
                                (2.5, 1.0, "Artifact chew")])

    # --- BDF (BioSemi, 24-bit EDF variant — the reference's importer
    # accepts .bdf alongside .edf, loris_bids_importer eeg/main.py:249)
    write_bdf(os.path.join(edir, "sub-05_task-rest_eeg.bdf"),
              ["Fp1", "Oz"], n_records=2, spr=32)

    # --- BrainVision triplet (.vhdr/.vmrk/.eeg — eeg/main.py:249)
    write_brainvision(os.path.join(edir, "sub-06_task-rest_eeg"),
                      ["Fp1", "Cz", "ECG"],
                      sampling_interval_us=4000, n_samples=200)

    # --- EEGLAB .set (S7, second EEG format: MAT v5)
    write_eeglab_set(os.path.join(edir, "sub-02_task-rest_eeg.set"),
                     ["Fp1", "Fp2", "Cz", "ECG"], srate=250.0, pnts=128)

    # --- CTF MEG .ds/.res4 (S7, third format)
    ctf_ds = _mkdir(os.path.join(edir, "sub-03_task-rest_meg.ds"))
    write_ctf_res4(os.path.join(ctf_ds, "sub-03_task-rest_meg.res4"),
                   app_name="Acq v6.0", data_date="13/08/2012",
                   data_time="10:30", n_samples=1200, n_channels=275,
                   sample_rate=600.0, duration=2.0, n_trials=1)

    # --- CTF .ds with SAMPLE DATA (.res4 + .meg4 pair): small dims so the
    # fixture stays tiny; sub-03 above deliberately has no .meg4 (header
    # registered, data not yet transferred — a real acquisition state).
    ctf_ds2 = _mkdir(os.path.join(edir, "sub-04_task-rest_meg.ds"))
    write_ctf_res4(os.path.join(ctf_ds2, "sub-04_task-rest_meg.res4"),
                   app_name="Acq v6.0", data_date="14/08/2012",
                   data_time="09:15", n_samples=16, n_channels=4,
                   sample_rate=150.0, duration=16 / 150.0, n_trials=2)
    write_ctf_meg4(os.path.join(ctf_ds2, "sub-04_task-rest_meg.meg4"),
                   n_trials=2, n_channels=4, n_samples=16)

    # --- BIDS EEG dataset (pipeline_eeg_bids_ingest capstone): a
    # self-contained sub-*/eeg/ layout exercising every reference exit of
    # import_bids_dataset.py's EEG flow — three insertable recordings
    # (EDF / EEGLAB .set / BDF), a subject missing from participants.tsv
    # (candidate-not-found), a participant row whose sex is not a LORIS
    # sex (unknown-sex), and an unsupported recording extension. HED
    # strings in sub-01's events.tsv + the dataset-level inherited tag
    # dictionary drive the X4 tagging + inherited-filter path.
    gdir = _mkdir(os.path.join(HERE, "bids_eeg"))
    with open(os.path.join(gdir, "participants.tsv"), "w") as f:
        f.write("participant_id\tage\tsex\tsite\tcohort\n")
        f.write("sub-01\t31\tF\tMTL\tControl\n")
        f.write("sub-02\t27\tmale\tMTL\tControl\n")
        f.write("sub-03\t45\tFemale\tOTT\tPatient\n")
        # sub-04 deliberately ABSENT -> candidate_not_found
        f.write("sub-05\t52\tX\tOTT\tControl\n")   # not a LORIS sex
        f.write("sub-06\t33\to\tMTL\tControl\n")   # valid row, bad file ext
    with open(os.path.join(gdir, "task-rest_events.json"), "w") as f:
        json.dump({"trial_type": {"HED": {"go": "Action/Move",
                                          "stop": "Action/Hold"}}},
                  f, sort_keys=True)

    def _eeg_sub(sub: str) -> str:
        return _mkdir(os.path.join(gdir, sub, "eeg"))

    d1 = _eeg_sub("sub-01")
    write_edf(os.path.join(d1, "sub-01_task-rest_eeg.edf"),
              ["EEG Fz", "EEG Pz"], n_records=2, spr=32)
    with open(os.path.join(d1, "sub-01_task-rest_events.tsv"), "w") as f:
        f.write("onset\tduration\ttrial_type\tHED\tstim_file\n")
        f.write("0.5\t0.2\tgo\tAction/Move, (Sensory-event,"
                " Visual-presentation)\timg0.png\n")
        f.write("1.0\t0.2\tstop\tAction/Hold, Agent-action\tn/a\n")
        f.write("1.5\t0.2\tgo\tn/a\timg1.png\n")
    with open(os.path.join(d1, "sub-01_task-rest_eeg.json"), "w") as f:
        json.dump({"SamplingFrequency": 32.0, "TaskName": "rest",
                   "EEGReference": "Cz", "PowerLineFrequency": 60},
                  f, sort_keys=True)

    d2 = _eeg_sub("sub-02")
    write_eeglab_set(os.path.join(d2, "sub-02_task-rest_eeg.set"),
                     ["Fp1", "Cz"], srate=125.0, pnts=64)
    with open(os.path.join(d2, "sub-02_task-rest_events.tsv"), "w") as f:
        f.write("onset\tduration\ttrial_type\tresponse_time\n")
        f.write("0.25\t0.1\tgo\t0.31\n")
        f.write("0.75\t0.1\tstop\tn/a\n")
    with open(os.path.join(d2, "sub-02_task-rest_eeg.json"), "w") as f:
        json.dump({"SamplingFrequency": 125.0, "TaskName": "rest"},
                  f, sort_keys=True)

    d3 = _eeg_sub("sub-03")   # no events.tsv / sidecar: both optional
    write_bdf(os.path.join(d3, "sub-03_task-rest_eeg.bdf"),
              ["Fp1", "Oz"], n_records=2, spr=16)

    d4 = _eeg_sub("sub-04")   # no participants row -> candidate_not_found
    write_brainvision(os.path.join(d4, "sub-04_task-rest_eeg"),
                      ["Fp1", "Cz"], sampling_interval_us=8000,
                      n_samples=48)

    d5 = _eeg_sub("sub-05")   # sex 'X' -> unknown_sex
    write_edf(os.path.join(d5, "sub-05_task-rest_eeg.edf"),
              ["EEG C3"], n_records=1, spr=16)

    d6 = _eeg_sub("sub-06")   # unsupported recording extension
    with open(os.path.join(d6, "sub-06_task-rest_eeg.xyz"), "wb") as f:
        f.write(b"not an eeg recording\n")

    # --- BIDS MRI dataset (pipeline_mri_bids_import capstone): the MRI
    # arm of the reference's import_bids_dataset.py (mri/main.py). Small
    # deterministic tree: every reference error exit has a fixture file
    # (candidate_not_found / unknown_sex / no_suffix / unknown_suffix /
    # duplicate_hash) plus three insertable acquisitions spanning
    # anat/dwi/func with sidecars, scans.tsv, bval/bvec, events, physio.
    mrdir = _mkdir(os.path.join(HERE, "bids_mri"))
    with open(os.path.join(mrdir, "participants.tsv"), "w") as f:
        f.write("participant_id\tage\tsex\tsite\tcohort\n")
        f.write("sub-01\t31\tF\tMTL\tControl\n")
        f.write("sub-02\t27\tmale\tMTL\tControl\n")
        f.write("sub-03\t45\tFemale\tOTT\tPatient\n")
        # sub-04 deliberately ABSENT -> candidate_not_found
        f.write("sub-05\t52\tX\tOTT\tControl\n")   # not a LORIS sex

    def _nii_gz(path: str, dims, pixdims) -> None:
        tmp = path[:-3]  # strip .gz
        write_nifti(tmp, dims, pixdims)
        with open(tmp, "rb") as fh:
            raw = fh.read()
        buf = io.BytesIO()
        with gzip.GzipFile(filename="", mtime=0, fileobj=buf,
                           mode="wb") as z:
            z.write(raw)
        with open(path, "wb") as fh:
            fh.write(buf.getvalue())
        os.remove(tmp)

    def _mri_sub(sub: str, dtype: str) -> str:
        return _mkdir(os.path.join(mrdir, sub, dtype))

    a1 = _mri_sub("sub-01", "anat")
    _nii_gz(os.path.join(a1, "sub-01_T1w.nii.gz"), (8, 8, 4, 1),
            (1.0, 1.0, 1.2))
    with open(os.path.join(a1, "sub-01_T1w.json"), "w") as f:
        json.dump({"EchoTime": 0.00298, "RepetitionTime": 2.3,
                   "Manufacturer": "Siemens",
                   "ManufacturersModelName": "Prisma",
                   "SeriesInstanceUID": "1.2.840.900.1",
                   "PhaseEncodingDirection": "j-", "EchoNumber": 1,
                   "PatientID": "PRJ001_100001_V1"}, f, sort_keys=True)
    d1 = _mri_sub("sub-01", "dwi")
    _nii_gz(os.path.join(d1, "sub-01_dwi.nii.gz"), (4, 4, 2, 6),
            (2.0, 2.0, 2.0))
    with open(os.path.join(d1, "sub-01_dwi.json"), "w") as f:
        json.dump({"EchoTime": 0.08, "RepetitionTime": 3.5,
                   "SeriesInstanceUID": "1.2.840.900.2"},
                  f, sort_keys=True)
    with open(os.path.join(d1, "sub-01_dwi.bval"), "w") as f:
        f.write("0 1000 1000 1000 1000 1000\n")
    with open(os.path.join(d1, "sub-01_dwi.bvec"), "w") as f:
        f.write("0 1 0 0 0.7071 0\n0 0 1 0 0.7071 0\n0 0 0 1 0 1\n")
    with open(os.path.join(mrdir, "sub-01", "sub-01_scans.tsv"),
              "w") as f:
        f.write("filename\tacq_time\tage\n")
        f.write("anat/sub-01_T1w.nii.gz\t2024-01-15T10:00:00\t31.2\n")
        f.write("dwi/sub-01_dwi.nii.gz\t2024-01-15T10:20:00\t31.2\n")

    f2 = _mri_sub("sub-02", "func")
    _nii_gz(os.path.join(f2, "sub-02_task-rest_bold.nii.gz"),
            (4, 4, 2, 6), (3.0, 3.0, 3.0))
    with open(os.path.join(f2, "sub-02_task-rest_bold.json"), "w") as f:
        json.dump({"EchoTime": 0.03, "RepetitionTime": 0.8,
                   "TaskName": "rest", "PatientID": "PRJ001_100002_V1"},
                  f, sort_keys=True)
    with open(os.path.join(f2, "sub-02_task-rest_events.tsv"), "w") as f:
        f.write("onset\tduration\ttrial_type\n")
        f.write("0.5\t0.2\tgo\n1.0\t0.2\tstop\n")
    with open(os.path.join(f2, "sub-02_task-rest_physio.tsv"), "w") as f:
        f.write("cardiac\trespiratory\n0.1\t0.4\n0.2\t0.5\n")
    with open(os.path.join(mrdir, "sub-02", "sub-02_scans.tsv"),
              "w") as f:
        f.write("filename\tacq_time\tage\n")
        f.write("func/sub-02_task-rest_bold.nii.gz\t"
                "2024-02-01T09:30:00\t27.5\n")

    a3 = _mri_sub("sub-03", "anat")
    # byte-identical to sub-01's T1w -> the blake2b duplicate gate
    # (mri/main.py get_check_bids_nifti_file_hash)
    _nii_gz(os.path.join(a3, "sub-03_T1w.nii.gz"), (8, 8, 4, 1),
            (1.0, 1.0, 1.2))
    # suffix not in KNOWN_SUFFIXES_PER_MRI_DATA_TYPE -> unknown_suffix
    _nii_gz(os.path.join(a3, "sub-03_XYZw.nii.gz"), (4, 4, 4, 1),
            (1.0, 1.0, 1.0))
    # no '_suffix' token at all -> no_suffix
    _nii_gz(os.path.join(a3, "sub-03.nii.gz"), (4, 4, 4, 1),
            (1.0, 1.0, 2.0))

    a4 = _mri_sub("sub-04", "anat")   # no participants row
    _nii_gz(os.path.join(a4, "sub-04_T1w.nii.gz"), (4, 4, 4, 1),
            (2.0, 1.0, 1.0))

    a5 = _mri_sub("sub-05", "anat")   # sex 'X' -> unknown_sex
    _nii_gz(os.path.join(a5, "sub-05_T1w.nii.gz"), (4, 4, 4, 1),
            (1.0, 2.0, 1.0))

    # --- MINC1 volumes (S5, NetCDF classic)
    mdir = _mkdir(os.path.join(HERE, "minc"))
    write_minc1(
        os.path.join(mdir, "sub-01_t1w.mnc"),
        dims=[("zspace", 4), ("yspace", 8), ("xspace", 8)],
        groups={
            "acquisition": {"repetition_time": 2.3, "echo_time": 0.00298,
                            "flip_angle": 9.0, "scanning_sequence": "MPRAGE"},
            "patient": {"full_name": "SUB001", "sex": "female__",
                        "age": 31.0},
            "study": {"study_id": "LORIS01", "modality": "MRI__",
                      "institution": "BIC-MNI_MCGILL"},
        },
    )
    write_minc1(
        os.path.join(mdir, "sub-02_bold.mnc"),
        dims=[("time", 6), ("zspace", 2), ("yspace", 4), ("xspace", 4)],
        groups={
            "acquisition": {"repetition_time": 0.8, "echo_time": 0.03,
                            "flip_angle": 52.0, "scanning_sequence": "EPI"},
            "patient": {"full_name": "SUB002", "sex": "male____",
                        "age": 27.0},
            "study": {"study_id": "LORIS01", "modality": "MRI__",
                      "institution": "BIC-MNI_MCGILL"},
        },
    )

    # --- MINC2 volume (S5b, HDF5) — own dir so the MINC1 goldens stay put
    m2dir = _mkdir(os.path.join(HERE, "minc2"))
    write_minc2(
        os.path.join(m2dir, "sub-03_t2w.mnc"),
        dims=[("zspace", 4), ("yspace", 8), ("xspace", 8)],
        groups={
            "acquisition": {"repetition_time": 9.0, "echo_time": 0.09,
                            "flip_angle": 120.0,
                            "scanning_sequence": "TSE"},
            "patient": {"full_name": "SUB003", "sex": "female__",
                        "age": 45.0},
            "study": {"study_id": "LORIS01", "modality": "MRI__",
                      "institution": "BIC-MNI_MCGILL"},
        },
    )

    # --- PCM WAV audio (multimodal audio column)
    wdir = _mkdir(os.path.join(HERE, "audio"))
    write_wav(os.path.join(wdir, "sub-01_audio.wav"),
              sample_rate=16000, channels=1, n_frames=1600, freq_step=13)
    write_wav(os.path.join(wdir, "sub-02_audio.wav"),
              sample_rate=8000, channels=2, n_frames=400, freq_step=29)

    # --- ECAT7 PET volumes (S6)
    pdir = _mkdir(os.path.join(HERE, "ecat"))
    write_ecat7(os.path.join(pdir, "sub-01_fdg.v"), patient_name="SUB001",
                patient_id="PET001", scan_start_time=1325430000, n_frames=2)
    write_ecat7(os.path.join(pdir, "sub-02_fdg.v"), patient_name="SUB002",
                patient_id="PET002", scan_start_time=1325516400, n_frames=3,
                vol_dims=(4, 4, 2))

    # --- Matlab sidecar shipped with BIC HRRT datasets (HRRT.pm:read_
    # matlab_file: `key = value;` lines, everything else ignored)
    with open(os.path.join(pdir, "sub-01_params.m"), "w", newline="") as f:
        f.write(
            "% HRRT reconstruction parameters\n"
            "nb_frames = 4;\r\n"
            "frame_duration = [300 300 300 300];\n"
            "isotope_halflife = 1221.84;\n"
            "recon_version = 'OSEM3D v1.2';\n"
            "scatter_correction = 1;\n"
            "this line has no assignment\n"
        )

    # --- DTIPrep protocol + QC report XML (S18)
    xdir = _mkdir(os.path.join(HERE, "dtiprep"))
    write_dtiprep_protocol(os.path.join(xdir, "DTIPrepProtocol.xml"))
    write_dtiprep_qc_xml(
        os.path.join(xdir, "sub-01_dti_XMLQCResult.xml"),
        ["INCLUDE"] * 9
        + ["EXCLUDE_SLICECHECK", "EXCLUDE_GRADIENTCHECK",
           "EXCLUDE_GRADIENTCHECK"],
        nested=True,
    )
    write_dtiprep_qc_xml(
        os.path.join(xdir, "sub-02_dti_XMLQCResult.xml"),
        ["INCLUDE"] * 7 + ["EXCLUDE_INTERLACECHECK"] + ["INCLUDE"] * 2,
    )
    with open(os.path.join(xdir, "broken.xml"), "w", newline="") as f:
        f.write("<QCResultSettings><entry parameter='oops'>")

    print("fixtures written under", HERE)



def _btag(group: int, elem: int, vr: bytes, value: bytes) -> bytes:
    """Explicit-VR BIG-endian element (transfer syntax 1.2.840.10008.1.2.2):
    group/element/length big-endian; VR chars and string values unchanged."""
    if len(value) % 2:
        value += b" " if vr in (b"LO", b"SH", b"PN", b"DA", b"TM", b"UI", b"CS", b"DS", b"IS") else b"\x00"
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return struct.pack(">HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack(">HH2sH", group, elem, vr, len(value)) + value


def _dicom_body(tagger, patient: str, study_uid: str, series_uid: str,
                series_num: int, series_desc: str, instance: int,
                echo_ms: float, tr_ms: float) -> bytes:
    return b"".join([
        tagger(0x0008, 0x0060, b"CS", b"MR"),
        tagger(0x0008, 0x103E, b"LO", series_desc.encode()),
        tagger(0x0010, 0x0010, b"PN", patient.encode()),
        tagger(0x0018, 0x0080, b"DS", f"{tr_ms:.2f}".encode()),
        tagger(0x0018, 0x0081, b"DS", f"{echo_ms:.2f}".encode()),
        tagger(0x0020, 0x000D, b"UI", study_uid.encode()),
        tagger(0x0020, 0x000E, b"UI", series_uid.encode()),
        tagger(0x0020, 0x0011, b"IS", str(series_num).encode()),
        tagger(0x0020, 0x0013, b"IS", str(instance).encode()),
        tagger(0x7FE0, 0x0010, b"OW",
               bytes((i * 17 + instance) % 251 for i in range(64))),
    ])


def _meta_group(ts: str) -> bytes:
    tsb = ts.encode("ascii")
    if len(tsb) % 2:
        tsb += b"\x00"
    meta = _tag(0x0002, 0x0010, b"UI", tsb)
    return _tag(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta))) + meta


def write_bigendian_dicom(path: str, **kw) -> None:
    """Explicit-VR big-endian (1.2.840.10008.1.2.2, retired): LE explicit
    file meta declaring the syntax, then a big-endian dataset."""
    body = _dicom_body(_btag, **kw)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + _meta_group("1.2.840.10008.1.2.2")
                + body)


def write_deflated_dicom(path: str, **kw) -> None:
    """Deflated explicit-VR LE (1.2.840.10008.1.2.1.99): LE explicit file
    meta, then the dataset as a raw deflate stream."""
    import zlib
    body = _dicom_body(_tag, **kw)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = co.compress(body) + co.flush()
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM"
                + _meta_group("1.2.840.10008.1.2.1.99") + deflated)


def _encap_fragment(instance: int, k: int) -> bytes:
    """Deterministic fake JPEG-2000 codestream: real SOC/SIZ markers, then
    filler bytes (the codec seam stays stubbed; the container is real)."""
    filler = bytes((i * 31 + 7 * k + instance) % 251 for i in range(40 + 8 * k))
    return b"\xff\x4f\xff\x51" + filler


def write_encapsulated_dicom(path: str, instance: int) -> None:
    """Encapsulated pixel data (PS3.5 A.4): JPEG 2000 lossless transfer
    syntax, explicit-LE tags, then (7FE0,0010) OB undefined-length with a
    Basic Offset Table item + 2 fragment items + sequence delimiter."""
    frags = [_encap_fragment(instance, k) for k in range(2)]
    bot = struct.pack("<II", 0, 8 + len(frags[0]))
    pixel = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pixel += struct.pack("<HHI", 0xFFFE, 0xE000, len(bot)) + bot
    for fr in frags:
        pixel += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    pixel += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body = b"".join([
        _tag(0x0008, 0x0060, b"CS", b"MR"),
        _tag(0x0008, 0x103E, b"LO", b"t1w_j2k"),
        _tag(0x0010, 0x0010, b"PN", b"SUB010"),
        _tag(0x0020, 0x000D, b"UI", b"1.2.840.99999.6"),
        _tag(0x0020, 0x000E, b"UI", b"1.2.840.99999.6.1"),
        _tag(0x0020, 0x0011, b"IS", b"1 "),
        _tag(0x0020, 0x0013, b"IS", str(instance).encode()),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM"
                + _meta_group("1.2.840.10008.1.2.4.90") + body + pixel)


def _packbits_encode(data: bytes) -> bytes:
    """Simple spec-conformant PackBits encoder (runs >= 3 become replicate
    ops, everything else literal ops)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([256 - (run - 1), data[i]])
            i += run
        else:
            lit_start = i
            i += run
            while i < n and run < 128:
                nxt = 1
                while i + nxt < n and data[i + nxt] == data[i] and nxt < 128:
                    nxt += 1
                if nxt >= 3:
                    break
                i += nxt
                run += nxt
                if run >= 128:
                    i -= run - 128
                    run = 128
                    break
            lit = data[lit_start:i]
            out += bytes([len(lit) - 1]) + lit
    return bytes(out)


def rle_frame_pixels(inst: int, frame: int, rows: int = 8,
                     cols: int = 16) -> bytes:
    """Deterministic 8-bit frame: even rows constant (long runs for the
    RLE), odd rows varying (literals)."""
    px = bytearray()
    for r in range(rows):
        for c in range(cols):
            if r % 2 == 0:
                px.append((r * 17 + inst + 3 * frame) % 251)
            else:
                px.append((r * 31 + c * 7 + inst + 3 * frame) % 251)
    return bytes(px)


def write_rle_dicom(path: str, instance: int, rows: int = 8,
                    cols: int = 16, n_frames: int = 2) -> None:
    """RLE transfer syntax (1.2.840.10008.1.2.5, PS3.5 Annex G): one
    fragment per frame; fragment = 64-byte segment header (16 uint32) +
    PackBits-encoded single 8-bit plane."""
    frags = []
    for f in range(n_frames):
        seg = _packbits_encode(rle_frame_pixels(instance, f, rows, cols))
        header = struct.pack("<16I", 1, 64, *([0] * 14))
        frags.append(header + seg)
    bot, off = [], 0
    for fr in frags:
        bot.append(off)
        off += 8 + len(fr) + (len(fr) % 2)
    pixel = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pixel += struct.pack("<HHI", 0xFFFE, 0xE000, 4 * len(bot))
    pixel += struct.pack(f"<{len(bot)}I", *bot)
    for fr in frags:
        if len(fr) % 2:
            fr += b"\x00"
        pixel += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    pixel += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body = b"".join([
        _tag(0x0008, 0x0060, b"CS", b"MR"),
        _tag(0x0008, 0x103E, b"LO", b"t1w_rle"),
        _tag(0x0010, 0x0010, b"PN", b"SUB011"),
        _tag(0x0020, 0x000D, b"UI", b"1.2.840.99999.7"),
        _tag(0x0020, 0x000E, b"UI", b"1.2.840.99999.7.1"),
        _tag(0x0020, 0x0011, b"IS", b"1 "),
        _tag(0x0020, 0x0013, b"IS", str(instance).encode()),
        struct.pack("<HH2sH", 0x0028, 0x0010, b"US", 2)
        + struct.pack("<H", rows),
        struct.pack("<HH2sH", 0x0028, 0x0011, b"US", 2)
        + struct.pack("<H", cols),
        struct.pack("<HH2sH", 0x0028, 0x0100, b"US", 2)
        + struct.pack("<H", 8),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM"
                + _meta_group("1.2.840.10008.1.2.5") + body + pixel)


# ---------------------------------------------------------------------------
# Baseline JPEG encoder (grayscale SOF0, Annex-K standard luminance Huffman
# tables). Fixtures use FLAT 8x8 blocks with an all-8 DC quantizer, so the
# lossy pipeline is EXACT: DC = v - 128 survives quantize+dequantize+IDCT
# bit-for-bit and the decoded image equals the block-value spec.
# ---------------------------------------------------------------------------

_JPG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPG_DC_VALS = list(range(12))
_JPG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpg_codes(bits, vals):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpgBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, ln, code):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per T.81
        return bytes(self.out)


def jpeg_block_values(inst: int, bw: int, bh: int) -> list:
    """The flat value of each 8x8 block, row-major — the pixel SPEC the
    oracle recomputes from."""
    return [
        (17 * (by * bw + bx) + 29 * inst) % 256
        for by in range(bh)
        for bx in range(bw)
    ]


def jpeg_gray_flat_bytes(inst: int, bw: int = 4, bh: int = 3) -> bytes:
    """Grayscale baseline JPEG of bw x bh flat 8x8 blocks (q_DC = 8 makes
    the DC path exact; all AC coefficients are zero)."""
    h, w = bh * 8, bw * 8
    quant = [8] + [16] * 63  # zigzag order; only q[0] matters (flat blocks)
    dc_codes = _jpg_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_codes(_JPG_AC_BITS, _JPG_AC_VALS)

    bwr = _JpgBitWriter()
    pred = 0
    for v in jpeg_block_values(inst, bw, bh):
        dc = v - 128  # exact: 8*(v-128) / q00=8
        diff = dc - pred
        pred = dc
        mag = abs(diff)
        ssss = mag.bit_length()
        bits = diff if diff >= 0 else diff + (1 << ssss) - 1
        ln, code = dc_codes[ssss]
        bwr.put(ln, code)
        if ssss:
            bwr.put(ssss, bits)
        ln, code = ac_codes[0x00]  # EOB: all AC zero
        bwr.put(ln, code)
    ecs = bwr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(quant))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([1, 1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS)
              + bytes(_JPG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + ecs + b"\xff\xd9"


def write_jpeg_gray_flat(path: str, inst: int, bw: int = 4, bh: int = 3) -> None:
    with open(path, "wb") as f:
        f.write(jpeg_gray_flat_bytes(inst, bw, bh))


def write_jpeg_dicom(path: str, instance: int, n_frames: int = 2,
                     bw: int = 2, bh: int = 2) -> None:
    """Encapsulated baseline-JPEG transfer syntax (1.2.840.10008.1.2.4.50,
    PS3.5 A.4.1): one fragment per frame, each fragment a REAL grayscale
    baseline-T.81 codestream (jpeg_gray_flat_bytes, frame f seeded
    instance + 5 * f) — the composition fixture for native in-engine
    decode of compressed DICOM pixel data."""
    frags = [jpeg_gray_flat_bytes(instance + 5 * f, bw, bh)
             for f in range(n_frames)]
    bot, off = [], 0
    for fr in frags:
        bot.append(off)
        off += 8 + len(fr) + (len(fr) % 2)
    pixel = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pixel += struct.pack("<HHI", 0xFFFE, 0xE000, 4 * len(bot))
    pixel += struct.pack(f"<{len(bot)}I", *bot)
    for fr in frags:
        if len(fr) % 2:
            fr += b"\x00"
        pixel += struct.pack("<HHI", 0xFFFE, 0xE000, len(fr)) + fr
    pixel += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    body = b"".join([
        _tag(0x0008, 0x0060, b"CS", b"MR"),
        _tag(0x0008, 0x103E, b"LO", b"t1w_jpgbase"),
        _tag(0x0010, 0x0010, b"PN", b"SUB012"),
        _tag(0x0020, 0x000D, b"UI", b"1.2.840.99999.8"),
        _tag(0x0020, 0x000E, b"UI", b"1.2.840.99999.8.1"),
        _tag(0x0020, 0x0011, b"IS", b"1 "),
        _tag(0x0020, 0x0013, b"IS", str(instance).encode()),
        struct.pack("<HH2sH", 0x0028, 0x0010, b"US", 2)
        + struct.pack("<H", bh * 8),
        struct.pack("<HH2sH", 0x0028, 0x0011, b"US", 2)
        + struct.pack("<H", bw * 8),
        struct.pack("<HH2sH", 0x0028, 0x0100, b"US", 2)
        + struct.pack("<H", 8),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM"
                + _meta_group("1.2.840.10008.1.2.4.50") + body + pixel)


def write_avi_mjpeg(path: str, inst: int, n_frames: int = 3,
                    bw: int = 2, bh: int = 2) -> None:
    """Minimal AVI/MJPEG: RIFF('AVI ') with an hdrl LIST (avih main
    header carrying frame count + dims) and a movi LIST of '00dc' video
    chunks, each a flat-block baseline JPEG (frame f uses block spec
    jpeg_block_values(inst + 11 * f))."""
    import io as _io

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    w, h = bw * 8, bh * 8
    avih = struct.pack(
        "<14I",
        40_000,          # dwMicroSecPerFrame (25 fps)
        0, 0, 0x10,      # MaxBytesPerSec, Padding, Flags(HASINDEX off)
        n_frames,        # dwTotalFrames
        0, 1, 0,         # InitialFrames, Streams, SuggestedBufferSize
        w, h,            # dwWidth, dwHeight
        0, 0, 0, 0,      # reserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 25, 0, n_frames, 0, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b""
    for f in range(n_frames):
        buf = _io.BytesIO()
        tmp = path + f".frame{f}"
        write_jpeg_gray_flat(tmp, inst + 11 * f, bw, bh)
        with open(tmp, "rb") as fh:
            jpg = fh.read()
        os.remove(tmp)
        del buf
        movi_payload += chunk(b"00dc", jpg)
    movi = lst(b"movi", movi_payload)
    riff = b"RIFF" + struct.pack(
        "<I", 4 + len(hdrl) + len(movi)
    ) + b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(riff)


def jpeg_color_block_values(inst: int, bw: int, bh: int) -> list:
    """Per-block flat (Y, Cb, Cr) triples — the color fixture's spec."""
    out = []
    for i in range(bw * bh):
        out.append((
            (17 * i + 29 * inst) % 256,
            (23 * i + 31 * inst) % 256,
            (41 * i + 37 * inst) % 256,
        ))
    return out


def write_jpeg_ycbcr_flat(path: str, inst: int, bw: int = 3, bh: int = 2) -> None:
    """3-component 4:4:4 baseline JPEG (no subsampling): flat per-block
    YCbCr planes with q00=8 quantizers, so decode is exact. Y uses quant
    table 0, chroma table 1; all components share Huffman tables 0."""
    h, w = bh * 8, bw * 8
    quant = [8] + [16] * 63
    dc_codes = _jpg_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_codes(_JPG_AC_BITS, _JPG_AC_VALS)

    bwr = _JpgBitWriter()
    preds = [0, 0, 0]
    for triple in jpeg_color_block_values(inst, bw, bh):
        for ci, v in enumerate(triple):
            dc = v - 128
            diff = dc - preds[ci]
            preds[ci] = dc
            mag = abs(diff)
            ssss = mag.bit_length()
            bits = diff if diff >= 0 else diff + (1 << ssss) - 1
            ln, code = dc_codes[ssss]
            bwr.put(ln, code)
            if ssss:
                bwr.put(ssss, bits)
            ln, code = ac_codes[0x00]
            bwr.put(ln, code)
    ecs = bwr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(quant)) + seg(
        0xDB, bytes([0x01]) + bytes(quant)
    )
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS)
              + bytes(_JPG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    with open(path, "wb") as f:
        f.write(b"\xff\xd8" + dqt + sof + dht + sos + ecs + b"\xff\xd9")


def jpeg_420_mcu_values(inst: int, mw: int, mh: int) -> list:
    """Per-MCU spec for the 4:2:0 fixture: (y0, y1, y2, y3, cb, cr) —
    four flat 8x8 luma blocks + one flat 16x16 chroma region each."""
    out = []
    for i in range(mw * mh):
        out.append((
            (13 * i + 7 * inst) % 256, (13 * i + 7 * inst + 40) % 256,
            (13 * i + 7 * inst + 80) % 256, (13 * i + 7 * inst + 120) % 256,
            (19 * i + 11 * inst) % 256, (29 * i + 3 * inst) % 256,
        ))
    return out


def write_jpeg_420_flat(path: str, inst: int, mw: int = 2, mh: int = 2) -> None:
    """4:2:0 baseline JPEG (Y sampling 2x2, chroma 1x1): each MCU carries
    four Y blocks then Cb then Cr; flat blocks + q00=8 keep decode exact
    (nearest-neighbour chroma upsampling of a flat block is flat)."""
    h, w = mh * 16, mw * 16
    quant = [8] + [16] * 63
    dc_codes = _jpg_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_codes(_JPG_AC_BITS, _JPG_AC_VALS)

    bwr = _JpgBitWriter()
    preds = [0, 0, 0]

    def put_block(ci: int, v: int) -> None:
        dc = v - 128
        diff = dc - preds[ci]
        preds[ci] = dc
        mag = abs(diff)
        ssss = mag.bit_length()
        bits = diff if diff >= 0 else diff + (1 << ssss) - 1
        ln, code = dc_codes[ssss]
        bwr.put(ln, code)
        if ssss:
            bwr.put(ssss, bits)
        ln, code = ac_codes[0x00]
        bwr.put(ln, code)

    for y0, y1, y2, y3, cb, cr in jpeg_420_mcu_values(inst, mw, mh):
        for v in (y0, y1, y2, y3):
            put_block(0, v)
        put_block(1, cb)
        put_block(2, cr)
    ecs = bwr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(quant)) + seg(
        0xDB, bytes([0x01]) + bytes(quant)
    )
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPG_DC_BITS)
              + bytes(_JPG_DC_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_JPG_AC_BITS) + bytes(_JPG_AC_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    with open(path, "wb") as f:
        f.write(b"\xff\xd8" + dqt + sof + dht + sos + ecs + b"\xff\xd9")
if __name__ == "__main__":
    main()
