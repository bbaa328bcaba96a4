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

    # --- EDF (EEG raw, S7)
    edir = _mkdir(os.path.join(HERE, "eeg"))
    write_edf(os.path.join(edir, "sub-01_task-rest_eeg.edf"),
              ["EEG Fp1", "EEG Fp2", "ECG"], n_records=4, spr=64)

    print("fixtures written under", HERE)


if __name__ == "__main__":
    main()
