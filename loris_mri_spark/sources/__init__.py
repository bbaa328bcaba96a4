"""File-format sources (SURVEY §2.1) — every reader is a DataFrame source:
`spark.read.format("binaryFile")` (or csv/json for sidecars) feeding
Arrow-batched `mapInPandas` parsers. The parse code is pure stdlib
(struct/tarfile/gzip): NIfTI-1 headers and explicit-VR DICOM are fixed
public binary layouts, so no imaging library is required for the header
surface the reference reads.
"""

from loris_mri_spark.sources.archive import read_tar_members
from loris_mri_spark.sources.bids import (
    read_events_tsv,
    read_participants_tsv,
    read_sidecar_json,
)
from loris_mri_spark.sources.dicom import parse_dicom_bytes, scan_dicom_dir
from loris_mri_spark.sources.eeg import parse_edf_bytes, read_edf_channels
from loris_mri_spark.sources.minc_ecat import (
    parse_ecat7_main_header,
    parse_minc1_bytes,
    read_ecat_headers,
    read_ecat_matrices,
    read_minc_headers,
)
from loris_mri_spark.sources.nifti import parse_nifti_bytes, read_nifti_headers

__all__ = [
    "read_tar_members",
    "read_events_tsv",
    "read_participants_tsv",
    "read_sidecar_json",
    "parse_dicom_bytes",
    "scan_dicom_dir",
    "parse_edf_bytes",
    "read_edf_channels",
    "parse_ecat7_main_header",
    "parse_minc1_bytes",
    "read_ecat_headers",
    "read_ecat_matrices",
    "read_minc_headers",
    "parse_nifti_bytes",
    "read_nifti_headers",
]
