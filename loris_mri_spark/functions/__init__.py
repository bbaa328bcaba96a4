"""Scalar function library (SURVEY §2.8) — all JVM-side Column expressions
unless a true Python dependency (blake2b) forces a pandas UDF."""

from loris_mri_spark.functions.codecs import (
    decode_int_bool,
    decode_true_false_bool,
    decode_unix_epoch,
    decode_yn_bool,
    encode_yn_bool,
    parse_list_string,
)
from loris_mri_spark.functions.predicates import (
    in_range,
    regex_or_wildcard,
    wildcard_eq,
)

__all__ = [
    "decode_yn_bool",
    "encode_yn_bool",
    "decode_true_false_bool",
    "decode_int_bool",
    "decode_unix_epoch",
    "parse_list_string",
    "wildcard_eq",
    "in_range",
    "regex_or_wildcard",
]
