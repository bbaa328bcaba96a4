"""Type codecs for the reference's stringly-typed columns (SURVEY §1.2).

The reference stores booleans three ways ('Y'/'N', 'true'/'false', 0/1 —
`python/lib/db/decorators/{y_n_bool,true_false_bool,int_bool}.py`),
datetimes as unix epoch ints (`decorators/int_datetime.py`), and lists as
"[a, b, c]" strings (`python/lib/imaging.py:175-179`). Each codec is a pure
Column expression so it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_yn_bool(col: Column | str) -> Column:
    """'Y'/'N' -> boolean; anything else -> null.

    Ref: decorators/y_n_bool.py (used by candidate.Active, mri_upload.IsPhantom).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "Y", F.lit(True)).when(c == "N", F.lit(False))


def encode_yn_bool(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c, F.lit("Y")).when(~c, F.lit("N"))


def decode_true_false_bool(col: Column | str) -> Column:
    """'true'/'false' -> boolean. Ref: decorators/true_false_bool.py
    (candidate.flagged_caveatemptor, session.MRICaveat)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.lower(c) == "true", F.lit(True)).when(
        F.lower(c) == "false", F.lit(False)
    )


def decode_int_bool(col: Column | str) -> Column:
    """0/1 int -> boolean. Ref: decorators/int_bool.py (files.Caveat,
    mri_upload.InsertionComplete)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == 1, F.lit(True)).when(c == 0, F.lit(False))


def decode_unix_epoch(col: Column | str) -> Column:
    """Unix-epoch int -> timestamp. Ref: decorators/int_datetime.py
    (files.InsertTime, parameter_file.InsertTime)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.from_unixtime(c))


def parse_list_string(col: Column | str) -> Column:
    """'"[a, b, c]"' serialized list -> array<string>.

    Ref: imaging.py:175-179 serializes python lists with str(); this inverts
    it for the common scalar-element case. Empty list "[]" -> empty array.
    """
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_replace(F.regexp_replace(c, r"^\[", ""), r"\]$", "")
    return F.when(F.trim(inner) == "", F.array().cast("array<string>")).otherwise(
        F.transform(F.split(inner, ","), lambda x: F.trim(x))
    )


def serialize_list_string(col: Column | str) -> Column:
    """array<string> -> '[a, b, c]' (compat with reference EAV values)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("["), F.array_join(c, ", "), F.lit("]"))
