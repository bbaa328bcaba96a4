"""Null-aware rule predicates (SURVEY §2.2 F3-F5) — the three-valued logic
at the heart of the reference's protocol-identification and QC engines.

The reference's rule tables use NULL = "no restriction":
- wildcard equality: `(X IS NULL OR X = ?)` — database_lib/mri_protocol.py:63-68,
  uploadNeuroDB/NeuroDB/MRI.pm:387-395
- in_range: min/max bounds with open ends; BOTH bounds null = no restriction;
  a bound set but the scan value null = FAIL — python/lib/imaging.py:1261-1299

Each is one shared Column expression so every call site (protocol matching,
QC checks, tests) gets identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def wildcard_eq(rule_col: Column | str, value_col: Column | str) -> Column:
    """True when the rule column is NULL (wildcard) or equals the value.

    Ref: mri_protocol.py:56-69 `(ProjectID IS NULL OR ProjectID = ?)`.
    """
    r, v = _c(rule_col), _c(value_col)
    return r.isNull() | (r == v)


def in_range(
    value_col: Column | str,
    min_col: Column | str,
    max_col: Column | str,
) -> Column:
    """Reference `in_range` semantics (imaging.py:1261-1299):

    - both bounds NULL          -> True  (no restriction)
    - any bound set, value NULL -> False (restricted but value missing)
    - only min set              -> value >= min
    - only max set              -> value <= max
    - both set                  -> min <= value <= max

    Deliberate divergence from the reference: `imaging.py:1276` tests Python
    truthiness (``not field_min``), so a bound of 0/0.0 is treated there as
    "unset". This engine treats 0 as a real bound — NULL is the ONLY
    wildcard — because silently discarding zero bounds is a data-dependent
    footgun. Rule authors who want an open end must write NULL.
    """
    v, lo, hi = _c(value_col), _c(min_col), _c(max_col)
    no_restriction = lo.isNull() & hi.isNull()
    ge_lo = lo.isNull() | (v >= lo)
    le_hi = hi.isNull() | (v <= hi)
    return F.when(no_restriction, F.lit(True)).otherwise(
        v.isNotNull() & ge_lo & le_hi
    )


def regex_or_wildcard(value_col: Column | str, pattern_col: Column | str) -> Column:
    """True when the rule regex is NULL/'' (wildcard) or the value matches it
    case-insensitively. Ref: MRI.pm:481-484 series_description_regex;
    imaging.py:658-662 re.search."""
    v, p = _c(value_col), _c(pattern_col)
    return (
        p.isNull()
        | (p == "")
        | (v.isNotNull() & F.regexp_like(v, F.concat(F.lit("(?i)"), p)))
    )


def eq_case_insensitive(a: Column | str, b: Column | str) -> Column:
    """LOWER(a) = LOWER(b) — the reference's ci-collation comparisons
    (MRI.pm:150 `LOWER(s.Visit_label)=LOWER(?)`). Spark's default string
    equality is binary, which covers the `WHERE BINARY` / `COLLATE utf8_bin`
    sites (MRIProcessingUtility.pm:2090) with no wrapper."""
    return F.lower(_c(a)) == F.lower(_c(b))
