"""Text normalization / tokenization / portable hashing expressions.

Building blocks for the LLM-data-pipeline operators (dedup, text analysis,
fingerprinting). All are pure Column expressions (JVM-side, codegen'd) — no
Python UDFs in any hot path.

The reference's dedup primitive is a file-hash equality scan
(`/root/reference/python/lib/database_lib/files.py:40-101`,
`python/lib/dcm2bids_imaging_pipeline_lib/nifti_insertion_pipeline.py:52-64`);
these expressions generalize it to document text at corpus scale.

Portability note: `md5_60` is the engine's ORACLE-PORTABLE hash — the first
60 bits of md5 as a non-negative bigint, computable identically in Spark
(`conv(substring(md5(x),1,15),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`). Operators whose output must
hash-match a SQL oracle use it. Purely internal hashing (LSH bucket keys)
uses `xxhash64`, which is faster and seedable but Spark-only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def let(value: Column, body) -> Column:
    """Bind ``value`` ONCE as a lambda variable and evaluate ``body`` on it:
    ``transform(array(value), x -> body(x))[1]``.

    Catalyst's CollapseProject substitutes aliased expressions into their
    references; when the reference sits inside a higher-order-function
    lambda the substituted expression is RE-EVALUATED PER ELEMENT — an
    aliased n-element array used inside an n-iteration transform goes
    quadratic (observed: the winnowing fingerprint went from seconds to
    minutes). A lambda variable is immune to substitution, so this is the
    engine's `let`-expression for expensive intermediates.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def norm_text(col: Column | str) -> Column:
    """Canonical text normalization: lowercase, collapse whitespace, trim.
    DuckDB mirror: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``."""
    return F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def distinct_tokens(col: Column | str) -> Column:
    return F.array_distinct(tokens(col))


def md5_60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative bigint (oracle-portable)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def word_shingles(tokens_col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingle array from a token-array expression.
    Documents shorter than ``n`` tokens yield an empty array.

    The token array is `let`-bound: without it, Catalyst inlines the
    tokenize expression into every element access of the shingle lambda
    (n accesses x n_shingles re-splits per row — observed 15s for 5000
    docs at sf0.1; ~0.5s let-bound).

    DuckDB mirror (t = token list, n=3)::

        list_distinct(list_transform(range(1, greatest(len(t)-1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
    """
    def body(t: Column) -> Column:
        return F.when(
            F.size(t) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.get(t, i + k) for k in range(n)]
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(_c(tokens_col), body)


def bow_fingerprint(col: Column | str) -> Column:
    """Bag-of-words fingerprint: md5 of the sorted distinct token set —
    an order-insensitive exact-dedup key (reference analogue: the file-hash
    duplicate check generalized to content words).
    DuckDB mirror: ``md5(array_to_string(list_sort(list_distinct(
    string_split(<norm>, ' '))), ' '))``."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(col))))


# SQL fragments for DuckDB oracles (kept next to their Spark twins so the
# pairing is auditable in one file).
SQL_NORM = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"
SQL_TOKENS = f"string_split({SQL_NORM}, ' ')"
SQL_MD5_60 = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"


def sql_shingles(n: int = 3, t: str = "t") -> str:
    """DuckDB n-shingle expression over a LIST COLUMN named ``t`` (DuckDB
    lists are 1-indexed; range() is end-exclusive, so short docs yield an
    empty list)."""
    parts = " || ' ' || ".join(f"{t}[i + {k}]" for k in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len({t}) - {n - 2}, 1)), "
        f"i -> {parts}))"
    )
