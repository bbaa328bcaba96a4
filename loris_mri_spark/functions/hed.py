"""HED string parser — SURVEY §2.10 X4.

Reference: `/root/reference/python/lib/physio/hed.py:63-120` parses HED
annotation strings ("Tag1,(Tag2,(Tag3,Tag4))") into nested tag groups for
`hed_schema_node` assignment.

Engine shape: a real recursive parser (pure Python) exposed as an
Arrow-batched pandas UDF returning the FLATTENED group structure
`array<struct<tag, depth, item>>` — depth = nesting level, item = index
of the top-level item the tag belongs to. Flattened output keeps the
result relational (explode -> rows) while preserving the tree (depth,
item) — the nested ArrayType(StructType) SURVEY §1.1 calls for.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

HED_NODE_TYPE = ArrayType(
    StructType(
        [
            StructField("tag", StringType()),
            StructField("depth", IntegerType()),
            StructField("item", IntegerType()),
        ]
    )
)


def parse_hed(s: str) -> list[tuple[str, int, int]]:
    """Parse one HED string into (tag, depth, top_level_item) tuples.
    Commas separate siblings; parentheses open nested groups; whitespace
    around tags is insignificant (hed.py:63-120 tokenization)."""
    out: list[tuple[str, int, int]] = []
    depth = 0
    item = 0
    buf: list[str] = []

    def flush() -> None:
        tag = "".join(buf).strip()
        if tag:
            out.append((tag, depth, item))
        buf.clear()

    for ch in s or "":
        if ch == "(":
            flush()
            depth += 1
        elif ch == ")":
            flush()
            depth = max(0, depth - 1)
        elif ch == ",":
            flush()
            if depth == 0:
                item += 1
        else:
            buf.append(ch)
    flush()
    return out


def hed_parse_udf(col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(HED_NODE_TYPE)
    def _parse(strings: pd.Series) -> pd.Series:
        return strings.map(lambda s: parse_hed(s) if s is not None else [])

    return _parse(col)
