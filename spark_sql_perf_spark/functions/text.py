"""Text column expressions with DuckDB-mirrorable semantics.

The one hash both engines share bit-for-bit is md5 over strings; every
numeric hash here is `int(md5(prefix|s)[:8 hex])`, giving values in
[0, 2^32) that are identical in Spark and the DuckDB oracle. That makes
MinHash/SimHash signatures *oracle-checkable*, which row-at-a-time Python
hashing would not be.

All helpers come in pairs: a Spark Column builder and the equivalent
DuckDB SQL fragment (suffix ``_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text_col: str = "text") -> Column:
    """Lower-cased whitespace tokens."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def words_sql(expr: str = "text") -> str:
    return f"string_split_regex(lower({expr}), '\\s+')"


def md5_hash32(expr: Column | str, prefix: str) -> Column:
    """Deterministic 32-bit hash of a string column via md5 prefix trick."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix + "|"), c)), 1, 8), 16, 10
    ).cast("bigint")


def md5_hash32_sql(expr: str, prefix: str) -> str:
    return f"CAST(('0x' || SUBSTR(md5('{prefix}|' || {expr}), 1, 8)) AS BIGINT)"


def word_shingles(words_col: str = "ws", k: int = 3) -> Column:
    """k-word shingles from a token array (>= k tokens assumed).

    Spark-side: higher-order `transform` over an index sequence — stays in
    whole-stage codegen, no UDF.
    """
    parts = ", ".join(f"element_at({words_col}, i + {j})" for j in range(k))
    return F.expr(
        f"transform(sequence(1, size({words_col}) - {k - 1}), i -> concat_ws(' ', {parts}))"
    )


def word_shingles_sql(words_expr: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"({words_expr})[i + {j}]" for j in range(k))
    return f"list_transform(range(1, len({words_expr}) - {k - 2}), i -> {parts})"
