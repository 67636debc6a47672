"""User-defined table function (UDTF) surface — the §2.10 row-to-rows
extension point (the reference reaches it through Dataset.flatMap /
explode; PySpark 4 exposes a first-class ``@udtf``).

The policy stays 'UDFs are the slow path': anything expressible as
``explode(split(...))`` should BE that (codegen, no Python). A UDTF is
the escape hatch for row-to-rows logic with per-row state or non-trivial
control flow that array expressions can't express. The example here is
deliberately expressible both ways so the test can prove the UDTF
returns exactly what the codegen path returns — correctness of the
wiring, not an endorsement of Python in hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf


@udtf(returnType="sentence: string, ordinal: int")
class SplitSentences:
    """Emit one row per '.'-separated non-empty sentence with its
    ordinal among the non-empty sentences (matching the codegen twin's
    filter-then-posexplode ordering)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        i = 0
        for part in text.split("."):
            s = part.strip()
            if s:
                yield s, i
                i += 1


def split_sentences_udtf(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Apply the UDTF laterally per input row, keeping ``key_col``."""
    return (
        df.select(F.col(key_col), F.col(text_col).alias("text"))
        .lateralJoin(SplitSentences(F.col("text").outer()))
        .select(key_col, "sentence", "ordinal")
    )


def split_sentences_codegen(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """The same semantics as pure column expressions (the preferred
    form): split -> trim -> filter empties -> posexplode."""
    parts = F.filter(
        F.transform(F.split(F.col(text_col), r"\."), lambda s: F.trim(s)),
        lambda s: s != lit(""),
    )
    return df.select(key_col, F.posexplode(parts).alias("ordinal", "sentence")).select(
        key_col, "sentence", "ordinal"
    )
