"""UDTF surface: the Python table function must return exactly what its
codegen twin (split -> filter -> posexplode) returns, including the
edge cases (empty segments, NULL text, no separator)."""

from __future__ import annotations

from tests.conftest import SF_DIR_TINY


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_udtf_matches_codegen_on_edge_cases(spark):
    from spark_sql_perf_spark.functions.udtf import (
        split_sentences_codegen,
        split_sentences_udtf,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b. c d . e"),
            (2, "..x.."),
            (3, None),
            (4, "no dots here"),
            (5, ""),
            (6, " . . "),
        ],
        "doc_id long, text string",
    )
    got = _rows(split_sentences_udtf(docs, "text", "doc_id"))
    want = _rows(split_sentences_codegen(docs, "text", "doc_id"))
    assert got == want
    assert len(got) == 5  # 3 from doc 1, 1 from doc 2, 1 from doc 4


def test_udtf_matches_codegen_on_documents(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.functions.udtf import (
        split_sentences_codegen,
        split_sentences_udtf,
    )

    docs = table(spark, SF_DIR_TINY, "documents").limit(50)
    got = _rows(split_sentences_udtf(docs, "text", "doc_id"))
    want = _rows(split_sentences_codegen(docs, "text", "doc_id"))
    assert got == want and len(got) > 0
