"""Edge-case semantics for d7 segment dedup: a document whose only kept
segment is the EMPTY STRING must reassemble to '' (what DuckDB's
string_agg over [''] returns), not NULL — nullif(joined, '') conflated
that case with "no segment survived" and broke engine agreement on any
corpus containing an empty-text first occurrence.
"""

from __future__ import annotations

from spark_sql_perf_spark.pipeline.dedup import segment_dedup_df
from tests.oracle_check import compare_frames

_ROWS = [(1, ""), (2, ""), (3, "a b c"), (4, "a b c")]


def test_empty_segment_winner_keeps_empty_string(spark):
    sdf = segment_dedup_df(
        spark.createDataFrame(_ROWS, "doc_id long, text string")
    )
    out = {
        r.doc_id: (r.n_segments, r.n_kept, r.dedup_text) for r in sdf.collect()
    }
    # doc 1 is the corpus-wide first '' segment: kept, text '' (NOT NULL);
    # doc 2's duplicate '' drops -> zero kept -> NULL
    assert out[1] == (1, 1, "")
    assert out[2] == (1, 0, None)
    assert out[3] == (1, 1, "a b c")
    assert out[4] == (1, 0, None)


def test_empty_segment_agrees_with_oracle(spark, duck):
    from spark_sql_perf_spark.operators import ORACLES

    values = ", ".join(f"({i}, '{t}')" for i, t in _ROWS)
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM (VALUES {values}) t(doc_id, text)"
    )
    duck_pdf = duck.execute(ORACLES["d7_segment_dedup"]).df()
    spark_pdf = segment_dedup_df(
        spark.createDataFrame(_ROWS, "doc_id long, text string")
    ).toPandas()
    compare_frames(spark_pdf, duck_pdf, "d7_empty_segment")
