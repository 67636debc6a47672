"""Impala-kit TPC-DS corpus: engine-vs-engine correctness + stability.

The generated tables are written to parquet once, then every one of the
20 corpus queries runs in BOTH Spark and DuckDB over the same files and
the results are compared (exact for ints/strings/dates and for the
decimal-exact sums; small tolerance for decimal-vs-double divisions,
where the two engines legitimately round differently).

This is a stronger oracle than fingerprint stability: two independent
engines agreeing on verbatim TPC-DS SQL over identical input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spark_sql_perf_spark.operators.impala_suite import (
    IMPALA_QUERIES,
    IMPALA_TABLES,
    SUITES,
)

SCALE = 0.01

# queries whose result can be legitimately empty at this tiny scale are
# listed here (none currently — keep the gate strict)
MAY_BE_EMPTY: frozenset[str] = frozenset()


@pytest.fixture(scope="module")
def corpus(spark, duck, tmp_path_factory):
    from spark_sql_perf_spark.sources.datagen import gen_tpcds

    root = tmp_path_factory.mktemp("impala_corpus")
    for name in IMPALA_TABLES:
        path = str(root / name)
        gen_tpcds(spark, name, SCALE).coalesce(1).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(name)
        duck.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}/*.parquet')"
        )
    return spark


def _num(s: pd.Series) -> pd.Series:
    return pd.to_numeric(s, errors="coerce")


def _compare(sp: pd.DataFrame, du: pd.DataFrame, name: str) -> None:
    assert len(sp) == len(du), f"{name}: rows spark={len(sp)} duck={len(du)}"
    assert len(sp.columns) == len(du.columns), f"{name}: column count"
    du = du.copy()
    du.columns = list(sp.columns)  # positional: SELECT order is identical

    # normalize every column to a comparable dtype; Spark decimals arrive
    # as object(Decimal), DuckDB decimals as float64 — both go to float64
    import decimal

    def is_numeric(s: pd.Series) -> bool:
        if pd.api.types.is_numeric_dtype(s):
            return True
        nn = s.dropna()
        return len(nn) > 0 and isinstance(nn.iloc[0], decimal.Decimal)

    numeric_cols, other_cols = [], []
    for c in sp.columns:
        if is_numeric(sp[c]) or is_numeric(du[c]):
            numeric_cols.append(c)
            sp[c] = _num(sp[c])
            du[c] = _num(du[c])
        else:
            other_cols.append(c)
            sp[c] = sp[c].astype(str)
            du[c] = du[c].astype(str)

    # order-insensitive: sort both frames by all columns (numerics rounded
    # so decimal-vs-double representation differences don't reorder rows)
    def key(df: pd.DataFrame) -> pd.DataFrame:
        k = df.copy()
        for c in numeric_cols:
            k[c] = k[c].round(4)
        return df.loc[k.sort_values(list(df.columns), na_position="first").index]

    sp, du = key(sp).reset_index(drop=True), key(du).reset_index(drop=True)
    for c in other_cols:
        same = (sp[c] == du[c])
        assert same.all(), (
            f"{name}.{c}: {sp[c][~same].head(3).tolist()} vs {du[c][~same].head(3).tolist()}"
        )
    for c in numeric_cols:
        a = sp[c].to_numpy(dtype="float64", na_value=np.nan)
        b = du[c].to_numpy(dtype="float64", na_value=np.nan)
        ok = np.isclose(a, b, rtol=1e-6, atol=1e-6) | (np.isnan(a) & np.isnan(b))
        assert ok.all(), (
            f"{name}.{c}: max|diff|="
            f"{np.nanmax(np.abs(a - b))}, examples="
            f"{[(i, a[i], b[i]) for i in np.flatnonzero(~ok)[:3]]}"
        )


@pytest.mark.parametrize("name", sorted(IMPALA_QUERIES))
def test_impala_query_matches_duckdb(corpus, duck, name):
    sql = IMPALA_QUERIES[name]
    sp = corpus.sql(sql).toPandas()
    du = duck.execute(sql).df()
    if name not in MAY_BE_EMPTY:
        assert len(sp) > 0, f"{name}: empty result at scale {SCALE}"
    _compare(sp, du, name)


def test_suites_cover_corpus():
    covered = {q for names in SUITES.values() for q in names}
    assert covered == set(IMPALA_QUERIES)
    assert len(SUITES["interactive"]) == 8
    assert len(SUITES["reporting"]) == 6
    assert len(SUITES["deep_analytic"]) == 6


@pytest.mark.parametrize("name", ["q19", "q34", "q59"])
def test_impala_fingerprint_stable(corpus, name):
    """HashResults model: fingerprint unchanged across AQE on/off."""
    from spark_sql_perf_spark.modes import HASH

    h1 = HASH.consume(corpus.sql(IMPALA_QUERIES[name]), name)
    try:
        corpus.conf.set("spark.sql.adaptive.enabled", "false")
        h2 = HASH.consume(corpus.sql(IMPALA_QUERIES[name]), name)
    finally:
        corpus.conf.set("spark.sql.adaptive.enabled", "true")
    assert h1 == h2
