"""Negative tests for the oracle comparator itself: the correctness gate
is only as strong as compare_frames, so prove it REJECTS every mutation
class the driver's hash would reject — a silent comparator regression
(sort bug, dtype coercion, NaN handling) would otherwise turn the whole
163-oracle surface vacuously green."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_check import compare_frames


def _base() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "k": pd.Series([1, 2, 3], dtype="int64"),
            "v": pd.Series([1.5, float("nan"), -0.0], dtype="float64"),
            "s": ["a", "b", None],
        }
    )


def test_accepts_identical_and_reordered():
    compare_frames(_base(), _base(), "meta")
    # order-insensitive on rows AND columns
    shuffled = _base().iloc[[2, 0, 1]][["s", "v", "k"]].reset_index(drop=True)
    compare_frames(_base(), shuffled, "meta")


def test_accepts_nan_and_negative_zero_normalization():
    b = _base()
    b.loc[2, "v"] = 0.0  # -0.0 on the other side
    compare_frames(_base(), b, "meta")


def test_rejects_value_perturbation():
    b = _base()
    b.loc[0, "v"] = 1.5000001
    with pytest.raises(AssertionError, match="float mismatches"):
        compare_frames(_base(), b, "meta")


def test_rejects_string_and_null_flips():
    b = _base()
    b.loc[1, "s"] = None  # value -> null
    with pytest.raises(AssertionError, match="mismatches"):
        compare_frames(_base(), b, "meta")


def test_rejects_row_count_and_column_rename():
    with pytest.raises(AssertionError, match="row count"):
        compare_frames(_base(), _base().iloc[:2], "meta")
    renamed = _base().rename(columns={"v": "val"})
    with pytest.raises(AssertionError, match="column mismatch"):
        compare_frames(_base(), renamed, "meta")


def test_rejects_dtype_family_drift():
    # DuckDB HUGEINT surfaces as float64 — equal values, different typed
    # hash on the driver; the comparator must flag it
    b = _base()
    b["k"] = b["k"].astype("float64")
    with pytest.raises(AssertionError, match="dtype family"):
        compare_frames(_base(), b, "meta")


def test_rejects_swapped_values_across_rows():
    # row-sort normalization must not mask a k<->v pairing corruption
    b = _base()
    b.loc[0, "v"], b.loc[2, "v"] = 99.0, 1.5
    with pytest.raises(AssertionError):
        compare_frames(_base(), b, "meta")
