"""The comparator must never be greener than the driver (r10 lesson:
tools/driver_sim passed q178 while the driver's value hash failed it,
because df.iterrows() upcast every row to float64 whenever ANY column
was float, rendering 945405 as 945405.0 on both sides)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_utils import canonicalize


def test_int_column_stays_int_rendered_next_to_float_columns():
    df = pd.DataFrame(
        {"a": pd.array([945405], dtype="int64"), "b": [1.5]}
    )
    rows = canonicalize(df)
    assert rows == [("945405", "1.5")], rows


def test_integer_valued_float_renders_differently_from_int():
    """The q178 HUGEINT->float64 materialization: same VALUE, different
    dtype — the canonical strings must differ so the sim fails exactly
    where the driver's hash fails."""
    ints = canonicalize(pd.DataFrame({"x": pd.array([7], "int64"),
                                      "pad": [0.5]}))
    floats = canonicalize(pd.DataFrame({"x": [7.0], "pad": [0.5]}))
    assert ints != floats


def test_empty_frame_canonicalizes_to_empty():
    assert canonicalize(pd.DataFrame({"a": [], "b": []})) == []


def test_nan_and_none_collapse_to_null():
    rows = canonicalize(
        pd.DataFrame({"a": [float("nan")], "b": [None]})
    )
    assert rows == [("NULL", "NULL")], rows
