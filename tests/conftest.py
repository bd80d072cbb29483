"""Shared fixtures — mirrors the reference's test strategy
(SURVEY.md §5): pandas is the oracle; fixture shapes follow
FIXTURES.md §2; everything seeded (42)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import mars_spark as ms


@pytest.fixture(scope="session")
def spark():
    s = ms.get_spark("tests", master="local[4]",
                     extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def pdf_numeric(rng):
    n = 1000
    df = pd.DataFrame({
        "a": rng.integers(0, 100, n),
        "b": rng.integers(-50, 50, n),
        "c": rng.standard_normal(n),
    })
    df.loc[df.sample(frac=0.1, random_state=1).index, "c"] = np.nan
    return df


@pytest.fixture(scope="session")
def pdf_groupby(rng):
    n = 2000
    return pd.DataFrame({
        "k1": rng.choice(["x", "y", "z"], n),
        "k2": rng.integers(0, 50, n),
        "v1": np.where(rng.random(n) < 0.1, np.nan, rng.standard_normal(n)),
        "v2": rng.integers(0, 1000, n),
    })


@pytest.fixture(scope="session")
def pdf_join(rng):
    left = pd.DataFrame({
        "key": rng.integers(0, 50, 300),
        "val": rng.standard_normal(300),
        "name": [f"l{i}" for i in range(300)],
    })
    right = pd.DataFrame({
        "key": rng.integers(0, 60, 80),
        "val": rng.standard_normal(80),
        "extra": [f"r{i}" for i in range(80)],
    })
    return left, right


@pytest.fixture(scope="session")
def pdf_ts(rng):
    n = 500
    return pd.DataFrame({
        "g": rng.choice(["a", "b"], n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
        "v": rng.standard_normal(n),
    })


def assert_frame_equal(spark_pdf: pd.DataFrame, expected: pd.DataFrame,
                       sort_by=None, **kw):
    """Mars-style comparison: sorted rows, reset index, relaxed dtypes
    (reference: mars/dataframe/merge/tests/test_merge_execution.py
    compares with pd.testing.assert_frame_equal against raw pandas)."""
    sort_by = sort_by or list(expected.columns)
    a = spark_pdf.sort_values(sort_by).reset_index(drop=True)[list(expected.columns)]
    b = expected.sort_values(sort_by).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-8, **kw)
