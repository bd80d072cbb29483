"""Property-based engine-vs-pandas equivalence (hypothesis).

The reference's own suites lean on randomized frames
(mars/dataframe/*/tests/* build random pandas inputs per run —
SURVEY.md §5); hypothesis makes that systematic: generated frames
with nulls, duplicates, negative values, and empty slices must agree
with pandas on the core relational ops. Examples are kept small —
the point is adversarial SHAPES (all-null columns, single rows,
duplicate keys), not volume; sf-scale behavior is covered by the
oracle corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

import mars_spark as ms

_settings = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow])

_keys = st.lists(st.integers(min_value=0, max_value=4),
                 min_size=1, max_size=25)
_vals = st.lists(
    st.one_of(st.none(),
              st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, width=32)),
    min_size=1, max_size=25)


def _frame(keys, vals):
    n = min(len(keys), len(vals))
    return pd.DataFrame({
        "k": keys[:n],
        "v": pd.array(vals[:n], dtype="float64"),
    })


@given(keys=_keys, vals=_vals)
@_settings
def test_groupby_sum_count_matches_pandas(spark, keys, vals):
    pdf = _frame(keys, vals)
    got = (ms.from_pandas(pdf).groupby("k", as_index=False)
           .agg(s=("v", "sum"), n=("v", "count"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (pdf.groupby("k", as_index=False)
           .agg(s=("v", "sum"), n=("v", "count"))
           .sort_values("k").reset_index(drop=True))
    assert list(got.k) == list(exp.k)
    assert list(got.n) == list(exp.n)
    # documented semantic difference: pandas sums an all-NaN group to
    # 0.0, SQL SUM yields NULL — normalize both before comparing
    np.testing.assert_allclose(got.s.fillna(0.0), exp.s.fillna(0.0),
                               rtol=1e-6, atol=1e-9)


@given(keys=_keys, vals=_vals, other=_keys)
@_settings
def test_merge_inner_matches_pandas(spark, keys, vals, other):
    left = _frame(keys, vals)
    right = pd.DataFrame({"k": sorted(set(other)),
                          "w": [float(x) for x in sorted(set(other))]})
    got = (ms.from_pandas(left).merge(ms.from_pandas(right), on="k")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    exp = (left.merge(right, on="k")
           .sort_values(["k", "v"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert list(got.k) == list(exp.k)
    np.testing.assert_allclose(got.w, exp.w)


@given(keys=_keys, vals=_vals)
@_settings
def test_filter_sort_head_matches_pandas(spark, keys, vals):
    pdf = _frame(keys, vals)
    f = ms.from_pandas(pdf)
    got = (f[f.k >= 2].sort_values(["k", "v"]).head(5)
           .to_pandas().reset_index(drop=True))
    exp = (pdf[pdf.k >= 2].sort_values(["k", "v"]).head(5)
           .reset_index(drop=True))
    assert len(got) == len(exp)
    assert list(got.k) == list(exp.k)


@given(keys=_keys)
@_settings
def test_drop_duplicates_value_counts_match_pandas(spark, keys):
    pdf = pd.DataFrame({"k": keys})
    f = ms.from_pandas(pdf)
    assert f.drop_duplicates().count() == len(pdf.drop_duplicates())
    got = f["k"].value_counts().to_pandas().set_index("k")["count"]
    exp = pdf.k.value_counts()
    assert dict(got) == dict(exp)
