"""Module-level eval, CustomReduction, and learn.shuffle — the r9
parity additions (reference: mars/dataframe/base/eval.py:417,
mars/dataframe/reduction/core.py:652, mars/learn/utils/shuffle.py:464).
pandas/numpy are the oracles (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import mars_spark as ms


# ------------------------------------------------------------- ms.eval

def test_eval_single_frame_matches_pandas(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0],
                        "b": [10.0, 20.0, 30.0, 40.0]})
    f = ms.from_pandas(pdf)
    out = ms.eval("f.a * 2 + f.b / 4 - 1").to_pandas()
    exp = pd.eval("pdf.a * 2 + pdf.b / 4 - 1")
    assert list(out) == list(exp)


def test_eval_comparisons_boolops_chained(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0],
                        "b": [4.0, 3.0, 2.0, 1.0]})
    f = ms.from_pandas(pdf)
    got = ms.eval("(f.a > 1) & (f.b >= 2)").to_pandas()
    assert list(got) == [False, True, True, False]
    # and/or map to element-wise &/| (pandas eval semantics)
    got2 = ms.eval("f.a > 1 and f.b >= 2").to_pandas()
    assert list(got2) == list(got)
    # chained comparison decomposes pairwise
    got3 = ms.eval("1 < f.a <= 3").to_pandas()
    assert list(got3) == [False, True, True, False]
    # unary
    got4 = ms.eval("-f.b").to_pandas()
    assert list(got4) == [-4.0, -3.0, -2.0, -1.0]


def test_eval_cross_frame_aligns(spark):
    p1 = pd.DataFrame({"k": [1, 2, 3], "a": [10.0, 20.0, 30.0]})
    p2 = pd.DataFrame({"k": [2, 3, 4], "b": [1.0, 2.0, 3.0]})
    f1 = ms.from_spark(spark.createDataFrame(p1)).set_index("k")
    f2 = ms.from_spark(spark.createDataFrame(p2)).set_index("k")
    res = ms.eval("f1.a + f2.b")
    got = dict(zip(res._frame._sdf.select("k").toPandas().k,
                   res.to_pandas()))
    exp = p1.set_index("k").a + p2.set_index("k").b
    for k, v in exp.items():
        if np.isnan(v):
            assert got[k] is None or np.isnan(got[k])
        else:
            assert got[k] == v


def test_eval_name_resolution_and_errors(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0]})
    f = ms.from_pandas(pdf)
    # local_dict overrides the calling scope
    other = ms.from_pandas(pd.DataFrame({"a": [5.0, 6.0]}))
    got = ms.eval("f.a + 1", local_dict={"f": other}).to_pandas()
    assert list(got) == [6.0, 7.0]
    # subscript form
    got2 = ms.eval("f['a'] * 3").to_pandas()
    assert list(got2) == [3.0, 6.0]
    # scalars fold to scalars
    assert ms.eval("2 ** 5 % 7") == 32 % 7
    with pytest.raises(NameError):
        ms.eval("nonexistent_frame.a + 1")
    with pytest.raises(ValueError, match="function calls"):
        ms.eval("f.a.sum()")
    with pytest.raises(ValueError, match="unsupported"):
        ms.eval("[f.a for _ in range(2)]")


# ------------------------------------------------- CustomReduction

class _MeanRed(ms.CustomReduction):
    """Mergeable mean: (sum, count) partials — the canonical shape the
    reference contract requires (agg re-applies across chunks)."""

    def pre(self, value):
        return value, value.notna()

    def agg(self, v, notna):
        return v.sum(), notna.sum()

    def post(self, s, n):
        return float(s) / float(n)


def test_custom_reduction_distributed_matches_local(spark):
    pdf = pd.DataFrame({"x": np.arange(1, 101, dtype="float64")})
    pdf.loc[::7, "x"] = np.nan
    f = ms.from_pandas(pdf, num_partitions=8)
    red = _MeanRed()
    got = f.x.agg(red)
    # local __call_agg__ path (reference core.py:676) is the oracle,
    # and both must equal the pandas mean
    assert got == pytest.approx(red(pdf.x))
    assert got == pytest.approx(pdf.x.mean())


def test_series_agg_names(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]})
    f = ms.from_pandas(pdf)
    assert f.x.agg("sum") == 10.0
    multi = f.x.agg(["sum", "mean", "max"])
    assert list(multi.index) == ["sum", "mean", "max"]
    assert list(multi) == [10.0, 2.5, 4.0]
    with pytest.raises(TypeError):
        f.x.agg(lambda s: s.sum())


# ---------------------------------------------------- learn.shuffle

def test_shuffle_shared_permutation_and_determinism(spark):
    from mars_spark import learn as L

    p1 = pd.DataFrame({"k": range(40), "a": np.arange(40) * 1.0})
    p2 = pd.DataFrame({"k": range(40), "b": np.arange(40) * 2.0})
    f1 = ms.from_spark(spark.createDataFrame(p1)).set_index("k")
    f2 = ms.from_spark(spark.createDataFrame(p2)).set_index("k")
    s1, s2 = L.shuffle(f1, f2, random_state=3)
    o1 = s1._sdf.toPandas()
    o2 = s2._sdf.toPandas()
    # one shared permutation across aligned inputs
    assert list(o1.k) == list(o2.k)
    # a real permutation, and (overwhelmingly) not the identity
    assert sorted(o1.k) == list(range(40))
    assert list(o1.k) != list(range(40))
    # deterministic across partition layouts
    f1b = ms.from_spark(spark.createDataFrame(p1).repartition(7)) \
        .set_index("k")
    o1b = L.shuffle(f1b, random_state=3)._sdf.toPandas()
    assert list(o1b.k) == list(o1.k)
    # a different seed gives a different permutation
    alt = L.shuffle(f1, random_state=4)._sdf.toPandas()
    assert list(alt.k) != list(o1.k)
