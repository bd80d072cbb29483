"""UDF escape hatches, encoding ops, remote.spawn facade."""

import numpy as np
import pandas as pd

import mars_spark as ms
from mars_spark import remote


def test_map_in_pandas(spark, pdf_numeric):
    f = ms.from_pandas(pdf_numeric, num_partitions=4)

    def double_a(batches):
        for pdf in batches:
            pdf["a"] = pdf["a"] * 2
            yield pdf[["a"]]

    out = f.map_in_pandas(double_a, schema="a bigint").to_pandas()
    assert sorted(out.a) == sorted(pdf_numeric.a * 2)


def test_apply_transform_batch(spark, pdf_numeric):
    f = ms.from_pandas(pdf_numeric, num_partitions=4)
    out = f.apply_batch(lambda p: p.assign(s=p.a + p.b)[["s"]],
                        schema="s bigint").to_pandas()
    assert sorted(out.s) == sorted(pdf_numeric.a + pdf_numeric.b)
    out2 = f.transform_batch(lambda p: p.assign(a=-p.a)).to_pandas()
    assert sorted(out2.a) == sorted(-pdf_numeric.a)


def test_cut_qcut(spark):
    pdf = pd.DataFrame({"v": [1.0, 5.0, 9.0, 15.0, 25.0]})
    f = ms.from_pandas(pdf)
    c = ms.cut(f.v, bins=[0, 10, 20], labels=["low", "high"])
    out = f.assign(bin=c).to_pandas().sort_values("v")
    assert list(out.bin) == ["low", "low", "low", "high", None]

    pdf2 = pd.DataFrame({"v": np.arange(100, dtype=float)})
    f2 = ms.from_pandas(pdf2)
    q = ms.qcut(f2.v, 4, labels=["q1", "q2", "q3", "q4"])
    out2 = f2.assign(b=q).to_pandas()
    assert set(out2.b.value_counts()) == {25}


def test_get_dummies(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})
    out = ms.get_dummies(ms.from_pandas(pdf), "k").to_pandas().sort_values("v")
    exp = pd.get_dummies(pdf, columns=["k"]).sort_values("v")
    for c in ["k_a", "k_b", "k_c"]:
        assert list(out[c]) == list(exp[c].astype(int))


def test_remote_spawn_graph():
    a = remote.spawn(lambda x: x + 1, args=(1,))
    b = remote.spawn(lambda x: x * 10, args=(a,))
    c = remote.spawn(lambda x, y: x + y, args=(a, b))
    assert c.execute() == 22
    r = remote.execute(a, b)
    assert r == [2, 20]


def test_parallel_map(spark):
    out = remote.parallel_map(lambda x: x * x, list(range(20)), spark=spark)
    assert out == [x * x for x in range(20)]


def test_remote_deep_chain_no_deadlock():
    from mars_spark import remote

    # dependency chain much deeper than the 8-worker pool: the old
    # recursive resolver blocked every worker on its child and hung
    node = remote.spawn(lambda: 0)
    for _ in range(30):
        node = remote.spawn(lambda x: x + 1, args=(node,))
    assert node.execute() == 30


def test_remote_diamond_and_batch():
    from mars_spark import remote

    a = remote.spawn(lambda: 2)
    b = remote.spawn(lambda x: x * 3, args=(a,))
    c = remote.spawn(lambda x: x + 1, args=(a,))
    d = remote.spawn(lambda x, y: x + y, args=(b, c))
    assert remote.execute(d) == [9]


def test_run_script():
    from mars_spark import remote

    out = remote.run_script(
        "z = x + y\nw = z * 2", data={"x": 2, "y": 3}, retrieve=["z", "w"])
    assert out == {"z": 5, "w": 10}


def test_dask_scheduler_executes_spec_graphs(spark):
    """contrib.dask.mars_scheduler (reference: mars/contrib/dask/)
    runs plain dask-spec graphs — tuples with callable heads, key
    references, nested key lists — without dask installed; engine
    frames flow through tasks like any value."""
    import pytest

    from mars_spark.contrib import convert_dask_collection, mars_scheduler

    def inc(x):
        return x + 1

    def add(a, b):
        return a + b

    dsk = {"a": 1,
           "b": (inc, "a"),
           "c": (inc, "b"),
           "d": (add, "b", "c"),
           "e": (sum, ["a", "b", "c", "d"])}
    assert mars_scheduler(dsk, "d") == 5
    assert mars_scheduler(dsk, ["a", ["b", "c"], "e"]) == [1, [2, 3], 11]
    with pytest.raises(ValueError, match="cycle"):
        mars_scheduler({"x": (inc, "y"), "y": (inc, "x")}, "x")
    # engine work inside a task: the callable drives a Spark action
    import mars_spark as ms

    def count_rows(n):
        import pandas as pd

        return ms.from_pandas(pd.DataFrame({"v": range(n)})) \
            .to_spark().count()

    assert mars_scheduler({"n": 7, "cnt": (count_rows, "n")},
                          "cnt") == 7
    # the converter needs dask itself (absent here — honest signal)
    with pytest.raises(ImportError, match="dask"):
        convert_dask_collection(object())
