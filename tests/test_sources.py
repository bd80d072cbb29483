"""IO round-trip tests (reference: datasource/datastore §2.1)."""

import os
import tempfile

import pandas as pd
import pytest

import mars_spark as ms


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_parquet_roundtrip(spark, pdf_numeric, tmpdir):
    path = os.path.join(tmpdir, "pq")
    f = ms.from_pandas(pdf_numeric)
    f.to_parquet(path)
    back = ms.read_parquet(path)
    assert back.count() == len(pdf_numeric)
    assert sorted(back.columns) == sorted(pdf_numeric.columns)


def test_csv_roundtrip(spark, tmpdir):
    pdf = pd.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    path = os.path.join(tmpdir, "csv")
    ms.from_pandas(pdf).to_csv(path)
    back = ms.read_csv(path, schema="a bigint, s string").to_pandas()
    assert sorted(back.a) == [1, 2, 3]


def test_json_roundtrip(spark, tmpdir):
    pdf = pd.DataFrame({"a": [1, 2], "s": ["x", "y"]})
    path = os.path.join(tmpdir, "json")
    ms.from_pandas(pdf).to_json(path)
    back = ms.read_json(path).to_pandas()
    assert sorted(back.a) == [1, 2]


def test_read_parquet_column_pruning(spark, pdf_numeric, tmpdir):
    path = os.path.join(tmpdir, "pq2")
    ms.from_pandas(pdf_numeric).to_parquet(path)
    f = ms.read_parquet(path, columns=["a"])
    assert f.columns == ["a"]
    plan = f.to_spark()._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<a:bigint>" in plan


def test_range(spark):
    out = ms.range_(0, 100, 2).to_pandas()
    assert len(out) == 50


def test_partitioned_write(spark, tmpdir):
    pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    path = os.path.join(tmpdir, "part")
    ms.from_pandas(pdf).to_parquet(path, partition_by="k")
    assert os.path.isdir(os.path.join(path, "k=a"))
    back = ms.read_parquet(path)
    assert back.count() == 3


def test_sql_roundtrip_embedded_derby(spark, tmpdir):
    """to_sql → read_sql end-to-end against the embedded Derby that
    ships in Spark's jars (the sandbox has no external JDBC endpoint;
    embedded Derby is a real one). read_sql exercises the numeric
    range-partitioning path — the reference's read_sql.py:348 strategy
    on Spark's native JDBC partitioning."""
    url = f"jdbc:derby:{tmpdir}/db;create=true"
    pdf = pd.DataFrame({"id": list(range(200)),
                        "v": [i * 0.25 for i in range(200)]})
    ms.from_pandas(pdf).to_sql("t_rt", url, mode="overwrite")
    back = ms.read_sql("t_rt", url, partition_column="id",
                       lower_bound=0, upper_bound=200, num_partitions=4)
    assert back.to_spark().rdd.getNumPartitions() == 4
    got = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == 200
    assert got.id.sum() == pdf.id.sum()
    assert abs(got.v.sum() - pdf.v.sum()) < 1e-9
    # unpartitioned read path
    one = ms.read_sql("t_rt", url)
    assert one.count() == 200


def test_load_cache_isolation(spark):
    """queries.load memoizes the immutable scan per SparkContext but
    must hand each caller an independent mutable wrapper: in-place
    df[col]= on one loaded frame cannot leak into another."""
    from mars_spark.queries.tpch import load

    sf = "/root/testdata/sf0.001"
    a = load(sf, "orders")
    b = load(sf, "orders")
    # shared immutable plan (the cache hit), independent wrappers
    assert a.to_spark() is b.to_spark()
    a["y"] = a.o_orderdate.dt.year
    assert "y" in a.columns
    assert "y" not in b.columns
    # values still come through the cached plan
    n = b.to_spark().count()
    assert n > 0 and load(sf, "orders").to_spark().count() == n


def test_from_tensor_shapes(spark):
    import numpy as np

    import mars_spark as ms

    mat = np.arange(12, dtype=np.int64).reshape(4, 3)
    f = ms.from_tensor(mat, columns=["a", "b", "c"])
    got = f.to_pandas().sort_values("a").reset_index(drop=True)
    assert list(got.columns) == ["a", "b", "c"]
    np.testing.assert_array_equal(got.to_numpy(), mat)

    # default columns are stringified positions (reference parity)
    f2 = ms.from_tensor(mat)
    assert list(f2.to_pandas().columns) == ["0", "1", "2"]

    # 1-D -> Series; aggregate round-trips exactly
    s = ms.from_tensor(np.array([3, 1, 4, 1, 5], dtype=np.int64),
                       name="v")
    assert s.name == "v"
    assert int(s.sum()) == 14

    # index lands as the frame's index column (the engine keeps the
    # index as a column — to_pandas does not re-materialize it as the
    # pandas index; same contract as set_index)
    fi = ms.from_tensor(mat, index=np.array([10, 20, 30, 40]),
                        columns=["a", "b", "c"])
    pdf = fi.to_pandas()
    assert sorted(pdf["index"].tolist()) == [10, 20, 30, 40]
    aligned = pdf.sort_values("index").reset_index(drop=True)
    np.testing.assert_array_equal(aligned[["a", "b", "c"]].to_numpy(),
                                  mat)

    import pytest

    with pytest.raises(ValueError):
        ms.from_tensor(np.zeros((2, 2, 2)))
