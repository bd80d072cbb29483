"""Physical-plan guard over the FULL batch corpus: no query row may
ever plan a CartesianProduct; BroadcastNestedLoopJoin is allowed only
where the intended plan broadcasts a scalar/tiny frame (1-row stats
blocks, query vectors, thresholds). Scan-heavy rows additionally
assert parquet pushdown (non-empty PushedFilters) and, for the
flagship scan, column pruning (ReadSchema narrowing). A regression
here is invisible to correctness tests (the answer stays right) but
fatal at 100 TB — this is the automated form of
tools/explain_audit.py for the patterns that matter most.
"""

from __future__ import annotations

import os
import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present")

# Streaming rows execute stream lifecycles on construction — guarded by
# their own tests (tests/test_learn_streaming.py), not plannable here.
STREAMING = {"events_stream_windows", "op_stream_stateful"}

# Rows where a BroadcastNestedLoopJoin IS the intended plan: a
# broadcast cross against a 1-row (or few-row) frame. Each entry names
# the tiny side being broadcast.
BNLJ_OK = {
    "events_hourly_funnel": "1-row funnel totals",
    "emb_topk_label_stats": "1-row query vector + stats block",
    "op_groupby_rowops": "1-row describe-stats block",
    "op_io_roundtrip": "1-row per-format aggregate blocks",
    "op_stats": "1-row corr/cov stats block",
    "tpch_q06_12_14_17_19": "q06/q14/q17/q19 scalar aggregates",
    "tpch_q04_22": "q22 avg-balance scalar",
    "tpch_q11_adapted": "group-value threshold scalar",
    "tpch_q20_adapted": "half-avg-quantity scalar",
    "docs_dedup_simhash": "corpus-wide distinct-fp scalar",
    "emb_ann_recall": "1-row recall + semantic-dedup count blocks",
    "docs_jaccard_pairs": "1-row BM25 corpus stats (N, avgdl) block",
    "docs_curation_ops": "1-row unigram-LM total-token scalar",
}

# Rows whose plans must show non-empty parquet PushedFilters (every
# row that filters a base table early; rows absent here either scan
# whole tables by design — window funcs, pivots, IO round-trips — or
# read via non-parquet paths).
PUSHDOWN = [
    "op_groupby_rowops", "op_ewm_expanding", "op_series_misc",
    "tpch_q06_12_14_17_19", "tpch_q04_22", "emb_topk_label_stats",
    "tpch_q21_adapted", "tpch_q02_adapted", "tpch_q11_adapted",
    "tpch_q16_adapted", "tpch_q20_adapted", "tpch_q01", "tpch_q05_07",
    "tpch_q08_09", "tpch_q13", "tpch_q15", "tpch_q18", "tpch_q03_10",
    "op_multimodal", "docs_text_metrics", "docs_dedup_simhash",
    "emb_neardup_pairs", "op_window_rank",
    "op_melt_explode", "op_skew_salted", "op_asof_join", "op_align",
    "op_groupby_custom",
]

BATCH = [n for n in entry.queries() if n not in STREAMING]

_plan_cache: dict[str, str] = {}


def _plan(spark, name: str) -> str:
    if name not in _plan_cache:
        df = entry.queries()[name](spark, SF)
        _plan_cache[name] = (
            df._jdf.queryExecution().executedPlan().toString())
    return _plan_cache[name]


@pytest.mark.parametrize("name", BATCH)
def test_no_cartesian_or_unlisted_bnlj(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize("name", PUSHDOWN)
def test_parquet_filter_pushdown(spark, name):
    plan = _plan(spark, name)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(x.strip() for x in pushed), (
        f"{name}: no non-empty PushedFilters in any scan")


def test_flagship_scan_prunes_columns(spark):
    # tpch_q01 projects 7 of lineitem's 16 columns — the scan schema
    # must reflect that (a full-width ReadSchema means pruning broke)
    plan = _plan(spark, "tpch_q01")
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m, "no ReadSchema in tpch_q01 plan"
    ncols = len([c for c in m.group(1).split(",") if ":" in c])
    assert ncols <= 8, f"tpch_q01 scan reads {ncols} columns"


def test_ungrouped_windows_never_plan_single_partition(spark):
    """r14: the boundary-exchange / prefix-carry machinery must keep
    ungrouped rolling/expanding/shift/cumsum/ffill plans free of the
    single-partition global-window shape (Exchange SinglePartition
    feeding a Window). The pad/carry designs partition by __tgt/__pid
    instead — a regression here silently reintroduces the one-task
    bottleneck this round removed."""
    import numpy as np
    import pandas as pd

    import mars_spark as ms
    from mars_spark.operators.window import cumsum, ewm_agg, shift

    p = pd.DataFrame({"i": np.arange(64), "v": np.arange(64) * 1.0})
    f = ms.from_pandas(p, num_partitions=4)

    def plan_of(df):
        return df._sdf._jdf.queryExecution().executedPlan().toString()

    bad = re.compile(r"Exchange SinglePartition[\s\S]{0,400}?Window")
    plans = {
        "rolling": plan_of(f.rolling(5, min_periods=1)
                           .over(order_by="i").agg({"v": "sum"})),
        "expanding": plan_of(f.expanding(min_periods=1)
                             .over(order_by="i").agg({"v": "sum"})),
        "shift": plan_of(shift(f, 1, order_by=["i"], cols=["v"])),
        "cumsum": plan_of(cumsum(f, "v", order_by=["i"])),
        "ffill": plan_of(f.set_index("i").ffill()),
        "ewm": plan_of(ewm_agg(f, "v", alpha=0.3, order_by="i")),
    }
    for name, plan in plans.items():
        assert not bad.search(plan), (
            f"ungrouped {name} plans a single-partition window")
        assert "CartesianProduct" not in plan, name
