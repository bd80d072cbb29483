"""Physical-plan guard: the join-heavy corpus rows must never plan
CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
broadcast cross of a scalar/tiny frame is the intended plan. A
regression here is invisible to correctness tests (the answer stays
right) but fatal at 100 TB — this is the automated form of
tools/explain_audit.py for the patterns that matter most.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF), reason="driver testdata not present")

# rows whose plans carry the big joins; streaming rows are excluded
# (they execute stream lifecycles on construction), as are rows that
# collect driver-side scalars eagerly
GUARDED = [
    "tpch_q03_10", "tpch_q05_07", "tpch_q08_09", "tpch_q13",
    "tpch_q18", "tpch_q21_adapted", "op_asof_join", "op_align",
    "op_melt_explode", "op_skew_salted", "docs_jaccard_pairs",
    "docs_minhash_dedup", "emb_neardup_pairs",
]

# intentional broadcast-cross of scalar frames (1-row funnel / query
# vector / stats blocks) — BNLJ of a broadcast single row is the plan
BNLJ_OK = {"emb_topk_label_stats", "events_hourly_funnel"}


@pytest.mark.parametrize("name", GUARDED)
def test_no_cartesian_or_bnlj(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name
