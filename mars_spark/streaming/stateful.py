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
    memory is O(distinct keys ever seen) and never evicted (NoTimeout)
    — compose with EventTimeTimeout (see emit_on_close_totals) when
    idle keys must be dropped."""

    out_schema = f"{key_col} bigint, n bigint, total double"
    state_schema = "n bigint, total double"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        # NoTimeout: hasTimedOut can never fire; state lives for the
        # stream's lifetime (see heavy_hitters' eviction note)
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


def heavy_hitters(sdf: SparkDF, group_col: str, item_col: str,
                  capacity: int = 16, ts_col: str = "ts",
                  watermark: str = "10 minutes") -> SparkDF:
    """Streaming per-group top-item tracking via the Space-Saving
    sketch (Metwally, Agrawal & El Abbadi, ICDT 2005 — the public
    bounded-memory heavy-hitters algorithm): state holds at most
    ``capacity`` (item, count, err) counters per group. An untracked
    item evicts the minimum counter, inheriting its count as the
    overestimation bound ``err`` — so for every emitted row,
    ``count - err <= true_count <= count``, and when a group's
    distinct items fit the capacity the counts are EXACT (err = 0).

    Emitted each micro-batch (update mode): the group's current
    counters. State is O(groups × capacity) regardless of stream
    length or item cardinality — the property that makes per-key
    top-k feasible on an unbounded 100 TB/day stream where a
    groupBy(item).count() would grow without bound. State lives for
    the stream's lifetime (NoTimeout): eviction of idle GROUPS is the
    caller's policy — compose with emit_on_close-style
    EventTimeTimeout when idle keys must be dropped."""

    key_type = dict(sdf.dtypes)[group_col]
    out_schema = (f"{group_col} {key_type}, item string, count bigint, "
                  "err bigint")
    state_schema = ("items array<string>, counts array<bigint>, "
                    "errs array<bigint>")

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            items, counts, errs = state.get
            tbl = {i: [c, e] for i, c, e in zip(items, counts, errs)}
        else:
            tbl = {}
        for pdf in pdfs:
            for item, c in pdf[item_col].value_counts().items():
                c = int(c)
                if item in tbl:
                    tbl[item][0] += c
                elif len(tbl) < capacity:
                    tbl[item] = [c, 0]
                else:
                    evict = min(tbl, key=lambda k: tbl[k][0])
                    floor = tbl.pop(evict)[0]
                    tbl[item] = [floor + c, floor]
        state.update((list(tbl), [v[0] for v in tbl.values()],
                      [v[1] for v in tbl.values()]))
        yield pd.DataFrame({
            group_col: [key[0]] * len(tbl),
            "item": list(tbl),
            "count": [v[0] for v in tbl.values()],
            "err": [v[1] for v in tbl.values()],
        })

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_quantile(sdf: SparkDF, group_col: str, value_col: str,
                       q: float = 0.5, ts_col: str = "ts",
                       watermark: str = "10 minutes") -> SparkDF:
    """Per-group running q-quantile estimate via the P² algorithm
    (Jain & Chlamtac, CACM 1985 — the classic constant-memory online
    quantile estimator): state is FIVE markers per group regardless of
    stream length, vs the unbounded buffer an exact streaming quantile
    needs. Emitted each micro-batch (update mode): the group's current
    estimate and observation count. Until 5 observations arrive the
    estimate is the exact order statistic of what has been seen.

    Accuracy is the P² contract (markers track the quantile curve by
    piecewise-parabolic adjustment; typical relative error well under
    1 % on smooth distributions) — for exact quantiles over a bounded
    window use the batch ``quantile`` on windowed aggregation
    output instead. State lives for the stream's lifetime
    (NoTimeout); see heavy_hitters for the idle-group eviction
    note."""

    key_type = dict(sdf.dtypes)[group_col]
    out_schema = f"{group_col} {key_type}, n bigint, estimate double"
    state_schema = ("qs array<double>, ns array<double>, "
                    "count bigint")
    probs = [0.0, q / 2, q, (1 + q) / 2, 1.0]

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            heights, posns, n = state.get
            heights, posns = list(heights), list(posns)
        else:
            heights, posns, n = [], [1.0, 2.0, 3.0, 4.0, 5.0], 0
        for pdf in pdfs:
            for x in pdf[value_col].astype(float):
                n += 1
                if len(heights) < 5:
                    heights.append(x)
                    heights.sort()
                    continue
                # locate cell k of x; clamp ends (markers 0/4 track
                # the running min/max)
                if x < heights[0]:
                    heights[0] = x
                    k = 0
                elif x >= heights[4]:
                    heights[4] = x
                    k = 3
                else:
                    k = next(i for i in range(4)
                             if heights[i] <= x < heights[i + 1])
                for i in range(k + 1, 5):
                    posns[i] += 1
                desired = [1 + (n - 1) * p for p in probs]
                for i in (1, 2, 3):
                    d = desired[i] - posns[i]
                    if ((d >= 1 and posns[i + 1] - posns[i] > 1)
                            or (d <= -1 and posns[i - 1] - posns[i] < -1)):
                        s = 1 if d >= 0 else -1
                        # piecewise-parabolic prediction, linear fallback
                        hp = heights[i] + s / (posns[i + 1] - posns[i - 1]) * (
                            (posns[i] - posns[i - 1] + s)
                            * (heights[i + 1] - heights[i])
                            / (posns[i + 1] - posns[i])
                            + (posns[i + 1] - posns[i] - s)
                            * (heights[i] - heights[i - 1])
                            / (posns[i] - posns[i - 1]))
                        if not heights[i - 1] < hp < heights[i + 1]:
                            j = i + s
                            hp = heights[i] + s * (heights[j] - heights[i]) \
                                / (posns[j] - posns[i])
                        heights[i] = hp
                        posns[i] += s
        if len(heights) < 5:
            seen = sorted(heights)
            idx = min(int(q * len(seen)), len(seen) - 1) if seen else 0
            est = seen[idx] if seen else float("nan")
        else:
            est = heights[2]
        state.update((heights, posns, n))
        yield pd.DataFrame({group_col: [key[0]], "n": [n],
                            "estimate": [est]})

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def emit_on_close_totals(sdf: SparkDF, key_col: str, value_col: str,
                         ts_col: str = "ts", gap: str = "10 minutes",
                         watermark: str = "10 minutes") -> SparkDF:
    """Custom sessionization with EMIT-ON-CLOSE semantics: per-key
    totals accumulate silently and are emitted exactly once, when the
    key has been quiet for ``gap`` of event time — the state times out
    (EventTimeTimeout) once the watermark passes last_event + gap and
    ``hasTimedOut`` delivers the final row. This is the stateful
    pattern built-in session windows can't express (arbitrary payload,
    single closing emission), and the state store stays O(open keys):
    eviction is driven by the same watermark that bounds every other
    stateful op."""
    import re as _re

    m = _re.match(r"(\d+)\s*(second|minute|hour)s?", gap)
    if not m:
        raise ValueError(f"unsupported gap: {gap!r}")
    gap_ms = int(m.group(1)) * {"second": 1, "minute": 60,
                                "hour": 3600}[m.group(2)] * 1000

    out_schema = f"{key_col} bigint, n bigint, total double"
    state_schema = "n bigint, total double, last_ms bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total": [total]})
            return
        n, total, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            last = max(last, int(pdf[ts_col].max().value // 10 ** 6))
        state.update((n, total, last))
        state.setTimeoutTimestamp(last + gap_ms)
        return
        yield  # generator form with no per-batch emission

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
