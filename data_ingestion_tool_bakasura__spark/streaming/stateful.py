"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.C17/C18 — the escape hatch when built-in window/dedup state
doesn't express the semantics).

Implemented: per-user running counters with a high-water-mark anomaly
flag — each micro-batch updates (n_events, sum_value, max_value) state
per user and emits rows that breach the user's running max. The state
is explicit GroupState (one small tuple per user), timeout-free for
bounded replays; production streams set ``GroupStateTimeout`` so idle
keys expire with the watermark instead of accumulating forever.

Scale notes: state shuffles on the group key like any stateful op; the
state payload here is O(1) per key — the pattern to avoid is unbounded
per-key lists (collecting events into state), which turns the state
store into the dataset. Emit increments, keep aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_new_highs", T.LongType()),
    ]
)

_STATE_SCHEMA = "n_events LONG, sum_value DOUBLE, max_value DOUBLE, n_new_highs LONG"


def _make_update_user(order_col: str | None):
    def _update_user(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s, mx, highs = state.get if state.exists else (0, 0.0, float("-inf"), 0)
        if order_col:
            frames = [f for f in pdfs if len(f)]
            chunks = (
                [pd.concat(frames, ignore_index=True).sort_values(order_col)]
                if frames
                else []
            )
        else:
            chunks = pdfs
        for pdf in chunks:
            for v in pdf["value"].astype(float):
                n += 1
                s += v
                if v > mx:
                    mx = v
                    highs += 1
        state.update((n, s, mx, highs))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 6)], "n_new_highs": [highs]}
        )

    return _update_user


def running_user_stats(events: DataFrame, order_col: str | None = None) -> DataFrame:
    """Streaming per-user running stats with explicit GroupState; emits
    the current state once per user per micro-batch (update mode).

    ``order_col`` pins the fold order WITHIN each micro-batch (the rows
    a grouped-state UDF receives arrive in shuffle order, which is not
    deterministic): with e.g. ``order_col="event_id"`` the running-max
    counter ``n_new_highs`` becomes a pure function of the data — on a
    single-batch replay it equals the batch window expression ``value >
    max(value) OVER (... ORDER BY event_id ... UNBOUNDED PRECEDING AND
    1 PRECEDING)``, which is how the driver oracle value-checks this
    operator (plans/streaming_q.py q_stream_running_stats). Across
    micro-batches the fold remains arrival-ordered per batch — the
    honest streaming semantics. Sorting is per-(key, batch) in the
    Arrow-side pandas slice (tiny), not a shuffle.
    """
    cols = ["user_id", "value"] + ([order_col] if order_col else [])
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_user(order_col),
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
