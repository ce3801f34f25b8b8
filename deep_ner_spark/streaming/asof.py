"""Streaming point-in-time as-of attachment (SURVEY §2.9 stretch; the
online twin of operators/asof.py).

Spark has no stream-stream as-of join, so this is a custom stateful
operator over ``applyInPandasWithState``: the input is ONE stream of
union-tagged rows per key (turns ``is_state=0``, state updates
``is_state=1`` — the same union-tag shape the batch operator uses), and
per key the operator:

1. buffers turns and state updates that arrive out of order;
2. once the event-time watermark passes a turn's ts STRICTLY, no state
   update with ``state.ts <= turn.ts`` can arrive anymore (rows behind the
   watermark are dropped by the engine), so the turn is emitted with the
   latest buffered state where ``state.ts <= turn.ts`` — ties resolve
   exactly like the batch window: state-before-turn at equal ts, highest
   ``state_seq`` among equal-ts states;
3. prunes buffered state updates that are superseded: everything older
   than the newest update at-or-before the watermark (one survivor keeps
   serving future turns).

State per key is O(in-flight window), not O(history) — the 100TB-stream
property.  Emission is driven by new micro-batches AND by event-time
timeouts, so quiet keys still flush when the global watermark advances.
"""

from __future__ import annotations

from bisect import bisect_right

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_seq", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("state_value", T.DoubleType()),
    ]
)

# buffered (turn ts, turn seq) + (state ts, state seq, state value) arrays
STATE_SCHEMA = T.StructType(
    [
        T.StructField("t_ts", T.ArrayType(T.LongType())),
        T.StructField("t_seq", T.ArrayType(T.LongType())),
        T.StructField("s_ts", T.ArrayType(T.LongType())),
        T.StructField("s_seq", T.ArrayType(T.LongType())),
        T.StructField("s_val", T.ArrayType(T.DoubleType())),
    ]
)


def _attach(turns, states):
    """Latest state (ts, seq, val) per turn with state.ts <= turn.ts.

    ``states`` sorted by (ts, seq): bisect for the rightmost entry at or
    before the turn ts — rightmost == highest seq among equal ts, matching
    the batch window order (ts ASC, tag DESC, state_seq ASC + last()).
    """
    keys = [(ts, seq) for ts, seq, _ in states]
    out = []
    for t_ts, t_seq in turns:
        i = bisect_right(keys, (t_ts, float("inf")))
        out.append((t_ts, t_seq, states[i - 1][2] if i else None))
    return out


def _asof_state_fn(key, pdfs, state: GroupState):
    if state.exists:
        t_ts, t_seq, s_ts, s_seq, s_val = state.get
        turns = list(zip(t_ts, t_seq))
        states = list(zip(s_ts, s_seq, s_val))
    else:
        turns, states = [], []

    if not state.hasTimedOut:
        for pdf in pdfs:
            for is_s, ts_us, seq, val in zip(
                pdf["is_state"], pdf["ts_us"], pdf["seq"], pdf["value"]
            ):
                if is_s:
                    states.append((int(ts_us), int(seq), float(val)))
                else:
                    turns.append((int(ts_us), int(seq)))

    wm = state.getCurrentWatermarkMs() * 1000  # us
    states.sort()
    turns.sort()
    ready = [t for t in turns if t[0] < wm]
    pending = [t for t in turns if t[0] >= wm]
    rows = [
        (str(key[0]), int(seq), int(ts), val)
        for (ts, seq, val) in (
            (ts, seq, v) for (ts, seq, v) in _attach(ready, states)
        )
    ]

    # prune superseded states: keep everything newer than the watermark plus
    # the single latest at-or-before it (it serves future turns)
    keep_from = 0
    for i, (ts, _seq, _v) in enumerate(states):
        if ts < wm:
            keep_from = i
    states = states[keep_from:] if states else states

    if pending or states:
        state.update(
            (
                [t[0] for t in pending],
                [t[1] for t in pending],
                [s[0] for s in states],
                [s[1] for s in states],
                [s[2] for s in states],
            )
        )
        # flush on watermark advance even if the key goes quiet
        state.setTimeoutTimestamp(max(wm // 1000 + 1, 1))
    else:
        state.remove()

    yield pd.DataFrame(
        rows, columns=["conv_id", "turn_seq", "ts_us", "state_value"]
    )


def streaming_asof_attach(
    tagged: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming as-of over a union-tagged stream.

    ``tagged`` columns: (conv_id string, is_state int, ts timestamp,
    seq long, value double) — turns carry seq=turn_idx/value ignored,
    state updates carry seq=state_seq/value=the state.  Output appends one
    row per turn once the watermark passes its ts.
    """
    from pyspark.sql import functions as F

    prepared = tagged.withWatermark(ts_col, watermark).withColumn(
        "ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _asof_state_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
