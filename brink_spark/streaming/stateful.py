"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a lag+cumsum window
(queries/relational.py::q_events_sessionize); this is the same semantics as
an ONLINE operator: state = (last event epoch, sessions so far, events so
far) per user, carried across micro-batches. A new session starts when the
gap to the previous event exceeds ``gap_seconds`` — including across a
batch boundary, which is exactly what the window formulation cannot do
incrementally and why the state store exists.

Emits one row per user per micro-batch (Update semantics downstream: the
row with the highest ``version`` is the user's current total). Events
inside a batch are sorted by event time before folding, so the operator is
deterministic for any batch slicing that respects per-user arrival order —
the guarantee a keyed, watermarked source provides.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_TYPE = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("version", IntegerType()),  # micro-batch counter per key
    ]
)

STATE_TYPE = StructType(
    [
        StructField("last_epoch", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("version", IntegerType()),
    ]
)


def make_sessionizer(gap_seconds: int = 1800):
    """Build the applyInPandasWithState function (gap captured in the
    closure, like the normalize UDF captures its config)."""

    def sessionize(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_epoch, n_sessions, n_events, version = state.get
        else:
            last_epoch, n_sessions, n_events, version = None, 0, 0, 0
        epochs = []
        for pdf in pdfs:
            epochs.extend(int(t.timestamp()) for t in pdf["ts"])
        epochs.sort()
        for e in epochs:
            if last_epoch is None or e - last_epoch > gap_seconds:
                n_sessions += 1
            last_epoch = e
            n_events += 1
        version += 1
        state.update((last_epoch, n_sessions, n_events, version))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "version": [version],
            }
        )

    return sessionize


def sessionize_stream(events_stream, gap_seconds: int = 1800):
    """events stream (with a TIMESTAMP ``ts`` column) -> per-user running
    session totals, one row per key per micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=OUTPUT_TYPE,
        stateStructType=STATE_TYPE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
