"""Streaming forward-fill (last observation carried forward).

The batch twin (``queries_ext.forward_fill``) gap-fills a static table
with one window sort; an always-on feed needs the same semantics online:
'error' readings take the most recent good value of their key's series,
and the carry must survive across micro-batches and restarts. That
carry is exactly one (value, timestamp) pair per key — a textbook fit
for ``applyInPandasWithState``: keyed state in Spark's managed store
(checkpointed, scales out with the key space), no driver-side dict.

Ordering contract: rows are filled in (ts, event_id) order *within*
each micro-batch, and state carries across batches in arrival order —
the standard LOCF-stream assumption of a per-key-ordered source (e.g.
a partitioned log). A row older than the carried state still fills
from that state; feeds with heavy cross-batch reordering should window
upstream first.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LOCF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("filled_value", T.DoubleType()),
    ]
)

# Per-key carry: the last good value (None encoded as has_value=False —
# state tuples cannot hold nullable doubles portably).
LOCF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_value", T.BooleanType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _locf_fn(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    has_value, last = state.get if state.exists else (False, 0.0)
    out: list[dict] = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts", "event_id"])
        for r in pdf.itertuples(index=False):
            good = r.event_type != "error" and pd.notna(r.value)
            if good:
                has_value, last = True, float(r.value)
            out.append(
                {
                    "event_id": int(r.event_id),
                    "user_id": int(user_id),
                    "ts": r.ts,
                    "filled_value": (
                        float(r.value)
                        if good
                        else (last if has_value else None)
                    ),
                }
            )
    state.update((has_value, last))
    yield pd.DataFrame(out, columns=["event_id", "user_id", "ts", "filled_value"])


def streaming_forward_fill(events: DataFrame) -> DataFrame:
    """Gap-fill an event stream per user: good rows pass through and
    refresh the carry, 'error' rows emit the carried value (null before
    the first good reading). Expects (event_id, user_id, ts, event_type,
    value) columns, as the events source provides."""
    return (
        events.select("event_id", "user_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _locf_fn,
            outputStructType=LOCF_OUTPUT_SCHEMA,
            stateStructType=LOCF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
