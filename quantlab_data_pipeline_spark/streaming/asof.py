"""Streaming as-of enrichment: attach the latest reference value to an
event stream, online.

The batch twin is ``operators.asof.as_of_join`` (backward direction):
every left row takes the most recent right row per key. An always-on
pipeline needs the same join incrementally — "enrich each trade with
the latest quote", "stamp each click with the user's current segment".
Spark's built-in stream-stream join cannot express it (it needs an
event-time RANGE bound on both sides; "latest, unbounded" is exactly
the unbounded-state case it refuses), so this is the
``applyInPandasWithState`` shape: the carried state per key is ONE
(ts, value) pair — the newest reference row seen — regardless of how
much history has streamed past. State size = O(live keys), the same
bound as the streaming LOCF next to this module.

Wire format: both feeds union into one keyed stream with a ``side``
tag before the groupBy (the same union trick the batch operator uses
for its single shuffle):

* reference rows: ``side = 0``, carry ``ref_value``;
* event rows:     ``side = 1``, emitted with the carried value.

Ordering contract (same as locf.py): rows apply in (ts, side) order
within a micro-batch — a reference row at the same timestamp as an
event row applies first, keeping the join backward-INCLUSIVE like the
batch operator — and state carries across batches in arrival order;
per-key-ordered sources (partitioned logs) satisfy this.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("asof_ts", T.TimestampType()),
        T.StructField("asof_value", T.DoubleType()),
    ]
)

# newest reference row seen per key; micros instead of a nested
# timestamp (state tuples hold primitives portably)
ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_ref", T.BooleanType()),
        T.StructField("ref_ts_us", T.LongType()),
        T.StructField("ref_value", T.DoubleType()),
    ]
)


def _asof_fn(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    has_ref, ref_us, ref_val = (
        state.get if state.exists else (False, 0, 0.0)
    )
    out: list[dict] = []
    for pdf in batches:
        # side 0 (reference) before side 1 (event) at equal ts ->
        # backward-inclusive, matching the batch as_of_join tie rule
        pdf = pdf.sort_values(["ts", "side", "event_id"])
        for r in pdf.itertuples(index=False):
            if r.side == 0:
                has_ref = True
                ref_us = int(pd.Timestamp(r.ts).value // 1000)
                ref_val = float(r.ref_value)
            else:
                out.append(
                    {
                        "event_id": int(r.event_id),
                        "user_id": int(user_id),
                        "ts": r.ts,
                        "asof_ts": (
                            pd.Timestamp(ref_us * 1000) if has_ref else None
                        ),
                        "asof_value": ref_val if has_ref else None,
                    }
                )
    state.update((has_ref, ref_us, ref_val))
    yield pd.DataFrame(
        out,
        columns=["event_id", "user_id", "ts", "asof_ts", "asof_value"],
    )


def streaming_as_of(events: DataFrame, reference: DataFrame) -> DataFrame:
    """Enrich ``events`` (event_id, user_id, ts) with the most recent
    ``reference`` row (user_id, ts, ref_value) per user — the streaming
    twin of the backward as-of join. Both inputs may be streaming (they
    are unioned before the stateful step, so one keyed shuffle drives
    the whole join, exactly like the batch plan)."""
    ref = reference.select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ref_value").cast("double").alias("ref_value"),
        F.lit(0).alias("side"),
    )
    ev = events.select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("ref_value"),
        F.lit(1).alias("side"),
    )
    return (
        ev.unionByName(ref)
        .groupBy("user_id")
        .applyInPandasWithState(
            _asof_fn,
            outputStructType=ASOF_OUTPUT_SCHEMA,
            stateStructType=ASOF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
