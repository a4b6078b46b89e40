"""Stateful streaming deduplication — incremental exact dedup over a
document stream with ``applyInPandasWithState``.

Batch exact dedup (llm/dedup.py) answers "which docs are copies" after
the fact; this operator answers it *online*: the first document with a
given content fingerprint passes through, later copies are dropped,
and the seen-set lives in Spark's managed state store (checkpointed,
partitioned by fingerprint, survives restarts). This is the shape an
always-on training-data intake needs — the state store scales out with
the key space instead of a driver-side set.

The grouping key is the fingerprint itself, so state per group is just
(first_seen flag + count); no per-key memory growth beyond the key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Output: the surviving (first-seen) docs + running copy count per hash.
DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_copies_so_far", T.LongType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)

# State per fingerprint: keeper id + how many copies seen.
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keeper_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def with_fingerprint_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Same normalization + md5 as the batch exact dedup, on a stream."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return docs.withColumn("fingerprint", F.md5(norm))


def _dedup_fn(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (fingerprint,) = key
    keeper_id, n_seen = state.get if state.exists else (None, 0)
    out_rows: list[dict[str, Any]] = []
    for pdf in batches:
        for doc_id in sorted(int(x) for x in pdf["doc_id"]):
            n_seen += 1
            if keeper_id is None:
                keeper_id = doc_id
                out_rows.append(
                    {
                        "fingerprint": fingerprint,
                        "doc_id": doc_id,
                        "n_copies_so_far": n_seen,
                        "is_first": True,
                    }
                )
    state.update((keeper_id, n_seen))
    yield pd.DataFrame(
        out_rows, columns=["fingerprint", "doc_id", "n_copies_so_far", "is_first"]
    )


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Emit only the first-seen document per content fingerprint.

    ``applyInPandasWithState`` keyed on the fingerprint: each micro-batch
    updates (keeper_id, n_seen) in the state store and emits a row only
    when a fingerprint is new. Downstream sees an append-only stream of
    unique documents.
    """
    return (
        with_fingerprint_stream(docs, text_col)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
