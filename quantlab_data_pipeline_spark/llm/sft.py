"""Conversation / SFT training-example assembly from interaction logs.

The step between a raw event stream and a dialogue-tuning dataset:
group a user's events into an ordered conversation, map each event to
a (role, content) turn, truncate to a turn budget, and render one
training example per conversation with a stable fingerprint for
downstream dedup. Every chat-SFT pipeline (OpenAssistant-style log
mining, support-transcript distillation) runs exactly this shape; it
is also the canonical "collect_list ORDER BY" trap, handled here the
skew-safe way.

Scale shape: per-conversation ordering goes through
``grouped_global_rank`` (range partition + local rank + broadcast
offsets — no conversation ever sorts through one task, which matters
because log streams always have a bot/whale user), the turn budget is
applied BEFORE collect_list so the grouped state is bounded by
``max_turns`` regardless of how long a conversation ran, and the
rendering is built-in array/string expressions (no UDFs), so the
whole assembly replays exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    df: DataFrame,
    convo_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    role: Column | None = None,
    content: Column | None = None,
    max_turns: int = 64,
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation: ordered turns rendered to a training
    example. ``role`` / ``content`` are Column expressions evaluated
    per event (defaults: role = 'user', content = string of ``id_col``
    — callers always supply real ones). Returns ``(convo_col, n_turns,
    n_events, truncated, total_chars, convo_md5, rendering)`` where
    ``rendering`` is ``role|content`` lines joined by ``sep`` in turn
    order, ``convo_md5`` fingerprints it for downstream dedup, and
    ``truncated`` marks conversations that lost turns to ``max_turns``.

    Events with a null role or content are dropped before ranking (a
    turn that can't render can't occupy a slot in the budget).
    """
    if max_turns < 1:
        raise ValueError(f"max_turns must be >= 1, got {max_turns}")
    from ..operators.skew import grouped_global_rank

    role = role if role is not None else F.lit("user")
    content = (
        content if content is not None else F.col(id_col).cast("string")
    )
    turns = df.select(
        F.col(convo_col),
        F.col(ts_col),
        F.col(id_col),
        role.cast("string").alias("__role"),
        content.cast("string").alias("__content"),
    ).filter(F.col("__role").isNotNull() & F.col("__content").isNotNull())
    ranked = grouped_global_rank(
        turns,
        [convo_col],
        [F.col(ts_col).asc(), F.col(id_col).asc()],
        rank_col="__turn_idx",
        n_col="__n_events",
    )
    kept = ranked.filter(F.col("__turn_idx") <= max_turns)
    out = kept.groupBy(convo_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.max("__n_events").cast("long").alias("n_events"),
        F.sum(F.length("__content")).cast("long").alias("total_chars"),
        F.array_sort(
            F.collect_list(F.struct("__turn_idx", "__role", "__content"))
        ).alias("__turns"),
    )
    rendering = F.array_join(
        F.transform(
            F.col("__turns"),
            lambda t: F.concat(t["__role"], F.lit("|"), t["__content"]),
        ),
        sep,
    )
    return (
        out.withColumn("truncated", F.col("n_events") > F.col("n_turns"))
        .withColumn("rendering", rendering)
        .withColumn("convo_md5", F.md5(F.col("rendering")))
        .drop("__turns")
    )
