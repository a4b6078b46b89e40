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


def dpo_pairs(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str = "event_id",
    content: Column | None = None,
    min_margin: int = 0,
) -> DataFrame:
    """Preference-pair assembly — the DPO/RLHF sibling of
    :func:`assemble_conversations`: within each group (a user session,
    a prompt id), pick the highest-ordered item as ``chosen`` and the
    lowest as ``rejected``, emit one training pair per group with an
    exact integer margin and a stable fingerprint. Every
    preference-tuning pipeline mines logged feedback exactly this way
    (best-vs-worst completion per prompt).

    ``order_col`` must be numeric; ties break by ``id_col`` ascending
    on the chosen side and descending on the rejected side, so the
    pair is a pure function of the data. Groups with fewer than two
    items, or whose margin (chosen minus rejected, in exact CENTS —
    ``floor(v * 100 + 0.5)``, never a float) is <= ``min_margin``,
    produce no pair: a preference you can't order is not a label.
    Null ``order_col`` rows are dropped first (they can't rank).

    Scale shape: ONE pass of the skew-safe ``grouped_global_rank``
    over a composite that makes both extremes rank-1-adjacent — rank
    ascending once, pick rank 1 (rejected) and rank n (chosen) — so a
    whale group never funnels through one task and the corpus
    shuffles once; the per-group pivot then aggregates exactly two
    rows per group. Pure expressions; replays in SQL as two window
    picks, which is what the oracle does.
    """
    from ..operators.skew import grouped_global_rank

    content = (
        content if content is not None else F.col(id_col).cast("string")
    )
    cents = F.floor(F.col(order_col) * 100 + F.lit(0.5)).cast("long")
    rows = (
        df.filter(F.col(order_col).isNotNull())
        .withColumn("__cents", cents)
        .withColumn("__content", content.cast("string"))
    )
    ranked = grouped_global_rank(
        rows,
        group_cols,
        [F.col("__cents").asc(), F.col(id_col).desc()],
        rank_col="__r",
        n_col="__n",
    )
    ends = ranked.filter(
        (F.col("__r") == 1) | (F.col("__r") == F.col("__n"))
    ).filter(F.col("__n") >= 2)
    pair = ends.groupBy(*group_cols).agg(
        F.max(F.when(F.col("__r") == F.col("__n"), F.col(id_col))).alias(
            "chosen_id"
        ),
        F.max(
            F.when(F.col("__r") == F.col("__n"), F.col("__content"))
        ).alias("chosen"),
        F.max(
            F.when(F.col("__r") == F.col("__n"), F.col("__cents"))
        ).alias("chosen_cents"),
        F.max(F.when(F.col("__r") == 1, F.col(id_col))).alias(
            "rejected_id"
        ),
        F.max(F.when(F.col("__r") == 1, F.col("__content"))).alias(
            "rejected"
        ),
        F.max(F.when(F.col("__r") == 1, F.col("__cents"))).alias(
            "rejected_cents"
        ),
    )
    out = pair.withColumn(
        "margin_cents", F.col("chosen_cents") - F.col("rejected_cents")
    ).filter(F.col("margin_cents") > int(min_margin))
    return out.withColumn(
        "pair_md5",
        F.md5(
            F.concat_ws(
                "|",
                F.col("chosen_id").cast("string"),
                F.col("rejected_id").cast("string"),
                F.col("chosen"),
                F.col("rejected"),
            )
        ),
    )
