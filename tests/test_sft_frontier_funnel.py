"""Unit tests for the round-9 curation additions: conversation/SFT
assembly (`llm/sft.py`), crawl-frontier politeness scheduling
(`llm/urls.py frontier_schedule`), and the filter-ablation funnel
(`llm/text.py filter_funnel`)."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.sft import assemble_conversations
from quantlab_data_pipeline_spark.llm.text import filter_funnel
from quantlab_data_pipeline_spark.llm.urls import frontier_schedule


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


# ---------------------------------------------------------------- sft


@pytest.fixture(scope="module")
def convo_df(spark):
    rows = [
        # user 1: 3 turns, ts tie on the last two -> event_id breaks it
        Row(user_id=1, ts=_ts(0), event_id=10, et="ask", v="hi"),
        Row(user_id=1, ts=_ts(5), event_id=11, et="answer", v="hello"),
        Row(user_id=1, ts=_ts(5), event_id=12, et="ask", v="bye"),
        # user 2: 1 turn + a null-content event that must not count
        Row(user_id=2, ts=_ts(1), event_id=20, et="ask", v="x"),
        Row(user_id=2, ts=_ts(2), event_id=21, et="ask", v=None),
    ]
    return spark.createDataFrame(rows)


def test_assembly_order_and_md5(spark, convo_df):
    out = assemble_conversations(
        convo_df,
        convo_col="user_id",
        ts_col="ts",
        id_col="event_id",
        role=F.when(F.col("et") == "ask", "user").otherwise("assistant"),
        content=F.col("v"),
        max_turns=10,
    ).collect()
    by_user = {r.user_id: r for r in out}
    r1 = by_user[1]
    want = "user|hi\nassistant|hello\nuser|bye"
    assert r1.rendering == want
    assert r1.convo_md5 == hashlib.md5(want.encode()).hexdigest()
    assert (r1.n_turns, r1.n_events, r1.truncated) == (3, 3, False)
    assert r1.total_chars == len("hi") + len("hello") + len("bye")
    # null-content event dropped before ranking
    assert by_user[2].n_turns == 1 and by_user[2].rendering == "user|x"


def test_assembly_truncation(spark, convo_df):
    out = assemble_conversations(
        convo_df,
        convo_col="user_id",
        ts_col="ts",
        id_col="event_id",
        role=F.lit("user"),
        content=F.col("et"),
        max_turns=2,
    ).collect()
    r1 = {r.user_id: r for r in out}[1]
    assert (r1.n_turns, r1.n_events, r1.truncated) == (2, 3, True)
    assert r1.rendering == "user|ask\nuser|answer"


def test_assembly_equals_naive_window(spark, convo_df):
    got = assemble_conversations(
        convo_df,
        convo_col="user_id",
        ts_col="ts",
        id_col="event_id",
        role=F.lit("u"),
        content=F.col("et"),
        max_turns=2,
    )
    convo_df.createOrReplaceTempView("convo_raw")
    want = spark.sql(
        """
        WITH r AS (
            SELECT user_id, et,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rk
            FROM convo_raw WHERE et IS NOT NULL
        )
        SELECT user_id,
               md5(array_join(
                   transform(
                       array_sort(collect_list(struct(rk, et))),
                       t -> concat('u', '|', t.et)), '\n')) AS convo_md5
        FROM r WHERE rk <= 2 GROUP BY user_id
        """
    )
    g = {r.user_id: r.convo_md5 for r in got.collect()}
    w = {r.user_id: r.convo_md5 for r in want.collect()}
    assert g == w


def test_assembly_bad_max_turns(spark, convo_df):
    with pytest.raises(ValueError):
        assemble_conversations(convo_df, max_turns=0)


# ----------------------------------------------------------- frontier


@pytest.fixture(scope="module")
def frontier_df(spark):
    rows = [
        Row(url_id=1, host="a.com", priority=10),
        Row(url_id=2, host="a.com", priority=30),
        Row(url_id=3, host="a.com", priority=30),  # tie -> id order
        Row(url_id=4, host="b.com", priority=5),
        Row(url_id=5, host="b.com", priority=None),  # nulls last
        Row(url_id=6, host=None, priority=50),  # null host = one queue
        Row(url_id=7, host=None, priority=60),
    ]
    return spark.createDataFrame(rows)


def test_frontier_politeness_and_order(spark, frontier_df):
    out = {
        r.url_id: (r.fetch_round, r.slot_in_round)
        for r in frontier_schedule(frontier_df).collect()
    }
    # per-host rounds: a.com queue order 2,3,1; b.com 4,5; nulls 7,6
    assert out[2][0] == 0 and out[3][0] == 1 and out[1][0] == 2
    assert out[4][0] == 0 and out[5][0] == 1
    assert out[7][0] == 0 and out[6][0] == 1
    # no host twice in a round
    rows = frontier_schedule(frontier_df).collect()
    seen = set()
    for r in rows:
        key = (r.fetch_round, r.host)
        assert key not in seen
        seen.add(key)
    # round 0 dispatch order: priority 60 (id 7), 30 (id 2), 5 (id 4)
    r0 = sorted(
        ((r.slot_in_round, r.url_id) for r in rows if r.fetch_round == 0)
    )
    assert [u for _, u in r0] == [7, 2, 4]


def test_frontier_equals_naive_windows(spark, frontier_df):
    got = frontier_schedule(frontier_df)
    frontier_df.createOrReplaceTempView("frontier_raw")
    want = spark.sql(
        """
        WITH r AS (
            SELECT url_id,
                   CAST(row_number() OVER (
                       PARTITION BY host
                       ORDER BY priority DESC NULLS LAST, url_id
                   ) - 1 AS BIGINT) AS fetch_round
            FROM frontier_raw
        )
        SELECT url_id, fetch_round,
               CAST(row_number() OVER (
                   PARTITION BY fetch_round
                   ORDER BY priority DESC NULLS LAST, url_id
               ) AS BIGINT) AS slot_in_round
        FROM r JOIN frontier_raw USING (url_id)
        """
    )
    g = {(r.url_id, r.fetch_round, r.slot_in_round) for r in got.collect()}
    w = {(r.url_id, r.fetch_round, r.slot_in_round) for r in want.collect()}
    assert g == w


# ------------------------------------------------------------- funnel


def test_funnel_marginal_vs_solo(spark):
    df = spark.createDataFrame(
        [
            Row(a=True, b=True),    # survives
            Row(a=False, b=True),   # killed at 0
            Row(a=False, b=False),  # killed at 0, solo-flagged by 1 too
            Row(a=True, b=False),   # killed at 1
            Row(a=True, b=None),    # null flag = fail at 1
        ]
    )
    out = filter_funnel(
        df, [("a", F.col("a")), ("b", F.col("b"))]
    ).collect()
    s = {r.stage: r for r in out}
    assert [r.stage_idx for r in out] == [0, 1]
    assert (s["a"].n_in, s["a"].n_killed, s["a"].n_flagged_solo,
            s["a"].n_out) == (5, 2, 2, 3)
    assert (s["b"].n_in, s["b"].n_killed, s["b"].n_flagged_solo,
            s["b"].n_out) == (3, 2, 3, 1)


def test_funnel_empty_input(spark):
    df = spark.createDataFrame([], "a boolean")
    out = filter_funnel(df, [("a", F.col("a"))]).collect()
    assert len(out) == 1
    assert (out[0].n_in, out[0].n_killed, out[0].n_out) == (0, 0, 0)


def test_funnel_bad_args(spark):
    df = spark.createDataFrame([Row(a=True)])
    with pytest.raises(ValueError):
        filter_funnel(df, [])
    with pytest.raises(ValueError):
        filter_funnel(df, [("x", F.col("a")), ("x", F.col("a"))])
