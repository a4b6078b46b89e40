"""Sequence packing: arrange documents into fixed token-budget training
sequences — the step between a filtered/deduped corpus and a pretraining
dataloader.

Two published strategies, both scale-shaped:

* :func:`chunk_plan` — "concatenate and chunk" (GPT-style): documents are
  laid end-to-end in a deterministic global order and sliced into
  ``max_tokens``-sized windows; a document may span a chunk boundary.
  The global token offset is a *distributed prefix sum* (per-partition
  subtotals + broadcast offsets), never a single-partition window — the
  classic way a 100 TB corpus gets globally consecutive positions
  without serializing through one task.
* :func:`pack_documents` — greedy first-fit packing (T5/LLaMA-style
  "no document crosses a sequence boundary"): per-partition sequential
  bin packing inside ``applyInPandas``, with globally unique pack ids
  formed from the partition id. Packing quality is partition-local
  (the published pipelines do exactly this — global optimal bin packing
  is NP-hard and unnecessary), while the token budget is a hard
  guarantee.

Token counts default to the repo's BPE-ish ``TOKEN_PATTERN`` regex count
(same tokenizer as :func:`.text.with_text_stats`), or pass a
pre-computed ``token_col``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localframe import local_df
from .text import TOKEN_PATTERN


def _with_tokens(df: DataFrame, text_col: str, token_col: str | None) -> tuple[DataFrame, str]:
    """Token count column, null-safe: a null text (or null pre-computed
    count) packs as 0 tokens instead of crashing the Arrow batch with a
    NaN->int cast."""
    if token_col is not None:
        return (
            df.withColumn(
                token_col, F.coalesce(F.col(token_col).cast("long"), F.lit(0))
            ),
            token_col,
        )
    return (
        df.withColumn(
            "n_tokens",
            F.regexp_count(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(TOKEN_PATTERN)
            ).cast("long"),
        ),
        "n_tokens",
    )


def chunk_plan(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    sep_tokens: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk layout: global token offset per document plus the
    range of fixed-size training chunks the document spans.

    Output columns: ``id_col``, ``n_tokens``, ``offset`` (global start
    position, with ``sep_tokens`` end-of-document separators counted),
    ``first_chunk``, ``last_chunk`` (0-based ids of the
    ``max_tokens``-sized windows touching the document).

    Scale shape: the corpus is range-partitioned and sorted by
    ``id_col`` (deterministic layout order), each task computes a local
    running sum, and only the per-partition subtotals (one row per
    partition — thousands, not billions) are collected into a broadcast
    offset map. No stage ever sees the corpus in a single partition,
    which is the failure mode of the naive
    ``sum().over(Window.orderBy(id))`` plan.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    df, tok = _with_tokens(df, text_col, token_col)
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(id_col, F.col(tok).cast("long").alias("__tok"))
        .withColumn("__cost", F.col("__tok") + F.lit(int(sep_tokens)))
        .repartitionByRange(n_parts, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    id_type = dict(base.dtypes)[id_col]

    # Local prefix sum via mapInPandas: Arrow batches arrive in partition
    # order, so a running accumulator across batches IS the partition
    # cumsum — and unlike Window.partitionBy(spark_partition_id()),
    # which Catalyst cannot prove is a no-op exchange, this moves zero
    # rows.
    def local_cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = 0
        for b in batches:
            costs = b["__cost"].astype("int64")
            off = costs.cumsum() - costs + acc
            acc += int(costs.sum())
            yield pd.DataFrame(
                {
                    id_col: b[id_col].values,
                    "__tok": b["__tok"].values,
                    "__cost": costs.values,
                    "__pid": b["__pid"].values,
                    "__local_off": off.values,
                }
            )

    local = base.mapInPandas(
        local_cumsum,
        f"`{id_col}` {id_type}, __tok long, __cost long, __pid int, __local_off long",
    )
    # Partition subtotals: tiny (one row per partition) — the cumulative
    # offsets are a driver-scale problem even at petabyte corpora.
    # Computed from `base` (pure JVM agg), NOT from `local`: the sums
    # are order-independent so both evaluations agree, and this avoids
    # persisting the Arrow-side frame just to read it twice.
    totals = (
        base.groupBy("__pid").agg(F.sum("__cost").alias("__ptotal")).collect()
    )
    sums = {r["__pid"]: r["__ptotal"] for r in totals}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    spark = df.sparkSession
    off_df = local_df(
        spark,
        [(int(p), int(o)) for p, o in offsets.items()],
        "__pid int, __poff long",
    )
    out = local.join(F.broadcast(off_df), "__pid").withColumn(
        "offset", F.col("__poff") + F.col("__local_off")
    )
    return out.select(
        id_col,
        F.col("__tok").alias("n_tokens"),
        "offset",
        F.floor(F.col("offset") / max_tokens).cast("long").alias("first_chunk"),
        # last token of the doc (exclusive end - 1); empty docs still
        # occupy their separator, so clamp the span to >= first_chunk.
        F.greatest(
            F.floor((F.col("offset") + F.col("__cost") - 1) / max_tokens),
            F.floor(F.col("offset") / max_tokens),
        ).cast("long").alias("last_chunk"),
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    partitions: int | None = None,
    max_open: int = 4096,
    partitioner: str = "hash",
) -> DataFrame:
    """Greedy first-fit packing: whole documents into packs of at most
    ``max_tokens`` tokens; no document is split across packs.

    Output columns: ``id_col``, ``n_tokens``, ``pack_id`` (globally
    unique long), ``pack_pos`` (document's 0-based slot in its pack),
    ``oversize`` (true when the document alone exceeds the budget — it
    gets a singleton pack and the dataloader truncates).

    Scale shape: documents are hash-distributed, then each partition
    packs its own documents sequentially — best-fit-decreasing over a
    bisect-sorted open-bin list, so each placement is O(log open bins),
    and the open-bin list is capped at ``max_open`` (the tightest bins
    close first) so the adversarial case — every doc just over half the
    budget, where no bin ever fits another doc — stays linear instead
    of scanning an ever-growing bin list per doc. Pack ids are
    ``partition_id * 2^40 + local_index`` so ids never collide without
    any global coordination. Fill efficiency is within a percent of a
    global pack at realistic doc-length distributions, which is why
    published pipelines pack per-shard — PROVIDED each partition holds
    many docs per pack budget; for a small corpus pass ``partitions``
    explicitly (fewer, fuller partitions), while at scale the default
    parallelism is right because every partition holds millions of
    tokens.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if partitioner not in ("hash", "mod"):
        raise ValueError(f"partitioner must be 'hash' or 'mod', got {partitioner!r}")
    df, tok = _with_tokens(df, text_col, token_col)
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    sel = df.select(id_col, F.col(tok).cast("long").alias("n_tokens"))
    if partitioner == "mod":
        # Engine-independent shard assignment (id modulo) — pack ids
        # become replayable by any engine that can sort and count, which
        # is what lets the DuckDB oracle hash-check this operator. Needs
        # an integral id; the hash default spreads arbitrary id types.
        base = sel.withColumn(
            "__pid", F.pmod(F.col(id_col), F.lit(n_parts)).cast("int")
        ).repartition(n_parts, "__pid")
    else:
        base = sel.repartition(n_parts, id_col).withColumn(
            "__pid", F.spark_partition_id()
        )
    schema = f"`{id_col}` {dict(base.dtypes)[id_col]}, n_tokens long, pack_id long, pack_pos int, oversize boolean"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pid = int(pdf["__pid"].iloc[0])
        # Best-fit-decreasing; stable id tie-break keeps reruns identical.
        pdf = pdf.sort_values(["n_tokens", id_col], ascending=[False, True])
        open_caps: list[tuple[int, int]] = []  # sorted (capacity, bin idx)
        counts: dict[int, int] = {}
        next_bin = 0
        out_pack, out_pos, out_over = [], [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            if t > max_tokens:
                # oversize: singleton pack, never joins the open list
                out_pack.append(next_bin)
                out_pos.append(0)
                out_over.append(True)
                next_bin += 1
                continue
            # tightest bin that still fits (ties -> lowest bin idx)
            i = bisect.bisect_left(open_caps, (t, -1))
            if i < len(open_caps):
                cap, bidx = open_caps.pop(i)
                out_pos.append(counts[bidx])
                counts[bidx] += 1
                bisect.insort(open_caps, (cap - t, bidx))
            else:
                bidx = next_bin
                next_bin += 1
                counts[bidx] = 1
                out_pos.append(0)
                bisect.insort(open_caps, (max_tokens - t, bidx))
                if len(open_caps) > max_open:
                    open_caps.pop(0)  # close the tightest bin for good
            out_pack.append(bidx)
            out_over.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "n_tokens": pdf["n_tokens"].values,
                "pack_id": [(pid << 40) + p for p in out_pack],
                "pack_pos": out_pos,
                "oversize": out_over,
            }
        )

    return base.groupBy("__pid").applyInPandas(pack, schema)


def shuffle_rows(
    df: DataFrame, id_col: str = "doc_id", salt: str = "shuffle"
) -> DataFrame:
    """Deterministic global shuffle — the training-order randomization
    step before :func:`chunk_plan` / :func:`pack_documents` lay out
    sequences.

    Ordering by ``xxhash64(salt, id)`` is a full-rank pseudorandom
    permutation that is reproducible across runs, engines, and input
    partitionings (``rand(seed)`` is none of these — its stream is
    bound to the physical partition layout). A different ``salt`` gives
    an independent epoch order. Scale shape: one range exchange + local
    sort (the standard distributed sort); at 100 TB that is exactly the
    cost of any global reorder, and Spark's range partitioner keeps the
    output balanced regardless of id distribution. Ties are impossible
    short of a 64-bit hash collision between two ids; the id itself
    breaks even those deterministically.
    """
    h = F.xxhash64(F.lit(salt), F.col(id_col))
    return df.orderBy(h.asc(), F.col(id_col).asc())


SENTENCE_SPLIT = r"(?<=[.!?])\s+"


def chunk_sentences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 400,
) -> DataFrame:
    """Sentence-boundary-aware greedy chunking via a Python UDTF — the
    RAG/context-window splitter: sentences accumulate into a chunk until
    the next one would cross ``max_chars``; an oversized single sentence
    becomes its own (over-budget) chunk, never split mid-sentence.

    This is the repo's one deliberate Python UDTF (SURVEY §2.10): greedy
    per-row accumulation emitting a variable number of rows is the
    use-case the UDTF surface exists for — a native-expression fold
    (``aggregate`` over the sentence array) can compute the *boundaries*
    but not emit rows, and ``posexplode`` alone can't carry the
    accumulation state. The eval is Arrow-batched
    (``useArrow=True``), and everything around it (the lateral join,
    downstream filters) stays JVM-side; per-row work is O(len(text)).

    Returns (id, chunk_idx, n_sentences, chunk) — one row per chunk, in
    document order, deterministic.
    """
    import re

    from pyspark.sql.functions import lit, udtf

    split_pat = SENTENCE_SPLIT
    budget = int(max_chars)

    @udtf(returnType="chunk_idx int, n_sentences int, chunk string", useArrow=True)
    class _SentenceChunker:
        def eval(self, text: str):  # noqa: ANN001 — UDTF contract
            sents = [
                s for s in re.split(split_pat, text or "") if s.strip()
            ]
            buf: list[str] = []
            size = 0
            idx = 0
            for s in sents:
                add = len(s) if not buf else len(s) + 1
                if buf and size + add > budget:
                    yield idx, len(buf), " ".join(buf)
                    idx += 1
                    buf, size = [s], len(s)
                else:
                    buf.append(s)
                    size += add
            if buf:
                yield idx, len(buf), " ".join(buf)

    spark = docs.sparkSession
    name = f"__sentence_chunker_{budget}"
    spark.udtf.register(name, _SentenceChunker)
    docs.select(id_col, text_col).createOrReplaceTempView("__chunk_input")
    return spark.sql(
        f"SELECT {id_col}, c.chunk_idx, c.n_sentences, c.chunk "
        f"FROM __chunk_input, LATERAL {name}({text_col}) AS c"
    )
