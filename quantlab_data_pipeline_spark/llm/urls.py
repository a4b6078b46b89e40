"""URL normalization, domain extraction, and URL-keyed dedup.

The cheapest dedup signal a crawl pipeline has: CCNet / RefinedWeb /
FineWeb all dedup BY NORMALIZED URL before any content hashing — the
same page is recrawled under trivially-different URLs (scheme case,
default ports, fragments, tracking parameters), and dropping those
copies costs one string pass + one hash groupBy instead of shingling.

Everything here is native expressions (regexp_replace chains + split),
engine-portable (RE2-safe patterns, no lookbehind/backreferences), so
the whole normalization replays in DuckDB for the oracle and runs
inside the scan's codegen stage at crawl scale — zero shuffle until
the final keyed dedup, which groups on the (short) normalized URL.

Normalization steps (each deliberately conservative — reversible-risk
rewrites like path case-folding are NOT done; URL paths are
case-sensitive, hosts are not):

1. lowercase the scheme and host (authority), leave path/query alone
2. strip the fragment (``#...`` — never sent to the server)
3. drop default ports (``:80`` for http, ``:443`` for https)
4. remove tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``) and re-join the survivors in original order — bare
   ``ref`` is content-bearing too often (branch selectors, pagination)
   and is only stripped in the opt-in aggressive mode
5. drop a now-empty query (trailing ``?``) and a bare trailing slash
   on an empty path (``http://x/`` == ``http://x``)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..localframe import local_df

#: query parameters that never change page content. Matched
#: case-sensitively (the trackers emit lowercase; query keys are
#: case-sensitive per RFC 3986, so "UTM_SOURCE" is conservatively kept).
#: Bare "ref" is NOT here (ADVICE r6): it is frequently content-bearing
#: (?ref=<branch> on code hosts, ?ref=<page> pagination), so stripping
#: it would merge genuinely different pages — pass
#: ``AGGRESSIVE_TRACKING_PARAMS`` explicitly to opt in.
TRACKING_PARAMS = ("utm_[a-z]+", "gclid", "fbclid", "msclkid")

#: opt-in aggressive list: adds referrer-style keys that are usually —
#: but not always — trackers. Only for corpora where the dedup recall
#: win outweighs occasional false merges.
AGGRESSIVE_TRACKING_PARAMS = TRACKING_PARAMS + ("ref", "source")

#: common two-level public suffixes for the registered-domain heuristic
#: (a full Public Suffix List is a data file; these cover the frequent
#: country-code second-level registrations)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tr", "com.ar", "com.sg",
)


def _scheme_host_lower(url: Column) -> Column:
    """Lowercase only the scheme://host[:port] prefix."""
    prefix = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(url, F.length(prefix) + 1, F.lit(1 << 30))
    return F.when(prefix == "", url).otherwise(
        F.concat(F.lower(prefix), rest)
    )


def normalize_url(
    url: str | Column,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of a URL column (see module docstring for the
    exact steps). Null-safe: null stays null. Pass
    ``AGGRESSIVE_TRACKING_PARAMS`` to also strip referrer-style keys
    (``ref``, ``source``) that are usually — not always — trackers."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.trim(u)
    u = _scheme_host_lower(u)
    # strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # default ports (captured-tail form, no lookahead — RE2-safe)
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", r"$1$2")
    # tracking params: kill "key=value" whether first (after ?) or
    # later (after &), then normalize separator debris
    for p in tracking_params:
        u = F.regexp_replace(u, rf"([?&]){p}=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")   # "?&x" -> "?x"
    u = F.regexp_replace(u, r"&&+", "&")    # "a&&b" -> "a&b"
    u = F.regexp_replace(u, r"[?&]+$", "")  # trailing "?" / "&"
    # bare trailing slash on an empty path
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def url_host(url: str | Column) -> Column:
    """Lowercased host (no port, no credentials) or null."""
    u = F.col(url) if isinstance(url, str) else url
    h = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    )
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def registered_domain(url: str | Column) -> Column:
    """eTLD+1 heuristic: last two host labels, or last THREE when the
    last two form a known two-level public suffix (co.uk and friends).
    A real pipeline ships the full Public Suffix List as a broadcast
    lookup; the heuristic keeps this dependency-free and is exact on
    the suffixes listed."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.when(
        n >= 3,
        F.concat_ws(
            ".",
            F.element_at(parts, -3),
            F.element_at(parts, -2),
            F.element_at(parts, -1),
        ),
    )
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n <= 2, host).otherwise(
            F.when(is_two_level, last3).otherwise(last2)
        )
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per normalized URL: the smallest ``id_col`` wins
    (deterministic, engine-independent). Adds ``norm_url`` and
    ``is_keeper``; rows with a null URL are all keepers (no URL — no
    URL-dedup evidence). One hash groupBy on the normalized URL; the
    short URL strings shuffle, never the documents."""
    norm = df.withColumn("norm_url", normalize_url(url_col))
    winners = (
        norm.filter(F.col("norm_url").isNotNull())
        .groupBy("norm_url")
        .agg(F.min(id_col).alias("__keep"))
    )
    return (
        norm.join(winners, "norm_url", "left")
        .withColumn(
            "is_keeper",
            F.col("norm_url").isNull() | (F.col(id_col) == F.col("__keep")),
        )
        .drop("__keep")
    )


def host_suffix_chain(url: str | Column) -> Column:
    """Every label-aligned dot-suffix of the URL's host, longest first:
    ``a.b.example.com`` -> [a.b.example.com, b.example.com, example.com,
    com]. Null host -> null. The equi-join key set for blocklist
    matching: "blocked domain d blocks d and every subdomain of d"
    becomes "some suffix of the host equals d" — an exact array
    membership, never a LIKE/endswith scan."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        host.isNotNull(),
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
        ),
    )


def blocklist_filter(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate each doc against a domain blocklist (the UT1 /
    adult-and-malware-list pass every crawl pipeline runs before any
    content work): ``blocked`` true iff SOME label-aligned suffix of
    the doc's host is a listed domain, plus ``matched_domain`` (the
    lexicographically smallest match — deterministic when both a host
    and its parent are listed).

    ``blocked`` is a one-column DataFrame of domains or an iterable of
    strings (lowercased on entry). Scale shape: production blocklists
    run to millions of domains — far past broadcast — so the match is
    an EQUI-JOIN: each doc explodes into its ~5-label suffix chain and
    joins the blocklist on the suffix (one shuffle of (id, suffix)
    pairs + the list; AQE broadcasts instead when the list is actually
    small). Path-pattern rules (a few percent of UT1) are out of
    scope here — domains-only, stated plainly."""
    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        bl = blocked.select(
            F.lower(F.col(blocked.columns[0])).alias("__bdom")
        ).distinct()
    else:
        bl = local_df(
            spark, [(str(d).lower(),) for d in blocked], "__bdom string"
        ).distinct()
    chain = df.select(
        F.col(id_col),
        F.explode(host_suffix_chain(url_col)).alias("__suffix"),
    )
    hits = (
        chain.join(bl, chain["__suffix"] == bl["__bdom"])
        .groupBy(id_col)
        .agg(F.min("__bdom").alias("matched_domain"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn("blocked", F.col("matched_domain").isNotNull())
    )


def frontier_schedule(
    df: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    id_col: str = "url_id",
    round_col: str = "fetch_round",
    slot_col: str = "slot_in_round",
) -> DataFrame:
    """Politeness-scheduled crawl frontier: assign every candidate URL a
    ``fetch_round`` such that no host appears twice in a round (the
    Heritrix/Nutch per-host queue discipline — one in-flight request
    per host per cycle), higher-priority URLs claiming earlier rounds,
    plus a deterministic ``slot_in_round`` ordering within each round
    (priority first, then id — the dispatch order a fetcher drains).

    Scale shape: the per-host ordering is the textbook skew trap — a
    frontier is dominated by a handful of giant hosts, and a
    ``row_number() OVER (PARTITION BY host)`` funnels each host's
    entire queue through one task. Both phases therefore use
    :func:`~..operators.skew.grouped_global_rank` (range partition +
    local rank + broadcast offsets, provably equal to the naive
    window): host-sized AND round-sized groups never serialize.
    ``fetch_round`` is dense per host by construction (rank 1..n), so
    round k of the output is exactly the k-th politeness cycle.

    Null hosts are one queue (a fetcher can't parallelize unknowns);
    null priorities sort last within their host (``desc_nulls_last``).
    """
    from ..operators.skew import grouped_global_rank

    ranked = grouped_global_rank(
        df,
        [host_col],
        [F.col(priority_col).desc_nulls_last(), F.col(id_col).asc()],
        rank_col="__host_seq",
        n_col="__host_queue_len",
    )
    rounds = ranked.withColumn(
        round_col, (F.col("__host_seq") - 1).cast("long")
    ).drop("__host_seq", "__host_queue_len")
    slotted = grouped_global_rank(
        rounds,
        [round_col],
        [F.col(priority_col).desc_nulls_last(), F.col(id_col).asc()],
        rank_col=slot_col,
        n_col="__round_size",
    )
    return slotted.withColumn(
        slot_col, F.col(slot_col).cast("long")
    ).drop("__round_size")
