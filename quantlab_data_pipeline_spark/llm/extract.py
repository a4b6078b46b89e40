"""HTML -> text main-content extraction (boilerplate removal).

The intake step in front of every LLM curation op: real-world corpora
arrive as raw HTML (Common Crawl WARC), not the pre-extracted text the
WET codec reads. This implements the standard two-stage heuristic
(jusText / boilerpipe family, Kohlschütter et al. 2010 "Boilerplate
Detection using Shallow Text Features"):

1. **Structural strip** — comments, ``<script>``/``<style>``/
   ``<noscript>``/``<svg>``/``<head>`` subtrees removed outright (their
   contents are never prose).
2. **Block classification by link density** — the document splits into
   text blocks at block-level tag boundaries; a block survives iff its
   visible text is long enough (``min_block_chars``) AND the fraction
   of that text living inside ``<a>`` anchors is small
   (``max_link_density``). Navigation bars, footers, related-links
   rails and tag clouds are short and/or link-dense — exactly what the
   two thresholds kill; article paragraphs are long and link-sparse.

Scale shape: the whole pipeline is per-row native expressions
(``regexp_replace`` chains + ``split`` + higher-order ``transform``/
``filter``/``aggregate``) — zero shuffle, zero Python in the plan, so
it runs inside the scan's codegen stage at any corpus size. No
backreference regexes are used (portable to RE2-based engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level HTML elements: a tag boundary of any of these starts a new
# text block (both open and close tags split; the tag itself is consumed
# by the split, so no second tag-stripping pass can resurrect it).
BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td"
    r"|th|blockquote|section|article|header|footer|nav|aside|form|pre|hr"
    r"|main|figure|figcaption)\b[^>]*>"
)

# Subtrees whose contents are never prose. Expanded per tag instead of a
# backreferenced <(script|style)>.*?</\1> so every pattern stays RE2-safe.
_DROP_SUBTREES = ("script", "style", "noscript", "svg", "head", "template")

_LINK_CONTENT = r"(?is)<a[^>]*>(.*?)</a>"

# Minimal entity set (the ones HTML-escaping of text content produces,
# plus the two ubiquitous typographic ones). &amp; decodes LAST so
# escaped entities round-trip instead of double-decoding.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def strip_tags(col: Column) -> Column:
    """Replace every remaining ``<...>`` tag with a space (a space, not
    '', so ``a<b>b`` reads "a b" instead of gluing into "ab")."""
    return F.regexp_replace(col, r"<[^>]*>", " ")


def decode_entities(col: Column) -> Column:
    """Decode the common HTML entities; ``&amp;`` last (round-trip
    safety for escaped entities like ``&amp;quot;``)."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def squash_ws(col: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _visible(col: Column) -> Column:
    """Tag-stripped, entity-decoded, whitespace-squashed text."""
    return squash_ws(decode_entities(strip_tags(col)))


def _drop_non_content(col: Column) -> Column:
    """Stage 1: comments and never-prose subtrees replaced by a space."""
    col = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    for tag in _DROP_SUBTREES:
        # (\s[^>]*)? — exact-tag match only: bare '<head>' must not
        # also swallow '<header ...>' (ADVICE r6: a malformed page with
        # a <header> element and a stray later </head> silently dropped
        # all article content between them).
        col = F.regexp_replace(col, rf"(?is)<{tag}(\s[^>]*)?>.*?</{tag}\s*>", " ")
    return col


def html_block_stats(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Exploded per-block view (diagnostics / threshold tuning): one row
    per text block with its visible text, length, and link length.
    ``block_idx`` preserves document order."""
    blocks = F.split(_drop_non_content(F.coalesce(F.col(html_col), F.lit(""))), BLOCK_SPLIT)
    stats = F.transform(
        blocks,
        lambda b, i: F.struct(
            i.alias("block_idx"),
            _visible(b).alias("block_text"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_LINK_CONTENT), F.lit(1)),
                F.lit(0),
                lambda acc, l: acc + F.length(_visible(l)),
            ).alias("link_chars"),
        ),
    )
    return (
        df.select(*df.columns, F.explode(stats).alias("__b"))
        .select(
            *df.columns,
            F.col("__b.block_idx").alias("block_idx"),
            F.col("__b.block_text").alias("block_text"),
            F.length("__b.block_text").alias("block_chars"),
            F.col("__b.link_chars").alias("link_chars"),
        )
        .filter(F.col("block_chars") > 0)
    )


def html_to_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    min_block_chars: int = 30,
    max_link_density: float = 0.35,
) -> DataFrame:
    """Extract main content from an HTML column into ``out_col``.

    Kept blocks (visible length >= ``min_block_chars`` and link-text
    fraction <= ``max_link_density``) join with a newline, in document
    order. A document with no surviving block yields '' (kept as a row
    — dropping is the caller's policy decision, usually a length filter
    one step later). Pure native expressions; see module docstring for
    the heuristic's provenance.
    """
    blocks = F.split(_drop_non_content(F.coalesce(F.col(html_col), F.lit(""))), BLOCK_SPLIT)
    stats = F.transform(
        blocks,
        lambda b: F.struct(
            _visible(b).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_LINK_CONTENT), F.lit(1)),
                F.lit(0),
                lambda acc, l: acc + F.length(_visible(l)),
            ).alias("link_chars"),
        ),
    )
    kept = F.filter(
        stats,
        lambda s: (F.length(s["txt"]) >= min_block_chars)
        & (
            s["link_chars"].cast("double")
            <= F.length(s["txt"]) * F.lit(float(max_link_density))
        ),
    )
    return df.withColumn(
        out_col, F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")
    )


def escape_html_text(col: Column) -> Column:
    """Escape raw text for embedding as HTML content (& first, then
    angle brackets) — the inverse of :func:`decode_entities` on the
    subset it produces; used by tests and the registry's derived-HTML
    round-trip query."""
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    return col


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    href_col: str = "href",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Explode every ``<a href="...">anchor</a>`` element into one
    (id, href, anchor) row — the edge list of the web graph, which is
    what a crawl pipeline's URL-frontier discovery, anchor-text
    retrieval signal, and PageRank-style host scoring all consume.

    Matching is a two-stage native-expression parse (same family as
    the extraction pipeline above, RE2-safe, zero Python): match whole
    anchor elements with text content, then pull the double-quoted
    href and the text out of each element. Elements with an empty or
    missing double-quoted href are dropped; anchor text is
    whitespace-squashed and entity-decoded like the extraction path's
    visible text. Per-row expressions only — the explode multiplies
    rows but nothing shuffles until the caller aggregates.
    """
    elems = F.regexp_extract_all(
        F.col(html_col),
        F.lit("(?i)<a\\s[^>]*>[^<]*</a>"),
        0,
    )
    out = df.select(
        F.col(id_col), F.explode(elems).alias("__elem")
    ).select(
        id_col,
        F.regexp_extract(
            F.col("__elem"), '(?i)href\\s*=\\s*"([^"]*)"', 1
        ).alias(href_col),
        squash_ws(
            decode_entities(
                F.regexp_extract(F.col("__elem"), ">([^<]*)<", 1)
            )
        ).alias(anchor_col),
    )
    return out.filter(F.col(href_col) != "")
