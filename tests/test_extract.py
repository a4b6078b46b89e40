"""HTML -> text main-content extraction (llm/extract.py)."""

from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.extract import (
    escape_html_text,
    html_block_stats,
    html_to_text,
)


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_to_text(df, **kw).select("text").collect()[0]["text"]


ARTICLE = (
    "The distributed query engine compiles declarative plans into "
    "pipelined physical stages and executes them across the cluster."
)
PARA2 = (
    "Partial aggregation absorbs hot keys map-side before the exchange, "
    "which keeps the shuffle small even under heavy skew."
)


def test_extracts_article_drops_boilerplate(spark):
    html = (
        "<html><head><title>T</title>"
        "<script>var nav = '<p>fake para inside js string</p>';</script>"
        "<style>p{margin:0}</style></head><body>"
        '<nav><a href="/">Home</a> <a href="/a">News</a> '
        '<a href="/b">Sports</a></nav>'
        "<!-- comment with <p>tags</p> inside -->"
        f"<article><p>{ARTICLE}</p><p>{PARA2}</p></article>"
        '<div class="related"><a href="/1">One related story</a> '
        '<a href="/2">Another related story link</a></div>'
        '<footer><a href="/tos">Terms</a><a href="/p">Privacy</a></footer>'
        "</body></html>"
    )
    out = _extract(spark, html)
    assert out == f"{ARTICLE}\n{PARA2}"


def test_script_style_comment_contents_never_leak(spark):
    html = (
        "<body><script>document.write('" + "x" * 100 + "');</script>"
        "<STYLE>" + "y" * 100 + "</STYLE>"
        "<!-- " + "z" * 100 + " -->"
        f"<p>{ARTICLE}</p></body>"
    )
    out = _extract(spark, html)
    assert out == ARTICLE
    assert "x" * 10 not in out and "y" * 10 not in out and "z" * 10 not in out


def test_header_element_not_swallowed_by_head_strip(spark):
    """ADVICE r6: '<head...>' subtree-strip must not treat an opening
    '<header>' as '<head'; on a malformed page with a stray later
    '</head>' that dropped all article content between them."""
    html = (
        "<html><body><header>Site menu</header>"
        f"<p>{ARTICLE}</p>"
        "</head>"  # stray close tag, malformed page
        f"<p>{PARA2}</p></body></html>"
    )
    out = _extract(spark, html)
    assert ARTICLE in out and PARA2 in out


def test_uppercase_and_attribute_heavy_tags(spark):
    html = (
        f'<DIV CLASS="main" data-x="a>b"><P style="x">{ARTICLE}</P></DIV>'
    )
    # attribute value contains '>' — the tag regex closes early, leaving
    # 'b">' debris; the point is the article text itself must survive.
    out = _extract(spark, html)
    assert ARTICLE in out


def test_entities_round_trip(spark):
    raw = "Fact: 3 &lt; 5 &amp;&amp; 7 &gt; 2, said the &quot;engine&quot; &#39;loudly&#39; there."
    html = f"<p>{raw}</p>"
    out = _extract(spark, html)
    assert out == (
        "Fact: 3 < 5 && 7 > 2, said the \"engine\" 'loudly' there."
    )


def test_escape_then_extract_is_identity_on_tagged_text(spark):
    """Text whose CONTENT looks like HTML must survive escaping + the
    full extraction unchanged (the derived-corpus oracle contract)."""
    tricky = (
        "use <b>bold</b> & <a href=x>links</a> carefully &amp; write "
        "plainly so everyone can follow the argument without confusion"
    )
    df = spark.createDataFrame([(1, tricky)], "doc_id long, text string")
    page = df.select(
        "doc_id",
        F.concat(
            F.lit("<body><p>"), escape_html_text(F.col("text")), F.lit("</p></body>")
        ).alias("html"),
    )
    out = html_to_text(page).select("text").collect()[0]["text"]
    assert out == tricky


def test_link_density_kills_nav_keeps_linky_prose(spark):
    # 1 link worth ~20% of a long paragraph -> kept
    linky = (
        f'Read the analysis at <a href="/x">the benchmarks page</a> before '
        "drawing conclusions about shuffle performance at scale."
    )
    # pure link bar, long enough to pass the length gate -> dropped
    nav = (
        '<a href="/1">First navigation destination page</a> '
        '<a href="/2">Second navigation destination page</a> '
        '<a href="/3">Third navigation destination page</a>'
    )
    html = f"<body><div>{nav}</div><p>{linky}</p></body>"
    out = _extract(spark, html)
    assert "benchmarks page" in out
    assert "First navigation" not in out


def test_short_blocks_dropped_empty_doc_kept_as_row(spark):
    html = "<body><p>too short</p></body>"
    df = spark.createDataFrame(
        [(1, html), (2, None)], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r["text"] for r in html_to_text(df).collect()}
    assert rows == {1: "", 2: ""}


def test_block_stats_diagnostics(spark):
    html = f'<body><nav><a href="/">HomeHomeHome</a></nav><p>{ARTICLE}</p></body>'
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = html_block_stats(df).collect()
    by_text = {r["block_text"]: r for r in rows}
    assert ARTICLE in by_text
    assert by_text[ARTICLE]["link_chars"] == 0
    nav_row = by_text["HomeHomeHome"]
    assert nav_row["link_chars"] == nav_row["block_chars"] == 12


def test_plan_is_native(spark):
    df = spark.createDataFrame([(1, f"<p>{ARTICLE}</p>")], "doc_id long, html string")
    plan = (
        html_to_text(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_curate_corpus_pipeline_invariants(spark):
    """The end-to-end composition row: reasons partition the corpus,
    kept rows (and only kept rows) carry a split, and every 'duplicate'
    has a kept doc with identical extracted text and a smaller id."""
    from quantlab_data_pipeline_spark.queries_ext import curate_corpus_docs

    rows = curate_corpus_docs(spark, "/root/testdata/sf0.001").collect()
    assert rows
    kept = [r for r in rows if r["kept"]]
    assert kept, "pipeline dropped everything"
    for r in rows:
        if r["kept"]:
            assert r["reason"] is None and r["split"] in ("train", "val", "test")
        else:
            assert r["reason"] in ("too_short", "quality", "duplicate")
            assert r["split"] is None
    dup_ids = [r["doc_id"] for r in rows if r["reason"] == "duplicate"]
    if dup_ids:
        kept_ids = {r["doc_id"] for r in kept}
        assert all(any(k < d for k in kept_ids) for d in dup_ids)
