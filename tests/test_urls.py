"""URL normalization / domain extraction / URL dedup (llm/urls.py)."""

from pyspark.sql import functions as F

from quantlab_data_pipeline_spark.llm.urls import (
    AGGRESSIVE_TRACKING_PARAMS,
    normalize_url,
    registered_domain,
    url_dedup,
    url_host,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["n"] for r in df.select(normalize_url("url").alias("n")).collect()]


def test_normalize_url_steps(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTP://WWW.Example.COM/Articles/One": "http://www.example.com/Articles/One",
        # fragment stripped
        "https://a.com/x#section-2": "https://a.com/x",
        # default ports dropped (scheme-matched only)
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",  # 80 is NOT https default
        # tracking params removed, survivors keep order
        "https://a.com/x?utm_source=f&q=1&utm_medium=m&id=2": "https://a.com/x?q=1&id=2",
        "https://a.com/x?gclid=abc": "https://a.com/x",
        # bare ref is content-bearing (branch/pagination) — kept by
        # default (ADVICE r6); only fbclid goes
        "https://a.com/x?fbclid=1&ref=tw": "https://a.com/x?ref=tw",
        # empty-query and bare-slash cleanup
        "https://a.com/?": "https://a.com",
        "https://a.com/": "https://a.com",
        "https://a.com/path/": "https://a.com/path/",  # non-empty path kept
        # whitespace trim
        "  https://a.com/x  ": "https://a.com/x",
        # schemeless strings pass through (lowercasing skipped)
        "Not A Url": "Not A Url",
    }
    got = _norm(spark, list(cases))
    for (src, expect), g in zip(cases.items(), got):
        assert g == expect, (src, g, expect)


def test_normalize_null_safe(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(normalize_url("url").alias("n")).collect()[0]["n"] is None


def test_host_and_registered_domain(spark):
    cases = [
        ("https://News.Example.CO.UK/s/1", "news.example.co.uk", "example.co.uk"),
        ("http://user:pw@Sub.Deep.Example.COM:8080/p", "sub.deep.example.com", "example.com"),
        ("https://example.com/", "example.com", "example.com"),
        ("https://localhost/x", "localhost", "localhost"),
        ("not a url", None, None),
        (None, None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = df.select(
        url_host("url").alias("h"), registered_domain("url").alias("d")
    ).collect()
    for (u, eh, ed), r in zip(cases, got):
        assert r["h"] == eh, (u, r["h"])
        assert r["d"] == ed, (u, r["d"])


def test_url_dedup_min_id_wins_nulls_kept(spark):
    rows = [
        (1, "HTTP://A.com:80/x?utm_source=f"),  # same normalized as 2
        (2, "http://a.com/x"),
        (3, "http://a.com/y"),
        (4, None),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert got[1]["is_keeper"] is True     # min id of the pair
    assert got[2]["is_keeper"] is False
    assert got[1]["norm_url"] == got[2]["norm_url"] == "http://a.com/x"
    assert got[3]["is_keeper"] is True
    assert got[4]["is_keeper"] is True and got[5]["is_keeper"] is True


def test_plan_is_native(spark):
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_aggressive_mode_strips_ref(spark):
    """Opt-in aggressive list also strips ref/source; the default
    must not (content-bearing on code hosts / pagination)."""
    df = spark.createDataFrame(
        [("https://a.com/x?ref=main&q=1&source=rss",)], "url string"
    )
    got = df.select(
        normalize_url("url").alias("default"),
        normalize_url("url", AGGRESSIVE_TRACKING_PARAMS).alias("aggr"),
    ).collect()[0]
    assert got["default"] == "https://a.com/x?ref=main&q=1&source=rss"
    assert got["aggr"] == "https://a.com/x?q=1"


def test_normalize_is_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) — an index of stored
    normalized URLs must survive re-normalization unchanged."""
    urls = [
        "HTTP://WWW.Example.COM:80/A/B?utm_source=x&q=1#f",
        "https://a.com:443/x?gclid=1&id=2&fbclid=3",
        "https://a.com/?utm_a=1&utm_b=2",
        "https://a.com/",
        "http://a.com:8080/p?x=1&ref=t",
        "ftp://Files.Example.com/pub/",
        "no scheme here",
        "",
        "https://u:p@Host.Com:443/q?msclkid=9#z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = df.select(
        normalize_url("url").alias("once"),
        normalize_url(normalize_url("url")).alias("twice"),
    ).collect()
    for r in got:
        assert r["once"] == r["twice"], r


# ---------------------------------------------------------- blocklist


def test_host_suffix_chain_label_aligned(spark):
    from quantlab_data_pipeline_spark.llm.urls import host_suffix_chain

    df = spark.createDataFrame(
        [(1, "https://a.b.example.com/x"), (2, "not a url"), (3, None)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["chain"]
        for r in df.select(
            "doc_id", host_suffix_chain("url").alias("chain")
        ).collect()
    }
    assert got[1] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert got[2] is None and got[3] is None


def test_blocklist_filter_semantics(spark):
    """Listed domain blocks itself and subdomains; label alignment
    means xbad.co.uk does NOT match bad.co.uk; min match wins when
    both a host and its parent are listed; null/invalid URLs pass."""
    from quantlab_data_pipeline_spark.llm.urls import blocklist_filter

    df = spark.createDataFrame(
        [
            (1, "https://ads.example.com/a"),       # exact
            (2, "https://deep.ads.example.com/b"),  # subdomain
            (3, "https://example.com/c"),           # parent of listed: clean
            (4, "https://xbad.co.uk/d"),            # NOT label-aligned
            (5, "https://shop.bad.co.uk/e"),        # deep multi-label
            (6, None),
            (7, "https://a.ads.example.com/f"),     # two listed ancestors
        ],
        "doc_id long, url string",
    )
    bl = ["ads.example.com", "bad.co.uk", "a.ads.example.com"]
    got = {r["doc_id"]: r for r in blocklist_filter(df, bl).collect()}
    assert got[1]["blocked"] and got[1]["matched_domain"] == "ads.example.com"
    assert got[2]["blocked"] and got[2]["matched_domain"] == "ads.example.com"
    assert not got[3]["blocked"] and got[3]["matched_domain"] is None
    assert not got[4]["blocked"]
    assert got[5]["blocked"] and got[5]["matched_domain"] == "bad.co.uk"
    assert not got[6]["blocked"]
    # min of the two matches (a.ads.example.com < ads.example.com)
    assert got[7]["matched_domain"] == "a.ads.example.com"


def test_blocklist_filter_dataframe_input_and_case(spark):
    from quantlab_data_pipeline_spark.llm.urls import blocklist_filter

    df = spark.createDataFrame(
        [(1, "https://ADS.Example.COM/x"), (2, "https://ok.org/y")],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("Ads.Example.Com",)], "domain string")
    got = {r["doc_id"]: r["blocked"] for r in blocklist_filter(df, bl).collect()}
    assert got == {1: True, 2: False}
