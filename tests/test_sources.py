"""Parser tests (SURVEY.md §2.1) on raw-payload fixtures shaped like
the live APIs/pages the reference scraped (FIXTURES.md §4) — hermetic,
no network."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.sources.parsers import (
    parse_aastocks,
    parse_eastmoney,
    parse_etnet,
    parse_newsfilter,
    parse_pushshift,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _raw(spark, name):
    with open(os.path.join(FIXTURES, name), encoding="utf-8") as f:
        return spark.createDataFrame([(f.read(),)], ["payload"])


NORMALIZED_COLS = {
    "unique_identifier",
    "source",
    "source_id",
    "source_link",
    "tickers",
    "title",
    "description",
    "text",
    "text_hash",
    "time",
}


def test_newsfilter_parser(spark):
    docs = parse_newsfilter(_raw(spark, "raw_newsfilter.json")).collect()
    # 3 articles, minus the '4 Form' filing (F5 exclusion).
    assert len(docs) == 2
    by_id = {d.source_id: d for d in docs}
    assert set(by_id) == {"nf-001", "nf-003"}
    a = by_id["nf-001"]
    assert a.tickers == ["AAPL", "MSFT"]
    assert a.time.isoformat().startswith("2024-01-15T13:45")
    assert a.source == "newsfilter"
    assert len(a.unique_identifier) == 64  # sha256 hex


def test_pushshift_parser_filter_chain(spark):
    universe = spark.createDataFrame(
        [("AAPL",), ("TSLA",), ("GME",), ("DD",), ("ARE",)], ["ticker_symbol"]
    )
    docs = parse_pushshift(_raw(spark, "raw_pushshift.json"), universe).collect()
    # 5 posts: [removed] dropped, removed_by_category dropped,
    # no-ticker dropped, DD/ARE-only dropped -> 1 survivor.
    assert len(docs) == 1
    d = docs[0]
    assert d.source_id == "abc123"
    assert sorted(d.tickers) == ["AAPL", "GME", "TSLA"]
    assert d.time.year == 2024


def test_eastmoney_jsonp_parser(spark):
    docs = parse_eastmoney(_raw(spark, "raw_eastmoney.jsonp")).collect()
    assert len(docs) == 2
    d = {r.source_id: r for r in docs}
    assert d["em-1"].tickers == ["000001"]
    assert d["em-1"].source_link == "https://example.com/em-1"  # unbase64
    assert d["em-1"].raw["stockName"] == "平安银行"
    assert d["em-2"].time.isoformat().startswith("2024-01-16T14:00")


def test_aastocks_html_parser(spark):
    docs = parse_aastocks(_raw(spark, "raw_aastocks.html")).collect()
    assert len(docs) == 2
    d = {r.source_id: r for r in docs}
    a = d["NOW.1296761"]
    assert a.title == "騰訊回購股份　涉資約10億元"
    assert a.tickers == ["00700"]
    # X5/X6: full-width '！' folded then runs collapsed.
    assert "！！！" not in a.text and "!!" not in a.text and "!" in a.text
    assert a.time.isoformat().startswith("2024-01-15T16:45")


def test_etnet_html_parser(spark):
    docs = parse_etnet(_raw(spark, "raw_etnet.html")).collect()
    assert len(docs) == 2
    d = {r.source_id: r for r in docs}
    e = d["ETN.2345678"]
    assert "科技股領漲" in e.title
    assert sorted(e.tickers) == ["00700", "09988"]
    assert e.time.isoformat().startswith("2024-01-15T12:30")
    assert "～～" not in e.text  # fullwidth folded + collapsed


@pytest.mark.parametrize(
    "parser_fixture",
    [
        ("raw_newsfilter.json", parse_newsfilter),
        ("raw_eastmoney.jsonp", parse_eastmoney),
        ("raw_aastocks.html", parse_aastocks),
        ("raw_etnet.html", parse_etnet),
    ],
)
def test_parsers_share_normalized_schema(spark, parser_fixture):
    name, parser = parser_fixture
    cols = set(parser(_raw(spark, name)).columns)
    assert NORMALIZED_COLS.issubset(cols)


def test_google_serp_parser(spark):
    html = (
        '<a href="https://www.google.com/search?q=x">more</a>'
        '<a href="https://news.site.com/article1">A</a>'
        '<a href="https://support.google.com/help">?</a>'
        '<a href="https://news.site.com/article1">A-dup</a>'
        '<a href="https://blog.example.com/post">B</a>'
    )
    from dss_nlp_ingestion_spark.sources.parsers import parse_google_serp

    raw = spark.createDataFrame([(html,)], ["payload"])
    links = sorted(r.link for r in parse_google_serp(raw).collect())
    # Blacklisted Google properties dropped, duplicates collapsed.
    assert links == [
        "https://blog.example.com/post",
        "https://news.site.com/article1",
    ]


def test_wikipedia_parser(spark):
    html = (
        '<a href="https://en.wikipedia.org/wiki/Apple_Inc.">wiki</a>'
        "<p>Apple Inc. is an American <b>multinational</b> company.</p>"
        "<p>Second paragraph.</p>"
    )
    from dss_nlp_ingestion_spark.sources.parsers import parse_wikipedia

    raw = spark.createDataFrame([(html,)], ["payload"])
    row = parse_wikipedia(raw).collect()[0]
    assert row.wiki_link == "https://en.wikipedia.org/wiki/Apple_Inc."
    assert row.summary == "Apple Inc. is an American multinational company."


def test_word_similarity_function(spark):
    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.functions.nlp import word_similarity

    df = spark.createDataFrame([("spark", "spark", "table")], ["a", "b", "c"])
    row = df.select(
        word_similarity(F.col("a"), F.col("b")).alias("same"),
        word_similarity(F.col("a"), F.col("c")).alias("diff"),
    ).collect()[0]
    assert abs(row.same - 1.0) < 1e-9  # identical words -> cosine 1
    assert row.diff < 1.0


# --- S12: Baidu Baike two-step lookup -------------------------------------

_BAIKE_PAGE = (
    '<html><div class="lemma"><div class="para">小米集团是一家</div>'
    '<div class="para">成立于2010年。\n更多<b>内容</b></div>'
    '<div class="para">总部位于北京。</div></div></html>'
)
_BAIKE_EMPTY = "<html><body>nothing here</body></html>"
_BAIDU_SERP = (
    "<html><span class=\"c-tools new-pmd\" data-tools='{"
    "title:'小米集团_百度百科',url:'http://x'}'></span></html>"
)


def test_baidu_baike_direct_parser(spark):
    from dss_nlp_ingestion_spark.sources.parsers import parse_baidu_baike

    raw = spark.createDataFrame(
        [("https://baike.baidu.com/item/小米集团", _BAIKE_PAGE)],
        ["url", "payload"],
    )
    row = parse_baidu_baike(raw).collect()[0]
    # summary = first para; content = joined rest, tags/newlines/NBSP
    # stripped (baidu_api.py:44-51).
    assert row.summary == "小米集团是一家"
    assert row.content == "成立于2010年。更多内容总部位于北京。"


def test_baidu_baike_miss_is_empty(spark):
    from dss_nlp_ingestion_spark.sources.parsers import parse_baidu_baike

    raw = spark.createDataFrame([("u", _BAIKE_EMPTY)], ["url", "payload"])
    row = parse_baidu_baike(raw).collect()[0]
    assert row.summary == "" and row.content == ""


def test_baidu_serp_name_extract(spark):
    from dss_nlp_ingestion_spark.sources.parsers import parse_baidu_serp_name

    raw = spark.createDataFrame([("u", _BAIDU_SERP)], ["url", "payload"])
    row = parse_baidu_serp_name(raw).collect()[0]
    assert row.baike_name == "小米集团"

    none = spark.createDataFrame([("u", _BAIKE_EMPTY)], ["url", "payload"])
    assert parse_baidu_serp_name(none).collect()[0].baike_name is None


def test_baidu_two_step_lookup_both_paths(spark):
    from dss_nlp_ingestion_spark.sources.parsers import (
        BAIDU_ITEM_URL_PREFIX,
        baidu_two_step_lookup,
    )

    # 'xiaomi' resolves directly; 'mi corp' misses the direct item page
    # and resolves through the SERP fallback (baidu_api.py:59-81).
    def fetcher(url):
        if url == BAIDU_ITEM_URL_PREFIX + "xiaomi":
            return 200, _BAIKE_PAGE
        if url == BAIDU_ITEM_URL_PREFIX + "mi corp":
            return 200, _BAIKE_EMPTY
        if "www.baidu.com" in url and "mi%20corp" in url or "mi corp" in url:
            return 200, _BAIDU_SERP
        if url == BAIDU_ITEM_URL_PREFIX + "小米集团":
            return 200, _BAIKE_PAGE
        return 404, ""

    queries = spark.createDataFrame([("xiaomi",), ("mi corp",)], ["query"])
    rows = {r.query: r for r in baidu_two_step_lookup(queries, fetcher).collect()}
    assert rows["xiaomi"].via == "direct"
    assert rows["xiaomi"].summary == "小米集团是一家"
    assert rows["mi corp"].via == "two_step"
    assert rows["mi corp"].url.endswith("小米集团")
    assert rows["mi corp"].content.startswith("成立于2010年。")


def test_extract_article_text_density(spark):
    """S13 article extraction (google_utils.py:76-93's newspaper3k
    slot, re-expressed as JVM text-density scoring): the article
    paragraphs survive, every nav/related/newsletter/footer block is
    dropped (short or link-dominated)."""
    from dss_nlp_ingestion_spark.sources.extract import extract_article

    raw = _raw(spark, "raw_article.html")
    body = raw.select(
        extract_article(F.col("payload")).alias("article")
    ).first()["article"]

    for frag in (
        "extend its trading session by ninety minutes",
        "closing auction will shift to late afternoon",
        "raising costs for market makers",
    ):
        assert frag in body
    for boiler in (
        "Subscribe today",
        "Related:",
        "daily briefing",
        "Example News Network",
        "Markets desk",
    ):
        assert boiler not in body


def test_extract_article_block_scoring(spark):
    """Both filter dimensions individually: a long pure-link block is
    dropped by link density, a short prose block by min length, a
    long prose block with a minor inline link survives (link chars
    below the density cut)."""
    from dss_nlp_ingestion_spark.sources.extract import extract_article

    prose = (
        "The committee weighed the proposal for several weeks before "
        "publishing a detailed assessment of its costs and benefits, "
        "which ran to more than forty pages."
    )
    linky = " ".join(
        f'<a href="/l{i}">A fairly descriptive navigation label {i}</a>'
        for i in range(12)
    )
    page = (
        f'<div class="menu">{linky}</div>'
        f"<p>Short teaser line.</p>"
        f'<p>{prose} See the <a href="/report">full report</a> for details.</p>'
    )
    df = spark.createDataFrame([(page,)], ["payload"])
    body = df.select(extract_article(F.col("payload")).alias("a")).first()["a"]
    assert prose in body
    assert "full report" in body  # inline link text is kept, not cut
    assert "navigation label" not in body
    assert "Short teaser" not in body


def test_extract_article_empty_miss(spark):
    from dss_nlp_ingestion_spark.sources.extract import extract_article

    df = spark.createDataFrame(
        [('<div class="nav"><a href="/">Home</a></div>',), ("no markup at all",)],
        ["payload"],
    )
    rows = df.select(extract_article(F.col("payload")).alias("a")).collect()
    assert [r["a"] for r in rows] == ["", ""]
