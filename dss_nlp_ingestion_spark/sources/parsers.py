"""Per-source payload parsers (SURVEY.md §2.1 S1–S5, §3.2 step 4).

Each parser maps a DataFrame of raw payload strings (one row per HTTP
response body or page) to normalized document rows — the Spark
re-expression of the reference lurkers' ``get_document`` parsing:

- S1 newsfilter — src/lurkers/newsfilter.py:111-191 (API JSON:
  ``{total:{value}, articles:[...]}``; ISO date prefix T1; the
  '4 Form' exclusion F5).
- S2 reddit/pushshift — src/lurkers/reddit.py:137-199 (API JSON
  ``{data:[...]}``; F4 filter chain: removed_by_category absent,
  selftext none of {'', 'unknown', '[removed]'}, tickers nonempty;
  X1 cashtag NER; J2 universe intersection minus {'DD','ARE'};
  T4 epoch parse).
- S5 eastmoney — src/lurkers/eastmoney.py:63-96 (JSONP wrapper strip
  X15 + report list explode).
- S3 aastocks / S4 etnet — src/lurkers/aastocks.py:109-220,
  src/lurkers/etnet.py:183-289 (HTML: title/tickers/content/time via
  the pages' CSS hooks, X2 parenthesized ticker extract, X5/X6 CJK
  normalization, T2/T3 timestamp formats, X3 article ids).

All parsing is JVM-side (``from_json`` / ``regexp_extract_all``) —
no BeautifulSoup-style row-at-a-time Python; an HTML page is just a
string a regex scans. Each parser ends with the same normalized
columns so outputs union into the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dss_nlp_ingestion_spark.functions.text import (
    bare_upper_tickers,
    cashtags,
    collapse_punct_runs,
    content_hash,
    fold_fullwidth,
    jsonp_payload,
    numeric_codes_only,
    paren_codes,
    stable_id_hash,
    zero_pad,
)

NEWSFILTER_SCHEMA = StructType(
    [
        StructField("total", StructType([StructField("value", LongType())])),
        StructField(
            "articles",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("source", StructType([StructField("name", StringType())])),
                        StructField("symbols", ArrayType(StringType())),
                        StructField("title", StringType()),
                        StructField("description", StringType()),
                        StructField("publishedAt", StringType()),
                        StructField("url", StringType()),
                    ]
                )
            ),
        ),
    ]
)

PUSHSHIFT_SCHEMA = StructType(
    [
        StructField(
            "data",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("subreddit", StringType()),
                        StructField("title", StringType()),
                        StructField("selftext", StringType()),
                        StructField("created_utc", LongType()),
                        StructField("full_link", StringType()),
                        StructField("removed_by_category", StringType()),
                    ]
                )
            ),
        )
    ]
)

EASTMONEY_SCHEMA = StructType(
    [
        StructField(
            "data",
            ArrayType(
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("encodeUrl", StringType()),
                        StructField("title", StringType()),
                        StructField("stockName", StringType()),
                        StructField("stockCode", StringType()),
                        StructField("publishDate", StringType()),
                    ]
                )
            ),
        )
    ]
)


def _normalized(
    source: str,
    source_id: Column,
    source_link: Column,
    tickers: Column,
    title: Column,
    description: Column,
    text: Column,
    time: Column,
) -> list[Column]:
    """The unified projection every parser ends with (§1.3 schema)."""
    return [
        stable_id_hash(source_id).alias("unique_identifier"),
        F.lit(source).alias("source"),
        source_id.alias("source_id"),
        source_link.alias("source_link"),
        tickers.alias("tickers"),
        title.alias("title"),
        description.alias("description"),
        text.alias("text"),
        content_hash(title, description, text).alias("text_hash"),
        time.alias("time"),
    ]


def parse_newsfilter(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S1: JSON body -> one row per article; drops '4 Form' insider
    filings (the reference excludes them in the query DSL,
    newsfilter.py:74 — applied here post-parse)."""
    parsed = raw.select(
        F.from_json(F.col(payload_col), NEWSFILTER_SCHEMA).alias("p")
    ).select(F.explode(F.col("p.articles")).alias("a"))
    return parsed.filter(~F.col("a.title").contains("4 Form")).select(
        *_normalized(
            "newsfilter",
            F.col("a.id"),
            F.col("a.url"),
            F.col("a.symbols"),
            F.col("a.title"),
            F.col("a.description"),
            F.concat_ws(" ", F.col("a.title"), F.col("a.description")),
            F.to_timestamp(F.substring(F.col("a.publishedAt"), 1, 19).cast("string")),
        )
    )


def parse_pushshift(
    raw: DataFrame, universe_symbols: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """S2: pushshift JSON -> posts surviving the F4 filter chain, with
    X1 cashtag NER intersected against the broadcast universe minus
    the {'DD','ARE'} false-positive set (reddit.py:89)."""
    posts = raw.select(
        F.from_json(F.col(payload_col), PUSHSHIFT_SCHEMA).alias("p")
    ).select(F.explode(F.col("p.data")).alias("d"))
    alive = posts.filter(
        F.col("d.removed_by_category").isNull()
        & F.col("d.selftext").isNotNull()
        & ~F.col("d.selftext").isin("", "unknown", "[removed]")
    )
    universe_arr = F.broadcast(
        universe_symbols.agg(F.collect_set("ticker_symbol").alias("_u"))
    )
    candidates = F.array_union(
        cashtags(F.col("d.selftext")), bare_upper_tickers(F.col("d.selftext"))
    )
    tagged = alive.crossJoin(universe_arr).withColumn(
        "tickers",
        F.array_except(
            F.array_intersect(candidates, F.col("_u")),
            F.array(F.lit("DD"), F.lit("ARE")),
        ),
    )
    with_tickers = tagged.filter(F.size("tickers") > 0)
    return with_tickers.select(
        *_normalized(
            "reddit",
            F.col("d.id"),
            F.col("d.full_link"),
            F.col("tickers"),
            F.col("d.title"),
            F.lit(None).cast("string"),
            F.col("d.selftext"),
            F.timestamp_seconds(F.col("d.created_utc")),
        )
    )


def parse_eastmoney(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S5: JSONP wrapper strip (X15) -> report rows; stockCode padded
    (X9) and the raw struct preserved as a map (§1.2 rule: schema
    violations ride the ``raw`` column, not the typed ones)."""
    body = jsonp_payload(F.col(payload_col))
    parsed = raw.select(F.from_json(body, EASTMONEY_SCHEMA).alias("p")).select(
        F.explode(F.col("p.data")).alias("d")
    )
    return parsed.select(
        *_normalized(
            "eastmoney",
            F.col("d.id"),
            F.unbase64(F.col("d.encodeUrl")).cast("string"),
            F.array(zero_pad(F.col("d.stockCode"), 6)),
            F.col("d.title"),
            F.col("d.stockName"),
            F.col("d.title"),
            F.to_timestamp(F.col("d.publishDate")),
        ),
        F.create_map(
            F.lit("stockCode"), F.col("d.stockCode"),
            F.lit("stockName"), F.col("d.stockName"),
        ).alias("raw"),
    )


def _html_articles(raw: DataFrame, payload_col: str, ref_prefix: str) -> DataFrame:
    """Split a listing page into per-article chunks by the
    ``ref="<PREFIX>.nnn"`` markers (X3)."""
    chunks = F.split(F.col(payload_col), r'(?=ref="' + ref_prefix + r'\.)')
    return (
        raw.select(F.explode(chunks).alias("chunk"))
        .withColumn(
            "article_id", F.regexp_extract(F.col("chunk"), f"({ref_prefix}\\.[0-9]+)", 1)
        )
        .filter(F.col("article_id") != "")
    )


def _strip_tags(col: Column) -> Column:
    """X11 HTML -> text as a JVM regex (MLStripper analog)."""
    return F.trim(F.regexp_replace(col, r"<[^>]+>", ""))


def parse_aastocks(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S3: AAstocks article HTML -> docs. Title from ``newshead5``,
    ticker from the parenthesized code (X2, zero-padded X9), content
    from ``spanContent`` with CJK punctuation-run collapse (X6), time
    format T2."""
    arts = _html_articles(raw, payload_col, "NOW")
    title = _strip_tags(
        F.regexp_extract(F.col("chunk"), r'class="newshead5">(.*?)</h1>', 1)
    )
    content = collapse_punct_runs(
        fold_fullwidth(
            _strip_tags(
                F.regexp_extract(F.col("chunk"), r'class="spanContent">(.*?)</div>', 1)
            )
        ),
        "!?,;:~",
    )
    codes = numeric_codes_only(paren_codes(F.col("chunk")))
    time = F.to_timestamp(
        F.regexp_extract(F.col("chunk"), r'class="newstime5">(.*?)</div>', 1),
        "yyyy/MM/dd HH:mm",
    )
    return arts.select(
        *_normalized(
            "aastocks",
            F.col("article_id"),
            F.concat(F.lit("http://www.aastocks.com/news/"), F.col("article_id")),
            F.transform(codes, lambda c: zero_pad(c, 5)),
            title,
            F.lit(None).cast("string"),
            content,
            time,
        )
    )


def parse_etnet(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S4: Etnet article HTML -> docs (ArticleHdr/NewsContent/date
    hooks, numeric-only parenthesized tickers F8/X2, T3 time
    format)."""
    arts = _html_articles(raw, payload_col, "ETN")
    title = _strip_tags(
        F.regexp_extract(F.col("chunk"), r'class="ArticleHdr">(.*?)</p>', 1)
    )
    content = collapse_punct_runs(
        fold_fullwidth(
            _strip_tags(
                F.regexp_extract(F.col("chunk"), r'class="NewsContent">(.*?)</div>', 1)
            )
        ),
        "!?,;:~",
    )
    codes = numeric_codes_only(paren_codes(content))
    time = F.to_timestamp(
        F.regexp_extract(F.col("chunk"), r'class="date">(.*?)</span>', 1),
        "dd/MM/yyyy HH:mm",
    )
    return arts.select(
        *_normalized(
            "etnet",
            F.col("article_id"),
            F.concat(F.lit("https://www.etnet.com.hk/news/"), F.col("article_id")),
            F.transform(codes, lambda c: zero_pad(c, 5)),
            title,
            F.lit(None).cast("string"),
            content,
            time,
        )
    )


# --- S10/S11: Google SERP + Wikipedia scans -------------------------------

#: F6 prefix blacklist (google_utils.py:14-34) — non-article Google
#: properties to drop from SERP results.
GOOGLE_LINK_BLACKLIST = (
    "https://www.google.com",
    "https://maps.google.com",
    "https://support.google.com",
    "https://accounts.google.com",
    "https://policies.google.com",
    "https://translate.google.com",
    "https://webcache.googleusercontent.com",
)


def parse_google_serp(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S10 (google_utils.py:37-74): extract result links from a SERP
    page and drop the blacklisted Google-property prefixes (F6).
    Returns one row per surviving link."""
    from dss_nlp_ingestion_spark.functions.text import link_blacklist_filter

    links = F.regexp_extract_all(
        F.col(payload_col), F.lit(r'href="(https?://[^"]+)"'), 1
    )
    exploded = raw.select(F.explode(links).alias("link"))
    return exploded.filter(
        link_blacklist_filter(F.col("link"), GOOGLE_LINK_BLACKLIST)
    ).distinct()


def parse_wikipedia(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S11 (wiki_utils.py:27-64,66-125): pick the first
    ``en.wikipedia.org/wiki/...`` link from a SERP, and extract a
    summary (first paragraph, tags stripped X11) from an article
    page. One row per payload with (wiki_link, summary)."""
    wiki_link = F.regexp_extract(
        F.col(payload_col), r'href="(https://en\.wikipedia\.org/wiki/[^"]+)"', 1
    )
    first_para = _strip_tags(
        F.regexp_extract(F.col(payload_col), r"<p>(.*?)</p>", 1)
    )
    return raw.select(
        F.when(wiki_link != "", wiki_link).alias("wiki_link"),
        F.when(first_para != "", first_para).alias("summary"),
    )


# --- S12: Baidu Baike two-step fuzzy lookup -------------------------------

#: X16 URL builders (baidu_api.py:36,64).
BAIDU_ITEM_URL_PREFIX = "https://baike.baidu.com/item/"
BAIDU_SEARCH_URL_PREFIX = (
    "https://www.baidu.com/baidu?tn=monline_7_dg&ie=utf-8&wd="
)


def baidu_item_url(query: Column) -> Column:
    """Direct Baike item URL for a query string (baidu_api.py:36)."""
    return F.concat(F.lit(BAIDU_ITEM_URL_PREFIX), query)


def baidu_search_url(query: Column) -> Column:
    """Fuzzy-search URL: ``{query}+公司+百科`` (baidu_api.py:64)."""
    return F.concat(F.lit(BAIDU_SEARCH_URL_PREFIX), query, F.lit("+公司+百科"))


def parse_baidu_baike(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S12 step 1 (baidu_api.py:31-56): Baike item page -> (url,
    summary, content).  The reference collects every ``<div
    class="para">`` block: summary is the first, content the joined
    rest, both with newlines and NBSPs stripped.  Re-expressed as a
    JVM regex scan: extract all para blocks, strip tags, normalize.
    Pages with no para blocks yield empty strings (the reference's
    miss signal)."""
    paras = F.regexp_extract_all(
        F.col(payload_col),
        F.lit(r'(?s)<div[^>]*class="para[^"]*"[^>]*>(.*?)</div>'),
        1,
    )
    clean = F.transform(
        paras,
        lambda p: F.regexp_replace(
            F.regexp_replace(_strip_tags(p), "\n", ""), " ", ""
        ),
    )
    summary = F.coalesce(F.try_element_at(clean, F.lit(1)), F.lit(""))
    content = F.coalesce(
        F.array_join(F.slice(clean, 2, F.greatest(F.size(clean) - 1, F.lit(0))), ""),
        F.lit(""),
    )
    return raw.select(
        F.col("url"),
        summary.alias("summary"),
        content.alias("content"),
    )


def parse_baidu_serp_name(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """S12 step 2a (baidu_api.py:59-81): from a Baidu SERP, pull the
    first ``c-tools`` tool-span whose ``data-tools`` title links to a
    百度百科 entry and extract the Chinese company name (the title text
    before the 百度百科 marker — the reference slices the same span
    with fixed offsets).  One row per payload: (url, baike_name),
    baike_name NULL when no Baike result is present."""
    # The reference regex: title:'...',url — capture the title text of
    # the first entry containing 百度百科, then trim the marker suffix.
    first_title = F.regexp_extract(
        F.col(payload_col), r"title:'([^']*百度百科[^']*)'", 1
    )
    name = F.regexp_replace(first_title, r"[-_\s]*百度百科\s*$", "")
    return raw.select(
        F.col("url"),
        F.when(name != "", name).alias("baike_name"),
    ).drop_duplicates(["url"])


def baidu_two_step_lookup(queries: DataFrame, fetcher, query_col: str = "query"):
    """S12 composed pipeline (baidu_api.py:31-81): direct item fetch
    first; queries whose item page has no para blocks fall back to the
    SERP fuzzy step (search -> extract Baike entry name -> fetch the
    named item page).  Returns (query, via, url, summary, content)
    where ``via`` is 'direct' or 'two_step'.

    Both fetch stages are the rate-limited ``mapInPandas`` transport
    (fetch.py) — fan-out scales with executors; the per-query result
    is one row regardless of path, and a dead URL is an error row,
    not a task failure."""
    from dss_nlp_ingestion_spark.sources.fetch import fetch_stage

    q = queries.select(F.col(query_col).alias("query")).distinct()
    direct = fetch_stage(
        q.select(baidu_item_url(F.col("query")).alias("url")), fetcher
    )
    direct_docs = parse_baidu_baike(direct).withColumn(
        "query", F.replace(F.col("url"), F.lit(BAIDU_ITEM_URL_PREFIX), F.lit(""))
    )
    hits = direct_docs.filter(
        (F.col("summary") != "") | (F.col("content") != "")
    ).select("query", F.lit("direct").alias("via"), "url", "summary", "content")

    misses = direct_docs.filter(
        (F.col("summary") == "") & (F.col("content") == "")
    ).select("query")
    serp = fetch_stage(
        misses.select(
            F.col("query"), baidu_search_url(F.col("query")).alias("url")
        ),
        fetcher,
    )
    names = parse_baidu_serp_name(serp).withColumn(
        "query",
        F.regexp_replace(
            F.replace(F.col("url"), F.lit(BAIDU_SEARCH_URL_PREFIX), F.lit("")),
            r"\+公司\+百科$",
            "",
        ),
    )
    step2 = fetch_stage(
        names.filter(F.col("baike_name").isNotNull()).select(
            F.col("query").alias("orig_query"),
            baidu_item_url(F.col("baike_name")).alias("url"),
        ),
        fetcher,
    )
    # fetch_stage only returns transport columns; re-derive the query
    # from the fetched item URL through the name mapping.
    step2_docs = (
        parse_baidu_baike(step2)
        .withColumn(
            "baike_name",
            F.replace(F.col("url"), F.lit(BAIDU_ITEM_URL_PREFIX), F.lit("")),
        )
        .join(
            names.select("query", "baike_name"),
            "baike_name",
        )
        .select("query", F.lit("two_step").alias("via"), "url", "summary", "content")
    )
    return hits.unionByName(step2_docs)
