"""Unit tests for the late function additions (X8, F6, T5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.functions.dates import parse_ts_fuzzy
from dss_nlp_ingestion_spark.functions.text import (
    link_blacklist_filter,
    strip_cjk_junk,
)


def test_strip_cjk_junk(spark):
    df = spark.createDataFrame([("　　2开头　　正文 内容\r尾",)], ["t"])
    out = df.select(strip_cjk_junk(F.col("t")).alias("c")).collect()[0].c
    assert out == "开头正文内容尾"


def test_link_blacklist(spark):
    prefixes = ("https://ads.", "https://login.")
    df = spark.createDataFrame(
        [("https://ads.example.com/x",), ("https://news.example.com/y",),
         ("https://login.example.com/z",)],
        ["link"],
    )
    kept = [
        r.link
        for r in df.filter(link_blacklist_filter(F.col("link"), prefixes)).collect()
    ]
    assert kept == ["https://news.example.com/y"]


def test_parse_ts_fuzzy_fallback_chain(spark):
    df = spark.createDataFrame(
        [("2024-01-15T13:45:00Z",), ("2024/01/15 13:45",), ("15/01/2024 13:45",),
         ("2024-01-15",), ("not a date",)],
        ["s"],
    )
    out = [r.ts for r in df.select(parse_ts_fuzzy(F.col("s")).alias("ts")).collect()]
    assert [t and t.isoformat() for t in out] == [
        "2024-01-15T13:45:00",
        "2024-01-15T13:45:00",
        "2024-01-15T13:45:00",
        "2024-01-15T00:00:00",
        None,
    ]


def test_redact_pii_all_kinds(spark):
    from dss_nlp_ingestion_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("mail a.b+c@x-y.co or +44 (20) 1234-567 from 192.168.0.1 ok",),
         ("no pii at all",),
         ("ip only 8.8.8.8",)],
        "t string",
    )
    out = df.select(
        redact_pii(F.col("t")).alias("r"),
        *[c.alias(n) for c, n in zip(pii_counts(F.col("t")),
                                     ("ne", "np", "ni"))],
    ).collect()
    assert out[0].r == "mail <EMAIL> or <PHONE> from <IP> ok"
    assert (out[0].ne, out[0].np, out[0].ni) == (1, 1, 1)
    assert out[1].r == "no pii at all" and out[1].ne == 0
    assert out[2].r == "ip only <IP>" and out[2].ni == 1
