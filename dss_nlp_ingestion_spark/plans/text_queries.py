"""Text / date function queries (SURVEY.md §2.9–§2.10) and the
text-analysis operators of the LLM-pipeline extension (language ID,
quality scoring, token counting, fingerprinting), each oracle-checked
against DuckDB on the shared parquet tables.

Where the synthetic corpus lacks a feature the reference handled
(full-width CJK, cashtags), the query synthesizes the feature from
real columns first — the operator still runs against the oracle
end-to-end instead of trivially matching on empty output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions import dates as D
from dss_nlp_ingestion_spark.functions import text as T
from dss_nlp_ingestion_spark.plans.registry import fround, fround_sql, register

# ---------------------------------------------------------------------------
# X1/X2/X3: regex extraction suite
# ---------------------------------------------------------------------------

_REGEX_ORACLE = r"""
SELECT doc_id,
       upper(coalesce(array_to_string(regexp_extract_all(text, '\b(s[a-z]+)\b', 1), ','), '')) AS s_words,
       CAST(len(regexp_extract_all(text, '\b(s[a-z]+)\b', 1)) AS BIGINT) AS n_s_words,
       array_to_string(list_transform(
         regexp_extract_all('id=(' || CAST(doc_id AS VARCHAR) || ') lang=(' || lang || ')', '\((.*?)\)', 1),
         x -> x), ',') AS paren_codes,
       coalesce(array_to_string(regexp_extract_all(text, '\$([A-Za-z]+)', 1), ','), '') AS cashtags
FROM documents
"""


@register("regex_extract_suite", _REGEX_ORACLE)
def regex_extract_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 cashtag extraction (reddit.py:82-88), X2 lazy parenthesized
    codes (etnet.py:233) over a synthesized ``(id)(lang)`` string, and
    a word-class extract standing in for the reference's uppercase
    ticker regex (the corpus is lowercase)."""
    docs = table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("id=("), F.col("doc_id").cast("string"), F.lit(") lang=("), F.col("lang"), F.lit(")")
    )
    s_words = F.regexp_extract_all(F.col("text"), F.lit(r"\b(s[a-z]+)\b"), 1)
    return docs.select(
        "doc_id",
        F.upper(F.array_join(s_words, ",")).alias("s_words"),
        F.size(s_words).cast("long").alias("n_s_words"),
        F.array_join(T.paren_codes(synth), ",").alias("paren_codes"),
        F.array_join(T.cashtags(F.col("text")), ",").alias("cashtags"),
    )


# ---------------------------------------------------------------------------
# X4/X7/F7: cleaning + short-text gate
# ---------------------------------------------------------------------------

_CLEAN_ORACLE = r"""
WITH cleaned AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(regexp_replace(text, '\$\w+', '', 'g'), '(?i)https?://\S+', '', 'g'),
           '\s+', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id,
       CAST(len(string_split_regex(clean_text, '\s+')) AS BIGINT) AS n_tokens
FROM cleaned
WHERE len(string_split_regex(clean_text, '\s+')) > 5
"""


@register("text_clean_gate", _CLEAN_ORACLE)
def text_clean_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 cashtag/URL strip + X7 whitespace normalize + F7 short-text
    gate (general_utils.py:187-207): the reference's pre-NLP cleaning
    pass as pure JVM expressions."""
    docs = table(spark, sf_dir, "documents")
    clean = F.trim(T.squeeze_whitespace(T.strip_cashtags_and_urls(F.col("text")), " "))
    out = docs.select("doc_id", T.token_count(clean).alias("n_tokens"))
    return out.filter(F.col("n_tokens") > 5)


# ---------------------------------------------------------------------------
# X5/X6: full-width fold + punctuation-run collapse (synthesized CJK)
# ---------------------------------------------------------------------------

_FOLD_ORACLE = """
WITH synth AS (
  SELECT doc_id,
         substring(text, 1, 20) || '　！！！，，ＡＢ～～' AS raw
  FROM documents
), folded AS (
  SELECT doc_id,
         translate(raw, '　！，．：；？～ＡＢ', ' !,.:;?~AB') AS half
  FROM synth
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         half, '!{2,}', '!', 'g'), '\\?{2,}', '?', 'g'), ',{2,}', ',', 'g'), '~{2,}', '~', 'g')
       AS collapsed
FROM folded
"""


@register("fullwidth_punct_fold", _FOLD_ORACLE)
def fullwidth_punct_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 full-width->half-width fold (etnet.py:129-142 ``strQ2B``) +
    X6 punctuation-run collapse (etnet.py:144-154), exercised on a
    synthesized CJK-punctuation suffix so the transform is non-trivial
    on the ASCII corpus."""
    docs = table(spark, sf_dir, "documents")
    raw = F.concat(F.substring(F.col("text"), 1, 20), F.lit("　！！！，，ＡＢ～～"))
    folded = F.translate(raw, "　！，．：；？～ＡＢ", " !,.:;?~AB")
    collapsed = T.collapse_punct_runs(folded, "!?,~")
    return docs.select("doc_id", collapsed.alias("collapsed"))


# ---------------------------------------------------------------------------
# X9/X10: zero-pad + exchange-suffix mapping
# ---------------------------------------------------------------------------

_PAD_ORACLE = """
WITH codes AS (
  SELECT c_custkey,
         lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS pad5,
         lpad(CAST(c_custkey % 1000000 AS VARCHAR), 6, '0') AS pad6
  FROM customer
)
SELECT c_custkey,
       pad5,
       substring(pad5, 2, 4) || '.HK' AS hk_code,
       pad6 || '.SZ' AS sz_code
FROM codes
"""


@register("zero_pad_exchange", _PAD_ORACLE)
def zero_pad_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 zfill (aastocks.py:80) + X10 exchange-suffix mapping
    (hkscraper_utils.py:1-12) over key-derived codes."""
    c = table(spark, sf_dir, "customer")
    pad5 = T.zero_pad(F.col("c_custkey") % 100000, 5)
    pad6 = T.zero_pad(F.col("c_custkey") % 1000000, 6)
    return c.select(
        "c_custkey",
        pad5.alias("pad5"),
        T.exchange_suffix(pad5).alias("hk_code"),
        T.exchange_suffix(pad6).alias("sz_code"),
    )


# ---------------------------------------------------------------------------
# X12/X13/X14: concat + stable hashes
# ---------------------------------------------------------------------------

_HASH_ORACLE = """
SELECT doc_id,
       sha256(CAST(doc_id AS VARCHAR)) AS id_hash,
       sha256(concat_ws('', source, lang, text)) AS text_hash
FROM documents
"""


@register("content_hash_ids", _HASH_ORACLE)
def content_hash_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 stable id hash + X14/D2 deterministic content hash
    (replacing the reference's per-process-salted Python ``hash``,
    aastocks.py:185,192 — documented semantic fix)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.stable_id_hash(F.col("doc_id")).alias("id_hash"),
        T.content_hash(F.col("source"), F.col("lang"), F.col("text")).alias("text_hash"),
    )


# ---------------------------------------------------------------------------
# Text analysis: token counting (whitespace + BPE-ish)
# ---------------------------------------------------------------------------

_TOKEN_ORACLE = f"""
WITH t AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_toks,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_toks
  FROM documents
)
SELECT lang,
       CAST(sum(ws_toks) AS BIGINT) AS total_ws_tokens,
       CAST(sum(bpe_toks) AS BIGINT) AS total_bpe_tokens,
       {fround_sql('CAST(sum(ws_toks) AS DOUBLE) / count(*)', 4)} AS avg_ws_tokens
FROM t
GROUP BY lang
"""


@register("token_stats_by_lang", _TOKEN_ORACLE)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) aggregated per
    declared language — the LLM-pipeline token accounting operator."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        T.token_count(F.col("text")).alias("ws_toks"),
        T.bpe_token_count(F.col("text")).alias("bpe_toks"),
    )
    return t.groupBy("lang").agg(
        F.sum("ws_toks").cast("long").alias("total_ws_tokens"),
        F.sum("bpe_toks").cast("long").alias("total_bpe_tokens"),
        fround(F.sum("ws_toks").cast("double") / F.count(F.lit(1)), 4).alias("avg_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# Text analysis: language ID + quality scoring
# ---------------------------------------------------------------------------

_STOPWORD_PAT = r"\b(" + "|".join(T.EN_STOPWORDS) + r")\b"

_LANGQ_ORACLE = f"""
WITH m AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS toks,
         CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS uniq_toks,
         CAST(len(regexp_extract_all(lower(text), '{_STOPWORD_PAT}')) AS BIGINT) AS stops,
         CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS puncts
  FROM documents
)
SELECT doc_id,
       CASE WHEN CAST(stops AS DOUBLE) / toks > 0.08 THEN 'en' ELSE 'und' END AS pred_lang,
       {fround_sql(
           '0.4 * (CASE WHEN n_chars >= 100 AND n_chars <= 2000 THEN 1.0 ELSE 0.0 END)'
           ' + 0.3 * (CAST(uniq_toks AS DOUBLE) / toks)'
           " + 0.3 * (1.0 - least(CAST(puncts AS DOUBLE) / toks, 1.0))", 6)} AS quality
FROM m
"""


@register("lang_id_quality", _LANGQ_ORACLE)
def lang_id_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword ratio) + composite quality
    score (length gate, uniqueness, punctuation density) — the
    LLM-pipeline quality-filter operators as pure column math."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("pred_lang"),
        fround(T.quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality"),
    )


# ---------------------------------------------------------------------------
# Text analysis: rolling-hash fingerprint (1-perm MinHash)
# ---------------------------------------------------------------------------

_FP_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
  FROM documents
)
SELECT doc_id,
       list_min(list_transform(range(1, len(ws) - 1),
         i -> sha256(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS fingerprint
FROM w
WHERE len(ws) >= 3
"""


@register("doc_fingerprints", _FP_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min sha256 over word 3-gram
    shingles (1-permutation MinHash) — the scalable basis of the
    near-dup family (D2 extension)."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(F.size(T.ws_tokens(F.col("text"))) >= 3).select(
        "doc_id", T.doc_fingerprint(F.col("text"), 3).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# T1-T4: date parse/format round-trips
# ---------------------------------------------------------------------------

_DATE_ORACLE = """
SELECT event_id,
       CAST(substring(CAST(ts AS VARCHAR), 1, 10) AS DATE) AS iso_day,
       strftime(ts, '%Y/%m/%d %H:%M') AS fmt_aastocks,
       strptime(strftime(ts, '%Y/%m/%d %H:%M'), '%Y/%m/%d %H:%M') AS reparsed,
       strptime(strftime(ts, '%d/%m/%Y %H:%M'), '%d/%m/%Y %H:%M') AS reparsed_etnet,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS from_epoch
FROM events
"""


@register("date_parse_roundtrip", _DATE_ORACLE)
def date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 ISO-prefix date, T2/T3 fixed-format parse (aastocks/etnet
    formats), T4 epoch round-trip — the reference's entire timestamp
    normalization surface as built-ins."""
    ev = table(spark, sf_dir, "events")
    fmt2 = F.date_format(F.col("ts"), D.FMT_AASTOCKS)
    fmt3 = F.date_format(F.col("ts"), D.FMT_ETNET)
    epoch = D.ts_to_epoch(F.col("ts"))
    return ev.select(
        "event_id",
        D.iso_prefix_date(F.col("ts").cast("string")).alias("iso_day"),
        fmt2.alias("fmt_aastocks"),
        D.parse_ts(fmt2, D.FMT_AASTOCKS).alias("reparsed"),
        D.parse_ts(fmt3, D.FMT_ETNET).alias("reparsed_etnet"),
        epoch.alias("epoch_s"),
        D.epoch_to_ts(epoch).alias("from_epoch"),
    )


# ---------------------------------------------------------------------------
# T6/T8: relative scrape windows with explicit as-of
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' - INTERVAL 24 HOUR - INTERVAL 72 HOUR
  AND ts <  TIMESTAMP '2024-01-25 00:00:00' - INTERVAL 24 HOUR
GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP), event_type
"""


@register("relative_window_counts", _WINDOW_ORACLE)
def relative_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 relative scrape window (eastmoney.py:80-88) with an explicit
    as-of (deterministic replay of the reference's now()-anchored
    window) + T8 day buckets."""
    ev = table(spark, sf_dir, "events")
    as_of = F.lit("2024-01-25 00:00:00").cast("timestamp")
    windowed = ev.filter(
        D.in_relative_window(F.col("ts"), as_of, duration_hours=72, offset_hours=24)
    )
    return windowed.groupBy(
        D.day_bucket(F.col("ts")).alias("day_start"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))


# ---------------------------------------------------------------------------
# T5: fuzzy date parse over a deliberately messy fixture column
# ---------------------------------------------------------------------------

# Both engines render the SAME messy strings from doc_id arithmetic
# (13 variants: ISO w/ and w/o tz + millis, RFC-2822, SERP 'Mon D,
# YYYY', day-first, dotted, and one unparseable), then run their
# fuzzy chain; the parsed timestamp and a null flag are compared.
_FUZZY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         make_timestamp((1704067200 + (doc_id % 365) * 86400
                         + (doc_id % 1439) * 60 + (doc_id % 59)) * 1000000) AS ts
  FROM documents
), raw AS (
  SELECT doc_id,
    CASE doc_id % 13
      WHEN 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+00:00'
      WHEN 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.123+00:00'
      WHEN 2 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
      WHEN 3 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      WHEN 4 THEN strftime(ts, '%Y/%m/%d %H:%M')
      WHEN 5 THEN strftime(ts, '%d/%m/%Y %H:%M')
      WHEN 6 THEN strftime(ts, '%a, %d %b %Y %H:%M:%S') || ' +0000'
      WHEN 7 THEN strftime(ts, '%b %-d, %Y %H:%M')
      WHEN 8 THEN strftime(ts, '%b %-d, %Y')
      WHEN 9 THEN strftime(ts, '%-d %b %Y')
      WHEN 10 THEN strftime(ts, '%Y.%m.%d')
      WHEN 11 THEN strftime(ts, '%Y-%m-%d')
      ELSE 'no date here ' || doc_id
    END AS raw
  FROM base
)
SELECT doc_id, raw,
       CAST(try_strptime(regexp_replace(raw, '^[A-Za-z]{3}, ', ''),
         ['%Y-%m-%dT%H:%M:%S%z', '%Y-%m-%dT%H:%M:%S.%g%z',
          '%Y-%m-%dT%H:%M:%S', '%Y-%m-%d %H:%M:%S', '%Y/%m/%d %H:%M',
          '%d/%m/%Y %H:%M', '%d %b %Y %H:%M:%S %z', '%b %-d, %Y %H:%M',
          '%b %-d, %Y', '%-d %b %Y', '%Y.%m.%d', '%Y-%m-%d'])
       AS TIMESTAMP) AS parsed,
       try_strptime(regexp_replace(raw, '^[A-Za-z]{3}, ', ''),
         ['%Y-%m-%dT%H:%M:%S%z', '%Y-%m-%dT%H:%M:%S.%g%z',
          '%Y-%m-%dT%H:%M:%S', '%Y-%m-%d %H:%M:%S', '%Y/%m/%d %H:%M',
          '%d/%m/%Y %H:%M', '%d %b %Y %H:%M:%S %z', '%b %-d, %Y %H:%M',
          '%b %-d, %Y', '%-d %b %Y', '%Y.%m.%d', '%Y-%m-%d'])
       IS NULL AS unparsed
FROM raw
"""


@register("date_parse_fuzzy", _FUZZY_ORACLE)
def date_parse_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 fuzzy parse (dateutil.parse analog, google_utils.py:8-11):
    renders 13 messy date shapes from doc_id arithmetic and runs the
    fixed fallback chain; NULL only where dateutil would also give up
    (the planted garbage variant)."""
    from dss_nlp_ingestion_spark.functions.dates import parse_ts_fuzzy

    docs = table(spark, sf_dir, "documents").select("doc_id")
    epoch = (
        F.lit(1704067200)
        + (F.col("doc_id") % 365) * 86400
        + (F.col("doc_id") % 1439) * 60
        + (F.col("doc_id") % 59)
    )
    ts = F.timestamp_seconds(epoch)
    v = F.col("doc_id") % 13
    raw = (
        F.when(v == 0, F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00")))
        .when(v == 1, F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), F.lit(".123+00:00")))
        .when(v == 2, F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"))
        .when(v == 3, F.date_format(ts, "yyyy-MM-dd HH:mm:ss"))
        .when(v == 4, F.date_format(ts, "yyyy/MM/dd HH:mm"))
        .when(v == 5, F.date_format(ts, "dd/MM/yyyy HH:mm"))
        .when(v == 6, F.concat(F.date_format(ts, "EEE, dd MMM yyyy HH:mm:ss"), F.lit(" +0000")))
        .when(v == 7, F.date_format(ts, "MMM d, yyyy HH:mm"))
        .when(v == 8, F.date_format(ts, "MMM d, yyyy"))
        .when(v == 9, F.date_format(ts, "d MMM yyyy"))
        .when(v == 10, F.date_format(ts, "yyyy.MM.dd"))
        .when(v == 11, F.date_format(ts, "yyyy-MM-dd"))
        .otherwise(F.concat(F.lit("no date here "), F.col("doc_id").cast("string")))
    )
    parsed = parse_ts_fuzzy(F.col("raw"))
    return (
        docs.withColumn("raw", raw)
        .select("doc_id", "raw", parsed.alias("parsed"))
        .withColumn("unparsed", F.col("parsed").isNull())
    )


# ---------------------------------------------------------------------------
# PII redaction (emails / phones / IPv4 -> typed placeholders)
# ---------------------------------------------------------------------------

# The synthetic corpus carries no PII, so both engines append the SAME
# deterministic contact block derived from doc_id (varied via moduli so
# every combination of present/absent PII kinds occurs), then redact.
_PII_AUG_SQL = """
text
|| CASE WHEN doc_id % 3 <> 0
        THEN ' reach u' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
        ELSE '' END
|| CASE WHEN doc_id % 4 <> 0
        THEN ' call +1 (555) 01' || CAST(doc_id % 90 + 10 AS VARCHAR)
        ELSE '' END
|| CASE WHEN doc_id % 5 <> 0
        THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
             || CAST(doc_id % 100 AS VARCHAR)
        ELSE '' END
"""

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{T.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{T.PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{T.PII_IPV4_RE}')) AS BIGINT) AS n_ips,
       sha256(
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{T.PII_EMAIL_RE}', '<EMAIL>', 'g'),
             '{T.PII_PHONE_RE}', '<PHONE>', 'g'),
           '{T.PII_IPV4_RE}', '<IP>', 'g')
       ) AS redacted_sha
FROM aug
"""


@register("pii_redaction", _PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and redact emails, international phone
    numbers, and IPv4 addresses into typed placeholders (<EMAIL>/
    <PHONE>/<IP>) — pure codegen'd regexp chain over the scan, zero
    shuffle; the redacted text is sha-hashed for compact comparison."""
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(F.lit(" reach u"), did.cast("string"), F.lit("@mail.example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 != 0,
            F.concat(F.lit(" call +1 (555) 01"), (did % 90 + 10).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 != 0,
            F.concat(
                F.lit(" host 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    t = F.col("_t")
    n_emails, n_phones, n_ips = T.pii_counts(t)
    return (
        docs.select("doc_id", aug.alias("_t"))
        .select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            n_ips.alias("n_ips"),
            F.sha2(T.redact_pii(t), 256).alias("redacted_sha"),
        )
    )


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (context-length packing input)
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
), s AS (
  SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1, {_CHUNK_STRIDE})) AS st
  FROM t
)
SELECT doc_id,
       CAST(st // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(ws[st + 1 : st + {_CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens,
       sha256(array_to_string(ws[st + 1 : st + {_CHUNK_SIZE}], ' ')) AS chunk_sha
FROM s
"""


@register("chunk_windows", _CHUNK_ORACLE)
def chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping 64-token windows with
    stride 48 (context-length chunking before tokenization/
    packing): sequence + explode + slice, all codegen'd array ops on
    the scan — rows fan out by ~tokens/stride but never shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = T.ws_tokens(F.col("text"))
    exploded = docs.select(
        "doc_id",
        toks.alias("_ws"),
        F.explode(T.chunk_starts(toks, _CHUNK_STRIDE)).alias("_st"),
    )
    sl = F.slice(F.col("_ws"), F.col("_st") + 1, _CHUNK_SIZE)
    return exploded.select(
        "doc_id",
        F.floor(F.col("_st") / F.lit(_CHUNK_STRIDE)).cast("long").alias("chunk_idx"),
        F.size(sl).cast("long").alias("n_chunk_tokens"),
        F.sha2(F.concat_ws(" ", sl), 256).alias("chunk_sha"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition scores (Gopher-rule family)
# ---------------------------------------------------------------------------

def _rep_sql(k: int) -> str:
    """DuckDB k-gram duplicate fraction: 1 - distinct/total k-grams."""
    grams = (
        f"list_transform(range(1, len(ws) - {k - 2}), i -> "
        + " || ' ' || ".join(f"ws[i+{j}]" for j in range(k)).replace("ws[i+0]", "ws[i]")
        + ")"
    )
    return (
        f"CASE WHEN len(ws) >= {k} THEN "
        f"1.0 - CAST(len(list_distinct({grams})) AS DOUBLE) / len({grams}) "
        f"ELSE 0.0 END"
    )


_REP_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
)
SELECT doc_id,
       {fround_sql(_rep_sql(2), 6)} AS dup2_frac,
       {fround_sql(_rep_sql(3), 6)} AS dup3_frac
FROM w
"""


@register("repetition_scores", _REP_ORACLE)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher-style duplicate-n-gram
    quality rule): fraction of repeated word 2-grams and 3-grams per
    document — high values flag degenerate/boilerplate text before
    training. Pure scan-side array math, no shuffle."""
    docs = table(spark, sf_dir, "documents")

    def rep(k: int) -> F.Column:
        sh = T.shingles(F.col("text"), k)
        frac = F.lit(1.0) - F.size(F.array_distinct(sh)) / F.size(sh)
        return F.when(
            F.size(T.ws_tokens(F.col("text"))) >= k, frac
        ).otherwise(F.lit(0.0))

    return docs.select(
        "doc_id",
        fround(rep(2), 6).alias("dup2_frac"),
        fround(rep(3), 6).alias("dup3_frac"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage (top-k tokens + cumulative mass)
# ---------------------------------------------------------------------------

_VOCAB_K = 100

_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
), counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
), tot AS (
  SELECT sum(n) AS total FROM counts
), top AS (
  SELECT tok, n FROM counts ORDER BY n DESC, tok ASC LIMIT {_VOCAB_K}
)
SELECT tok, n,
       CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rank,
       {fround_sql("CAST(sum(n) OVER (ORDER BY n DESC, tok ASC "
                   "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
                   " / tot.total", 6)} AS coverage
FROM top CROSS JOIN tot
"""


@register("vocab_coverage_topk", _VOCAB_ORACLE)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design table: the 100 most frequent tokens with
    cumulative corpus coverage (what fraction of all token
    occurrences a vocabulary of that size would cover). One shuffle
    builds the counts; the top-k is TakeOrderedAndProject and the
    cumulative window runs over the k-row result only."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(T.ws_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(_VOCAB_K)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "tok",
            "n",
            F.row_number().over(w).cast("long").alias("rank"),
            fround(
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.col("_total"),
                6,
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source data-quality report (the pipeline health dashboard)
# ---------------------------------------------------------------------------

# Shared with the curriculum-bin oracle (same quality formula).
from dss_nlp_ingestion_spark.plans.sampling_queries import _QUALITY_SQL  # noqa: E402

_REPORT_ORACLE = f"""
WITH w AS (
  SELECT source, lang, text, n_chars,
         string_split_regex(trim(text), '\\s+') AS ws
  FROM documents
), m AS (
  SELECT source,
         lang,
         CAST(len(ws) AS BIGINT) AS toks,
         {_QUALITY_SQL} AS quality,
         {fround_sql(_rep_sql(3), 6)} AS dup3
  FROM w
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {fround_sql("CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)} AS mean_quality,
       {fround_sql("CAST(sum(CAST(dup3 AS DECIMAL(18,6))) AS DOUBLE) / count(*)", 6)} AS mean_dup3,
       {fround_sql("CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS pct_en,
       {fround_sql("CAST(sum(toks) AS DOUBLE) / count(*)", 6)} AS mean_tokens
FROM m GROUP BY source
"""


@register("quality_report_by_source", _REPORT_ORACLE)
def quality_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source data-quality dashboard every ingestion pipeline
    watches: document counts, mean quality score, mean duplicate-
    3-gram fraction, English share, and mean token count per source.
    All metrics are scan-side column math feeding ONE partial-
    aggregated shuffle on source; means are decimal-summed so the
    report is exact under any aggregation order."""
    docs = table(spark, sf_dir, "documents")

    def rep3() -> F.Column:
        sh = T.shingles(F.col("text"), 3)
        frac = F.lit(1.0) - F.size(F.array_distinct(sh)) / F.size(sh)
        return F.when(
            F.size(T.ws_tokens(F.col("text"))) >= 3, frac
        ).otherwise(F.lit(0.0))

    m = docs.select(
        "source",
        "lang",
        T.token_count(F.col("text")).alias("toks"),
        fround(T.quality_score(F.col("text"), F.col("n_chars")), 6).alias("quality"),
        fround(rep3(), 6).alias("dup3"),
    )
    n = F.count(F.lit(1))
    return m.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        fround(
            F.sum(F.col("quality").cast("decimal(18,6)")).cast("double") / n, 6
        ).alias("mean_quality"),
        fround(
            F.sum(F.col("dup3").cast("decimal(18,6)")).cast("double") / n, 6
        ).alias("mean_dup3"),
        fround(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double") / n, 6
        ).alias("pct_en"),
        fround(F.sum("toks").cast("double") / n, 6).alias("mean_tokens"),
    )


# ---------------------------------------------------------------------------
# Higher-order array functions: filter / exists / forall over tokens
# ---------------------------------------------------------------------------

_HOF_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> length(x) > 5)) AS BIGINT) AS n_long,
       len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$'))) > 0 AS has_number,
       len(list_filter(toks, x -> length(x) < 12)) = len(toks) AS all_short
FROM t
"""


@register("array_hof_suite", _HOF_ORACLE)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions in the hot path — F.filter,
    F.exists, F.forall over the token array, all inside whole-stage
    codegen (no UDF): long-word counts, digit-token detection, and a
    length invariant. DuckDB's list_filter forms are the oracle."""
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("long").alias("n_long"),
        F.exists(toks, lambda x: x.rlike("^[0-9]+$")).alias("has_number"),
        F.forall(toks, lambda x: F.length(x) < 12).alias("all_short"),
    )


# ---------------------------------------------------------------------------
# S13: article extraction (text-density boilerplate removal)
# ---------------------------------------------------------------------------

_ARTICLE_ORACLE = """
SELECT doc_id,
       CASE WHEN length(trim(text)) >= 80 THEN trim(text) ELSE '' END AS article
FROM documents
"""


@register("article_extraction", _ARTICLE_ORACLE)
def article_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 (google_utils.py:76-93's newspaper3k slot): wrap each
    document's text in a full synthesized page — link-only nav,
    related-links rail, short newsletter teaser, footer — then run
    the text-density extractor (sources/extract.py). A hash match
    means the extractor recovered the article body EXACTLY while
    dropping every boilerplate block (nav/related die on link
    density, teaser/footer on minimum prose length); docs under 80
    chars are the miss signal (empty string), also oracle-checked.
    Pure codegen: regexp block scan + higher-order filters, no
    Python in the path."""
    from dss_nlp_ingestion_spark.sources.extract import extract_article

    nav = (
        '<div class="nav"><a href="/">Home</a> <a href="/m">Markets</a> '
        '<a href="/t">Technology</a> <a href="/s">Subscribe today</a></div>'
    )
    related = (
        '<div class="rel">Related: <a href="/a/1">Fees cut</a> '
        '<a href="/a/2">Upgrade</a> <a href="/a/3">Reshuffle</a></div>'
    )
    teaser = "<p>Sign up for our daily briefing.</p>"
    footer = '<div class="foot">(c) 2026 Example News Network.</div>'
    page = F.concat(
        F.lit(nav + "<p>"), F.col("text"), F.lit("</p>" + related + teaser + footer)
    )
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", extract_article(page).alias("article")
    )


# ---------------------------------------------------------------------------
# BPE training step under the oracle gate (operators/bpe.py)
# ---------------------------------------------------------------------------

_BPE_PAIRS_ORACLE = """
WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
  FROM documents
), vocab AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n
  FROM words WHERE word <> '' GROUP BY word
), pos AS (
  SELECT word, n, unnest(generate_series(1, length(word) - 1)) AS i
  FROM vocab WHERE length(word) > 1
), inner_pairs AS (
  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, n FROM pos
), eow_pairs AS (
  SELECT substr(word, length(word), 1) AS a, '</w>' AS b, n FROM vocab
), all_pairs AS (
  SELECT * FROM inner_pairs UNION ALL SELECT * FROM eow_pairs
)
SELECT a, b, CAST(sum(n) AS BIGINT) AS total
FROM all_pairs GROUP BY a, b
ORDER BY total DESC, a, b
LIMIT 20
"""


@register("bpe_top_pairs", _BPE_PAIRS_ORACLE)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training step (operators/bpe.py) under the hash
    gate: frequency-weighted adjacent-pair counts over the corpus
    vocabulary (chars + end-of-word marker), top-20 with the
    training argmax's exact tie-break. The iterative trainer's later
    steps reuse this same counting plan per merge
    (hand-derivation-pinned in tests/test_operators_unit.py); pair
    counting is the only full-vocabulary work per step, and the
    vocabulary — not the corpus — is what each iteration touches."""
    from dss_nlp_ingestion_spark.operators.bpe import (
        pair_counts,
        symbolize,
        word_counts,
    )

    vocab = word_counts(table(spark, sf_dir, "documents"))
    counts = pair_counts(symbolize(vocab, []))
    return (
        counts.orderBy(F.col("total").desc(), F.col("a"), F.col("b"))
        .limit(20)
        .select("a", "b", F.col("total").cast("long").alias("total"))
    )


# ---------------------------------------------------------------------------
# D3 upgraded: canonical-URL link dedup
# ---------------------------------------------------------------------------

_URL_NORM_ORACLE = r"""
WITH raw AS (
  SELECT 'HTTP://News.Example.COM:80/articles/' || c_custkey || '/?utm=x&id=' || c_custkey || '#top' AS u FROM customer
  UNION ALL
  SELECT 'http://news.example.com/articles/' || c_custkey || '?id=' || c_custkey || '&utm=x' FROM customer
  UNION ALL
  SELECT 'http://news.example.com/articles/' || c_custkey || '/?id=' || c_custkey || '&utm=x' FROM customer
),
s1 AS (SELECT u, regexp_replace(trim(u), '#.*$', '') AS uu FROM raw),
s2 AS (SELECT u, regexp_extract(uu, '^([^?]*)', 1) AS base,
              regexp_extract(uu, '\?(.*)$', 1) AS query FROM s1),
s3 AS (SELECT u, base, query,
              lower(regexp_extract(base, '(?i)^(https?://[^/]*)', 1)) AS sh0 FROM s2),
s4 AS (SELECT u, query, substr(base, len(sh0) + 1) AS path0,
              CASE WHEN starts_with(sh0, 'http://') AND sh0 LIKE '%:80'
                   THEN left(sh0, len(sh0) - 3)
                   WHEN starts_with(sh0, 'https://') AND sh0 LIKE '%:443'
                   THEN left(sh0, len(sh0) - 4)
                   ELSE sh0 END AS sh FROM s3),
s5 AS (SELECT u, sh || regexp_replace(path0, '/+$', '') ||
              CASE WHEN array_to_string(list_sort(list_filter(string_split(query, '&'), x -> x <> '')), '&') <> ''
                   THEN '?' || array_to_string(list_sort(list_filter(string_split(query, '&'), x -> x <> '')), '&')
                   ELSE '' END AS url_norm FROM s4)
SELECT url_norm,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT u) AS BIGINT) AS n_distinct_raw
FROM s5 GROUP BY url_norm
"""


@register("normalized_link_dedup", _URL_NORM_ORACLE)
def normalized_link_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL link dedup (D3 upgraded): three spellings of
    every article link — mixed-case host with default port, fragment,
    shuffled query params, trailing slash — collapse to ONE canonical
    form (functions/text.py:normalize_url, pure codegen). The
    reference dedups raw link strings only (src/base.py:210-218), so
    each spelling would be scraped again; at crawl scale the
    normalization IS the dedup-key quality. Every group must count 3
    raw variants, which the hash gate verifies row-by-row."""
    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    variants = [
        F.concat(
            F.lit("HTTP://News.Example.COM:80/articles/"), k,
            F.lit("/?utm=x&id="), k, F.lit("#top"),
        ),
        F.concat(
            F.lit("http://news.example.com/articles/"), k,
            F.lit("?id="), k, F.lit("&utm=x"),
        ),
        F.concat(
            F.lit("http://news.example.com/articles/"), k,
            F.lit("/?id="), k, F.lit("&utm=x"),
        ),
    ]
    raw = None
    for v in variants:
        part = cust.select(v.alias("u"))
        raw = part if raw is None else raw.unionByName(part)
    return (
        raw.select("u", T.normalize_url(F.col("u")).alias("url_norm"))
        .groupBy("url_norm")
        .agg(
            F.count("*").cast("long").alias("n_raw"),
            F.countDistinct("u").cast("long").alias("n_distinct_raw"),
        )
    )


_NGRAM_MIN_DF = 2

_NGRAM_COVERAGE_ORACLE = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
), gr AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM w WHERE len(ws) >= 3
), dfreq AS (
  SELECT g FROM gr GROUP BY g HAVING count(DISTINCT doc_id) >= {_NGRAM_MIN_DF}
), per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams FROM gr GROUP BY doc_id
), hits AS (
  SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_common
  FROM gr JOIN dfreq ON gr.g = dfreq.g
  GROUP BY gr.doc_id
)
SELECT p.doc_id, p.n_ngrams,
       CAST(coalesce(h.n_common, 0) AS BIGINT) AS n_common,
       {fround_sql('CAST(coalesce(h.n_common, 0) AS DOUBLE) / p.n_ngrams', 6)} AS coverage
FROM per_doc p LEFT JOIN hits h ON h.doc_id = p.doc_id
"""


@register("common_ngram_coverage", _NGRAM_COVERAGE_ORACLE)
def common_ngram_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate coverage gate (operators.lm.common_ngram_coverage):
    per document, the fraction of its word trigrams occurring in >= 2
    distinct documents — the C4/Gopher-style template-text signal
    that catches boilerplate near-dup passes miss (same chrome,
    different article). Doc-frequency table shuffles on the gram key
    (distinct-gram-sized) and rejoins by hash join — deliberately no
    broadcast, the common set is corpus-sized at 100 TB."""
    from dss_nlp_ingestion_spark.operators.lm import common_ngram_coverage

    out = common_ngram_coverage(
        table(spark, sf_dir, "documents"), k=3, min_df=_NGRAM_MIN_DF
    )
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_common",
        fround(F.col("n_common").cast("double") / F.col("n_ngrams"), 6).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION from the committed merge artifact
# ---------------------------------------------------------------------------

def _bpe_apply_oracle() -> str:
    from dss_nlp_ingestion_spark.operators.bpe import (
        EOW,
        load_merges,
        merge_replace_chain_sql,
    )

    seq = rf"'  ' || regexp_replace(w, '(.)', '\1  ', 'g') || '{EOW}  '"
    merged = merge_replace_chain_sql(seq, load_merges())
    per_word = (
        f"len(list_filter(string_split({merged}, ' '), x -> x <> ''))"
    )
    return f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(list_sum(list_transform(ws, w -> {per_word})) AS BIGINT) AS n_bpe_tokens,
       {fround_sql('CAST(list_sum(list_transform(ws, w -> ' + per_word + ')) AS DOUBLE) / len(ws)', 6)} AS tokens_per_word
FROM w
"""


@register("bpe_tokenize_counts", _bpe_apply_oracle())
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the COMMITTED BPE merge table (operators/bpe.py — trained
    by the deterministic no-RNG trainer, provenance pinned by a
    retrain-equality test) to every document as pure codegen string
    ops: each word becomes a double-space-delimited symbol string and
    each learned merge is one literal replace (left-to-right
    non-overlapping replace == BPE merge order; the double delimiter
    keeps adjacent merge sites matchable). Token counting at 100 TB
    is therefore a SCAN-SIDE projection — the Arrow/pandas path
    (bpe.tokenize) is only needed when the token STRINGS must be
    materialized per position. No shuffle at all."""
    from dss_nlp_ingestion_spark.operators.bpe import (
        _sep_seq,
        load_merges,
        merge_replace_chain,
    )

    merges = load_merges()
    docs = table(spark, sf_dir, "documents")
    ws = T.ws_tokens(F.col("text"))

    def n_toks(w: F.Column) -> F.Column:
        merged = merge_replace_chain(_sep_seq(w), merges)
        return F.size(
            F.filter(F.split(merged, " "), lambda x: x != F.lit(""))
        ).cast("long")

    n_bpe = F.aggregate(
        F.transform(ws, n_toks), F.lit(0).cast("long"), lambda a, x: a + x
    )
    n_words = F.size(ws).cast("long")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_bpe.alias("n_bpe_tokens"),
        fround(n_bpe.cast("double") / n_words, 6).alias("tokens_per_word"),
    )
