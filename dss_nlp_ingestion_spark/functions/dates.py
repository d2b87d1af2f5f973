"""Date / time functions (SURVEY.md §2.10, T1–T9).

Reference parity:
- T1 ISO-prefix date      — src/lurkers/newsfilter.py:163
- T2 ``%Y/%m/%d %H:%M``   — src/lurkers/aastocks.py:180-182
- T3 ``%d/%m/%Y %H:%M``   — src/lurkers/etnet.py:244-246
- T4 epoch -> timestamp   — src/lurkers/reddit.py:161
- T6 relative windows     — src/lurkers/eastmoney.py:80-88
- T7 hour buckets         — src/lurkers/reddit.py:100-101
- T8 day buckets          — src/lurkers/newsfilter.py:73-75

The reference computes windows relative to ``now()``; the engine takes
an explicit ``as_of`` timestamp instead so plans are deterministic and
replayable (idempotent backfills at 100 TB need this anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FMT_AASTOCKS = "yyyy/MM/dd HH:mm"  # T2
FMT_ETNET = "dd/MM/yyyy HH:mm"  # T3


def iso_prefix_date(col: Column) -> Column:
    """T1: ``publishedAt[0:10]`` -> DATE."""
    return F.to_date(F.substring(col, 1, 10))


def parse_ts(col: Column, fmt: str) -> Column:
    """T2/T3: fixed-format timestamp parse."""
    return F.to_timestamp(col, fmt)


def epoch_to_ts(col: Column) -> Column:
    """T4: epoch seconds -> timestamp."""
    return F.timestamp_seconds(col)


def ts_to_epoch(col: Column) -> Column:
    """Truncating epoch-seconds extraction (matches DuckDB
    ``floor(epoch(ts))``)."""
    return F.unix_timestamp(col)


def epoch_ms(col: Column | str) -> Column:
    """Truncating epoch-milliseconds extraction, total over both
    timestamp types: ``unix_millis`` rejects TIMESTAMP_NTZ (a
    wall-clock with no instant), so cast to ``timestamp_ltz`` first —
    the session timezone is pinned UTC (session.DEFAULT_CONF), making
    the NTZ wall clock the same UTC instant the oracles hash. A plain
    TIMESTAMP passes through the cast unchanged (no-op in the plan)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp_ltz"))


def hour_bucket(col: Column) -> Column:
    """T7: tumbling 1-hour bucket start (batch form; the streaming
    twin uses ``F.window``)."""
    return F.date_trunc("hour", col)


def day_bucket(col: Column) -> Column:
    """T8: tumbling 1-day bucket start."""
    return F.date_trunc("day", col)


def in_relative_window(
    ts: Column, as_of: Column, duration_hours: int, offset_hours: int = 0
) -> Column:
    """T6: ``[as_of - offset - duration, as_of - offset)`` membership —
    the eastmoney/reddit scrape-window predicate with an explicit
    as-of instead of ``now()``."""
    end = as_of - F.make_interval(hours=F.lit(offset_hours))
    start = end - F.make_interval(hours=F.lit(duration_hours))
    return (ts >= start) & (ts < end)


#: T5 fuzzy parse (the reference uses ``dateutil.parse``,
#: src/utils/google_utils.py:8-11): a fixed-format fallback chain
#: covering the formats live scraped dates actually arrive in — ISO
#: with/without tz offset and fractional seconds, RFC-2822,
#: ``Mon D, YYYY`` SERP dates, day-first and dotted EU forms.  A
#: bounded format list is deterministic and JVM-side, unlike
#: dateutil's heuristics.  Each entry is (format, strip-regex): the
#: optional regex removes a prefix Spark cannot parse (day-of-week
#: symbols are format-only since Spark 3), keeping the chain total.
FALLBACK_FORMATS: tuple[tuple[str, str | None], ...] = (
    ("yyyy-MM-dd'T'HH:mm:ssXXX", None),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSXXX", None),
    ("yyyy-MM-dd'T'HH:mm:ss", None),
    ("yyyy-MM-dd HH:mm:ss", None),
    ("yyyy/MM/dd HH:mm", None),
    ("dd/MM/yyyy HH:mm", None),
    ("dd MMM yyyy HH:mm:ss Z", r"^[A-Za-z]{3}, "),  # RFC-2822 minus weekday
    ("MMM d, yyyy HH:mm", None),
    ("MMM d, yyyy", None),
    ("d MMM yyyy", None),
    ("yyyy.MM.dd", None),
    ("yyyy-MM-dd", None),
)


def parse_ts_fuzzy(
    col: Column,
    formats: tuple[tuple[str, str | None], ...] = FALLBACK_FORMATS,
) -> Column:
    """T5: first format that parses wins (``try_to_timestamp``
    returns NULL instead of failing, so the chain is total)."""
    out = None
    for fmt, strip in formats:
        src = F.regexp_replace(col, strip, "") if strip else col
        parsed = F.try_to_timestamp(src, F.lit(fmt))
        out = parsed if out is None else F.coalesce(out, parsed)
    return out
