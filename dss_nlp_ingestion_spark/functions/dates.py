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


#: T5 fuzzy-ish parse: the fixed-format fallback chain covering every
#: timestamp shape the reference's sources emit (dateutil.parse's
#: general fuzziness is out of scope by design — a bounded format list
#: is deterministic and JVM-side).
FALLBACK_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy/MM/dd HH:mm",
    "dd/MM/yyyy HH:mm",
    "yyyy-MM-dd",
)


def parse_ts_fuzzy(col: Column, formats: tuple[str, ...] = FALLBACK_FORMATS) -> Column:
    """T5: first format that parses wins (``try_to_timestamp``
    returns NULL instead of failing, so the chain is total)."""
    out = None
    for fmt in formats:
        parsed = F.try_to_timestamp(col, F.lit(fmt))
        out = parsed if out is None else F.coalesce(out, parsed)
    return out
