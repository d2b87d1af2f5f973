"""Rate-limited HTTP fetch stage (SURVEY.md §2.1 S1–S5, S10–S13 and
§4: "DataSource/fetch stage abstraction ... inside mapInPandas").

The reference fetches sequentially per worker pod with per-source
retry counts (``num_retries: 10``, configs.yaml:17) and backoff
(reddit.py:148-150: sleep on 429). Here fetching is a ``mapInPandas``
stage over a URL/task DataFrame:

- **bounded concurrency + rate limit per executor slot** — a token-
  bucket inside the worker process (the Tencent 20 req/s analog,
  tencent_api.py:4);
- **bounded retries with backoff** per request;
- **injectable transport with a live default**: the ``fetcher``
  callable does the actual I/O and defaults to the stdlib
  :func:`urllib_fetcher` (so pointing the engine at a real source
  needs zero transport code); tests — and this container, which has
  no network beyond loopback — inject fakes through the same seam.
  Spark-side wiring — Arrow batches, task distribution, error rows
  instead of task failures — is identical either way.

Scale note: fetch tasks are pure fan-out; the stage inherits the URL
DataFrame's partitioning, so throughput = executors x slot-level
rate limit, and a dead URL costs one error row, not a task retry.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("payload", StringType()),
        StructField("error", StringType()),
        StructField("attempts", IntegerType()),
        StructField("elapsed_ms", LongType()),
    ]
)

Fetcher = Callable[[str], tuple[int, str]]

#: The reference's production retry envelope (deploy/configmaps/
#: configs.yaml:17 ``num_retries: 10``); the engine default stays a
#: conservative 3 — callers opt into the reference's persistence.
REFERENCE_NUM_RETRIES = 10


def urllib_fetcher(
    timeout_s: float = 10.0,
    headers: dict[str, str] | None = None,
    max_bytes: int = 8 * 1024 * 1024,
) -> Fetcher:
    """Default live transport: stdlib ``urllib`` GET returning
    (status, body-text) — what the reference does with ``requests``
    (src/lurkers/newsfilter.py:95-109). HTTP error statuses are
    RETURNED, not raised, so the stage's 429-backoff path
    (src/lurkers/reddit.py:148-150) engages; transport-level failures
    (DNS, refused, timeout) raise and become error rows.

    Built lazily per worker process (urllib imported inside the
    closure) and capped at ``max_bytes`` per response so one huge
    page cannot blow an Arrow batch. Tests keep injecting fakes; this
    exists so a user pointing the engine at a live source needs zero
    transport code."""
    hdrs = {"User-Agent": "dss-nlp-ingestion-spark/1.0"} | (headers or {})

    def _fetch(url: str) -> tuple[int, str]:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                body = resp.read(max_bytes)
                return resp.status, body.decode("utf-8", errors="replace")
        except urllib.error.HTTPError as exc:
            body = exc.read(max_bytes) if exc.fp is not None else b""
            return exc.code, body.decode("utf-8", errors="replace")

    return _fetch


class _TokenBucket:
    """Per-worker rate limiter: ``rate`` requests/second, burst 1."""

    def __init__(self, rate: float):
        self.min_interval = 1.0 / rate if rate > 0 else 0.0
        self._last = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        wait = self._last + self.min_interval - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()


def fetch_stage(
    urls: DataFrame,
    fetcher: Fetcher | None = None,
    url_col: str = "url",
    rate_per_slot: float = 20.0,
    max_retries: int = 3,
    backoff_s: float = 0.05,
) -> DataFrame:
    """Map a URL DataFrame through the rate-limited fetcher; returns
    FETCH_RESULT_SCHEMA rows (never raises — failures become error
    rows so one dead URL can't burn a whole task's retries).

    The live :func:`urllib_fetcher` transport is OPT-IN: pass it
    explicitly, or set ``DSS_SPARK_LIVE_FETCH=1`` to make it the
    default. With neither, a missing ``fetcher`` raises — a batch/CI
    caller must never silently start real HTTP GETs from executors."""
    if fetcher is None:
        import os

        if os.environ.get("DSS_SPARK_LIVE_FETCH") != "1":
            raise ValueError(
                "fetch_stage needs an explicit fetcher (e.g. "
                "fetcher=urllib_fetcher()) — or set DSS_SPARK_LIVE_FETCH=1 "
                "to opt into the live default transport"
            )
        fetcher = urllib_fetcher()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = _TokenBucket(rate_per_slot)
        for pdf in batches:
            out = []
            for url in pdf[url_col]:
                t0 = time.monotonic()
                status, payload, error, attempts = 0, None, None, 0
                for attempt in range(1, max_retries + 1):
                    attempts = attempt
                    bucket.acquire()
                    try:
                        status, payload = fetcher(url)
                        if status == 429:  # backoff-and-retry (reddit.py:148)
                            time.sleep(backoff_s * attempt)
                            continue
                        error = None
                        break
                    except Exception as exc:  # noqa: BLE001 — error row, not task failure
                        error = f"{type(exc).__name__}: {exc}"
                        time.sleep(backoff_s * attempt)
                out.append(
                    (
                        url,
                        status,
                        payload,
                        error,
                        attempts,
                        int((time.monotonic() - t0) * 1000),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in FETCH_RESULT_SCHEMA.fields])

    return urls.select(url_col).mapInPandas(_run, schema=FETCH_RESULT_SCHEMA)
