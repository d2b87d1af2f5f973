"""Fetch-stage tests: retries/backoff, 429 handling, error rows
instead of task failures, rate limiting (S1-S5/S10-S13 transport)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.sources.fetch import fetch_stage


def test_fetch_success_and_error_rows(spark):
    def fetcher(url):
        if url.endswith("bad"):
            raise ConnectionError("refused")
        return 200, f"body-of-{url}"

    urls = spark.createDataFrame([("http://a",), ("http://bad",)], ["url"])
    rows = {r.url: r for r in fetch_stage(urls, fetcher, max_retries=2, backoff_s=0.0).collect()}
    assert rows["http://a"].status == 200
    assert rows["http://a"].payload == "body-of-http://a"
    assert rows["http://a"].attempts == 1
    assert rows["http://bad"].error.startswith("ConnectionError")
    assert rows["http://bad"].attempts == 2  # retried, then gave up as a row


def test_fetch_429_backoff_retry(spark):
    calls = {"n": 0}

    def fetcher(url):
        calls["n"] += 1
        return (429, "") if calls["n"] < 3 else (200, "finally")

    urls = spark.createDataFrame([("http://throttled",)], ["url"])
    # Single partition so the closure's counter is one worker's.
    row = fetch_stage(
        urls.coalesce(1), fetcher, max_retries=5, backoff_s=0.0
    ).collect()[0]
    assert row.status == 200 and row.payload == "finally"
    assert row.attempts == 3


def test_fetch_rate_limit_spacing(spark):
    def fetcher(url):
        return 200, "ok"

    urls = spark.createDataFrame([(f"http://u{i}",) for i in range(5)], ["url"])
    t0 = time.monotonic()
    out = fetch_stage(urls.coalesce(1), fetcher, rate_per_slot=50.0).collect()
    elapsed = time.monotonic() - t0
    assert len(out) == 5
    # 5 requests at 50 req/s on one slot >= ~80ms of enforced spacing.
    assert elapsed >= 0.07


def test_live_transport_is_opt_in(spark):
    """No injected fetcher and no DSS_SPARK_LIVE_FETCH=1 must raise at
    plan-build time — a batch/CI caller never silently starts real
    HTTP GETs from executors."""
    import os

    import pytest

    urls = spark.createDataFrame([("http://127.0.0.1:9/x",)], ["url"])
    assert os.environ.get("DSS_SPARK_LIVE_FETCH") != "1"
    with pytest.raises(ValueError, match="DSS_SPARK_LIVE_FETCH"):
        fetch_stage(urls)


def test_default_urllib_transport_against_local_server(spark, monkeypatch):
    """The DEFAULT transport (opted in via DSS_SPARK_LIVE_FETCH=1, no
    injected fetcher) exercised end-to-end against an in-process HTTP
    server: success body, 404 returned as a status row (not an
    exception), 429-then-200 retry recovery, and a refused-connection
    error row."""
    import http.server
    import threading

    monkeypatch.setenv("DSS_SPARK_LIVE_FETCH", "1")

    hits = {"n429": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ok":
                body = b"hello-from-server"
                self.send_response(200)
            elif self.path == "/flaky":
                hits["n429"] += 1
                if hits["n429"] < 3:
                    body = b"slow down"
                    self.send_response(429)
                else:
                    body = b"recovered"
                    self.send_response(200)
            else:
                body = b"nope"
                self.send_response(404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # keep test output quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        urls = spark.createDataFrame(
            [(f"{base}/ok",), (f"{base}/missing",), (f"{base}/flaky",),
             ("http://127.0.0.1:9/refused",)],
            ["url"],
        )
        # Single partition: the flaky counter needs ordered hits.
        rows = {
            r.url.rsplit("/", 1)[-1]: r
            for r in fetch_stage(
                urls.coalesce(1), max_retries=4, backoff_s=0.0
            ).collect()
        }
    finally:
        srv.shutdown()
        srv.server_close()
    assert rows["ok"].status == 200
    assert rows["ok"].payload == "hello-from-server"
    assert rows["missing"].status == 404 and rows["missing"].error is None
    assert rows["flaky"].status == 200 and rows["flaky"].payload == "recovered"
    assert rows["flaky"].attempts == 3
    assert rows["refused"].error is not None and rows["refused"].attempts == 4
