"""CLI smoke tests (no Spark session needed for the metadata paths)."""

from __future__ import annotations

from dss_nlp_ingestion_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary  [oracle]" in out
    assert "streaming_hourly_counts  [oracle]" in out


def test_cli_unknown_query(capsys):
    assert main(["nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
