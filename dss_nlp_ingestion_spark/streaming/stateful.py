"""Custom stateful streaming operator: exact Redis-``tryAdd`` dedup
(SURVEY.md §2.12 "stateful dedup with TTL") via
``applyInPandasWithState``.

Semantics — byte-for-byte with src/historydb/redislease.py:60-79 +
src/base.py:210-218:

  tryAdd(id) at time t: if no *accepted* sighting of id exists within
  the last TTL, accept and remember t; else reject. Crucially a
  REJECTED sighting does NOT refresh the clock (tryAdd only SETEXes
  when absent), so after first-accept at t0, every sighting in
  (t0, t0+TTL) is rejected and one at >= t0+TTL is accepted again.

That accept-anchored semantics is not expressible with a lag window
(the batch form in ``operators.relational.ttl_dedup`` is the
renewal-anchored approximation, documented there); it needs per-key
running state — exactly what ``applyInPandasWithState`` provides:
state is the last *accepted* timestamp per key, partitioned by key
across executors, evicted by the event-time watermark.

``accepted_tryadd_pandas`` is the same algorithm over a sorted batch
— the hermetic oracle used by both the streaming tests and batch
callers that want exact semantics via ``applyInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRYADD_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

TRYADD_STATE_SCHEMA = StructType([StructField("last_accept_ms", LongType())])


def accepted_tryadd_pandas(
    events: pd.DataFrame, ttl_ms: int, last_accept_ms: int | None = None
) -> tuple[pd.DataFrame, int | None]:
    """Run exact tryAdd over a time-sorted frame with columns
    (key, event_id, ts); returns (accepted rows, new last-accept).

    The accept-anchored renewal is inherently sequential, but the
    scan runs over a bare int64 array — ``iterrows`` (row-at-a-time
    Series construction) measured ~20x slower on the same frames."""
    events = events.sort_values(["ts", "event_id"])
    ts_ms = events["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
    keep = [False] * len(ts_ms)
    for i, t_ms in enumerate(ts_ms):
        if last_accept_ms is None or t_ms - last_accept_ms >= ttl_ms:
            keep[i] = True
            last_accept_ms = int(t_ms)
    return events.iloc[[i for i, k in enumerate(keep) if k]], last_accept_ms


def tryadd_dedup_stream(
    stream: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    id_col: str = "event_id",
    ttl: str = "7 days",
    ttl_ms: int = 604_800_000,
) -> DataFrame:
    """Watermarked exact-tryAdd dedup: one state row (last accepted
    ms) per key; emits accepted sightings only."""

    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=False)
        batch = batch.rename(columns={key_col: "key", id_col: "event_id", ts_col: "ts"})
        accepted, last = accepted_tryadd_pandas(batch, ttl_ms, last)
        if last is not None:
            state.update((int(last),))
        yield accepted[["key", "event_id", "ts"]]

    return (
        stream.withWatermark(ts_col, ttl)
        .groupBy(key_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=TRYADD_OUTPUT_SCHEMA,
            stateStructType=TRYADD_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class TryAddProcessor:
    """Spark 4 ``transformWithStateInPandas`` form of the exact
    tryAdd dedup — same accept-anchored semantics as
    :func:`tryadd_dedup_stream`, on the typed-state API (ValueState
    per key instead of the GroupState tuple).  Requires the RocksDB
    state store provider."""

    def init(self, handle) -> None:
        self._last = handle.getValueState("last_accept_ms", TRYADD_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        last = self._last.get()[0] if self._last.exists() else None
        batch = pd.concat(list(rows), ignore_index=False)
        accepted, last = accepted_tryadd_pandas(batch, 604_800_000, last)
        if last is not None:
            self._last.update((int(last),))
        yield accepted[["key", "event_id", "ts"]]

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def tryadd_dedup_stream_tws(
    stream,
    key_col: str = "key",
    ts_col: str = "ts",
    ttl: str = "7 days",
):
    """Exact tryAdd through ``transformWithStateInPandas`` (the
    Spark 4 replacement for applyInPandasWithState): same output as
    :func:`tryadd_dedup_stream`, state managed by the typed handle
    and evicted with the stream."""
    from pyspark.sql.streaming import StatefulProcessor  # noqa: F401

    return (
        stream.withWatermark(ts_col, ttl)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=TryAddProcessor(),
            outputStructType=TRYADD_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
