"""Structured Streaming jobs over the events stream.

Beyond-reference surface (the reference is batch-only, README.md:50):
the same event analytics as ``events_batch.py``, expressed as real
incremental streams — file/Kafka source → watermark → windowed
aggregation → sink. Each transform is a pure function over a
(possibly streaming) DataFrame so the logic is identical for batch
and stream; the batch twins are the DuckDB-gated correctness anchor,
and ``tests/test_streaming.py`` proves stream == batch on the same
data via ``trigger(availableNow=True)``.

Scale notes:

- Watermarks bound state: a 2-hour watermark on 1-hour tumbling
  windows keeps at most ~3 open windows per key group in the state
  store regardless of throughput.
- ``session_window`` is Spark's native gap-session operator — state
  merges adjacent windows per key; shuffle is on the grouping key
  only, identical to the batch sessionization shuffle shape.
- ``applyInPandasWithState`` shows the custom-stateful-operator
  escape hatch (running per-user totals with inactivity timeout) for
  semantics the built-in windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str,
                       max_files_per_trigger: int = 16) -> DataFrame:
    """File-source stream over an events directory (the local stand-in
    for a Kafka topic; swap ``format("kafka")`` + from_json for the
    real feed — every transform below is source-agnostic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


# ----------------------------------------------------------- transforms

def tumbling_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling windows per event type, late data bounded by
    the watermark. Batch twin: ``events_tumbling_hourly`` (F.window
    start == date_trunc('hour') for tumbling windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            ).alias("value_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "approx_users",
            (F.col("value_micros").cast("double") / F.lit(1000000.0)).alias(
                "total_value"
            ),
        )
    )


def sessionized(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Native gap-based session windows (30-min inactivity) per user.
    Batch twin: ``events_sessionized`` (LAG + running-sum formulation
    — same sessions, different mechanism)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            ).alias("value_micros"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            (F.col("value_micros").cast("double") / F.lit(1000000.0)).alias(
                "total_value"
            ),
        )
    )


# ------------------------------------------- custom stateful operator

_USER_TOTALS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_micros", T.LongType()),
    ]
)
_USER_TOTALS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_micros", T.LongType()),
    ]
)


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    running per-user event counts/value totals, emitted every
    micro-batch (update mode). The state store holds one fixed-size
    row per user — O(|users|) state, no per-event growth.

    The state function is a nested closure so cloudpickle ships it by
    value — executors can't import this package by name when the entry
    module is loaded by path."""

    def user_totals_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        (user_id,) = key
        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            micros += int((pdf["value"] * 1_000_000.0 + 0.5).floordiv(1).sum())
        state.update((n, micros))
        yield _pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "value_micros": [micros]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        user_totals_fn,
        outputStructType=_USER_TOTALS_OUT,
        stateStructType=_USER_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------------------------------------------------- sinks

def run_to_memory(df: DataFrame, name: str, checkpoint: str,
                  output_mode: str = "append") -> None:
    """Drain the whole backlog into an in-memory table (test/dev sink)
    with availableNow — processes all available data then stops."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet(df: DataFrame, path: str, checkpoint: str) -> None:
    """Production-shaped sink: append parquet with exactly-once
    checkpointing (swap for Delta/Kafka sink in a real deployment)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_purchase_join(events: DataFrame,
                        state_retention: str = "60 days") -> DataFrame:
    """STREAM-STREAM interval join: purchases matched to same-user
    clicks in the 15 minutes before, both sides streaming.

    This is the real Structured Streaming join state machine — each
    side buffers rows in the state store until the other side's
    matches arrive; the time-interval condition bounds how long.
    ``state_retention`` sets the watermark delay: on an unordered
    static backlog (availableNow over randomly-split files) the
    watermark after batch 1 would already be near the backlog's max
    timestamp and could evict state before cross-batch matches land,
    so the drain uses a delay longer than the data's whole span —
    results are then deterministic and complete. A live deployment
    sets this to the actual lateness bound (e.g. '30 minutes'), which
    caps state at O(events per 30 min) per side.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", state_retention)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", state_retention)
    )
    return purchases.join(
        clicks,
        F.expr(
            "c_user = user_id AND "
            "c_ts > ts - INTERVAL 15 MINUTES AND c_ts <= ts"
        ),
        "inner",
    )


def user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running per-user totals through ``transformWithState``
    (Spark 4's arbitrary-stateful-processing v2): a
    ``StatefulProcessor`` with one ValueState row per user, emitted in
    update mode each micro-batch. Functionally the twin of
    ``user_running_totals`` (applyInPandasWithState) — the v2 API adds
    composite state types, timers, and TTL on the RocksDB store; here
    it carries the identical O(|users|) fixed-size state so the same
    DuckDB oracle gates both.

    The processor CLASS is defined inside this function: cloudpickle
    serializes locally-defined classes by value, so executors never
    need to import this package (the entry module is loaded by file
    path).

    ENVIRONMENT GATE: the transformWithState state protocol speaks
    protobuf between the JVM and the Python driver worker; this
    container has no ``google.protobuf``, so the operator cannot
    execute here and is NOT registered as a driver query —
    tests/test_streaming.py covers it behind
    ``pytest.importorskip("google.protobuf")`` and asserts the query
    COMPILES (plan builds, state schema validates up to the proto
    import). On a standard cluster image (protobuf ships with every
    Spark 4 distro requirement set) the same code runs unchanged
    against the applyInPandasWithState twin's oracle."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    class UserTotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, vm BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            (user_id,) = key
            prev = self._agg.get() if self._agg.exists() else (0, 0)
            n, vm = int(prev[0]), int(prev[1])
            for pdf in rows:
                n += len(pdf)
                vm += int((pdf["value"] * 1_000_000.0 + 0.5).floordiv(1).sum())
            self._agg.update((n, vm))
            yield _pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "value_micros": [vm]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=_USER_TOTALS_OUT,
        outputMode="Update",
        timeMode="None",
    )
