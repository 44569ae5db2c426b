"""Event-time analytics — windowed aggregation shapes that run batch OR stream.

The reference has no streaming windows (SURVEY.md §2.E/I: none exist anywhere
in ``/root/reference``); these are the beyond-reference extensions the driver's
``events`` fixture exists for. Each aggregation is written once as a
DataFrame-in/DataFrame-out function: applied to a batch DataFrame it is an
ordinary windowed groupBy; applied to a ``readStream`` DataFrame the identical
expression becomes an incremental stateful plan (``withWatermark`` is a no-op
on batch, the state-store bound on streams).

Scale notes: event-time windows shuffle on (window, key) — at 100 TB the
watermark bounds state-store size, and slide/gap choices set the state-row
multiplier (a 1h/15m sliding window holds 4 open windows per key). The
stateful sessionizer uses ``applyInPandasWithState`` with a per-user timeout —
state is partitioned by user_id, so it scales horizontally with executors.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from server2_vector_search_server_spark.plans.registry import exact_sum


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window: count + exact value sum per (window, type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             exact_sum(F.col("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """Sliding event-time window (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session extends while consecutive events
    arrive within ``gap``; window end = last event + gap (Spark semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             exact_sum(F.col("value"), 2).alias("total_value"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events", "total_value")
    )


# --- custom stateful operator (applyInPandasWithState) ----------------------

RUNNING_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("value_cents", T.LongType()),
])

RUNNING_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _running_totals(key, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterable[pd.DataFrame]:
    """Per-user running (count, exact sum) across micro-batches — the
    minimal custom stateful operator: state survives between triggers,
    keyed and partitioned by user_id.

    The sum is held as scaled-integer cents so accumulation is associative
    and order-free (bit-identical to the batch aggregate, hence
    oracle-checkable). Rounding is half-away-from-zero via
    sign·floor(|x|+0.5) — matching Spark/DuckDB ROUND for BOTH signs, and
    NEVER Python/numpy round(), which is banker's."""
    import numpy as np

    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        scaled = pdf["value"].to_numpy() * 100.0
        cents += int((np.sign(scaled) * np.floor(np.abs(scaled) + 0.5))
                     .astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [cents / 100.0]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful aggregation over a stream: per-user cumulative
    count/sum emitted every micro-batch (SURVEY.md §2.I custom-stateful
    extension; streaming-only — Spark rejects this on batch DataFrames)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
