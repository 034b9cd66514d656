"""Event-time windowed aggregation with watermarks (T10 surface).

The reference connector is a source with no event-time windowing
(SURVEY.md §2.10 T10 "n/a") — this is beyond-reference surface for the
analytics consumers downstream of the CDC/event stream: per-window,
per-group activity stats that run identically as a batch query (full
DuckDB oracle, ``w26_event_windows``) and as a Structured Streaming query
(``withWatermark`` + windowed groupBy, append mode).

Late-data semantics are Spark's standard contract: a row older than the
watermark (max seen event time minus the delay) is dropped once its
window has been finalized; a window only emits after the watermark passes
its end, so each window is emitted exactly once (append mode) — pinned in
tests/test_windows.py including a late-file drop differential vs batch.

100 TB shape: one shuffle keyed on (window, group) with map-side partial
aggregation; streaming state is O(open windows x groups) and the
watermark bounds it — without a watermark the state store would grow
forever. All aggregates are algebraic (count/sum/min/max): no per-row
Python, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) event-time windows ×
    ``group_cols``: row counts and value sum/min/max.

    Unified batch/streaming: on a batch DataFrame this is a plain windowed
    aggregation (the watermark is irrelevant and skipped); on a streaming
    DataFrame the watermark bounds state and late data, and the result
    appends one finalized row per (window, group).

    Output: ``window_start, window_end, <group_cols...>, n_events,
    sum_value, min_value, max_value`` — sum rounded to 4 decimals so
    summation order (partial aggregation) can't leak into comparisons.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = (
        F.window(ts_col, window, slide) if slide is not None else F.window(ts_col, window)
    )
    return (
        src.groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def run_windowed_stats_to_memory(
    spark,
    source_dir: str,
    schema,
    name: str = "windowed_stats",
    max_files: int | None = None,
    **kw,
) -> DataFrame:
    """Drive :func:`windowed_event_stats` over a parquet file stream with
    ``Trigger.AvailableNow`` into a memory sink (append mode: each window
    emitted exactly once, after the watermark passes it). Returns the
    finalized-window table. Test/demo harness — production would write to
    a real sink with a checkpoint dir."""
    reader = spark.readStream.schema(schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = windowed_event_stats(reader.parquet(source_dir), **kw)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
