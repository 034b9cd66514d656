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


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization (``F.session_window``) — the remaining
    event-time shape after w26's tumbling/sliding (r4 VERDICT Next #5): a
    session per group extends while consecutive events arrive within
    ``gap`` of the previous event — INCLUSIVE at exactly the gap (an
    event landing precisely at ``prev_ts + gap`` merges; measured on
    Spark 4.1, pinned in tests/test_windows.py) — and closes at
    ``last_ts + gap``.

    Unified batch/streaming like :func:`windowed_event_stats`. Fully
    SQL-expressible (lag/gap-sum sessionization), so the batch twin ships
    with a complete DuckDB oracle (``w27_session_windows``).

    100 TB shape: one shuffle keyed on the group columns; within a
    partition Spark sorts by event time and merges overlapping candidate
    sessions (no per-row Python). Streaming state is O(open sessions) and
    the watermark both bounds it and finalizes sessions for append mode —
    unlike fixed windows a session's end moves while events keep arriving,
    so emission waits until the watermark passes ``last_ts + gap``.

    Output: ``session_start, session_end, <group_cols...>, n_events,
    sum_value`` (sum rounded to 4 decimals — summation order must not
    leak into comparisons).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def run_windowed_stats_to_memory(
    spark,
    source_dir: str,
    schema,
    name: str = "windowed_stats",
    max_files: int | None = None,
    agg_fn=windowed_event_stats,
    **kw,
) -> DataFrame:
    """Drive ``agg_fn`` (:func:`windowed_event_stats` by default,
    :func:`session_event_stats` for sessionization) over a parquet file
    stream with ``Trigger.AvailableNow`` into a memory sink (append mode:
    each window emitted exactly once, after the watermark passes it).
    Returns the finalized-window table. Test/demo harness — production
    would write to a real sink with a checkpoint dir."""
    reader = spark.readStream.schema(schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = agg_fn(reader.parquet(source_dir), **kw)
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
