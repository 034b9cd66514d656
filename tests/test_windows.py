"""Event-time windowed aggregation (T10): batch/streaming parity, window
finalization under availableNow, and watermark late-data drop."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.streaming.windows import (
    run_windowed_stats_to_memory,
    session_event_stats,
    windowed_event_stats,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "ts timestamp, event_type string, value double"


def _ev(minute: float, etype: str = "click", value: float = 1.0):
    return (T0 + timedelta(minutes=minute), etype, value)


def _write_trigger_files(spark, d, batches):
    """One parquet file per trigger, mtimes strictly increasing (mirrors
    tests/test_stateful_streaming.py)."""
    import shutil

    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        sub = os.path.join(d, f"stage-{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"batch-{i}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        shutil.rmtree(sub, ignore_errors=True)


def _key(r):
    return (r["window_start"], r["event_type"])


def test_batch_tumbling_handcrafted(spark):
    rows = [_ev(1), _ev(2, value=3.0), _ev(61), _ev(1, "view", 10.0)]
    out = windowed_event_stats(
        spark.createDataFrame(rows, SCHEMA), window="1 hour", watermark="1 hour"
    ).collect()
    by = {_key(r): r for r in out}
    h0 = by[(T0, "click")]
    assert h0["n_events"] == 2 and h0["sum_value"] == 4.0
    assert h0["window_end"] == T0 + timedelta(hours=1)
    assert by[(T0 + timedelta(hours=1), "click")]["n_events"] == 1
    assert by[(T0, "view")]["sum_value"] == 10.0
    assert len(out) == 3


def test_batch_sliding_windows(spark):
    """slide < window: each event lands in window/slide windows."""
    rows = [_ev(45)]  # 00:45
    out = windowed_event_stats(
        spark.createDataFrame(rows, SCHEMA), window="1 hour", slide="30 minutes"
    ).collect()
    starts = sorted(r["window_start"] for r in out)
    assert starts == [T0 - timedelta(minutes=0), T0 + timedelta(minutes=30)]
    assert all(r["n_events"] == 1 for r in out)


def test_streaming_matches_batch_for_finalized_windows(spark, tmpdir_path):
    """Append mode emits exactly the windows the watermark has passed, with
    values identical to the batch computation; trailing open windows are
    withheld (that is the exactly-once append contract, not data loss)."""
    batches = [
        [_ev(1), _ev(2, "view", 5.0), _ev(31)],
        [_ev(62), _ev(65, "view", 2.0)],
        [_ev(200)],  # advances watermark far past hours 0-1
    ]
    d = os.path.join(tmpdir_path, "ev")
    _write_trigger_files(spark, d, batches)
    schema = spark.createDataFrame([_ev(0)], SCHEMA).schema
    got = run_windowed_stats_to_memory(
        spark, d, schema, name="w_parity", max_files=1,
        window="1 hour", watermark="10 minutes",
    ).collect()
    all_rows = [r for rows in batches for r in rows]
    batch = windowed_event_stats(
        spark.createDataFrame(all_rows, SCHEMA), window="1 hour"
    ).collect()
    # final watermark = max ts (03:20) - 10 min => hours 0,1,2 finalized
    finalized = {_key(r): tuple(r) for r in batch if r["window_end"] <= T0 + timedelta(minutes=190)}
    assert {_key(r): tuple(r) for r in got} == finalized
    assert len(got) == 4  # (h0 click x2 merged, h0 view, h1 click x2 merged... ) sanity below
    assert {r["n_events"] for r in got if r["event_type"] == "click"} <= {1, 2}


def test_watermark_drops_late_rows(spark, tmpdir_path):
    """A row arriving after its window was finalized (evicted + emitted) is
    dropped from the stream but present in batch — the late-data contract.
    Watermark mechanics observed on Spark 4.1 (and pinned here): the
    watermark used by trigger N is max event time through trigger N-1
    minus the delay, and a window is evicted at the end of the first
    trigger that runs with watermark past its end — so data arriving
    within one trigger of the watermark crossing may still be aggregated
    (Spark documents late drop as best-effort); data arriving after the
    eviction trigger is reliably dropped."""
    on_time = [_ev(1), _ev(2)]
    advance = [_ev(120)]  # next trigger's watermark -> 01:50
    evict = [_ev(240)]  # hour-0 evicted+emitted during this trigger
    late = [_ev(5, value=100.0)]  # belongs to hour 0, arrives after eviction
    flush = [_ev(600)]
    d = os.path.join(tmpdir_path, "late")
    _write_trigger_files(spark, d, [on_time, advance, evict, late, flush])
    schema = spark.createDataFrame([_ev(0)], SCHEMA).schema
    got = run_windowed_stats_to_memory(
        spark, d, schema, name="w_late", max_files=1,
        window="1 hour", watermark="10 minutes",
    ).collect()
    h0 = [r for r in got if r["window_start"] == T0]
    assert len(h0) == 1
    assert h0[0]["n_events"] == 2 and h0[0]["sum_value"] == 2.0  # late row dropped
    batch = windowed_event_stats(
        spark.createDataFrame(on_time + advance + evict + late + flush, SCHEMA),
        window="1 hour",
    ).collect()
    bh0 = [r for r in batch if r["window_start"] == T0][0]
    assert bh0["n_events"] == 3 and bh0["sum_value"] == 102.0  # batch sees it


def test_slicing_invariance_of_finalized_windows(spark, tmpdir_path):
    """Same data, 1 trigger vs per-file triggers: identical finalized set."""
    batches = [[_ev(i, "click", float(i)) for i in range(0, 90, 7)], [_ev(240)]]
    d1, d2 = os.path.join(tmpdir_path, "a"), os.path.join(tmpdir_path, "b")
    _write_trigger_files(spark, d1, batches)
    _write_trigger_files(spark, d2, batches)
    schema = spark.createDataFrame([_ev(0)], SCHEMA).schema
    one = run_windowed_stats_to_memory(
        spark, d1, schema, name="w_one", max_files=None,
        window="1 hour", watermark="10 minutes",
    ).collect()
    many = run_windowed_stats_to_memory(
        spark, d2, schema, name="w_many", max_files=1,
        window="1 hour", watermark="10 minutes",
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_streaming_plan_is_stateful_event_time(spark, tmpdir_path):
    d = os.path.join(tmpdir_path, "p")
    _write_trigger_files(spark, d, [[_ev(1)]])
    schema = spark.createDataFrame([_ev(0)], SCHEMA).schema
    stream = windowed_event_stats(spark.readStream.schema(schema).parquet(d))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_batch_session_handcrafted_and_gap_boundary(spark):
    """Session semantics incl. the exact-gap boundary: Spark 4.1 MERGES an
    event landing precisely at prev_ts + gap (measured; the w27 oracle's
    break condition is therefore strictly-greater-than). Sessions close at
    last_ts + gap; groups sessionize independently."""
    rows = [
        _ev(0), _ev(30), _ev(45),      # 30 == gap exactly -> all one session
        _ev(76),                        # 31 > gap -> new session
        _ev(0, "view", 10.0), _ev(120, "view", 5.0),  # separate group, 2 sessions
    ]
    out = session_event_stats(
        spark.createDataFrame(rows, SCHEMA), gap="30 minutes"
    ).collect()
    by = {(r["session_start"], r["event_type"]): r for r in out}
    s0 = by[(T0, "click")]
    assert s0["n_events"] == 3 and s0["session_end"] == T0 + timedelta(minutes=75)
    s1 = by[(T0 + timedelta(minutes=76), "click")]
    assert s1["n_events"] == 1 and s1["session_end"] == T0 + timedelta(minutes=106)
    assert by[(T0, "view")]["n_events"] == 1
    assert by[(T0 + timedelta(minutes=120), "view")]["sum_value"] == 5.0
    assert len(out) == 4


def test_streaming_sessions_match_batch_for_finalized(spark, tmpdir_path):
    """Append-mode sessionization emits a session only once the watermark
    passes last_ts + gap (a session's end MOVES while events arrive, so
    finalization must wait for the gap to provably close); values equal
    the batch twin's."""
    batches = [
        [_ev(1), _ev(10), _ev(2, "view", 5.0)],
        [_ev(20), _ev(90)],  # 20 extends the first session; 90 starts another
        [_ev(600)],  # advances watermark far past everything before it
    ]
    d = os.path.join(tmpdir_path, "sess")
    _write_trigger_files(spark, d, batches)
    schema = spark.createDataFrame([_ev(0)], SCHEMA).schema
    got = run_windowed_stats_to_memory(
        spark, d, schema, name="w_sess", max_files=1,
        agg_fn=session_event_stats, gap="30 minutes", watermark="10 minutes",
    ).collect()
    all_rows = [r for rows in batches for r in rows]
    batch = session_event_stats(
        spark.createDataFrame(all_rows, SCHEMA), gap="30 minutes"
    ).collect()
    # final watermark = 10:00 - 10min => everything but the 600' session final
    finalized = {
        (r["session_start"], r["event_type"]): tuple(r)
        for r in batch
        if r["session_end"] <= T0 + timedelta(minutes=590)
    }
    assert {(r["session_start"], r["event_type"]): tuple(r) for r in got} == finalized
    by = {(r["session_start"], r["event_type"]): r for r in got}
    s0 = by[(T0 + timedelta(minutes=1), "click")]
    # events at 1,10,20 merged ACROSS triggers (state carried the open
    # session over the trigger boundary), closed at 20+30
    assert s0["n_events"] == 3 and s0["session_end"] == T0 + timedelta(minutes=50)


def test_w26_matches_duckdb_oracle(spark):
    import duckdb

    from logminer_kafka_connect_spark.entry_queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in QUERIES["w26_event_windows"](spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = sorted(map(tuple, con.execute(ORACLES["w26_event_windows"]).fetchall()))
    assert got == exp and len(got) > 100


def test_w27_matches_duckdb_oracle(spark):
    import duckdb

    from logminer_kafka_connect_spark.entry_queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in QUERIES["w27_session_windows"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    exp = sorted(map(tuple, con.execute(ORACLES["w27_session_windows"]).fetchall()))
    assert got == exp and len(got) > 100
