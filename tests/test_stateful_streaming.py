"""Stateful streaming compaction (streaming/stateful.py).

The operator's contract has two halves:
- the FINAL per-key image is invariant to trigger slicing and equals the
  batch argmax (differential oracle here; DuckDB oracle via the
  ``st_latest_per_key`` entry),
- the EMISSION LOG is monotone per key: a trigger emits at most one row
  per key, never an image older than one already emitted, and carries a
  cumulative change counter.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.streaming.stateful import (
    latest_per_key_stateful,
    run_compaction_to_memory,
)

SCHEMA = "k bigint, ord bigint, payload string"


def _rows(spec):
    """spec: list of (k, ord) -> rows with payload 'p<k>-<ord>'."""
    return [(k, o, f"p{k}-{o}") for k, o in spec]


def _write_trigger_files(spark, d, batches):
    """One parquet file per batch, mtimes strictly increasing so the file
    stream processes them in order with maxFilesPerTrigger=1."""
    os.makedirs(d, exist_ok=True)
    for i, spec in enumerate(batches):
        sub = os.path.join(d, f"stage-{i}")
        spark.createDataFrame(_rows(spec), SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"batch-{i}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    for i in range(len(batches)):
        import shutil

        shutil.rmtree(os.path.join(d, f"stage-{i}"), ignore_errors=True)


def _compact(spark, src_dir, max_files=1):
    schema = spark.createDataFrame(_rows([(0, 0)]), SCHEMA).schema
    return run_compaction_to_memory(
        spark,
        src_dir,
        schema,
        key_cols=["k"],
        order_col="ord",
        payload_cols=["k", "ord", "payload"],
        max_files_per_trigger=max_files,
        query_name=f"t_{uuid.uuid4().hex[:10]}",
    )


def _final_image(emissions):
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.col("ord").desc())
    return {
        (r["k"], r["ord"], r["payload"])
        for r in emissions.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("k", "ord", "payload")
        .collect()
    }


def test_final_image_invariant_to_trigger_slicing(spark, tmpdir_path):
    """Same rows, three slicings (1 / 3 / 6 triggers) -> identical final
    per-key image, equal to the batch argmax."""
    import random

    rng = random.Random(7)
    spec = [(k, o) for k in range(12) for o in rng.sample(range(1000), 15)]
    rng.shuffle(spec)
    expected = {}
    for k, o in spec:
        if k not in expected or o > expected[k]:
            expected[k] = o
    want = {(k, o, f"p{k}-{o}") for k, o in expected.items()}

    for n_batches in (1, 3, 6):
        d = os.path.join(tmpdir_path, f"s{n_batches}")
        step = (len(spec) + n_batches - 1) // n_batches
        batches = [spec[i * step : (i + 1) * step] for i in range(n_batches)]
        _write_trigger_files(spark, d, batches)
        got = _final_image(_compact(spark, d))
        assert got == want, f"slicing {n_batches}"


def test_stale_trigger_suppressed_and_fresh_key_emitted(spark, tmpdir_path):
    """Trigger 2 carries only stale rows for k=1 (already superseded in
    trigger 1) -> no second emission for k=1; a brand-new key in trigger 2
    emits normally."""
    d = os.path.join(tmpdir_path, "s")
    _write_trigger_files(
        spark,
        d,
        [
            [(1, 10), (1, 4)],  # trigger 0: k1 up to ord 10
            [(1, 5), (1, 9), (2, 7)],  # trigger 1: k1 all stale, k2 fresh
        ],
    )
    em = _compact(spark, d).collect()
    k1 = [r for r in em if r["k"] == 1]
    k2 = [r for r in em if r["k"] == 2]
    assert len(k1) == 1 and k1[0]["ord"] == 10 and k1[0]["n_changes"] == 2
    assert len(k2) == 1 and k2[0]["ord"] == 7 and k2[0]["n_changes"] == 1


def test_counter_cumulative_across_triggers_including_stale(spark, tmpdir_path):
    """n_changes on a later emission counts every absorbed row — including
    stale rows from suppressed triggers in between."""
    d = os.path.join(tmpdir_path, "s")
    _write_trigger_files(
        spark,
        d,
        [
            [(1, 10), (1, 2)],  # emit ord 10, n=2
            [(1, 3)],  # stale, suppressed, absorbed (n=3)
            [(1, 20), (1, 15)],  # emit ord 20, n=5
        ],
    )
    em = sorted(_compact(spark, d).collect(), key=lambda r: r["ord"])
    assert [(r["ord"], r["n_changes"]) for r in em] == [(10, 2), (20, 5)]


def test_duplicate_redelivery_is_idempotent(spark, tmpdir_path):
    """Redelivering the current high-water row (at-least-once upstream)
    does not re-emit it."""
    d = os.path.join(tmpdir_path, "s")
    _write_trigger_files(spark, d, [[(1, 10)], [(1, 10)]])
    em = _compact(spark, d).collect()
    assert len(em) == 1 and em[0]["ord"] == 10


def test_batch_boundary_differential_vs_a05_semantics(spark, tmpdir_path):
    """The streaming compactor's final image over the sf0.001 events table
    equals the batch latest-per-key (the a05 family's window argmax) —
    the same differential the driver's DuckDB oracle runs at sf0.01."""
    from logminer_kafka_connect_spark.entry_queries import QUERIES

    res = QUERIES["st_latest_per_key"](spark, "/root/testdata/sf0.001")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    want = (
        ev.select("user_id", "event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert res.count() == want.count()
    assert res.exceptAll(want).count() == 0 and want.exceptAll(res).count() == 0


def test_streaming_plan_uses_state_store(spark, tmpdir_path):
    """The physical plan actually goes through FlatMapGroupsInPandasWithState
    (a real stateful operator, not a re-aggregation)."""
    d = os.path.join(tmpdir_path, "s")
    _write_trigger_files(spark, d, [[(1, 1)]])
    schema = spark.createDataFrame(_rows([(0, 0)]), SCHEMA).schema
    stream = spark.readStream.schema(schema).parquet(d)
    compacted = latest_per_key_stateful(stream, ["k"], "ord", ["k", "ord", "payload"])
    assert compacted.isStreaming
    plan = compacted._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in plan


# ---------------------------------------------------------------------------
# dropDuplicatesWithinWatermark redelivery guard
# ---------------------------------------------------------------------------
def test_dedup_within_watermark_drops_redelivered_events(spark, tmpdir_path):
    """Redeliveries of the same (k, ord) across triggers are absorbed;
    distinct orderings for a key all pass (it is an event dedup, not a
    key compactor)."""
    from datetime import datetime, timedelta

    from logminer_kafka_connect_spark.streaming.stateful import dedup_within_watermark

    d = os.path.join(tmpdir_path, "dedup-src")
    os.makedirs(d, exist_ok=True)
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    ts_schema = "k long, ord long, ts timestamp"

    def write_batch(i, rows):
        sub = os.path.join(d, f"stage-{i}")
        spark.createDataFrame(rows, ts_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sub)
        part = [f for f in os.listdir(sub) if f.endswith(".parquet")][0]
        dst = os.path.join(d, f"batch-{i}.parquet")
        os.rename(os.path.join(sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        import shutil

        shutil.rmtree(sub, ignore_errors=True)

    # trigger 0: two events + one intra-trigger duplicate
    write_batch(0, [(1, 10, t0), (1, 10, t0), (2, 20, t0 + timedelta(seconds=1))])
    # trigger 1: cross-trigger redelivery of (1,10) + a genuinely new ord
    write_batch(1, [(1, 10, t0), (1, 11, t0 + timedelta(seconds=2))])

    stream = (
        spark.readStream.schema(ts_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    deduped = dedup_within_watermark(stream, ["k", "ord"], "ts", "10 minutes")
    name = f"dd_{uuid.uuid4().hex[:10]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["ord"]) for r in spark.sql(f"select * from {name}").collect()
    )
    assert got == [(1, 10), (1, 11), (2, 20)]

    sq_plan = deduped._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in sq_plan
