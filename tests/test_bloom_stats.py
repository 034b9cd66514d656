"""Per-file bloom filters for equality skipping (bloom_cols), and the
read_pruned/MoR composition rule that delta-touched buckets bypass pruning.

Reference parity: manifest-level file skipping is the Iceberg/Parquet
bloom-filter story; correctness is pinned by full-scan differentials.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import (
    SET_COLS_COL,
    SnapshotTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
        T.StructField("txt", T.StringType()),
    ]
)


def _rows(n, base=0):
    return [(f"u{i}", base + i, f"t{i}") for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, val long, txt string")


def _batch(spark, rows, set_cols=None):
    df = spark.createDataFrame(rows, "url string, val long, txt string, __op string")
    if set_cols is None:
        return df.withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    return df.withColumn(SET_COLS_COL, F.array(*[F.lit(c) for c in set_cols]))


def test_bloom_zero_false_negatives_and_prunes(spark, tmpdir_path):
    t = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=8, bloom_cols=["val"]
    )
    rows = _rows(64)
    t.overwrite(_df(spark, rows))
    n_files = sum(len(ps) for ps in t.metadata()["buckets"].values())
    # every present value keeps its containing file (no false negatives)
    for _, v, _txt in rows[::7]:
        got = {(r.url, r.val) for r in t.read_pruned_eq(spark, "val", v).collect()}
        assert got == {(u, vv) for u, vv, _ in rows if vv == v}
    # an absent value prunes (m=4096, ~8 values/file: FP odds ~1e-5/file)
    kept, skipped = t.prune_files_eq(spark, "val", 10_000_000)
    assert skipped, "absent probe pruned nothing"
    assert len(kept) < n_files
    assert t.read_pruned_eq(spark, "val", 10_000_000).count() == 0
    # a present value prunes every file but (at FP odds) its own
    kept, skipped = t.prune_files_eq(spark, "val", rows[3][1])
    assert len(kept) <= 2 and skipped


def test_bloom_survives_merge_and_null_probe_rejected(spark, tmpdir_path):
    t = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=8, bloom_cols=["val"]
    )
    t.overwrite(_df(spark, _rows(64)))
    # update ONE key: its bucket's file is rewritten with a fresh bloom,
    # untouched files carry their blooms forward
    t.merge(spark, _batch(spark, [("u3", 9999, "t3b", "u")]), batch_id="b1")
    got = {(r.url, r.val) for r in t.read_pruned_eq(spark, "val", 9999).collect()}
    assert got == {("u3", 9999)}
    assert t.read_pruned_eq(spark, "val", 3).count() == 0  # old value gone
    # untouched values still probe correctly through carried-forward blooms
    got = {(r.url, r.val) for r in t.read_pruned_eq(spark, "val", 17).collect()}
    assert got == {("u17", 17)}
    with pytest.raises(ValueError, match="non-null"):
        t.prune_files_eq(spark, "val", None)


def test_bloom_rename_aware(spark, tmpdir_path):
    t = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4, bloom_cols=["val"]
    )
    t.overwrite(_df(spark, _rows(32)))
    t.rename_column("val", "score")
    # files written pre-rename carry blooms under the old physical name;
    # the alias chain resolves them for the new logical name
    got = {(r.url, r.score) for r in t.read_pruned_eq(spark, "score", 11).collect()}
    assert got == {("u11", 11)}
    _, skipped = t.prune_files_eq(spark, "score", 10_000_000)
    assert skipped


def test_no_bloom_recorded_keeps_everything(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4)
    t.overwrite(_df(spark, _rows(16)))
    kept, skipped = t.prune_files_eq(spark, "val", 12345)
    assert not skipped and kept
    assert t.read_pruned_eq(spark, "val", 5).count() == 1


def test_read_pruned_partial_update_into_range(spark, tmpdir_path):
    """Regression: a MoR partial update moves a row INTO the predicate
    range while its other columns live only in a base file that min/max
    pruning would skip — the fold must still see the base image (dirty
    buckets bypass pruning), not fabricate NULLs."""
    t = SnapshotTable.create(
        f"{tmpdir_path}/t",
        SCHEMA,
        ["url"],
        n_buckets=4,
        stats_cols=["val"],
        merge_mode="mor",
    )
    t.overwrite(_df(spark, _rows(32, base=1000)))  # all val in [1000, 1031]
    t.merge(spark, _batch(spark, [("u5", 5, None, "u")], set_cols=["val"]), batch_id="b1")
    rows = t.read_pruned(spark, "val", 0, 10).collect()
    assert [(r.url, r.val, r.txt) for r in rows] == [("u5", 5, "t5")]
    # and the bloom twin of the same rule
    t2 = SnapshotTable.create(
        f"{tmpdir_path}/t2",
        SCHEMA,
        ["url"],
        n_buckets=4,
        bloom_cols=["val"],
        merge_mode="mor",
    )
    t2.overwrite(_df(spark, _rows(32, base=1000)))
    t2.merge(spark, _batch(spark, [("u5", 5, None, "u")], set_cols=["val"]), batch_id="b1")
    rows = t2.read_pruned_eq(spark, "val", 5).collect()
    assert [(r.url, r.val, r.txt) for r in rows] == [("u5", 5, "t5")]
