"""Metadata-only DROP COLUMN and snapshot rollback (bad-batch recovery).

Reference parity: schema evolution tests extend the T9 family
(ChangingTableTest.kt analogs); rollback is the Iceberg
rollback_to_snapshot operation applied to the CDC exactly-once state.
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


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, val long, txt string")


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, val long, txt string, __op string"
    ).withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))


def test_drop_column_is_metadata_only_and_no_resurrection(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4)
    t.overwrite(_df(spark, [("a", 1, "xa"), ("b", 2, "xb")]))
    files_before = sorted(
        p for ps in t.metadata()["buckets"].values() for p in ps
    )
    t.drop_column("txt")
    assert sorted(
        p for ps in t.metadata()["buckets"].values() for p in ps
    ) == files_before  # no rewrite
    assert t.read(spark).columns == ["url", "val"]
    # time travel BEFORE the drop still sees the column
    assert "txt" in t.read(spark, version=1).columns
    # re-adding the same name must NOT resurrect pre-drop bytes
    t.add_column("txt", T.StringType(), default="fresh")
    rows = {(r.url, r.txt) for r in t.read(spark).collect()}
    assert rows == {("a", "fresh"), ("b", "fresh")}
    # merges keep working against the evolved schema
    t.merge(spark, _batch(spark, [("c", 3, "xc", "u")]), batch_id="b1")
    rows = {(r.url, r.txt) for r in t.read(spark).collect()}
    assert rows == {("a", "fresh"), ("b", "fresh"), ("c", "xc")}


def test_drop_column_validation(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=2)
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("url")
    v = t.current_version()
    assert t.drop_column("never_existed") == v  # idempotent no-op


def test_drop_renamed_column_and_reuse_of_old_name(spark, tmpdir_path):
    """rename val->score, add a NEW column val, then drop score: the new
    val column must keep ITS values (old physical 'val' bytes stay mapped
    away by the kept rename pair)."""
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=2)
    t.overwrite(_df(spark, [("a", 1, "xa")]))
    t.rename_column("val", "score")
    t.add_column("val", T.LongType(), default=99)
    t.drop_column("score")
    r = t.read(spark).collect()[0]
    assert r.val == 99  # not the pre-rename physical val (1)
    assert "score" not in t.read(spark).columns


def test_rollback_restores_state_and_exactly_once(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4)
    t.overwrite(_df(spark, [("a", 1, "xa")]), batch_id="b0")
    t.merge(spark, _batch(spark, [("b", 2, "xb", "u")]), batch_id="b1")
    v_good = t.current_version()
    t.merge(spark, _batch(spark, [("a", 666, "POISON", "u")]), batch_id="b2")
    assert t.is_applied("b2")
    t.rollback_to(v_good)
    rows = {(r.url, r.val, r.txt) for r in t.read(spark).collect()}
    assert rows == {("a", 1, "xa"), ("b", 2, "xb")}
    # the poisoned batch id is no longer applied -> the corrected batch lands
    assert not t.is_applied("b2")
    t.merge(spark, _batch(spark, [("a", 10, "fixed", "u")]), batch_id="b2")
    rows = {(r.url, r.val, r.txt) for r in t.read(spark).collect()}
    assert rows == {("a", 10, "fixed"), ("b", 2, "xb")}
    # history preserved: the poisoned version is still readable
    assert {
        (r.url, r.txt) for r in t.read(spark, version=v_good + 1).collect()
    } == {("a", "POISON"), ("b", "xb")}


def test_rollback_mor_restores_outstanding_deltas(spark, tmpdir_path):
    t = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4, merge_mode="mor"
    )
    t.overwrite(_df(spark, [("a", 1, "xa")]))
    t.merge(spark, _batch(spark, [("b", 2, "xb", "u")]), batch_id="b1")
    v_delta = t.current_version()
    t.compact(spark)
    t.merge(spark, _batch(spark, [("c", 3, "xc", "u")]), batch_id="b2")
    t.rollback_to(v_delta)
    assert t.delta_depth() == 1  # the v_delta-era delta is outstanding again
    rows = {(r.url, r.val) for r in t.read(spark).collect()}
    assert rows == {("a", 1), ("b", 2)}


def test_rollback_to_expired_version_refuses(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=2)
    t.overwrite(_df(spark, [("a", 1, "xa")]))
    v1 = t.current_version()
    t.overwrite(_df(spark, [("b", 2, "xb")]))  # supersedes every v1 file
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        t.rollback_to(v1)


def test_alter_column_type_widening(spark, tmpdir_path):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("n", T.IntegerType()),
        ]
    )
    t = SnapshotTable.create(
        f"{tmpdir_path}/t", schema, ["url"], n_buckets=2, bloom_cols=["n"]
    )
    t.overwrite(
        spark.createDataFrame([("a", 1), ("b", 2147483647)], "url string, n int")
    )
    t.alter_column_type("n", T.LongType())
    df = t.read(spark)
    assert dict(df.dtypes)["n"] == "bigint"
    assert {(r.url, r.n) for r in df.collect()} == {("a", 1), ("b", 2147483647)}
    # old int-typed blooms were dropped (hash is type-sensitive): probes
    # keep every file rather than risk a false negative
    kept, skipped = t.prune_files_eq(spark, "n", 1)
    assert not skipped
    # post-widen writes exercise long values and re-record blooms
    b = spark.createDataFrame(
        [("c", 5_000_000_000, "u")], "url string, n long, __op string"
    ).withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    t.merge(spark, b, batch_id="b1")
    assert {(r.url, r.n) for r in t.read(spark).collect()} == {
        ("a", 1),
        ("b", 2147483647),
        ("c", 5_000_000_000),
    }
    got = {(r.url, r.n) for r in t.read_pruned_eq(spark, "n", 5_000_000_000).collect()}
    assert got == {("c", 5_000_000_000)}


def test_alter_column_type_refusals(spark, tmpdir_path):
    t = SnapshotTable.create(f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=2)
    with pytest.raises(ValueError, match="key column"):
        t.alter_column_type("url", T.BinaryType())
    with pytest.raises(ValueError, match="widenings"):
        t.alter_column_type("val", T.IntegerType())  # narrowing
    v = t.current_version()
    assert t.alter_column_type("val", T.LongType()) == v  # same type no-op


def test_cdc_schema_evolution_entry_self_verifies(spark):
    """The graded entry runs its own add/rename/widen/drop lifecycle and
    raises on any divergence from the final-schema twin; here we pin the
    surface it returns: every source doc plus the post-widen insert, at
    the final column names/types."""
    from logminer_kafka_connect_spark.entry_queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    df = QUERIES["cdc_schema_evolution"](spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.columns == ["doc_id", "language", "n_chars"]
    assert dict(df.dtypes)["n_chars"] == "bigint"
    assert df.count() == n_docs + 1
