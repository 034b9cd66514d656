"""Bucket-spec evolution (SnapshotTable.rebucket): a table created small
must be able to grow its bucket count mid-life without breaking
exactly-once, time travel, schema evolution, or a live replay's
continuation — the Iceberg partition-spec-evolution story for the
``pmod(xxhash64(key), n_buckets)`` layout."""

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import (
    OP_COL,
    SET_COLS_COL,
    SnapshotTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _mk(tmpdir_path, n_buckets=4):
    return SnapshotTable.create(os.path.join(tmpdir_path, "t"), SCHEMA, ["url"], n_buckets)


def _src(spark, rows):
    schema = T.StructType(
        SCHEMA.fields
        + [
            T.StructField(OP_COL, T.StringType(), False),
            T.StructField(SET_COLS_COL, T.ArrayType(T.StringType()), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _upserts(urls):
    return [
        Row(url=u, lang="en", n=i, **{OP_COL: "u", SET_COLS_COL: None})
        for i, u in enumerate(urls)
    ]


def _state(t, spark, version=None):
    return {(r["url"], r["lang"], r["n"]) for r in t.read(spark, version=version).collect()}


def test_rebucket_preserves_state_and_versions(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=2)
    t.merge(spark, _src(spark, _upserts([f"u{i}" for i in range(40)])), batch_id="b1")
    before = _state(t, spark)
    v1 = t.current_version()

    res = t.rebucket(spark, 8)
    assert res["rewritten"] and res["n_buckets"] == 8
    assert t.current_version() == v1 + 1
    assert t.metadata()["n_buckets"] == 8
    assert _state(t, spark) == before
    # time travel: the pre-rebucket version reads through its own spec
    assert _state(t, spark, version=v1) == before
    assert t.metadata(v1)["n_buckets"] == 2
    # every current bucket id is under the new modulus
    assert all(int(b) < 8 for b in t.metadata()["buckets"])


def test_rebucket_same_count_is_a_noop(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=4)
    t.merge(spark, _src(spark, _upserts(["a", "b"])), batch_id="b1")
    v = t.current_version()
    res = t.rebucket(spark, 4)
    assert not res["rewritten"]
    assert t.current_version() == v


def test_exactly_once_survives_rebucket(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=2)
    t.merge(spark, _src(spark, _upserts(["a", "b", "c"])), batch_id="b1")
    t.rebucket(spark, 16)
    before = _state(t, spark)
    # replaying an already-applied batch after the rewrite is still a no-op
    stats = t.merge(spark, _src(spark, _upserts(["a", "b", "c"])), batch_id="b1")
    assert not stats.applied
    assert _state(t, spark) == before


def test_merge_continues_at_new_bucket_count(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=2)
    t.merge(spark, _src(spark, _upserts([f"u{i}" for i in range(20)])), batch_id="b1")
    t.rebucket(spark, 8)
    # post-rebucket merge: update one row, delete one, insert one
    t.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u0", lang="de", n=100, **{OP_COL: "u", SET_COLS_COL: None}),
                Row(url="u1", lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None}),
                Row(url="new", lang="fr", n=7, **{OP_COL: "u", SET_COLS_COL: None}),
            ],
        ),
        batch_id="b2",
    )
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert state["u0"]["lang"] == "de" and state["u0"]["n"] == 100
    assert "u1" not in state
    assert state["new"]["lang"] == "fr"
    assert len(state) == 20  # 20 - 1 delete + 1 insert
    # equivalence: the same log applied without the rebucket
    t2 = SnapshotTable.create(os.path.join(tmpdir_path, "t2"), SCHEMA, ["url"], 2)
    t2.merge(spark, _src(spark, _upserts([f"u{i}" for i in range(20)])), batch_id="b1")
    t2.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u0", lang="de", n=100, **{OP_COL: "u", SET_COLS_COL: None}),
                Row(url="u1", lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None}),
                Row(url="new", lang="fr", n=7, **{OP_COL: "u", SET_COLS_COL: None}),
            ],
        ),
        batch_id="b2",
    )
    assert _state(t, spark) == _state(t2, spark)


def test_rebucket_materializes_schema_evolution(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=2)
    t.merge(spark, _src(spark, _upserts(["a", "b"])), batch_id="b1")
    t.add_column("score", T.LongType(), default=5)
    t.rename_column("lang", "language")
    before = {
        (r["url"], r["language"], r["score"]) for r in t.read(spark).collect()
    }
    t.rebucket(spark, 8)
    after = {(r["url"], r["language"], r["score"]) for r in t.read(spark).collect()}
    assert after == before == {("a", "en", 5), ("b", "en", 5)}
    # the rewritten dirs record the CURRENT physical columns
    meta = t.metadata()
    for cols in meta["data_columns"].values():
        assert "language" in cols and "score" in cols
