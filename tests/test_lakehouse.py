"""SnapshotTable: atomic commits, merge semantics, time travel, evolution."""

import pytest
import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import OP_COL, SET_COLS_COL, SnapshotTable

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


def test_create_read_empty(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    assert t.current_version() == 0
    assert t.read(spark).count() == 0


def test_merge_insert_update_delete(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    t.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None}),
                Row(url="u2", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None}),
            ],
        ),
        batch_id="b1",
    )
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert state["u1"]["lang"] == "en" and state["u2"]["n"] == 2

    # partial update: only 'n' set -> lang kept; delete u2
    t.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u1", lang=None, n=10, **{OP_COL: "u", SET_COLS_COL: ["n"]}),
                Row(url="u2", lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None}),
                Row(url="u3", lang=None, n=3, **{OP_COL: "u", SET_COLS_COL: ["n"]}),
            ],
        ),
        batch_id="b2",
    )
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert set(state) == {"u1", "u3"}
    assert state["u1"]["lang"] == "en"  # un-set column kept (P4)
    assert state["u1"]["n"] == 10
    assert state["u3"]["lang"] is None  # insert-via-partial-update


def test_explicit_null_update(spark, tmpdir_path):
    """Issue14: SET lang = NULL must null the column, not keep it."""
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]), "b1")
    t.merge(
        spark,
        _src(spark, [Row(url="u1", lang=None, n=None, **{OP_COL: "u", SET_COLS_COL: ["lang"]})]),
        "b2",
    )
    r = t.read(spark).collect()[0]
    assert r["lang"] is None and r["n"] == 1


def test_idempotent_batch_replay(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    src = _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})])
    s1 = t.merge(spark, src, batch_id="b1")
    v1 = t.current_version()
    s2 = t.merge(
        spark,
        _src(spark, [Row(url="u1", lang="XX", n=99, **{OP_COL: "u", SET_COLS_COL: None})]),
        batch_id="b1",  # same id -> no-op (exactly-once)
    )
    assert s1.applied and not s2.applied
    assert t.current_version() == v1
    assert t.read(spark).collect()[0]["lang"] == "en"


def test_time_travel(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]), "b1")
    v1 = t.current_version()
    t.merge(spark, _src(spark, [Row(url="u1", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None})]), "b2")
    assert t.read(spark, version=v1).collect()[0]["lang"] == "en"
    assert t.read(spark).collect()[0]["lang"] == "de"


def test_bucket_pruning_only_rewrites_affected(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=8)
    rows = [Row(url=f"u{i}", lang="en", n=i, **{OP_COL: "u", SET_COLS_COL: None}) for i in range(64)]
    t.merge(spark, _src(spark, rows), "b1")
    meta1 = t.metadata()
    stats = t.merge(
        spark,
        _src(spark, [Row(url="u1", lang="zz", n=0, **{OP_COL: "u", SET_COLS_COL: None})]),
        "b2",
    )
    assert stats.affected_buckets == 1
    meta2 = t.metadata()
    unchanged = [b for b in meta1["buckets"] if meta1["buckets"][b] == meta2["buckets"].get(b)]
    assert len(unchanged) >= 7  # untouched buckets carried by reference
    assert t.read(spark).count() == 64


def test_add_column_with_default_and_rename(spark, tmpdir_path):
    """ChangingTableTest semantics: old rows show the default; explicit
    nulls written after the add stay null; rename is metadata-only."""
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]), "b1")
    t.add_column("status", T.IntegerType(), default=200)
    df = t.read(spark)
    assert df.collect()[0]["status"] == 200  # initial default for old files

    src2 = spark.createDataFrame(
        [("u2", "de", 2, None, "u", None)],
        T.StructType(
            SCHEMA.fields
            + [
                T.StructField("status", T.IntegerType(), True),
                T.StructField(OP_COL, T.StringType(), False),
                T.StructField(SET_COLS_COL, T.ArrayType(T.StringType()), True),
            ]
        ),
    )
    t.merge(spark, src2, "b2")
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert state["u2"]["status"] is None  # explicit null post-add stays null
    assert state["u1"]["status"] == 200

    t.rename_column("status", "http_status")
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert state["u1"]["http_status"] == 200
    assert "status" not in t.read(spark).columns


def test_atomic_pointer_snapshot_isolation(spark, tmpdir_path):
    """SelectSourceTest.kt:76-101 analog: a reader planning from version k
    never sees rows committed after k."""
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]), "b1")
    snap = t.read(spark, version=t.current_version())
    t.merge(spark, _src(spark, [Row(url="u2", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None})]), "b2")
    assert snap.count() == 1  # no dirty read


def test_hadoop_fs_backend_full_lifecycle(spark, tmpdir_path):
    """The cluster storage path: all metadata IO through the JVM Hadoop
    FileSystem (file:// locally — the same code serves hdfs://, s3a://).
    Create -> merge -> partial update -> delete -> evolve -> time travel."""
    from logminer_kafka_connect_spark.plans.fs import HadoopFS

    fs = HadoopFS(spark)
    t = SnapshotTable.create(os.path.join(tmpdir_path, "ht"), SCHEMA, ["url"], 4, fs=fs)
    t.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None}),
                Row(url="u2", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None}),
            ],
        ),
        batch_id="b1",
    )
    t.merge(
        spark,
        _src(
            spark,
            [
                Row(url="u1", lang=None, n=9, **{OP_COL: "u", SET_COLS_COL: ["n"]}),
                Row(url="u2", lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None}),
            ],
        ),
        batch_id="b2",
    )
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert list(state) == ["u1"]
    assert state["u1"]["lang"] == "en" and state["u1"]["n"] == 9  # partial kept lang
    # schema evolution + reopen from a fresh handle (metadata only via fs)
    t.add_column("score", T.IntegerType(), default=5)
    t2 = SnapshotTable(os.path.join(tmpdir_path, "ht"), fs=fs)
    assert [f.name for f in t2.schema().fields] == ["url", "lang", "n", "score"]
    assert t2.read(spark).collect()[0]["score"] == 5
    # time travel to pre-delete version
    v1 = {r["url"] for r in t2.read(spark, version=1).collect()}
    assert v1 == {"u1", "u2"}
    # idempotent replay through the hadoop backend
    stats = t2.merge(spark, _src(spark, []), batch_id="b2")
    assert not stats.applied


def test_version_pointer_fallback_to_manifest_listing(spark, tmpdir_path):
    """The CURRENT pointer is a hint: if it is missing (non-atomic rename
    window on HDFS), readers recover the max manifest version."""
    t = _mk(tmpdir_path)
    t.merge(
        spark,
        _src(spark, [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]),
        batch_id="b1",
    )
    os.remove(os.path.join(tmpdir_path, "t", "metadata", "CURRENT"))
    t2 = SnapshotTable(os.path.join(tmpdir_path, "t"))
    assert t2.current_version() == 1
    assert t2.read(spark).count() == 1


def test_bulk_merge_plan_matches_pruned(spark, tmpdir_path):
    """prune_buckets=False (bulk-replay plan: no pre-count job, stats via
    Observation) produces the identical table state and source_rows."""
    rows1 = [
        Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None}),
        Row(url="u2", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None}),
    ]
    rows2 = [
        Row(url="u1", lang=None, n=7, **{OP_COL: "u", SET_COLS_COL: ["n"]}),
        Row(url="u2", lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None}),
        Row(url="u3", lang="fr", n=3, **{OP_COL: "u", SET_COLS_COL: None}),
    ]
    ta = _mk(os.path.join(tmpdir_path, "a"))
    tb = SnapshotTable.create(os.path.join(tmpdir_path, "b", "t"), SCHEMA, ["url"], 4)
    for t_, prune in ((ta, True), (tb, False)):
        s1 = t_.merge(spark, _src(spark, rows1), batch_id="b1", prune_buckets=prune)
        s2 = t_.merge(spark, _src(spark, rows2), batch_id="b2", prune_buckets=prune)
        assert (s1.source_rows, s2.source_rows) == (2, 3)
    a = sorted(map(tuple, ta.read(spark).collect()))
    b = sorted(map(tuple, tb.read(spark).collect()))
    assert a == b


def test_expire_snapshots(spark, tmpdir_path):
    """Old manifests + unreferenced commit dirs are deleted; the retained
    window still time-travels and reads correctly."""
    t = _mk(tmpdir_path)
    for i in range(5):
        t.merge(
            spark,
            _src(spark, [Row(url="u1", lang="en", n=i, **{OP_COL: "u", SET_COLS_COL: None})]),
            batch_id=f"b{i}",
        )
    assert t.current_version() == 5
    data_dir = os.path.join(tmpdir_path, "t", "data")
    n_before = len(os.listdir(data_dir))
    stats = t.expire_snapshots(keep_last=2)
    assert stats["expired_manifests"] == 4  # v0..v3 gone, v4/v5 kept
    assert stats["retained_versions"] == [4, 5]
    assert len(os.listdir(data_dir)) < n_before
    # current state intact, retained time travel works
    assert t.read(spark).collect()[0]["n"] == 4
    assert t.read(spark, version=4).collect()[0]["n"] == 3
    assert len(t.snapshot_history()) == 2  # expired versions skipped


def test_expire_keeps_files_shared_with_retained(spark, tmpdir_path):
    """A commit dir still referenced by a retained manifest (untouched
    bucket carried forward) must survive expiry."""
    t = _mk(tmpdir_path, n_buckets=8)
    rows = [
        Row(url=f"u{i}", lang="en", n=i, **{OP_COL: "u", SET_COLS_COL: None})
        for i in range(20)
    ]
    t.merge(spark, _src(spark, rows), batch_id="b0")  # v1: all buckets
    # touch a single key -> rewrites one bucket; others carried by reference
    t.merge(
        spark,
        _src(spark, [Row(url="u0", lang="fr", n=99, **{OP_COL: "u", SET_COLS_COL: None})]),
        batch_id="b1",
    )
    t.expire_snapshots(keep_last=1)  # only v2 retained; v1 dirs still shared
    state = {r["url"]: r for r in t.read(spark).collect()}
    assert len(state) == 20 and state["u0"]["lang"] == "fr" and state["u1"]["n"] == 1


def test_writer_lock_blocks_concurrent_maintenance(spark, tmpdir_path):
    """A second *writer* must fail loudly while the lock is held, succeed
    after release, and steal a stale lock whose holder is gone
    (crash-resume). Since round 4 ``expire_snapshots`` is lock-free
    (positive-provenance deletion makes it safe next to a live merge) —
    it runs fine while the lock is held."""
    import json
    import pytest

    from logminer_kafka_connect_spark.plans.lakehouse import ConcurrentWriterError

    t = _mk(tmpdir_path)
    rows = [Row(url="u1", lang="en", n=1, **{OP_COL: "u", SET_COLS_COL: None})]

    token = t._acquire_writer_lock("merge")
    t.expire_snapshots(keep_last=1)  # maintenance needs no coordination
    with pytest.raises(ConcurrentWriterError):
        t.merge(spark, _src(spark, rows), batch_id="b0")
    t._release_writer_lock(token)

    # after release, writes proceed
    t.merge(spark, _src(spark, rows), batch_id="b0")
    assert t.read(spark).count() == 1

    # crashed holder: dead pid on this host -> lock is stolen, not fatal
    t.fs.write_text_atomic(
        t._lock_path(),
        json.dumps({"token": "x", "pid": 2**22 + 7, "host": os.uname().nodename,
                    "op": "merge", "ts": __import__("time").time()}),
    )
    t.merge(
        spark,
        _src(spark, [Row(url="u2", lang="de", n=2, **{OP_COL: "u", SET_COLS_COL: None})]),
        batch_id="b1",
    )
    assert t.read(spark).count() == 2
    # lock released after the stolen write completed
    assert not t.fs.exists(t._lock_path())


def test_read_asof_timestamp_and_metadata_tables(spark, tmpdir_path):
    import json
    import time as _time

    from logminer_kafka_connect_spark.plans.lakehouse import (
        OP_COL,
        SET_COLS_COL,
        SnapshotTable,
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("val", T.LongType())]
    )
    t = SnapshotTable.create(
        f"{tmpdir_path}/asof", schema, ["url"], n_buckets=2, stats_cols=["val"]
    )
    t.overwrite(spark.createDataFrame([("a", 1)], "url string, val long"), batch_id="b0")
    t_mid = _time.time()
    _time.sleep(0.05)
    b = (
        spark.createDataFrame([("a", 2)], "url string, val long")
        .withColumn(OP_COL, F.lit("u"))
        .withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    )
    t.merge(spark, b, batch_id="b1")
    # as-of between the two commits reads the first state
    assert t.read_asof(spark, t_mid).collect()[0].val == 1
    assert t.read_asof(spark, _time.time()).collect()[0].val == 2
    assert t.version_asof(t_mid) < t.version_asof(_time.time())
    with pytest.raises(ValueError, match="expired or pre-create"):
        t.version_asof(t_mid - 1e6)

    hist = t.history_df(spark).orderBy("version").collect()
    assert [h.operation for h in hist] == ["create", "overwrite", "merge"]
    assert hist[-1].batch_id == "b1"
    assert json.loads(hist[-1].summary_json)["source_rows"] == 1
    files = t.files_df(spark).collect()
    assert all(f.kind == "base" for f in files)
    st = json.loads([f for f in files if f.stats_json][0].stats_json)
    assert "val" in st
