"""Incremental version-diff reads (read_changes) — the Iceberg
incremental/changelog-scan analog: correctness vs a state-diff oracle,
manifest-level bucket pruning, metadata-only evolution emitting nothing,
and the rebucket full-compare fallback."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import OP_COL, SET_COLS_COL, SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def _mk(tmpdir_path, n_buckets=8):
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


def _up(url, lang, n):
    return Row(url=url, lang=lang, n=n, **{OP_COL: "u", SET_COLS_COL: None})


def _del(url):
    return Row(url=url, lang=None, n=None, **{OP_COL: "d", SET_COLS_COL: None})


def _state_diff_oracle(t, spark, v1, v2):
    """Independent oracle: brute diff of the two full snapshots."""
    a = {r["url"]: (r["lang"], r["n"]) for r in t.read(spark, v1).collect()}
    b = {r["url"]: (r["lang"], r["n"]) for r in t.read(spark, v2).collect()}
    out = {}
    for k in set(a) | set(b):
        if k not in a:
            out[k] = "i"
        elif k not in b:
            out[k] = "d"
        elif a[k] != b[k]:
            out[k] = "u"
    return out


def _got(t, spark, v1, v2):
    return {r["url"]: r for r in t.read_changes(spark, v1, v2).collect()}


def test_changes_match_state_diff(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [_up("u1", "en", 1), _up("u2", "de", 2), _up("u3", "fr", 3)]), batch_id="b1")  # v1
    t.merge(spark, _src(spark, [_up("u2", "de", 20), _up("u4", "es", 4), _del("u3")]), batch_id="b2")  # v2
    t.merge(spark, _src(spark, [_up("u1", "en", 1)]), batch_id="b3")  # v3: no-op value-wise

    for v1, v2 in [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3)]:
        got = _got(t, spark, v1, v2)
        assert {k: r["op"] for k, r in got.items()} == _state_diff_oracle(t, spark, v1, v2), (v1, v2)
    # structs carry the images
    got = _got(t, spark, 1, 2)
    assert got["u2"]["before"]["n"] == 2 and got["u2"]["after"]["n"] == 20
    assert got["u3"]["op"] == "d" and got["u3"]["after"] is None
    assert got["u4"]["op"] == "i" and got["u4"]["before"] is None
    # v2 -> v3 rewrote u1's bucket with identical values: no change emitted
    assert _got(t, spark, 2, 3) == {}
    # default to_version = current
    assert {k: r["op"] for k, r in _got(t, spark, 1, None).items()} == _state_diff_oracle(
        t, spark, 1, 3
    )


def test_changed_buckets_prune_manifest_only(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=8)
    t.merge(spark, _src(spark, [_up(f"u{i}", "en", i) for i in range(32)]), batch_id="b1")  # v1
    t.merge(spark, _src(spark, [_up("u5", "en", 999)]), batch_id="b2")  # v2: one key
    cb = t.changed_buckets(1, 2)
    assert cb is not None and 1 <= len(cb) < 8  # proper subset: pruning is real
    got = _got(t, spark, 1, 2)
    assert set(got) == {"u5"} and got["u5"]["op"] == "u"
    # trivially empty diff of identical versions
    assert t.changed_buckets(2, 2) == []
    assert _got(t, spark, 2, 2) == {}


def test_metadata_only_evolution_emits_nothing(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [_up("u1", "en", 1)]), batch_id="b1")  # v1
    t.add_column("score", T.LongType(), default=7)  # v2: metadata only
    t.rename_column("lang", "language")  # v3: metadata only
    assert t.changed_buckets(1, 3) == []
    assert t.read_changes(spark, 1, 3).count() == 0
    # but a later data change reports rows in the EVOLVED schema
    src_schema = T.StructType(
        t.schema().fields
        + [
            T.StructField(OP_COL, T.StringType(), False),
            T.StructField(SET_COLS_COL, T.ArrayType(T.StringType()), True),
        ]
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [Row(url="u1", language="en", n=2, score=9, **{OP_COL: "u", SET_COLS_COL: None})],
            src_schema,
        ),
        batch_id="b2",
    )  # v4
    got = _got(t, spark, 1, 4)
    assert got["u1"]["op"] == "u"
    assert got["u1"]["before"]["language"] == "en" and got["u1"]["before"]["score"] == 7
    assert got["u1"]["after"]["n"] == 2 and got["u1"]["after"]["score"] == 9


def test_rebucket_falls_back_to_full_compare(spark, tmpdir_path):
    t = _mk(tmpdir_path, n_buckets=4)
    t.merge(spark, _src(spark, [_up(f"u{i}", "en", i) for i in range(10)]), batch_id="b1")  # v1
    t.rebucket(spark, 16)  # v2: every row moved, values identical
    t.merge(spark, _src(spark, [_up("u3", "en", 333), _up("unew", "de", 0)]), batch_id="b2")  # v3
    assert t.changed_buckets(1, 2) is None
    assert _got(t, spark, 1, 2) == {}  # rebucket alone changes no row
    got = _got(t, spark, 1, 3)
    assert {k: r["op"] for k, r in got.items()} == {"u3": "u", "unew": "i"}


def test_from_after_to_rejected(spark, tmpdir_path):
    t = _mk(tmpdir_path)
    t.merge(spark, _src(spark, [_up("u1", "en", 1)]), batch_id="b1")
    import pytest

    with pytest.raises(ValueError):
        t.read_changes(spark, 1, 0)
