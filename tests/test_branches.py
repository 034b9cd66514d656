"""Write-audit-publish branches (Iceberg branch refs / fast-forward).

Reference parity: the connector commits straight to the sink topic with
no staging surface; WAP is the lake-native audit gate a CDC consumer
adds in front of exactly-once MERGE (extends the T7 family).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import (
    OP_COL,
    SET_COLS_COL,
    ConcurrentWriterError,
    SnapshotTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "url string, val long")


def _batch(spark, rows, op="u"):
    return (
        spark.createDataFrame(rows, "url string, val long")
        .withColumn(OP_COL, F.lit(op))
        .withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    )


def _mk(spark, tmpdir_path, name="t", **kw):
    t = SnapshotTable.create(f"{tmpdir_path}/{name}", SCHEMA, ["url"], n_buckets=4, **kw)
    t.overwrite(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), batch_id="b0")
    return t


def _state(spark, t):
    return sorted((r.url, r.val) for r in t.read(spark).collect())


def test_branch_stage_audit_publish(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    v0 = t.current_version()
    br = t.create_branch("audit")
    # fork is zero-copy: branch reads the parent's state immediately
    assert _state(spark, br) == [("a", 1), ("b", 2), ("c", 3)]
    br.merge(spark, _batch(spark, [("b", 20), ("d", 4)]), batch_id="b1")
    # staging is invisible to main
    assert t.current_version() == v0
    assert _state(spark, t) == [("a", 1), ("b", 2), ("c", 3)]
    assert _state(spark, br) == [("a", 1), ("b", 20), ("c", 3), ("d", 4)]
    v = t.publish_branch("audit")
    assert v == v0 + 1 and t.current_version() == v
    assert _state(spark, t) == [("a", 1), ("b", 20), ("c", 3), ("d", 4)]
    # the ledger crossed the publish: b1 can never re-apply on main
    assert t.is_applied("b1") and t.is_applied("b0")
    stats = t.merge(spark, _batch(spark, [("b", 999)]), batch_id="b1")
    assert not stats.applied
    assert _state(spark, t)[1] == ("b", 20)


def test_publish_refuses_non_fast_forward(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t.create_branch("audit")
    t.merge(spark, _batch(spark, [("a", 10)]), batch_id="bx")  # main advances
    with pytest.raises(ConcurrentWriterError, match="fast-forward"):
        t.publish_branch("audit")


def test_drop_unpublished_branch_removes_tree_keeps_parent(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("audit")
    br.merge(spark, _batch(spark, [("a", 666)]), batch_id="bad")
    t.drop_branch("audit")
    assert not os.path.exists(f"{tmpdir_path}/t/branches/audit")
    assert _state(spark, t) == [("a", 1), ("b", 2), ("c", 3)]
    # the name is reusable after a failed audit
    br2 = t.create_branch("audit")
    br2.merge(spark, _batch(spark, [("a", 7)]), batch_id="good")
    t.publish_branch("audit")
    assert _state(spark, t)[0] == ("a", 7)


def test_drop_published_branch_retains_data(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("audit")
    br.merge(spark, _batch(spark, [("a", 7)]), batch_id="b1")
    t.publish_branch("audit")
    res = t.drop_branch("audit")
    assert res["data_retained"]
    # the staged data files now belong to main and must survive the drop
    assert _state(spark, t)[0] == ("a", 7)
    assert not os.path.exists(f"{tmpdir_path}/t/branches/audit/metadata")


def test_branch_of_branch_refused_and_bad_names(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("audit")
    with pytest.raises(ValueError, match="branch a branch"):
        br.create_branch("nested")
    with pytest.raises(ValueError, match="invalid branch name"):
        t.create_branch("../escape")


def test_branch_expiry_never_deletes_parent_files(spark, tmpdir_path):
    """The ownership guard: a branch whose fork manifest expires must not
    delete the parent data dirs that manifest references."""
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("longlived")
    for i in range(4):
        br.merge(spark, _batch(spark, [("a", 100 + i)]), batch_id=f"s{i}")
    br.expire_snapshots(keep_last=1)  # v0 (the fork) expires
    # parent is fully intact even though its dirs were referenced only by
    # the branch's now-expired fork manifest
    assert _state(spark, t) == [("a", 1), ("b", 2), ("c", 3)]
    assert _state(spark, br)[0] == ("a", 103)


def test_parent_expiry_reclaims_published_branch_data(spark, tmpdir_path):
    """After publish+drop, branch-staged files age out of main's retained
    window like any other commit: main's expiry owns and reclaims them."""
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("audit")
    br.merge(spark, _batch(spark, [("a", 7), ("b", 8), ("c", 9)]), batch_id="b1")
    t.publish_branch("audit")
    t.drop_branch("audit")
    bdata = f"{tmpdir_path}/t/branches/audit/data"
    assert any(os.scandir(bdata))
    # rewrite every bucket so the published files stop being referenced
    t.merge(
        spark, _batch(spark, [("a", 70), ("b", 80), ("c", 90)]), batch_id="b2"
    )
    t.expire_snapshots(keep_last=1)
    leftover = [
        os.path.join(r, f) for r, _, fs in os.walk(bdata) for f in fs if f.endswith(".parquet")
    ]
    assert leftover == []
    assert _state(spark, t) == [("a", 70), ("b", 80), ("c", 90)]


def test_wap_works_with_mor_tables(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, name="m", merge_mode="mor")
    br = t.create_branch("audit")
    br.merge(spark, _batch(spark, [("b", 20)]), batch_id="b1")
    br.merge(spark, _batch(spark, [("c", 0)], op="d"), batch_id="b2")
    t.publish_branch("audit")
    assert _state(spark, t) == [("a", 1), ("b", 20)]
    # outstanding deltas crossed the publish; compaction on main folds them
    t.compact(spark)
    assert _state(spark, t) == [("a", 1), ("b", 20)]


def test_list_branches_surface(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    assert t.list_branches() == []
    t.create_branch("audit")
    t.create_branch("experiment")
    names = {b["name"]: b for b in t.list_branches()}
    assert set(names) == {"audit", "experiment"}
    assert names["audit"]["fork_version"] == t.current_version()
    assert names["audit"]["version"] == 0
    br = t.branch("audit")
    br.merge(spark, _batch(spark, [("a", 7)]), batch_id="b1")
    assert {b["name"]: b["version"] for b in t.list_branches()}["audit"] == 1
    t.publish_branch("audit")
    t.drop_branch("audit")  # published: metadata gone, data retained
    assert {b["name"] for b in t.list_branches()} == {"experiment"}


def test_stale_branch_fails_loudly_after_parent_expiry(spark, tmpdir_path):
    """The documented retention caveat: a branch forked from a version
    that the parent has since expired must fail LOUDLY on read (missing
    data paths), never silently return partial rows."""
    t = _mk(spark, tmpdir_path)
    br = t.create_branch("stale")
    for i in range(4):  # parent advances; every bucket rewritten
        t.merge(
            spark,
            _batch(spark, [("a", 10 + i), ("b", 20 + i), ("c", 30 + i)]),
            batch_id=f"m{i}",
        )
    t.expire_snapshots(keep_last=1)
    with pytest.raises(Exception, match="(?i)path does not exist|FileNotFound"):
        br.read(spark).collect()
    # the parent itself is fine
    assert _state(spark, t) == [("a", 13), ("b", 23), ("c", 33)]


def test_drop_branch_protects_data_after_marker_expiry(spark, tmpdir_path):
    """r5 ADVICE (medium): a published branch whose publish-marker
    manifest has been aged out by expire_snapshots must STILL be
    classified as published on drop — later retained main manifests can
    reference staged data dirs under the branch subtree for buckets no
    subsequent merge rewrote. drop_branch must retain the data subtree
    and main reads must stay whole."""
    t = _mk(spark, tmpdir_path)
    b = t.create_branch("audit")
    b.merge(spark, _batch(spark, [("d", 9)]), batch_id="b1")
    t.publish_branch("audit")  # marker manifest references branch files
    # advance main several times WITHOUT touching d's bucket so the
    # branch-staged file stays referenced by every later manifest
    for i in range(4):
        t.merge(spark, _batch(spark, [("a", 10 + i)]), batch_id=f"m{i}")
    t.expire_snapshots(keep_last=2)  # the publish marker ages out
    res = t.drop_branch("audit")
    assert res["published"] and res["data_retained"], res
    # main must still read the branch-staged row
    assert ("d", 9) in _state(spark, t)
