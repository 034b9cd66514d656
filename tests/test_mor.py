"""Merge-on-read (merge_mode='mor'): delta-append writes, read-time fold,
compaction, CoW fallback for partial updates, and maintenance interplay.

Reference parity: the final-table-state semantics are the same MERGE
contract as copy-on-write (SURVEY.md J6/S7); every test here pins MoR
against the CoW twin or an independent expected state.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import (
    OP_COL,
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


def _batch(spark, rows, set_cols=None):
    df = spark.createDataFrame(rows, "url string, val long, txt string, __op string")
    if set_cols is None:
        return df.withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    return df.withColumn(SET_COLS_COL, F.array(*[F.lit(c) for c in set_cols]))


def _state(spark, table, version=None):
    rows = [
        (r.url, r.val, r.txt) for r in table.read(spark, version=version).collect()
    ]
    return sorted(rows, key=lambda t: tuple("" if v is None else str(v) for v in t))


def _twin_tables(spark, tmpdir_path, **kw):
    cow = SnapshotTable.create(
        f"{tmpdir_path}/cow", SCHEMA, ["url"], n_buckets=4, merge_mode="cow", **kw
    )
    mor = SnapshotTable.create(
        f"{tmpdir_path}/mor", SCHEMA, ["url"], n_buckets=4, merge_mode="mor", **kw
    )
    return cow, mor


BATCHES = [
    [("a", 1, "x", "u"), ("b", 2, "y", "u"), ("c", 3, "z", "u")],
    [("a", 10, "x2", "u"), ("b", 0, None, "d"), ("d", 4, "w", "u")],
    [("d", 0, None, "d"), ("e", 5, "v", "u"), ("a", 11, "x3", "u")],
    [("b", 20, "y2", "u")],  # re-insert a deleted key
]


def test_mor_matches_cow_across_batches(spark, tmpdir_path):
    """Differential: same batch sequence through both write modes gives the
    identical table state after EVERY batch (delete, update, re-insert)."""
    cow, mor = _twin_tables(spark, tmpdir_path)
    for i, rows in enumerate(BATCHES):
        cow.merge(spark, _batch(spark, rows), batch_id=f"b{i}")
        st = mor.merge(spark, _batch(spark, rows), batch_id=f"b{i}")
        assert st.applied
        assert _state(spark, mor) == _state(spark, cow)
    assert mor.metadata()["operation"] == "merge-mor"
    assert any(mor.metadata()["deltas"].values())


def test_mor_idempotent_replay_and_time_travel(spark, tmpdir_path):
    _, mor = _twin_tables(spark, tmpdir_path)
    mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    v1 = _state(spark, mor)
    mor.merge(spark, _batch(spark, BATCHES[1]), batch_id="b1")
    # replayed batch id is a no-op
    again = mor.merge(spark, _batch(spark, [("zzz", 9, "q", "u")]), batch_id="b1")
    assert not again.applied
    assert ("zzz", 9, "q") not in _state(spark, mor)
    # time travel to the pre-batch-1 version folds only ITS deltas
    assert _state(spark, mor, version=1) == v1


def test_compact_preserves_state_clears_deltas(spark, tmpdir_path):
    cow, mor = _twin_tables(spark, tmpdir_path)
    for i, rows in enumerate(BATCHES):
        cow.merge(spark, _batch(spark, rows), batch_id=f"b{i}")
        mor.merge(spark, _batch(spark, rows), batch_id=f"b{i}")
    pre = _state(spark, mor)
    pre_version = mor.current_version()
    res = mor.compact(spark)
    assert res["compacted_buckets"] > 0 and res["delta_dirs_folded"] > 0
    meta = mor.metadata()
    assert meta["deltas"] == {} and meta["delta_seq"] == {}
    assert _state(spark, mor) == pre == _state(spark, cow)
    # pre-compaction versions still read through their deltas
    assert _state(spark, mor, version=pre_version) == pre
    # second compact is a no-op
    assert mor.compact(spark)["compacted_buckets"] == 0
    # exactly-once state survived compaction
    assert not mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0").applied


def test_partial_updates_replay_in_the_fold(spark, tmpdir_path):
    """Partial __set_cols batches stay on the delta path: the read-time
    fold applies P4 enrichment semantics per key in commit order — set
    column takes the event value (explicit NULL stays NULL), un-set keeps
    the running image — bit-equal to the CoW twin."""
    cow, mor = _twin_tables(spark, tmpdir_path)
    seq = [
        (_batch(spark, BATCHES[0]), "b0"),
        # partial: update val only; txt must survive
        (_batch(spark, [("a", 100, None, "u")], set_cols=["val"]), "b1"),
        # partial with explicit NULL: txt set to NULL on 'c', val kept
        (_batch(spark, [("c", 0, None, "u")], set_cols=["txt"]), "b2"),
        # partial INSERT (key unseen): un-set columns land NULL
        (_batch(spark, [("p", 7, None, "u")], set_cols=["val"]), "b3"),
        # delete then partial re-insert of the same key
        (_batch(spark, [("a", 0, None, "d")], set_cols=None), "b4"),
        (_batch(spark, [("a", 1, None, "u")], set_cols=["val"]), "b5"),
    ]
    for src, bid in seq:
        cow.merge(spark, src, batch_id=bid)
        st = mor.merge(spark, src, batch_id=bid)
        assert st.applied
        assert mor.metadata()["operation"] == "merge-mor"  # never fell back
        assert _state(spark, mor) == _state(spark, cow)
    got = {r.url: (r.val, r.txt) for r in mor.read(spark).collect()}
    assert got["c"] == (3, None)     # explicit NULL stuck, val kept
    assert got["p"] == (7, None)     # partial insert: un-set -> NULL
    assert got["a"] == (1, None)     # re-insert after delete: txt NULL
    # and compaction materializes the identical state
    mor.compact(spark)
    assert _state(spark, mor) == _state(spark, cow)


def test_mor_schema_evolution_add_column(spark, tmpdir_path):
    """add_column is metadata-only; a MoR merge after it writes the new
    column into delta files while old base rows read the default."""
    _, mor = _twin_tables(spark, tmpdir_path)
    mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    mor.add_column("lang", T.StringType(), default="und")
    src = spark.createDataFrame(
        [("a", 10, "x2", "en", "u"), ("f", 6, "n", "de", "u")],
        "url string, val long, txt string, lang string, __op string",
    ).withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    mor.merge(spark, src, batch_id="b1")
    got = {r.url: r.lang for r in mor.read(spark).collect()}
    assert got == {"a": "en", "b": "und", "c": "und", "f": "de"}
    # and compaction materializes the same answer
    mor.compact(spark)
    assert {r.url: r.lang for r in mor.read(spark).collect()} == got


def test_expire_snapshots_keeps_referenced_delta_dirs(spark, tmpdir_path):
    mor = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4, merge_mode="mor"
    )
    for i, rows in enumerate(BATCHES):
        mor.merge(spark, _batch(spark, rows), batch_id=f"b{i}")
    pre = _state(spark, mor)
    mor.expire_snapshots(keep_last=1)
    assert _state(spark, mor) == pre  # latest version fully readable
    # orphan cleanup doesn't touch referenced delta dirs either
    mor.remove_orphan_files(older_than_s=0.0)
    assert _state(spark, mor) == pre


def test_read_pruned_folds_deltas(spark, tmpdir_path):
    """File skipping composes with the fold: base files prune on stats,
    delta rows always enter, and the predicate re-applies at the end."""
    mor = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4,
        merge_mode="mor", stats_cols=["val"],
    )
    mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    mor.compact(spark)  # give base files real stats
    # delta moves 'a' INTO the queried range and deletes 'c' (val=3 in range)
    mor.merge(
        spark,
        _batch(spark, [("a", 100, "x2", "u"), ("c", 0, None, "d")]),
        batch_id="b1",
    )
    rows = sorted(
        (r.url, r.val) for r in mor.read_pruned(spark, "val", 3, 200).collect()
    )
    assert rows == [("a", 100)]


def test_changed_buckets_sees_delta_only_changes(spark, tmpdir_path):
    mor = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4, merge_mode="mor"
    )
    mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    v1 = mor.current_version()
    mor.merge(spark, _batch(spark, [("a", 10, "x2", "u")]), batch_id="b1")
    cb = mor.changed_buckets(v1)
    assert cb  # the delta-only change is visible in the manifest diff
    ch = {(r.url, r.op) for r in mor.read_changes(spark, v1).collect()}
    assert ch == {("a", "u")}


def test_clean_buckets_bypass_the_fold(spark, tmpdir_path):
    """Plan shape: with deltas in ONE bucket, the other buckets' files are
    unioned in verbatim — no join above their scan (the scale property:
    read amplification is proportional to delta-touched data only)."""
    mor = SnapshotTable.create(
        f"{tmpdir_path}/t", SCHEMA, ["url"], n_buckets=4, merge_mode="mor"
    )
    mor.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    mor.compact(spark)
    meta = mor.metadata()
    # touch exactly one existing key -> exactly one bucket gets a delta
    mor.merge(spark, _batch(spark, [("a", 10, "x2", "u")]), batch_id="b1")
    touched = [b for b, ps in mor.metadata()["deltas"].items() if ps]
    assert len(touched) == 1
    clean_paths = [
        p
        for b, ps in meta["buckets"].items()
        if b not in touched
        for p in ps
    ]
    plan = mor.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    # one Union whose first child is a bare relation over the clean files
    assert "Union" in plan and "Join" in plan
    assert plan.index("Union") < plan.index("Join"), plan
    assert clean_paths, "test needs at least one clean bucket"


def test_point_lookup_matches_full_scan_both_modes(spark, tmpdir_path):
    """read_for_keys == full-scan filter on both write modes, with the MoR
    side carrying uncompacted deltas (update + delete) at lookup time."""
    cow, mor = _twin_tables(spark, tmpdir_path)
    for t in (cow, mor):
        t.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
        t.merge(spark, _batch(spark, BATCHES[1]), batch_id="b1")
        keys = ["a", "b", "d", "nope"]
        got = sorted(
            (r.url, r.val, r.txt)
            for r in t.read_for_keys(spark, keys).collect()
        )
        want = sorted(
            (r.url, r.val, r.txt)
            for r in t.read(spark).filter(F.col("url").isin(keys)).collect()
        )
        assert got == want
        assert "b" not in {u for u, _, _ in got}  # deleted in BATCHES[1]


def test_point_lookup_empty_and_validation(spark, tmpdir_path):
    cow, _ = _twin_tables(spark, tmpdir_path)
    cow.merge(spark, _batch(spark, BATCHES[0]), batch_id="b0")
    empty = cow.read_for_keys(spark, [])
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["url", "val", "txt"]
    two_key = SnapshotTable.create(
        f"{tmpdir_path}/two", SCHEMA, ["url", "val"], n_buckets=2
    )
    with pytest.raises(ValueError, match="single-column"):
        two_key.read_for_keys(spark, [("a", 1)])


def test_auto_compaction_cadence_bounds_delta_depth(spark, tmpdir_path):
    """CdcEngine(merge_mode='mor', compact_every=2): replaying 4 batches
    auto-folds deltas every 2, the final state still equals the CoW twin,
    and the uncompacted depth never exceeds the cadence."""
    from logminer_kafka_connect_spark.engine import CdcEngine
    from logminer_kafka_connect_spark.sources.generator import (
        SCN0,
        CdcGenerator,
        GeneratorConfig,
    )

    def run(mode, **kw):
        gen = CdcGenerator(GeneratorConfig(seed=7, n_txns=40, n_urls=80, n_snapshot=40))
        eng = CdcEngine(
            spark, f"{tmpdir_path}/{mode}", n_buckets=8, merge_mode=mode, **kw
        )
        eng.load_snapshot(gen.snapshot_df(spark), snapshot_scn=SCN0 - 1)
        eng.replay(gen.events_df(spark), n_batches=4)
        state = sorted(
            (r.url, r.lang, r.text)
            for r in eng.state().select("url", "lang", "text").collect()
        )
        return eng, state

    cow_eng, cow_state = run("cow")
    mor_eng, mor_state = run("mor", compact_every=2)
    assert mor_state == cow_state
    ops = [m.get("operation") for m in mor_eng.table.snapshot_history()]
    assert ops.count("compact") >= 2, ops
    assert mor_eng.table.delta_depth() <= 2


def test_streaming_into_mor_table_with_cadence(spark, tmpdir_path):
    """The production shape: Structured Streaming tail applied to a
    merge-on-read table with auto-compaction — final state must equal the
    generator's independent oracle, and compaction must actually have run
    between triggers."""
    import os

    from logminer_kafka_connect_spark.engine import CdcEngine
    from logminer_kafka_connect_spark.sources.generator import (
        SCN0,
        CdcGenerator,
        GeneratorConfig,
    )
    from tests.test_replay_e2e import _assert_state_equal
    from tests.test_streaming import _write_event_log

    gen = CdcGenerator(GeneratorConfig(seed=37, n_txns=80, n_urls=120, n_snapshot=40))
    events_path = os.path.join(tmpdir_path, "events")
    _write_event_log(spark, gen, events_path)
    engine = CdcEngine(
        spark, tmpdir_path, n_buckets=8, merge_mode="mor", compact_every=2
    )
    engine.load_snapshot(
        spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1
    )
    q = engine.run_streaming(
        events_path, os.path.join(tmpdir_path, "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(300)
    _assert_state_equal(
        engine.state().toPandas(), gen.expected_final_state(include_snapshot=True)
    )
    ops = [m.get("operation") for m in engine.table.snapshot_history()]
    assert "merge-mor" in ops and "compact" in ops, ops
    assert engine.table.delta_depth() <= 2


def test_ddl_composes_with_outstanding_deltas(spark, tmpdir_path):
    """Schema evolution on a merge-on-read table whose deltas are NOT yet
    compacted: widen/rename/drop all apply to delta files written at the
    old physical schema, partial updates written at the new schema fold
    over pre-DDL deltas, and compaction preserves the state bit-for-bit."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("x", T.StringType()),
        ]
    )
    t = SnapshotTable.create(
        f"{tmpdir_path}/mor_ddl", schema, ["url"], n_buckets=2, merge_mode="mor"
    )
    t.overwrite(
        spark.createDataFrame([("a", 1, "p"), ("b", 2, "q")], "url string, n int, x string")
    )
    b1 = (
        spark.createDataFrame([("a", 5, "r")], "url string, n int, x string")
        .withColumn(OP_COL, F.lit("u"))
        .withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    )
    t.merge(spark, b1, batch_id="b1")  # outstanding delta at the OLD schema

    t.alter_column_type("n", T.LongType())
    t.rename_column("n", "m")
    t.drop_column("x")
    df = t.read(spark)
    assert dict(df.dtypes) == {"url": "string", "m": "bigint"}
    assert sorted(tuple(r) for r in df.collect()) == [("a", 5), ("b", 2)]

    # post-DDL batches: a long beyond int range and a partial update on
    # the renamed column, both folding over the pre-DDL delta
    b2 = (
        spark.createDataFrame([("b", 5_000_000_000)], "url string, m long")
        .withColumn(OP_COL, F.lit("u"))
        .withColumn(SET_COLS_COL, F.lit(None).cast("array<string>"))
    )
    t.merge(spark, b2, batch_id="b2")
    b3 = (
        spark.createDataFrame([("a", 9)], "url string, m long")
        .withColumn(OP_COL, F.lit("u"))
        .withColumn(SET_COLS_COL, F.array(F.lit("m")))
    )
    t.merge(spark, b3, batch_id="b3")
    want = [("a", 9), ("b", 5_000_000_000)]
    assert sorted(tuple(r) for r in t.read(spark).collect()) == want
    t.compact(spark)
    assert sorted(tuple(r) for r in t.read(spark).collect()) == want
