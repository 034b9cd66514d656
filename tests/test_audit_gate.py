"""Write-audit-publish gate on the replay driver (audit_hook).

Extends the T7 exactly-once family: every batch stages on a table branch
and lands on main only through a fast-forward publish after the hook
approves; a rejection never touches main and leaves the batch id
unapplied for a post-fix rerun.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.engine import CdcEngine
from logminer_kafka_connect_spark.sources.generator import SCN0, CdcGenerator, GeneratorConfig
from logminer_kafka_connect_spark.streaming.driver import AuditRejectedError

CFG = GeneratorConfig(seed=23, n_txns=40, n_urls=80, n_snapshot=30)


def _expected(gen):
    return (
        gen.expected_final_state(include_snapshot=True)
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_audited_replay_matches_unaudited(spark, tmpdir_path):
    gen = CdcGenerator(CFG)
    audits = []

    def hook(df):
        audits.append(df.count())
        return True

    eng = CdcEngine(spark, f"{tmpdir_path}/a", n_buckets=8, audit_hook=hook)
    eng.load_snapshot(spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1)
    stats = eng.replay(gen.events_df(spark), n_batches=4)
    assert stats.n_parse_errors == 0
    assert len(audits) >= 4  # the hook really gated every applied batch

    twin = CdcEngine(spark, f"{tmpdir_path}/b", n_buckets=8)
    twin.load_snapshot(spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1)
    twin.replay(gen.events_df(spark), n_batches=4)
    a = eng.state().orderBy("url").toPandas()
    b = twin.state().orderBy("url").toPandas()
    pd.testing.assert_frame_equal(a, b)
    # no branch leftovers on the main table
    import os

    bdir = f"{tmpdir_path}/a/pages_table/branches"
    leftover = [
        n for n in (os.listdir(bdir) if os.path.exists(bdir) else [])
        if os.path.exists(f"{bdir}/{n}/metadata")
    ]
    assert leftover == []


def test_rejected_batch_never_touches_main_and_reruns(spark, tmpdir_path):
    gen = CdcGenerator(CFG)
    state = {"reject": True, "calls": 0}

    def hook(df):
        state["calls"] += 1
        return not state["reject"]

    eng = CdcEngine(spark, f"{tmpdir_path}/t", n_buckets=8, audit_hook=hook)
    eng.load_snapshot(spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1)
    v0 = eng.table.current_version()
    with pytest.raises(AuditRejectedError, match="main table untouched"):
        eng.replay(gen.events_df(spark), n_batches=4)
    # main never advanced past the snapshot; snapshot state intact
    assert eng.table.current_version() == v0
    snap = gen.snapshot_pdf().sort_values("url").reset_index(drop=True)
    got = eng.state().select("url").orderBy("url").toPandas()
    assert list(got["url"]) == list(snap["url"])

    # operator fixes the upstream issue -> rerun with the SAME batch ids
    state["reject"] = False
    stats = eng.replay(gen.events_df(spark), n_batches=4)
    assert stats.n_parse_errors == 0
    a = eng.state().orderBy("url").toPandas().sort_values("url").reset_index(drop=True)
    exp = _expected(gen)
    assert list(a["url"]) == list(exp["url"])
    assert list(a["lang"].fillna("~")) == list(exp["lang"].fillna("~"))


def test_audit_hook_sees_staged_not_main_state(spark, tmpdir_path):
    """The hook's DataFrame is the BRANCH state (snapshot + this batch),
    not main: on the first audited batch it must already contain rows
    main does not have yet."""
    gen = CdcGenerator(GeneratorConfig(seed=29, n_txns=20, n_urls=40, n_snapshot=0))
    seen = []

    def hook(df):
        seen.append(df.count())
        return True

    eng = CdcEngine(spark, f"{tmpdir_path}/t", n_buckets=8, audit_hook=hook)
    # no snapshot: main starts empty, so the first staged count must be > 0
    eng.replay(gen.events_df(spark), n_batches=2)
    assert seen and seen[0] > 0
    assert eng.state().count() == len(gen.expected_final_state(include_snapshot=False))


def test_audit_gate_composes_with_streaming(spark, tmpdir_path):
    """run_streaming funnels every trigger through the same gated
    _apply_to_table: a streaming tail with an approving hook converges to
    the generator oracle, and the hook fired for the applied batches."""
    import os
    import time as _time

    cfg = GeneratorConfig(seed=31, n_txns=30, n_urls=60, n_snapshot=20)
    gen = CdcGenerator(cfg)
    events_path = os.path.join(tmpdir_path, "events")
    (
        gen.events_df(spark)
        .repartitionByRange(4, "scn")
        .sortWithinPartitions("scn", "row_id", "seq")
        .write.mode("overwrite")
        .parquet(events_path)
    )
    now = _time.time()
    for i, f in enumerate(sorted(p for p in os.listdir(events_path) if p.startswith("part-"))):
        os.utime(os.path.join(events_path, f), (now + i, now + i))

    audits = []

    def hook(df):
        audits.append(df.count())
        return True

    eng = CdcEngine(spark, tmpdir_path, n_buckets=8, audit_hook=hook)
    eng.load_snapshot(spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1)
    q = eng.run_streaming(events_path, os.path.join(tmpdir_path, "ckpt"), max_files_per_trigger=2)
    q.awaitTermination(300)
    assert audits, "streaming triggers never hit the audit hook"
    exp = gen.expected_final_state(include_snapshot=True)
    got = eng.state().orderBy("url").toPandas()
    assert list(got["url"]) == list(exp.sort_values("url")["url"])


def test_audit_gate_multitable(spark, tmpdir_path):
    """The gate applies per (batch, table) in the multi-table driver:
    every staged state the hook sees belongs to exactly one table, and
    both final states match ungated twins."""
    from pyspark.sql import types as T

    from logminer_kafka_connect_spark.engine import (
        PAGES_SCHEMA,
        MultiTableCdcEngine,
        TableSpec,
    )

    links_schema = T.StructType(
        [
            T.StructField("link_id", T.StringType(), False),
            T.StructField("src_url", T.StringType(), True),
            T.StructField("href", T.StringType(), True),
            T.StructField("anchor", T.StringType(), True),
        ]
    )
    specs = [
        TableSpec("CRAWL", "PAGES", PAGES_SCHEMA, "url"),
        TableSpec("CRAWL", "LINKS", links_schema, "link_id"),
    ]
    gen = CdcGenerator(
        GeneratorConfig(seed=43, n_txns=60, n_urls=100, n_snapshot=30, p_links_txn=0.3)
    )
    audited_cols = []

    def hook(df):
        audited_cols.append(tuple(sorted(df.columns)))
        return True

    eng = MultiTableCdcEngine(spark, f"{tmpdir_path}/a", specs, n_buckets=4)
    eng.driver.audit_hook = hook
    eng.load_snapshot("PAGES", spark.createDataFrame(gen.snapshot_pdf()), SCN0 - 1)
    eng.replay(gen.events_df(spark), n_batches=3)
    assert audited_cols
    pages_cols = tuple(sorted(f.name for f in PAGES_SCHEMA.fields))
    links_cols = tuple(sorted(f.name for f in links_schema.fields))
    assert set(audited_cols) <= {pages_cols, links_cols}
    assert pages_cols in audited_cols and links_cols in audited_cols

    twin = MultiTableCdcEngine(spark, f"{tmpdir_path}/b", specs, n_buckets=4)
    twin.load_snapshot("PAGES", spark.createDataFrame(gen.snapshot_pdf()), SCN0 - 1)
    twin.replay(gen.events_df(spark), n_batches=3)
    for name, key in [("PAGES", "url"), ("LINKS", "link_id")]:
        a = eng.state(name).orderBy(key).toPandas()
        b = twin.state(name).orderBy(key).toPandas()
        pd.testing.assert_frame_equal(a, b)


def test_crashed_publish_drop_window_reclaimed_on_retry(spark, tmpdir_path):
    """Crash between publish_branch and drop_branch: the batch IS applied
    on main, stale published-branch metadata remains. The idempotent
    retry must skip the batch AND reclaim the metadata (data subtree
    stays — main references it)."""
    gen = CdcGenerator(GeneratorConfig(seed=53, n_txns=15, n_urls=30, n_snapshot=10))
    eng = CdcEngine(spark, f"{tmpdir_path}/t", n_buckets=8, audit_hook=lambda df: True)
    eng.load_snapshot(spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1)
    events = gen.events_df(spark)

    # simulate the crash window: publish succeeds, the drop right after
    # it never runs (earlier reclamation drops must still work)
    orig_drop, orig_pub = eng.table.drop_branch, eng.table.publish_branch
    published = {"done": False}

    def pub(name):
        v = orig_pub(name)
        published["done"] = True
        return v

    def drop(name):
        if published["done"]:
            raise KeyboardInterrupt
        return orig_drop(name)

    eng.table.publish_branch, eng.table.drop_branch = pub, drop
    with pytest.raises(KeyboardInterrupt):
        eng.replay(events, n_batches=1)
    eng.table.drop_branch, eng.table.publish_branch = orig_drop, orig_pub
    stale = [b["name"] for b in eng.table.list_branches()]
    assert stale, "fixture broken: no stale branch left behind"
    state_before = sorted(r.url for r in eng.state().select("url").collect())

    # retry: batch skips (already published) and the stale branch is gone
    stats = eng.replay(events, n_batches=1)
    assert stats.n_events_applied == 0
    assert eng.table.list_branches() == []
    assert sorted(r.url for r in eng.state().select("url").collect()) == state_before
