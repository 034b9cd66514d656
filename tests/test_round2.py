"""Round-2 behaviors: parse-failure routing robustness, db-timezone
normalization (single conversion), marker rollback flag, trailing DDL,
schema-miss quarantine + lazy refresh-retry (T9), ANN recall floor.

Reference behaviors pinned here:
- any malformed redo statement is a *routed* parse failure, never a task
  crash (``TransactionConsolidator.kt:66-69``)
- naive timestamp literals are db-zone and converted exactly once
  (``ColumnSchemaBuilder.kt:129-194``)
- ``WHERE ROLLBACK = 0`` applies to the whole scan, markers included
  (``LogminerSession.kt:185-187``)
- a record referencing a column unknown to the schema triggers refresh +
  retry, and is never silently dropped (``TransactionConsolidator.kt:79-89``,
  ``ChangingTableTest.kt:42-93``)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.engine import CdcEngine
from logminer_kafka_connect_spark.functions.redo_parse import _parse_one
from logminer_kafka_connect_spark.operators.filters import filter_markers
from logminer_kafka_connect_spark.sources.events import EVENT_SCHEMA


def _ev(scn, op_code, sql=None, xid="tx1", row_id=None, **kw):
    ops = {1: "INSERT", 2: "DELETE", 3: "UPDATE", 5: "DDL", 7: "COMMIT", 36: "ROLLBACK"}
    base = dict(
        scn=scn,
        commit_scn=None,
        ts=None,
        op_code=op_code,
        operation=ops[op_code],
        seg_owner="CRAWL",
        table_name="PAGES",
        username="APP",
        sql_redo=sql,
        row_id=row_id or f"r{scn}",
        csf=False,
        seq=0,
        xid=xid,
        status=0,
        rollback=0,
    )
    base.update(kw)
    return base


def _events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


# ---------------------------------------------------------- parse robustness
BAD_STATEMENTS = [
    # truncated mid-values: used to IndexError out of the UDF
    'insert into "CRAWL"."PAGES"("URL") values (',
    'insert into "CRAWL"."PAGES"("URL") values (TIMESTAMP',
    # unknown zone name: ZoneInfoNotFoundError must be routed
    "insert into \"CRAWL\".\"PAGES\"(\"URL\",\"WARC_TS\") values "
    "('u',TIMESTAMP '2024-01-01 00:00:00 Not/AZone XYZ')",
    # unterminated string
    'insert into "CRAWL"."PAGES"("URL") values (\'oops)',
]

# odd-length hex: fails only where bytes.fromhex runs (the typed UDF path)
BAD_HEX_INSERT = 'insert into "CRAWL"."PAGES"("URL","HTML") values (\'u\',HEXTORAW(\'abc\'))'


def test_parse_failures_routed_not_raised():
    for sql in BAD_STATEMENTS:
        before, after, err = _parse_one(sql)
        assert err is not None, sql
        assert before is None and after is None


def test_typed_udf_routes_bad_hex(spark, tmpdir_path):
    """End-to-end through the typed Arrow UDF: corrupt statements land in
    the quarantine, good ones in the table — the job never dies."""
    good = (
        'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://ok\',\'en\')'
    )
    rows = [
        _ev(100, 1, good, xid="t1"),
        _ev(101, 1, BAD_HEX_INSERT, xid="t1", row_id="rbad"),
        _ev(110, 7, xid="t1"),
    ]
    engine = CdcEngine(spark, tmpdir_path, n_buckets=4)
    stats = engine.replay(_events_df(spark, rows), n_batches=1)
    assert stats.n_parse_errors == 1
    state = engine.state().toPandas()
    assert list(state["url"]) == ["http://ok"]
    qdir = os.path.join(tmpdir_path, "quarantine")
    qpdf = spark.read.parquet(os.path.join(qdir, "batch-*")).toPandas()
    assert len(qpdf) == 1
    assert qpdf["sql_redo"].iloc[0] == BAD_HEX_INSERT
    assert "fromhex" in qpdf["parse_error"].iloc[0] or "non-hex" in qpdf["parse_error"].iloc[0].lower() or qpdf["parse_error"].iloc[0]


# ------------------------------------------------------------- db timezone
def test_db_timezone_converted_exactly_once(spark, tmpdir_path):
    naive = (
        'insert into "CRAWL"."PAGES"("URL","WARC_TS") values '
        "('http://naive',TIMESTAMP '2024-06-01 12:00:00')"
    )
    zoned = (
        'insert into "CRAWL"."PAGES"("URL","WARC_TS") values '
        "('http://zoned',TIMESTAMP '2024-06-01 12:00:00 US/Pacific PDT')"
    )
    offset = (
        'insert into "CRAWL"."PAGES"("URL","WARC_TS") values '
        "('http://offset',TIMESTAMP '2024-06-01 12:00:00 +03:00')"
    )
    rows = [
        _ev(100, 1, naive, xid="t1", row_id="a"),
        _ev(101, 1, zoned, xid="t1", row_id="b"),
        _ev(102, 1, offset, xid="t1", row_id="c"),
        _ev(110, 7, xid="t1"),
    ]
    engine = CdcEngine(spark, tmpdir_path, n_buckets=4)
    engine.driver.db_timezone = "Europe/Berlin"  # CEST in June: UTC+2
    engine.replay(_events_df(spark, rows), n_batches=1)
    got = {
        r["url"]: str(r["warc_ts"])
        for r in engine.state().select("url", "warc_ts").collect()
    }
    assert got["http://naive"] == "2024-06-01 10:00:00"  # shifted ONCE
    assert got["http://zoned"] == "2024-06-01 19:00:00"  # PDT=UTC-7, no re-shift
    assert got["http://offset"] == "2024-06-01 09:00:00"  # +03:00, no re-shift


# --------------------------------------------------------------- marker flag
def test_marker_with_rollback_flag_is_ignored(spark):
    rows = [
        _ev(100, 7, xid="t1", rollback=1),  # in-place-rolled-back marker
        _ev(101, 7, xid="t2", rollback=0),
    ]
    kept = filter_markers(_events_df(spark, rows)).select("xid").collect()
    assert [r["xid"] for r in kept] == ["t2"]


# --------------------------------------------------------------- trailing DDL
def test_trailing_ddl_after_last_commit_applied(spark, tmpdir_path):
    rows = [
        _ev(100, 1, 'insert into "CRAWL"."PAGES"("URL") values (\'http://a\')', xid="t1"),
        _ev(110, 7, xid="t1"),
        # ALTER strictly after the final commit marker
        _ev(120, 5, 'alter table CRAWL.PAGES add ("RANK_SCORE" NUMBER(5) DEFAULT 7)', xid="ddl1"),
    ]
    engine = CdcEngine(spark, tmpdir_path, n_buckets=4)
    engine.replay(_events_df(spark, rows), n_batches=1)
    schema = engine.table.schema()
    assert "rank_score" in [f.name for f in schema.fields]
    state = engine.state().toPandas()
    assert state["rank_score"].iloc[0] == 7  # initial default fills old rows


# ----------------------------------------------- schema miss: T9 lazy refresh
UNKNOWN_COL_INSERT = (
    'insert into "CRAWL"."PAGES"("URL","EXTRA_COL") values (\'http://x\',\'v1\')'
)


def _schema_miss_rows():
    return [
        _ev(100, 1, 'insert into "CRAWL"."PAGES"("URL") values (\'http://base\')', xid="t1"),
        _ev(101, 1, UNKNOWN_COL_INSERT, xid="t1", row_id="rx"),
        _ev(110, 7, xid="t1"),
    ]


def test_schema_miss_quarantined_never_silently_dropped(spark, tmpdir_path):
    engine = CdcEngine(spark, tmpdir_path, n_buckets=4)
    stats = engine.replay(_events_df(spark, _schema_miss_rows()), n_batches=1)
    assert stats.n_parse_errors == 1
    urls = sorted(r["url"] for r in engine.state().select("url").collect())
    assert urls == ["http://base"]  # the miss row is NOT half-applied
    qpdf = spark.read.parquet(
        os.path.join(tmpdir_path, "quarantine", "batch-*")
    ).toPandas()
    assert len(qpdf) == 1
    assert "schema_miss: EXTRA_COL" in qpdf["parse_error"].iloc[0]
    assert qpdf["sql_redo"].iloc[0] == UNKNOWN_COL_INSERT  # data preserved
    rec = engine.lineage.last_batch()
    assert rec["n_quarantined"] == 1


def test_schema_miss_refresh_retry_applies_data(spark, tmpdir_path):
    """With a schema provider (the SchemaService/dictionary analog) the
    batch is re-parsed against the evolved schema and the data lands."""

    def provider(col: str):
        if col == "EXTRA_COL":
            return T.StringType(), None
        return None

    engine = CdcEngine(spark, tmpdir_path, n_buckets=4, schema_provider=provider)
    stats = engine.replay(_events_df(spark, _schema_miss_rows()), n_batches=1)
    assert stats.n_parse_errors == 0
    state = engine.state().toPandas().set_index("url")
    assert state.loc["http://x", "extra_col"] == "v1"
    assert state.loc["http://base", "extra_col"] is None or state.loc[
        "http://base", "extra_col"
    ] != state.loc["http://base", "extra_col"]  # null/NaN
    rec = engine.lineage.last_batch()
    assert rec["n_quarantined"] == 0


# ------------------------------------------------------------- ANN recall
def test_ann_recall_floor(spark):
    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(sf_dir):
        pytest.skip("testdata not present")
    from logminer_kafka_connect_spark import entry_queries

    rec = entry_queries.QUERIES["ann_recall"](spark, sf_dir)
    mean = rec.agg(F.avg("recall_at_k").alias("m")).collect()[0]["m"]
    assert mean >= 0.6, f"LSH ANN mean recall@3 too low: {mean}"


# ------------------------------------------------- F7 fine-grained resume
def test_skip_to_offset_row_id_granularity(spark, tmpdir_path):
    """F7 — resume mid-SCN: changes at the resume SCN with row_id at or
    below the offset are skipped; later row_ids at the same SCN replay
    (the reference's cursor semantics, LogminerFetcher.kt:51,74-101)."""
    rows = [
        _ev(100, 1, 'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://a\',\'en\')',
            xid="t1", row_id="r1"),
        _ev(100, 1, 'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://b\',\'de\')',
            xid="t1", row_id="r2"),
        _ev(101, 1, 'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://c\',\'fr\')',
            xid="t1", row_id="r3"),
        _ev(110, 7, xid="t1"),
    ]
    engine = CdcEngine(spark, tmpdir_path, n_buckets=4)
    engine.replay(_events_df(spark, rows), n_batches=1, start_offset=(100, "r1"))
    urls = sorted(r["url"] for r in engine.state().select("url").collect())
    assert urls == ["http://b", "http://c"]  # r1 skipped, r2 at same scn kept


# -------------------------------------------- start.scn policies (F8/T4)
def test_start_scn_policies_current_vs_full_history(spark, tmpdir_path):
    """The reference's two start.scn policies (SourceTaskTest.kt:122-178):
    start.scn=current -> snapshot only, skip redo history; start.scn=1/None
    -> replay the full history through CDC."""
    import shutil

    rows = [
        _ev(100, 1, 'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://old\',\'en\')',
            xid="t1"),
        _ev(110, 7, xid="t1"),
    ]
    events = _events_df(spark, rows)
    current_scn = events.agg(F.max("scn")).collect()[0][0]

    # policy: full history (start.scn=1) — the historical insert replays
    full = CdcEngine(spark, os.path.join(tmpdir_path, "full"), n_buckets=4)
    full.replay(events, n_batches=1)
    assert [r["url"] for r in full.state().select("url").collect()] == ["http://old"]

    # policy: current — history skipped; later events (scn > current) apply
    cur = CdcEngine(spark, os.path.join(tmpdir_path, "cur"), n_buckets=4)
    stats = cur.replay(events, n_batches=1, start_scn=current_scn)
    assert stats.n_events_applied == 0
    assert cur.state().count() == 0
    later = rows + [
        _ev(200, 1, 'insert into "CRAWL"."PAGES"("URL","LANG") values (\'http://new\',\'de\')',
            xid="t2"),
        _ev(210, 7, xid="t2"),
    ]
    cur.replay(_events_df(spark, later), n_batches=1, start_scn=current_scn)
    assert [r["url"] for r in cur.state().select("url").collect()] == ["http://new"]
    shutil.rmtree(tmpdir_path, ignore_errors=True)
