"""Envelope emission — DMLOperationsTest.kt analog: op chars, before/after
column sets, P4 enrichment, tombstones, op='r' snapshot records."""

from __future__ import annotations

from pyspark.sql import functions as F

from logminer_kafka_connect_spark.engine import PAGES_SCHEMA
from logminer_kafka_connect_spark.operators.apply import parse_committed
from logminer_kafka_connect_spark.operators.consolidate import consolidate
from logminer_kafka_connect_spark.operators.envelope import snapshot_envelope, to_envelope
from logminer_kafka_connect_spark.sources.generator import CdcGenerator, GeneratorConfig


def _parsed(spark):
    gen = CdcGenerator(GeneratorConfig(seed=5, n_txns=40, n_urls=60, n_snapshot=0))
    events = spark.createDataFrame(gen.events_pdf())
    committed = consolidate(events, [("CRAWL", "PAGES")])
    return parse_committed(committed).filter(F.col("parse_error").isNull())


def test_envelope_shapes(spark):
    env = to_envelope(_parsed(spark), PAGES_SCHEMA).cache()
    rows = env.collect()
    assert rows, "no envelope records"
    assert set(env.columns) == {"key", "op", "before", "after", "source", "ts_ms"}
    by_op = {}
    for r in rows:
        by_op.setdefault(r["op"], []).append(r)
    assert set(by_op) <= {"i", "u", "d"}

    for r in by_op.get("i", []):
        assert r["before"] is None and r["after"] is not None
        assert r["after"]["url"] == r["key"]  # key from after on insert
        assert r["after"]["html"] is not None
    for r in by_op.get("u", []):
        assert r["before"] is not None and r["after"] is not None
        assert r["before"]["url"] == r["key"]  # key from before on update
        # P4: after enriched with before's key column
        assert r["after"]["url"] == r["key"]
    for r in by_op.get("d", []):
        assert r["after"] is None and r["before"]["url"] == r["key"]
    # source struct carries txn metadata
    r0 = rows[0]
    assert r0["source"]["connector"].startswith("logminer-kafka-connect-spark")
    assert r0["source"]["scn"] > 0 and r0["source"]["txId"]


def test_envelope_tombstones(spark):
    env = to_envelope(_parsed(spark), PAGES_SCHEMA, tombstones=True)
    pdf = env.groupBy("op").count().collect()
    counts = {r["op"]: r["count"] for r in pdf}
    assert counts.get("t", 0) == counts.get("d", 0)  # one tombstone per delete


def test_snapshot_envelope(spark):
    gen = CdcGenerator(GeneratorConfig(seed=5, n_txns=1, n_snapshot=25))
    snap = spark.createDataFrame(gen.snapshot_pdf())
    env = snapshot_envelope(snap, PAGES_SCHEMA, snapshot_scn=999)
    rows = env.collect()
    assert len(rows) == 25
    assert all(r["op"] == "r" for r in rows)
    assert all(r["source"]["txId"] == "NOT AVAILABLE" for r in rows)
    assert all(r["after"]["url"] == r["key"] for r in rows)


# ---------------------------------------------------------------------------
# Avro schema rendering (SchemaService / ConnectSchemaFactory registration
# parity)
# ---------------------------------------------------------------------------
def test_avro_schemas_render_and_validate():
    import json

    from pyspark.sql import types as T

    from logminer_kafka_connect_spark.functions.avro_schema import (
        envelope_avro_schema,
        key_avro_schema,
    )
    from logminer_kafka_connect_spark.functions.naming import TableId

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("n_views", T.LongType(), True),
            T.StructField("price", T.DecimalType(10, 2), True),
        ]
    )
    tid = TableId("CRAWL", "pages_t")
    key = json.loads(key_avro_schema(schema, tid, ["url"]))
    assert key["name"] == "PagesKey"
    assert key["fields"] == [{"name": "url", "type": "string"}]

    env = json.loads(envelope_avro_schema(schema, tid))
    assert env["name"] == "PagesEnvelope"
    by = {f["name"]: f for f in env["fields"]}
    assert by["op"]["type"] == "string" and by["ts_ms"]["type"] == "long"
    # before defines the row record; after reuses it by name (Avro rule)
    row = by["before"]["type"][1]
    assert row["name"] == "PagesRow" and by["after"]["type"][1] == "lmkc.PagesRow"
    row_fields = {f["name"]: f["type"] for f in row["fields"]}
    assert row_fields["warc_ts"] == ["null", {"type": "long", "logicalType": "timestamp-millis"}]
    assert row_fields["price"] == [
        "null",
        {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2},
    ]
    src_fields = [f["name"] for f in by["source"]["type"]["fields"]]
    assert src_fields == ["version", "connector", "ts_ms", "txId", "scn", "schema", "table", "user"]
