"""Avro schema rendering for the CDC envelope — the registration half of
the reference's Kafka Connect surface.

The reference's ``ConnectSchemaFactory.kt`` builds Connect schemas (key
struct, Debezium-style envelope value) that the Connect framework's Avro
converter registers with a schema registry; consumers discover the shape
of each topic from those schemas. This module renders the equivalent
**Avro record schemas as JSON** for this engine's envelope DataFrames
(``operators/envelope.py``), so a consumer migrating off the reference
can point the same registry tooling at the documents this engine emits.

Driver-side pure functions — no Spark jobs; schemas derive from the
monitored table's StructType exactly as the envelope projection does.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

from logminer_kafka_connect_spark.functions.naming import TableId, sanitize_name

#: Spark -> Avro primitive mapping; logical types follow the Connect/Avro
#: conventions (timestamp-millis on long, date on int, decimal on bytes)
_PRIMITIVES: dict[type, Any] = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(dt: T.DataType) -> Any:
    for spark_t, avro_t in _PRIMITIVES.items():
        if isinstance(dt, spark_t):
            return avro_t
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-millis"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType)}
    raise ValueError(f"no Avro mapping for Spark type {dt.simpleString()}")


def _row_record(schema: T.StructType, name: str, namespace: str) -> dict:
    return {
        "type": "record",
        "name": name,
        "namespace": namespace,
        "fields": [
            {
                "name": sanitize_name(f.name),
                # all table columns nullable in the envelope images (a
                # partial UPDATE's before/after may omit any column)
                "type": ["null", _avro_type(f.dataType)],
                "default": None,
            }
            for f in schema.fields
        ],
    }


def key_avro_schema(
    schema: T.StructType, table: TableId, key_cols: list[str], namespace: str = "lmkc"
) -> str:
    """Key record: the PK columns, non-null (``ConnectSchemaFactory.kt:
    62-74`` builds the key struct from the PK set)."""
    by_name = {f.name: f for f in schema.fields}
    rec = {
        "type": "record",
        "name": f"{table.struct_name}Key",
        "namespace": namespace,
        "fields": [
            {"name": sanitize_name(c), "type": _avro_type(by_name[c].dataType)}
            for c in key_cols
        ],
    }
    return json.dumps(rec, indent=2)


def envelope_avro_schema(
    schema: T.StructType, table: TableId, namespace: str = "lmkc"
) -> str:
    """Envelope value record: ``{op, before, after, source, ts_ms}`` with
    before/after as nullable row records and the reference's source block
    (``ConnectSchemaFactory.kt:13-41``: version, connector, ts_ms, txId,
    scn, schema, table, user)."""
    row = _row_record(schema, f"{table.struct_name}Row", namespace)
    source = {
        "type": "record",
        "name": f"{table.struct_name}Source",
        "namespace": namespace,
        "fields": [
            {"name": "version", "type": "string"},
            {"name": "connector", "type": "string"},
            {"name": "ts_ms", "type": "long"},
            {"name": "txId", "type": ["null", "string"], "default": None},
            {"name": "scn", "type": "long"},
            {"name": "schema", "type": "string"},
            {"name": "table", "type": "string"},
            {"name": "user", "type": ["null", "string"], "default": None},
        ],
    }
    rec = {
        "type": "record",
        "name": f"{table.struct_name}Envelope",
        "namespace": namespace,
        "fields": [
            {"name": "op", "type": "string"},
            {"name": "before", "type": ["null", row], "default": None},
            # 'after' references the row record by name (Avro named-type
            # reuse; defining it twice is a schema error)
            {"name": "after", "type": ["null", f"{namespace}.{row['name']}"], "default": None},
            {"name": "source", "type": source},
            {"name": "ts_ms", "type": "long"},
        ],
    }
    return json.dumps(rec, indent=2)
