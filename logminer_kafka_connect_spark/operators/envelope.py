"""CDC record envelope — the reference's output format (S6/S7, §1.1).

``ConnectSchemaFactory.kt:122-156`` turns each committed change into a
Kafka SourceRecord: key struct = PK columns, value = Debezium-compatible
envelope ``{op, before, after, source, ts_ms}`` with
``source = {version, connector, ts_ms, txId, scn, schema, table, user}``
(``ConnectSchemaFactory.kt:13-41``, documented ``Readme.md:81-140``), plus
an optional tombstone record after each DELETE (``:138-152``).

Spark-native: one declarative projection over the parsed change stream —
the envelope is a DataFrame (write it to any sink: parquet/Kafka/console).
UPDATE after-images are enriched from the before-image
(after := after ∪ (before \\ after), ``ConnectSchemaFactory.kt:97-104`` —
P4), and key columns come from after for INSERT, before for UPDATE/DELETE
(F9, ``:62-74``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark import __version__
from logminer_kafka_connect_spark.functions.types import decode_image_map
from logminer_kafka_connect_spark.operators.dedup import key_expr
from logminer_kafka_connect_spark.sources.events import OP_DELETE, OP_INSERT, OP_UPDATE

CONNECTOR_NAME = "logminer-kafka-connect-spark"

OP_CHAR = {OP_INSERT: "i", OP_UPDATE: "u", OP_DELETE: "d"}  # Operation.kt:3-8


def _typed_struct(img: Column, schema: T.StructType) -> Column:
    return F.struct(*decode_image_map(img, schema.fields))


def topic_expr(db_name: str) -> Column:
    """Per-row Kafka topic name: ``sanitize(db.name + '.' + owner + '.' +
    table)`` (``SourceDatabaseNameService.kt:5-21``) as a codegen-able
    column expression over the change stream's ``seg_owner``/``table_name``."""
    return F.regexp_replace(
        F.concat_ws(".", F.lit(db_name), F.col("seg_owner"), F.col("table_name")),
        "[^A-Za-z0-9._-]",
        "_",
    )


def to_envelope(
    parsed: DataFrame,
    schema: T.StructType,
    key_col: str = "url",
    tombstones: bool = False,
    db_name: str | None = None,
) -> DataFrame:
    """Parsed committed changes -> envelope records.

    Output columns: ``key, op, before, after, source, ts_ms`` where
    before/after are typed structs of the monitored table's schema.
    ``tombstones=True`` appends a null-valued record per DELETE
    (compaction tombstone, config ``behavior.on.delete`` analog,
    ``SourceConnectorConfig.kt:118-119, 200-206``).
    ``db_name`` (the connector's ``db.name`` logical name) prepends the
    per-row ``topic`` column the reference routes each record by
    (``ConnectSchemaFactory.kt:125``, ``SourceDatabaseNameService.kt:20-21``);
    tombstones go to the same topic as the delete they follow.
    """
    op_char = (
        F.when(F.col("op_code") == OP_INSERT, "i")
        .when(F.col("op_code") == OP_UPDATE, "u")
        .otherwise("d")
    )
    # P4: update after := SET cols overlaid on the before image
    enriched_after = F.when(
        F.col("op_code") == OP_UPDATE,
        F.map_concat(
            F.coalesce(F.col("before"), F.expr("cast(map() as map<string,string>)")),
            F.coalesce(F.col("after"), F.expr("cast(map() as map<string,string>)")),
        ),
    ).otherwise(F.col("after"))

    source = F.struct(
        F.lit(__version__).alias("version"),
        F.lit(CONNECTOR_NAME).alias("connector"),
        (F.unix_millis(F.col("ts"))).alias("ts_ms"),
        F.col("xid").alias("txId"),
        F.col("scn").alias("scn"),
        F.col("commit_scn").alias("commit_scn"),
        F.col("seg_owner").alias("schema"),
        F.col("table_name").alias("table"),
        F.col("username").alias("user"),
    )

    topic_cols = [topic_expr(db_name).alias("topic")] if db_name is not None else []
    env = parsed.select(
        *topic_cols,
        key_expr(key_col.upper()).alias("key"),
        op_char.alias("op"),
        F.when(
            F.col("op_code") != OP_INSERT, _typed_struct(F.col("before"), schema)
        ).alias("before"),
        F.when(
            F.col("op_code") != OP_DELETE, _typed_struct(enriched_after, schema)
        ).alias("after"),
        source.alias("source"),
        F.unix_millis(F.current_timestamp()).alias("ts_ms"),
    )
    if not tombstones:
        return env
    tomb = env.filter(F.col("op") == "d").select(
        *(["topic"] if db_name is not None else []),
        "key",
        F.lit("t").alias("op"),
        F.lit(None).cast(env.schema["before"].dataType).alias("before"),
        F.lit(None).cast(env.schema["after"].dataType).alias("after"),
        F.lit(None).cast(env.schema["source"].dataType).alias("source"),
        "ts_ms",
    )
    return env.unionByName(tomb)


def snapshot_envelope(snapshot: DataFrame, schema: T.StructType, key_col: str = "url", snapshot_scn: int = 0) -> DataFrame:
    """Initial-snapshot rows as ``op='r'`` envelope records
    (``initial/TableFetcher.kt:58-69``: ``transaction='NOT AVAILABLE'``,
    scn = as-of SCN)."""
    source = F.struct(
        F.lit(__version__).alias("version"),
        F.lit(CONNECTOR_NAME).alias("connector"),
        F.unix_millis(F.current_timestamp()).alias("ts_ms"),
        F.lit("NOT AVAILABLE").alias("txId"),
        F.lit(snapshot_scn).cast("long").alias("scn"),
        F.lit(snapshot_scn).cast("long").alias("commit_scn"),
        F.lit(None).cast("string").alias("schema"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("string").alias("user"),
    )
    after = F.struct(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])
    return snapshot.select(
        F.col(key_col).alias("key"),
        F.lit("r").alias("op"),
        F.lit(None).cast(T.StructType(schema.fields)).alias("before"),
        after.alias("after"),
        source.alias("source"),
        F.unix_millis(F.current_timestamp()).alias("ts_ms"),
    )
