"""PySpark-native CDC ingest engine.

A from-scratch Structured-Streaming/batch replay engine with the query and
data-processing capabilities of the reference connector
``thake/logminer-kafka-connect`` (Kotlin, Oracle LogMiner -> Kafka), rebuilt
Spark-first: change events are a DataFrame, transaction consolidation is a
join, per-key ordering is a window/fold, and the sink is an idempotent
MERGE into a versioned lake table of Common-Crawl-style web pages.

Layout
------
- ``plans/``      versioned snapshot tables (Iceberg-contract on parquet),
                  lineage/offsets table
- ``sources/``    event schema, deterministic generator, snapshot source,
                  redo-log (change event) source
- ``functions/``  Oracle type ladder, redo-SQL parse pandas UDF,
                  HTML->text extraction, name sanitization
- ``operators/``  filters, transaction consolidation, net-effect dedup,
                  merge apply, training-data ops (dedup/similarity/quality)
- ``streaming/``  microbatch replay driver, checkpoint resume, DDL handling

Nothing here is a port: the reference's pull-based row-at-a-time pipeline
(SourceTask.poll -> LogminerFetcher -> TransactionConsolidator ->
ConnectSchemaFactory) is re-expressed as declarative DataFrame plans that
Catalyst optimizes; per-row heavy work (redo-SQL parse, text extraction)
runs in Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from logminer_kafka_connect_spark.engine import (  # noqa: E402,F401
    DEFAULT_SELECTORS,
    PAGES_SCHEMA,
    CdcEngine,
    MultiTableCdcEngine,
    TableSpec,
)
from logminer_kafka_connect_spark.config import (  # noqa: E402,F401
    ConfigError,
    SourceConnectorConfig,
    parse_properties_file,
)
