"""Initial snapshot source (S2/S3/T4) — snapshot-then-stream handoff.

Reference: flashback query ``SELECT t.*, ROWID, ORA_ROWSCN FROM {table} AS
OF SCN {scn}`` keyset-paginated row-at-a-time (``initial/TableFetcher.kt:
20-23``, ``initial/SelectSource.kt:51-99``), rows emitted with ``op='r'``.

Spark-native: the snapshot is one distributed read — either of an existing
SnapshotTable version (time travel = the AS OF SCN analog) or of any source
DataFrame — loaded with a single ``overwrite`` commit. No pagination, no
keyset resume (a failed load just reruns; the commit is atomic). The
captured ``snapshot_scn`` is where the CDC stream starts (F8/T4 handoff,
``SourceTask.kt:124-131``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.plans.lakehouse import SnapshotTable


def load_snapshot(table: SnapshotTable, source: DataFrame, snapshot_scn: int) -> dict:
    """Phase-1 batch job: consistent full load, ``op='r'`` semantics.

    Returns the handoff offset: the CDC phase replays commits with
    ``commit_scn > snapshot_scn`` (``SelectOffset.toOracleLogOffset``,
    ``Offset.kt:45``).
    """
    batch_id = f"snapshot-{snapshot_scn}"
    stats = table.overwrite(source, batch_id=batch_id)
    return {
        "batch_id": batch_id,
        "snapshot_scn": snapshot_scn,
        "applied": stats.applied,
        "table_version": stats.version,
    }


def snapshot_records(table: SnapshotTable, spark, version: int | None = None) -> DataFrame:
    """S2 as a *source*: emit a table version as ``op='r'`` CDC records
    (for consumers that want the envelope stream rather than the table)."""
    return table.read(spark, version=version).withColumn("op", F.lit("r"))
