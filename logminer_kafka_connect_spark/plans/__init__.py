"""Table plans: versioned snapshot tables + lineage/offsets table."""

from logminer_kafka_connect_spark.plans.lakehouse import SnapshotTable
from logminer_kafka_connect_spark.plans.lineage import LineageLog

__all__ = ["SnapshotTable", "LineageLog"]
