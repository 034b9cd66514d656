"""LineageLog — the offsets / lineage table (T1, A7 in SURVEY.md).

The reference resumes from a Kafka Connect offset map
(``Offset.kt:19-38``: ``scn, commitScn, isTransactionComplete``). Our analog
is an append-only parquet log with one *batch record* per applied microbatch
plus its per-partition lineage rows:

- batch record: ``batch_id, scn_lo, scn_hi, commit_watermark (A1: min SCN of
  still-open transactions — the safe resume point, TransactionConsolidator.
  kt:57-62,113-115), n_events, n_applied, table_version, wall_s``
- partition rows: ``batch_id, partition_id, scn_min, scn_max, n_rows``
  (north_rule per-partition lineage; the reference's analog is the offset
  map attached to every SourceRecord, ConnectSchemaFactory.kt:129-131).

Appends are tiny driver-side writes (one JSON line per batch + one small
parquet per batch for partition rows); resume scans the JSON log. The
batch record is written only *after* the table commit, and the table commit
itself records the batch_id, so a crash between the two is healed by the
merge's idempotence check (replay of the batch is a no-op, then the lineage
record is re-written).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from logminer_kafka_connect_spark.plans.fs import LocalFS


class LineageLog:
    def __init__(self, path: str, fs=None):
        self.path = path
        self.fs = fs or LocalFS()
        self._batches = os.path.join(path, "batches.jsonl")
        self._parts_dir = os.path.join(path, "partitions")
        self.fs.makedirs(self._parts_dir)

    def record_batch(self, record: dict[str, Any], partition_df: DataFrame | None = None) -> None:
        if partition_df is not None:
            out = os.path.join(self._parts_dir, f"batch-{record['batch_id']}")
            partition_df.write.mode("overwrite").parquet(out)
        existing = ""
        if self.fs.exists(self._batches):
            existing = self.fs.read_text(self._batches)
        self.fs.write_text_atomic(self._batches, existing + json.dumps(record) + "\n")

    def batches(self) -> list[dict[str, Any]]:
        if not self.fs.exists(self._batches):
            return []
        out = []
        for line in self.fs.read_text(self._batches).splitlines():
            line = line.strip()
            if line:
                out.append(json.loads(line))
        return out

    def last_batch(self) -> dict[str, Any] | None:
        b = self.batches()
        return b[-1] if b else None

    def applied_batch_ids(self) -> set[str]:
        return {b["batch_id"] for b in self.batches()}

    def partition_lineage(self, spark: SparkSession) -> DataFrame | None:
        if not self.fs.listdir(self._parts_dir):
            return None
        return spark.read.parquet(os.path.join(self._parts_dir, "batch-*"))
