"""One cold CDC replay in a dedicated process — invoked by bench.py under
``taskset -c`` so the *whole* process tree (JVM task threads, GC threads,
and pandas-UDF Python workers) is pinned to exactly N CPUs. ``local[N]``
alone under-counts: Arrow UDF workers are separate processes outside
Spark's task-slot accounting.

Usage: replay_worker.py <n_cpus> <events_path> <snapshot_path> <n_events>
Prints one JSON line {"wall_s": ..., "events_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_cpus, events_path, snap_path, n_events = (
        int(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    from logminer_kafka_connect_spark.engine import CdcEngine
    from logminer_kafka_connect_spark.session import get_spark
    from logminer_kafka_connect_spark.sources.events import EVENT_SCHEMA
    from logminer_kafka_connect_spark.sources.generator import SCN0

    spark = get_spark(
        app_name=f"replay-{n_cpus}cpu",
        master=f"local[{n_cpus}]",
        shuffle_partitions=n_cpus,
        driver_memory="48g",
    )
    workdir = tempfile.mkdtemp(prefix="lmkc-replayw-")
    try:
        engine = CdcEngine(spark, workdir, n_buckets=64)
        engine.driver.track_parse_errors = False
        engine.driver.track_partition_lineage = False
        engine.driver.track_watermark = False
        engine.load_snapshot(spark.read.parquet(snap_path), snapshot_scn=SCN0 - 1)
        events = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
        t0 = time.time()
        stats = engine.replay(events, n_batches=1)
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "wall_s": round(wall, 2),
                    "events_per_sec": round(n_events / wall, 1),
                    "net_rows": stats.n_events_applied,
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
