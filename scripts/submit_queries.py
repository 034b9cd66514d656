"""Cluster entrypoint: run driver-contract entries under ``spark-submit``.

Companion to ``submit_job.py`` (the CDC replay app) for the textops/
analytics side of the engine: imports ONLY from the ``--py-files`` zip,
runs the named ``queries()`` entries against a testdata dir, and prints
one JSON line of sorted result rows per entry — the multi-JVM parity
harness (tests/test_cluster_mode.py) diffs them against local-mode runs.

Usage:
    spark-submit --master <master> --py-files lmkc.zip scripts/submit_queries.py \
        --sf-dir /root/testdata/sf0.001 --names d15_minhash_lsh,g01_pagerank
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--names", required=True, help="comma-separated entry names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lmkc-queries").getOrCreate()

    from logminer_kafka_connect_spark import entry_queries

    out = {}
    for name in args.names.split(","):
        df = entry_queries.QUERIES[name](spark, args.sf_dir)
        cols = sorted(df.columns)
        rows = sorted(
            tuple(r[c] for c in cols) for r in df.collect()
        )
        out[name] = {"columns": cols, "rows": [list(r) for r in rows]}
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
