"""Dump the replay merge-source physical plan under the round-5 and
round-6 salting modes (guide §7.2 evidence for OPTIMIZATION_r06.md §1).

  before = salt_chunks=8 (round-5 "auto": EVERY key takes the two-phase
           salted fold -> the per-(key,chunk) partial images are a second
           full-payload Exchange)
  after  = salt_chunks=(8, [hot keys]) (round-6 "auto": only detected hot
           keys fold two-phase; the bulk folds single-phase, one Exchange)

Usage: python scripts/dump_merge_source_plans.py
Writes plans/r06/replay_merge_source_{before,after}.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logminer_kafka_connect_spark.engine import DEFAULT_SELECTORS, PAGES_SCHEMA
from logminer_kafka_connect_spark.operators.apply import (
    build_merge_source_typed,
    parse_committed_typed,
)
from logminer_kafka_connect_spark.operators.consolidate import consolidate
from logminer_kafka_connect_spark.session import get_spark
from logminer_kafka_connect_spark.sources.generator import CdcGenerator, GeneratorConfig


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="dump-merge-plans", master="local[4]", shuffle_partitions=8
    )
    gen = CdcGenerator(
        GeneratorConfig(seed=42, n_txns=2000, n_urls=2000, n_snapshot=500)
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="lmkc-plandump-")
    gen.events_df(spark, n_partitions=8).write.mode("overwrite").parquet(f"{d}/events")
    events = spark.read.parquet(f"{d}/events")
    lo = events.agg(F.min("scn")).collect()[0][0]
    hi = events.agg(F.max("scn")).collect()[0][0] + 1
    committed = parse_committed_typed(
        consolidate(events, DEFAULT_SELECTORS, None, hi), PAGES_SCHEMA
    ).filter(F.col("parse_error").isNull())

    os.makedirs("plans/r06", exist_ok=True)
    variants = {
        "before": (
            8,
            "salt_chunks=8 — round-5 auto: ALL keys two-phase; the per-(key,chunk)\n"
            "partial images are a second full-payload Exchange (813 MB at bench scale)",
        ),
        "after": (
            (8, ["https://example.org/page/1"]),
            "salt_chunks=(8, hot_keys) — round-6 auto: only detected hot keys fold\n"
            "two-phase; the bulk folds single-phase and is shuffled exactly once",
        ),
    }
    for tag, (salt, note) in variants.items():
        src = build_merge_source_typed(
            committed, PAGES_SCHEMA, salt_chunks=salt, scn_bounds=(lo, hi)
        )
        path = f"plans/r06/replay_merge_source_{tag}.txt"
        with open(path, "w") as f:
            f.write(f"# replay merge source ({tag}): {note}\n\n")
            f.write(explain_str(src))
        n_ex = open(path).read().count("Exchange")
        print(f"wrote {path} ({n_ex} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
