"""Round-6 measurement harness (bench.py is frozen for the driver; all
optimization-round measurements live here — guide §1).

Modes:
  python bench_extra.py headline [names...]   -- time headline queries like
      bench.py does (count(), same session), 1 rep unless --reps N
  python bench_extra.py all                   -- time EVERY declared query
  python bench_extra.py noop <name> [...]     -- noop-sink isolation (§1.4)
  python bench_extra.py plans [names...]      -- dump explain("formatted")
      to plans/r06/<name>_{before|after}.txt (--tag before|after)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q01_pricing_summary", "a05_latest_per_key", "p06_ordered_concat",
    "o10_topk_per_group", "d14_exact_dedup", "d15_minhash_lsh", "d16_simhash",
    "d20_dup_clusters", "n18_cosine_topk", "n19_ivf_topk", "t21_quality_score",
    "mm_media_features", "w27_session_windows", "a08s_value_percentiles_sketch",
    "mm_jpeg_decode", "j14_asof_join", "t27_unigram_logprob", "d21_decontaminate",
    "d22_bloom_novelty", "d23_incremental_dedup", "a13_funnel_steps",
    "t31_word_entropy", "t32_weighted_sample", "r01_bm25_topk", "g01_pagerank",
    "n21_pq_topk",
]


def _spark():
    from logminer_kafka_connect_spark.session import get_spark

    extra = {}
    if os.environ.get("LMKC_EVENTLOG"):
        os.makedirs(os.environ["LMKC_EVENTLOG"], exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = os.environ["LMKC_EVENTLOG"]
        extra["spark.eventLog.compress"] = "false"
    return get_spark(
        app_name="bench-extra", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS, driver_memory="48g", extra_conf=extra,
    )


def main():
    from logminer_kafka_connect_spark import entry_queries

    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    reps = 1
    tag = "before"
    for a in sys.argv[2:]:
        if a.startswith("--reps="):
            reps = int(a.split("=")[1])
        if a.startswith("--tag="):
            tag = a.split("=")[1]

    if mode == "all":
        names = list(entry_queries.QUERIES)
    elif args:
        names = args
    else:
        names = HEADLINE

    spark = _spark()
    out: dict[str, float] = {}
    if mode == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = entry_queries.QUERIES[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                f.write(p)
            print(f"# wrote plans/r06/{name}_{tag}.txt", file=sys.stderr)
        spark.stop()
        return

    for name in names:
        fn = entry_queries.QUERIES[name]
        times = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            try:
                if mode == "noop":
                    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                    n = -1
                else:
                    n = fn(spark, SF_DIR).count()
            except Exception as e:
                print(f"# {name} rep{rep}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
                times.append(float("nan"))
                break
            dt = time.time() - t0
            times.append(dt)
            print(f"# {name} rep{rep}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        out[name] = round(min(times), 3)
    spark.stop()
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, "queries": out}))


if __name__ == "__main__":
    main()
