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


def _tree_cpu_s() -> float:
    """Total user+sys CPU seconds of this process and every live
    descendant (JVM + pandas-UDF workers) — /proc walk, diagnostics only
    (LMKC_CPUSTAT=1)."""
    import glob

    me = os.getpid()
    ppids = {}
    stats = {}
    for d in glob.glob("/proc/[0-9]*/stat"):
        try:
            parts = open(d).read().rsplit(") ", 1)
            tail = parts[1].split()
            pid = int(d.split("/")[2])
            ppids[pid] = int(tail[1])
            stats[pid] = (int(tail[11]) + int(tail[12])) / os.sysconf("SC_CLK_TCK")
        except Exception:
            pass
    total = 0.0
    for pid in stats:
        p = pid
        for _ in range(20):
            if p == me:
                total += stats[pid]
                break
            p = ppids.get(p, 0)
            if p <= 1:
                break
    return total


def _parse_cores(spec: str) -> list[int]:
    """taskset -c spec ("3", "0-3", "0-1,4-5") -> core id list."""
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def _core_stat(cores: list[int]) -> dict[int, tuple[float, float, float]]:
    """Per-core (steal_s, iowait_s, idle_s) from /proc/stat for the pinned
    cores. Hypervisor steal is the one contention mode tree-CPU accounting
    CANNOT see: the guest's utime/stime clocks stop while the host runs a
    co-tenant, so a stolen window shows up as wall-stall (low occupancy),
    not CPU inflation — the round-4 artifact's 58%-occupancy 1-core
    anchors. Reporting steal directly names the cause."""
    hz = os.sysconf("SC_CLK_TCK")
    out = {}
    try:
        for line in open("/proc/stat"):
            if not line.startswith("cpu"):
                continue
            f = line.split()
            if f[0] == "cpu":
                continue
            cid = int(f[0][3:])
            if cid in cores:
                # user nice system idle iowait irq softirq steal
                out[cid] = (int(f[8]) / hz, int(f[5]) / hz, int(f[4]) / hz)
    except Exception:
        pass
    return out


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

    # Shuffle partitions track cores (the standard ~1-2x total-cores sizing;
    # A/B measured: a fixed high count like 64 costs ~2x at local[8] from
    # per-task pandas-UDF overhead on tiny Arrow batches, while per-core
    # partitions keep batches full). Override with LMKC_SHUFFLE.
    extra = {}
    # Align file-scan splits to the core count: the default 128m
    # maxPartitionBytes packed the bench log into 13 splits — 1.6 waves on
    # 8 cores, measured stage occupancy 0.82 (event-log analysis). A
    # multiple of the core count packs into whole waves.
    extra["spark.sql.files.minPartitionNum"] = str(2 * n_cpus)
    if os.environ.get("LMKC_AQE") == "0":  # A/B knob
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("LMKC_CODEC"):  # A/B knob (shuffle/broadcast/spill codec)
        extra["spark.io.compression.codec"] = os.environ["LMKC_CODEC"]
    if os.environ.get("LMKC_EVENTLOG"):  # diagnostics: job/stage timeline
        os.makedirs(os.environ["LMKC_EVENTLOG"], exist_ok=True)
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = os.environ["LMKC_EVENTLOG"]
        extra["spark.eventLog.compress"] = "false"  # scripts/analyze_eventlog.py
    if os.environ.get("LMKC_GCLOG") or os.environ.get("LMKC_GCOPTS"):  # A/B knobs
        opts = os.environ.get("LMKC_GCOPTS", "-XX:+UseParallelGC")
        if os.environ.get("LMKC_GCLOG"):
            opts += " -Xlog:gc:" + os.environ["LMKC_GCLOG"]
        extra["spark.driver.extraJavaOptions"] = opts
    # LMKC_MASTER=local-cluster[E,C,MB]: multi-JVM evidence — one driver +
    # E separate executor JVMs with real broadcast / accumulator / shuffle
    # serde across process boundaries (everything else on this host shares
    # one local-mode JVM). Executors' Python workers import the package
    # from the repo checkout (same-host analog of --py-files shipping).
    master = os.environ.get("LMKC_MASTER", f"local[{n_cpus}]")
    driver_mem = "48g"
    if master.startswith("local-cluster"):
        e, c, mb = master[len("local-cluster[") : -1].split(",")
        extra["spark.executor.memory"] = f"{int(mb)}m"
        extra["spark.executor.cores"] = c
        extra["spark.executorEnv.PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        driver_mem = "8g"  # executors hold the task heaps in this mode
    spark = get_spark(
        app_name=f"replay-{n_cpus}cpu",
        master=master,
        shuffle_partitions=int(os.environ.get("LMKC_SHUFFLE", str(n_cpus))),
        driver_memory=driver_mem,
        extra_conf=extra,
    )
    workdir = tempfile.mkdtemp(prefix="lmkc-replayw-")
    try:
        timing = os.environ.get("LMKC_TIMING") == "1"
        # LMKC_TRACKING=1: the production configuration — per-batch parse
        # error counts, per-partition lineage, and the open-txn watermark
        # all on (the bench's default measures the steady-state ceiling
        # with bookkeeping off; both numbers ship in BENCH JSON)
        tracking = os.environ.get("LMKC_TRACKING") == "1"
        t_init = time.time()
        engine = CdcEngine(spark, workdir, n_buckets=64)
        engine.driver.track_parse_errors = tracking
        engine.driver.track_partition_lineage = tracking
        engine.driver.track_watermark = tracking
        # salt mode A/B knob: default is the engine default ("auto")
        salt_env = os.environ.get("LMKC_SALT", "auto")
        engine.driver.salt_chunks = (
            None if salt_env == "off" else "auto" if salt_env == "auto" else int(salt_env)
        )
        # one batch over the whole log touches every bucket by construction
        # -> the bulk-replay merge plan (no pre-count job, single pass)
        engine.driver.prune_buckets = False
        engine.load_snapshot(spark.read.parquet(snap_path), snapshot_scn=SCN0 - 1)
        if timing:
            print(f"## worker: session+snapshot load {time.time() - t_init:.2f}s", flush=True)
        events = spark.read.schema(EVENT_SCHEMA).parquet(events_path)

        # Steady-state measurement: warm whole-stage codegen/JIT, the Arrow
        # UDF worker pool, and the OS page cache with a ~2%-of-log slice of
        # the REAL pipeline before starting the clock. The target metric is
        # sustained events/sec on a 10^10-event stream, where JVM warmup is
        # noise; at small bench sizes it would otherwise dominate the
        # low-parallelism run and corrupt the N->4N scaling ratio equally
        # claimed at every level (the warmup runs identically at each).
        t_w = time.time()
        from logminer_kafka_connect_spark.engine import DEFAULT_SELECTORS, PAGES_SCHEMA
        from logminer_kafka_connect_spark.operators.apply import (
            build_merge_source_typed,
            parse_committed_typed,
        )
        from logminer_kafka_connect_spark.operators.consolidate import consolidate
        from pyspark.sql import functions as F

        # LMKC_WARMUP_DIV: 100 -> ~1% of the log warms JIT/Arrow/page cache.
        # Multi-executor masters split the warmup across JVMs (each C2
        # compiler sees only its share of invocations), so cluster runs
        # warm a larger slice — measured: an under-warmed 4-executor replay
        # burns ~1.2x the CPU of a warmed one for the same work.
        #
        # The warm slice is a ~1/warm_div FILE subset of the log, not an
        # scn-prefix: the old scn-prefix needed a min/max bounds job plus
        # two filter-everything scans of all 2.9M events (measured 37s of
        # the 46s per-draw setup at 4 cores) just to feed ~1% of rows to
        # the warm pipeline. A file subset warms the identical operators
        # (scan -> reassembly -> parse -> fold -> merge) on the same row
        # volume while reading ~1% of the bytes. Setup cost only — the
        # measured region is unchanged and starts after warmup either way.
        warm_div = int(os.environ.get("LMKC_WARMUP_DIV", "100"))
        import glob as _glob

        _files = sorted(
            f
            for f in _glob.glob(os.path.join(events_path, "part-*"))
            if not f.endswith(".crc")
        )
        if _files:
            k = max(1, len(_files) // warm_div)
            warm_events = spark.read.schema(EVENT_SCHEMA).parquet(*_files[:k])
        else:  # non-partitioned input: fall back to the full set
            warm_events = events
        # warm the SAME parse mode the measured replay will use (fused
        # reassembly by default; LMKC_FUSED=0 flips both together)
        fused = os.environ.get("LMKC_FUSED", "1") != "0"
        warm = consolidate(
            warm_events, DEFAULT_SELECTORS, None, None, reassemble=not fused
        )
        warm_src = build_merge_source_typed(
            parse_committed_typed(warm, PAGES_SCHEMA, raw_chunks=fused).filter(
                F.col("parse_error").isNull()
            ),
            PAGES_SCHEMA,
        )
        warm_src.write.format("noop").mode("overwrite").save()
        # also warm the merge join+write codegen/JIT with a tiny slice
        warm_engine = CdcEngine(spark, workdir + "-warm", n_buckets=64)
        warm_engine.driver.track_parse_errors = False
        warm_engine.driver.track_partition_lineage = False
        warm_engine.driver.track_watermark = False
        warm_engine.driver.prune_buckets = False
        warm_engine.load_snapshot(spark.read.parquet(snap_path).limit(2000), snapshot_scn=SCN0 - 1)
        warm_engine.replay(warm_events, n_batches=1)
        if timing:
            print(f"## worker: warmup {time.time() - t_w:.2f}s", flush=True)

        # tree CPU ships by default: bench.py uses it to detect co-tenant
        # contamination (a contended window inflates CPU ~30-50% for the
        # same work — host-noise profile, BASELINE.md). LMKC_CPUSTAT=0
        # disables the /proc walk.
        cpustat = os.environ.get("LMKC_CPUSTAT", "1") != "0"
        pinned = _parse_cores(os.environ["LMKC_CORES"]) if os.environ.get("LMKC_CORES") else []
        cpu0 = _tree_cpu_s() if cpustat else 0.0
        stat0 = _core_stat(pinned) if pinned else {}
        t0 = time.time()
        stats = engine.replay(events, n_batches=1)
        wall = time.time() - t0
        out = {
            "wall_s": round(wall, 2),
            "events_per_sec": round(n_events / wall, 1),
            "net_rows": stats.n_events_applied,
        }
        if cpustat:
            cpu = _tree_cpu_s() - cpu0
            out["tree_cpu_s"] = round(cpu, 1)
            # occupancy over the pinned cores (falling back to n_cpus when
            # unpinned): the round-4 estimator blind spot — a wall-stalled
            # draw DEFLATES cpu, which the inflation gate cannot see
            ncores = len(pinned) or n_cpus
            out["occupancy"] = round(cpu / (wall * ncores), 3)
        if stat0:
            stat1 = _core_stat(pinned)
            agg = [0.0, 0.0, 0.0]
            for cid, a in stat0.items():
                b = stat1.get(cid, a)
                for k in range(3):
                    agg[k] += b[k] - a[k]
            denom = wall * max(1, len(pinned))
            out["steal_frac"] = round(agg[0] / denom, 3)
            out["iowait_frac"] = round(agg[1] / denom, 3)
            out["idle_frac"] = round(agg[2] / denom, 3)
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(workdir, ignore_errors=True)
        shutil.rmtree(workdir + "-warm", ignore_errors=True)


if __name__ == "__main__":
    main()
