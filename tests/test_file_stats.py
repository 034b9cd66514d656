"""Per-file min/max column stats + manifest-based file skipping
(Iceberg data-file stats / `lower_bounds`-`upper_bounds` parity for the
from-scratch lake table)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logminer_kafka_connect_spark.plans.lakehouse import (
    BUCKET_COL,
    OP_COL,
    SET_COLS_COL,
    SnapshotTable,
    _bucket_expr,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("scn", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)

N_BUCKETS = 4


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="lmkc-stats-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mktable(tdir):
    return SnapshotTable.create(
        f"{tdir}/t", SCHEMA, ["url"], n_buckets=N_BUCKETS, stats_cols=["scn", "lang"]
    )


def _bucketed_rows(spark, n=200, scn_base=0):
    """scn is bucket-correlated (scn = bucket*1000 + i + scn_base) so each
    data file's scn range is provably disjoint from every other bucket's."""
    df = spark.range(n).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
        F.col("id").alias("i"),
    )
    b = _bucket_expr(["url"], N_BUCKETS)
    return df.select(
        "url",
        (b.cast("long") * 1000 + F.col("i") + scn_base).alias("scn"),
        F.when(b == 0, F.lit(None).cast("string")).otherwise(F.lit("en")).alias("lang"),
    )


def test_overwrite_records_disjoint_scn_ranges_and_prunes(spark, tdir):
    t = _mktable(tdir)
    t.overwrite(_bucketed_rows(spark))
    meta = t.metadata()
    assert meta["stats_cols"] == ["scn", "lang"]
    paths = sorted({p for ps in meta["buckets"].values() for p in ps})
    assert paths and all(p in meta["file_stats"] for p in paths)

    # predicate inside bucket 2's range keeps exactly one file
    kept, skipped = t.prune_files("scn", 2000, 2999)
    assert len(kept) == 1 and len(skipped) == len(paths) - 1

    # and the pruned read equals the unpruned filtered read
    full = t.read(spark).filter(F.col("scn").between(2000, 2999))
    pruned = t.read_pruned(spark, "scn", 2000, 2999)
    assert sorted(r["url"] for r in pruned.collect()) == sorted(
        r["url"] for r in full.collect()
    )
    assert pruned.count() > 0


def test_all_null_stats_file_is_skipped(spark, tdir):
    """bucket 0's lang is entirely NULL -> [None, None] stats -> skippable
    under any range predicate (a range never selects NULL)."""
    t = _mktable(tdir)
    t.overwrite(_bucketed_rows(spark))
    meta = t.metadata()
    null_paths = [
        p for p, s in meta["file_stats"].items() if s["lang"] == [None, None]
    ]
    assert len(null_paths) == 1  # bucket 0 exists in a 200-row sample
    kept, skipped = t.prune_files("lang", "en", "en")
    assert null_paths[0] in skipped
    assert t.read_pruned(spark, "lang", "en", "en").count() == t.read(spark).filter(
        F.col("lang") == "en"
    ).count()


def test_merge_carries_untouched_stats_and_refreshes_touched(spark, tdir):
    t = _mktable(tdir)
    t.overwrite(_bucketed_rows(spark))
    before = t.metadata()["file_stats"]

    # merge one upsert for a single url -> exactly one bucket rewritten
    src = spark.createDataFrame(
        [("https://ex.com/p7", 999_999, "de")], "url string, scn long, lang string"
    ).select(
        "url", "scn", "lang",
        F.lit("u").alias(OP_COL),
        F.lit(None).cast("array<string>").alias(SET_COLS_COL),
    )
    stats = t.merge(spark, src, batch_id="b1")
    assert stats.applied and stats.affected_buckets == 1
    after = t.metadata()["file_stats"]

    touched_bucket = str(
        spark.createDataFrame([("https://ex.com/p7",)], "url string")
        .select(_bucket_expr(["url"], N_BUCKETS).alias("b"))
        .collect()[0]["b"]
    )
    new_path = t.metadata()["buckets"][touched_bucket][0]
    assert after[new_path]["scn"][1] == 999_999  # fresh stats see the upsert
    for p, s in before.items():
        if p in after and p != new_path:
            assert after[p] == s  # untouched buckets carried forward verbatim

    # pruning on the new high scn finds only the rewritten file
    kept, _ = t.prune_files("scn", 999_999, None)
    assert kept == [new_path]
    rows = t.read_pruned(spark, "scn", 999_999).collect()
    assert [r["url"] for r in rows] == ["https://ex.com/p7"]


def test_rename_keeps_old_stats_usable_and_records_new(spark, tdir):
    t = _mktable(tdir)
    t.overwrite(_bucketed_rows(spark))
    t.rename_column("scn", "scn2")
    assert "scn2" in t.metadata()["stats_cols"]

    # old files' stats (recorded under 'scn') still prune scn2 predicates
    kept, skipped = t.prune_files("scn2", 2000, 2999)
    assert len(kept) == 1 and skipped
    assert t.read_pruned(spark, "scn2", 2000, 2999).count() > 0

    # a post-rename merge records stats under the new name
    src = spark.createDataFrame(
        [("https://ex.com/new", 5_000_000, "fr")],
        "url string, scn2 long, lang string",
    ).select(
        "url", "scn2", "lang",
        F.lit("u").alias(OP_COL),
        F.lit(None).cast("array<string>").alias(SET_COLS_COL),
    )
    assert t.merge(spark, src, batch_id="b2").applied
    kept, _ = t.prune_files("scn2", 5_000_000, None)
    assert len(kept) == 1
    assert [r["url"] for r in t.read_pruned(spark, "scn2", 5_000_000).collect()] == [
        "https://ex.com/new"
    ]


def test_missing_stats_files_are_kept(spark, tdir):
    """A table created WITHOUT stats_cols records nothing and prunes
    nothing — every file is kept for any predicate (safety default)."""
    t = SnapshotTable.create(f"{tdir}/nostat", SCHEMA, ["url"], n_buckets=N_BUCKETS)
    t.overwrite(_bucketed_rows(spark))
    meta = t.metadata()
    assert meta["file_stats"] == {}
    paths = sorted({p for ps in meta["buckets"].values() for p in ps})
    kept, skipped = t.prune_files("scn", 0, 1)
    assert kept == paths and skipped == []


def test_sort_cols_cluster_rows_within_files(spark, tdir):
    """sort_cols writes every data file with monotone sort columns — the
    within-file half of the skipping story: parquet row-group min/max
    become tight, so scans skip row groups inside kept files. Verified
    directly against the written parquet (pyarrow), not via Spark."""
    import glob

    import pyarrow.parquet as pq

    t = SnapshotTable.create(
        f"{tdir}/sorted", SCHEMA, ["url"], n_buckets=N_BUCKETS,
        stats_cols=["scn"], sort_cols=["scn"],
    )
    # shuffle the input ordering hard so sortedness can only come from
    # the writer's task-local sort
    t.overwrite(_bucketed_rows(spark, n=400).orderBy(F.md5("url")))
    meta = t.metadata()
    n_files = 0
    for paths in meta["buckets"].values():
        for d in paths:
            for f in glob.glob(f"{d}/*.parquet"):
                col = pq.read_table(f, columns=["scn"])["scn"].to_pylist()
                assert col == sorted(col), f"unsorted file {f}"
                n_files += 1
    assert n_files >= N_BUCKETS

    # merge path keeps the sort (pre_partitioned branch)
    src = spark.createDataFrame(
        [(f"https://ex.com/p{i}", 50_000 + i, "en") for i in range(0, 400, 7)],
        "url string, scn long, lang string",
    ).select(
        "url", "scn", "lang",
        F.lit("u").alias(OP_COL),
        F.lit(None).cast("array<string>").alias(SET_COLS_COL),
    )
    assert t.merge(spark, src, batch_id="bs").applied
    meta = t.metadata()
    for paths in meta["buckets"].values():
        for d in paths:
            for f in glob.glob(f"{d}/*.parquet"):
                col = pq.read_table(f, columns=["scn"])["scn"].to_pylist()
                assert col == sorted(col), f"unsorted post-merge file {f}"


def test_cdc_replay_with_stats_cols_prunes_replicated_table(spark, tdir):
    """End-to-end integration: a replay into a stats-enabled pages table
    records per-file lang stats through every MERGE, and analytics reads
    on the replicated table prune files while matching the full read."""
    from logminer_kafka_connect_spark.engine import CdcEngine
    from logminer_kafka_connect_spark.sources.generator import (
        SCN0,
        CdcGenerator,
        GeneratorConfig,
    )

    gen = CdcGenerator(GeneratorConfig(seed=29, n_txns=60, n_urls=120, n_snapshot=40))
    engine = CdcEngine(
        spark, f"{tdir}/cdc", n_buckets=8, stats_cols=["lang"], sort_cols=["lang"]
    )
    engine.load_snapshot(
        spark.createDataFrame(gen.snapshot_pdf()), snapshot_scn=SCN0 - 1
    )
    engine.replay(gen.events_df(spark), n_batches=4)

    meta = engine.table.metadata()
    live = {p for ps in meta["buckets"].values() for p in ps}
    assert live and all(p in meta["file_stats"] for p in live)

    langs = sorted(
        r["lang"]
        for r in engine.state().select("lang").distinct().collect()
        if r["lang"] is not None
    )
    assert len(langs) >= 2
    target = langs[0]
    full = sorted(
        r["url"]
        for r in engine.table.read(spark).filter(F.col("lang") == target).collect()
    )
    pruned_df = engine.table.read_pruned(spark, "lang", target, target)
    assert sorted(r["url"] for r in pruned_df.collect()) == full and full


def test_zorder_key_tightens_both_dims_vs_single_sort(spark):
    """Writing files sorted by the Morton key must shrink the combined
    per-file bounding area over BOTH dimensions vs sorting by one column
    (which leaves the other column's ranges at full width)."""
    import math

    from pyspark.sql import functions as F

    from logminer_kafka_connect_spark.functions.zorder import zorder_key

    n = 4096
    df = (
        spark.range(n)
        .select(
            ((F.col("id") * 2654435761) % 10007 % 1000).cast("double").alias("x"),
            ((F.col("id") * 40503) % 9973 % 1000).cast("double").alias("y"),
        )
    )

    def mean_file_area(sorted_df, n_files=16):
        parts = (
            sorted_df.repartitionByRange(n_files, "sk")
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .collect()
        )
        return sum(r["dx"] * r["dy"] for r in parts) / len(parts)

    zsorted = df.withColumn(
        "sk", zorder_key([("x", 0, 1000), ("y", 0, 1000)])
    )
    xsorted = df.withColumn("sk", F.col("x").cast("string"))
    za, xa = mean_file_area(zsorted), mean_file_area(xsorted)
    # single-column sort: dy ~ full width (1000) in every file; z-order
    # shrinks both dims — require at least a 2x combined-area win
    assert za < xa / 2, (za, xa)


def test_zorder_key_clamps_out_of_domain(spark):
    from pyspark.sql import functions as F

    from logminer_kafka_connect_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(
        [(-50.0, 2000.0), (0.0, 0.0), (1000.0, 1000.0)], "x double, y double"
    )
    keys = [
        r["k"]
        for r in df.select(
            zorder_key([("x", 0, 1000), ("y", 0, 1000)]).alias("k")
        ).collect()
    ]
    # below-domain x clamps to rank 0, above-domain y clamps to max rank
    assert keys[0][0::2].lstrip("0") == "" or keys[0][0] == "0"
    assert all(len(k) == 8 for k in keys)  # 16 bits x 2 cols / 4 per hex
