"""Deterministic sampling / splitting / repetition signals — statistical
properties, determinism guarantees, and independent pandas oracles."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops.sampling import (
    assign_split,
    hash_sample,
    repetition_stats,
    stratified_sample,
)


def _py_u32(key, salt: str) -> int:
    """Independent reimplementation of the membership hash."""
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id").cache()


def test_hash_sample_matches_python_oracle(spark, ids):
    got = sorted(r["doc_id"] for r in hash_sample(ids, 0.3, salt="s1").collect())
    exp = sorted(
        i for i in range(5000) if _py_u32(i, "s1") < int(0.3 * (1 << 32))
    )
    assert got == exp
    # rate sanity: binomial(5000, .3) stays well within 5 sigma
    assert 1300 < len(got) < 1700


def test_hash_sample_is_stable_under_growth(spark, ids):
    """Adding rows never flips earlier decisions (df.sample can't do this)."""
    small = sorted(
        r["doc_id"]
        for r in hash_sample(ids.filter("doc_id < 1000"), 0.5, salt="g").collect()
    )
    small_set = set(small)
    big = set(r["doc_id"] for r in hash_sample(ids, 0.5, salt="g").collect())
    assert all((i in big) == (i in small_set) for i in range(1000))


def test_hash_sample_rate_bounds(spark, ids):
    assert hash_sample(ids, 0.0).count() == 0
    assert hash_sample(ids, 1.0).count() == 5000
    with pytest.raises(ValueError):
        hash_sample(ids, 1.5)


def test_assign_split_partition_and_determinism(spark, ids):
    out = assign_split(ids, [("train", 0.8), ("val", 0.1), ("test", 0.1)])
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5000  # total partition, no row lost
    assert 3800 < counts["train"] < 4200
    # deterministic: two evaluations identical
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(ids, [("train", 0.8), ("val", 0.1), ("test", 0.1)]).collect()}
    assert a == b
    with pytest.raises(ValueError):
        assign_split(ids, [("a", -1.0), ("b", 2.0)])


def test_split_and_sample_are_narrow_plans(spark, ids):
    """The 100-TB property: no Exchange in either plan."""
    for df in (hash_sample(ids, 0.5), assign_split(ids)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_stratified_sample_rates(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, {"en": 0.1, "de": 1.0}, default_rate=0.5)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts["de"] == 2000  # rate 1.0 keeps everything
    assert 130 < counts["en"] < 270  # ~200
    assert 850 < counts["fr"] < 1150  # ~1000 via default_rate
    # per-key decisions match the python oracle
    exp_en = {i for i, l in rows if l == "en" and _py_u32(i, "strata") < int(0.1 * (1 << 32))}
    got_en = {r["doc_id"] for r in out.filter("lang='en'").collect()}
    assert got_en == exp_en


def test_repetition_stats_handcrafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # one line; top 2-gram 'a b' x3 of 5
            (2, "x\nx\ny\nx"),  # 4 lines, 2 distinct
            (3, "unique words only here now"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs, ngram_ns=(2,)).collect()}
    assert got[1]["n_lines"] == 1 and got[1]["dup_line_frac"] == 0.0
    assert got[1]["dup_word_frac"] == round(1 - 2 / 6, 6)
    assert got[1]["top_2gram_frac"] == 0.6  # 'a b' occurs 3x among 5 bigrams
    assert got[2]["n_lines"] == 4 and got[2]["dup_line_frac"] == 0.5
    assert got[3]["dup_word_frac"] == 0.0 and got[3]["top_2gram_frac"] == 0.25
    # short doc fallback: fewer words than n -> single gram, frac 1.0
    one = spark.createDataFrame([(9, "word")], "doc_id long, text string")
    assert repetition_stats(one, ngram_ns=(2,)).collect()[0]["top_2gram_frac"] == 1.0


def test_new_entries_match_duckdb_oracle(spark):
    """Driver-contract gate in miniature for t23/t24/t25 at sf0.001."""
    import duckdb

    from logminer_kafka_connect_spark.entry_queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    for name in ("t23_repetition_stats", "t24_hash_split", "t25_stratified_sample"):
        sdf = QUERIES[name](spark, sf_dir)
        got = sorted(tuple(r) for r in sdf.collect())
        exp = sorted(map(tuple, con.execute(ORACLES[name]).fetchall()))
        assert got == exp, name
        assert len(got) > 0, name


def test_weighted_sample_is_deterministic_and_weight_biased(spark):
    from logminer_kafka_connect_spark.operators.textops.sampling import (
        weighted_sample_per_stratum,
    )

    rows = [(i, "en", 1 if i < 900 else 1000) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    pick = lambda: sorted(
        r.doc_id for r in weighted_sample_per_stratum(df, 50, "w").collect()
    )
    a = pick()
    assert a == pick()  # no RNG state: identical across runs
    # 100 heavy rows at 1000x weight should dominate a 50-draw sample
    heavy = sum(1 for d in a if d >= 900)
    assert heavy >= 40
    # partition-layout independence
    b = sorted(
        r.doc_id
        for r in weighted_sample_per_stratum(df.repartition(17), 50, "w").collect()
    )
    assert a == b
    # zero/negative weights are excluded, never sampled
    df2 = spark.createDataFrame(
        [(1, "en", 0), (2, "en", -5), (3, "en", 7)], "doc_id long, lang string, w long"
    )
    assert [r.doc_id for r in weighted_sample_per_stratum(df2, 10, "w").collect()] == [3]
