"""Round-5 session-3 operators: TF-IDF keywords, SemDedup pruning, and the
composite curation pipeline. Each test is an independent pure-Python/pandas
oracle or a semantic property the DuckDB entry hash cannot express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops.dedup import (
    embedding_near_dups,
    semdedup_prune,
)
from logminer_kafka_connect_spark.operators.textops.quality import (
    curate_corpus,
    tfidf_keywords,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_tfidf_known_tiny_corpus(spark):
    """Hand-computed oracle: 3 docs, idf separates the shared word from the
    distinctive ones."""
    docs = _docs(
        spark,
        [
            (1, "en", "apple apple banana"),
            (2, "en", "apple cherry"),
            (3, "en", "apple banana banana date"),
        ],
    )
    out = {
        (r.doc_id, r.word): (r.tf, r.df, r.tfidf, r.rank)
        for r in tfidf_keywords(docs, top_k=10).collect()
    }
    n = 3
    # 'apple' appears in all docs -> idf = ln(1) = 0 -> score 0 everywhere
    assert out[(1, "apple")][2] == 0.0
    assert out[(2, "apple")][2] == 0.0
    # doc 1: banana tf=1 df=2
    assert out[(1, "banana")][0] == 1 and out[(1, "banana")][1] == 2
    assert out[(1, "banana")][2] == pytest.approx(round(1 * math.log(n / 2), 6))
    # doc 3: banana tf=2 beats date tf=1 (higher idf but lower product)
    b = out[(3, "banana")]
    d = out[(3, "date")]
    assert b[2] == pytest.approx(round(2 * math.log(n / 2), 6))
    assert d[2] == pytest.approx(round(1 * math.log(n / 1), 6))
    # ranks: within doc 3, date (1.0986) > banana (0.8109) > apple (0)
    assert d[3] == 1 and b[3] == 2 and out[(3, "apple")][3] == 3


def test_tfidf_min_word_len_and_topk(spark):
    docs = _docs(spark, [(1, "en", "a bb ccc dddd"), (2, "en", "ccc xyz")])
    out = tfidf_keywords(docs, top_k=1).collect()
    # words 'a' and 'bb' are dropped by min_word_len=3
    words = {r.word for r in out}
    assert "a" not in words and "bb" not in words
    # top_k=1 -> exactly one row per doc that has any qualifying word
    assert sorted(r.doc_id for r in out) == [1, 2]
    assert all(r.rank == 1 for r in out)


def test_semdedup_drops_exactly_larger_ids_of_near_pairs(spark):
    """Vectors 1/2 identical (cosine 1.0), 3 orthogonal: 2 dropped, 1 and 3
    kept — and the pairs= injection path gives the identical answer."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [2.0, 0.0]),  # same direction as 1
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r.kept for r in semdedup_prune(emb, threshold=0.9).collect()}
    assert out == {1: True, 2: False, 3: True}

    pairs = embedding_near_dups(emb, threshold=0.9)
    out2 = {
        r.vec_id: r.kept
        for r in semdedup_prune(emb, threshold=0.9, pairs=pairs).collect()
    }
    assert out2 == out


def test_semdedup_greedy_rule_is_pairwise_not_transitive(spark):
    """Documented semantics: b dropped by a, c dropped by b even though b is
    itself dropped (the greedy min-id pair rule, order-independent)."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.35]),   # near 1 and near 3
            (3, [0.70, 0.70]),  # near 2, NOT near 1 at 0.89 (cos 0.707)
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(emb, threshold=0.89).collect()
    }
    assert pairs == {(1, 2), (2, 3)}
    out = {r.vec_id: r.kept for r in semdedup_prune(emb, threshold=0.89).collect()}
    assert out == {1: True, 2: False, 3: False}


def test_curation_pipeline_properties(spark):
    text_good = "the quick brown fox and the lazy dog of the meadow runs far"
    rows = [
        (1, "en", text_good),            # kept (dup keeper: min id)
        (2, "en", text_good),            # exact dup of 1 -> dropped
        (3, "fr", text_good),            # wrong lang -> dropped
        (4, "en", "short text"),         # n_words < 10 -> low quality
        (5, "de", "der hund und die katze ist da und das haus ist gross hier"),
        (6, "en", text_good + " again"), # distinct text, kept
    ]
    out = curate_corpus(
        _docs(spark, rows),
        langs=("en", "de"),
        min_quality=0.5,
        weights=[("train", 0.9), ("val", 0.05), ("test", 0.05)],
    )
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 5, 6}
    assert all(r.quality >= 0.5 for r in got.values())
    assert set(out.columns) == {"doc_id", "lang", "quality", "split"}
    assert all(r.split in ("train", "val", "test") for r in got.values())


def test_curation_split_matches_assign_split(spark):
    """The pipeline's split column is exactly sampling.assign_split on the
    surviving ids (same salt/thresholds) — determinism across runs included."""
    from logminer_kafka_connect_spark.operators.textops.sampling import assign_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    out = curate_corpus(docs, weights=w)
    direct = assign_split(out.select("doc_id"), weights=w).withColumnRenamed(
        "split", "split2"
    )
    joined = out.join(direct, "doc_id")
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0
    # deterministic across executions
    again = curate_corpus(docs, weights=w)
    assert (
        out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    )


def test_curation_pipeline_single_exchange(spark):
    """Plan shape: the pipeline shuffles once (the dedup window) — the lang
    filter, quality gate, and split never add an Exchange."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = curate_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
