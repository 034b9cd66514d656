"""Round-5 additions: approx_percentile sketch accuracy vs the exact
baseline (value-error at a dense scale, rank-error everywhere)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.entry_queries import QUERIES


def _collect(spark, sf_dir):
    exact = {
        r["event_type"]: r for r in QUERIES["a08_value_percentiles"](spark, sf_dir).collect()
    }
    sketch = {
        r["event_type"]: r
        for r in QUERIES["a08s_value_percentiles_sketch"](spark, sf_dir).collect()
    }
    assert set(exact) == set(sketch) and len(exact) >= 3
    return exact, sketch


def test_sketch_percentiles_within_one_pct_of_range_at_sf001(spark):
    """|sketch - exact| <= 1% of the per-group value range (the r4 VERDICT
    done-bar), at sf0.01 where groups are ~2000 rows. At smaller scales
    the bound is dominated by interpolation-vs-element discretization (the
    exact `percentile` interpolates BETWEEN order statistics, the sketch
    returns an actual element; with ~200 rows/group the two order stats
    around the p99 rank can sit >1%-of-range apart) — that regime is
    covered by the rank-error test below, which is the guarantee
    `approx_percentile` actually makes."""
    sf_dir = "/root/testdata/sf0.01"
    exact, sketch = _collect(spark, sf_dir)
    rng = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for g, ex in exact.items():
        lo, hi = rng[g]
        tol = 0.01 * (hi - lo)
        for q in ("p50", "p90", "p99"):
            assert abs(sketch[g][q] - ex[q]) <= tol, (g, q, sketch[g][q], ex[q], tol)


def test_hll_cardinality_within_relative_error(spark):
    """a09s (approx_count_distinct, rsd=0.01) vs a09 (exact distinct):
    per-group relative error <= 5% at both test scales (HLL++ at rsd=0.01
    typically lands within ~1-2%; 5% leaves room for small-group bias
    correction), and the n_events side is exact."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = {
            r["event_type"]: r
            for r in QUERIES["a09_user_cardinality"](spark, sf_dir).collect()
        }
        sketch = {
            r["event_type"]: r
            for r in QUERIES["a09s_user_cardinality_sketch"](spark, sf_dir).collect()
        }
        assert set(exact) == set(sketch) and len(exact) >= 3
        for g, ex in exact.items():
            assert sketch[g]["n_events"] == ex["n_events"]  # exact side
            rel = abs(sketch[g]["n_users"] - ex["n_users"]) / ex["n_users"]
            assert rel <= 0.05, (sf_dir, g, sketch[g]["n_users"], ex["n_users"])


def test_sketch_percentiles_rank_error_bound(spark):
    """The sketch's own contract: the returned value's RANK is within
    1/accuracy of the target quantile. Checked at sf0.001 (sparse-tail
    regime) against the raw per-group values; one element of slack on
    each side for rank ties/rounding (the entry rounds to 6 decimals)."""
    sf_dir = "/root/testdata/sf0.001"
    _, sketch = _collect(spark, sf_dir)
    vals = {
        g: np.sort(np.array(v, dtype="float64"))
        for g, v in (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(F.collect_list("value").alias("v"))
            .rdd.map(lambda r: (r["event_type"], r["v"]))
            .collect()
        )
    }
    for g, row in sketch.items():
        xs = vals[g]
        n = len(xs)
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            v = row[q]
            # rank interval occupied by v in the sorted sample
            lo_rank = np.searchsorted(xs, v - 1e-6, side="left") / n
            hi_rank = np.searchsorted(xs, v + 1e-6, side="right") / n
            tol = 1.0 / 10000 + 1.5 / n  # sketch bound + element slack
            assert lo_rank - tol <= target <= hi_rank + tol, (
                g, q, v, lo_rank, hi_rank, tol,
            )


# ---------------------------------------------------------------------------
# As-of join operator (operators/asof.py)
# ---------------------------------------------------------------------------
def _asof_fixture(spark):
    """Small deterministic frames with equal-ts edge cases."""
    left = spark.createDataFrame(
        [(1, "k1", 10.0), (2, "k1", 20.0), (3, "k2", 5.0), (4, "k3", 7.0)],
        "lid long, key string, lts double",
    ).withColumnRenamed("lts", "ts")
    right = spark.createDataFrame(
        [
            ("k1", 5.0, 100, "a"),
            ("k1", 10.0, 101, "b"),   # equal to left lid=1's ts
            ("k1", 15.0, 102, "c"),
            ("k2", 9.0, 103, "d"),
        ],
        "key string, ts double, rid long, payload string",
    )
    return left, right


def test_asof_join_inclusive_and_strict(spark):
    from logminer_kafka_connect_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    incl = {
        r["lid"]: (r["asof_ts"], r["asof_payload"])
        for r in asof_join(
            left, right, on=["key"], ts_col="ts",
            value_cols=["payload"], tiebreak_cols=["rid"],
        ).collect()
    }
    # lid=1 at ts=10 sees the equal-ts right row (inclusive)
    assert incl[1] == (10.0, "b")
    assert incl[2] == (15.0, "c")
    assert incl[3] == (None, None)  # k2's only right row (ts=9) is later
    assert incl[4] == (None, None)  # k3 has no right rows at all

    strict = {
        r["lid"]: (r["asof_ts"], r["asof_payload"])
        for r in asof_join(
            left, right, on=["key"], ts_col="ts",
            value_cols=["payload"], tiebreak_cols=["rid"], strict=True,
        ).collect()
    }
    # strictly-prior: the equal-ts row no longer matches
    assert strict[1] == (5.0, "a")
    assert strict[2] == (15.0, "c")


def test_asof_join_tolerance(spark):
    from pyspark.sql import functions as F

    from logminer_kafka_connect_spark.operators.asof import asof_join

    left, right = _asof_fixture(spark)
    out = {
        r["lid"]: r["asof_payload"]
        for r in asof_join(
            left, right, on=["key"], ts_col="ts",
            value_cols=["payload"], tiebreak_cols=["rid"],
            tolerance=F.lit(6.0),
        ).collect()
    }
    # lid=2 at ts=20: latest right is ts=15 (within 6) -> kept;
    # lid=3 at ts=5 on k2: latest PRIOR is none; k2's right row is at 9 (>5)
    assert out[2] == "c"
    assert out[3] is None
    # lid=4 (k3, no rights) stays NULL under tolerance too
    assert out[4] is None


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized differential vs pandas.merge_asof (backward, inclusive),
    keys restricted so both engines see identical tie-free orderings."""
    import pandas as pd

    from logminer_kafka_connect_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    n_l, n_r = 300, 500
    lp = pd.DataFrame(
        {
            "key": rng.randint(0, 5, n_l),
            "ts": rng.permutation(n_l * 3)[:n_l].astype("float64"),
            "lid": np.arange(n_l),
        }
    )
    rp = pd.DataFrame(
        {
            "key": rng.randint(0, 5, n_r),
            # offset by 0.5 so left/right never tie (merge_asof tie rules
            # and ours agree on inclusive <=; avoiding ties makes the
            # comparison unambiguous)
            "ts": rng.permutation(n_r * 3)[:n_r].astype("float64") + 0.5,
            "val": rng.randn(n_r),
        }
    )
    expected = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
    ).set_index("lid")["val"]
    got = (
        asof_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp.assign(rid=np.arange(n_r))),
            on=["key"],
            ts_col="ts",
            value_cols=["val"],
            tiebreak_cols=["rid"],
        )
        .toPandas()
        .set_index("lid")["asof_val"]
    )
    for lid in expected.index:
        e, g = expected.loc[lid], got.loc[lid]
        assert (pd.isna(e) and pd.isna(g)) or abs(e - g) < 1e-12, (lid, e, g)


# ---------------------------------------------------------------------------
# PII redaction / unigram LM / decontamination (textops additions)
# ---------------------------------------------------------------------------
def test_redact_pii_rule_precedence_and_counts(spark):
    """Specific rules must consume their text before the generic digit-run
    rule sees it: an IP is ONE <IP>, never four <NUM>s."""
    from logminer_kafka_connect_spark.operators.textops.quality import redact_pii

    rows = {
        r["doc_id"]: r
        for r in redact_pii(
            spark.createDataFrame(
                [
                    (1, "mail a.b+c@ex-ample.org twice x@y.io end"),
                    (2, "host 192.168.0.1 port 8080"),
                    (3, "call +1 (415) 555-0199 now"),
                    (4, "clean text only"),
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert (rows[1]["n_email"], rows[1]["redacted"]) == (
        2, "mail <EMAIL> twice <EMAIL> end",
    )
    assert (rows[2]["n_ipv4"], rows[2]["n_number"]) == (1, 1)
    assert rows[2]["redacted"] == "host <IP> port <NUM>"
    assert rows[3]["n_phone"] == 1 and "<PHONE>" in rows[3]["redacted"]
    assert rows[3]["n_number"] == 0  # the phone rule consumed every digit
    assert rows[4]["redacted"] == "clean text only"
    assert all(rows[4][f"n_{n}"] == 0 for n in ("email", "ipv4", "phone", "number"))


def test_unigram_logprob_orders_rarity(spark):
    """A doc of corpus-frequent words must score higher (less negative)
    than a doc of corpus-unique words; probabilities must sum to 1 over
    the frequency table."""
    from logminer_kafka_connect_spark.operators.textops.quality import unigram_logprob

    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "rare1 rare2 rare3 rare4"),
            (3, "common common rare5 common"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["mean_logp"] for r in unigram_logprob(df).collect()}
    assert out[1] > out[3] > out[2]
    # doc 1: all 'common' (7 of 12 words) -> mean_logp = log10(7/12)
    import math

    assert abs(out[1] - round(math.log10(7 / 12), 4)) < 1e-9


def test_decontaminate_flags_only_overlapping_docs(spark):
    from logminer_kafka_connect_spark.operators.textops.contamination import (
        decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            (2, "one two three four five"),     # disjoint
            (3, "alpha beta gamma"),            # identical to an eval doc
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "zeta eta theta")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(train, evalset).collect()}
    assert set(out) == {1, 3}  # doc 2 is clean and absent
    assert out[3]["share_ratio"] == 1.0
    assert out[1]["n_shared_shingles"] == 1 and out[1]["n_shingles"] == 2


# ---------------------------------------------------------------------------
# Bloom novelty + incremental dedup
# ---------------------------------------------------------------------------
def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every delta text present in base MUST be flagged possibly_seen
    (bloom guarantee); FP rate vs the exact anti-join stays tiny at the
    default sizing (2^23 bits / ~375 keys)."""
    from logminer_kafka_connect_spark.operators.textops.bloom import (
        build_bloom,
        novelty_flags,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    bloom = build_bloom(base, "text")
    flags = {
        r["doc_id"]: r["possibly_seen"]
        for r in novelty_flags(delta.select("doc_id", "text"), bloom, "text").collect()
    }
    truly_seen = {
        r["doc_id"]
        for r in delta.join(
            base.select("text").distinct(), "text", "left_semi"
        ).collect()
    }
    for did in truly_seen:
        assert flags[did], f"false negative on doc {did}"
    fps = [d for d, seen in flags.items() if seen and d not in truly_seen]
    n_novel = len(flags) - len(truly_seen)
    assert n_novel > 0 and len(fps) <= max(1, 0.01 * n_novel), (len(fps), n_novel)


def test_bloom_partition_invariant_and_tiny_filter_fps(spark):
    """The merged bitmap is identical under any partitioning (OR is
    commutative); an undersized filter shows FPs but still no FNs."""
    from logminer_kafka_connect_spark.operators.textops.bloom import (
        BloomFilter,
        build_bloom,
    )
    import numpy as np

    sf = "/root/testdata/sf0.001"
    base = spark.read.parquet(f"{sf}/documents.parquet").filter(
        F.col("doc_id") % 4 != 0
    )
    b1 = build_bloom(base, "text", n_bits=1 << 16)
    b2 = build_bloom(base.repartition(7), "text", n_bits=1 << 16)
    assert np.array_equal(b1.bits, b2.bits)

    # 128-bit filter with ~375 keys saturates: everything reads "seen"
    tiny = build_bloom(base, "text", n_bits=128, n_hashes=2)
    assert tiny.bits.any()
    probe = np.array([123456789], dtype=np.int64), np.array([987654321], dtype=np.int64)
    sat = BloomFilter(bits=np.full(16, 255, dtype=np.uint8), n_bits=128, n_hashes=2)
    assert sat.might_contain_positions(*probe).all()


def test_incremental_dedup_matches_full_lsh_restriction(spark):
    """d23's pairs == d15's full-corpus LSH pairs restricted to
    (base, delta) orientation — the incremental path loses nothing on the
    cross pairs it claims to cover."""
    from logminer_kafka_connect_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    inc = {
        (r["base_id"], r["delta_id"]): r["jaccard"]
        for r in QUERIES["d23_incremental_dedup"](spark, sf).collect()
    }
    full = {}
    for r in QUERIES["d15_minhash_lsh"](spark, sf).collect():
        a, b, j = r["id_a"], r["id_b"], r["jaccard"]
        if a % 4 != 0 and b % 4 == 0:
            full[(a, b)] = j
        elif b % 4 != 0 and a % 4 == 0:
            full[(b, a)] = j
    assert inc == full and len(inc) > 0


# ---------------------------------------------------------------------------
# Range (interval) join operator
# ---------------------------------------------------------------------------
def test_range_join_boundaries_and_overlaps(spark):
    from logminer_kafka_connect_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 15.5), (4, 20.0), (5, 99.0)],
        "pid long, p double",
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 15.0, 30.0), ("d", 50.0, 50.0)],
        "name string, lo double, hi double",
    )
    out = sorted(
        (r["pid"], r["name"])
        for r in range_join(pts, ivs, "p", "lo", "hi", cell=8.0).collect()
    )
    # half-open: p=10 is in b not a; p=20 in c only; overlapping c+b at 15.5;
    # empty interval d matches nothing; p=99 matches nothing
    assert out == [(1, "a"), (2, "b"), (3, "b"), (3, "c"), (4, "c")]


def test_range_join_matches_nested_loop_and_is_hash_join(spark):
    from logminer_kafka_connect_spark.operators.rangejoin import range_join

    rng = np.random.RandomState(11)
    pts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 1000, 400))],
        "pid long, p double",
    )
    lo = rng.uniform(0, 950, 60)
    ivs = spark.createDataFrame(
        [
            (int(i), float(l), float(l + w))
            for i, (l, w) in enumerate(zip(lo, rng.uniform(1, 120, 60)))
        ],
        "iid long, lo double, hi double",
    )
    got = range_join(pts, ivs, "p", "lo", "hi", cell=32.0)
    expect = pts.join(
        ivs, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
    )
    assert sorted((r["pid"], r["iid"]) for r in got.collect()) == sorted(
        (r["pid"], r["iid"]) for r in expect.collect()
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries sketch + exact recount)
# ---------------------------------------------------------------------------
def test_heavy_hitters_sketch_equals_exact_on_corpus(spark):
    from logminer_kafka_connect_spark.entry_queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = [
            (r["item"], r["n"]) for r in QUERIES["a10_heavy_hitters"](spark, sf).collect()
        ]
        sketch = [
            (r["item"], r["n"])
            for r in QUERIES["a10s_heavy_hitters_sketch"](spark, sf).collect()
        ]
        assert sketch == exact and len(exact) == 20


def test_mg_superset_guarantee_with_tiny_counters(spark):
    """MG contract: every item with true count > n/(n_counters+1) must
    survive the sketch even when counters are scarce; counts are exact
    after the recount. Uses a skewed synthetic stream and n_counters=4."""
    from logminer_kafka_connect_spark.operators.textops.heavy_hitters import (
        heavy_hitters_sketch,
    )

    rows = (
        [("hot",)] * 500 + [("warm",)] * 200
        + [(f"cold{i}",) for i in range(300)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    out = {
        r["item"]: r["n"]
        for r in heavy_hitters_sketch(df, "item", k=4, n_counters=4).collect()
    }
    n = len(rows)
    # threshold n/(k+1) = 200 -> 'hot' (500) guaranteed; counts exact
    assert out["hot"] == 500
    assert all(v == {"hot": 500, "warm": 200}.get(k_, v) for k_, v in out.items())


def test_mg_merge_bounds_counter_count():
    from logminer_kafka_connect_spark.operators.textops.heavy_hitters import mg_merge

    counts = {f"i{j}": j + 1 for j in range(10)}
    merged = mg_merge(dict(counts), 3)
    assert len(merged) <= 3
    # survivors are the largest, decremented by the 4th-largest (7)
    assert merged == {"i9": 3, "i8": 2, "i7": 1}


# ---------------------------------------------------------------------------
# Spherical k-means iteration
# ---------------------------------------------------------------------------
def test_spherical_kmeans_objective_non_decreasing(spark):
    """Mean within-cluster cosine must not decrease across Lloyd steps
    (spherical k-means ascent property; tiny epsilon for the 5-decimal
    centroid rounding), and cluster counts must cover the corpus."""
    from logminer_kafka_connect_spark.operators.textops.similarity import (
        kmeans_step,
        spherical_kmeans,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent, hist = spherical_kmeans(emb, k=8, n_iter=3)
    assert len(hist) == 3
    assert all(b >= a - 1e-4 for a, b in zip(hist, hist[1:])), hist
    assert hist[-1] > hist[0]  # it actually improved on this data

    out = kmeans_step(emb, cent)
    n = emb.count()
    per_dim = {}
    for r in out.collect():
        per_dim.setdefault(r["dim"], 0)
        per_dim[r["dim"]] += r["n_vectors"]
    assert set(per_dim.values()) == {n}  # every dim's counts sum to corpus


def test_bloom_save_load_roundtrip(spark, tmp_path):
    from logminer_kafka_connect_spark.operators.textops.bloom import (
        build_bloom,
        load_bloom,
        novelty_flags,
        save_bloom,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") % 4 != 0
    )
    delta = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") % 4 == 0
    ).select("doc_id", "text")
    bloom = build_bloom(base, "text", n_bits=1 << 16)
    p = str(tmp_path / "corpus.bloom")
    save_bloom(bloom, p)
    loaded = load_bloom(p)
    assert (
        loaded.n_bits == bloom.n_bits
        and loaded.n_hashes == bloom.n_hashes
        and np.array_equal(loaded.bits, bloom.bits)
    )
    a = sorted(map(tuple, novelty_flags(delta, bloom, "text").collect()))
    b = sorted(map(tuple, novelty_flags(delta, loaded, "text").collect()))
    assert a == b


def test_incremental_dedup_with_stored_base_signatures(spark):
    """Passing precomputed base signatures (the production loop's stored
    per-doc aggregates) yields bit-identical pairs to the on-the-fly
    path."""
    from logminer_kafka_connect_spark.operators.textops.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    live = sorted(map(tuple, incremental_minhash_dedup(base, delta).collect()))
    stored = sorted(
        map(
            tuple,
            incremental_minhash_dedup(
                base, delta, base_signatures=minhash_signatures(base)
            ).collect(),
        )
    )
    assert live == stored and len(live) > 0


def test_range_join_result_invariant_to_cell_size(spark):
    """cell is a pure tuning knob: any positive width yields identical
    matches (correctness never depends on the grid)."""
    from logminer_kafka_connect_spark.operators.rangejoin import range_join

    rng = np.random.RandomState(23)
    pts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 300, 150))],
        "pid long, p double",
    )
    ivs = spark.createDataFrame(
        [
            (int(i), float(l), float(l + w))
            for i, (l, w) in enumerate(
                zip(rng.uniform(0, 280, 25), rng.uniform(0.5, 90, 25))
            )
        ],
        "iid long, lo double, hi double",
    )
    results = [
        sorted(
            (r["pid"], r["iid"])
            for r in range_join(pts, ivs, "p", "lo", "hi", cell=c).collect()
        )
        for c in (0.7, 8.0, 64.0, 1000.0)
    ]
    assert all(r == results[0] for r in results[1:]) and len(results[0]) > 0


def test_redact_pii_idempotent_property(spark):
    """Property: redaction is idempotent — replacement tokens contain no
    digits or @-runs, so a second pass never changes the text (fuzzed
    over adversarial near-PII strings)."""
    from logminer_kafka_connect_spark.operators.textops.quality import redact_pii

    samples = [
        "a@b.co 1.2.3.4.5 +12 345 678 901 x",
        "..@@..  999.999.999.999 <NUM> pre<EMAIL>post",
        "tel:+1(2)3-4 5678901234567890",
        "v1.2.3-rc4 2024-01-01T00:00:00Z 127.0.0.1:8080",
        "",
        "@ . - ( ) +",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    once = {r["doc_id"]: r["redacted"] for r in redact_pii(df).collect()}
    again_in = spark.createDataFrame(
        [(i, t) for i, t in once.items()], "doc_id long, text string"
    )
    twice = {r["doc_id"]: r for r in redact_pii(again_in).collect()}
    for i, t in once.items():
        assert twice[i]["redacted"] == t, (samples[i], t, twice[i]["redacted"])
        assert all(
            twice[i][f"n_{n}"] == 0 for n in ("email", "ipv4", "phone", "number")
        ), (samples[i], t)


def test_bloom_tree_merge_path_identical(spark):
    """The executor-side OR level (engaged past TREE_MERGE_THRESHOLD scan
    partitions) produces the exact same bitmap as the direct path."""
    from logminer_kafka_connect_spark.operators.textops import bloom as B

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") % 4 != 0
    )
    direct = B.build_bloom(base.coalesce(4), "text", n_bits=1 << 16)
    wide = base.repartition(96)  # > TREE_MERGE_THRESHOLD -> tree level
    assert wide.rdd.getNumPartitions() > B.TREE_MERGE_THRESHOLD
    tree = B.build_bloom(wide, "text", n_bits=1 << 16)
    assert np.array_equal(direct.bits, tree.bits)


def test_heavy_hitters_tree_merge_path_matches(spark):
    """Past TREE_MERGE_THRESHOLD partitions the executor-side summary
    merge engages; the final top-k is unchanged (whole-summary grouping
    preserves the mergeable-summaries guarantee)."""
    from logminer_kafka_connect_spark.operators.textops import bloom as B
    from logminer_kafka_connect_spark.operators.textops.dedup import words_expr
    from logminer_kafka_connect_spark.operators.textops.heavy_hitters import (
        heavy_hitters_sketch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = docs.select(F.explode(words_expr("text")).alias("item"))
    narrow = [tuple(r) for r in heavy_hitters_sketch(words.coalesce(4), "item", 20).collect()]
    wide_words = words.repartition(96)
    assert wide_words.rdd.getNumPartitions() > B.TREE_MERGE_THRESHOLD
    wide = [tuple(r) for r in heavy_hitters_sketch(wide_words, "item", 20).collect()]
    assert narrow == wide and len(narrow) == 20


def test_new_entry_plan_shapes(spark):
    """Scale-critical plan shapes pinned so regressions surface in CI:
    - j14 as-of: exactly ONE shuffle Exchange (the union-scan design);
    - d21 decontamination: eval side broadcast, corpus never shuffled
      before the join;
    - t26 redaction: no Exchange at all (narrow map);
    - t24-style guarantees for others live in their own tests."""
    from logminer_kafka_connect_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"

    def plan(name):
        return QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()

    j14 = plan("j14_asof_join")
    assert j14.count("Exchange hashpartitioning") == 1 and "Window" in j14

    d21 = plan("d21_decontaminate")
    assert "BroadcastHashJoin" in d21

    t26 = plan("t26_pii_redact")
    assert "Exchange" not in t26


def test_canonicalize_url_rules(spark):
    from logminer_kafka_connect_spark.operators.textops.quality import (
        canonicalize_url,
    )

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/", "http://www.ex.com/A"),
        ("https://ex.com/p?utm_source=x&z=2&a=1#top", "https://ex.com/p?a=1&z=2"),
        ("https://ex.com/p?gclid=1&fbclid=2&utm_campaign=c", "https://ex.com/p"),
        ("https://ex.com:8080/q?b=2&a=1", "https://ex.com:8080/q?a=1&b=2"),
        ("https://ex.com", "https://ex.com"),
        ("https://ex.com/?x=", "https://ex.com?x="),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonicalize_url("url").alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_funnel_strict_ordering_semantics(spark, tmp_path):
    """a13: a step counts only users whose first qualifying event strictly
    FOLLOWS the previous step's time — purchase-before-click users fall
    out at step 3, click-before-view users at step 2."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)

    def ev(u, typ, minutes):
        rows.append((u, typ, t0 + dt.timedelta(minutes=minutes)))

    ev(1, "view", 0); ev(1, "click", 1); ev(1, "purchase", 2)   # full funnel
    ev(2, "view", 0); ev(2, "click", 1)                          # stops at 2
    ev(3, "click", 0); ev(3, "view", 1)                          # click BEFORE view
    ev(3, "click", 2)                                            # ...but clicks again after
    ev(4, "purchase", 0); ev(4, "view", 1); ev(4, "click", 2)    # purchase too early
    ev(5, "view", 0)                                             # view only
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    p = f"{tmp_path}/events.parquet"
    df.write.parquet(p)

    from logminer_kafka_connect_spark.entry_queries import QUERIES

    got = {
        r.step: r.n_users
        for r in QUERIES["a13_funnel_steps"](spark, str(tmp_path)).collect()
    }
    # step1: users 1,2,3,4,5; step2: 1,2,3 (user 3's SECOND click follows
    # its first view), 4; step3: only 1 (user 4 purchased before clicking)
    assert got == {"step1_view": 5, "step2_click": 4, "step3_purchase": 1}
