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
