"""Connected-components cluster resolution — differential-tested against a
pure-python union-find oracle (independent of the Spark implementation),
including the chain graphs that punish naive min-propagation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops.cluster import (
    assign_clusters,
    connected_components,
    keep_canonical,
)


def _uf_oracle(edges: list[tuple], nodes=None) -> dict:
    """Union-find, smallest id becomes the representative."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    out = {}
    for x in set(parent) | set(nodes or []):
        out[x] = find(x)
    return out


def _cc_spark(spark, edges, driver_limit):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df, driver_limit=driver_limit).collect()
    return {r["id"]: r["cluster_id"] for r in got}


# driver_limit=0 forces distributed star contraction; the default takes
# the driver union-find path — both must produce identical labelings.
BOTH_PATHS = pytest.mark.parametrize("driver_limit", [0, 200_000])


@BOTH_PATHS
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed, driver_limit):
    rng = random.Random(seed)
    n = 80
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(20, 70))
    ]
    edges = [(a, b) for a, b in edges if a != b]
    oracle = _uf_oracle(edges)
    got = _cc_spark(spark, edges, driver_limit)
    assert got == oracle


@BOTH_PATHS
def test_chain_graph_converges_logarithmically(spark, driver_limit):
    """A 64-node path is the worst case for min-label propagation (63
    rounds); star contraction must finish well inside max_iter and still
    label every node with the chain head."""
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_spark(spark, edges, driver_limit)
    assert got == {i: 0 for i in range(64)}


@BOTH_PATHS
def test_cliques_and_singleton_edges(spark, driver_limit):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]  # clique 0-4
    edges += [(10, 11), (12, 13), (11, 12)]  # path 10-13
    edges += [(100, 101)]
    got = _cc_spark(spark, edges, driver_limit)
    assert got == _uf_oracle(edges)
    assert got[13] == 10 and got[101] == 100


@BOTH_PATHS
def test_string_ids_and_duplicate_edges(spark, driver_limit):
    edges = [("b", "a"), ("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, driver_limit=driver_limit).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    out = assign_clusters(docs, df).collect()
    assert all(r["doc_id"] == r["cluster_id"] and r["is_canonical"] for r in out)


def test_assign_and_keep_canonical(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("doc-"), F.col("doc_id"))
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5), (7, 8)], "id_a long, id_b long")
    labeled = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
               for r in assign_clusters(docs, pairs).collect()}
    assert labeled[1] == (1, True) and labeled[3] == (1, False) and labeled[5] == (1, False)
    assert labeled[7] == (7, True) and labeled[8] == (7, False)
    assert labeled[0] == (0, True)  # singleton: own cluster
    kept = keep_canonical(docs, pairs)
    assert set(kept.columns) == {"doc_id", "text"}  # original columns intact
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4, 6, 7, 9]


def test_d20_matches_duckdb_oracle(spark):
    """The driver-contract gate in miniature: d20 Spark vs recursive-CTE
    oracle at sf0.001."""
    import duckdb

    from logminer_kafka_connect_spark.entry_queries import ORACLES, QUERIES

    sf_dir = "/root/testdata/sf0.001"
    got = QUERIES["d20_dup_clusters"](spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    exp = con.execute(ORACLES["d20_dup_clusters"]).fetchall()
    got_set = {(r["doc_id"], r["cluster_id"], r["is_canonical"]) for r in got}
    assert got_set == set(map(tuple, exp))
    assert len(got) == len(exp)


def test_pagerank_dangling_mass_and_distribution(spark):
    """Dangling nodes redistribute their rank uniformly: ranks stay a
    probability distribution, and a pure sink still accumulates rank.
    Cross-checked against a numpy power iteration of the same graph."""
    import numpy as np

    from logminer_kafka_connect_spark.operators.textops.cluster import pagerank

    # 0->1, 1->2, 2 is a SINK (dangling), 3->0 keeps 0 reachable
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 0), (0, 2)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(edges, n_iters=12).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9

    n, d = 4, 0.85
    A = np.zeros((n, n))
    for s, t_ in [(0, 1), (1, 2), (3, 0), (0, 2)]:
        A[s, t_] = 1.0
    out = A.sum(1)
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        dangling = r[out == 0].sum()
        contrib = np.zeros(n)
        for s in range(n):
            if out[s]:
                contrib += r[s] / out[s] * A[s]
        r = (1 - d) / n + d * (contrib + dangling / n)
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-9, (v, got[v], r[v])
    # the sink outranks its sole feeder chain start
    assert got[2] > got[3]


def test_pagerank_loop_plan_single_edge_exchange(spark):
    """r6 optimization pin (r5 VERDICT Next #3): with the edge relation
    hash-partitioned by the join key and pinned via persist(), one power-
    iteration step never reshuffles the (big) edge side — the plan has no
    Exchange whose input carries the edge payload (node + dst). The only
    payload-bearing shuffle allowed is the groupBy of the already-projected
    contributions."""
    from pyspark.sql import functions as F

    edges = spark.range(2000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 61).alias("dst")
    )
    e = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("dst"))
        .repartition("node")
        .persist()
    )
    e.count()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = (
        nodes.join(deg, "node", "left")
        .select("node", "out_deg", F.lit(0.01).alias("rank"))
        .localCheckpoint(eager=True)
    )
    contrib = (
        ranks.filter(F.col("out_deg").isNotNull())
        .join(e, "node")
        .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("inflow"))
    )
    step = ranks.select("node", "out_deg").join(contrib, "node", "left")
    plan = step._sc._jvm.PythonSQLUtils.explainString(
        step._jdf.queryExecution(), "formatted"
    )
    e.unpersist()
    # the edge relation must come from the in-memory (pre-partitioned) scan
    assert "InMemoryTableScan" in plan or "Scan In-memory" in plan, plan
    # no shuffle may carry the edge payload: an Exchange re-partitioning the
    # edge side would list both the join key and dst in its Input
    import re as _re

    for block in plan.split("\n\n"):
        if block.lstrip().startswith("(") and ") Exchange" in block.split("\n")[0]:
            inp = next((l for l in block.split("\n") if l.startswith("Input")), "")
            args = next((l for l in block.split("\n") if l.startswith("Arguments")), "")
            # the one-time REPARTITION_BY_COL inside the cached InMemoryRelation
            # is the pre-partitioning itself; what must NOT appear is a
            # planner-inserted (ENSURE_REQUIREMENTS) shuffle of the edge rows
            if "ENSURE_REQUIREMENTS" in args:
                assert not ("dst#" in inp and "node#" in inp), f"edge side reshuffled:\n{block}"
