"""Distributed connected components — dedup-cluster assignment.

A training-data dedup pipeline needs more than near-dup PAIRS: transitive
closure groups pairs into clusters so exactly one canonical document per
cluster is kept (A~B, B~C => drop two of {A,B,C} even if A!~C directly).

Implementation: iterative min-label propagation (the `large-star` half of
the Kiveris et al. "Connected Components in MapReduce" algorithm,
simplified for the near-dup-graph regime where components are tiny and
shallow):

  comp(v) <- min(comp(v), min over neighbors comp(u))

Each round is two distributed hash joins (edges x labels) + a groupBy-min
— all shuffle-partitioned by vertex id, no driver data movement except a
single converged? count. Rounds needed = graph diameter (near-dup
clusters: 2-4). `localCheckpoint` truncates the lineage each round so the
plan does not grow exponentially across iterations (the classic iterative-
Spark trap).

At 100 TB: labels and edges are both id->id pairs (16 bytes); rounds are
O(diameter) which for dedup graphs is tiny. For adversarial long-chain
graphs switch to alternating large-star/small-star (log^2 rounds) — same
join primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """Label every vertex with the minimum vertex id reachable from it.

    ``edges`` is undirected (each pair listed once is enough). ``vertices``
    optionally supplies isolated vertices (no edges) which come back as
    singleton components. Output: (id, component).

    Graphs at or under ``small_graph_edges`` are solved by driver-side
    union-find on one bounded collect (≤16 MB of long pairs at the
    default): each distributed min-label round costs two joins, a
    checkpoint and a convergence probe — pure cluster latency when the
    whole edge set fits in one task. The iterative plan below is the
    100 TB path and produces the identical labeling.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.localCheckpoint(eager=True)

    # Iterate ONLY over vertices that touch an edge: isolated vertices can
    # never change label (component = self) and are appended after the
    # loop. At dedup scale this is the difference between shuffling the
    # CORPUS id set every round and shuffling the (far smaller) dup-graph
    # vertex set — labels are O(edge endpoints), not O(documents).
    n_edges = sym.count()  # sym is checkpointed: metadata-cheap
    spark = edges.sparkSession
    if n_edges <= small_graph_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in sym.collect():
            u, v = row["u"], row["v"]
            parent.setdefault(u, u)
            parent.setdefault(v, v)
            ru, rv = find(u), find(v)
            if ru != rv:
                # Union by MIN root: the component label IS the min id.
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        labels = spark.createDataFrame(
            [(x, find(x)) for x in parent],
            schema=sym.select(
                F.col("u").alias(id_col), F.col("v").alias("component")
            ).schema,
        )
        return _attach_isolated(labels, vertices, id_col)
    # Right-size the loop's shuffle width to the graph, not the session
    # default: min-label rounds on a few thousand edges schedule in 1-2
    # tasks instead of 32 near-empty ones (per-round latency, not
    # throughput, dominates iterative loops on small graphs).
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1))
    labels = (
        sym.select(F.col("u").alias(id_col))
        .distinct()
        .select(id_col, F.col(id_col).alias("component"))
        .repartition(n_parts, id_col)
        .localCheckpoint(eager=True)
    )
    sym = sym.repartition(n_parts, "v")

    # Labels only ever DECREASE (min-propagation), so sum(component)
    # strictly decreases iff any label changed — a one-number convergence
    # probe per round instead of a full old-vs-new join.
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        # Min label among each vertex's neighbors (one join + groupBy-min),
        # then fold with the vertex's own label.
        neighbor_min = (
            sym.join(labels.withColumnRenamed(id_col, "v"), "v")
            .groupBy(F.col("u").alias(id_col))
            .agg(F.min("component").alias("nmin"))
        )
        folded = labels.join(neighbor_min, id_col, "left").select(
            id_col,
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        )
        # Pointer-doubling hop: comp(v) <- comp(comp(v)). Neighbor-min
        # alone moves a label ONE hop per round (a path graph would need
        # diameter rounds and silently exhaust max_iter); chasing the
        # label's own label each round makes convergence O(log diameter).
        parents = folded.select(
            F.col(id_col).alias("__pid"), F.col("component").alias("__pcomp")
        )
        new_labels = (
            folded.join(parents, folded["component"] == parents["__pid"], "left")
            .select(
                folded[id_col],
                F.coalesce(F.col("__pcomp"), folded["component"]).alias("component"),
            )
            .repartition(n_parts, id_col)
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        cur_sum = new_labels.agg(F.sum("component")).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds "
            "(doubling handles diameter up to ~2^rounds; this is not a "
            "dedup-shaped graph)"
        )
    return _attach_isolated(labels, vertices, id_col)


def _attach_isolated(
    labels: DataFrame, vertices: DataFrame | None, id_col: str
) -> DataFrame:
    """Union edge-vertex labels with singleton components for isolated
    vertices; edge vertices missing from ``vertices`` are kept too."""
    if vertices is None:
        return labels
    vs = vertices.select(id_col)
    return (
        vs.join(labels, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .unionByName(labels.join(vs, id_col, "left_anti"))
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_id_a",
    pair_b: str = "doc_id_b",
) -> DataFrame:
    """Cluster assignment + canonical-keep decision for every document.

    ``pairs`` are near-dup edges (e.g. from minhash_lsh_pairs). Every doc
    gets (doc_id, cluster_id, is_canonical): cluster_id is the minimum
    doc_id in its connected component (singleton = itself), and the
    canonical keeper is that minimum doc. `docs.filter(is_canonical)` is
    the deduplicated corpus.
    """
    comp = connected_components(
        pairs, src=pair_a, dst=pair_b, vertices=docs.select(F.col(id_col).alias("id")), id_col="id"
    )
    return (
        docs.select(id_col)
        .join(comp.withColumnRenamed("id", id_col), id_col)
        .select(
            id_col,
            F.col("component").alias("cluster_id"),
            (F.col("component") == F.col(id_col)).alias("is_canonical"),
        )
    )
