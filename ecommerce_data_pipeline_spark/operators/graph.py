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


def _canon_edges(
    edges: DataFrame, src: str, dst: str
) -> tuple[DataFrame, int, int]:
    """Materialize the undirected edge set in CANONICAL form — one
    ``(least, greatest)`` row per distinct undirected edge — instead of
    the old symmetrize-then-distinct (r16 optimization, guide §2.3
    "shuffle fewer bytes"): the distinct's shuffle now processes HALF the
    rows, the block manager pins half the bytes, and driver fast paths
    collect half and symmetrize in numpy. Returns
    ``(canon, n_sym, n_loops)`` where ``n_sym`` is the size of the full
    symmetric set (``2*|canon| - |loops|`` — exactly the row count the
    old ``union.distinct()`` produced, keeping every fast-path threshold
    comparison unchanged)."""
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    r = canon.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("u") == F.col("v")).cast("long")).alias("loops"),
    ).first()
    n_loops = int(r["loops"] or 0)
    return canon, 2 * int(r["n"]) - n_loops, n_loops


def _sym_of(canon: DataFrame) -> DataFrame:
    """The full symmetric edge frame, derived from the checkpointed
    canonical set by a NARROW union (no shuffle, no second distinct):
    each direction of every non-loop edge plus each loop once — the
    identical row set the old ``union.distinct()`` materialized."""
    return canon.union(
        canon.filter(F.col("u") != F.col("v")).select(
            F.col("v").alias("u"), F.col("u").alias("v")
        )
    )


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
    # Materialize the DIRECTED input pairs once; the symmetric frame is a
    # narrow union over this checkpoint (r16 optimization: the old code
    # checkpointed the doubled symmetric set and collected ALL of it on
    # the driver fast path — union-find needs each undirected edge once,
    # so both the pinned bytes and the collect were 2x what the
    # algorithm consumes).
    raw = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)

    # Iterate ONLY over vertices that touch an edge: isolated vertices can
    # never change label (component = self) and are appended after the
    # loop. At dedup scale this is the difference between shuffling the
    # CORPUS id set every round and shuffling the (far smaller) dup-graph
    # vertex set — labels are O(edge endpoints), not O(documents).
    n_edges = 2 * raw.count()  # same arithmetic as the old sym.count()
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

        for row in raw.collect():
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
            schema=raw.select(
                F.col("u").alias(id_col), F.col("v").alias("component")
            ).schema,
        )
        return _attach_isolated(labels, vertices, id_col)
    # Right-size the loop's shuffle width to the graph, not the session
    # default: min-label rounds on a few thousand edges schedule in 1-2
    # tasks instead of 32 near-empty ones (per-round latency, not
    # throughput, dominates iterative loops on small graphs).
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1))
    # Symmetric frame derived narrowly from the checkpointed raw pairs —
    # the repartition below is the only shuffle it pays.
    sym = raw.union(raw.select(F.col("v").alias("u"), F.col("u").alias("v")))
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


def _round_half_away(x):
    """Exact round-half-away-from-zero for non-negative float64 below 2^52
    (numpy array or scalar): floor + exact-fraction compare. np.round is
    banker's and SQL round is half-away — this matches SQL. For doubles
    under 2^52 the floor/subtract are exact, so the comparison rounds the
    double's true value, agreeing bit-for-bit with Spark's HALF_UP-on-
    exact-decimal and DuckDB's std::round."""
    import numpy as np

    f = np.floor(x)
    return f + ((x - f) >= 0.5)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    small_graph_edges: int = 5_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected graph, in exact integer
    fixed-point arithmetic so the result is bit-deterministic under ANY
    partitioning / aggregation order (and therefore oracle-checkable).

    Ranks are int64 nano-units (1e9 = total mass 1.0 per node at init).
    Per iteration, every node sends ``r div deg`` (integer division —
    deterministic truncation) along each incident edge and receives

        r' = round((1-d) * 1e9 / N) + round(d * sum(incoming shares))

    Only the two ``round`` calls touch doubles, each on a single exact
    int64→double value — no floating-point accumulation anywhere, so
    Spark and any other engine agree to the last bit. The truncation
    leaks < deg nano-units of mass per node per round: irrelevant for
    ranking, essential for determinism.

    Node set = edge endpoints (an undirected node always has degree ≥ 1,
    so there are no dangling nodes). Output: (id, rank_nano LONG).

    Scale: the node frame (id, r div deg) is tiny next to the edge set —
    one fixed-width row per node — so each round BROADCASTS the per-node
    share into a map-side join with the (once-materialized, never
    re-shuffled) edge list, then does ONE shuffle: the groupBy-sum on the
    destination, sized O(edges). Node sets too big to broadcast
    (> ``broadcast_nodes``) fall back to the classic two-shuffle Pregel
    hash join, both sides partitioned by node id. ``localCheckpoint``
    truncates lineage each round (graph.py:33's iterative-Spark trap);
    the node count N is a one-scalar driver read (same class as the
    incremental bound A4), not a data collect.
    """
    canon, n_edges, _loops = _canon_edges(edges, src, dst)
    if n_edges <= small_graph_edges:
        # Driver fast path (same dual-path design as connected_components
        # above): the canonical half of the edge list fits in one bounded
        # collect (≤40 MB of long pairs at the default — the swapped
        # directions are reconstructed by one numpy concatenate), and 10
        # rounds of int64 scatter-adds over numpy arrays beat 10
        # distributed jobs by ~10×. Identical integer arithmetic →
        # identical labeling.
        import numpy as np
        import pandas as pd

        pdf = canon.toPandas()
        cu = pdf["u"].to_numpy()
        cv = pdf["v"].to_numpy()
        nonloop = cu != cv
        uu = np.concatenate([cu, cv[nonloop]])
        vv = np.concatenate([cv, cu[nonloop]])
        ids, inv_u = np.unique(uu, return_inverse=True)
        inv_v = np.searchsorted(ids, vv)
        n = len(ids)
        deg_arr = np.bincount(inv_u, minlength=n).astype(np.int64)
        base_i = int(_round_half_away((1.0 - damping) * 1e9 / n))
        r = np.full(n, int(_round_half_away(1e9 / n)), dtype=np.int64)
        for _ in range(iters):
            share = r // deg_arr
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, inv_v, share[inv_u])
            r = base_i + _round_half_away(damping * s).astype(np.int64)
        spark = edges.sparkSession
        out = spark.createDataFrame(
            pd.DataFrame({"id": ids, "rank_nano": r}),
            "id long, rank_nano long",
        )
        return out

    sym = _sym_of(canon)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    n = deg.count()
    broadcast_nodes = 50_000_000
    maybe_b = F.broadcast if n <= broadcast_nodes else (lambda df: df)
    # Round engine-side (HALF_UP, matching SQL round semantics for
    # positives) — Python's round() is banker's and would diverge whenever
    # 1e9/N lands exactly on .5.
    base = F.round(F.lit((1.0 - damping) * 1e9 / n)).cast("long")

    ranks = deg.select(
        F.col("u").alias("id"),
        F.round(F.lit(1e9 / n)).cast("long").alias("r"),
    )
    for _ in range(iters):
        # Per-node outgoing share, computed once per round on the small
        # frame (node ⨝ degree — broadcast, no shuffle of either side).
        out_share = (
            ranks.join(maybe_b(deg), ranks.id == deg.u)
            .select(F.col("id"), F.expr("r div deg").alias("share"))
        )
        ranks = (
            sym.join(maybe_b(out_share), sym.u == out_share.id)
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("share").alias("s"))
            .select(
                "id",
                (base + F.round(F.lit(damping) * F.col("s")).cast("long")).alias(
                    "r"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.col("r").alias("rank_nano"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle counts via the degree-ordered orientation
    (Suri & Vassilvitskii's MR trick): direct every edge from its
    lower-(degree, id) endpoint to the higher one, build wedges by
    joining oriented edges on their source, close them against the
    oriented edge set. Wedge volume drops from Σdeg² (hub-quadratic) to
    O(m^1.5) — the difference between a celebrity node exploding the
    join and a bounded shuffle. Output: (id, triangles) for vertices in
    ≥1 triangle; each triangle credits all three corners.
    """
    # Canonical distinct + narrow symmetrize (r16): halves the distinct's
    # shuffle, and the eager checkpoint inside _canon_edges collapses the
    # old plan's duplicated union-distinct subtree — deg, the orientation
    # join and the closing-edge probe all re-read one materialized frame
    # instead of re-planning the distinct three times.
    canon, _n_sym, _loops = _canon_edges(edges, src, dst)
    sym = _sym_of(canon)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    ranked = sym.join(deg, "u").select(
        "u", "v", F.col("deg").alias("du")
    ).join(
        deg.select(F.col("u").alias("v"), F.col("deg").alias("dv")), "v"
    )
    oriented = ranked.filter(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    ).select("u", "v")
    e1 = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = oriented.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    ).union(oriented.select(F.col("v").alias("b"), F.col("u").alias("c")))
    tris = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    corners = (
        tris.select(F.col("a").alias("id"))
        .union(tris.select(F.col("b").alias("id")))
        .union(tris.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    small_graph_edges: int = 5_000_000,
) -> DataFrame:
    """Fixed-round k-core peeling on an undirected graph: each round drops
    every node whose CURRENT degree is below ``k`` (and all its edges),
    the classic dense-subgraph extractor (community cores, spam-farm and
    bot-ring detection in co-purchase/citation graphs).

    Like pagerank above, the iteration count is a CONSTANT of the query —
    ``rounds`` peels, not peel-until-stable — so the whole computation is
    replayable as an unrolled SQL chain and hash-matches the oracle even
    on a fixture where convergence needs fewer rounds (equality of the
    rounds=8 and rounds=10 outputs is the convergence proof, tested).
    Peeling is monotone (the active-edge set only shrinks), so any round
    after convergence is a no-op on both engines.

    Scale: per round ONE degree groupBy over the surviving edges + two
    semi-joins against the keep set (fixed-width long pairs, O(edges)),
    lineage truncated per round; graphs under ``small_graph_edges`` take
    the numpy fast path (identical integer arithmetic — a mask update per
    round, no FP anywhere). Output: (id, core_degree) for nodes with at
    least one surviving edge.
    """
    canon, n_edges, _loops = _canon_edges(edges, src, dst)
    if n_edges <= small_graph_edges:
        import numpy as np
        import pandas as pd

        pdf = canon.toPandas()
        cu = pdf["u"].to_numpy()
        cv = pdf["v"].to_numpy()
        nonloop = cu != cv
        uu = np.concatenate([cu, cv[nonloop]])
        vv = np.concatenate([cv, cu[nonloop]])
        ids, inv_u = np.unique(uu, return_inverse=True)
        inv_v = np.searchsorted(ids, vv)
        n = len(ids)
        mask = np.ones(len(uu), dtype=bool)
        for _ in range(rounds):
            deg = np.bincount(inv_u[mask], minlength=n)
            keep = deg >= k
            mask &= keep[inv_u] & keep[inv_v]
        deg = np.bincount(inv_u[mask], minlength=n)
        alive = deg > 0
        out = pd.DataFrame(
            {"id": ids[alive], "core_degree": deg[alive].astype("int64")}
        )
        spark = edges.sparkSession
        return spark.createDataFrame(out, "id long, core_degree long")

    active = _sym_of(canon)
    prev_edges = n_edges
    for _ in range(rounds):
        keep = (
            active.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        active = (
            active.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        # Early exit on convergence: peeling is monotone, so a round that
        # removed nothing proves every remaining round is a no-op — the
        # SAME property the rounds=8 == rounds=10 oracle test pins, used
        # here to stop paying per-round shuffles + checkpoints once the
        # core stabilizes (at 19M+ edges each saved round is a full
        # O(edges) job). The count is metadata-cheap on the checkpointed
        # frame. Results are bit-identical to the fixed-round loop.
        cur_edges = active.count()
        if cur_edges == prev_edges:
            break
        prev_edges = cur_edges
    return (
        active.groupBy(F.col("u").alias("id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
