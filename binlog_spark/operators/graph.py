"""Distributed connected components: near-dup pairs → dedup clusters.

The dedup family (``operators/dedup.py``, ``operators/similarity.py``)
emits *pairs*; a production dedup pipeline needs *clusters* — one keeper
per group of transitively-connected near-duplicates. This module closes
that gap with the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", ACM
SoCC 2014 — the standard trillion-edge formulation): every step is a
``groupBy(node)`` + broadcast-free self-join on edges oriented toward
smaller ids, converging in O(log n) rounds regardless of component
diameter, vs O(diameter) for naive label propagation — the difference
between 4 and 40 shuffles on a 10^9-edge web-scale pair graph.

Scale notes (the 100 TB story):
* each round's state is the edge set itself — no per-node label table,
  no driver-side state; memory is bounded by the (shrinking) edge list;
* ``localCheckpoint`` after each round truncates the lineage so round k
  does not replay rounds 1..k-1 (and releases shuffle files);
* convergence needs one tiny action per round (a count + an isEmpty on
  the set difference), both O(edges) distributed;
* the output is a star graph: (node → component-min), exactly the shape
  a downstream keep-one-per-cluster MERGE wants to join on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.union(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    nbrs = _symmetric(edges)
    mins = (nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
            .select("src", F.least("src", "mn").alias("m")))
    return (nbrs.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small, connect all smaller neighbors (and u
    itself) to the minimum smaller neighbor."""
    e = (edges.where(F.col("src") != F.col("dst"))
         .select(F.greatest("src", "dst").alias("src"),
                 F.least("src", "dst").alias("dst"))
         .distinct())
    mins = e.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (e.join(mins, "src")
              .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    return (relink.union(mins.select("src", F.col("m").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct())


def _local_finish(spark, rows) -> DataFrame:
    """Union-find finisher over a collected (small) edge set → the same
    (node, cluster=component-min) labels the remaining star rounds would
    converge to. Deterministic and exact: the star transformations
    preserve connectivity and the node set, so component minima are
    invariant under where the handoff happens."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for s, d in rows:
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by MIN root: the root is always the component min,
            # matching the star algorithm's labels with zero extra pass
            if rs < rd:
                parent[rd] = rs
            else:
                parent[rs] = rd
    labels = [(n, find(n)) for n in parent]
    return spark.createDataFrame(labels, "node long, cluster long")


def connected_components(edges: DataFrame, max_rounds: int = 50,
                         local_finish_threshold: int = 1 << 17) -> DataFrame:
    """Edge list (``src``, ``dst``) → star labels (``node``, ``cluster``).

    ``cluster`` is the component's minimum node id; every node that
    appears in any edge gets exactly one output row (roots label
    themselves). Isolated nodes never enter the edge list — callers give
    them their own id via a left join (see ``queries.dedup_cc_clusters``).

    ``local_finish_threshold``: once a round's edge set is at most this
    many edges (the star graph shrinks geometrically), the tail rounds
    finish on the driver with union-find instead of paying ~9 shuffle
    stages + an action per remaining round — the standard hybrid on real
    clusters (a 2 MB collect replaces O(log n) scheduling floors). Labels
    are identical either way; pass 0 to stay fully distributed.
    """
    spark = edges.sparkSession
    cur = (edges.where(F.col("src") != F.col("dst"))
           .select(F.greatest("src", "dst").alias("src"),
                   F.least("src", "dst").alias("dst"))
           .distinct().localCheckpoint(eager=False))
    # one count up front (it materializes the checkpoint that round 0
    # would anyway); counts then carry across rounds — one action each
    n_cur = cur.count()
    for _ in range(max_rounds):
        if 0 <= n_cur <= local_finish_threshold:
            return _local_finish(
                spark, [(r["src"], r["dst"]) for r in cur.collect()])
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # converged when the oriented edge sets are identical: equal
        # cardinality (count cached from last round — one action) + empty
        # difference (checked only on count equality)
        n_nxt = nxt.count()
        if n_nxt == n_cur and nxt.exceptAll(cur).isEmpty():
            cur = nxt
            break
        cur, n_cur = nxt, n_nxt
    else:
        raise RuntimeError(f"no convergence in {max_rounds} rounds")
    roots = cur.select(F.col("dst").alias("node")).distinct()
    return (cur.select(F.col("src").alias("node"),
                       F.col("dst").alias("cluster"))
            .union(roots.select("node", F.col("node").alias("cluster"))))


def cluster_sizes(labels: DataFrame,
                  cluster_col: str = "cluster") -> DataFrame:
    """Label frame → + ``cluster_size`` (window count per cluster)."""
    w = Window.partitionBy(cluster_col)
    return labels.withColumn("cluster_size", F.count("*").over(w))


# ---------------------------------------------------------------------------
# PageRank (power iteration) — the link-graph quality signal web-corpus
# pipelines attach to crawled documents (Common Crawl publishes exactly
# this per host; CCNet/RefinedWeb-style curation consumes it as a
# quality feature). Integer-quantized arithmetic (the kmeans_assign
# idiom): every iteration's ranks are int64 in units of 1e-12, all
# updates are integer multiply/divide, so the result is bit-identical
# across engines and across summation orders — no floating-point
# reassociation hazard between a distributed fold and the SQL oracle.

PAGERANK_SCALE = 10 ** 12
PAGERANK_D_NUM = 85          # damping d = 0.85 as a ratio
PAGERANK_D_DEN = 100


def pagerank_quantized(edges: DataFrame, nodes: DataFrame,
                       n_nodes: int, iters: int = 5) -> DataFrame:
    """``iters`` rounds of quantized power iteration.

    ``edges``: (src, dst) with multiplicity (parallel edges each carry
    mass); ``nodes``: (node) — every rankable node, including ones with
    no in-links (they keep the teleport floor). Dangling nodes (no
    out-edges) simply radiate no mass — the standard simplification,
    applied identically in the oracle.

    Update: r'(v) = (15·S)//(100·N) + Σ_{u→v} (85·r(u)) // (100·deg(u))
    over int64 in units of S = 1e-12. Every quantity stays < 2^63 for
    any N (total mass ≤ S · N only shrinks under flooring).

    Scale shape per iteration: one join of the edge list against the
    rank table on ``src`` (both shuffle-partitioned on their key — at
    10^9 edges this is THE big exchange and it is unavoidable), one
    groupBy ``dst`` with map-side partial sums, one broadcast-free left
    join back to the node set. ``localCheckpoint`` after each round
    truncates lineage so round k does not replay rounds 1..k-1 (the
    connected-components idiom above).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src")
    tele = (15 * PAGERANK_SCALE) // (100 * n_nodes)
    ranks = nodes.withColumn(
        "r", F.lit(PAGERANK_SCALE // n_nodes).cast("long"))
    for _ in range(iters):
        contrib = (ed.join(ranks, ed.src == ranks.node)
                   .select(F.col("dst").alias("node"),
                           F.expr(f"(CAST({PAGERANK_D_NUM} AS BIGINT) * r)"
                                  f" div (CAST({PAGERANK_D_DEN} AS BIGINT)"
                                  f" * deg)").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(sums, "node", "left")
                 .select("node",
                         (F.lit(tele).cast("long")
                          + F.coalesce(F.col("s"), F.lit(0)))
                         .alias("r"))
                 .localCheckpoint(eager=False))
    return ranks.select("node", F.col("r").alias("pr_q"))


def kcore_peel(edges: DataFrame, k: int,
               max_rounds: int = 12) -> DataFrame:
    """Iterative k-core peeling over an undirected edge list
    ``(u, v)`` (one row per edge, u < v): repeatedly drop nodes with
    degree < k until no node drops or ``max_rounds`` is exhausted.
    Returns the surviving nodes with their in-core degree.

    The result after R rounds is deterministic and engine-portable —
    peeling is monotone (a dropped node never returns) and idempotent
    at the fixed point, so an oracle that unrolls EXACTLY
    ``max_rounds`` rounds matches regardless of when convergence
    happened. The loop exits early when a round removes nothing
    (provably the fixed point, identical to running all R rounds).

    Scale shape per round: one degree fold + two semi joins on the
    (shrinking) edge list; ``localCheckpoint`` truncates lineage so
    round R's plan does not replay rounds 1..R-1. O(log n) rounds
    suffice in practice (each round removes the whole current shell).
    """
    alive_edges = edges.localCheckpoint(eager=False)
    prev_nodes = -1
    for _ in range(max_rounds):
        deg = (alive_edges.select(F.col("u").alias("node"))
               .unionAll(alive_edges.select(F.col("v").alias("node")))
               .groupBy("node").agg(F.count("*").alias("deg")))
        keep = (deg.where(F.col("deg") >= k).select("node")
                .localCheckpoint(eager=False))
        n_keep = keep.count()
        if n_keep == prev_nodes:
            break
        prev_nodes = n_keep
        alive_edges = (alive_edges
                       .join(keep.withColumnRenamed("node", "u"), "u",
                             "left_semi")
                       .join(keep.withColumnRenamed("node", "v"), "v",
                             "left_semi")
                       .select("u", "v")
                       .localCheckpoint(eager=False))
    deg = (alive_edges.select(F.col("u").alias("node"))
           .unionAll(alive_edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    return deg.where(F.col("deg") >= k)


def bfs_levels(edges: DataFrame, sources: DataFrame,
               max_rounds: int = 8) -> DataFrame:
    """Multi-source BFS levels over an undirected edge list ``(u, v)``:
    every node reachable within ``max_rounds`` hops gets its hop
    distance from the nearest source. Returns ``(node, level)``.

    Same determinism contract as ``kcore_peel``: round R's state is
    identical whether the loop exits early (empty frontier — the fixed
    point) or runs all R rounds, so an oracle that unrolls EXACTLY
    ``max_rounds`` rounds always matches.

    Scale shape per round: one equi-join frontier⋈edges + one anti
    join against the visited set, lineage truncated per round. Both
    frames shrink/grow monotonically; no global structure is ever
    collected."""
    sym = (edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionAll(edges.select(F.col("v").alias("src"),
                                  F.col("u").alias("dst")))
           .localCheckpoint(eager=False))
    visited = (sources.select("node", F.lit(0).alias("level"))
               .localCheckpoint(eager=False))
    frontier = visited.select("node")
    for lvl in range(1, max_rounds + 1):
        nxt = (sym.join(frontier.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .localCheckpoint(eager=False))
        if nxt.limit(1).count() == 0:
            break
        visited = (visited.unionByName(
            nxt.select("node", F.lit(lvl).alias("level")))
            .localCheckpoint(eager=False))
        frontier = nxt
    return visited


def bfs_levels_keyed(edges: DataFrame, sources: DataFrame,
                     max_rounds: int = 8) -> DataFrame:
    """Per-source BFS distances: like :func:`bfs_levels` but every
    source keeps its OWN distance field — ``sources`` is ``(skey,
    node)`` and the result is ``(skey, node, level)``, the input to
    closeness/harmonic centrality over a sampled source set. All
    sources advance in the SAME round (state keyed by (skey, node)),
    so the join count stays ``max_rounds`` regardless of |sources| —
    never one BFS sweep per source.

    Same determinism contract as ``bfs_levels``: round R state is
    identical with or without the early exit, so an oracle unrolling
    exactly ``max_rounds`` rounds matches.

    Scale shape per round: frontier⋈edges equi-join on the node +
    anti join against visited on (skey, node); lineage truncated per
    round. Frontier size is Σ per-source frontiers — bounded by
    |sources|·|nodes| but in practice by the sampled source count."""
    sym = (edges.select(F.col("u").alias("esrc"), F.col("v").alias("edst"))
           .unionAll(edges.select(F.col("v").alias("esrc"),
                                  F.col("u").alias("edst")))
           .localCheckpoint(eager=False))
    visited = (sources.select("skey", "node", F.lit(0).alias("level"))
               .localCheckpoint(eager=False))
    frontier = visited.select("skey", "node")
    for lvl in range(1, max_rounds + 1):
        nxt = (sym.join(frontier.withColumnRenamed("node", "esrc"), "esrc")
               .select("skey", F.col("edst").alias("node")).distinct()
               .join(visited.select("skey", "node"), ["skey", "node"],
                     "left_anti")
               .localCheckpoint(eager=False))
        if nxt.limit(1).count() == 0:
            break
        visited = (visited.unionByName(
            nxt.select("skey", "node", F.lit(lvl).alias("level")))
            .localCheckpoint(eager=False))
        frontier = nxt
    return visited


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007,
    the near-linear community baseline) over an undirected edge list
    ``(u, v)``: every node starts labeled with its own id; each round
    every node adopts the most frequent label among its neighbors,
    ties broken toward the smallest label. Returns ``(node, label)``
    after EXACTLY ``rounds`` synchronous rounds — no early exit, so an
    oracle that unrolls the same round count matches bit-for-bit
    (asynchronous/randomized LPA variants are NOT deterministic; the
    synchronous min-tie-break form is).

    Complements ``connected_components``: that finds *components*
    (min-label fixpoint), this finds *communities* (mode-label), which
    can split a connected blob into dense cores.

    Scale shape per round: one label-lookup equi-join (edges ⋈ labels
    on src — both sides partition by the join key across rounds) + one
    combinable (node, label) count fold + one max-struct fold per
    node; per-round state is the |V|-row label frame, lineage
    truncated each round. O(rounds) shuffles total, never O(diameter)
    state growth."""
    sym = (edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionAll(edges.select(F.col("v").alias("src"),
                                  F.col("u").alias("dst")))
           .localCheckpoint(eager=False))
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint(eager=False))
    for _ in range(rounds):
        votes = (sym.join(labels.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count("*").alias("c")))
        # max count, ties to the SMALLEST label: max(struct(c, -label))
        best = (votes.groupBy("node")
                .agg(F.max(F.struct(F.col("c"),
                                    (-F.col("label")).alias("nl")))
                     .alias("b"))
                .select("node", (-F.col("b.nl")).alias("label")))
        labels = best.localCheckpoint(eager=False)
    return labels
