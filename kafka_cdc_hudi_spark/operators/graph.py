"""Connected components over a pair/edge list — the cluster-assignment step
that turns near-dup PAIRS (MinHash-LSH, SimHash, embedding-cosine) into
dedup FAMILIES with one canonical document each.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min label over itself and its
neighbors; fixpoint = components labeled by their minimum member. Rounds
needed = graph diameter — for near-dup families that is tiny (pairs from
banding form near-cliques, diameter ≤ 2-3 in practice), so the loop
converges in a handful of rounds. Each round is ONE shuffle (join on node
+ min-aggregate with map-side partial agg); the convergence probe is a
``limit(1).count()`` on the label-change set, not a full count.

Two variants:

- :func:`connected_components` — plain min-label propagation; rounds =
  component diameter. The right default for near-dup families (banding
  pairs form near-cliques, diameter ≤ 2-3).
- :func:`connected_components_star` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond");
  O(log n) rounds on ANY shape, including chain graphs. Use when the edge
  distribution is unknown or adversarial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    scale path for ARBITRARY graph shapes: converges in O(log n) rounds
    even on chain graphs where min-label propagation needs diameter rounds.

    Each round is two grouped-min joins over the current edge set; the edge
    set only shrinks toward star form (every node directly attached to its
    component's minimum), so per-round cost falls as it converges. Returns
    ``DataFrame[node, component]`` for every node appearing in an edge.

    large-star(u): attach every neighbor v > u to m = min(N(u) ∪ {u}).
    small-star(u): attach every neighbor v < u (and u) to the minimum of
    those. Both preserve connectivity; alternating them contracts any
    component to a star in logarithmic rounds.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def sym(c: DataFrame) -> DataFrame:
        return c.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            c.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    for _ in range(max_iter):
        s = sym(canon)
        # large-star: m = min over the FULL neighborhood (and u itself).
        # LAZY checkpoints (r14, guide §1.2): the cache boundary still
        # truncates lineage and dedups the two sym() reads, but the
        # materialization folds into the convergence probe's job instead
        # of running 2 extra blocking driver-synchronous jobs per round —
        # locally the per-round job count, not the tiny data, is the cost.
        mins_all = s.groupBy("u").agg(F.min("v").alias("mn"))
        ls = (
            s.filter(F.col("v") > F.col("u"))
            .join(mins_all, "u")
            .select(
                F.least(F.col("mn"), F.col("u")).alias("a"),
                F.col("v").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # small-star over the large-star output
        s2 = sym(ls)
        below = s2.filter(F.col("v") < F.col("u"))
        mins_b = below.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            below.join(mins_b, "u")
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .unionByName(mins_b.select(F.col("m").alias("a"), F.col("u").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # ONE symmetric-difference probe job (was two limit(1) counts);
        # it also materializes the ls/ss checkpoint caches
        changed = (
            ss.exceptAll(canon)
            .unionByName(canon.exceptAll(ss))
            .limit(1)
            .count()
        )
        canon = ss
        if changed == 0:
            # star form: every edge is (component-min, member)
            members = canon.select(F.col("b").alias("node"), F.col("a").alias("component"))
            roots = all_nodes.join(
                canon.select(F.col("b").alias("node")), "node", "left_anti"
            ).withColumn("component", F.col("node"))
            return members.unionByName(roots)
    raise RuntimeError(f"connected_components_star did not converge in {max_iter} rounds")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label each node reachable through ``edges`` with the minimum node id
    of its component. Returns ``DataFrame[node, component]`` covering every
    node that appears in an edge (callers left-join and coalesce to pick up
    singletons). Deterministic; raises if not converged by ``max_iter``."""
    # localCheckpoint (eager) after every round: iterative plans otherwise
    # grow lineage linearly — each round Catalyst re-optimizes the whole
    # history and the job eventually crawls/overflows. The checkpoint
    # truncates the plan to a cached leaf; cluster-durable `checkpoint()`
    # would be the choice where executor loss must be survivable mid-run.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), F.col("component")
        )
        # lazy checkpoint (r14): same lineage truncation, but the round's
        # change-probe job materializes the cache — one job per round
        # instead of two (see connected_components_star)
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the near-dup assumption; use "
        "connected_components_star for chain-shaped graphs)"
    )


def pagerank_int(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iters: int = 5,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Integer fixed-point PageRank (damping 0.85, undirected edges): ranks
    live in exact parts-per-billion BIGINTs and every step is integer
    division, so the result is bit-identical across engines and
    partitionings — which is what lets an ITERATIVE float-free algorithm
    carry a full SQL value oracle (r0..rN unrolled as CTEs).

    Per iteration: contribution = rank div degree per out-edge, one
    shuffle to sum per target, then rank' = (15 * (scale div n)) div 100 +
    (85 * sum) div 100. Truncation leaks a little mass per round —
    deterministic and harmless for ranking. localCheckpoint per round
    truncates lineage exactly like connected_components. Returns
    (node, deg, rank_ppb)."""
    # eager checkpoint: the edge frame may carry an expensive lineage (the
    # near-dup caller feeds the full LSH candidate chain), and und/deg are
    # re-read by every iteration's join — without this, each of the
    # 2*iters+1 jobs replays that lineage from scratch (measured 7.9s ->
    # 3.7s warm at sf0.01)
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    n = deg.count()
    if n == 0:
        raise ValueError("pagerank over an empty edge set")
    base = (15 * (scale // n)) // 100
    r = deg.select(F.col("a").alias("node"), F.lit(scale // n).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            und.join(r, und.a == r.node)
            .join(deg, "a")
            .select(F.col("b"), F.expr("rank div deg").alias("c"))
        )
        sums = contrib.groupBy("b").agg(F.sum("c").alias("m"))
        r = (
            deg.select(F.col("a").alias("node"))
            .join(sums, F.col("node") == F.col("b"), "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return deg.select(F.col("a").alias("node"), "deg").join(r, "node").select(
        "node", "deg", F.col("rank").alias("rank_ppb")
    )


def count_triangles(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (near-dup
    pairs) — the clustering-density signal: a doc in many triangles sits
    inside a tight template family (near-clique), not a chain of marginal
    matches.

    Degree-ordered orientation (the standard MapReduce triangle-counting
    technique, Suri & Vassilvitskii WWW 2011 — public algorithm): orient
    every edge from its lower-(degree, id) endpoint to the higher. Every
    out-degree is then O(sqrt(m)) regardless of skew, so the wedge join
    (pairs of out-neighbors per node) is bounded even on clique-heavy or
    hub-heavy graphs where a naive adjacency join explodes on the hub.
    A triangle closes a wedge via one more equi-join and is counted
    EXACTLY once, at its lowest-ordered vertex. Three shuffles total
    (degree agg, wedge join, closing join) — no iteration.

    Returns ``DataFrame[node, n_triangles]`` for nodes in >= 1 triangle.
    """
    e = (
        # canonicalize BEFORE distinct (ADVICE r8): a caller passing both
        # (a,b) and (b,a) must collapse them to one undirected edge here —
        # otherwise the oriented set holds the edge twice and the wedge/
        # closing joins inflate triangle counts
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("s"),
            F.greatest(F.col(src), F.col(dst)).alias("t"),
        )
        .filter(F.col("s") != F.col("t"))
        .distinct()
        # the edge set is referenced 5x below (symmetrization, orientation
        # x2, wedges x2, closing); without truncation every reference
        # re-expands the caller's full candidate-generation lineage —
        # measured 1544 Exchange nodes in the near-dup entry's plan vs 10
        # after (PLAN_AUDIT r8). Same pattern as the CC/PageRank ops.
        .localCheckpoint()
    )
    und = e.unionByName(e.select(F.col("t").alias("s"), F.col("s").alias("t"))).distinct()
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).withColumnRenamed("s", "n")
    ed = e.join(
        deg.select(F.col("n").alias("s"), F.col("deg").alias("sdeg")), "s"
    ).join(deg.select(F.col("n").alias("t"), F.col("deg").alias("tdeg")), "t")
    fwd = ed.filter(F.struct("sdeg", "s") < F.struct("tdeg", "t")).select("s", "t", "tdeg")
    rev = ed.filter(F.struct("tdeg", "t") < F.struct("sdeg", "s")).select(
        F.col("t").alias("s"), F.col("s").alias("t"), F.col("sdeg").alias("tdeg")
    )
    # oriented edges feed three joins (wedge x2 + closing) — truncate once
    o = fwd.unionByName(rev).localCheckpoint()
    e1 = o.select(F.col("s").alias("a"), F.col("t").alias("b"), F.col("tdeg").alias("bdeg"))
    e2 = o.select(F.col("s").alias("a"), F.col("t").alias("c"), F.col("tdeg").alias("cdeg"))
    wedges = e1.join(e2, "a").filter(F.struct("bdeg", "b") < F.struct("cdeg", "c"))
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
