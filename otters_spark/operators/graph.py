"""Graph analytics over edge tables — the lane next to
``dedup.connected_components`` (which clusters near-dup pairs): rank
nodes of a relationship graph extracted from relational data (trade
flows, link graphs, citation webs).

Scale shape shared by the family: the graph lives as a distributed
edge table keyed by ``src``; every iteration is one hash-shuffle
join + partial-aggregated groupBy (never an adjacency matrix, never
driver-side state); per-round lineage is cut with lazy
``localCheckpoint`` so the plan does not grow with iterations — the
same convergent-iteration device as connected components. PageRank
here runs a FIXED iteration count (the common production choice:
deterministic cost, deterministic output — and what makes the result
oracle-checkable as unrolled SQL) rather than convergence-testing
each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "adamic_adar",
    "kcore",
    "pagerank",
    "resolve_roots",
    "subtree_rollup",
    "triangle_count",
]


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts of the UNDIRECTED graph induced by
    ``edges`` (direction/duplicates/self-loops ignored) — the local
    clustering signal behind community detection and link-spam
    scoring. Returns ``(node, n_triangles)`` for every node in at
    least one triangle.

    DEGREE-ORDERED wedge join (Cohen's MapReduce formulation; the
    Schank–Wagner order): direct every edge from its lower
    (degree, id) endpoint to the higher, enumerate wedges only at
    each edge's LOW endpoint, and close them against the directed
    edge set. Every triangle a<b<c (in rank order) is found exactly
    once — as wedge (b,c) at a closed by edge b→c.

    Why the ordering matters at scale: out-degrees in the ranked
    orientation are bounded by O(√m) on ANY graph, so the wedge join
    emits at most O(m^1.5) candidates — a celebrity hub (degree
    10^7) RECEIVES edges instead of emitting 10^14 wedge pairs; its
    wedges are charged to its low-degree neighbors. All three stages
    are hash-keyed shuffles (canonicalize+distinct, degree join,
    wedge self-join + closing join); nothing is ever adjacency-
    materialized per node beyond the ranked out-list."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        # pinned: consumed by both degree arms and the ranked join —
        # unpinned, Catalyst re-expands the caller's (possibly
        # many-table) edge derivation once per consumer
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("__db"))
    ranked = und.join(da, "a").join(db, "b")
    lo_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    # directed low-rank -> high-rank, carrying the head's rank key for
    # the wedge ordering
    ed = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        F.when(
            lo_first,
            F.struct(F.col("__db").alias("d"), F.col("b").alias("n")),
        ).otherwise(
            F.struct(F.col("__da").alias("d"), F.col("a").alias("n"))
        ).alias("__rt"),
    ).localCheckpoint(eager=False)  # consumed 3x: both wedge arms + closing
    e1 = ed.select(
        F.col("s"), F.col("t").alias("w1"), F.col("__rt").alias("__r1")
    )
    e2 = ed.select(
        F.col("s"), F.col("t").alias("w2"), F.col("__rt").alias("__r2")
    )
    wedges = e1.join(e2, "s").filter(F.col("__r1") < F.col("__r2"))
    closing = ed.select(F.col("s").alias("w1"), F.col("t").alias("w2"))
    tris = wedges.join(closing, ["w1", "w2"]).select("s", "w1", "w2")
    members = (
        tris.select(F.col("s").alias("node"))
        .unionAll(tris.select(F.col("w1").alias("node")))
        .unionAll(tris.select(F.col("w2").alias("node")))
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def resolve_roots(
    parents: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 64,
    validate: bool = True,
) -> DataFrame:
    """Root and depth of every node in a parent-pointer forest (org
    charts, category trees, BOM hierarchies, thread reply chains) —
    the transitive-closure query SQL engines express with a RECURSIVE
    CTE and Spark has no primitive for.

    POINTER DOUBLING, not step-by-step walking: each round every node
    jumps from its known 2^r-th ancestor to that ancestor's own known
    ancestor, doubling the distance covered — ``ceil(log2(max_depth))``
    self-joins TOTAL, where the naive walk shuffles once PER LEVEL.
    At web scale (reply chains thousands deep) that is 12 rounds
    instead of thousands. Roots are self-parented (parent == node) —
    they carry (anc=self, hops=0), so joining through a root is a
    fixpoint and depths clamp automatically. A parent id with NO row
    of its own is also treated as a root (the common "parent points
    at a sentinel outside the table" encoding): the rounds LEFT-join,
    so an unmatched ancestor simply stops the walk there instead of
    silently dropping the node. Per-round lineage is cut with an
    eager checkpoint (the PageRank lesson: Catalyst re-analysis, not
    execution, dominates nested iterative plans).

    ``validate=True`` (default) spends one extra aggregate to assert
    (a) no node was still mid-walk after the final round — otherwise a
    chain deeper than the covered range would silently report a
    non-root ancestor as its root — and (b) no resolved depth exceeds
    ``max_depth`` exactly. (b) matters because the doubling rounds
    cover 2^ceil(log2(max_depth)) hops: for non-power-of-two bounds
    (say 5) a depth-6 chain resolves fine mechanically, but accepting
    it would make the declared contract looser than documented, so it
    raises too. Pass ``validate=False`` only when the depth bound is
    guaranteed upstream.

    Returns (node, root, depth).
    """
    import math

    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    state = parents.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(F.col(parent_col) == F.col(node_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("hops"),
    )
    for _ in range(max(1, math.ceil(math.log2(max_depth)))):
        nxt = state.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("hops").alias("j_hops"),
        )
        state = (
            state.join(nxt, state["anc"] == nxt["j_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("j_anc"), F.col("anc")).alias("anc"),
                (F.col("hops") + F.coalesce(F.col("j_hops"), F.lit(0))).alias(
                    "hops"
                ),
            )
            .localCheckpoint()  # eager, like PageRank's per-round cut
        )
    if validate:
        movers = parents.filter(F.col(parent_col) != F.col(node_col)).select(
            F.col(node_col).alias("__mover")
        )
        # one job checks both contract halves: unresolved walks (anc is
        # still a node with its own parent) and over-depth chains that
        # the power-of-two round count happened to cover anyway
        bad = (
            state.join(movers, state["anc"] == F.col("__mover"), "left")
            .agg(
                F.count("__mover").alias("n_bad"),
                F.max("hops").alias("max_hops"),
            )
            .collect()[0]
        )
        if bad["n_bad"]:
            raise ValueError(
                f"resolve_roots: {bad['n_bad']} nodes still unresolved after "
                f"ceil(log2({max_depth})) doubling rounds — the forest is "
                "deeper than max_depth; raise it"
            )
        if bad["max_hops"] is not None and bad["max_hops"] > max_depth:
            raise ValueError(
                f"resolve_roots: resolved a chain of depth {bad['max_hops']} "
                f"> max_depth={max_depth} — the doubling rounds cover the "
                "next power of two, but the declared bound is max_depth; "
                "raise it to accept deeper forests"
            )
    return state.select(
        "node", F.col("anc").alias("root"), F.col("hops").alias("depth")
    )


def subtree_rollup(
    parents: DataFrame,
    values: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    id_col: str = "node",
    value_col: str = "value",
    max_depth: int = 64,
    validate: bool = True,
) -> DataFrame:
    """Aggregate a value over every node's FULL subtree (self +
    all descendants) in a parent-pointer forest — BOM cost rollups,
    org-chart headcounts, category-tree revenue. This is the
    RECURSIVE-CTE aggregation SQL engines write as closure + GROUP BY
    and Spark has no primitive for.

    Algorithm: ancestor CLOSURE by pointer doubling — round r composes
    the known pair set with itself ((n→a) ∧ (a→b) ⇒ n→b), so
    ``ceil(log2(max_depth))`` self-joins cover chains the naive
    per-level walk would need depth shuffles for. The closure then
    joins values once and one groupBy(ancestor) produces every
    subtree's descendant count and sum; each node's own value folds in
    with a final left join (nodes with no descendants report
    ``(1, own value)``).

    Scale shape: the closure materializes one row per (node, ancestor)
    pair — Σ depth(n) rows, i.e. n·avg_depth. For the bushy
    hierarchies this targets (org charts, BOMs, category trees:
    depth ≪ n) that is a small multiple of n; a DEGENERATE
    length-L chain produces L²/2 pairs — don't point this at
    linked-list-shaped data. Each round is one hash join + distinct
    with eagerly checkpointed lineage (the resolve_roots device).
    Roots may be self-parented (self-loops are excluded from the
    closure) or point at a sentinel id absent from ``values`` —
    sentinel ancestors simply don't appear in the output.

    ``validate=True`` runs one extra composition after the doubling
    rounds and raises if it still finds new pairs (a forest deeper
    than ``max_depth`` would otherwise silently under-aggregate deep
    subtrees).

    Returns ``(node, subtree_n, subtree_sum)`` for every row of
    ``values``. Sums are whatever type the caller feeds — integer
    cents in, exact longs out (oracle discipline).
    """
    import math

    closure = (
        parents.select(
            F.col(node_col).alias("node"), F.col(parent_col).alias("anc")
        )
        .filter(F.col(parent_col) != F.col(node_col))
        .localCheckpoint()
    )

    def compose(pairs: DataFrame) -> DataFrame:
        hop = pairs.select(
            F.col("node").alias("j_node"), F.col("anc").alias("j_anc")
        )
        return pairs.join(hop, pairs["anc"] == hop["j_node"]).select(
            "node", F.col("j_anc").alias("anc")
        )

    for _ in range(max(1, math.ceil(math.log2(max_depth)))):
        closure = (
            closure.unionByName(compose(closure)).distinct().localCheckpoint()
        )
    if validate:
        # set difference, not bag: compose() yields the same pair once
        # per decomposition path, and those duplicates must not read
        # as growth
        grown = compose(closure).subtract(closure).limit(1).count()
        if grown:
            raise ValueError(
                f"subtree_rollup: closure still growing after "
                f"ceil(log2({max_depth})) doubling rounds — the forest is "
                "deeper than max_depth; raise it"
            )
    vals = values.select(
        F.col(id_col).alias("__id"), F.col(value_col).alias("__v")
    )
    desc = (
        closure.join(vals, closure["node"] == vals["__id"])
        .groupBy("anc")
        .agg(
            F.count(F.lit(1)).alias("__n_desc"),
            F.sum("__v").alias("__s_desc"),
        )
    )
    return (
        vals.join(desc, vals["__id"] == desc["anc"], "left")
        .select(
            F.col("__id").alias("node"),
            (F.lit(1) + F.coalesce(F.col("__n_desc"), F.lit(0)))
            .cast("long")
            .alias("subtree_n"),
            (F.col("__v") + F.coalesce(F.col("__s_desc"), F.lit(0))).alias(
                "subtree_sum"
            ),
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution, ``n_iter``
    fixed power iterations: returns (id, rank) for every node
    appearing as a source or destination.

    rank_{t+1}(v) = (1-d)/N + d·( Σ_{u→v} rank_t(u)·p_uv + D_t/N )

    where ``p_uv`` is u's out-weight share to v (uniform when
    ``weight_col`` is None; parallel edges coalesce by summing) and
    ``D_t`` the total rank of dangling nodes (no out-edges), spread
    uniformly — the standard stochastic-matrix completion, so ranks
    sum to 1 every round.

    Scale notes: edges/nodes/normalized-edges are each pinned to one
    computation with lazy localCheckpoints (consumed every round —
    Catalyst re-expands shared subtrees per consumer); N and the
    dangling-node COUNT are collected once per call (two static
    scalars, the convergence-count precedent from
    ``dedup.connected_components``) so a dangling-free graph — the
    common case after edge cleaning — runs each round as ONE
    join+agg job with no broadcast subtrees. When dangling nodes
    exist, their per-round mass is a one-row aggregate broadcast
    back (never an unpartitioned window). Each round shuffles only
    (id, double) rank rows keyed by node; skewed in-degree
    (celebrity nodes) lands in the partial agg, not a single task."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("__w"))
        .groupBy("src", "dst")
        .agg(F.sum("__w").alias("__w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outw = e.groupBy("src").agg(F.sum("__w").alias("__ow"))
    # per-edge transition probability, precomputed ONCE (the per-round
    # join then multiplies rank · p — one flop per edge per round)
    norm = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("__w") / F.col("__ow")).alias("__p"))
        .localCheckpoint(eager=False)
    )
    static = (
        nodes.join(outw, nodes["id"] == outw["src"], "left")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col("src").isNull(), 1)).alias("__nd"),
        )
        .collect()[0]
    )
    n_count, n_dangling = static["__n"], static["__nd"]
    # same IEEE operands/ops as the SQL oracle's {repr(1-d)}::DOUBLE/n
    # and 1.0::DOUBLE/n — Python division of the identical doubles
    init = 1.0 / n_count
    base = (1.0 - damping) / n_count
    ranks = nodes.select("id", F.lit(init).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(norm, ranks["id"] == norm["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("__p")).alias("__c"))
        )
        new_rank = F.lit(base) + F.lit(damping) * (
            F.coalesce(F.col("__c"), F.lit(0.0))
        )
        joined = nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
        if n_dangling:
            # dangling mass changes each round — a one-row aggregate
            # broadcast back; skipped entirely (adding an exact +0.0
            # is an IEEE no-op on positive ranks) when the static
            # check found no dangling nodes
            dangling = (
                ranks.join(outw, ranks["id"] == outw["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
            )
            new_rank = F.lit(base) + F.lit(damping) * (
                F.coalesce(F.col("__c"), F.lit(0.0))
                + F.col("__dm") / F.lit(float(n_count))
            )
            joined = joined.crossJoin(F.broadcast(dangling))
        ranks = (
            joined.select("id", new_rank.alias("rank"))
            # EAGER on purpose, unlike the module's other checkpoints:
            # a lazy checkpoint keeps the logical plan nested, so
            # Catalyst re-analyzes a plan that GROWS with every round
            # (measured: 15 s of pure analysis for 5 rounds vs 0.3 s
            # of execution). Eager materialization truncates lineage
            # per round — one small job each, the CC trade-off.
            .localCheckpoint()
        )
    return ranks


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 8,
) -> DataFrame:
    """The k-core of the undirected graph induced by ``edges``
    (direction/duplicates/self-loops ignored): the maximal subgraph in
    which every node has degree >= k — the classic density filter for
    community cores, spam-farm detection and graph sparsification
    (Batagelj-Zaversnik peeling, distributed form).

    ITERATIVE PEELING: each round computes degrees over the surviving
    edge set and anti-joins away every node with degree < k (removing
    a node lowers its neighbors' degrees, so peeling cascades).
    Per-round cost is one count aggregate + two anti-joins, all
    hash-keyed shuffles; lineage is cut with a lazy localCheckpoint
    per round and convergence is ONE driver-side empty-check per
    round — the connected_components discipline. Rounds needed equal
    the peeling depth of the graph (how many onion layers come off),
    NOT its diameter; raises if ``max_rounds`` isn't enough rather
    than returning a non-core silently.

    Returns ``(node, degree)`` for every node of the k-core, degree
    measured within the core."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    cur = (
        e.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def degrees(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("a").alias("node"))
            .unionAll(ed.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )

    for _ in range(max_rounds):
        deg = degrees(cur).localCheckpoint(eager=False)
        weak = deg.filter(F.col("degree") < k)
        if weak.isEmpty():  # one job per round, the CC discipline
            return deg
        cur = (
            cur.join(weak, cur["a"] == weak["node"], "left_anti")
            .join(weak, F.col("b") == weak["node"], "left_anti")
            .localCheckpoint(eager=False)
        )
    # max_rounds exhausted: either converged exactly at the boundary
    # or not — check once more and refuse to return a non-core
    deg = degrees(cur).localCheckpoint(eager=False)
    if deg.filter(F.col("degree") < k).isEmpty():
        return deg
    raise RuntimeError(
        f"kcore: peeling did not converge within max_rounds={max_rounds}; "
        "raise max_rounds (rounds needed = the graph's peeling depth)"
    )


def adamic_adar(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Adamic–Adar link-prediction scores for every NON-ADJACENT node
    pair with at least one common neighbor: ``score(a, b) =
    sum over z in N(a) intersect N(b) of 1 / ln(degree(z))`` — the
    classic "common friends, weighted down by how promiscuous the
    friend is" signal (Adamic & Adar 2003). Returns
    ``(node_a, node_b, n_common, aa_score)`` with ``node_a < node_b``.

    Shape: canonicalize to an undirected distinct edge set, degree
    table once, then ONE wedge self-join through the center node —
    every candidate pair is emitted by each common neighbor, carrying
    that neighbor's ``1/ln(degree)`` weight, and a single groupBy
    sums the weights. Cost is sum(degree(z)^2) over centers, the
    problem's intrinsic wedge count — UNLIKE triangle_count there is
    no degree-ordered pruning that preserves the score, because every
    common neighbor contributes weight regardless of rank; a
    celebrity hub therefore emits degree^2 candidates. Production
    mitigation (documented, not silently applied): cap or drop
    centers above a degree ceiling — their weight 1/ln(d) is tiny and
    the pairs they generate are the least informative; AQE skew-join
    splits the residual skew. Degree-1 centers contribute
    1/ln(1) = inf; ln(degree) <= ln(1) centers are excluded (a
    degree-1 node generates no wedge anyway, but the guard keeps the
    expression total). The final anti-join removes already-adjacent
    pairs, leaving only genuine link PREDICTIONS."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)  # consumed by degrees, both wedge arms, anti-join
    )
    deg = (
        und.select(F.col("a").alias("z"))
        .unionAll(und.select(F.col("b").alias("z")))
        .groupBy("z")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    # adjacency oriented center -> neighbor, both directions
    adj = und.select(F.col("a").alias("z"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    ctr = adj.join(deg, "z").filter(F.col("__d") > 1)
    w1 = ctr.select("z", F.col("n").alias("node_a"), "__d")
    w2 = ctr.select("z", F.col("n").alias("node_b"))
    pairs = (
        w1.join(w2, "z")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.lit(1.0) / F.log(F.col("__d").cast("double"))).alias(
                "aa_score"
            ),
        )
    )
    adjacent = und.select(
        F.col("a").alias("node_a"), F.col("b").alias("node_b")
    )
    return pairs.join(adjacent, ["node_a", "node_b"], "left_anti")
