"""PageRank: pinned against a pure-Python power iteration, dangling
mass, weights, and validation."""

import pytest

from otters_spark.operators.graph import pagerank


def _reference_pagerank(edges, n_iter=5, d=0.85, weights=None):
    """Plain-Python power iteration with the exact same formula."""
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    n = len(nodes)
    w = {e: (weights or {}).get(e, 1.0) for e in edges}
    outw = {}
    for (u, v), x in w.items():
        outw[u] = outw.get(u, 0.0) + x
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for (u, v), x in w.items():
            contrib[v] += r[u] * (x / outw[u])
        dm = sum(r[v] for v in nodes if v not in outw)
        r = {
            v: (1.0 - d) / n + d * (contrib[v] + dm / n)
            for v in nodes
        }
    return r


def test_pagerank_matches_reference_with_dangling(spark):
    # node 4 is dangling (no out-edges); 1 is a hub
    edges = [(1, 2), (1, 3), (2, 1), (3, 1), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    exp = _reference_pagerank(edges, n_iter=5)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9  # stochastic completion
    # the hub outranks the leaf pages
    assert got[1] == max(got.values())


def test_pagerank_weighted_and_parallel_edges(spark):
    # a parallel edge (1->2 twice at w=1) must equal one edge at w=2
    df_par = spark.createDataFrame(
        [(1, 2, 1.0), (1, 2, 1.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double",
    )
    df_w = spark.createDataFrame(
        [(1, 2, 2.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        "src long, dst long, w double",
    )
    a = {r["id"]: r["rank"] for r in pagerank(df_par, weight_col="w").collect()}
    b = {r["id"]: r["rank"] for r in pagerank(df_w, weight_col="w").collect()}
    assert a == b
    exp = _reference_pagerank(
        [(1, 2), (1, 3), (2, 1), (3, 1)],
        weights={(1, 2): 2.0, (1, 3): 1.0, (2, 1): 1.0, (3, 1): 1.0},
    )
    for v in exp:
        assert abs(b[v] - exp[v]) < 1e-12
    # weighting matters: node 2 (weight-2 inlink) beats node 3
    assert b[2] > b[3]


def test_pagerank_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)


def test_resolve_roots_chain_and_forest(spark):
    from otters_spark.operators.graph import resolve_roots

    # chain 0<-1<-2<-...<-9 (depth 9) plus a separate 2-node tree
    rows = [(0, 0)] + [(i, i - 1) for i in range(1, 10)] + [(100, 100), (101, 100)]
    par = spark.createDataFrame(rows, "node long, parent long")
    got = {r["node"]: (r["root"], r["depth"])
           for r in resolve_roots(par, max_depth=16).collect()}
    for i in range(10):
        assert got[i] == (0, i)
    assert got[100] == (100, 0) and got[101] == (100, 1)
    with pytest.raises(ValueError):
        resolve_roots(par, max_depth=0)
    # a chain deeper than max_depth raises instead of silently
    # reporting a mid-chain ancestor as the root
    with pytest.raises(ValueError, match="deeper than max_depth"):
        resolve_roots(par, max_depth=4).collect()


def test_resolve_roots_exact_depth_bound(spark):
    """Non-power-of-two max_depth: the doubling rounds mechanically
    cover the next power of two, but the declared contract is
    max_depth EXACTLY — a depth-6 chain under max_depth=5 raises
    instead of silently resolving under a looser bound."""
    from otters_spark.operators.graph import resolve_roots

    rows = [(0, 0)] + [(i, i - 1) for i in range(1, 7)]  # depth 6 chain
    par = spark.createDataFrame(rows, "node long, parent long")
    with pytest.raises(ValueError, match="> max_depth=5"):
        resolve_roots(par, max_depth=5).collect()
    # validate=False keeps the mechanical behavior for callers who
    # guarantee the bound upstream
    got = {r["node"]: r["depth"]
           for r in resolve_roots(par, max_depth=5, validate=False).collect()}
    assert got[6] == 6
    # and the exact bound passes
    got = {r["node"]: r["depth"]
           for r in resolve_roots(par, max_depth=6).collect()}
    assert got[6] == 6


def test_resolve_roots_dangling_parent_is_root(spark):
    """A parent id with no row of its own terminates the walk there
    (sentinel-root encoding) — no silent row loss."""
    from otters_spark.operators.graph import resolve_roots

    par = spark.createDataFrame([(1, 0), (2, 1)], "node long, parent long")
    got = {r["node"]: (r["root"], r["depth"])
           for r in resolve_roots(par, max_depth=8).collect()}
    assert got == {1: (0, 1), 2: (0, 2)}


def test_resolve_roots_vs_python_random_forests(spark):
    """Random parent-pointer forests vs a driver-side walk."""
    import random as _random

    from otters_spark.operators.graph import resolve_roots

    for seed in (7, 8):
        rng = _random.Random(seed)
        n = 200
        parent = {}
        for i in range(n):
            # nodes only point to LOWER ids -> guaranteed acyclic;
            # ~15% are roots (self-parented)
            parent[i] = i if (i == 0 or rng.random() < 0.15) else rng.randrange(i)
        par = spark.createDataFrame(
            list(parent.items()), "node long, parent long"
        )
        got = {r["node"]: (r["root"], r["depth"])
               for r in resolve_roots(par, max_depth=256).collect()}
        for i in range(n):
            cur, d = i, 0
            while parent[cur] != cur:
                cur, d = parent[cur], d + 1
            assert got[i] == (cur, d), (seed, i, got[i], (cur, d))


def test_triangle_count_hand_and_random(spark):
    """Hand case (K4 minus an edge) and random graphs vs a brute-force
    Python reference; duplicates/direction/self-loops ignored."""
    import itertools
    import random as _random

    from otters_spark.operators.graph import triangle_count

    # K4 minus edge (2,3): triangles (0,1,2) and (0,1,3)
    edges = [(0, 1), (1, 0), (0, 2), (1, 2), (0, 3), (3, 1), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}

    for seed in (3, 4):
        rng = _random.Random(seed)
        n = 25
        und = {
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.25
        }
        rows = [(a, b) if rng.random() < 0.5 else (b, a) for a, b in und]
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        want = {}
        for a, b, c in itertools.combinations(range(n), 3):
            if ({tuple(sorted((a, b))), tuple(sorted((a, c))),
                 tuple(sorted((b, c)))} <= und):
                for x in (a, b, c):
                    want[x] = want.get(x, 0) + 1
        assert got == want, seed


# --------------------------------------------------------------------------
# k-core peeling
# --------------------------------------------------------------------------


def test_kcore_peels_tail_keeps_clique(spark):
    from otters_spark.operators.graph import kcore

    # triangle {1,2,3} with a pendant path 3-4-5: the path peels in two
    # rounds (5 first, then 4), the triangle survives with degree 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_empty_when_everything_peels(spark):
    from otters_spark.operators.graph import kcore

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    assert kcore(path, k=2).count() == 0


def test_kcore_ignores_direction_dupes_selfloops(spark):
    from otters_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)],
        "src long, dst long",
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_matches_reference_peeling(spark, sf_dir):
    import collections

    from otters_spark.operators.graph import kcore
    from pyspark.sql import functions as F

    # co-purchase graph restricted to a sparse slice so peeling is real
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_orderkey") % 17 == 0
    )
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    edges = (
        a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
    )
    got = {r["node"]: r["degree"] for r in kcore(edges, k=3, max_rounds=30).collect()}
    adj = collections.defaultdict(set)
    for r in edges.distinct().collect():
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])
    alive = {n: set(s) for n, s in adj.items()}
    while True:
        dead = [n for n, s in alive.items() if len(s) < 3]
        if not dead:
            break
        for n in dead:
            for m in alive[n]:
                alive[m].discard(n)
            del alive[n]
    assert got == {n: len(s) for n, s in alive.items()}


def test_kcore_raises_on_round_exhaustion(spark):
    import pytest as _pytest

    from otters_spark.operators.graph import kcore

    # a path of 9 nodes needs 4 peel rounds at k=2; cap at 1 and it
    # must refuse rather than return a partial peel
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="max_rounds"):
        kcore(path, k=2, max_rounds=1)
    with _pytest.raises(ValueError, match="k must be"):
        kcore(path, k=0)


def _reference_adamic_adar(edges):
    """Plain-Python AA over an undirected edge list."""
    import math
    from collections import defaultdict

    nbr = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbr[u].add(v)
            nbr[v].add(u)
    deg = {z: len(ns) for z, ns in nbr.items()}
    nodes = sorted(nbr)
    out = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in nbr[a]:
                continue  # adjacent — not a prediction
            common = nbr[a] & nbr[b]
            common = {z for z in common if deg[z] > 1}
            if common:
                out[(a, b)] = (
                    len(common),
                    sum(1.0 / math.log(deg[z]) for z in common),
                )
    return out


def test_adamic_adar_hand_graph(spark):
    from otters_spark.operators.graph import adamic_adar

    # path 1-2-3 plus hub 4 connected to 1,2,3: prediction (1,3)
    # through centers 2 (deg 3) and 4 (deg 3)
    edges = [(1, 2), (2, 3), (4, 1), (4, 2), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = adamic_adar(df).collect()
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["aa_score"]) for r in rows}
    exp = _reference_adamic_adar(edges)
    assert set(got) == set(exp)
    for k, (nc, sc) in exp.items():
        assert got[k][0] == nc
        assert abs(got[k][1] - sc) < 1e-12


def test_adamic_adar_random_vs_reference(spark):
    import random

    from otters_spark.operators.graph import adamic_adar

    rng = random.Random(42)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    df = spark.createDataFrame(
        [(u, v) for u, v in edges], "src long, dst long"
    )
    rows = adamic_adar(df).collect()
    got = {(r["node_a"], r["node_b"]): (r["n_common"], r["aa_score"]) for r in rows}
    exp = _reference_adamic_adar(edges)
    assert set(got) == set(exp)
    for k, (nc, sc) in exp.items():
        assert got[k][0] == nc
        assert abs(got[k][1] - sc) < 1e-9


def test_adamic_adar_ignores_direction_and_duplicates(spark):
    from otters_spark.operators.graph import adamic_adar

    a = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (2, 3), (3, 3)], "src long, dst long"
    )
    b = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ra = {(r["node_a"], r["node_b"]): r["aa_score"] for r in adamic_adar(a).collect()}
    rb = {(r["node_a"], r["node_b"]): r["aa_score"] for r in adamic_adar(b).collect()}
    assert ra == rb


def test_subtree_rollup_hand_tree(spark):
    """Bushy 2-level tree + a sentinel-rooted chain + an isolated node:
    every subtree sum equals the hand-computed descendants+self total,
    and sentinel ancestors (absent from values) are not reported."""
    from otters_spark.operators.graph import subtree_rollup

    #        1
    #      /   \
    #     2     3        (root 1 self-parented)
    #    / \     \
    #   4   5     6
    # chain: 10 -> 11 -> 0 (0 is a sentinel: no value row, parent of 11)
    # isolated: 77 (self-parented, no children)
    parents = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 3),
         (10, 11), (11, 0), (77, 77)],
        "node long, parent long",
    )
    values = spark.createDataFrame(
        [(1, 100), (2, 20), (3, 30), (4, 4), (5, 5), (6, 6),
         (10, 1000), (11, 2000), (77, 7)],
        "node long, value long",
    )
    got = {
        r["node"]: (r["subtree_n"], r["subtree_sum"])
        for r in subtree_rollup(parents, values, max_depth=8).collect()
    }
    assert got[1] == (6, 165)   # whole tree
    assert got[2] == (3, 29)
    assert got[3] == (2, 36)
    assert got[4] == (1, 4) and got[5] == (1, 5) and got[6] == (1, 6)
    assert got[11] == (2, 3000)  # 10 rolls into 11; sentinel 0 absent
    assert got[10] == (1, 1000)
    assert got[77] == (1, 7)
    assert 0 not in got
    assert len(got) == 9


def test_subtree_rollup_matches_python_random_forest(spark):
    """Random forests vs a brute-force Python rollup."""
    import random

    from otters_spark.operators.graph import subtree_rollup

    rng = random.Random(17)
    n = 300
    parent = {0: 0}
    for i in range(1, n):
        parent[i] = rng.randrange(0, i)  # acyclic by construction
    vals = {i: rng.randrange(-50, 500) for i in range(n)}
    # brute force: every node contributes to all its ancestors
    n_sub = {i: 1 for i in range(n)}
    s_sub = {i: vals[i] for i in range(n)}
    for i in range(1, n):
        a = parent[i]
        while True:
            n_sub[a] += 1
            s_sub[a] += vals[i]
            if parent[a] == a:
                break
            a = parent[a]
    parents = spark.createDataFrame(
        [(i, parent[i]) for i in range(n)], "node long, parent long"
    )
    values = spark.createDataFrame(
        [(i, vals[i]) for i in range(n)], "node long, value long"
    )
    got = {
        r["node"]: (r["subtree_n"], r["subtree_sum"])
        for r in subtree_rollup(parents, values, max_depth=64).collect()
    }
    assert got == {i: (n_sub[i], s_sub[i]) for i in range(n)}


def test_subtree_rollup_depth_validation(spark):
    from otters_spark.operators.graph import subtree_rollup

    chain = spark.createDataFrame(
        [(i, max(i - 1, 0)) for i in range(12)], "node long, parent long"
    )
    values = spark.createDataFrame(
        [(i, 1) for i in range(12)], "node long, value long"
    )
    with pytest.raises(ValueError, match="deeper than max_depth"):
        subtree_rollup(chain, values, max_depth=4)
    ok = {
        r["node"]: r["subtree_n"]
        for r in subtree_rollup(chain, values, max_depth=16).collect()
    }
    assert ok[0] == 12 and ok[11] == 1
