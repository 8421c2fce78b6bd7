"""pagerank (operators/graph.py) vs dense numpy power iteration with
identical damping/teleport/iterations, plus structural invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edge_list, n, iters, damping, directed):
    pairs = set()
    for s, d in edge_list:
        pairs.add((s, d))
        if not directed:
            pairs.add((d, s))
    deg = np.zeros(n)
    for s, _ in pairs:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for s, d in pairs:
            nxt[d] += damping * r[s] / deg[s]
        r = nxt
    return r


def _run(spark, edge_list, iters=10, damping=0.85, directed=False):
    edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=iters, damping=damping, directed=directed).collect()
    }
    return got


def test_matches_numpy_power_iteration(spark):
    rng = np.random.default_rng(7)
    n = 30
    edge_list = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, n, 120), rng.integers(0, n, 120))
        if a != b
    ]
    nodes = sorted({x for e in edge_list for x in e})
    want = _numpy_pagerank(edge_list, n, iters=10, damping=0.85, directed=False)
    got = _run(spark, edge_list)
    for node in nodes:
        assert abs(got[node] - want[node]) < 1e-9, node


def test_ranks_sum_to_one_and_star_center_dominates(spark):
    # star: center 0 <-> leaves 1..8; undirected, no dangling nodes
    edge_list = [(0, i) for i in range(1, 9)]
    got = _run(spark, edge_list)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[0] > max(v for k, v in got.items() if k != 0) * 3
    leaf_ranks = [v for k, v in got.items() if k != 0]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12  # symmetry


def test_directed_chain_accumulates_downstream(spark):
    # 0 -> 1 -> 2: in a directed chain rank grows downstream,
    # and dangling node 2 simply keeps teleport + inflow (mass not
    # renormalized — documented fixed-iteration behavior)
    got = _run(spark, [(0, 1), (1, 2)], directed=True)
    assert got[0] < got[1] < got[2]


def test_triangle_count_known_graphs(spark):
    from cdc_streaming_pipeline_spark.operators.graph import triangle_count

    def run(edge_list):
        e = spark.createDataFrame(edge_list, "src bigint, dst bigint")
        return triangle_count(e).collect()[0]

    # K4: 4 triangles, clustering coefficient exactly 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = run(k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["clustering_coeff"] == 1.0

    # star: hub + 5 leaves — wedges galore, zero triangles
    r = run([(0, i) for i in range(1, 6)])
    assert r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0

    # triangle + pendant edge; duplicate/reversed/self edges must not
    # inflate the canonical edge set
    r = run([(1, 2), (2, 1), (2, 3), (1, 3), (3, 4), (4, 4), (1, 2)])
    assert (r["n_edges"], r["n_triangles"]) == (4, 1)
    # cc = 3*1 / (C(2,2 deg... ) wedges: degs 2,2,3,1 -> 1+1+3+0 = 5
    assert r["clustering_coeff"] == 0.6


def _py_kcore(edge_list, k):
    """Ground-truth peeling: unique maximal subgraph with min degree k."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(ns) for n, ns in adj.items() if ns}


def test_kcore_matches_python_peeling(spark):
    from cdc_streaming_pipeline_spark.operators.graph import kcore

    rng = np.random.default_rng(11)
    edge_list = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 40, 200), rng.integers(0, 40, 200))
        if a != b
    ]
    for k in (2, 3, 4, 5):
        want = _py_kcore(edge_list, k)
        edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
        got = {r["node"]: r["core_degree"] for r in kcore(edges, k).collect()}
        assert got == want, k


def test_kcore_known_structures(spark):
    from cdc_streaming_pipeline_spark.operators.graph import kcore

    # K5 with a pendant path: 4-core = exactly the K5, path peels away
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k5 + path, "src bigint, dst bigint")
    got = {r["node"]: r["core_degree"] for r in kcore(edges, 4).collect()}
    assert got == {n: 4 for n in range(5)}
    # 5-core of K5 is empty (max degree is 4)
    assert kcore(edges, 5).count() == 0
    # duplicate + reversed edges must not inflate degrees
    noisy = spark.createDataFrame(
        k5 + [(b, a) for a, b in k5] + k5, "src bigint, dst bigint"
    )
    got = {r["node"]: r["core_degree"] for r in kcore(noisy, 4).collect()}
    assert got == {n: 4 for n in range(5)}


def _py_bfs(edge_list, sources):
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        n = q.popleft()
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def test_bfs_matches_python(spark):
    from cdc_streaming_pipeline_spark.operators.graph import bfs_hops

    rng = np.random.default_rng(23)
    edge_list = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 60, 120), rng.integers(0, 60, 120))
        if a != b
    ]
    for srcs in ([0], [0, 41], [7]):
        want = _py_bfs(edge_list, srcs)
        edges = spark.createDataFrame(edge_list, "src bigint, dst bigint")
        sdf = spark.createDataFrame([(s,) for s in srcs], "node bigint")
        got = {r["node"]: r["hop"] for r in bfs_hops(edges, sdf).collect()}
        assert got == want, srcs


def test_bfs_structures(spark):
    from cdc_streaming_pipeline_spark.operators.graph import bfs_hops

    # path 0-1-2-3 plus a disconnected island 10-11
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    sdf = spark.createDataFrame([(0,)], "node bigint")
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, sdf).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # island absent, not null
    # directed: 3 is reachable from 0 but 0 not from 3
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(
            edges,
            spark.createDataFrame([(3,)], "node bigint"),
            directed=True,
        ).collect()
    }
    assert got == {3: 0}


def _py_dijkstra(wedges, sources):
    import heapq
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b, w in wedges:
        if a != b:
            adj[a].append((b, w))
            adj[b].append((a, w))
    # parallel edges: keep the lightest, matching the operator
    best = {}
    for n, nbrs in adj.items():
        m = {}
        for v, w in nbrs:
            if v not in m or w < m[v]:
                m[v] = w
        best[n] = list(m.items())
    dist = {s: 0.0 for s in sources}
    heap = [(0.0, s) for s in sources]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in best.get(u, ()):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_sssp_matches_dijkstra(spark):
    from cdc_streaming_pipeline_spark.operators.graph import sssp

    rng = np.random.default_rng(31)
    wedges = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, 50, 150),
            rng.integers(0, 50, 150),
            rng.integers(1, 20, 150),
        )
        if a != b
    ]
    for srcs in ([0], [0, 17]):
        want = _py_dijkstra(wedges, srcs)
        edges = spark.createDataFrame(wedges, "src bigint, dst bigint, weight double")
        sdf = spark.createDataFrame([(s,) for s in srcs], "node bigint")
        got = {r["node"]: r["dist"] for r in sssp(edges, sdf).collect()}
        assert got == want, srcs


def test_sssp_structures(spark):
    from cdc_streaming_pipeline_spark.operators.graph import sssp

    # weighted path where the 2-hop route beats the direct edge,
    # plus parallel edges (lightest must win) and an island
    edges = spark.createDataFrame(
        [
            (0, 1, 1.0),
            (1, 2, 1.0),
            (0, 2, 5.0),
            (0, 2, 2.5),  # parallel: lighter than 5.0, heavier than 1+1
            (7, 8, 1.0),
        ],
        "src bigint, dst bigint, weight double",
    )
    sdf = spark.createDataFrame([(0,)], "node bigint")
    got = {r["node"]: r["dist"] for r in sssp(edges, sdf).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_truncate_lineage_guard_fast_path(spark):
    """The r9 flagship primitive (_truncate_lineage) reaches through
    private handles (_jdf/_jsparkSession) — load-bearing in cc, kcore,
    bfs, sssp and cluster.py. This is the NAMED failure for any Spark
    upgrade that breaks those internals: the fast path must exist, keep
    the plan CONSTANT-SIZE across rounds (the exponential-composition
    bug it fixes), and return byte-equal rows with the same schema."""
    from cdc_streaming_pipeline_spark.operators.graph import (
        _classic_handles,
        _truncate_lineage,
    )

    base = spark.range(50).withColumn("v", (F.col("id") % 7).cast("long"))
    assert _classic_handles(base) is not None  # classic py4j access intact
    cur = base
    plan_lines = []
    for _ in range(3):
        cur = (
            cur.join(base.withColumnRenamed("v", "w"), "id")
            .withColumn("v", F.col("v") + F.col("w"))
            .drop("w")
        )
        cur = _truncate_lineage(cur)
        plan_lines.append(cur._jdf.queryExecution().toString().count("\n"))
    # constant plan size round over round — NOT growing with iterations
    assert len(set(plan_lines)) == 1, plan_lines
    assert [f.name for f in cur.schema.fields] == ["id", "v"]
    assert {r["id"]: r["v"] for r in cur.collect()} == {
        i: 4 * (i % 7) for i in range(50)
    }


def test_truncate_lineage_fallback_parity(spark, monkeypatch):
    """Environments without classic py4j handles (Spark Connect) fall
    back to Dataset.localCheckpoint: same rows, same schema — the
    documented trade is plan growth beyond ~12 rounds, never
    correctness."""
    import cdc_streaming_pipeline_spark.operators.graph as graph_mod

    monkeypatch.setattr(graph_mod, "_classic_handles", lambda df: None)
    base = spark.range(30).withColumn("v", (F.col("id") % 5).cast("long"))
    cur = base
    for _ in range(3):
        cur = (
            cur.join(base.withColumnRenamed("v", "w"), "id")
            .withColumn("v", F.col("v") + F.col("w"))
            .drop("w")
        )
        cur = graph_mod._truncate_lineage(cur)
    assert {r["id"]: r["v"] for r in cur.collect()} == {
        i: 4 * (i % 5) for i in range(30)
    }


def test_label_propagation_structures(spark):
    """Synchronous LPA (min-label tie-break, self-vote via self-loops):
    two cliques joined by one bridge edge resolve to two communities
    labeled by each clique's min node id; a star collapses to one
    community; results are deterministic across runs."""
    from cdc_streaming_pipeline_spark.operators.graph import label_propagation

    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(clique1 + clique2 + bridge, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=5).collect()}
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}

    star = spark.createDataFrame([(0, i) for i in range(1, 8)], "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(star, iters=5).collect()}
    assert set(got.values()) == {0}

    # determinism: a second run returns the identical assignment
    again = {r["node"]: r["label"] for r in label_propagation(star, iters=5).collect()}
    assert got == again


def test_label_propagation_string_ids(spark):
    """String node ids are first-class (r10 ADVICE: the old -label
    tie-break silently required numeric ids): same two-clique topology
    with lexicographic min-label winners, exactly mirroring the numeric
    variant's communities."""
    from cdc_streaming_pipeline_spark.operators.graph import label_propagation

    c1 = ["apple", "berry", "cherry", "damson"]
    c2 = ["walnut", "xigua", "yam", "zucchini"]
    edges = spark.createDataFrame(
        [(a, b) for a in c1 for b in c1 if a < b]
        + [(a, b) for a in c2 for b in c2 if a < b]
        + [("damson", "walnut")],
        "src string, dst string",
    )
    got = {r["node"]: r["label"] for r in label_propagation(edges, iters=5).collect()}
    assert {got[n] for n in c1} == {"apple"}
    assert {got[n] for n in c2} == {"walnut"}
