"""Iterative graph algorithms over edge DataFrames.

PageRank joins the pointer-jumping connected components
(operators/cluster.py:connected_components) as the second iterative
graph op: fixed-iteration power method, expressed as per-round
(join + groupBy) pairs that shuffle on the node id — the standard
Pregel-on-DataFrames shape. Nothing is collected; rank state stays a
DataFrame keyed by node, so the plan scales with the edge count per
round and the iteration count is the only serial dimension.

Lineage control: every few rounds the rank frame is localCheckpointed
(same policy as connected_components and the BPE merge loop) — without
it the plan tree doubles per iteration and the driver, not the data,
becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and return it with a CONSTANT-SIZE plan — the
    per-round state-truncation primitive for long iterative loops.

    ``Dataset.localCheckpoint(eager=True)`` is NOT that primitive on
    Spark 4.1.2: chained checkpoints retain references to their origin
    plans, and a loop whose round-k state references two round-(k-1)
    checkpoints (dist + frontier in sssp) composes them exponentially —
    measured on a 1M-edge sssp run: rounds 2-17 ≈ 1s, then 5s, 12s,
    30s, 85s, 226s (×~2.8 per round, 451s total), while count()/
    collect() on the same frames stayed ~1s (the computation is cheap;
    the checkpoint call is what explodes) and unrelated probe queries
    stayed fast (session healthy). Unpersisting stale checkpoints does
    not help. See .benchmarks/SCALE10_r9.md.

    The fix: checkpoint the JVM ``RDD[Row]`` instead and rebuild the
    DataFrame over it — ``createDataFrame(rdd, schema)`` yields a plain
    LogicalRDD with no origin-plan baggage, so every round's plan is
    three nodes regardless of round number. Same 1M-edge run: every
    round ~1.0s, 29.5s total (15×). Rows stay JVM-side (RDD[Row] —
    InternalRow conversion, no Python); the ``_jdf`` hop is the
    documented cost of working around the Dataset-layer behavior.

    The ``_jdf``/``_jsparkSession`` hop is PRIVATE API — absent under
    Spark Connect and unguaranteed across Spark versions. Because four
    iterative operators (cc, kcore, bfs, sssp) plus cluster.py are
    load-bearing on this primitive, the access is capability-checked:
    an environment without classic py4j handles falls back to
    ``Dataset.localCheckpoint(eager=True)`` — correct, with the
    documented plan-composition cost beyond ~12 rounds (the fallback
    trades the r9 wall-clock fix for portability, never correctness).
    tests/test_graph_pagerank.py pins both paths: constant plan size on
    the fast path, and result parity + bounded-round usability on the
    fallback."""
    handles = _classic_handles(df)
    if handles is None:  # Spark Connect / future-version guard
        # count-free branch (r16 ADVICE): on the fallback path an eager
        # localCheckpoint already materializes — callers that discard
        # the count must not pay a second count() job per round here.
        return df.localCheckpoint(eager=True)
    return _truncate_lineage_count(df)[0]


def _truncate_lineage_count(df: DataFrame) -> tuple[DataFrame, int]:
    """``_truncate_lineage`` that also RETURNS the row count its
    materialization already computed. The frontier loops below
    (bfs/sssp/kcore) all follow truncate-then-test-empty; as two calls
    that is two jobs per round — the count job inside the checkpoint and
    an ``isEmpty``/``count`` action over the materialized frame — and on
    round-bounded loops the second job's fixed scheduling latency is
    pure serial overhead (guide §1.2: remove work you throw away).
    One call, one job, same number."""
    spark = df.sparkSession
    handles = _classic_handles(df)
    if handles is None:  # Spark Connect / future-version guard
        out = df.localCheckpoint(eager=True)
        return out, out.count()
    jdf, jspark = handles
    jrdd = jdf.rdd()
    jrdd.localCheckpoint()
    cnt = jrdd.count()
    return DataFrame(jspark.createDataFrame(jrdd, jdf.schema()), spark), cnt


def _classic_handles(df: DataFrame):
    """(jdf, jsparkSession) when classic py4j access exists, else None —
    the ONE place the private-API reach-through lives, so environments
    without it (Spark Connect) degrade in one tested branch instead of
    failing in four operators."""
    try:
        return df._jdf, df.sparkSession._jsparkSession
    except AttributeError:
        return None


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    directed: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns DataFrame[node, rank] with
    ranks summing to ~1 (teleport mass keeps isolated/dangling-free
    graphs exact; with ``directed=False`` every edge is mirrored, so no
    node dangles by construction — the right model for co-occurrence
    graphs like supplier↔part).

    Per round: ranks ⋈ degree-widened edges (key: src) → groupBy dst —
    TWO hash shuffles on node ids for the undirected case, no sort, no
    window; the out-degree frame is joined onto the edges once. Only
    ``directed=True`` pays a third per-round shuffle (a left join
    against the node set) because a directed node can lack inbound
    edges and must keep exactly the teleport mass; in the mirrored
    undirected frame every node has inbound by construction, so that
    join is provably a no-op and is skipped (measured 2x wall on the
    supplier-part graph)."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    # the edge list, node set and out-degrees are re-read EVERY round —
    # without persisting them each iteration would redo the distinct and
    # degree shuffles from the source (measured 2.4x wall on the
    # supplier-part graph).
    e = e.distinct().persist()
    # out-degrees are a per-round constant: join them onto the edges
    # ONCE instead of onto the rank frame every round (one join per
    # round saved; the widened edge frame is +8 bytes/edge).
    deg = e.groupBy(F.col("_s").alias("node")).agg(F.count("*").alias("_deg"))
    if directed:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()  # scalar driver value: the graph's node count
    else:
        # undirected: the mirrored+distinct edge frame contains every
        # node as a SOURCE, so the degree aggregate already IS the node
        # set — the separate union+distinct pass (a second full shuffle
        # of the edge frame, guide §2.4 "remove shuffles outright") is
        # only needed when directed nodes can lack out-edges. The
        # node-sized deg frame is persisted; it seeds the rank frame
        # AND the widened-edge join below.
        deg = deg.persist()
        nodes = deg.select("node")
        n = deg.count()
    e_deg = e.join(deg.withColumnRenamed("node", "_s"), "_s").persist()
    # Probed and rejected (r17): a keyed repartition of the rank frame
    # after each round, sized from the edge count, to spread the next
    # round's edge-sized join work (AQE coalesces the node-sized rank
    # exchange to ONE partition at sf0.1 — ten 0.2 s single-task round
    # stages). The fan-out halved the round-stage walls but the extra
    # per-round exchange + stage added more scheduling than it saved
    # (interleaved A/B: 3.8-4.8 s → 3.8-5.4 s warm). At real scale the
    # rank exchange is byte-wide on its own, so the single-partition
    # round is a small-data artifact, not a scale hazard.
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n

    try:
        for i in range(iters):
            contrib = (
                e_deg.join(ranks.withColumnRenamed("node", "_s"), "_s")
                .groupBy(F.col("_d").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
            )
            if directed:
                # a directed node can lack inbound edges: keep exactly
                # the teleport mass via the left join against the node
                # set — the third shuffle of the round.
                ranks = nodes.join(contrib, "node", "left").select(
                    "node",
                    (
                        F.lit(teleport) + damping * F.coalesce("_in", F.lit(0.0))
                    ).alias("rank"),
                )
            else:
                # undirected: every node in the mirrored+distinct edge
                # frame has >= 1 inbound edge by construction, so the
                # contribution aggregate already covers the full node
                # set — the nodes left-join would be a provably-no-op
                # third shuffle per round (measured ~25% of round wall).
                ranks = contrib.select(
                    "node",
                    (F.lit(teleport) + damping * F.col("_in")).alias("rank"),
                )
            if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iters:
                ranks = ranks.localCheckpoint(eager=False)
        # materialize the fixpoint so the inputs can be released
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        e.unpersist()
        (nodes if directed else deg).unpersist()
        e_deg.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected edge list, with the DEGREE-ORDERED ORIENTATION that makes
    distributed triangle counting tractable: direct every edge from its
    lower-(degree, id) endpoint to the higher one. The orientation is a
    total order, so each triangle has exactly one apex (the least node)
    and is found exactly once as wedge (a→b, a→c), b≺c, closed by edge
    b→c — and out-degrees are bounded by O(√m), so the wedge explosion
    is Σ C(outdeg, 2) ≤ O(m^1.5) instead of the Σ C(deg, 2) a naive
    apex choice pays on hub nodes (the power-law killer).

    Plan: canonical-edge distinct → degree aggregate → orientation join
    → wedge self-join on the apex → left-semi close against the
    oriented edges. All hash shuffles on node ids; no windows, no
    collect. Returns one row: n_nodes, n_edges, n_triangles,
    clustering_coeff (3·triangles / wedges of the UNDIRECTED graph,
    rounded 4)."""
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("_u"), F.greatest(a, b).alias("_v"))
        .distinct()
    )
    both = canon.unionByName(
        canon.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    )
    deg = both.groupBy(F.col("_u").alias("node")).agg(F.count("*").alias("_deg"))
    # orientation: keep (u,v) iff (deg_u, u) < (deg_v, v)
    du = deg.select(F.col("node").alias("_u"), F.col("_deg").alias("_du"))
    dv = deg.select(F.col("node").alias("_v"), F.col("_deg").alias("_dv"))
    oriented = (
        both.join(du, "_u")
        .join(dv, "_v")
        .filter(
            (F.col("_du") < F.col("_dv"))
            | ((F.col("_du") == F.col("_dv")) & (F.col("_u") < F.col("_v")))
        )
        .select("_u", "_v", "_du", "_dv")
    )
    e1 = oriented.select(F.col("_u").alias("_a"), F.col("_v").alias("_b"),
                         F.col("_dv").alias("_db"))
    e2 = oriented.select(F.col("_u").alias("_a"), F.col("_v").alias("_c"),
                         F.col("_dv").alias("_dc"))
    # wedge (a→b, a→c) with b ≺ c in the SAME orientation order
    wedges = e1.join(e2, "_a").filter(
        (F.col("_db") < F.col("_dc"))
        | ((F.col("_db") == F.col("_dc")) & (F.col("_b") < F.col("_c")))
    )
    closing = oriented.select(F.col("_u").alias("_b"), F.col("_v").alias("_c"))
    tri = wedges.join(closing, ["_b", "_c"], "left_semi").count()
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("_deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("_deg") * (F.col("_deg") - 1) / 2).cast("long").alias("_wedges"),
    ).collect()[0]
    spark = edges.sparkSession
    # F.round (HALF_UP), not Python round() (banker's) — the documented
    # cross-engine rounding landmine
    return spark.createDataFrame(
        [(stats["n_nodes"], stats["n_edges"], tri, stats["_wedges"])],
        "n_nodes long, n_edges long, n_triangles long, _wedges long",
    ).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.when(F.col("_wedges") > 0, F.round(3.0 * F.col("n_triangles") / F.col("_wedges"), 4))
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 100,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree >= k — the standard peeling fixpoint (remove
    all nodes of degree < k, recompute, repeat until stable). Exact
    integer computation, deterministic regardless of execution order
    (the k-core is unique). Returns DataFrame[node, core_degree] for
    the surviving nodes, core_degree = degree INSIDE the core.

    Distributed shape: each round is one degree aggregate + two
    semi-joins on the node id — no windows, nothing collected except a
    one-long survivor count per round (the loop's driver-side fixpoint
    check, the same bounded pattern as pagerank's node count). Rounds
    needed = peeling depth, typically tens even on 10^9-edge graphs
    (each round strips a full shell, and edge/node frames SHRINK
    monotonically, so per-round cost decays); ``max_iters`` caps the
    worst case (a path graph peels O(n) rounds) and raises rather than
    returning a non-fixpoint subgraph. Lineage is cut with a
    localCheckpoint every few rounds (the pagerank/CC policy — without
    it the plan tree doubles per round)."""
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("_u"), F.greatest(a, b).alias("_v"))
        .distinct()
    )
    cur = _truncate_lineage(canon)
    n_prev = None
    for it in range(max_iters):
        both = cur.unionByName(
            cur.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
        deg = both.groupBy(F.col("_u").alias("node")).agg(
            F.count("*").alias("_deg")
        )
        keep = deg.filter(F.col("_deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "_u"), "_u", "left_semi")
            .join(keep.withColumnRenamed("node", "_v"), "_v", "left_semi")
        )
        # kcore's per-round state is EDGE-sized (unlike bfs/sssp's
        # node-sized frames), so the Row-conversion cost of
        # _truncate_lineage dominates on big graphs (measured +47% at
        # 10M edges) while typical peeling depth is < 10 rounds — well
        # under the Dataset-checkpoint chain's explosion point (~12+,
        # see _truncate_lineage). Hybrid: cheap Dataset checkpoints
        # while the origin chain is shallow, hard truncation beyond
        # (a truncated frame is a plain LogicalRDD, so the chain depth
        # RESETS there — deep peels stay safe).
        if it < 8:
            nxt = nxt.localCheckpoint(eager=True)
            n = nxt.count()
        else:
            # fused truncate+count: one job per round, not two
            nxt, n = _truncate_lineage_count(nxt)
        if n_prev is not None and n == n_prev:
            cur = nxt
            break
        cur, n_prev = nxt, n
        if n == 0:
            break
    else:
        raise RuntimeError(f"k-core did not reach fixpoint in {max_iters} rounds")
    both = cur.unionByName(
        cur.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    )
    return both.groupBy(F.col("_u").alias("node")).agg(
        F.count("*").alias("core_degree")
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 50,
    directed: bool = False,
) -> DataFrame:
    """Minimum hop distance from a source node set — level-synchronous
    BFS, the third Pregel-on-DataFrames op (pagerank: influence, kcore:
    density, bfs: reachability). Returns DataFrame[node, hop] for every
    node REACHABLE from ``sources`` (hop 0 = the sources themselves);
    unreachable nodes are absent, callers left-join if they want nulls.

    Per level: frontier ⋈ edges (hash shuffle on the node id) →
    distinct neighbors → anti-join against the visited set → new
    frontier. The visited frame grows monotonically and the frontier is
    what shuffles, so per-level cost tracks the frontier's edge
    boundary, not the whole graph; levels needed = graph diameter
    (small-world graphs: ~O(log n) levels). Only a one-long frontier
    count is collected per level (the loop's termination check — the
    same bounded pattern as kcore/pagerank). Frontier and visited are
    localCheckpointed every level: both are join products of the prior
    level, and without the cut the plan tree doubles per level.
    """
    e = edges.filter(F.col(src) != F.col(dst)).select(
        F.col(src).alias("_u"), F.col(dst).alias("_v")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
    e = e.distinct().persist()
    frontier = _truncate_lineage(
        sources.select(F.col(sources.columns[0]).alias("node")).distinct()
    )
    visited = _truncate_lineage(frontier.withColumn("hop", F.lit(0)))
    for hop in range(1, max_hops + 1):
        nbrs = (
            frontier.join(e, frontier["node"] == e["_u"])
            .select(F.col("_v").alias("node"))
            .distinct()
        )
        # fused truncate+count: the materializing job already counts the
        # frontier, so the separate isEmpty action (one extra job's fixed
        # scheduling latency per LEVEL — the loop's serial dimension) goes
        new, n_new = _truncate_lineage_count(nbrs.join(visited, "node", "left_anti"))
        if n_new == 0:
            break
        # The visited frame is referenced ONCE per level (this anti-join)
        # plus the final return, so its plan grows LINEARLY — one union of
        # an already-truncated LogicalRDD per level. Materializing it
        # every level (r16 shape) paid a second job on the loop's serial
        # dimension for nothing; truncate on the checkpoint cadence
        # instead (guide §1.2: one job per level, not two).
        visited = visited.unionByName(new.withColumn("hop", F.lit(hop)))
        if hop % _CHECKPOINT_EVERY == 0:
            visited = _truncate_lineage(visited)
        frontier = new
    else:
        raise RuntimeError(f"bfs did not exhaust the graph in {max_hops} levels")
    e.unpersist()
    return visited


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_iters: int = 100,
    directed: bool = False,
) -> DataFrame:
    """Weighted single-source(-set) shortest paths — frontier-based
    Bellmann-Ford relaxation, the fifth Pregel-on-DataFrames op
    (pagerank: influence, triangles: closure, kcore: density, bfs:
    reachability, sssp: weighted proximity). Non-negative weights.
    Returns DataFrame[node, dist] for reachable nodes (sources at 0.0).

    Per round only the FRONTIER (nodes improved last round) relaxes:
    frontier ⋈ edges → min per neighbor → join against current dists →
    keep strict improvements. Rounds needed = max hop count of any
    shortest path (≤ graph diameter on uniform weights); every round is
    two hash shuffles on node ids plus the improvement join, frames
    localCheckpointed per round (the module's standing lineage policy),
    and only a one-long improved-count is collected per round.

    Determinism: a path's distance accumulates left-to-right from the
    source, so every candidate distance is a bit-exact IEEE value
    identical across engines and execution orders; min over identical
    value sets is order-free — which is what lets a sequential Dijkstra
    oracle certify this operator exactly (tools/py_oracles.py).
    """
    e = edges.filter(F.col(src) != F.col(dst)).select(
        F.col(src).alias("_u"), F.col(dst).alias("_v"), F.col(weight).alias("_w")
    )
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("_v").alias("_u"), F.col("_u").alias("_v"), F.col("_w")
            )
        )
    # parallel edges: only the lightest can ever matter
    e = (
        e.groupBy("_u", "_v")
        .agg(F.min("_w").alias("_w"))
        .persist()
    )
    dist = _truncate_lineage(
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0.0))
    )
    frontier = dist
    for it in range(max_iters):
        cand = (
            frontier.join(e, frontier["node"] == e["_u"])
            .groupBy(F.col("_v").alias("node"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_cand"))
        )
        joined = cand.join(dist, "node", "left")
        improved = joined.filter(
            F.col("dist").isNull() | (F.col("_cand") < F.col("dist"))
        ).select("node", F.col("_cand").alias("dist"))
        # fused truncate+count — one job per round instead of two
        improved, n_improved = _truncate_lineage_count(improved)
        if n_improved == 0:
            break
        dist = dist.join(
            improved.select(F.col("node").alias("_n")),
            dist["node"] == F.col("_n"),
            "left_anti",
        ).unionByName(improved)
        # dist is referenced TWICE per round (improvement test + update),
        # so a lazy chain doubles per round — but over a 2-round window
        # that is a bounded 4 references to small node-sized truncated
        # frames, far cheaper than the per-round materialization job the
        # r16 shape paid on the loop's serial dimension (guide §1.2).
        # The cadence stays well below the Dataset-chain explosion point
        # because every truncation resets the plan to a LogicalRDD.
        if (it + 1) % 2 == 0:
            dist = _truncate_lineage(dist)
        frontier = improved
    else:
        raise RuntimeError(f"sssp did not converge in {max_iters} rounds")
    e.unpersist()
    return dist


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    directed: bool = False,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection as fixed-round message passing: every node starts labeled
    with its own id; each round it adopts the most frequent label among
    its neighbors PLUS its own current label (the self-vote damps the
    bipartite two-coloring oscillation synchronous LPA is known for),
    ties broken by the SMALLEST label. Fixed ``iters`` + min-label
    tie-break make the result fully deterministic — no floats anywhere,
    so the whole algorithm is exactly replayable by a pure-Python
    oracle (tools/py_oracles.py:supplier_part_communities).

    Per round: one hash join (labels onto edge sources) and two hash
    aggregations (vote counts, per-node argmax) — all shuffles on node
    ids, the Pregel-on-DataFrames shape shared with pagerank/bfs/sssp;
    lineage is RDD-truncated every ``_CHECKPOINT_EVERY`` rounds
    (``_truncate_lineage``). The self-vote is encoded as explicit
    SELF-LOOP edges added once, NOT as a per-round ``votes ∪ labels``:
    the union form references the round-state frame TWICE, so the
    logical plan DOUBLES per round — the same exponential plan
    composition the r9 sssp fix targeted, measured here at 29s/245s for
    5/8 rounds on a 7.5k-edge graph vs ~3s/linear with the self-loop
    form. Returns DataFrame[node, label]."""
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.unionByName(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    # persist the mirrored+distinct base: the node set, the self-loop
    # rows AND the looped edge frame all derive from it — left as
    # lineage each derivation re-ran the source scan and the distinct
    # shuffle (profiled at sf0.1: the fact scan appeared 5x per call,
    # ~1.6 s of the query's 3.7 s)
    e = e.distinct().persist()
    if directed:
        nodes = (
            e.select(F.col("_s").alias("node"))
            .unionByName(e.select(F.col("_d").alias("node")))
            .distinct()
        )
    else:
        # undirected: the mirrored+distinct frame contains every node as
        # a SOURCE, so the union+distinct pass — a second full shuffle of
        # the edge frame — is pure waste (the pagerank r16 argument)
        nodes = e.select(F.col("_s").alias("node")).distinct()
    # self-loops carry the self-vote through the SAME join as neighbor
    # votes — one reference to `labels` per round, linear plan growth.
    # The looped frame is persisted too (it feeds every round); it reads
    # the cached base, so the second copy costs no recompute and the
    # extra storage is one edge frame (+n loop rows).
    e_loops = e.unionByName(
        nodes.select(F.col("node").alias("_s"), F.col("node").alias("_d"))
    ).persist()
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(iters):
        votes = e_loops.join(labels.withColumnRenamed("node", "_s"), "_s").select(
            F.col("_d").alias("node"), "label"
        )
        counts = votes.groupBy("node", "label").agg(F.count("*").alias("_c"))
        # (max count, min label) in ONE aggregation: MIN over the struct
        # (-count, label) — negating the COUNT (always numeric) instead
        # of the label keeps the tie-break type-agnostic, so string node
        # ids work exactly like numeric ones (r10 ADVICE: -label was a
        # silent numeric-only constraint). A join-back two-step would
        # reference `counts` (hence round state) twice per round — the
        # exponential plan-growth class this function's self-loop form
        # exists to avoid.
        best = counts.groupBy("node").agg(
            F.min(
                F.struct((-F.col("_c")).alias("nc"), F.col("label").alias("l"))
            ).alias("_m")
        )
        labels = best.select("node", F.col("_m.l").alias("label"))
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iters:
            labels = _truncate_lineage(labels)
    # the returned plan is lazy: materialize before dropping the caches
    # it reads (the pagerank fixpoint rule)
    labels = labels.localCheckpoint(eager=True)
    e.unpersist()
    e_loops.unpersist()
    return labels
