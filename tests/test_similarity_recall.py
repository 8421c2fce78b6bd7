"""Approximate-operator quality gates: LSH ANN recall vs the exact
baseline, MinHash-vs-exact-Jaccard containment, SimHash sanity, and
determinism of the seeded hash families (makes plans/docs.py's verification
claims true)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators import dedup as dd
from cdc_streaming_pipeline_spark.operators import similarity as sim
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR

# measured 0.94 (sf0.001) / 1.00 (sf0.01) with n_bits=4, n_tables=24 on the
# near-orthogonal driver embeddings (top-5 neighbors at cosine 0.26-0.49)
ANN_RECALL_FLOOR = 0.85


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.lsh_ann_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= ANN_RECALL_FLOOR, f"recall@5 {recall:.2f} < {ANN_RECALL_FLOOR}"


def test_minhash_pairs_contain_high_jaccard_truth(spark):
    docs = _docs(spark)
    # ground truth: exact n-gram Jaccard >= 0.7 (well above the 0.5 LSH target,
    # so banding (4 bands x 4 rows) catches them with overwhelming probability)
    truth = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs, jaccard_threshold=0.7).collect()
    }
    found = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    assert truth, "fixture should contain high-similarity pairs"
    missed = truth - found
    assert not missed, f"MinHash+LSH missed high-Jaccard pairs: {missed}"


def test_minhash_signature_is_deterministic_and_seed_keyed(spark):
    docs = _docs(spark).limit(50)
    sig = dd.minhash_signature(dd.word_shingles(F.col("text")), num_hashes=8)
    a = [r.s for r in docs.select(sig.alias("s")).collect()]
    b = [r.s for r in docs.select(sig.alias("s")).collect()]
    assert a == b
    # different seeds must give different component hashes (seed-keyed family)
    assert all(len(set(s)) > 1 for s in a if len(s) > 1)


def test_simhash_identical_docs_have_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "an entirely different document about spark streaming")],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in dd.simhash_near_dup_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ivf_recall_vs_bruteforce(spark):
    from cdc_streaming_pipeline_spark.operators import cluster as cl

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cl.ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.84 on the near-orthogonal driver embeddings with 8/16
    # cells probed (~half the corpus scanned); floor leaves noise margin
    assert recall >= 0.7, f"IVF recall@5 {recall:.2f}"


def test_connected_components_match_union_find(spark):
    """Spark min-label propagation == driver-side union-find ground truth."""
    from cdc_streaming_pipeline_spark.operators import cluster as cl

    emb = _emb(spark)
    pairs = sim.cosine_near_dup_exact(emb, threshold=0.4)
    edge_list = [(r.id_a, r.id_b) for r in pairs.collect()]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {
        r.vec_id: find(r.vec_id) if r.vec_id in parent else r.vec_id
        for r in emb.select("vec_id").collect()
    }
    got = {
        r.vec_id: r.cluster_id
        for r in cl.connected_components(pairs, emb, id_col="vec_id").collect()
    }
    assert got == truth


def test_embedding_near_dup_lsh_matches_exact(spark):
    emb = _emb(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_exact(emb, threshold=0.4).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_lsh(emb, threshold=0.4).collect()
    }
    assert approx <= exact  # no false positives (exact verify step)
    recall = len(exact & approx) / max(len(exact), 1)
    assert recall >= 0.8, f"near-dup LSH recall {recall:.2f}"


def test_connected_components_no_edges_all_singletons(spark):
    from cdc_streaming_pipeline_spark.operators import cluster as cl

    emb = _emb(spark).limit(20)
    empty_edges = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.vec_id: r.cluster_id for r in cl.connected_components(empty_edges, emb).collect()}
    assert got == {r.vec_id: r.vec_id for r in emb.select("vec_id").collect()}


def test_pack_sequences_respects_capacity_and_oversize(spark):
    from cdc_streaming_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 100), (2, 700), (3, 300), (4, 250), (5, 10)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r.pack_id for r in pack_sequences(df, capacity=512).collect()}
    # doc2 is oversize (clamped to 512): starts at offset 100 -> bin 0 full;
    # doc3 starts at 612 -> bin 1; doc4 at 912 -> bin 1; doc5 at 1162 -> bin 2
    assert rows == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_blocked_near_dup_equals_exact_baseline_via_plan_wrappers(spark):
    """The registered exact primary (blocked GEMM) must equal the
    unregistered broadcast baseline row-for-row — the contract that let
    embedding_near_dup_exact give up its driver-gate slot."""
    from cdc_streaming_pipeline_spark.plans.docs import (
        embedding_near_dup_blocked,
        embedding_near_dup_exact,
    )

    sf = "/root/testdata/sf0.001"
    exact = {(r.id_a, r.id_b, r.cosine) for r in embedding_near_dup_exact(spark, sf).collect()}
    blocked = {(r.id_a, r.id_b, r.cosine) for r in embedding_near_dup_blocked(spark, sf).collect()}
    assert exact == blocked


def test_simhash_matches_independent_numpy_oracle(spark):
    """The JVM higher-order-function simhash must be bit-identical to an
    independent numpy reimplementation of the spec (per-bit majority vote
    over xxhash64 token hashes, sign-packed into an int64). Pins the
    arithmetic-vs-logical-shift and bit-63 sign-wrap subtleties."""
    import numpy as np

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "single"),
            (4, "a a a repeated repeated tokens tokens tokens here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in dd.simhash64(df).collect()}

    # independent oracle: fetch the same token hashes (xxhash64 is the one
    # shared primitive), then vote+pack in numpy
    hashed = df.select(
        "doc_id",
        F.transform(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "),
            lambda t: F.xxhash64(t),
        ).alias("h"),
    )
    shifts = np.arange(64, dtype=np.uint64)
    for row in hashed.collect():
        h = np.asarray(row.h, dtype=np.int64).astype(np.uint64)
        bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
        votes = 2 * bits.sum(axis=0).astype(np.int64) - len(h)
        expected = np.int64(
            ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
        )
        assert got[row.doc_id] == expected, row.doc_id


def test_semantic_dedup_precision_one_and_single_cluster_equals_exact(spark):
    """SemDeDup quality gate. (a) Precision is exactly 1: cosines inside a
    cluster are computed exactly, so every dropped id has a TRUE lower-id
    near-dup. (b) With n_clusters=1 the operator degenerates to exact
    semantic dedup — the dropped set must equal the ids that have any
    lower-id partner in the exact all-pairs set. (c) Recall at k=8 is
    data-dependent (cross-cluster pairs are the designed loss); on the
    near-orthogonal driver embeddings it measures ~0.47 — floor at 0.3."""
    from cdc_streaming_pipeline_spark.operators.cluster import semantic_dedup

    emb = _emb(spark)
    n_rows = emb.count()
    exact_pairs = sim.cosine_near_dup_exact(emb, threshold=0.4).collect()
    droppable = {max(p.id_a, p.id_b) for p in exact_pairs}
    assert droppable, "fixture should contain near-dup pairs"

    out = semantic_dedup(emb, n_clusters=8, threshold=0.4).collect()
    assert len(out) == n_rows  # one verdict per input vector
    dropped = {r.vec_id for r in out if not r.kept}
    assert dropped <= droppable  # precision == 1
    assert len(dropped & droppable) / len(droppable) >= 0.3

    single = semantic_dedup(emb, n_clusters=1, threshold=0.4).collect()
    assert {r.vec_id for r in single if not r.kept} == droppable


def test_minhash_clusters_contain_high_jaccard_truth_and_cover_all_docs(spark):
    """Cluster-level containment: every exact-Jaccard >= 0.7 pair must
    share a cluster in minhash_dedup_clusters (transitivity can only
    merge further, never split), every doc appears exactly once, and
    cluster_id == min member id."""
    from cdc_streaming_pipeline_spark.plans.docs import minhash_dedup_clusters
    from tests.conftest import SF_DIR as sf

    docs = _docs(spark)
    n_docs = docs.count()
    assign = {r.doc_id: r.cluster_id for r in minhash_dedup_clusters(spark, sf).collect()}
    assert len(assign) == n_docs
    truth = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs, jaccard_threshold=0.7).collect()
    }
    assert truth
    for a, b in truth:
        assert assign[a] == assign[b], (a, b)
    by_cluster: dict[int, list[int]] = {}
    for d, c in assign.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_coverage_sample_spans_all_cells_and_picks_argmax_centrality(spark):
    """coverage_sample invariants vs a numpy replay of the same seeded
    fit: every non-empty cell is represented, each cell contributes its
    top-per_cell rows by (cosine-to-centroid DESC, id ASC) exactly, and
    n_in_cell matches the true assignment counts."""
    import numpy as np

    from cdc_streaming_pipeline_spark.operators.cluster import (
        _collect_matrix,
        _normalize,
        coverage_sample,
        kmeans_fit,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    got = coverage_sample(emb, n_clusters=4, per_cell=3).collect()

    cent = kmeans_fit(emb, k=4)
    ids, mat = _collect_matrix(emb, "vec_id", "embedding")
    mat = _normalize(mat)
    sims = mat @ cent.T
    cells = np.argmax(sims, axis=1)
    centr = np.round(sims[np.arange(len(ids)), cells], 4)

    want = {}
    counts = {}
    for c in np.unique(cells):
        members = np.nonzero(cells == c)[0]
        counts[int(c)] = len(members)
        order = members[np.lexsort((ids[members], -centr[members]))][:3]
        for rank, i in enumerate(order, start=1):
            want[(int(c), rank)] = (int(ids[i]), float(centr[i]))

    assert {r.cell for r in got} == {int(c) for c in np.unique(cells)}
    assert len(got) == len(want)
    for r in got:
        assert want[(r.cell, r.cell_rank)] == (r.vec_id, r.centrality)
        assert r.n_in_cell == counts[r.cell]


def test_embedding_outliers_zscores_match_numpy_replay(spark):
    """embedding_outliers vs a numpy replay of the same seeded fit:
    identical cells, distances, and per-cell z-scores."""
    import numpy as np

    from cdc_streaming_pipeline_spark.operators.cluster import (
        _collect_matrix,
        _normalize,
        embedding_outliers,
        kmeans_fit,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    got = {r.vec_id: (r.cell, r.dist, r.outlier_z)
           for r in embedding_outliers(emb, n_clusters=4).collect()}

    cent = kmeans_fit(emb, k=4)
    ids, mat = _collect_matrix(emb, "vec_id", "embedding")
    mat = _normalize(mat)
    sims = mat @ cent.T
    cells = np.argmax(sims, axis=1)
    dist = np.round(1.0 - sims[np.arange(len(ids)), cells], 6)
    for c in np.unique(cells):
        m = cells == c
        mu, sd = dist[m].mean(), dist[m].std()
        z = np.round((dist[m] - mu) / (sd if sd > 0 else 1.0), 4)
        for vid, d, zz in zip(ids[m], dist[m], z):
            gc, gd, gz = got[int(vid)]
            assert gc == int(c)
            assert abs(gd - d) < 1e-9
            assert abs(gz - zz) < 2e-4  # mean/std rounding in the plan


def test_pq_distortion_shrinks_with_codebook_size_and_adc_recall(spark):
    """PQ sanity: (a) squared reconstruction error strictly improves as
    the per-subspace codebook grows; (b) ADC (asymmetric distance) top-k
    over the CODES recovers most of the exact top-k — the property that
    makes 32x-compressed storage useful for ANN at all."""
    import numpy as np

    from cdc_streaming_pipeline_spark.operators.similarity import pq_assign, pq_fit

    emb = load_table(spark, SF_DIR, "embeddings")

    errs = {}
    coded_rows = {}
    for ks in (2, 16):
        books = pq_fit(emb, m=8, ks=ks)
        coded = pq_assign(emb, books).collect()
        errs[ks] = float(np.mean([r.recon_sq_err for r in coded]))
        coded_rows[ks] = (books, coded)
    assert errs[16] < errs[2] * 0.8  # bigger codebook, materially less error

    books, coded = coded_rows[16]
    ids = np.array([r.vec_id for r in coded])
    codes = np.array([r.codes for r in coded])
    raw = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in emb.collect()}
    mat = np.array([raw[i] for i in ids])
    m, ks_, sub = books.shape
    k = 5
    hits, total = 0, 0
    for qi in range(10):
        q = mat[qi]
        # exact top-k by L2 (excluding self)
        d_exact = ((mat - q) ** 2).sum(1)
        d_exact[qi] = np.inf
        exact = set(ids[np.argsort(d_exact)[:k]])
        # ADC: per-subspace distance tables, summed over code words
        tables = np.stack(
            [((books[j] - q[j * sub : (j + 1) * sub]) ** 2).sum(1) for j in range(m)]
        )  # (m, ks)
        d_adc = tables[np.arange(m)[:, None], codes.T].sum(0)
        d_adc[qi] = np.inf
        approx = set(ids[np.argsort(d_adc)[: 2 * k]])  # probe 2k, standard
        hits += len(exact & approx)
        total += k
    # this corpus is PQ's worst case — near-orthogonal random vectors
    # with no cluster structure for the codebooks to exploit — so the
    # gate is "far above chance" (chance = 2k/n = 2%), not a production
    # recall bar; structured embeddings recall far higher
    assert hits / total >= 0.2, hits / total


def test_pq_topk_operator_recall_vs_bruteforce(spark):
    """The distributed ADC search must reproduce the numpy ADC study's
    behavior: recall vs the exact cosine top-k well above chance on this
    worst-case (near-orthogonal) corpus, and its own ranking must be
    deterministic across runs."""
    from cdc_streaming_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, qs, k=5)
    want = {}
    for r in exact.collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)

    got1 = pq_topk(emb, qs, k=5).collect()
    got2 = pq_topk(emb, qs, k=5).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))  # deterministic

    hits = sum(
        1 for r in got1 if r.neighbor_id in want.get(r.query_id, set())
    )
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.15, hits / total  # chance is ~1%


def test_embedding_cluster_purity_structure_and_determinism(spark):
    """Purity report invariants: cluster sizes partition the corpus,
    purity is bounded below by the uniform share (majority >= mean) and
    above by 1, and the seeded pipeline is run-to-run deterministic.
    (On this corpus's random embeddings purity sits barely above chance
    — which is the op's point: it SAYS when clusters don't track
    labels.)"""
    from cdc_streaming_pipeline_spark.plans.docs import embedding_cluster_purity

    rows1 = sorted(embedding_cluster_purity(spark, SF_DIR).collect())
    rows2 = sorted(embedding_cluster_purity(spark, SF_DIR).collect())
    assert rows1 == rows2

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    n_labels = emb.select("label").distinct().count()
    assert sum(r.n_vectors for r in rows1) == n
    for r in rows1:
        assert 1.0 / n_labels <= r.purity <= 1.0
        assert 0 <= r.majority_label < n_labels


def test_containment_catches_subset_jaccard_misses(spark):
    """The containment detector's reason to exist: a short doc quoted
    wholesale inside a much longer one has containment 1.0 but Jaccard
    far below any useful threshold — jaccard_pairs misses it, the
    containment op reports it with the small/big orientation right."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"filler{i} pad{i} word{i}" for i in range(30))
    rows = [(1, small), (2, f"{filler} {small} {filler}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    jac = dd.ngram_jaccard_pairs(df, jaccard_threshold=0.5).collect()
    assert jac == []  # Jaccard ~ |A|/|B| << 0.5

    got = dd.ngram_containment_pairs(df, containment_threshold=0.9).collect()
    assert len(got) == 1
    (r,) = got
    assert (r.id_small, r.id_big, r.containment) == (1, 2, 1.0)
    assert r.n_shingles_small < r.n_shingles_big


def test_ivf_pq_recall_vs_bruteforce(spark):
    """The composed IVF-PQ path must keep useful recall. With the exact
    re-rank stage (n_rerank), the stacked approximations (cell routing
    + code quantization) only have to surface the true neighbors INTO
    the shortlist — ranking them is exact — so recall on the
    near-orthogonal worst-case corpus jumps from the measured 0.54
    (ADC-only) to 0.84 at n_probe=8 (deterministic: seeded build,
    fixed corpus; the residual misses are cell-routing misses —
    n_probe=16 measures 1.00)."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_pq_topk(
            emb, queries, k=5, n_clusters=16, n_probe=8, m=16, ks=64
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF-PQ recall@5 {recall:.2f}"
    # the ADC-only path (n_rerank=0) keeps its weaker historical floor —
    # it exists for measuring what the refine stage buys
    adc_only = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_pq_topk(
            emb, queries, k=5, n_clusters=16, n_probe=8, m=16, ks=64, n_rerank=0
        ).collect()
    }
    adc_recall = len(exact & adc_only) / len(exact)
    assert adc_recall >= 0.4, f"ADC-only recall@5 {adc_recall:.2f}"


def test_ivf_pq_rank_contract(spark):
    """Shape contract: exactly k neighbors per query, rank 1..k, exact
    cosine non-increasing with rank (re-ranked path), never self; the
    ADC-only path keeps its non-decreasing-distance contract."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 4)
    rows = sim.ivf_pq_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 6))
        assert all(r.neighbor_id != qid for r in rs)
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)
    adc_rows = sim.ivf_pq_topk(emb, queries, k=5, n_rerank=0).collect()
    by_q = {}
    for r in adc_rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 6))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)


def test_ivf_pq_auto_probe_recall_and_selectivity(spark):
    """The r9 verdict's adaptive-probe item: n_probe='auto' probes per
    QUERY — cells whose centroid ADC distance is within probe_alpha of
    the best — so the worst-case (near-orthogonal) corpus, where fixed
    n_probe=8 capped recall at 0.84, degrades toward probing all cells
    and clears a 0.9 floor; while a well-clustered profile keeps the
    probe count near 1-2 (routing stays selective where it has signal).
    Cost measured in .benchmarks/SCALE10_r10.md."""
    import numpy as np

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    auto = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_pq_topk(
            emb, queries, k=5, n_clusters=16, n_probe="auto", m=16, ks=64
        ).collect()
    }
    recall = len(exact & auto) / len(exact)
    assert recall >= 0.9, f"auto-probe IVF-PQ recall@5 {recall:.2f}"

    # policy unit contract: flat centroid profile -> probe (nearly) all;
    # concentrated profile -> probe few
    flat = np.full((1, 16), 0.05)
    flat[0, 0] = 0.06  # all cells nearly equidistant
    assert sim.auto_probe_mask(flat).sum() >= 12
    peaked = np.full((1, 16), 0.05)
    peaked[0, 3] = 0.98  # one obviously right cell
    assert sim.auto_probe_mask(peaked).sum() <= 2


def test_ivf_pq_auto_probe_mixed_batch_is_per_query(spark):
    """r10 verdict #7, the third adversarial profile: ONE call carrying a
    MIXED batch — half the queries sit inside tight clusters (routing
    informative), half are near-orthogonal (routing worthless). The
    policy maps each query's own best-centroid cosine, so the probe
    counts must come out BIMODAL (few cells for clustered queries, most
    cells for diffuse ones — never a batch-global decision), and the
    0.9 recall floor must hold across the whole mixed batch."""
    import numpy as np

    from cdc_streaming_pipeline_spark.operators.cluster import kmeans_fit

    rng = np.random.default_rng(11)
    dim, per = 64, 40
    centers = rng.standard_normal((5, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    clustered = np.repeat(centers, per, axis=0) + 0.05 * rng.standard_normal(
        (5 * per, dim)
    )
    diffuse = rng.standard_normal((200, dim))
    mat = np.vstack([clustered, diffuse])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q_ids = [0, 40, 80, 120, 160, 200, 201, 202, 203, 204]  # 5 clustered + 5 diffuse
    queries = emb.filter(F.col("vec_id").isin(q_ids))

    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=5).collect()
    }
    auto = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_pq_topk(
            emb, queries, k=5, n_clusters=16, n_probe="auto", m=16, ks=64
        ).collect()
    }
    recall = len(exact & auto) / len(exact)
    assert recall >= 0.9, f"mixed-batch auto-probe recall@5 {recall:.2f}"

    # per-query probe counts from the exact statistic the operator uses
    cent = kmeans_fit(emb, k=16)
    q = mat[q_ids]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    counts = sim.auto_probe_mask(qn @ cent.T).sum(axis=1)
    clustered_counts, diffuse_counts = counts[:5], counts[5:]
    # bimodal: every clustered query stays selective, every diffuse one
    # opens up — and the two groups never overlap (per-query, not global)
    assert clustered_counts.max() <= 6, counts.tolist()
    assert diffuse_counts.min() >= 10, counts.tolist()
    assert clustered_counts.max() < diffuse_counts.min(), counts.tolist()
