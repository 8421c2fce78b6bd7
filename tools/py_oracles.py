"""Spark-independent Python oracles for queries no SQL engine can state.

The driver's gate compares against ``oracle_sql()`` (DuckDB); queries
whose kernel has no SQL expression (zlib deflate, iterative BPE) were
rows-only in every artifact. These oracles close that gap for the LOCAL
full-surface record (tools/oracle_check.py): each is an exact
re-implementation of the query contract in pure Python over the parquet
inputs — no Spark, no DuckDB — and runs through the same
rowcount/schema/value compare as the SQL oracles. They certify only
EXACT kernels (byte-identical zlib output, the pinned BPE tie-break and
greedy merge-application semantics); float-summation kernels (PCA,
sketches) stay rows-only because a last-bit difference under rounding
would be a spurious FAIL, not a certification.

Registered in ``PY_ORACLES``: name -> fn(sf_dir) -> pandas.DataFrame
with the query's exact output columns.
"""

from __future__ import annotations

import re
import zlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pyarrow.parquet as pq

END_OF_WORD = "</w>"  # operators/bpe.py pins the Sennrich marker
_WS = re.compile(r"\s+")


def _round4(x: float) -> float:
    """Spark's F.round on DOUBLE = BigDecimal.valueOf(x).setScale(4,
    HALF_UP): shortest decimal repr, then half-UP — NOT Python round()'s
    banker's rounding (3.03125 -> 3.0313 vs 3.0312; hit 6 times on the
    sf0.01 corpus). repr() is Python's shortest roundtrip, matching
    Double.toString."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _docs(sf_dir: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).to_pandas()


def _words(text: str) -> list[str]:
    # word_frequency_table / bpe_token_counts tokenization:
    # split(trim(lower(text)), '\\s+'), drop empties. Java and Python \s
    # agree on the ASCII whitespace this corpus contains.
    return [w for w in _WS.split((text or "").strip().lower()) if w]


def doc_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """operators/text.py:compression_ratio_scores — deflate level 6 over
    the raw utf-8 bytes; zlib output is byte-deterministic for a given
    level, so the counts match the Spark kernel exactly."""
    docs = _docs(sf_dir)
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = (text or "").encode()
        c = len(zlib.compress(b, 6))
        rows.append(
            (int(doc_id), len(b), c, round(c / len(b), 4) if b else 0.0)
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bytes", "n_compressed", "compression_ratio"]
    )


def _word_freq(sf_dir: str) -> Counter:
    freq: Counter = Counter()
    for text in _docs(sf_dir)["text"]:
        freq.update(_words(text))
    return freq


def _initial(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + END_OF_WORD
    return tuple(chars)


def _apply(toks: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    # the pinned single-pass greedy left-to-right merge application
    acc: list[str] = []
    for x in toks:
        if acc and acc[-1] == left and x == right:
            acc[-1] = left + right
        else:
            acc.append(x)
    return tuple(acc)


def _train(word_freq: Counter, n_merges: int, min_pair_freq: int = 2):
    """operators/bpe.py:train_bpe contract: pair-frequency argmax with
    (freq DESC, left ASC, right ASC) tie-break, stop below min_pair_freq."""
    seg = {w: _initial(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, toks in seg.items():
            f = word_freq[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_pair_freq:
            break
        merges.append((rank, left, right, left + right, pf))
        seg = {w: _apply(t, left, right) for w, t in seg.items()}
    return merges, seg


def bpe_vocab_merges(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:bpe_vocab_merges — the 24-round merge table."""
    merges, _ = _train(_word_freq(sf_dir), n_merges=24)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_freq"]
    )


def bpe_token_counts(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:bpe_token_counts — per-doc whitespace vs BPE token
    counts under the learned merge table, applied per distinct word."""
    freq = _word_freq(sf_dir)
    _, seg = _train(freq, n_merges=24)
    n_sub = {w: len(t) for w, t in seg.items()}
    rows = []
    for doc_id, text in zip(_docs(sf_dir)["doc_id"], _docs(sf_dir)["text"]):
        ws = _words(text)
        if not ws:
            continue  # the Spark query inner-joins words, so empty docs drop
        nb = sum(n_sub[w] for w in ws)
        rows.append((int(doc_id), len(ws), nb, _round4(nb / len(ws))))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_ws_tokens", "n_bpe_tokens", "subtokens_per_word"]
    )


def bpe_fertility_by_lang(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:bpe_fertility_by_lang — the bpe_token_counts
    pipeline rolled up per language: subtokens per word under the same
    pinned training + application semantics."""
    freq = _word_freq(sf_dir)
    _, seg = _train(freq, n_merges=24)
    n_sub = {w: len(t) for w, t in seg.items()}
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    ).to_pandas()
    agg: dict[str, list[int]] = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        ws = _words(text)
        if not ws:
            continue
        a = agg.setdefault(lang, [0, 0])
        a[0] += len(ws)
        a[1] += sum(n_sub[w] for w in ws)
    rows = [
        (lang, nws, nb, _round4(nb / nws))
        for lang, (nws, nb) in sorted(agg.items())
    ]
    return pd.DataFrame(
        rows, columns=["lang", "n_ws_tokens", "n_bpe_tokens", "fertility"]
    )


def supplier_part_pagerank(sf_dir: str) -> pd.DataFrame:
    """plans/analytics.py:supplier_part_pagerank — vectorized numpy power
    iteration with the operator's exact semantics (undirected distinct
    edges, damping 0.85, 8 iterations, teleport to every node, absent
    inflow = teleport only).

    Float-summation caveat, and why this one still qualifies: the
    per-node inflow sum has a different addition order in numpy vs
    Spark's partial aggregation, BUT the measured cross-engine
    divergence is ulp-level (max |Δrank| 9.0e-17 at sf0.001, 6.1e-18 at
    sf0.01 — a few hundred well-conditioned positive terms), seven
    orders of magnitude below the query's 1e-10 rounding resolution
    (rank_bp = round(rank·1e4, 6)). The rounded top-20 matched exactly
    at both SFs when registered; tests/test_graph_pagerank.py pins the
    operator's semantics independently."""
    import numpy as np

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    off = 1_000_000_000
    src = li["l_suppkey"].to_numpy(np.int64)
    dst = li["l_partkey"].to_numpy(np.int64) + off
    edges = np.unique(
        np.stack(
            [np.concatenate([src, dst]), np.concatenate([dst, src])], axis=1
        ),
        axis=0,
    )
    nodes, inv = np.unique(edges, return_inverse=True)
    e = inv.reshape(edges.shape)
    n = len(nodes)
    deg = np.bincount(e[:, 0], minlength=n)
    r = np.full(n, 1.0 / n)
    damping = 0.85
    tp = (1.0 - damping) / n
    for _ in range(8):
        contrib = np.zeros(n)
        np.add.at(contrib, e[:, 1], r[e[:, 0]] / deg[e[:, 0]])
        r = tp + damping * contrib

    def _round6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    rows = []
    for nd, rv in zip(nodes, r):
        nt = "part" if nd >= off else "supplier"
        nid = int(nd - off) if nd >= off else int(nd)
        rows.append((nt, nid, _round6(rv * 1e4)))
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    return pd.DataFrame(rows[:20], columns=["node_type", "node_id", "rank_bp"])


def supplier_part_kcore(sf_dir: str) -> pd.DataFrame:
    """plans/analytics.py:supplier_part_kcore — ground-truth 3-core by
    sequential peeling (exact integers; the k-core is unique, so ANY
    peeling order gives the same subgraph)."""
    from collections import defaultdict

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    off = 1_000_000_000
    adj = defaultdict(set)
    for s, p in zip(li["l_suppkey"], li["l_partkey"]):
        a, b = int(s), int(p) + off
        adj[a].add(b)
        adj[b].add(a)
    k = 3
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    core = {n: ns for n, ns in adj.items() if ns}
    assert all(len(ns) >= k for ns in core.values())  # the k-core invariant
    n_sup = sum(1 for n in core if n < off)
    n_part = sum(1 for n in core if n >= off)
    n_edges = sum(len(ns) for ns in core.values()) // 2
    min_deg = min((len(ns) for ns in core.values()), default=None)
    return pd.DataFrame(
        [(n_sup, n_part, n_edges, min_deg)],
        columns=["n_core_suppliers", "n_core_parts", "n_core_edges", "min_core_degree"],
    )


def supplier_reach_hops(sf_dir: str) -> pd.DataFrame:
    """plans/analytics.py:supplier_reach_hops — ground-truth BFS from
    min(l_suppkey) over the supplier↔part bipartite graph, histogram of
    hop → (suppliers, parts)."""
    from collections import defaultdict, deque

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    off = 1_000_000_000
    adj = defaultdict(set)
    for s, p in zip(li["l_suppkey"], li["l_partkey"]):
        a, b = int(s), int(p) + off
        adj[a].add(b)
        adj[b].add(a)
    src = int(li["l_suppkey"].min())
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    hist = defaultdict(lambda: [0, 0])
    for n, h in dist.items():
        hist[h][0 if n < off else 1] += 1
    rows = [(h, s, p) for h, (s, p) in sorted(hist.items())]
    return pd.DataFrame(rows, columns=["hop", "n_suppliers", "n_parts"])


def supplier_affinity_distance(sf_dir: str) -> pd.DataFrame:
    """plans/analytics.py:supplier_affinity_distance — sequential
    Dijkstra over the 1/count-weighted supplier↔part graph. Candidate
    path distances accumulate left-to-right with the same IEEE ops the
    Spark relaxation performs, so the min values match bit-for-bit
    before the round-6 output (HALF_UP, the _round4 convention at
    scale 6)."""
    import heapq
    from collections import Counter, defaultdict

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    off = 1_000_000_000
    cnt = Counter(
        (int(s), int(p) + off) for s, p in zip(li["l_suppkey"], li["l_partkey"])
    )
    adj = defaultdict(list)
    for (a, b), c in cnt.items():
        w = 1.0 / c
        adj[a].append((b, w))
        adj[b].append((a, w))
    src = int(li["l_suppkey"].min())
    dist = {src: 0.0}
    heap = [(0.0, src)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    rows = [(n, r6(d)) for n, d in sorted(dist.items()) if n < off]
    return pd.DataFrame(rows, columns=["suppkey", "affinity_dist"])


def _np_normalize(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    return mat / norms[:, None]


def _kmeans_replay(sf_dir: str, k: int, iters: int, seed: int = 42, fit_mask_fn=None):
    """Pure-numpy replay of operators/cluster.py:kmeans_fit — exact for
    the parts that determine the discrete outputs. The k-means++
    seeding is BIT-exact (driver-side numpy in both paths: same
    md5-bucket sample order, same default_rng(seed) draws, so the same
    probability vectors reach the same rng.choice calls). The Lloyd
    centroid update differs only in float-summation ORDER (Spark sums
    per Arrow batch then merges; the replay sums members once), a
    ~1e-15 centroid perturbation that survives the downstream rounding
    (argmax margins and the 4/6-dp rounds are ~1e9× wider) — which is
    what lets these seeded pipelines be value-certified at all, while
    raw float aggregates (PCA, sketches) stay rows-only. Returns
    (ids, normalized_matrix, centroids) with ids/matrix in parquet row
    order (the order _collect_matrix sees)."""
    import hashlib

    import numpy as np

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    ids = t["vec_id"].to_numpy(np.int64)
    mat = _np_normalize(np.array([list(v) for v in t["embedding"]], dtype=np.float64))
    # ``fit_mask_fn`` restricts the FIT corpus (streaming bootstrap:
    # centroids come from the first wave only); ids/mat stay full
    fm = fit_mask_fn(ids) if fit_mask_fn is not None else np.ones(len(ids), bool)
    fit_ids, fit_mat = ids[fm], mat[fm]
    # the seeding sample: md5-bucket order, first 32768 (the whole fit
    # corpus at oracle scale)
    buckets = np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % (1 << 16)
            for i in fit_ids
        ]
    )
    smat = fit_mat[np.lexsort((fit_ids, buckets))][:32768]
    rng = np.random.default_rng(seed)
    centroids = [smat[rng.integers(len(smat))]]
    for _ in range(1, k):
        d2 = 1.0 - np.max(smat @ np.array(centroids).T, axis=1)
        d2 = np.maximum(d2, 0.0)
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(smat), 1.0 / len(smat))
        centroids.append(smat[rng.choice(len(smat), p=probs)])
    cent = np.array(centroids)
    for _ in range(iters):
        assign = np.argmax(fit_mat @ cent.T, axis=1)
        sums = np.zeros_like(cent)
        counts = np.zeros(k)
        for ci in np.unique(assign):
            members = fit_mat[assign == ci]
            sums[ci] = members.sum(axis=0)
            counts[ci] = len(members)
        nonempty = counts > 0
        cent[nonempty] = _np_normalize(sums[nonempty] / counts[nonempty, None])
    return ids, mat, cent


def semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:semantic_dedup (operators/cluster.py:semantic_dedup,
    n_clusters=8, threshold=0.4, iters=3): assign cells by argmax cosine,
    then inside each cell drop ids covered by a LOWER-id member at
    rounded-4dp cosine >= threshold."""
    import numpy as np

    ids, mat, cent = _kmeans_replay(sf_dir, k=8, iters=3)
    cells = np.argmax(mat @ cent.T, axis=1)
    rows = []
    for c in np.unique(cells):
        m = np.nonzero(cells == c)[0]
        order = m[np.argsort(ids[m])]
        sub = mat[order]
        sims = np.round(sub @ sub.T, 4)
        np.fill_diagonal(sims, 0.0)
        covered = np.triu(sims >= 0.4, k=1).any(axis=0)
        for i, cov in zip(order, covered):
            rows.append((int(ids[i]), int(c), bool(not cov)))
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "kept"])


def embedding_coverage_sample(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:embedding_coverage_sample (coverage_sample,
    n_clusters=8, per_cell=4, default iters=5): per-cell top-4 by
    (rounded-4dp centrality DESC, id ASC) plus the cell's member count."""
    import numpy as np

    ids, mat, cent = _kmeans_replay(sf_dir, k=8, iters=5)
    sims = mat @ cent.T
    cells = np.argmax(sims, axis=1)
    centr = np.round(sims[np.arange(len(ids)), cells], 4)
    rows = []
    for c in np.unique(cells):
        m = np.nonzero(cells == c)[0]
        order = m[np.lexsort((ids[m], -centr[m]))][:4]
        for rank, i in enumerate(order, start=1):
            rows.append((int(ids[i]), int(c), float(centr[i]), rank, len(m)))
    return pd.DataFrame(
        rows, columns=["vec_id", "cell", "centrality", "cell_rank", "n_in_cell"]
    )


def embedding_outlier_scores(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:embedding_outlier_scores (embedding_outliers,
    n_clusters=8, default iters=5): dist = round(1 - cos-to-own-centroid,
    6); z = HALF_UP-round4((dist - cell_mean)/cell_stddev_pop) over the
    ROUNDED dists (matching the plan's aggregation input); top-20 by
    (z DESC, id ASC)."""
    import numpy as np

    ids, mat, cent = _kmeans_replay(sf_dir, k=8, iters=5)
    sims = mat @ cent.T
    cells = np.argmax(sims, axis=1)
    dist = np.round(1.0 - sims[np.arange(len(ids)), cells], 6)
    z = np.empty(len(ids))
    for c in np.unique(cells):
        m = cells == c
        mu = dist[m].mean()
        sd = dist[m].std()
        z[m] = (dist[m] - mu) / (sd if sd > 0 else 1.0)
    rows = [
        (int(i), int(c), float(d), float(Decimal(repr(zz)).quantize(Decimal("0.0001"), ROUND_HALF_UP)))
        for i, c, d, zz in zip(ids, cells, dist, z)
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return pd.DataFrame(
        rows[:20], columns=["vec_id", "cell", "dist", "outlier_z"]
    )


def supplier_part_communities(sf_dir: str) -> pd.DataFrame:
    """plans/analytics.py:supplier_part_communities
    (operators/graph.py:label_propagation): 5 synchronous LPA rounds
    over the mirrored distinct supplier↔part edges, each node voting
    its neighbors' labels PLUS its own current label, argmax by
    (count DESC, label ASC). Integer-exact — no floats anywhere — so
    this replay certifies the full algorithm, not an approximation."""
    from collections import Counter, defaultdict

    import numpy as np

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    off = 1_000_000_000
    src = li["l_suppkey"].to_numpy(np.int64)
    dst = li["l_partkey"].to_numpy(np.int64) + off
    # repeat relationships only (edge weight >= 2), like the plan
    w = Counter(zip(src.tolist(), dst.tolist()))
    pairs = {(int(a), int(b)) for (a, b), n in w.items() if n >= 2}
    adj: dict[int, list[int]] = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    labels = {n: n for n in adj}
    for _ in range(5):
        new = {}
        for n, neigh in adj.items():
            votes = Counter(labels[m] for m in neigh)
            votes[labels[n]] += 1  # self-vote
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0, 0])
    for n, l in labels.items():
        a = agg[l]
        a[0] += 1
        a[1] += 1 if n < off else 0
        a[2] += 1 if n >= off else 0
    rows = sorted(
        ((l, c[0], c[1], c[2]) for l, c in agg.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    return pd.DataFrame(
        rows, columns=["community", "n_members", "n_suppliers", "n_parts"]
    )


PY_ORACLES = {
    "doc_compression_ratio": doc_compression_ratio,
    "bpe_vocab_merges": bpe_vocab_merges,
    "bpe_token_counts": bpe_token_counts,
    "supplier_part_pagerank": supplier_part_pagerank,
    "supplier_part_kcore": supplier_part_kcore,
    "supplier_reach_hops": supplier_reach_hops,
    "supplier_affinity_distance": supplier_affinity_distance,
    "semantic_dedup": semantic_dedup,
    "embedding_coverage_sample": embedding_coverage_sample,
    "embedding_outlier_scores": embedding_outlier_scores,
    "supplier_part_communities": supplier_part_communities,
    "bpe_fertility_by_lang": bpe_fertility_by_lang,
}

# registered at module tail: the LSH-family replays are defined below the
# original dict (functions-before-dict rule via explicit tail assignment)
def _register_lsh_family() -> None:
    PY_ORACLES.update(
        {
            "minhash_dedup_pairs": minhash_dedup_pairs_oracle,
            "minhash_dedup_clusters": minhash_dedup_clusters_oracle,
            "minhash_incremental_batch": minhash_incremental_batch_oracle,
            "simhash_near_dup_pairs": simhash_near_dup_pairs_oracle,
            "ann_topk_lsh": ann_topk_lsh_oracle,
            "embedding_near_dup_lsh": embedding_near_dup_lsh_oracle,
        }
    )


# ----------------------------------------------------------------- xxh64 --
# Pure-Python XXH64 — the PUBLIC xxHash algorithm (Yann Collet, BSD),
# re-implemented from the spec so the MinHash/SimHash/LSH family (seeded
# with Spark's xxhash64, default seed 42) becomes exactly replayable and
# certifiable instead of rows-only. Spark's XxHash64 expression chains
# columns (seed 42, then each column's hash seeds the next) and maps
# int->4-byte, long->8-byte, string->UTF-8-bytes inputs; verified
# bit-exact against F.xxhash64 in tests/test_py_oracle_xxh64.py.

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _XXP2) & _M64
    return (_rotl64(acc, 31) * _XXP1) & _M64


def _xx_merge(h: int, v: int) -> int:
    h ^= _xx_round(0, v)
    return (h * _XXP1 + _XXP4) & _M64


def _xx_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed
        v4 = (seed - _XXP1) & _M64
        while i <= n - 32:
            v1 = _xx_round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _xx_round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _xx_round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _xx_round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _xx_merge(h, v)
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        i += 1
    return _xx_fmix(h)


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _to_unsigned64(x: int) -> int:
    return x & _M64


def spark_xxhash64(*cols, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(*cols)`` bit-exact: seed 42, each column's
    hash seeds the next. Column typing follows Spark's literals: Python
    int in int32 range -> IntegerType (4-byte LE), wider int -> LongType
    (8-byte LE), str -> UTF-8 bytes; pass ``("long", v)`` to force
    LongType for values that Spark holds as bigint (hash outputs).
    Returns SIGNED 64-bit, matching the column value."""
    h = seed & _M64
    for c in cols:
        forced = None
        if isinstance(c, tuple):
            forced, c = c
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        elif isinstance(c, bool):
            raise TypeError("bool hashing not needed/verified")
        elif isinstance(c, int):
            is_long = forced == "long" or not (-(1 << 31) <= c < (1 << 31))
            nbytes = 8 if is_long else 4
            h = xxh64_bytes(c.to_bytes(nbytes, "little", signed=True), h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(c)}")
    return _to_signed64(h)


# ------------------------------------------------- LSH-family replays --
# minhash/simhash/embedding-LSH queries were rows-only in every round
# because their kernels hash with Spark's xxhash64 (no SQL expression).
# With spark_xxhash64 above they are exactly replayable: same shingling,
# same seeded rehash family, same banded buckets, same verification —
# integer/hash arithmetic end-to-end (jaccard/cosine rounded exactly as
# the queries round). Cites: operators/dedup.py:minhash_lsh_pairs,
# simhash64, minhash_lsh_incremental; operators/similarity.py:
# lsh_ann_topk, cosine_near_dup_lsh; operators/cluster.py:
# connected_components (min-id union-find).

_WS_ASCII = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s (ASCII), not Python's


def _norm_tokens(text: str) -> list[str]:
    """functions/textfn.py: tokens(normalize_ws(c)) — lowercase, collapse
    ASCII whitespace runs, trim, split. Empty text yields [''] exactly
    like Spark's split on an empty string."""
    t = _WS_ASCII.sub(" ", text.lower()).strip()
    return t.split(" ")


def _docs_lsh(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _shingle_hash_set(text: str, n: int = 3) -> list[int]:
    """operators/dedup.py:_shingle_hash_frame — distinct word n-grams
    (whole doc as one gram when shorter than n), xxhash64 each."""
    toks = _norm_tokens(text)
    out, seen = [], set()
    for i in range(max(len(toks) - n, 0) + 1):
        g = " ".join(toks[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(spark_xxhash64(g))
    return out


def _minhash_sig(hashes: list[int], num_hashes: int = 16) -> list[int]:
    """minhash_signature_from_hashes: sig[i] = min over shingle hashes h
    of xxhash64(lit(i): int, h: long) — signed min, like array_min."""
    return [
        min(spark_xxhash64(i, ("long", h)) for h in hashes)
        for i in range(num_hashes)
    ]


def _band_buckets(sig: list[int], bands: int = 4) -> list[tuple[int, int]]:
    """_banded_buckets: bucket = xxhash64(concat_ws(',', band slice cast
    to string)); long->string cast matches str()."""
    rpb = len(sig) // bands
    return [
        (b, spark_xxhash64(",".join(str(s) for s in sig[b * rpb : (b + 1) * rpb])))
        for b in range(bands)
    ]


def _minhash_pairs_core(
    docs_a: list[tuple[int, str]],
    docs_b: list[tuple[int, str]] | None,
    threshold: float = 0.5,
) -> list[tuple[int, int, float]]:
    """Shared LSH-candidate + exact-Jaccard verify. ``docs_b=None`` =
    self-join (id_a < id_b); otherwise batch(a) x corpus(b) cross join
    on (band, bucket)."""
    def index(docs):
        sh = {i: _shingle_hash_set(t) for i, t in docs}
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, _ in docs:
            if not sh[i]:
                continue
            for bb in _band_buckets(_minhash_sig(sh[i])):
                buckets.setdefault(bb, []).append(i)
        return sh, buckets

    sh_a, bk_a = index(docs_a)
    if docs_b is None:
        sh_all = sh_a
        cand = set()
        for ids in bk_a.values():
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
    else:
        sh_b, bk_b = index(docs_b)
        sh_all = {**sh_a, **sh_b}
        cand = set()
        for bb, ids in bk_a.items():
            for other in bk_b.get(bb, []):
                for mine in ids:
                    cand.add((mine, other))
    out = []
    for a, b in cand:
        sa, sb = set(sh_all[a]), set(sh_all[b])
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        jac = _round4(inter / union)
        if jac >= threshold:
            out.append((a, b, jac))
    return out


def minhash_dedup_pairs_oracle(sf_dir: str) -> pd.DataFrame:
    pairs = _minhash_pairs_core(_docs_lsh(sf_dir), None)
    return pd.DataFrame(pairs, columns=["id_a", "id_b", "jaccard"])


def minhash_dedup_clusters_oracle(sf_dir: str) -> pd.DataFrame:
    docs = _docs_lsh(sf_dir)
    pairs = _minhash_pairs_core(docs, None)
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(i, find(i)) for i, _ in docs]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def minhash_incremental_batch_oracle(sf_dir: str) -> pd.DataFrame:
    docs = _docs_lsh(sf_dir)
    batch = [(i, t) for i, t in docs if i % 5 == 0]
    corpus = [(i, t) for i, t in docs if i % 5 != 0]
    pairs = _minhash_pairs_core(batch, corpus)
    return pd.DataFrame(pairs, columns=["batch_id", "corpus_id", "jaccard"])


def simhash_near_dup_pairs_oracle(sf_dir: str) -> pd.DataFrame:
    """operators/dedup.py:simhash64 + block-banded pairs: per-bit
    majority vote over ALL token hashes (duplicates counted), 4x16-bit
    block equi-join, exact Hamming <= 3."""
    sigs: dict[int, int] = {}  # unsigned 64
    for i, t in _docs_lsh(sf_dir):
        hs = [_to_unsigned64(spark_xxhash64(tok)) for tok in _norm_tokens(t)]
        n = len(hs)
        packed = 0
        for bit in range(64):
            votes = sum((h >> bit) & 1 for h in hs)
            if 2 * votes > n:
                packed |= 1 << bit
        sigs[i] = packed
    blocks: dict[tuple[int, int], list[int]] = {}
    for i, s in sigs.items():
        for b in range(4):
            blocks.setdefault((b, (s >> (b * 16)) & 0xFFFF), []).append(i)
    cand = set()
    for ids in blocks.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cand.add((ids[x], ids[y]))
    rows = []
    for a, b in cand:
        ham = bin(sigs[a] ^ sigs[b]).count("1")
        if ham <= 3:
            rows.append((a, b, ham))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


def _embeddings(sf_dir: str):
    import numpy as np

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def ann_topk_lsh_oracle(sf_dir: str) -> pd.DataFrame:
    """operators/similarity.py:lsh_ann_topk replay (n_bits=4,
    n_tables=24, seed 42, k=5, queries = vec_id < 10): hyperplane sign
    keys over NORMALIZED vectors, any-table collision, exact cosine
    rounded to 4, top-5 by (cosine desc, neighbor asc), self excluded."""
    import numpy as np

    ids, mat = _embeddings(sf_dir)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    mat = mat / norms[:, None]
    n_bits, n_tables, k = 4, 24, 5
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_tables, n_bits, mat.shape[1]))
    plane_mat = planes.reshape(n_tables * n_bits, -1)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    bits = (mat @ plane_mat.T) > 0
    keys = bits.reshape(len(ids), n_tables, n_bits) @ weights  # (n, L)
    qmask = ids < 10
    q_ids, q_keys, q_mat = ids[qmask], keys[qmask], mat[qmask]
    collide = (keys[:, None, :] == q_keys[None, :, :]).any(-1)  # (n, nq)
    sims = np.round(mat @ q_mat.T, 4)
    rows = []
    for j, qid in enumerate(q_ids):
        cand = np.nonzero(collide[:, j] & (ids != qid))[0]
        order = cand[np.lexsort((ids[cand], -sims[cand, j]))[:k]]
        for r, ci in enumerate(order, start=1):
            rows.append((int(qid), r, int(ids[ci]), float(sims[ci, j])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "cosine"])


def embedding_near_dup_lsh_oracle(sf_dir: str) -> pd.DataFrame:
    """operators/similarity.py:cosine_near_dup_lsh replay (threshold
    0.4 -> _auto_lsh_params gives (4, 23), seed 42): sign keys over RAW
    vectors, per-(table,bucket) exact cosine of NORMALIZED vectors
    rounded to 4, >= threshold, distinct pairs."""
    import math

    import numpy as np

    threshold = 0.4
    p_bit = 1.0 - math.acos(threshold) / math.pi
    n_bits = n_tables = None
    for b in (20, 16, 12, 10, 8, 6, 4):
        p1 = p_bit**b
        if not 0.0 < p1 < 1.0:
            continue
        lt = math.ceil(math.log(1.0 - 0.98) / math.log(1.0 - p1))
        if lt <= 24:
            n_bits, n_tables = b, max(1, lt)
            break
    ids, raw = _embeddings(sf_dir)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_tables, n_bits, raw.shape[1]))
    plane_mat = planes.reshape(n_tables * n_bits, -1)
    weights = 1 << np.arange(n_bits, dtype=np.int64)
    bits = (raw @ plane_mat.T) > 0  # RAW vectors: scale-invariant signs
    keys = bits.reshape(len(ids), n_tables, n_bits) @ weights
    norms = np.linalg.norm(raw, axis=1)
    norms[norms == 0.0] = 1.0
    mat = raw / norms[:, None]
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(len(ids)):
        for tbl in range(n_tables):
            buckets.setdefault((tbl, int(keys[i, tbl])), []).append(i)
    seen: set[tuple[int, int]] = set()
    rows = []
    for members in buckets.values():
        if len(members) < 2:
            continue
        sub = np.array(members)
        sims = np.round(mat[sub] @ mat[sub].T, 4)
        for x in range(len(sub)):
            for y in range(len(sub)):
                a, b = int(ids[sub[x]]), int(ids[sub[y]])
                if a < b and sims[x, y] >= threshold and (a, b) not in seen:
                    seen.add((a, b))
                    rows.append((a, b, float(sims[x, y])))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "cosine"])


def dedup_stream_ingest_minhash_oracle(sf_dir: str) -> pd.DataFrame:
    """streaming/dedup_sink.py:MinHashDedupSink replay — three waves
    (doc_id % 3) of the documents table through the online near-dup
    sink, sequentially: per wave (micro-batch) the sink (1) LSH-buckets
    the batch and drops every id that is the HIGHER side of a verified
    within-batch candidate pair (a._id < b._id join, exact Jaccard
    rounded to 4 >= 0.5), (2) probes the persisted index with the
    survivors' band keys and drops every survivor whose candidate
    verifies against a stored shingle set, (3) lands the rest. Same
    shingling / signature / banding kernels as minhash_dedup_pairs
    (default shingle 3, 16 hashes, 4 bands). Returns the landed corpus
    ids — the registry query's read_state projection."""
    threshold = 0.5
    docs = _docs_lsh(sf_dir)
    sh_store: dict[int, set[int]] = {}
    index: dict[tuple[int, int], list[int]] = {}
    landed: list[int] = []
    for w in range(3):
        wave = [(i, t) for i, t in docs if i % 3 == w]
        sh = {i: _shingle_hash_set(t) for i, t in wave}
        bb = {i: _band_buckets(_minhash_sig(sh[i])) for i, t in wave if sh[i]}

        # (1) within-batch: bucket self-join, higher id of a verified
        # pair drops (NOT transitive-representative semantics — the
        # sink's single-pass anti-join, replayed faithfully)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i in bb:
            for key in bb[i]:
                buckets.setdefault(key, []).append(i)
        cand: set[tuple[int, int]] = set()
        for ids in buckets.values():
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
        dup: set[int] = set()
        for a, b in cand:
            sa, sb = set(sh[a]), set(sh[b])
            inter = len(sa & sb)
            if _round4(inter / (len(sa) + len(sb) - inter)) >= threshold:
                dup.add(b)
        survivors = [i for i in bb if i not in dup]

        # (2) vs corpus: survivors' band keys probe the index; exact
        # Jaccard against the PERSISTED shingle sets
        novel = []
        for i in survivors:
            cids = {c for key in bb[i] for c in index.get(key, [])}
            is_dup = False
            for c in cids:
                sa, sb = set(sh[i]), sh_store[c]
                inter = len(sa & sb)
                if _round4(inter / (len(sa) + len(sb) - inter)) >= threshold:
                    is_dup = True
                    break
            if not is_dup:
                novel.append(i)

        # (3) land
        for i in novel:
            landed.append(i)
            sh_store[i] = set(sh[i])
            for key in bb[i]:
                index.setdefault(key, []).append(i)
    return pd.DataFrame(sorted(landed), columns=["doc_id"])


_register_lsh_family()
PY_ORACLES["dedup_stream_ingest_minhash"] = dedup_stream_ingest_minhash_oracle


# -------------------------------------------- IVF / PQ family replays --
# Same certification class as the r10 k-means promotions: the seeding is
# bit-exact (driver-side numpy in both paths), Lloyd differs only in
# float-summation order (~1e-15, far inside every rounding/argmax
# margin). Cites: operators/cluster.py:ivf_topk/ivf_topk_from_index/
# append_to_ivf_index, operators/similarity.py:pq_fit/pq_assign/pq_topk.


def _ivf_topk_replay(sf_dir: str, qmask_fn, k: int = 5, n_probe: int = 8, fit_mask_fn=None):
    import numpy as np

    ids, mat, cent = _kmeans_replay(sf_dir, k=16, iters=5, fit_mask_fn=fit_mask_fn)
    qm = qmask_fn(ids)
    q_ids, q_mat = ids[qm], mat[qm]
    probed = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]  # (nq, p)
    cells = np.argmax(mat @ cent.T, axis=1)
    cand = (cells[:, None, None] == probed[None, :, :]).any(-1)  # (n, nq)
    sims = np.round(mat @ q_mat.T, 4)
    rows = []
    for j, qid in enumerate(q_ids):
        v = np.nonzero(cand[:, j] & (ids != qid))[0]
        order = v[np.lexsort((ids[v], -sims[v, j]))[:k]]
        for r, ci in enumerate(order, start=1):
            rows.append((int(qid), r, int(ids[ci]), float(sims[ci, j])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "cosine"])


def ann_topk_ivf_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_ivf — centroids kmeans_fit(k=16, iters=5,
    seed=42), queries vec_id < 10, probe 8 of 16 cells, exact cosine
    (round 4) over probed rows, top-5 by (cosine desc, id asc)."""
    return _ivf_topk_replay(sf_dir, lambda ids: ids < 10)


def ann_topk_ivf_persisted_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_ivf_persisted — output-identical to
    ivf_topk with the same centroids (partition pruning changes bytes
    read, not results; pinned in tests/test_ivf_index.py); queries
    vec_id % 50 == 0."""
    return _ivf_topk_replay(sf_dir, lambda ids: ids % 50 == 0)


def ann_topk_ivf_appended_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_ivf_appended — append-then-serve equals
    rebuild with the same (full-corpus) centroids, so the replay is the
    same ivf_topk over the union; queries vec_id % 50 == 0."""
    return _ivf_topk_replay(sf_dir, lambda ids: ids % 50 == 0)


def ann_topk_ivf_stream_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_ivf_stream
    (streaming/ann_sink.py:IvfStreamSink): the stream-built store
    serves identically to ivf_topk over the full corpus with centroids
    fit ON THE BOOTSTRAP WAVE ONLY (vec_id % 3 == 0 — the sink freezes
    them after the first micro-batch), so the replay is the same
    masked-GEMM top-k with the fit restricted to that wave; queries
    vec_id % 50 == 0, probe 8 of 16 cells, top-5 by (cosine desc,
    id asc)."""
    return _ivf_topk_replay(
        sf_dir,
        lambda ids: ids % 50 == 0,
        fit_mask_fn=lambda ids: ids % 3 == 0,
    )


def embedding_cluster_purity_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:embedding_cluster_purity — k-means at the label
    cardinality (embedding_outliers' assignment path: k=n_labels,
    iters=5, seed=42), per cluster: size, majority label (count desc,
    LOWEST label on ties), purity = round(max_count/size, 4)."""
    import numpy as np

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    label_of = dict(zip(t.column("vec_id").to_pylist(), t.column("label").to_pylist()))
    n_labels = len(set(label_of.values()))
    ids, mat, cent = _kmeans_replay(sf_dir, k=n_labels, iters=5)
    cells = np.argmax(mat @ cent.T, axis=1)
    per: dict[int, Counter] = {}
    for i, c in zip(ids, cells):
        per.setdefault(int(c), Counter())[label_of[int(i)]] += 1
    rows = []
    for c, cnt in per.items():
        n = sum(cnt.values())
        maj = min(cnt, key=lambda lb: (-cnt[lb], lb))
        rows.append((c, n, maj, _round4(max(cnt.values()) / n)))
    return pd.DataFrame(
        rows, columns=["cluster", "n_vectors", "majority_label", "purity"]
    )


def _pq_fit_replay(mat, m: int, ks: int, iters: int = 8, seed: int = 42):
    """operators/similarity.py:pq_fit on an already-ordered sample
    matrix — the SAME driver-side numpy code path, so bit-identical."""
    import numpy as np

    n, dim = mat.shape
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, sub))
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        cent = x[rng.choice(n, size=ks, replace=False)]
        for _ in range(iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(0)
        books[j] = cent
    return books


def _pq_sample_order(sf_dir: str):
    """pq_fit's deterministic sample: md5-bucket (1<<16) then id order,
    first 32768 — the whole corpus at oracle scale. Returns (ids, raw
    float64 matrix) in that order."""
    import hashlib

    import numpy as np

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    buckets = np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % (1 << 16)
            for i in ids
        ]
    )
    order = np.lexsort((ids, buckets))[:32768]
    return ids, mat, order


def _pq_codes_err(mat, books):
    import numpy as np

    m, ks, sub = books.shape
    codes = np.empty((len(mat), m), dtype=np.int64)
    err = np.zeros(len(mat))
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        d = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = d.argmin(1)
        err += d[np.arange(len(mat)), codes[:, j]]
    return codes, err


def embedding_pq_codes_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:embedding_pq_codes — pq_fit(m=8, ks=16, iters=8,
    seed=42) on the RAW md5-ordered sample, pq_assign over the corpus,
    per-subspace (n_vectors, distinct codes, round-6 mean total err)."""
    import numpy as np

    ids, mat, order = _pq_sample_order(sf_dir)
    books = _pq_fit_replay(mat[order], m=8, ks=16)
    codes, err = _pq_codes_err(mat, books)
    rows = []
    for j in range(8):
        rows.append(
            (
                j,
                len(ids),
                int(len(np.unique(codes[:, j]))),
                float(
                    Decimal(repr(err.mean())).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                ),
            )
        )
    return pd.DataFrame(
        rows, columns=["subspace", "n_vectors", "n_codes_used", "avg_total_sq_err"]
    )


def ann_topk_pq_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_pq (operators/similarity.py:pq_topk,
    m=8, ks=16, k=5): ADC distance tables per query over RAW vectors,
    d rounded to 6, self excluded, top-5 by (adc asc, id asc)."""
    import numpy as np

    ids, mat, order = _pq_sample_order(sf_dir)
    books = _pq_fit_replay(mat[order], m=8, ks=16)
    codes, _ = _pq_codes_err(mat, books)
    qm = ids < 10
    q_ids, q_mat = ids[qm], mat[qm]
    m, ks, sub = books.shape
    tables = np.stack(
        [
            ((books[j][None, :, :] - q_mat[:, None, j * sub : (j + 1) * sub]) ** 2).sum(-1)
            for j in range(m)
        ],
        axis=1,
    )  # (nq, m, ks)
    d = np.zeros((len(q_ids), len(ids)))
    for j in range(m):
        d += tables[:, j, :][:, codes[:, j]]
    d = np.round(d, 6)
    rows = []
    for qi, qid in enumerate(q_ids):
        v = np.nonzero(ids != qid)[0]
        order5 = v[np.lexsort((ids[v], d[qi, v]))[:5]]
        for r, ci in enumerate(order5, start=1):
            rows.append((int(qid), r, int(ids[ci]), float(d[qi, ci])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "adc_dist"])


def _register_ivf_pq_family() -> None:
    PY_ORACLES.update(
        {
            "ann_topk_ivf": ann_topk_ivf_oracle,
            "ann_topk_ivf_persisted": ann_topk_ivf_persisted_oracle,
            "ann_topk_ivf_appended": ann_topk_ivf_appended_oracle,
            "ann_topk_ivf_stream": ann_topk_ivf_stream_oracle,
            "embedding_cluster_purity": embedding_cluster_purity_oracle,
            "embedding_pq_codes": embedding_pq_codes_oracle,
            "ann_topk_pq": ann_topk_pq_oracle,
        }
    )


_register_ivf_pq_family()


def ann_topk_ivf_pq_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:ann_topk_ivf_pq (operators/similarity.py:
    ivf_pq_topk, m=16, ks=64, n_probe=8, n_rerank=50, k=5): spherical
    k-means routing + PQ/ADC shortlist + exact re-rank. The replay
    mirrors BOTH normalization paths bit-for-bit: the corpus is
    JVM-normalized (sequential left-to-right sum of squares, floor
    1e-12 — functions/vector.py:l2_norm) before codebook fit, cell
    assignment, and encoding, while queries use the numpy norm
    (_normalized_matrix); the re-rank dot is the sequential
    F.aggregate fold, rounded to 6."""
    import hashlib

    import numpy as np

    ids, _, cent = _kmeans_replay(sf_dir, k=16, iters=5)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    raw = np.array(t.column("embedding").to_pylist(), dtype=np.float64)

    def jvm_norm(row):
        acc = 0.0
        for v in row:
            acc += v * v
        return max(acc ** 0.5, 1e-12)

    normed = np.array([r / jvm_norm(r) for r in raw])
    buckets = np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) % (1 << 16)
            for i in ids
        ]
    )
    order = np.lexsort((ids, buckets))[:32768]
    books = _pq_fit_replay(normed[order], m=16, ks=64)
    cells = np.argmax(normed @ cent.T, axis=1)
    codes, _ = _pq_codes_err(normed, books)

    qm = ids < 10
    q_ids = ids[qm]
    q_raw = raw[qm]
    qn = np.linalg.norm(q_raw, axis=1)
    qn[qn == 0.0] = 1.0
    q_mat = q_raw / qn[:, None]
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :8]
    m, ks, sub = books.shape
    tables = np.stack(
        [
            ((books[j][None, :, :] - q_mat[:, None, j * sub : (j + 1) * sub]) ** 2).sum(-1)
            for j in range(m)
        ],
        axis=1,
    )
    rows = []
    for qi, qid in enumerate(q_ids):
        cand = np.nonzero(np.isin(cells, probe[qi]) & (ids != qid))[0]
        d = np.round(
            tables[qi][np.arange(m)[:, None], codes[cand].T].sum(0), 6
        )
        short = cand[np.lexsort((ids[cand], d))[:50]]
        scored = []
        for ci in short:
            acc = 0.0
            for a, b in zip(q_mat[qi], normed[ci]):
                acc += a * b
            scored.append(
                (
                    float(Decimal(repr(acc)).quantize(Decimal("0.000001"), ROUND_HALF_UP)),
                    int(ids[ci]),
                )
            )
        scored.sort(key=lambda s: (-s[0], s[1]))
        for r, (cos, nid) in enumerate(scored[:5], start=1):
            rows.append((int(qid), r, nid, cos))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "cosine"])


PY_ORACLES["ann_topk_ivf_pq"] = ann_topk_ivf_pq_oracle


def media_phash_pairs_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:media_phash_pairs (operators/multimodal.py:
    synthesize_media + perceptual_hash + phash_near_dup_pairs): payload
    = normalized text bytes (every 10th doc re-encoded under media_id +
    1e9), canonical DCT pHash (payload raster -> 8x8 low-frequency
    corner, median threshold, bit 63 zero), 5-block pigeonhole
    candidates, exact Hamming <= 4. The batched einsum path is pinned
    bit-identical to the per-payload formula replayed here."""
    import numpy as np

    GRID = 32
    basis = np.array(
        [np.cos(np.pi * (np.arange(GRID) + 0.5) * u / GRID) for u in range(8)]
    )

    def pixels(payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload if payload else b"\x00", dtype=np.uint8)
        arr = arr.astype(np.float64)
        w = max(1, arr.size // 64)
        if w > 1:
            arr = np.convolve(arr, np.ones(w) / w, mode="same")
        xs = np.linspace(0.0, max(arr.size - 1, 0), GRID * GRID)
        return np.interp(xs, np.arange(arr.size), arr).reshape(GRID, GRID)

    def phash(payload: bytes) -> int:
        coef = basis @ pixels(payload) @ basis.T
        flat = coef.flatten()[1:]
        bits = flat > np.median(flat)
        val = np.uint64(0)
        for i in range(63):
            if bits[i]:
                val |= np.uint64(1) << np.uint64(i)
        return int(val)  # unsigned bit pattern; blocks/hamming below

    hashes: dict[int, int] = {}
    for doc_id, text in _docs_lsh(sf_dir):
        norm = _WS_ASCII.sub(" ", text.lower()).strip()
        h = phash(norm.encode("utf-8"))
        hashes[doc_id] = h
        if doc_id % 10 == 0:
            hashes[doc_id + 1_000_000_000] = h
    bands = [(0, 12), (12, 12), (24, 12), (36, 12), (48, 16)]
    blocks: dict[tuple[int, int], list[int]] = {}
    for i, h in hashes.items():
        for b, (shift, width) in enumerate(bands):
            blocks.setdefault((b, (h >> shift) & ((1 << width) - 1)), []).append(i)
    cand = set()
    for idset in blocks.values():
        idset = sorted(idset)
        for x in range(len(idset)):
            for y in range(x + 1, len(idset)):
                cand.add((idset[x], idset[y]))
    rows = []
    for a, b in cand:
        ham = bin(hashes[a] ^ hashes[b]).count("1")
        if ham <= 4:
            rows.append((a, b, ham))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


PY_ORACLES["media_phash_pairs"] = media_phash_pairs_oracle


def _dsir_weights_raw(sf_dir: str):
    """operators/selection.py:dsir_importance_weights replay (target =
    lang == 'en', n_buckets=4096): hashed uni+bigram counts via
    spark_xxhash64, add-1 log-ratios, per-doc weighted sum."""
    import math

    B = 4096
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    docs = list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    per_doc: dict[int, Counter] = {}
    r_f: Counter = Counter()
    t_f: Counter = Counter()
    for doc_id, text, lang in docs:
        toks = _norm_tokens(text)
        grams = list(toks)
        # bigrams only when >= 2 tokens (r12: the operator no longer
        # emits a degenerate self-bigram for 1-token docs or an
        # empty-string feature for empty docs)
        for i in range(len(toks) - 1):
            grams.append(" ".join(toks[i : i + 2]))
        cnt = Counter(spark_xxhash64(g) % B for g in grams)
        per_doc[doc_id] = cnt
        for f, n in cnt.items():
            r_f[f] += n
            if lang == "en":
                t_f[f] += n
    R, T = sum(r_f.values()), sum(t_f.values())
    a = 1.0 / B  # unit-total Laplace mass, matching the operator
    lr = {
        f: math.log((t_f[f] + a) / float(T + 1)) - math.log((r_f[f] + a) / float(R + 1))
        for f in r_f
    }
    rows = []
    for doc_id, cnt in per_doc.items():
        w = sum(n * lr[f] for f, n in sorted(cnt.items()))
        rows.append((doc_id, sum(cnt.values()), _round4(w)))
    return rows


def dsir_importance_weights_oracle(sf_dir: str) -> pd.DataFrame:
    return pd.DataFrame(
        _dsir_weights_raw(sf_dir), columns=["doc_id", "n_features", "log_weight"]
    )


def dsir_select_top_quarter_oracle(sf_dir: str) -> pd.DataFrame:
    rows = _dsir_weights_raw(sf_dir)
    n_keep = -(-len(rows) // 4)
    rows.sort(key=lambda r: (-r[2], r[0]))
    return pd.DataFrame(
        rows[:n_keep], columns=["doc_id", "n_features", "log_weight"]
    )


PY_ORACLES["dsir_importance_weights"] = dsir_importance_weights_oracle
PY_ORACLES["dsir_select_top_quarter"] = dsir_select_top_quarter_oracle


def embedding_pca_explained_oracle(sf_dir: str) -> pd.DataFrame:
    """plans/docs.py:embedding_pca_explained (operators/pca.py): moment
    aggregation -> covariance -> numpy eigh, top-10 spectrum. The only
    cross-engine difference is float-summation GROUPING of the moment
    partials (per-Arrow-batch vs one pass, ~1e-13 on Gram entries of
    magnitude ~n) — seven orders below the 1e-6 rounding resolution;
    eigenvalue-only output means no eigenvector sign ambiguity. Same
    certification class as the k-means/cosine replays; stability
    re-verified at registration across repeated runs and both SFs."""
    import numpy as np

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = len(mat)
    s = mat.sum(axis=0)
    g = mat.T @ mat
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    eig = np.linalg.eigh(cov)[0][::-1]
    total = float(eig.sum())
    top = eig[:10]
    cum = np.cumsum(top) / total
    rows = [
        (int(i), round(float(v), 6), round(float(v / total), 6), round(float(c), 6))
        for i, (v, c) in enumerate(zip(top, cum))
    ]
    return pd.DataFrame(
        rows, columns=["component", "eigenvalue", "explained_frac", "cum_frac"]
    )


PY_ORACLES["embedding_pca_explained"] = embedding_pca_explained_oracle
