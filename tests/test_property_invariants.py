"""Property-based invariants (hypothesis) for the operators whose failure
modes are subtle value drift rather than errors: sharded sequence packing
and the two connected-components execution paths. Example counts are kept
small — every example is a Spark job."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st

CAP = 100


@st.composite
def _doc_sizes(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    return draw(
        st.lists(
            st.integers(min_value=0, max_value=3 * CAP), min_size=n, max_size=n
        )
    )


@settings(max_examples=8, deadline=None)
@given(sizes=_doc_sizes(), n_shards=st.sampled_from([1, 4]))
def test_pack_sequences_invariants_hold_for_random_sizes(spark, sizes, n_shards):
    from cdc_streaming_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(df, capacity=CAP, n_shards=n_shards).collect()
    assert len(rows) == len(sizes)
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        fills = defaultdict(int)
        for r in members:
            assert r.pack_id >> 40 == shard
            fills[r.pack_id - (shard << 40)] += min(r.n_tokens, CAP)
        bins = sorted(fills)
        # bins are consecutive from 0; every bin < 2*CAP; every CLOSED bin
        # leaves the cumulative total past its capacity boundary
        assert bins == list(range(len(bins)))
        cum = 0
        for m in bins:
            assert fills[m] < 2 * CAP
            cum += fills[m]
            if m < bins[-1]:
                assert cum >= (m + 1) * CAP
        # cum_tokens is the shard-local running total
        assert members[-1].cum_tokens == sum(min(r.n_tokens, CAP) for r in members)


@settings(max_examples=5, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_connected_components_paths_agree_on_random_graphs(spark, pairs):
    from cdc_streaming_pipeline_spark.operators.cluster import connected_components

    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs or [], "id_a long, id_b long")
    nodes = spark.range(16).withColumnRenamed("id", "vec_id")
    fast = {r.vec_id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    dist = {
        r.vec_id: r.cluster_id
        for r in connected_components(edges, nodes, driver_threshold_edges=-1).collect()
    }
    assert fast == dist
    assert set(fast) == set(range(16))
    # every label is the min of its own component (fixed point)
    comp = defaultdict(set)
    for v, lbl in fast.items():
        comp[lbl].add(v)
    for lbl, members in comp.items():
        assert lbl == min(members)


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=12),
    chunk=st.sampled_from([16, 64]),
    stride_frac=st.sampled_from([2, 4]),
)
def test_chunk_documents_invariants_for_random_lengths(spark, n_tokens, chunk, stride_frac):
    """For ANY document length: every token is covered, chunk indices are
    dense from 0, no chunk exceeds the window, the final chunk reaches the
    last token, and overlap never exceeds window - stride."""
    from cdc_streaming_pipeline_spark.operators.text import chunk_documents

    stride = max(1, chunk - chunk // stride_frac)
    rows = [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(n_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r.doc_id].append(r)
    for i, n in enumerate(n_tokens):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if n == 0:
            assert not chunks  # blank docs emit nothing
            continue
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            assert 1 <= c.n_chunk_tokens <= chunk
            assert c.start_token + c.n_chunk_tokens - 1 <= n
            covered.update(range(c.start_token, c.start_token + c.n_chunk_tokens))
        assert covered == set(range(1, n + 1)), f"doc {i} (n={n}) not fully covered"
        assert chunks[-1].start_token + chunks[-1].n_chunk_tokens - 1 == n


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", max_codepoint=0x2FF, exclude_characters="\r"
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_clean_text_is_idempotent_and_never_grows(spark, texts):
    """clean(clean(x)) == clean(x) (a normalizer must be a projection) and
    cleaning never adds characters, for arbitrary unicode soup."""
    from cdc_streaming_pipeline_spark.operators.text import clean_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = {r.doc_id: r for r in clean_text(df).collect()}
    # reconstruct cleaned text via the same chain to feed a second pass
    from pyspark.sql import functions as F

    t = F.col("text")
    t = F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r"(?m)^ | $", "")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    cleaned_df = df.select("doc_id", t.alias("text"))
    twice = {r.doc_id: r for r in clean_text(cleaned_df).collect()}
    for i, raw in rows:
        assert once[i].n_chars_clean <= once[i].n_chars_raw
        assert twice[i].n_removed == 0, f"not idempotent on {raw!r}"
        assert twice[i].clean_md5 == once[i].clean_md5


@st.composite
def _cdc_events(draw):
    """Random per-key CDC event sequences: ops over a small key pool with a
    strictly increasing global LSN (SCD2 requires strict order per key;
    probes, not events, exercise duplicate/boundary timestamps)."""
    n = draw(st.integers(min_value=1, max_value=24))
    keys = draw(st.integers(min_value=1, max_value=4))
    return [
        (
            draw(st.integers(min_value=1, max_value=keys)),  # key
            draw(st.sampled_from(["c", "u", "d"])),  # op
            draw(st.integers(min_value=0, max_value=99)),  # payload value
        )
        for _ in range(n)
    ]


@settings(max_examples=8, deadline=None)
@given(events=_cdc_events())
def test_pit_join_matches_bruteforce_interval_scan(spark, events):
    """pit_join against a randomly generated SCD2 history must equal a
    per-probe brute-force interval scan — including probes ON interval
    boundaries (half-open: valid_from inclusive, valid_to exclusive),
    before the first version, after a delete, and on keys with no
    history. The SCD2 invariant guarantees at most one match per probe."""
    from cdc_streaming_pipeline_spark.operators.cdc import scd2_history
    from cdc_streaming_pipeline_spark.operators.joins import pit_join

    rows = [
        (key, op, val, (i + 1) * 10)  # lsn = 10, 20, ... (strictly increasing)
        for i, (key, op, val) in enumerate(events)
    ]
    log = spark.createDataFrame(rows, "id long, _op string, val long, lsn long")
    dim = scd2_history(log, key_cols=["id"], order_col="lsn").select(
        "id", "val", "valid_from", "valid_to"
    )

    # python twin of scd2_history: per key, each non-delete opens a version,
    # the next event (any op) closes it
    versions = {}
    per_key = {}
    for key, op, val, lsn in rows:
        per_key.setdefault(key, []).append((lsn, op, val))
    for key, evs in per_key.items():
        for i, (lsn, op, val) in enumerate(evs):
            if op == "d":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            versions.setdefault(key, []).append((lsn, nxt, val))

    # probes: every boundary, mid-interval, before-first, and a key with
    # no events at all (0); duplicates across keys are fine
    max_key = max(r[0] for r in rows)
    probes = []
    fid = 0
    for key in range(0, max_key + 2):
        for t in {5} | {lsn for _, _, _, lsn in rows} | {
            lsn + 5 for _, _, _, lsn in rows
        }:
            fid += 1
            probes.append((fid, key, t))
    fact = spark.createDataFrame(probes, "fid long, key long, probe long")

    got = {
        r.fid: (r.val, r.valid_from, r.valid_to)
        for r in pit_join(fact, dim, "key", "id", "probe").collect()
    }
    assert len(got) == len(probes)  # left join: every probe survives, once

    for fid_, key, t in probes:
        match = [
            (val, vf, vt)
            for vf, vt, val in versions.get(key, [])
            if vf <= t and (vt is None or t < vt)
        ]
        assert len(match) <= 1  # SCD2 non-overlap
        want = match[0] if match else (None, None, None)
        assert got[fid_] == want, (fid_, key, t)


@st.composite
def _two_snapshots(draw):
    """Random old/new table states over a shared key pool, with nulls in
    compare columns (the null-safe-equality trap)."""
    keys = draw(st.integers(min_value=1, max_value=12))
    val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
    old = {
        k: (draw(val), draw(val))
        for k in range(1, keys + 1)
        if draw(st.booleans())
    }
    new = {
        k: (draw(val), draw(val))
        for k in range(1, keys + 1)
        if draw(st.booleans())
    }
    return old, new


@settings(max_examples=10, deadline=None)
@given(snaps=_two_snapshots())
def test_snapshot_diff_matches_python_set_diff(spark, snaps):
    """snapshot_diff == the dict-based diff: keys only in new -> 'c',
    only in old -> 'd', in both with any null-safe-unequal column -> 'u',
    identical rows emit nothing; emitted images are the NEW side."""
    from cdc_streaming_pipeline_spark.operators.cdc import snapshot_diff

    old, new = snaps
    schema = "id long, a long, b long"
    old_df = spark.createDataFrame([(k, *v) for k, v in old.items()], schema)
    new_df = spark.createDataFrame([(k, *v) for k, v in new.items()], schema)

    got = {
        r.id: (r._op, r.a, r.b)
        for r in snapshot_diff(old_df, new_df, ["id"], ["a", "b"]).collect()
    }

    want = {}
    for k in set(old) | set(new):
        if k not in old:
            want[k] = ("c", *new[k])
        elif k not in new:
            want[k] = ("d", None, None)
        elif old[k] != new[k]:
            want[k] = ("u", *new[k])
    assert got == want


@st.composite
def _skewed_stream(draw):
    """Value stream with a few hot items + noise tail, in random order
    (MG survivors are order-dependent; the recount must erase that)."""
    n_hot = draw(st.integers(min_value=1, max_value=3))
    stream = []
    for h in range(n_hot):
        stream += [1000 + h] * draw(st.integers(min_value=20, max_value=40))
    n_noise = draw(st.integers(min_value=0, max_value=120))
    stream += [draw(st.integers(min_value=0, max_value=500)) for _ in range(n_noise)]
    perm = draw(st.permutations(range(len(stream))))
    return [stream[i] for i in perm]


@settings(max_examples=10, deadline=None)
@given(stream=_skewed_stream(), k=st.sampled_from([8, 16]))
def test_heavy_hitters_equal_full_groupby_for_any_order(spark, stream, k):
    """MG shortlist + exact recount == the full-groupBy answer at the
    n/k threshold, for ANY arrival order and partition split — the
    superset guarantee proven in operators/freq.py."""
    from collections import Counter

    from cdc_streaming_pipeline_spark.operators.freq import (
        heavy_hitters,
        mg_candidates,
    )

    df = spark.createDataFrame([(v,) for v in stream], "key long").repartition(4)
    n = len(stream)
    thresh = n // k + 1  # strictly > n/k: the bound the MG union covers
    got = {
        (r.key, r.n_occurrences)
        for r in heavy_hitters(df, "key", min_count=thresh, k=k).collect()
    }
    want = {(v, c) for v, c in Counter(stream).items() if c >= thresh}
    assert got == want
    # candidate set stays bounded by k x partitions
    assert mg_candidates(df, "key", k=k).count() <= k * 4


def test_connected_components_deep_diameter_crosses_truncation_switch(spark):
    """A 3000-node path graph needs ~log2(3000) ≈ 12 pointer-jumping
    rounds — past the round-8 hybrid switch where the distributed path
    hard-truncates lineage (the Dataset-checkpoint-chain explosion,
    operators/graph.py:_truncate_lineage). Must stay correct AND fast:
    one component labeled by node 0."""
    import time

    from cdc_streaming_pipeline_spark.operators.cluster import connected_components

    n = 3000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.range(n).withColumnRenamed("id", "vec_id")
    t0 = time.time()
    out = connected_components(edges, nodes, driver_threshold_edges=-1)
    labels = {r.vec_id: r.cluster_id for r in out.collect()}
    wall = time.time() - t0
    assert labels == {i: 0 for i in range(n)}
    assert wall < 120, f"deep pointer jumping took {wall:.0f}s — chain explosion?"


@settings(max_examples=10, deadline=None)
@given(
    deltas=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ).map(lambda x: round(x, 2)),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_clamped_balance_maxplus_identity(spark, deltas):
    """plans/events.py:user_balance_clamped rests on the max-plus
    identity bal_n = S_n − min(0, min_k S_k) and 'clamps fire at strict
    new minima of S below zero' — property-checked here against the
    LITERAL sequential recurrence bal_i = max(0, bal_{i-1} + delta_i)
    over arbitrary signed flows, so the window formulation can never
    silently drift from the semantics it claims."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (u, i, float(d))
        for u, ds in enumerate(deltas)
        for i, d in enumerate(ds)
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, delta double")
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = df.withColumn("s", F.sum("delta").over(w)).withColumn(
        "prev_min", F.min("s").over(wprev)
    )
    clamped = (F.col("s") < 0) & (
        F.col("prev_min").isNull() | (F.col("s") < F.col("prev_min"))
    )
    got = {
        r["user_id"]: (round(r["bal"], 6), r["n_clamped"])
        for r in stepped.groupBy("user_id")
        .agg(
            (F.sum("delta") - F.least(F.lit(0.0), F.min("s"))).alias("bal"),
            F.sum(clamped.cast("int")).alias("n_clamped"),
        )
        .collect()
    }
    for u, ds in enumerate(deltas):
        bal, clamps = 0.0, 0
        for d in ds:
            bal = bal + d
            if bal < 0:
                bal = 0.0
                clamps += 1
        # the identity's balance uses the UNCLAMPED running sum, so the
        # float paths differ in op order — compare at 1e-6
        g_bal, g_clamps = got[u]
        assert abs(g_bal - bal) < 1e-6, (u, ds, got[u], bal)
        assert g_clamps == clamps, (u, ds, got[u], clamps)
