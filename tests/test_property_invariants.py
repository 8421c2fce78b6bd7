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
