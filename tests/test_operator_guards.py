"""Misuse guards: operators whose silent failure mode is wrong DATA (not
an error) must refuse up front."""

from __future__ import annotations

import pytest


def test_salted_join_rejects_right_preserving_modes(spark):
    from cdc_streaming_pipeline_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(2, "b")], "k long, w string")
    for how in ("right", "right_outer", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, "k", "k", n_salts=4, how=how)
    # left-preserving modes pass validation and keep unmatched rows intact
    got = salted_join(left, right, "k", "k", n_salts=4, how="left").collect()
    assert len(got) == 1


def test_connected_components_rejects_non_integral_ids(spark):
    from cdc_streaming_pipeline_spark.operators.cluster import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([("x",), ("y",)], "name string")
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges, nodes, id_col="name")


def test_connected_components_raises_on_non_convergence(spark):
    from cdc_streaming_pipeline_spark.operators.cluster import connected_components

    # a path graph long enough that 1 round cannot converge; force the
    # distributed loop (the driver union-find path has no round limit)
    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], "id_a long, id_b long")
    nodes = spark.range(7).withColumnRenamed("id", "vec_id")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_iters=1, driver_threshold_edges=-1)


def test_connected_components_paths_agree(spark):
    """Driver union-find fast path == distributed label-propagation path
    on a mixed graph (chain + triangle + singletons)."""
    from cdc_streaming_pipeline_spark.operators.cluster import connected_components

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)]
    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "vec_id long"
    )
    fast = {r.vec_id: r.cluster_id for r in connected_components(edges, nodes).collect()}
    dist = {
        r.vec_id: r.cluster_id
        for r in connected_components(
            edges, nodes, driver_threshold_edges=-1
        ).collect()
    }
    assert fast == dist
    assert fast[4] == 1 and fast[12] == 10 and fast[21] == 20 and fast[99] == 99


def test_auto_lsh_params_warns_on_unreachable_recall():
    from cdc_streaming_pipeline_spark.operators.similarity import _auto_lsh_params

    with pytest.warns(UserWarning, match="cannot be pruned"):
        bits, tables = _auto_lsh_params(0.0, target_recall=0.999, max_tables=2)
    assert (bits, tables) == (4, 2)
    # and the selective regime stays warning-free
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _auto_lsh_params(0.95)[0] >= 10


def test_repetition_stats_edges(spark):
    from cdc_streaming_pipeline_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame(
        [
            (1, ""),                       # empty -> all zeros
            (2, "spam spam spam spam"),    # one token repeated
            (3, "a b a b a b"),            # one bigram family
            (4, "all words are unique"),   # no repetition
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert (got[1].n_tokens, got[1].dup_token_frac, got[1].top_bigram_frac) == (0, 0.0, 0.0)
    assert got[2].dup_token_frac == 0.75          # 1 distinct of 4
    assert got[2].top_bigram_frac == 1.0          # "spam spam" fills all 3 slots
    assert got[3].dup_token_frac == round(1 - 2 / 6, 4)
    assert got[3].top_bigram_frac == 0.6          # "a b" occupies 3 of 5 slots
    assert got[4].dup_token_frac == 0.0 and got[4].top_bigram_frac == round(1 / 3, 4)
