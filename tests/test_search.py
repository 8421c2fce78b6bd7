"""Inverted-index search (operators/search.py): partition-pruned serve
plan, AND/OR semantics, tf-idf scoring vs a hand computation."""

from __future__ import annotations

import math

import pytest

from cdc_streaming_pipeline_spark.operators.search import (
    search_topk,
    write_inverted_index,
)


@pytest.fixture()
def index(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "merge scan merge"),
            (2, "scan filter"),
            (3, "window sort"),
            (4, "merge filter scan"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    n = write_inverted_index(docs, path)
    assert n == 4
    return path


def test_or_query_scores_tfidf(spark, index):
    rows = search_topk(spark, index, ["merge", "scan"], k=10).collect()
    got = {r["doc_id"]: (r["n_terms_matched"], r["score"]) for r in rows}
    # df: merge=2, scan=3; N=4
    idf_m, idf_s = math.log(4 / 2), math.log(4 / 3)
    assert got[1] == (2, round(2 * idf_m + 1 * idf_s, 4))
    assert got[2] == (1, round(1 * idf_s, 4))
    assert got[4] == (2, round(1 * idf_m + 1 * idf_s, 4))
    assert 3 not in got


def test_and_mode_requires_every_term(spark, index):
    rows = search_topk(spark, index, ["merge", "scan", "filter"], mode="all").collect()
    assert [r["doc_id"] for r in rows] == [4]


def test_serve_plan_prunes_partitions(spark, index):
    df = search_topk(spark, index, ["merge"], k=5)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    # the bucket predicate must reach the partition level, not a post-scan filter
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in pf


def test_unknown_terms_empty_and_mode_validation(spark, index):
    assert search_topk(spark, index, ["zzzz"], k=5).count() == 0
    with pytest.raises(ValueError, match="any|all"):
        search_topk(spark, index, ["merge"], mode="phrase")


def test_bm25_scoring_and_length_normalization(spark, tmp_path):
    """BM25 hand-check: same tf, shorter doc scores higher (length
    normalization) and repeated terms saturate instead of scaling
    linearly."""
    docs = spark.createDataFrame(
        [
            (1, "merge alpha"),                      # short doc, tf=1
            (2, "merge alpha beta gamma delta eps"), # long doc, tf=1
            (3, "merge merge merge merge alpha"),    # tf=4
            (4, "other words"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    rows = search_topk(spark, path, ["merge"], ranking="bm25").collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == {1, 2, 3}
    assert got[1] > got[2]  # shorter doc wins at equal tf
    # saturation: tf=4 must score less than 4x the tf=1 short doc
    assert got[3] < 4 * got[1]
    assert got[3] > got[1]  # but still more than tf=1

    with pytest.raises(ValueError, match="tfidf|bm25"):
        search_topk(spark, path, ["merge"], ranking="cosine")


def test_phrase_search_positions(spark, tmp_path):
    from cdc_streaming_pipeline_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "hash join wins hash join"),   # 2 occurrences
            (2, "join hash"),                  # reversed: no match
            (3, "hash x join"),                # gap: no match
            (4, "hash join"),                  # 1 occurrence
            (5, "a a a"),                      # repeated-term phrase fodder
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    rows = phrase_search(spark, path, ["hash", "join"]).collect()
    got = {r["doc_id"]: r["n_occurrences"] for r in rows}
    assert got == {1: 2, 4: 1}
    # ranking: occurrences desc, doc_id asc
    assert [r["doc_id"] for r in rows] == [1, 4]
    # repeated-term phrase: "a a" occurs twice in "a a a"
    got2 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(spark, path, ["a", "a"]).collect()}
    assert got2 == {5: 2}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        phrase_search(spark, path, [])


def test_append_equals_full_rebuild(spark, tmp_path):
    """The append-ability certification: index half the corpus, append
    the other half -> every ranking (tf-idf, BM25, phrase) must equal
    the from-scratch full build, because df/N/avgdl are all recounted
    or additively maintained rather than frozen into the postings."""
    from cdc_streaming_pipeline_spark.operators.search import (
        append_to_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "merge scan merge filter"),
            (2, "scan filter hash join"),
            (3, "window sort hash join hash join"),
            (4, "merge filter scan scan"),
            (5, "merge hash join"),
            (6, "sort scan"),
        ],
        "doc_id bigint, text string",
    )
    full = str(tmp_path / "full")
    incr = str(tmp_path / "incr")
    write_inverted_index(docs, full)
    write_inverted_index(docs.filter("doc_id <= 3"), incr)
    n = append_to_index(docs.filter("doc_id > 3"), incr)
    assert n == 6

    for kwargs in ({"ranking": "tfidf"}, {"ranking": "bm25"}, {"mode": "all"}):
        a = search_topk(spark, full, ["merge", "scan"], **kwargs).collect()
        b = search_topk(spark, incr, ["merge", "scan"], **kwargs).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], kwargs
    pa = phrase_search(spark, full, ["hash", "join"]).collect()
    pb = phrase_search(spark, incr, ["hash", "join"]).collect()
    assert [tuple(r) for r in pa] == [tuple(r) for r in pb]


def test_delete_then_readd_serves_new_version(spark, tmp_path):
    """The tombstone layer's certification: delete -> the doc vanishes
    from every ranking AND from df/N/avgdl; re-add under a higher
    generation -> search serves exactly the NEW version, and the whole
    end state equals a from-scratch build of the final corpus."""
    from cdc_streaming_pipeline_spark.operators.search import (
        append_to_index,
        delete_from_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "merge scan merge filter"),
            (2, "scan filter hash join"),
            (3, "window sort hash join hash join"),
            (4, "merge filter scan scan"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)

    # delete doc 2: gone from rankings, df recount excludes it
    assert delete_from_index(spark, path, [2]) == 1
    hits = {r["doc_id"] for r in search_topk(spark, path, ["scan", "hash"], k=10).collect()}
    assert 2 not in hits and 3 in hits
    # deleting an absent id is a no-op
    assert delete_from_index(spark, path, [2]) == 0
    assert delete_from_index(spark, path, [99]) == 0

    # phrase search respects tombstones too
    ph = {r["doc_id"] for r in phrase_search(spark, path, ["hash", "join"]).collect()}
    assert ph == {3}

    # re-add doc 2 with NEW text (the update path)
    new2 = spark.createDataFrame([(2, "merge merge merge")], "doc_id bigint, text string")
    assert append_to_index(new2, path) == 4

    # end state must equal a from-scratch index of the final corpus —
    # scores included (df/N/avgdl all reflect the post-update corpus)
    final_docs = docs.filter("doc_id <> 2").unionByName(new2)
    fresh = str(tmp_path / "fresh")
    write_inverted_index(final_docs, fresh)
    for kwargs in ({"ranking": "tfidf"}, {"ranking": "bm25"}, {"mode": "all"}):
        a = search_topk(spark, fresh, ["merge", "scan"], **kwargs).collect()
        b = search_topk(spark, path, ["merge", "scan"], **kwargs).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], kwargs
    pa = phrase_search(spark, fresh, ["hash", "join"]).collect()
    pb = phrase_search(spark, path, ["hash", "join"]).collect()
    assert [tuple(r) for r in pa] == [tuple(r) for r in pb]


def test_delete_from_index_accepts_ids_dataframe(spark, tmp_path):
    """r14 verdict wrong #2: predicate-driven deletion must stay
    distributed — delete_from_index takes an ids DataFrame (first
    column = ids, any name) and the result matches the list form."""
    from cdc_streaming_pipeline_spark.operators.search import delete_from_index

    docs = spark.createDataFrame(
        [(i, f"body {'even' if i % 2 == 0 else 'odd'} term{i}") for i in range(10)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx_df")
    write_inverted_index(docs, path)

    cohort = docs.filter("doc_id % 2 = 0").selectExpr("doc_id AS victim")
    assert delete_from_index(spark, path, cohort) == 5
    hits = {r["doc_id"] for r in search_topk(spark, path, ["even", "odd"], k=20).collect()}
    assert hits == {1, 3, 5, 7, 9}
    # absent ids (already deleted) no-op in the DataFrame form too
    assert delete_from_index(spark, path, cohort) == 0


def test_torn_delete_self_heals(spark, tmp_path):
    """ADVICE r9: delete_from_index's two sidecar writes are not atomic —
    a crash AFTER the tombstone append (the commit point) but BEFORE the
    stats overwrite used to leave n_docs/total_len overstated forever,
    silently skewing BM25/tf-idf avgdl and idf. The stats row now
    records the tombstone-listing fingerprint it was computed against;
    a mismatch triggers a recompute from the doclens sidecar masked by
    tombstones. Simulate the torn delete, then assert scores equal a
    from-scratch index of the post-delete corpus."""
    from cdc_streaming_pipeline_spark.operators.search import (
        _read_stats,
        _tombstones_path,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "merge scan merge filter"),
            (2, "scan filter hash join"),
            (3, "window sort hash join hash join"),
            (4, "merge filter scan scan"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)

    # torn delete of doc 3: tombstone lands, stats write "crashes"
    spark.createDataFrame([(3, 0)], "doc_id long, gen int").write.mode(
        "append"
    ).parquet(_tombstones_path(path))

    # next read detects the fingerprint mismatch and recomputes truth
    stats = _read_stats(spark, path)
    assert stats["n_docs"] == 3 and stats["total_len"] == 4 + 4 + 4

    # scores equal a from-scratch index of the surviving corpus
    fresh = str(tmp_path / "fresh")
    write_inverted_index(docs.filter("doc_id <> 3"), fresh)
    for kwargs in ({"ranking": "tfidf"}, {"ranking": "bm25"}):
        a = search_topk(spark, fresh, ["scan", "hash"], **kwargs).collect()
        b = search_topk(spark, path, ["scan", "hash"], **kwargs).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], kwargs

    # the heal rewrote the cache: a second read takes the fast path and
    # agrees
    stats2 = _read_stats(spark, path)
    assert (stats2["n_docs"], stats2["total_len"]) == (3, 12)


def test_tombstone_landing_mid_heal_invalidates_again(spark, tmp_path):
    """ADVICE r10: the heal must stamp the stats row with the tombstone
    listing it AGGREGATED against, not the listing at write time — a
    tombstone landing between the heal's collect() and its stats write
    would otherwise be vouched for by stale numbers and the cache stays
    poisoned until tombstones change again. Simulate the interleaving
    by injecting the second delete inside the heal's aggregate path and
    assert the NEXT read still detects a mismatch and converges to the
    true post-both-deletes scalars."""
    import cdc_streaming_pipeline_spark.operators.search as search_mod
    from cdc_streaming_pipeline_spark.operators.search import (
        _read_stats,
        _tombstones_path,
    )

    docs = spark.createDataFrame(
        [
            (1, "merge scan merge filter"),
            (2, "scan filter hash join"),
            (3, "window sort hash join hash join"),
            (4, "merge filter scan scan"),
        ],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)

    # torn delete of doc 3: tombstone lands, stats write "crashes"
    spark.createDataFrame([(3, 0)], "doc_id long, gen int").write.mode(
        "append"
    ).parquet(_tombstones_path(path))

    # inject a CONCURRENT delete of doc 1 inside the heal: _live is
    # called exactly once per heal, after the fingerprint capture and
    # before the aggregate collect lands its result in the stats row
    orig_live = search_mod._live
    state = {"fired": False}

    def live_with_racing_delete(sp, p, rows):
        out = orig_live(sp, p, rows)
        if not state["fired"]:
            state["fired"] = True
            sp.createDataFrame([(1, 0)], "doc_id long, gen int").write.mode(
                "append"
            ).parquet(_tombstones_path(p))
        return out

    search_mod._live = live_with_racing_delete
    try:
        healed = _read_stats(spark, path)
    finally:
        search_mod._live = orig_live
    # the heal's answer reflects SOME consistent prefix; what matters is
    # that its fingerprint ties it to the listing it aggregated against,
    # so the next read sees the newer tombstone set and re-heals
    final = _read_stats(spark, path)
    assert (final["n_docs"], final["total_len"]) == (2, 4 + 4), (
        healed["n_docs"],
        final["n_docs"],
    )
