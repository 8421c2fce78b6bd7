"""Distributed BPE trainer vs an exact pure-Python twin.

The Spark trainer (operators/bpe.py) must produce the IDENTICAL merge
table — same pairs, same order, same frequencies — as a reference
implementation run on the collected word-frequency dict, because the
algorithm is a pure function of the corpus under the pinned tie-break
(freq DESC, left ASC, right ASC) and the pinned single-pass greedy
left-to-right merge-application semantics.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.bpe import (
    END_OF_WORD,
    segment_with_merges,
    train_bpe,
    word_frequency_table,
)
from tests.conftest import SF_DIR


def _py_initial(word):
    chars = list(word)
    chars[-1] = chars[-1] + END_OF_WORD
    return tuple(chars)


def _py_apply(toks, left, right):
    acc = []
    for x in toks:
        if acc and acc[-1] == left and x == right:
            acc[-1] = left + right
        else:
            acc.append(x)
    return tuple(acc)


def _py_train(word_freq, n_merges, min_pair_freq=2):
    seg = {w: _py_initial(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
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
        seg = {w: _py_apply(t, left, right) for w, t in seg.items()}
    return merges, seg


def test_bpe_merge_table_matches_python_reference_exactly(spark):
    from cdc_streaming_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wf = word_frequency_table(docs)
    word_freq = {r.word: r.freq for r in wf.collect()}
    assert len(word_freq) > 20  # the synthetic corpus is a small word-soup

    got = train_bpe(wf, n_merges=12)
    want, py_seg = _py_train(word_freq, n_merges=12)
    assert got == want
    assert len(got) == 12  # corpus is rich enough to reach the cap

    # segment replay: applying the learned table reproduces the python
    # twin's final segmentation for every word
    seg_rows = {
        r.word: tuple(r.toks) for r in segment_with_merges(wf, got).collect()
    }
    assert seg_rows == py_seg


def test_bpe_handles_single_char_words_and_early_stop(spark):
    df = spark.createDataFrame(
        [("a a a b",), ("a b",)], "text string"
    )
    wf = word_frequency_table(df)
    # words: 'a' x4, 'b' x2 -> all single-char (no pairs beyond the
    # char+</w> fusion, which IS the token) -> zero mergeable pairs
    merges = train_bpe(wf, n_merges=5)
    assert merges == []


def test_bpe_word_boundary_never_crossed(spark):
    df = spark.createDataFrame([("ab ab ab ba",)], "text string")
    wf = word_frequency_table(df)
    merges = train_bpe(wf, n_merges=10)
    # every learned merge stays inside a word: no merged symbol may
    # CONTAIN the end-of-word marker anywhere but its suffix
    for _, _, _, merged, _ in merges:
        inner = merged[: -len(END_OF_WORD)] if merged.endswith(END_OF_WORD) else merged
        assert END_OF_WORD not in inner


def test_bpe_token_counts_match_python_application(spark):
    """The corpus-wide serving path (broadcast vocab join) must agree
    with applying the python twin's final segmentation word-by-word."""
    import re

    from cdc_streaming_pipeline_spark.plans.docs import bpe_token_counts
    from cdc_streaming_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wf = word_frequency_table(docs)
    word_freq = {r.word: r.freq for r in wf.collect()}
    merges, py_seg = _py_train(word_freq, n_merges=24)

    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens) for r in
           bpe_token_counts(spark, SF_DIR).collect()}
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in re.split(r"\s+", row.text.strip().lower()) if w]
        want = (len(words), sum(len(py_seg[w]) for w in words))
        assert got[row.doc_id] == want, row.doc_id
