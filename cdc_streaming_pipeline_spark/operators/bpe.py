"""Distributed BPE (byte-pair-encoding) vocabulary induction — tokenizer
training as a Spark job.

The reference pipeline stops at landing text; a training-data platform also
has to TRAIN the tokenizer on the corpus it curated. BPE's structure maps
cleanly onto Spark's execution model when split into its two real phases:

1. **Corpus pass (the only 100 TB-sized job)**: count distinct words.
   BPE training operates on the word-frequency table, not the corpus —
   the standard industrial reduction (Sennrich et al. 2016 trains on a
   dict of word counts). 100 TB of text collapses to at most a few
   million (word, freq) rows: one explode + one shuffle, then the
   iterative phase never touches the corpus again.
2. **Merge loop (small, iterative)**: each round counts adjacent-pair
   frequencies over the CURRENT segmentation (frequency-weighted),
   picks the global argmax (one 1-row collect per round — the only
   driver traffic), and rewrites segmentations with a pure-JVM
   higher-order fold. The working set is the word table, cached;
   lineage is cut with localCheckpoint every few rounds so the plan
   doesn't grow linearly with merge count.

Merge application semantics (pinned, and mirrored bit-for-bit by the
pure-Python twin in tests/test_bpe.py): a single greedy left-to-right
pass per rule — fold tokens left to right, merging whenever the
accumulator's last token equals the rule's left and the incoming ORIGINAL
token equals the rule's right; a token produced by a merge can serve as
the LEFT of the next position but never as the right. Ties in pair
frequency break on (left ASC, right ASC), so the learned merge table is
a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus pass: (word, freq) over whitespace-split lowercased
    words. One explode + one shuffle; everything downstream runs on this
    compressed table."""
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def _initial_segmentation(word_freq: DataFrame) -> DataFrame:
    """Split each word into characters, with the end-of-word marker fused
    onto the final character (the Sennrich convention: word-final units
    are distinct symbols, so merges can't leak across word boundaries)."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    toks = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_OF_WORD))),
    )
    return word_freq.select("word", "freq", toks.alias("toks"))


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over current segmentations
    (pairs via two shifted slices zipped — no Python, no UDF)."""
    n = F.size("toks")
    pairs = F.arrays_zip(
        F.slice("toks", 1, n - 1).alias("left"),
        F.slice("toks", 2, n - 1).alias("right"),
    )
    return (
        seg.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def _apply_merge(seg: DataFrame, left: str, right: str) -> DataFrame:
    """One greedy left-to-right merge pass as a JVM fold (F.aggregate):
    constant memory per row, no Python workers."""
    merged = left + right
    new_toks = F.aggregate(
        "toks",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return seg.select("word", "freq", new_toks.alias("toks"))


def train_bpe(
    word_freq: DataFrame,
    n_merges: int = 30,
    min_pair_freq: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[int, str, str, str, int]]:
    """Learn up to ``n_merges`` merges; returns
    [(rank, left, right, merged, pair_freq)]. Stops early when no pair
    reaches ``min_pair_freq``. Each round is one small job over the cached
    word table + a 1-row collect; localCheckpoint every
    ``checkpoint_every`` rounds bounds lineage depth."""
    # One Spark job per round (the 1-row argmax collect). The un-collected
    # segmentation stays LAZY between rounds — on the compressed word table
    # re-evaluating a few stacked folds is far cheaper than a
    # materialization job per round — and localCheckpoint every
    # ``checkpoint_every`` rounds caps both lineage depth and re-eval cost.
    seg = _initial_segmentation(word_freq).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(seg)
            .orderBy(
                F.col("pair_freq").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_freq"] < min_pair_freq:
            break
        left, right, pf = best[0]["left"], best[0]["right"], best[0]["pair_freq"]
        merges.append((rank, left, right, left + right, int(pf)))
        seg = _apply_merge(seg, left, right)
        if (rank + 1) % checkpoint_every == 0:
            seg = seg.localCheckpoint(eager=True)
    return merges


def segment_with_merges(
    word_freq: DataFrame, merges: list[tuple[int, str, str, str, int]]
) -> DataFrame:
    """Apply a learned merge table to a word table (the tokenizer's
    'encode' over the training vocabulary): same fold, replayed in rank
    order. Returns (word, freq, toks)."""
    seg = _initial_segmentation(word_freq)
    for _, left, right, _, _ in merges:
        seg = _apply_merge(seg, left, right)
    return seg
