"""Pure-Python XXH64 (tools/py_oracles.py) vs Spark's xxhash64 — the
bit-exactness that turns the MinHash/SimHash/LSH family from rows-only
into oracle-certified. Pins the full type surface the replays use
(string/int/long, chained multi-column seeding) across hash-path edge
cases (empty input, 4-byte tail, 8-byte words, 32-byte stripes,
negative values, int32 boundaries)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from tools.py_oracles import spark_xxhash64, xxh64_bytes


def test_xxh64_known_vectors():
    # xxHash reference vectors (XSUM_XXH64 of ASCII inputs, seed 0):
    # published in the xxHash repository's test suite
    assert xxh64_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxh64_bytes(b"abc", 0) == 0x44BC2CF5AD770999


def test_matches_spark_across_types_and_lengths(spark):
    rng = random.Random(7)
    strings = [
        "",
        "a",
        "abc",
        "x" * 4,
        "x" * 7,
        "x" * 8,
        "y" * 31,
        "y" * 32,
        "z" * 33,
        "w" * 100,
        "the quick brown fox",
        "naïve café",  # multi-byte UTF-8
    ] + ["".join(rng.choices("abcdef ghij", k=rng.randrange(1, 50))) for _ in range(20)]
    ints = [0, 1, -1, 42, 2**31 - 1, -(2**31)] + [
        rng.randrange(-(2**31), 2**31) for _ in range(10)
    ]
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 2**40] + [
        rng.randrange(-(2**63), 2**63) for _ in range(10)
    ]
    n = max(len(strings), len(ints), len(longs))
    rows = [
        (strings[i % len(strings)], ints[i % len(ints)], longs[i % len(longs)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "s string, i int, l long")
    got = df.select(
        F.xxhash64("s").alias("hs"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", "i", "l").alias("chain"),
        F.xxhash64(F.lit(3), "l").alias("seeded"),
    ).collect()
    for (s, i, l), r in zip(rows, got):
        assert spark_xxhash64(s) == r["hs"], s
        assert spark_xxhash64(i) == r["hi"], i
        assert spark_xxhash64(("long", l)) == r["hl"], l
        assert spark_xxhash64(s, i, ("long", l)) == r["chain"]
        assert spark_xxhash64(3, ("long", l)) == r["seeded"]


def test_minhash_pair_replay_matches_spark_kernel(spark):
    """End-to-end micro-parity: the replay's shingle→sig→band→bucket
    chain equals the Spark operator's on a handcrafted corpus with known
    near-dups (catches tokenization/tie-break drift the hash test
    can't)."""
    import pandas as pd

    from cdc_streaming_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from tools.py_oracles import _minhash_pairs_core

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, ""),
        (6, "   "),
    ]
    got = (
        minhash_lsh_pairs(spark.createDataFrame(docs, "doc_id long, text string"))
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    want = pd.DataFrame(
        sorted(_minhash_pairs_core(docs, None)),
        columns=["id_a", "id_b", "jaccard"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
