"""Perceptual-hash media dedup (operators/multimodal.py): the banded
pigeonhole join must return EXACTLY the brute-force all-pairs Hamming
truth (pigeonhole at Hamming ≤ 4 over 5 bands is lossless, so this is an
equality, not a recall floor), and the hash must behave perceptually —
identical payloads collide, small edits stay close, the cryptographic
content hash would not.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.multimodal import (
    _phash64,
    perceptual_hash,
    phash_near_dup_pairs,
    synthesize_media,
)
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_phash_pairs_equal_bruteforce_hamming_truth(spark):
    from cdc_streaming_pipeline_spark.plans.docs import media_phash_pairs

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in media_phash_pairs(spark, SF_DIR).collect()
    }
    from cdc_streaming_pipeline_spark.functions.textfn import normalize_ws

    docs = load_table(spark, SF_DIR, "documents")
    media = synthesize_media(docs.withColumn("text", normalize_ws(F.col("text"))))
    reencodes = media.filter(F.col("media_id") % 10 == 0).withColumn(
        "media_id", F.col("media_id") + F.lit(1_000_000_000)
    )
    hashes = {
        r.media_id: r.phash
        for r in perceptual_hash(
            media.unionByName(reencodes), deterministic_fake=True
        ).collect()
    }
    ids = sorted(hashes)
    want = {}
    vals = np.array([hashes[i] for i in ids], dtype=np.int64).view(np.uint64)
    for i in range(len(ids)):
        ham = np.array(
            [bin(int(vals[i] ^ vals[j])).count("1") for j in range(i + 1, len(ids))]
        )
        for off in np.nonzero(ham <= 4)[0]:
            want[(ids[i], ids[i + 1 + int(off)])] = int(ham[off])
    # equality holds whether or not the corpus has close pairs at this SF
    # (sf0.001/0.01 have none — their near-dups are shingle-level word
    # swaps, far apart in byte-raster space; sf0.1 has 8 exact groups);
    # positive pairs are gated on the controlled frame below
    assert got == want


def test_phash_pairs_positive_on_known_duplicates(spark):
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(200)]
    base = (" ".join(rng.choice(words, 300))).encode()
    rows = [
        (1, "image", base),
        (2, "image", bytes(base)),                            # exact dup of 1
        (3, "image", base.replace(b"w5", b"w7", 3)),          # in-place edit
        (4, "image", bytes(np.random.default_rng(3).bytes(len(base)))),  # unrelated
    ]
    media = spark.createDataFrame(
        [(i, k, bytearray(p)) for i, k, p in rows],
        "media_id long, kind string, media_bytes binary",
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(media, max_hamming=4, deterministic_fake=True).collect()
    }
    assert got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] <= 4
    assert not any(4 in pair for pair in got)


def test_phash_is_perceptual_not_cryptographic(spark):
    rng = np.random.default_rng(1)
    words = [f"tok{i}" for i in range(300)]
    base = (" ".join(rng.choice(words, 400))).encode()
    same = _phash64(base)
    assert same == _phash64(bytes(base))  # deterministic
    # same-length in-place edits stay within a few bits (a sha256 of the
    # same pair would differ in ~32 of 64 bits)
    edited = _phash64(base.replace(b"tok9", b"tok3", 4))
    ham_edit = bin((np.uint64(same) ^ np.uint64(edited)).item()).count("1")
    assert ham_edit <= 4
    # an unrelated payload is far
    other = _phash64(np.random.default_rng(7).bytes(len(base)))
    ham_other = bin((np.uint64(same) ^ np.uint64(other)).item()).count("1")
    assert ham_other > 8


def test_phash_real_decode_path_is_marked_stub(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = synthesize_media(docs)
    try:
        perceptual_hash(media, deterministic_fake=False)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_batched_kernel_bit_identical_to_scalar_reference(spark):
    """The einsum-batched hash path must equal the scalar _phash64
    reference for every corpus payload (median/threshold/pack parity)."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    media = synthesize_media(docs)
    got = {
        r.media_id: r.phash
        for r in perceptual_hash(media, deterministic_fake=True).collect()
    }
    for r in media.select("media_id", "media_bytes").collect():
        assert got[r.media_id] == _phash64(bytes(r.media_bytes)), r.media_id
