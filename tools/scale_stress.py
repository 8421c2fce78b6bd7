"""Dup-heavy scale stress: replicate the sf0.1 corpus Nx and measure how
the heavy operators scale (the local[32] proxy for "would this hold at
100 TB" — see .benchmarks/SCALE10_r6.md for the round-6 10x reading).

Every document is replicated with one distinguishing suffix token per
copy, so the corpus becomes 100% N-way near-duplicated — the worst-case
profile for dedup operators, whose cost must track OUTPUT pair volume
(bounded by true corpus structure), never input^2.

Usage: python tools/scale_stress.py [multiplicity] [out_dir] [query ...]
Defaults: multiplicity 10, out_dir /tmp/scale{N}, the heavy-query list.
Emits one line per query: name, base seconds/rows, Nx seconds/rows.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

HEAVY = [
    "dedup_documents_exact",
    "simhash_near_dup_pairs",
    "embedding_near_dup_blocked",
    "near_dup_clusters",
    "doc_boilerplate",
    "doc_novelty",
    "vocab_coverage",
    "doc_tfidf_top_terms",
    "user_sessions",
    "pack_documents",
    "ann_topk_bruteforce",
    "minhash_dedup_pairs",
    "source_overlap",
    "ngram_jaccard_pairs",
    "embedding_near_dup_lsh",
    "dedup_span_removal",
    "doc_chunks",
    "dedup_incremental_batch",
    "corpus_shard_assignment",
    "doc_quality_logit",
    "semantic_dedup",
    "media_phash_pairs",
    "theta_user_overlap",
    "kll_value_rollup",
    "validate_referential_integrity",
    "minhash_dedup_clusters",
    "doc_compression_ratio",
    "doc_clean_text",
    "event_rate_anomaly",
]


def build_corpus(mult: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id * {mult} + c.i AS doc_id,
                 d.text || ' copyvariant' || c.i::VARCHAR AS text,
                 d.lang, d.source, d.n_chars
          FROM '{BASE}/documents.parquet' d,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id * {mult} + c.i AS vec_id, e.embedding, e.label
          FROM '{BASE}/embeddings.parquet' e,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.event_id * {mult} + c.i AS event_id,
                 e.ts + to_microseconds((c.i * 97)::BIGINT) AS ts,
                 e.user_id * {mult} + c.i AS user_id, e.event_type, e.value, e.props
          FROM '{BASE}/events.parquet' e,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)
        """
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM '{BASE}/{t}.parquet') TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    argv = sys.argv[1:]
    mult = int(argv[0]) if argv else 10
    out_dir = argv[1] if len(argv) > 1 else f"/tmp/scale{mult}"
    names = argv[2:] or HEAVY

    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        print(f"building {mult}x corpus at {out_dir} ...", file=sys.stderr)
        build_corpus(mult, out_dir)

    from cdc_streaming_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("scale_stress")
    qs = entrymod.queries()
    print(f"{'query':32s} {'1x s':>8s} {'1x rows':>9s} {f'{mult}x s':>8s} {f'{mult}x rows':>10s}")
    for n in names:
        cells = []
        for sf_dir in (BASE, out_dir):
            t0 = time.perf_counter()
            rows = qs[n](spark, sf_dir).count()
            cells.append((time.perf_counter() - t0, rows))
        (b, rb), (g, rg) = cells
        print(f"{n:32s} {b:8.2f} {rb:9d} {g:8.2f} {rg:10d}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
