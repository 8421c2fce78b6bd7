#!/usr/bin/env python
"""Build a synthetic sf1-scale replica of /root/testdata/sf0.1 (10x) and
time a headline query subset on it — the r15/r16 verdicts' "one-scale-up
evidence" item: do the engine's width/fan-out choices survive 10x?

Scaling scheme (deterministic, key-consistent):
- orders:   o_orderkey*10+i (i in 0..9), other columns verbatim — each
  customer now owns 10x orders (a mild, realistic skew increase).
- lineitem: l_orderkey*10+i — FK to orders preserved; part/supp keys
  verbatim (the supplier-part co-occurrence graph keeps its distinct
  edge set, so graph queries scale in INPUT volume, not edges; noted in
  the writeup).
- documents/embeddings/events: the scale_stress 10x replication
  (distinct ids, one suffix token per document copy).
- dimensions (region nation customer supplier part): verbatim — fuzzy
  /entity queries therefore do NOT scale here (scaling names 10x would
  square their match volume, a different workload).

This is NOT the driver's sf1 (no such directory exists in the sandbox);
it is the local 10x proxy, same spirit as tools/scale_stress.py but
fact-table-scaled. Timing only — no oracle at this scale.

Usage: python tools/sf1_build.py [out_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q7_volume_shipping",
    "q18_large_orders",
    "grouping_sets_revenue",
    "top_orders_per_segment",
    "lineitem_spearman",
    "lineitem_price_equidepth_bands",
    "cdc_latest_state",
    "cdc_scd2_history",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "near_dup_clusters",
    "dedup_documents_exact",
    "doc_tfidf_top_terms",
    "source_overlap",
    "ann_topk_ivf_pq",
    "ann_topk_ivf",
    "part_bargain_skyline",
    "user_sessions",
]


def build(out_dir: str, mult: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT o.o_orderkey * {mult} + c.i AS o_orderkey,
                 o.* EXCLUDE (o_orderkey)
          FROM '{BASE}/orders.parquet' o,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT l.l_orderkey * {mult} + c.i AS l_orderkey,
                 l.* EXCLUDE (l_orderkey)
          FROM '{BASE}/lineitem.parquet' l,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)
        """
    )
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
                 e.user_id, e.event_type, e.value, e.props
          FROM '{BASE}/events.parquet' e,
               (SELECT unnest(range({mult})) AS i) c
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 131072)
        """
    )
    for t in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"COPY (SELECT * FROM '{BASE}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    argv = sys.argv[1:]
    out_dir = argv[0] if argv else "/tmp/sf1synth"
    names = argv[1:] or HEADLINE

    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        print(f"building 10x fact-scaled replica at {out_dir} ...", file=sys.stderr)
        build(out_dir)

    from cdc_streaming_pipeline_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "sf1_bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()
    print(f"{'query':34s} {'sf0.1 s':>8s} {'10x s':>8s} {'ratio':>6s}")
    for n in names:
        cells = []
        for sf_dir in (BASE, out_dir):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            cells.append(time.perf_counter() - t0)
        b, g = cells
        print(f"{n:34s} {b:8.2f} {g:8.2f} {g / b:6.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
