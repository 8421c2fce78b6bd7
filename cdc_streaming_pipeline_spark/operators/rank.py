"""Exact global ranks, cumulative sums, and NTILE without a global sort.

``Window.orderBy(...)`` with no ``partitionBy`` funnels the ENTIRE frame
through one task (Spark warns ``WindowExec: No Partition Defined``) —
fine for a 12-row monthly series, serial death for a 10^9-entity frame.
This module provides the scale path with UNCHANGED semantics:

1. One pass computes ``percentile_approx`` cutoffs over each ranking
   key (a mergeable sketch; all keys share ONE aggregate). The cutoff
   row is collected ONCE on the driver — bounded by
   ``len(specs)·(n_buckets-1)`` doubles — and inlined as literal
   arrays, so every consuming job buckets against identical values
   (the sketch's merge result is shuffle-order-dependent; left as
   lineage, two jobs could disagree on boundary buckets).
2. Every row is assigned a range bucket per key by comparing the key
   against its cutoffs — a pure JVM higher-order function, no shuffle.
   Sketch error only skews bucket SIZES, never correctness: all rows of
   bucket b sort strictly before bucket b+1 (boundary ties are confined
   to one bucket because the comparison is strict).
3. Per-bucket windows (max task = rows/n_buckets) produce local
   row_numbers / prefix sums; a ≤ n_buckets-row aggregate per key
   produces exclusive cross-bucket offsets via a bounded self-crossJoin
   conditional aggregate (≤ n_buckets² pairs — bounded by the PARAMETER,
   never the data, and deliberately not an unpartitioned window so
   "WindowExec: No Partition Defined" stays a true scale lint).
   local + offset = exact global rank / cumsum, identical to the
   single-task result.

Multiple ranking keys over the same frame (e.g. RFM's three quartiles)
go through ONE call: the shared cutoff row and shared bucketed frame
keep every branch's subplan identical below the input's last shuffle,
so Spark's exchange reuse scans and aggregates the input once —
separate calls would prune columns differently per pass, defeat reuse,
and recompute the input lineage per key (measured 11x at sf0.1).

NTILE(k) falls out arithmetically: the SQL-standard NTILE over n rows
puts rank r in bucket ``(r-1)*k div n + 1`` (larger buckets first) —
integer arithmetic, bit-identical to any engine's NTILE, which is why
the DuckDB oracles of the queries built on this module keep their plain
``ntile(...) OVER (ORDER BY ...)`` formulation and stay hash-green.

Skew note: a single key value repeated ≫ n/n_buckets times bottlenecks
its one bucket. The tiebreak column does not help (cutoffs are over the
leading key only); the escape hatch for a known-degenerate key is to
raise ``n_buckets`` or pre-aggregate. For spend/revenue/recency frames
keyed by unique entities, ties are incidental and buckets stay balanced.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK = "_g_rank"
_CUM = "_g_cum"
_N = "_g_n"
_TOT = "_g_total"


@dataclass(frozen=True)
class RankSpec:
    """One ranking over the frame: order by (key asc/desc, tiebreak asc);
    ``rank_col`` receives the exact global row_number. ``value_col``
    additionally emits the exact running sum of that column in the same
    order into ``cum_col`` (and the grand total into ``total_col``)."""

    key: str
    ascending: bool = True
    rank_col: str = _RANK
    value_col: str | None = None
    cum_col: str = _CUM
    total_col: str = _TOT


def with_global_ranks(
    df: DataFrame,
    specs: list[RankSpec],
    tiebreak: str,
    n_buckets: int = 64,
    n_col: str = _N,
    materialize_input: bool = True,
    bucket_impl: str = "fold",
) -> DataFrame:
    """Add every spec's exact global rank (and optional running sum) to
    ``df``, plus the frame's total row count in ``n_col`` — distributed
    per the module docstring; no unpartitioned window anywhere.

    ``tiebreak`` must be unique per row (the usual entity key) so each
    order — and therefore every rank — is total and deterministic.
    Every ``spec.key`` must be non-null: a NULL key would fall in bucket
    0 under either direction (the cutoff comparison is null), which
    matches Spark's NULLS FIRST only for ascending order. The callers
    here rank aggregate outputs (sums/counts), non-null by construction.

    ``bucket_impl`` picks the per-row bucket-assignment expression; both
    produce IDENTICAL bucket ids for NON-NULL keys (first-match index
    over a sorted cutoff array == the strict-compare count; NaN orders
    largest either way). On a NULL key they DIVERGE — the fold yields a
    NULL bucket (null propagates through the accumulator) while the
    chain's ``otherwise`` assigns n_cuts (ascending) or 0 (descending) —
    which is why the non-null-key requirement above is part of the
    operator contract, not merely a convention (r16 ADVICE):

    - ``"chain"`` — one flat literal CASE WHEN chain per spec: shallow
      CaseWhen node, codegen'd branch-predictable comparisons with early
      exit. The per-ROW winner; pass it when the ranked frame is
      fact-scan-scale (interleaved A/B at sf0.1, min of 3:
      lineitem_spearman 9.29→3.49 s, equidepth bands 3.68→1.92 s).
    - ``"fold"`` (default) — the higher-order aggregate-fold over a
      literal array: a single compact expression node. The per-ACTION
      winner: the operator triggers 3 actions, and Catalyst re-walks
      every bucket expression (specs × consumers × 64 branches for the
      chain) on each; on bounded aggregate frames that planning cost
      dominates row work (chain measured +0.17..0.54 s per query on the
      RFM/deciles/drift family with execution-stage walls identical).

    The crossover is ~1M input rows per spec at this host's ~0.1 s per
    extra planning pass; callers ranking genuinely fact-scale frames
    should pass "chain".
    """
    # The cutoff aggregate, the size-table job, and the main chain each
    # consume ``df``; exchange reuse cannot dedup them (the branches
    # prune to different columns), so left as lineage the input recomputes
    # per branch — measured 4-11x at sf0.1 on aggregate inputs. For a
    # DERIVED input (a groupBy/join result — the deciles/RFM/pareto
    # shape) the fix is a lazy localCheckpoint: materialize once,
    # distributed, spills to disk (the CC/BPE bounded pattern). For a
    # RAW SCAN input (the equi-depth-over-the-fact-table shape) pass
    # materialize_input=False: re-reading a column-pruned parquet scan
    # 3x is far cheaper at 100 TB than writing the whole fact frame to
    # executor storage once.
    if materialize_input:
        df = df.localCheckpoint(eager=False)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # The cutoffs are collected ONCE and inlined as literal arrays —
    # bounded by len(specs) * (n_buckets - 1) doubles, a parameter bound.
    # Leaving them as lineage (a broadcast crossJoin of the aggregate)
    # would let the size-table job and the final output job re-evaluate
    # percentile_approx independently; the sketch's merge result depends
    # on shuffle-fetch order, so the two jobs could bucket boundary rows
    # differently and the offset join would silently shift ranks.
    cut_row = df.agg(
        *[
            F.percentile_approx(F.col(s.key).cast("double"), qs, 1_000).alias(
                f"_cuts_{i}"
            )
            for i, s in enumerate(specs)
        ]
    ).first()
    bucketed = df
    for i, s in enumerate(specs):
        vals = cut_row[f"_cuts_{i}"]
        if not vals:  # empty input frame: every (zero) row in bucket 0
            bucketed = bucketed.withColumn(f"_bkt_{i}", F.lit(0))
            continue
        keyd = F.col(s.key).cast("double")
        # strict comparison ⇒ boundary-valued rows all land in ONE bucket.
        # See the docstring's bucket_impl contract: both forms compute
        # the count of cutoffs strictly below (ascending) / above
        # (descending) the key; chain = flat first-match CASE over the
        # sorted cutoffs (codegen'd, per-row cheap), fold = higher-order
        # aggregate (compact node, per-action cheap).
        svals = [float(v) for v in vals]
        n_cuts = len(svals)
        if bucket_impl == "chain":
            if s.ascending:
                # first b with keyd <= vals[b]  ==  #{v < keyd}
                in_bucket = F.when(keyd <= F.lit(svals[0]), F.lit(0))
                for b in range(1, n_cuts):
                    in_bucket = in_bucket.when(keyd <= F.lit(svals[b]), F.lit(b))
                in_bucket = in_bucket.otherwise(F.lit(n_cuts))
            else:
                # first b with keyd < vals[b] leaves n_cuts-b cutoffs
                # above the key  ==  #{v > keyd}
                in_bucket = F.when(keyd < F.lit(svals[0]), F.lit(n_cuts))
                for b in range(1, n_cuts):
                    in_bucket = in_bucket.when(
                        keyd < F.lit(svals[b]), F.lit(n_cuts - b)
                    )
                in_bucket = in_bucket.otherwise(F.lit(0))
        else:
            arr = F.array(*[F.lit(v) for v in svals])

            def counter(cmp):
                return F.aggregate(
                    arr, F.lit(0), lambda acc, c: acc + cmp(c).cast("int")
                )

            in_bucket = (
                counter(lambda c: keyd > c)
                if s.ascending
                else counter(lambda c: keyd < c)
            )
        bucketed = bucketed.withColumn(f"_bkt_{i}", in_bucket)

    # ONE bounded job computes every spec's per-bucket size table: each
    # row contributes one (spec, bucket[, value]) struct per spec, and
    # the aggregate collapses to ≤ len(specs) * n_buckets rows — bounded
    # by PARAMETERS, so collecting it to the driver is the same bounded
    # pattern as the k-means partials and BPE argmax. The driver turns
    # the size tables into exclusive prefix offsets (exact integer /
    # Decimal arithmetic) and ships them back as broadcastable
    # ≤ n_buckets-row frames. Per-spec in-plan size tables would instead
    # re-read the frame once per spec and cost a half-dozen scheduling
    # rounds each — measured ~4x on a 3-key ranking at sf0.1.
    spark = df.sparkSession
    structs = []
    for i, s in enumerate(specs):
        fields = [F.lit(i).alias("_spec"), F.col(f"_bkt_{i}").alias("_bkt")]
        for j, sj in enumerate(specs):
            if sj.value_col is None:
                continue
            v = F.col(sj.value_col) if j == i else F.lit(None).cast(
                bucketed.schema[sj.value_col].dataType
            )
            fields.append(v.alias(f"_val_{j}"))
        structs.append(F.struct(*fields))
    size_aggs = [F.count("*").alias("_c")] + [
        F.sum(f"_val_{j}").alias(f"_s_{j}")
        for j, sj in enumerate(specs)
        if sj.value_col is not None
    ]
    sizes = (
        bucketed.select(F.explode(F.array(*structs)).alias("_x"))
        .select("_x.*")
        .groupBy("_spec", "_bkt")
        .agg(*size_aggs)
    )
    sum_types = {f.name: f.dataType for f in sizes.schema.fields}
    size_rows = sizes.collect()

    out = bucketed
    for i, s in enumerate(specs):
        mine = sorted(
            (r for r in size_rows if r["_spec"] == i), key=lambda r: r["_bkt"]
        )
        n_total = sum(r["_c"] for r in mine)
        off_rows, rn_off = [], 0
        if s.value_col is not None:
            # exact driver arithmetic: counts are ints; value sums arrive
            # as Python Decimal/int for exact-typed columns (the
            # determinism contract — float value_cols would make the
            # offset depend on partial-agg order in EITHER formulation)
            cum_off = None
            v_total = None
            for r in mine:
                sv = r[f"_s_{i}"]
                v_total = sv if v_total is None else v_total + sv
            for r in mine:
                sv = r[f"_s_{i}"]
                zero = sv - sv  # typed zero (Decimal/int)
                off_rows.append((r["_bkt"], rn_off, n_total, cum_off if cum_off is not None else zero, v_total))
                cum_off = sv if cum_off is None else cum_off + sv
                rn_off += r["_c"]
            from pyspark.sql.types import LongType, StructField, StructType

            schema = StructType(
                [
                    StructField(f"_bkt_{i}", sizes.schema["_bkt"].dataType),
                    StructField(f"_rn_off_{i}", LongType()),
                    StructField(n_col, LongType()),
                    StructField(f"_cum_off_{i}", sum_types[f"_s_{i}"]),
                    StructField(s.total_col, sum_types[f"_s_{i}"]),
                ]
            )
        else:
            for r in mine:
                off_rows.append((r["_bkt"], rn_off, n_total))
                rn_off += r["_c"]
            from pyspark.sql.types import LongType, StructField, StructType

            schema = StructType(
                [
                    StructField(f"_bkt_{i}", sizes.schema["_bkt"].dataType),
                    StructField(f"_rn_off_{i}", LongType()),
                    StructField(n_col, LongType()),
                ]
            )
        offs = spark.createDataFrame(off_rows, schema)
        if i > 0:
            offs = offs.withColumnRenamed(n_col, f"_n_{i}")

        lead = F.col(s.key).asc() if s.ascending else F.col(s.key).desc()
        bkt = f"_bkt_{i}"
        wl = Window.partitionBy(bkt).orderBy(lead, F.col(tiebreak).asc())
        out = out.join(F.broadcast(offs), bkt).withColumn(
            s.rank_col, F.row_number().over(wl) + F.col(f"_rn_off_{i}")
        )
        if s.value_col is not None:
            wcum = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            out = out.withColumn(
                s.cum_col, F.sum(s.value_col).over(wcum) + F.col(f"_cum_off_{i}")
            )
        drop = [bkt, f"_rn_off_{i}"]
        if s.value_col is not None:
            drop.append(f"_cum_off_{i}")
        if i > 0:
            drop.append(f"_n_{i}")
        out = out.drop(*drop)
    return out


def with_global_rank(
    df: DataFrame,
    key: str,
    tiebreak: str,
    ascending: bool = True,
    value_col: str | None = None,
    n_buckets: int = 64,
    rank_col: str = _RANK,
    cum_col: str = _CUM,
    n_col: str = _N,
    total_col: str = _TOT,
    materialize_input: bool = True,
    bucket_impl: str = "fold",
) -> DataFrame:
    """Single-key convenience wrapper over ``with_global_ranks``."""
    return with_global_ranks(
        df,
        [
            RankSpec(
                key=key,
                ascending=ascending,
                rank_col=rank_col,
                value_col=value_col,
                cum_col=cum_col,
                total_col=total_col,
            )
        ],
        tiebreak=tiebreak,
        n_buckets=n_buckets,
        n_col=n_col,
        materialize_input=materialize_input,
        bucket_impl=bucket_impl,
    )


def exact_ntile(rank_col: str, n_col: str, k: int) -> Column:
    """SQL-standard NTILE(k) from an exact global rank: bucket
    ``(rank-1)*k div n + 1`` — the first ``n mod k`` buckets take the
    extra row, matching Spark's and DuckDB's NTILE bit-for-bit. Integer
    ``div`` (never float division + floor: a last-bit rounding of the
    quotient at a bucket boundary would misassign the boundary row)."""
    return F.expr(f"(({rank_col} - 1) * {k}) div {n_col} + 1")
