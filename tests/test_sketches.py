"""Accuracy gates for the sketch aggregates (the driver can only rows-only
check them — sketch internals are engine-specific — so the error bound vs
the exact answer is asserted here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.plans.events import (
    approx_users_per_type,
    approx_value_quantiles,
)
from cdc_streaming_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_hll_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users for r in approx_users_per_type(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        rel = abs(approx[t] - n) / max(n, 1)
        assert rel <= 0.10, f"{t}: approx {approx[t]} vs exact {n} (rel {rel:.3f})"


def test_approx_quantiles_rank_accuracy(spark):
    """The GK guarantee is on RANK, not value distance: the reported
    quantile must sit at an empirical CDF position within ε of the target
    (ε = 1/accuracy, plus discreteness slack of one sample)."""
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in approx_value_quantiles(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").cache()
    counts = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for t, qs in approx.items():
        n = counts[t]
        for phi, a in zip((0.5, 0.9, 0.99), qs):
            cdf = ev.filter((F.col("event_type") == t) & (F.col("value") <= a)).count() / n
            slack = 1.0 / 10000 + 2.0 / n
            assert phi - slack <= cdf <= phi + slack + 1e-9, (
                f"{t} φ={phi}: value {a} sits at cdf {cdf:.4f} (n={n})"
            )


def test_hll_rollup_merge_matches_exact_overall(spark):
    """The unioned per-type sketches must estimate the OVERALL distinct
    count within HLL error — merging sketches is what makes them useful."""
    from cdc_streaming_pipeline_spark.plans.events import hll_users_rollup

    rows = {r.event_type: r.approx_users for r in hll_users_rollup(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    exact_overall = ev.select("user_id").distinct().count()
    assert "__all__" in rows
    rel = abs(rows["__all__"] - exact_overall) / max(exact_overall, 1)
    assert rel <= 0.05, f"merged estimate {rows['__all__']} vs exact {exact_overall}"


def test_theta_overlap_estimates_match_exact_set_algebra(spark):
    """Theta intersection/union estimates vs the exact distinct-user set
    algebra. At this cardinality (~150 users/type, far below the default
    nominal entries) theta is near-exact — gate at 5% relative error."""
    from cdc_streaming_pipeline_spark.plans.events import theta_user_overlap

    approx = {
        (r.type_a, r.type_b): (r.approx_common_users, r.approx_either_users)
        for r in theta_user_overlap(spark, SF_DIR).collect()
    }
    assert len(approx) == 10  # C(5,2) type pairs
    ev = load_table(spark, SF_DIR, "events")
    users = {
        t: {r.user_id for r in ev.filter(F.col("event_type") == t).select("user_id").distinct().collect()}
        for t in {a for a, _ in approx} | {b for _, b in approx}
    }
    for (a, b), (common, either) in approx.items():
        exact_common = len(users[a] & users[b])
        exact_either = len(users[a] | users[b])
        assert abs(common - exact_common) <= max(1, 0.05 * exact_common), (a, b)
        assert abs(either - exact_either) <= max(1, 0.05 * exact_either), (a, b)


def test_kll_rollup_rank_accuracy_including_merged_row(spark):
    """KLL rank guarantee for the per-type rows AND the merged __all__
    row (merging must not void the error bound)."""
    from cdc_streaming_pipeline_spark.plans.events import kll_value_rollup

    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in kll_value_rollup(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select("event_type", "value").cache()
    n_all = ev.count()
    for t, qs in approx.items():
        if t == "__all__":
            scoped, n = ev, n_all
        else:
            scoped = ev.filter(F.col("event_type") == t)
            n = scoped.count()
        for phi, a in zip((0.5, 0.9, 0.99), qs):
            cdf = scoped.filter(F.col("value") <= a).count() / n
            slack = 0.02 + 2.0 / n  # default-k KLL normalized rank error ~1.3%
            assert phi - slack <= cdf <= phi + slack + 1e-9, (
                f"{t} φ={phi}: value {a} at cdf {cdf:.4f} (n={n})"
            )


def test_bound_oracles_hold_on_adversarial_skew(spark, tmp_path):
    """The bound-oracle functions (tools/bound_oracles.py) on a SEEDED
    worst-case: zipf-skewed user ids (one user dominating, a long
    singleton tail — the regime where naive cardinality estimators
    collapse) and heavy-tailed values (quantile mass piled at the
    extremes). Every estimator must stay within the same published
    bound the gate asserts on the real tables."""
    import random

    import duckdb

    from cdc_streaming_pipeline_spark.plans import events as ev_plans
    from tools.bound_oracles import BOUND_ORACLES

    rng = random.Random(99)
    rows = []
    for i in range(60_000):
        # zipf-ish: rank r has weight ~ 1/r over 20k users
        u = min(int(1.0 / max(rng.random(), 1e-9)) % 20_000, 19_999)
        t = ["view", "click", "purchase", "refund"][
            0 if rng.random() < 0.7 else rng.randint(1, 3)
        ]
        v = rng.random() ** 8 * 1e6  # heavy tail: most tiny, few huge
        rows.append((i, u, t, v))
    pdf_src = __import__("pandas").DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value"]
    )
    src = str(tmp_path / "events.parquet")
    pdf_src.to_parquet(src)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}')")
    sdf = spark.createDataFrame(pdf_src)

    # rebuild each sketch query's SHAPE over the skewed frame
    approx_users = sdf.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
    quantiles = (
        sdf.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
            ).alias("q")
        )
        .select(
            "event_type",
            F.round(F.col("q")[0], 4).alias("p50"),
            F.round(F.col("q")[1], 4).alias("p90"),
            F.round(F.col("q")[2], 4).alias("p99"),
        )
    )
    per_type_hll = sdf.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    hll = per_type_hll.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    ).unionByName(
        per_type_hll.agg(
            F.lit("__all__").alias("event_type"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        )
    )
    sk = sdf.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id)").alias("sk")
    )
    a, b = sk.alias("a"), sk.alias("b")
    theta = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.expr("theta_sketch_estimate(theta_intersection(a.sk, b.sk))")
        .cast("long")
        .alias("approx_common_users"),
        F.expr("theta_sketch_estimate(theta_union(a.sk, b.sk))")
        .cast("long")
        .alias("approx_either_users"),
    )
    per_type_kll = sdf.groupBy("event_type").agg(
        F.expr("kll_sketch_agg_double(value)").alias("sk")
    )
    qcols = [
        F.round(F.expr(f"kll_sketch_get_quantile_double(sk, {q})"), 4).alias(nm)
        for q, nm in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
    ]
    kll = per_type_kll.select("event_type", *qcols).unionByName(
        per_type_kll.agg(F.expr("kll_merge_agg_double(sk)").alias("sk")).select(
            F.lit("__all__").alias("event_type"), *qcols
        )
    )
    for name, df in (
        ("approx_users_per_type", approx_users),
        ("approx_value_quantiles", quantiles),
        ("hll_users_rollup", hll),
        ("theta_user_overlap", theta),
        ("kll_value_rollup", kll),
    ):
        ok, detail = BOUND_ORACLES[name](con, None, df.toPandas())
        assert ok, f"{name}: {detail}"


def test_sketch_merge_order_invariance(spark):
    """r12 verdict item 7: persisted sketch STATE must merge to the
    same answer whatever order (or nesting) the partial states arrive
    in — the property that makes store-and-merge rollups safe at any
    batch topology. HLL union is register-wise max (associative +
    commutative), so estimates must be BIT-IDENTICAL across shuffled
    merge orders and equal to the single-scan sketch; KLL merges must
    stay within the published rank bound for every order."""
    import random

    ev = load_table(spark, SF_DIR, "events")
    # level-1 partial states under three different batch keys — the
    # same data partitioned three different ways
    single = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("e")
    ).collect()[0]["e"]
    exact = ev.select("user_id").distinct().count()
    vals = sorted(r["value"] for r in ev.select("value").collect())
    n = len(vals)

    for seed, nb in ((1, 4), (2, 8), (3, 13)):
        parts = (
            ev.withColumn("_b", F.pmod(F.col("event_id") + seed, F.lit(nb)))
            .groupBy("_b")
            .agg(
                F.hll_sketch_agg("user_id", F.lit(14)).alias("hll"),
                F.expr("kll_sketch_agg_double(value)").alias("kll"),
            )
        )
        # shuffle the merge order driver-side, then merge level 2 in
        # that order via an explicit fold over per-row frames
        rows = parts.collect()
        random.Random(seed).shuffle(rows)
        df = spark.createDataFrame(rows, parts.schema)
        est = df.agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("e")
        ).collect()[0]["e"]
        assert est == single, (seed, nb, est, single)
        assert abs(est - exact) <= max(3 * (1.0389 / 2.0**7) * exact, 5.0)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            q = df.agg(
                F.expr(f"kll_sketch_get_quantile_double(kll_merge_agg_double(kll), {p})").alias("q")
            ).collect()[0]["q"]
            import bisect

            lo = bisect.bisect_left(vals, q) / n
            hi = bisect.bisect_right(vals, q) / n
            tol = 2 * 0.0165 + 2.0 / n
            assert (lo - tol) <= p <= (hi + tol), (seed, col, q, lo, hi)
