"""Declarative data-quality validation (Deequ-style constraint checking).

The pre-training / pre-commit gate a 100 TB pipeline runs before a corpus
or warehouse snapshot is allowed downstream: row-level constraints
(not-null, domain membership, cross-column consistency) are evaluated as a
SINGLE aggregate pass over one scan — each check is one conditional-sum
column, so adding checks is free; uniqueness adds an exact distinct (the
one genuinely shuffling check — swap ``F.count_distinct`` for
``F.approx_count_distinct`` at extreme cardinality, same report shape).
Referential integrity runs as one anti-join per foreign key, assembled
into a single unioned plan so the whole audit is one action; small parent
key sets broadcast automatically.

Output shape (both entry points): one row per check —
(check_name, violations, n_rows, passed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Evaluate named row-level constraints in ONE aggregate pass.

    ``row_checks`` maps check name -> a boolean Column that is TRUE when
    the row VIOLATES the constraint. ``unique_cols`` adds per-column
    duplicate counts (non-null count minus exact distinct count).
    """
    aggs = [F.count("*").alias("_n")]
    for name, violated in row_checks:
        aggs.append(F.sum(violated.cast("long")).alias(name))
    for c in unique_cols:
        aggs.append((F.count(c) - F.count_distinct(F.col(c))).alias(f"unique_{c}"))
    names = [n for n, _ in row_checks] + [f"unique_{c}" for c in unique_cols]
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', {n}" for n in names)
    return (
        row.select(
            F.col("_n").alias("n_rows"),
            F.expr(f"stack({len(names)}, {stack_args}) as (check_name, violations)"),
        )
        .select(
            "check_name",
            "violations",
            "n_rows",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def fk_orphan_report(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, child_key,
    parent, parent_key), count non-null child keys with no matching
    parent row. One left OUTER join per FK, parent side reduced to its
    distinct key column. No broadcast hint: a dimension parent's key set
    is tiny and AQE broadcasts it automatically, but a fact parent
    (orders under lineitem) has billions of distinct keys at 100 TB —
    past the 8 GB broadcast hard limit — and must be allowed to fall
    back to a shuffled join. Orphans are the unmatched rows, and the
    same pass counts the audited child rows, so
    the report carries (check_name, violations, n_rows, passed) like
    ``check_constraints`` at the cost of the anti-join it replaces. All
    edges union into a single plan so the whole audit is one job.
    """
    reports = []
    for name, child, ckey, parent, pkey in fks:
        hits = (
            parent.select(F.col(pkey).alias("_k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        orphans = (
            child.select(F.col(ckey).alias("_k"))
            .filter(F.col("_k").isNotNull())
            .join(hits, "_k", "left")
            .agg(
                F.coalesce(
                    F.sum(F.col("_hit").isNull().cast("long")), F.lit(0)
                ).alias("violations"),
                F.count("*").alias("n_rows"),
            )
            .select(
                F.lit(name).alias("check_name"),
                "violations",
                "n_rows",
                (F.col("violations") == 0).alias("passed"),
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def population_stability(
    df: DataFrame,
    split_col: str,
    split_a: str,
    split_b: str,
    features: list[tuple[str, Column]],
    round_to: int = 4,
) -> DataFrame:
    """Population Stability Index per feature between two cohorts — the
    standard train/val (or last-month/this-month) distribution-drift
    gate: PSI = sum_b (p_b - q_b) * ln(p_b / q_b) over a feature's
    bucketed distribution, with add-one (Laplace) smoothing so buckets
    present in only one cohort contribute a finite, identical value in
    every engine (p_b = (c_b + 1) / (N + K), K = buckets observed across
    both cohorts). Rule of thumb: <0.1 stable, 0.1-0.25 drifting, >0.25
    broken.

    ``features`` maps feature name -> an already-BUCKETED string column
    (callers choose fixed bin edges; unbounded-cardinality raw values
    would make the PSI itself degenerate).

    Scale shape: one pass explodes each row into |features| (name,
    bucket) pairs — a bounded constant multiplier — then ONE shuffle to
    (feature, bucket) counts. Everything downstream operates on the
    bucket vocabulary (|features| x buckets-per-feature rows), which is
    design-bounded, not data-scaled; the totals join is a tiny-frame
    join AQE broadcasts on its own."""
    s = F.col("_s")
    tidy = (
        df.filter(F.col(split_col).isin(split_a, split_b))
        .select(
            F.col(split_col).alias("_s"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("_f"), expr.cast("string").alias("_b")
                        )
                        for name, expr in features
                    ]
                )
            ).alias("_fb"),
        )
        .select("_s", "_fb._f", "_fb._b")
    )
    counts = tidy.groupBy("_f", "_b").agg(
        F.sum((s == split_a).cast("long")).alias("_ca"),
        F.sum((s == split_b).cast("long")).alias("_cb"),
    )
    totals = counts.groupBy("_f").agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.count("*").alias("n_buckets"),
    )
    j = counts.join(totals, "_f")
    p = (F.col("_ca") + 1.0) / (F.col("_na") + F.col("n_buckets"))
    q = (F.col("_cb") + 1.0) / (F.col("_nb") + F.col("n_buckets"))
    return (
        j.groupBy(F.col("_f").alias("feature"), "n_buckets")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), round_to).alias("psi"))
        .select("feature", "n_buckets", "psi")
    )
