"""Custom join operators Spark lacks as built-ins: AS-OF (point-in-time)
join, range (interval) join, and salted join for extreme key skew.

Each is a composition of existing DataFrame ops chosen for its shuffle
shape at 100 TB — the naive formulations (inequality theta-joins, hot-key
shuffles) degrade to nested loops or straggler tasks; these do not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    prefix: str = "asof_",
) -> DataFrame:
    """Point-in-time join: for each left row, the most recent right row
    with ``right_ts <= left_ts`` on the same key (inclusive at equality).

    Union-window design: tag both sides, union, ONE window over
    (key, ts, side) carrying the last-seen right payload forward, keep the
    left rows. Cost is a single shuffle on the key — no per-left-row
    candidate set, no inequality join, no explosion when a key has
    thousands of right versions (the classic join-then-rank formulation
    is quadratic there). Right rows must be unique per (key, ts) for a
    deterministic answer — pre-aggregate if they are not.
    """
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_struct = F.struct(*[F.col(c) for c in right.columns])
    r_type = T.StructType(right.schema.fields)
    l_type = T.StructType(left.schema.fields)
    l = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_struct.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        r_struct.alias("_r"),
    )
    w = Window.partitionBy("_k").orderBy(
        F.col("_ts").asc(), F.col("_side").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = l.unionByName(r).withColumn("_rv", F.last("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1)
    if how == "inner":
        out = out.filter(F.col("_rv").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports how='left'|'inner', got {how!r}")
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"_rv.{c}").alias(f"{prefix}{c}") for c in right.columns]
    return out.select(*cols)


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: Column | None = None,
    granule: str = "1 day",
) -> DataFrame:
    """Interval join (left.ts ∈ [right.start, right.end]) as an EQUI-join.

    A raw inequality join has no hashable key — Spark falls back to
    broadcast-nested-loop, O(|L|·|R|) at scale. Bucketing time into
    granules fixes it: each interval explodes to the granules it covers,
    each left row maps to its one granule, the join key is (granule [+ any
    extra equi-keys in ``on``]), and the exact containment predicate
    filters the candidates. Cost scales with true overlap density ×
    interval-length/granule (the replication factor — pick the granule
    near the median interval length).
    """
    g = F.unix_timestamp
    amount_s, unit = granule.split()
    unit_seconds = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    gsec = F.lit(int(amount_s) * unit_seconds[unit.rstrip("s")])
    lg = left.withColumn("_g", F.floor(g(F.col(left_ts)) / gsec))
    rg = right.withColumn(
        "_g",
        F.explode(
            F.sequence(
                F.floor(g(F.col(start_col)) / gsec),
                F.floor(g(F.col(end_col)) / gsec),
            )
        ),
    )
    cond = lg["_g"] == rg["_g"]
    if on is not None:
        cond = cond & on
    return (
        lg.join(rg, cond)
        .filter(
            (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) <= F.col(end_col))
        )
        .drop("_g")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to EXTREME key skew (beyond what AQE's
    skew-join splitting handles): the big/skewed left side gets a
    deterministic salt from its row content, the right side replicates
    each row across all salts, and the join key becomes (key, salt) — a
    hot key's rows spread over ``n_salts`` tasks instead of one
    straggler. Right-side cost is n_salts× replication: use for
    big⋈medium joins where one left key dominates.

    Only left-preserving modes are accepted: because the RIGHT side is
    replicated across every salt, 'right'/'full' outer would emit each
    unmatched right row n_salts times — silently wrong, so it raises.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): right-preserving joins would "
            f"duplicate unmatched right rows {n_salts}x (the right side is "
            f"salt-replicated); salt the other side instead. Allowed: {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lsalted = left.withColumn("_salt", salt)
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lsalted.join(
        rsalted,
        (lsalted[left_key] == rsalted[right_key]) & (lsalted["_salt"] == rsalted["_salt"]),
        how,
    )
    return out.drop("_salt")


def pit_join(
    fact: DataFrame,
    dim_scd2: DataFrame,
    fact_key: str,
    dim_key: str,
    probe_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row matched to the SCD2
    dimension VERSION that was valid at the fact's probe point —
    ``valid_from <= probe < valid_to`` (open ``valid_to`` = NULL means
    still current). The correctness backbone of training-data and
    feature-store pipelines: joining facts to today's dimension leaks
    the future into the past; joining to the version interval does not.

    Execution shape: an equi-join on the KEY carries the interval
    predicate as a join condition, so Spark hash-joins on the key and
    filters version candidates per row — per-key version counts are
    small by construction (one per change), so the candidate fan-out is
    bounded; the SCD2 invariant (non-overlapping intervals per key)
    guarantees at most ONE match per fact row, no dedup pass needed."""
    d = (
        dim_scd2.withColumn("_pk", F.col(dim_key))
        .withColumn("_vf", F.col(valid_from))
        .withColumn("_vt", F.col(valid_to))
        .drop(dim_key)
    )
    cond = (
        (fact[fact_key] == d["_pk"])
        & (d["_vf"] <= fact[probe_col])
        & (d["_vt"].isNull() | (fact[probe_col] < d["_vt"]))
    )
    return fact.join(d, cond, "left").drop("_pk", "_vf", "_vt")
