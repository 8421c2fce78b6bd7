"""Error-bound oracles for the sketch-family queries.

The five sketch queries (HLL++ / GK / theta / KLL) are unhashable by
design — sketch estimates are engine-internal and merge-order-dependent
— but they are NOT uncheckable: each estimator carries a published
error bound, so the oracle computes the EXACT answer in DuckDB and
asserts every estimate within its bound (r11 verdict item 3: replace
rows-only with bounds_match).

All five estimators are DETERMINISTIC functions of the data (seeded
hashing, no RNG), so a bound that holds at a scale factor holds on
every re-run — these checks are stable gates, not flaky statistics.

Bounds used (3σ-style, plus a small absolute slack for tiny groups):
- HLL++ (approx_count_distinct, rsd=0.02): |est−n| ≤ 3·rsd·n
- Spark hll_sketch_agg(lgK=14): rsd = 1.0389/√2^14 ≈ 0.81%
- GK / percentile_approx(accuracy=10000): rank error ε = 1/accuracy —
  the estimate's RANK must sit within p ± (2ε + 2/n)
- KLL (k=200 default): normalized rank error ≈ 1.65% (datasketches'
  published single-sided 99% figure), same rank test with that ε
- Theta (lgNomEntries=12 default): RSE ≈ 1/√4096 ≈ 1.56% of the UNION
  size — intersection error is bounded relative to the union, never
  the (possibly tiny) intersection itself.

Each entry: fn(con, sf_dir, spark_pdf) -> (ok, detail). ``con`` is the
DuckDB connection with the parquet views registered.
"""

from __future__ import annotations

import bisect

import pandas as pd

BOUND_ORACLES: dict = {}


def _register(name):
    def deco(fn):
        BOUND_ORACLES[name] = fn
        return fn

    return deco


def _cardinality_bounds(con, pdf, rsd: float, est_col: str) -> tuple[bool, str]:
    exact = con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY event_type"
    ).df()
    em = dict(zip(exact["event_type"], exact["n"]))
    overall = con.execute(
        "SELECT COUNT(DISTINCT user_id) AS n FROM events"
    ).fetchone()[0]
    bad = []
    seen = set()
    for _, r in pdf.iterrows():
        t = r["event_type"]
        seen.add(t)
        ex = int(overall if t == "__all__" else em.get(t, -1))
        if ex < 0:
            bad.append(f"{t}: not in exact groups")
            continue
        est = float(r[est_col])
        if abs(est - ex) > max(3 * rsd * ex, 5.0):
            bad.append(f"{t}: est {est} vs exact {ex} (rsd {rsd})")
    want = set(em) | ({"__all__"} if "__all__" in seen else set())
    if seen != want:
        bad.append(f"group sets differ: {sorted(seen ^ want)}")
    return (not bad), "; ".join(bad)[:300]


@_register("approx_users_per_type")
def approx_users_per_type_bounds(con, sf_dir, pdf):
    return _cardinality_bounds(con, pdf, rsd=0.02, est_col="approx_users")


@_register("hll_users_rollup")
def hll_users_rollup_bounds(con, sf_dir, pdf):
    rsd = 1.0389 / (2.0**14) ** 0.5  # lgK=14
    return _cardinality_bounds(con, pdf, rsd=rsd, est_col="approx_users")


def _rank_ok(values_sorted: list, n: int, est: float, p: float, eps: float) -> bool:
    # the query rounds estimates to 4dp; widen the membership window by
    # half an ulp of that rounding so the rank interval brackets it
    lo = bisect.bisect_left(values_sorted, est - 5e-5) / n
    hi = bisect.bisect_right(values_sorted, est + 5e-5) / n
    tol = 2.0 * eps + 2.0 / n
    return (lo - tol) <= p <= (hi + tol)


def _quantile_bounds(con, pdf, eps: float) -> tuple[bool, str]:
    vals = con.execute("SELECT event_type, value FROM events").df()
    groups = {
        t: sorted(g["value"].tolist()) for t, g in vals.groupby("event_type")
    }
    groups["__all__"] = sorted(vals["value"].tolist())
    bad = []
    for _, r in pdf.iterrows():
        t = r["event_type"]
        vs = groups.get(t)
        if not vs:
            bad.append(f"{t}: no exact group")
            continue
        n = len(vs)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            if not _rank_ok(vs, n, float(r[col]), p, eps):
                bad.append(f"{t}.{col}: est {r[col]} rank outside {p}±{2 * eps:.4f}")
    return (not bad), "; ".join(bad)[:300]


@_register("approx_value_quantiles")
def approx_value_quantiles_bounds(con, sf_dir, pdf):
    return _quantile_bounds(con, pdf, eps=1.0 / 10000)  # GK accuracy=10000


@_register("kll_value_rollup")
def kll_value_rollup_bounds(con, sf_dir, pdf):
    return _quantile_bounds(con, pdf, eps=0.0165)  # KLL k=200 published


@_register("hll_users_rollup_merged")
def hll_users_rollup_merged_bounds(con, sf_dir, pdf):
    # two-level merge of stored register state: HLL union is lossless,
    # so the SAME published bound applies as to the single-scan rollup
    rsd = 1.0389 / (2.0**14) ** 0.5  # lgK=14
    return _cardinality_bounds(con, pdf, rsd=rsd, est_col="approx_users")


@_register("kll_value_rollup_merged")
def kll_value_rollup_merged_bounds(con, sf_dir, pdf):
    # KLL merge preserves the published rank-error bound through any
    # number of merge levels — same ε gate as the single-scan rollup
    return _quantile_bounds(con, pdf, eps=0.0165)


@_register("theta_user_overlap")
def theta_user_overlap_bounds(con, sf_dir, pdf):
    rse = 1.0 / (2.0**12) ** 0.5  # lgNomEntries=12 default
    exact = con.execute(
        """
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        n AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type),
        c AS (
            SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS common
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT na.event_type AS ta, nb.event_type AS tb,
               COALESCE(c.common, 0) AS common,
               na.n + nb.n - COALESCE(c.common, 0) AS either
        FROM n na JOIN n nb ON na.event_type < nb.event_type
        LEFT JOIN c ON c.ta = na.event_type AND c.tb = nb.event_type
        """
    ).df()
    em = {
        (r["ta"], r["tb"]): (int(r["common"]), int(r["either"]))
        for _, r in exact.iterrows()
    }
    bad = []
    if len(pdf) != len(em):
        bad.append(f"pair count {len(pdf)} vs exact {len(em)}")
    for _, r in pdf.iterrows():
        key = (r["type_a"], r["type_b"])
        if key not in em:
            bad.append(f"{key}: not an exact pair")
            continue
        common, either = em[key]
        slack = 3 * rse * either + 5.0
        if abs(float(r["approx_common_users"]) - common) > slack:
            bad.append(f"{key}: common {r['approx_common_users']} vs {common}")
        if abs(float(r["approx_either_users"]) - either) > slack:
            bad.append(f"{key}: either {r['approx_either_users']} vs {either}")
    return (not bad), "; ".join(bad)[:300]
