"""Join-IVM (operators/cdc.py:ivm_join_group_aggregate): the signed
bilinear algebra vs a brute-force final-state join on a hand-built log,
plus the plan contract (no per-key window, no per-event join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.operators.cdc import ivm_join_group_aggregate

FACT_T = "struct<id:bigint,k:bigint,amt:double>"
DIM_T = "struct<k:bigint,grp:string>"


def _env(spark, rows, img_type, table):
    data = [
        (
            {"before": b, "after": a, "op": op, "table": table, "lsn": f"{i:06d}"},
        )
        for i, (b, a, op) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        f"value struct<before:{img_type},after:{img_type},op:string,table:string,lsn:string>",
    )


def test_dim_move_rebalances_seen_facts_and_deletes_cancel(spark):
    fact_rows = [
        (None, {"id": 1, "k": 10, "amt": 5.0}, "c"),       # insert order 1 (cust 10)
        (None, {"id": 2, "k": 10, "amt": 7.0}, "c"),       # insert order 2 (cust 10)
        (None, {"id": 3, "k": 20, "amt": 11.0}, "c"),      # insert order 3 (cust 20)
        ({"id": 2, "k": 10, "amt": 7.0},
         {"id": 2, "k": 10, "amt": 9.0}, "u"),             # update order 2 amount
        ({"id": 3, "k": 20, "amt": 11.0}, None, "d"),      # delete order 3
        (None, {"id": 4, "k": 30, "amt": 1.0}, "c"),       # order for a cust with NO dim row yet... 
        (None, {"id": 5, "k": 40, "amt": 2.0}, "c"),       # order whose cust is later deleted
    ]
    dim_rows = [
        (None, {"k": 10, "grp": "A"}, "c"),
        (None, {"k": 20, "grp": "A"}, "c"),
        (None, {"k": 40, "grp": "B"}, "c"),
        ({"k": 10, "grp": "A"}, {"k": 10, "grp": "B"}, "u"),  # cust 10 MOVES A->B after its orders exist
        ({"k": 40, "grp": "B"}, None, "d"),                   # cust 40 deleted -> its order drops out
    ]
    fact = _env(spark, fact_rows, FACT_T, "orders")
    dim = _env(spark, dim_rows, DIM_T, "cust")
    out = {
        r.grp: (r.n_rows, r.total_amount)
        for r in ivm_join_group_aggregate(fact, dim, "k", "grp", "amt").collect()
    }
    # final state: orders 1 (5.0) + 2 (9.0) live for cust 10 now in B;
    # order 3 deleted; cust 30 has no dim row (inner-join semantics);
    # cust 40's dim deleted so order 5 contributes nothing; group A nets
    # to ZERO rows and must be absent, not present-with-zeros
    assert out == {"B": (2, 14.0)}


def test_matches_bruteforce_on_random_log(spark):
    import random

    rng = random.Random(5)
    fact_rows, dim_rows = [], []
    state_f, state_d = {}, {}
    for oid in range(200):
        k = rng.randint(0, 15)
        amt = float(rng.randint(1, 50))
        fact_rows.append((None, {"id": oid, "k": k, "amt": amt}, "c"))
        state_f[oid] = (k, amt)
        r = rng.random()
        if r < 0.3 and state_f:
            victim = rng.choice(list(state_f))
            vk, vamt = state_f[victim]
            if r < 0.15:
                fact_rows.append(({"id": victim, "k": vk, "amt": vamt}, None, "d"))
                del state_f[victim]
            else:
                namt = vamt + 1.0
                fact_rows.append((
                    {"id": victim, "k": vk, "amt": vamt},
                    {"id": victim, "k": vk, "amt": namt}, "u"))
                state_f[victim] = (vk, namt)
    for k in range(16):
        g = rng.choice("XYZ")
        dim_rows.append((None, {"k": k, "grp": g}, "c"))
        state_d[k] = g
        if rng.random() < 0.4:
            ng = rng.choice("XYZ")
            dim_rows.append(({"k": k, "grp": state_d[k]}, {"k": k, "grp": ng}, "u"))
            state_d[k] = ng
    fact = _env(spark, fact_rows, FACT_T, "orders")
    dim = _env(spark, dim_rows, DIM_T, "cust")
    got = {
        r.grp: (r.n_rows, round(r.total_amount, 2))
        for r in ivm_join_group_aggregate(fact, dim, "k", "grp", "amt").collect()
    }
    want: dict[str, list] = {}
    for k, amt in state_f.values():
        g = state_d[k]
        cur = want.setdefault(g, [0, 0.0])
        cur[0] += 1
        cur[1] += amt
    want = {g: (n, round(v, 2)) for g, (n, v) in want.items() if n}
    assert got == want


def test_plan_has_no_window_and_one_compact_join(spark):
    fact = _env(spark, [(None, {"id": 1, "k": 1, "amt": 1.0}, "c")], FACT_T, "o")
    dim = _env(spark, [(None, {"k": 1, "grp": "A"}, "c")], DIM_T, "c")
    df = ivm_join_group_aggregate(fact, dim, "k", "grp", "amt")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan          # no latest-state window anywhere
    assert plan.count("Join") == 1       # ONE join, of the two compact states
