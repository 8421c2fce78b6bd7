"""Type widening as a metadata commit (sources/txlog.py:widen_column —
Delta type widening / Iceberg schema evolution): grow a column's type
(int chain, float→double, same-scale decimal precision) as ONE log
commit, zero files rewritten. Files keep their narrow bytes; reads use
an explicit widened schema (Spark 4's parquet reader performs the
promotion that footer merging refuses), incoming batches are cast wide
before staging so rewrites migrate the table lazily, and SKIPPING
FACTS survive unchanged (``_stat_norm`` already collapses every
numeric type into one comparable domain).

Guard rails under test: key columns are refused (bucket hashing is
width-sensitive); narrowing / cross-family / scale-changing casts are
refused; time travel to a pre-widen version reads the narrow type of
that era; the change feed unions across the widen boundary; a
pre-widen file's stats still prune post-widen probes."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from cdc_streaming_pipeline_spark.sources.txlog import (
    BucketedTxLogTable,
    analyze_table,
    fold_mv,
    resolve_with_checkpoint,
    table_changes,
)

S = (
    "id bigint, qty int, amount decimal(10,2), ratio float, "
    "_op string, _lsn string, _deleted string"
)


def _seed(spark, path, n=200, **kw):
    t = BucketedTxLogTable(
        spark, path, key_cols=["id"], n_buckets=4, stats_cols=["qty"], **kw
    )
    rows = [
        (i, i * 10, Decimal(i) / 4, float(i) / 8, "r", f"{i:06d}", None)
        for i in range(n)
    ]
    t.init_from_events(spark.createDataFrame(rows, S))
    return t


def _wide_batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "id bigint, qty bigint, amount decimal(12,2), ratio double, "
        "_op string, _lsn string, _deleted string",
    )


def test_widen_is_metadata_only_and_versioned(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    files_before = sorted(resolve_with_checkpoint(t))

    t.widen_column("qty", "bigint")
    t.widen_column("amount", "decimal(12,2)")
    t.widen_column("ratio", "double")
    assert sorted(resolve_with_checkpoint(t)) == files_before  # no rewrite

    st = t.read_state()
    types = dict(st.dtypes)
    assert types["qty"] == "bigint"
    assert types["amount"] == "decimal(12,2)"
    assert types["ratio"] == "double"
    got = {r["id"]: (r["qty"], r["amount"], r["ratio"]) for r in st.collect()}
    assert got[7] == (70, Decimal("1.75"), 0.875)
    assert len(got) == 200

    # time travel reads the NARROW types of that era
    old = dict(t.read_state(v0).dtypes)
    assert old["qty"] == "int" and old["amount"] == "decimal(10,2)"
    assert old["ratio"] == "float"


def test_widen_accepts_out_of_narrow_range_values(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=100)
    t.widen_column("qty", "bigint")
    t.widen_column("amount", "decimal(12,2)")
    big = 1 << 40  # far beyond int32
    t.merge_cdc_batch(
        _wide_batch(
            spark, [(5, big, Decimal("123456789.12"), 0.5, "u", "999999", None)]
        )
    )
    # mixed narrow/wide files now coexist; every read path must agree
    st = t.read_state()
    assert st.count() == 100
    row = st.filter(F.col("id") == 5).collect()[0]
    assert row["qty"] == big and row["amount"] == Decimal("123456789.12")
    assert st.filter(F.col("id") == 6).collect()[0]["qty"] == 60
    # pruned read over mixed-width files
    df, fr, ft = t.read_state_where("qty", big - 1, big + 1)
    assert [r["id"] for r in df.collect()] == [5]
    assert fr < ft  # pre-widen files' int stats pruned the bigint probe


def test_prewiden_stats_prune_postwiden_probes(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.compact_buckets(min_files=1, cluster_cols=["qty"], cluster_parts=8)
    t.widen_column("qty", "bigint")
    # a narrow-band probe expressed with post-widen (long) bounds must
    # still prune on the pre-widen files' int stats
    df, fr, ft = t.read_state_where("qty", 100, 140)
    assert {r["qty"] for r in df.collect()} == {100, 110, 120, 130, 140}
    assert 0 < fr < ft


def test_widen_validations(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=20)
    with pytest.raises(ValueError, match="key column"):
        t.widen_column("id", "bigint")
    with pytest.raises(ValueError, match="metadata-safe"):
        t.widen_column("qty", "int")  # not a widening
    with pytest.raises(ValueError, match="metadata-safe"):
        t.widen_column("qty", "string")  # cross-family
    with pytest.raises(ValueError, match="metadata-safe"):
        t.widen_column("amount", "decimal(12,4)")  # scale change
    with pytest.raises(ValueError, match="no such column"):
        t.widen_column("nope", "bigint")
    t.widen_column("qty", "bigint")
    with pytest.raises(ValueError, match="metadata-safe"):
        t.widen_column("qty", "int")  # narrowing back refused


def test_change_feed_and_mv_across_widen(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=60)
    v0 = t.latest_version()
    t.widen_column("qty", "bigint")
    t.merge_cdc_batch(_wide_batch(spark, [(3, 1 << 38, Decimal("1.00"), 0.1, "u", "999999", None)]))
    t.delete_where(F.col("qty") == 40)  # id 4, via a post-widen predicate
    feed = table_changes(t, v0)
    by = {}
    for r in feed.collect():
        by.setdefault(r["_change_type"], []).append(r["id"])
    assert by["update_postimage"] == [3] and by["update_preimage"] == [3]
    assert by["delete"] == [4]
    # grouped MV folds across the widen boundary (int era + bigint era)
    mv = {r["id"]: r["n_rows"] for r in fold_mv(t, ["id"], "qty").collect()}
    assert mv[3] == 1 and 4 not in mv and len(mv) == 59


def test_analyze_and_update_on_widened_mixed_files(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), n=100)
    t.widen_column("qty", "bigint")
    t.merge_cdc_batch(
        _wide_batch(spark, [(1, 1 << 39, Decimal("2.00"), 0.2, "u", "999999", None)])
    )
    # analyze over the MIXED-width live set (explicit-schema read path)
    assert analyze_table(t, stats_cols=["qty"]) is None  # facts already complete
    ver, nf, nu = t.update_where(F.col("qty") == 500, {"ratio": F.lit(9.5)})
    assert nu == 1
    row = t.read_state().filter(F.col("id") == 50).collect()[0]
    assert float(row["ratio"]) == pytest.approx(9.5)


def test_clone_carries_widening(spark, tmp_path):
    """A shallow clone of a widened table must read under the widened
    types (its version-0 entry carries table_meta incl. the widening
    map and the verified union schema)."""
    from cdc_streaming_pipeline_spark.sources.txlog import clone_table

    t = _seed(spark, str(tmp_path / "t"), n=50)
    t.widen_column("qty", "bigint")
    # wide ONLY in qty: other columns keep their narrow types so the
    # clone-side further-widen below exercises a real promotion
    t.merge_cdc_batch(
        spark.createDataFrame(
            [(2, 1 << 42, Decimal("1.00"), 0.3, "u", "999999", None)],
            "id bigint, qty bigint, amount decimal(10,2), ratio float, "
            "_op string, _lsn string, _deleted string",
        )
    )
    c = clone_table(t, str(tmp_path / "c"))
    st = c.read_state()
    assert dict(st.dtypes)["qty"] == "bigint"
    assert st.filter(F.col("id") == 2).collect()[0]["qty"] == 1 << 42
    assert st.count() == 50
    # the clone can widen further, independently of the source
    c.widen_column("ratio", "double")
    assert dict(c.read_state().dtypes)["ratio"] == "double"
    assert dict(t.read_state().dtypes)["ratio"] == "float"


def test_widen_interleaves_with_data_ops_model_exact(spark, tmp_path):
    """Seeded walk: widen ops interleave with merges, DV deletes,
    MoR updates, compactions and reopens — read_state stays
    model-exact under the current (possibly widened) types."""
    import random

    rng = random.Random(1313)
    t = _seed(spark, str(tmp_path / "t"), n=50)
    model = {i: i * 10 for i in range(50)}
    widened = False

    for step in range(1, 13):
        roll = rng.random()
        if roll < 0.4:
            k = rng.randrange(50)
            q = (1 << 41) + step if widened else step * 1000
            batch = (
                _wide_batch(
                    spark,
                    [(k, q, Decimal("1.00"), 0.1, "u", f"{step + 10:04d}00", None)],
                )
                if widened
                else spark.createDataFrame(
                    [(k, q, Decimal("1.00"), 0.1, "u", f"{step + 10:04d}00", None)], S
                )
            )
            t.merge_cdc_batch(batch)
            model[k] = q
        elif roll < 0.55 and not widened:
            t.widen_column("qty", "bigint")
            widened = True
        elif roll < 0.7:
            doomed = [k for k, q in model.items() if q % 7 == 0 and k % 3 == 0]
            t.delete_where((F.col("qty") % 7 == 0) & (F.col("id") % 3 == 0))
            for k in doomed:
                del model[k]
        elif roll < 0.8:
            t.update_where(F.col("id") % 11 == 1, {"qty": F.col("qty") + 1})
            for k in list(model):
                if k % 11 == 1:
                    model[k] = model[k] + 1
        elif roll < 0.9:
            t.compact_buckets(min_files=1)
        else:
            t = BucketedTxLogTable(spark, t.path)
        got = {r["id"]: r["qty"] for r in t.read_state().collect()}
        assert got == model, f"divergence at step {step} (widened={widened})"
