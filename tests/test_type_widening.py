"""Schema evolution with type WIDENING on append: a later run may store
a numerically-wider type for an existing column (int -> bigint,
float -> double, decimal precision up at the same scale); the merged
schema takes the wider type and older narrower blocks cast losslessly
at decode.  Incompatible changes (string vs long, narrowing a decimal
SCALE) still raise loudly — widening must never be a silent rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.filters import RangePredicate


@pytest.fixture()
def widened(spark, tmp_path):
    d = str(tmp_path)
    df1 = spark.range(100).select(
        F.col("id").alias("k"),
        F.col("id").cast("int").alias("n"),
        (F.col("id") / 4).cast("float").alias("x"),
        (F.col("id").cast("decimal(10,2)") * 3).alias("dec"))
    encode_table(df1, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=4, resume=False,
                 run_id="run1")
    df2 = spark.range(100, 160).select(
        F.col("id").alias("k"),
        (F.col("id") * 10_000_000_000).alias("n"),        # needs long
        (F.col("id") / 4).cast("double").alias("x"),       # needs double
        (F.col("id").cast("decimal(16,2)") * 3).alias("dec"))
    encode_table(df2, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=4, resume=False,
                 run_id="run2")
    return d, df1, df2


def test_widened_decode_matches_union(spark, widened):
    d, df1, df2 = widened
    out = decode_table(spark, f"{d}/b", f"{d}/m")
    assert dict(out.dtypes) == {"k": "bigint", "n": "bigint", "x": "double",
                                "dec": "decimal(18,2)"}
    exp = (df1.select("k", F.col("n").cast("long"),
                      F.col("x").cast("double"),
                      F.col("dec").cast("decimal(18,2)"))
           .unionAll(df2.select("k", "n", "x",
                                F.col("dec").cast("decimal(18,2)"))))
    assert sorted(out.collect()) == sorted(exp.collect())


def test_widened_predicate_spans_runs(spark, widened):
    d, df1, df2 = widened
    pred = RangePredicate(column="n", lower=50, upper=10**12)
    got = decode_table(spark, f"{d}/b", f"{d}/m", columns=["k", "n"],
                       predicate=pred)
    n_exp = (df1.filter((F.col("n") >= 50)).count()
             + df2.filter(F.col("n") <= 10**12).count())
    assert got.count() == n_exp


def test_widened_via_datasource(spark, widened):
    from boltspark.sources import datasource as ds

    d, df1, df2 = widened
    r = ds.load(spark, f"{d}/b", f"{d}/m")
    assert dict(r.dtypes)["n"] == "bigint"
    assert r.count() == 160
    assert r.filter(F.col("n") >= 10**12).count() == \
        df2.filter(F.col("n") >= 10**12).count()


def test_widened_aggregates(spark, widened):
    from boltspark.engine.agg import column_minmax, column_sum

    d, df1, df2 = widened
    exp_sum = (df1.agg(F.sum(F.col("n").cast("long"))).collect()[0][0]
               + df2.agg(F.sum("n")).collect()[0][0])
    got = column_sum(spark, f"{d}/b", f"{d}/m", "n").collect()[0]
    assert got["sum_value"] == float(exp_sum)
    mm = column_minmax(spark, f"{d}/b", f"{d}/m", "n").collect()[0]
    assert mm["vmin"] == 0 and mm["vmax"] == 159 * 10_000_000_000


def test_incompatible_changes_still_raise(spark, tmp_path):
    d = str(tmp_path)
    df1 = spark.range(20).select(F.col("id").alias("k"),
                                 F.col("id").alias("v"))
    encode_table(df1, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run1")
    # string vs long: no widening
    df2 = spark.range(20, 30).select(F.col("id").alias("k"),
                                     F.col("id").cast("string").alias("v"))
    encode_table(df2, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run2")
    with pytest.raises(ValueError, match="type conflict"):
        decode_table(spark, f"{d}/b", f"{d}/m")


def test_decimal_scale_change_raises(spark, tmp_path):
    d = str(tmp_path)
    df1 = spark.range(20).select(
        F.col("id").alias("k"), F.col("id").cast("decimal(10,2)").alias("v"))
    encode_table(df1, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run1")
    df2 = spark.range(20, 30).select(
        F.col("id").alias("k"), F.col("id").cast("decimal(10,4)").alias("v"))
    encode_table(df2, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run2")
    with pytest.raises(ValueError, match="type conflict"):
        decode_table(spark, f"{d}/b", f"{d}/m")


def test_widen_across_d128_boundary(spark, tmp_path):
    """decimal(12,2) (int64 low-word storage) + decimal(22,2) (d128 word
    pairs) widen to decimal(22,2): _decimal_from_i64 handles BOTH
    storage shapes against the wider target."""
    d = str(tmp_path)
    df1 = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").cast("decimal(12,2)").alias("v"))
    encode_table(df1, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run1")
    df2 = spark.range(50, 80).select(
        F.col("id").alias("k"),
        (F.col("id") + 10**17).cast("decimal(22,2)").alias("v"))
    encode_table(df2, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2, resume=False,
                 run_id="run2")
    out = decode_table(spark, f"{d}/b", f"{d}/m")
    assert dict(out.dtypes)["v"] == "decimal(22,2)"
    exp = (df1.select("k", F.col("v").cast("decimal(22,2)"))
           .unionAll(df2))
    assert sorted(out.collect()) == sorted(exp.collect())


def test_widened_decimal_predicate_spans_storages(spark, tmp_path):
    """Decimal128RangePredicate must filter BOTH storage shapes of a
    precision-widened column: 1-D unscaled int64 blocks from p<=18
    runs sign-extend to word pairs, d128 runs compare natively."""
    from boltspark.engine.filters import Decimal128RangePredicate

    d = str(tmp_path)
    df1 = spark.range(60).select(
        F.col("id").alias("k"),
        ((F.col("id") - 30).cast("decimal(12,2)")).alias("v"))
    encode_table(df1, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2,
                 resume=False, run_id="run1")
    df2 = spark.range(60, 90).select(
        F.col("id").alias("k"),
        (F.col("id") + 10**17).cast("decimal(22,2)").alias("v"))
    encode_table(df2, f"{d}/b", f"{d}/m", key_cols=("k",), n_parts=2,
                 resume=False, run_id="run2")
    # unscaled bounds at scale 2: keep v in [-5.00, 10^16]
    pred = Decimal128RangePredicate(column="v", lower=-500,
                                    upper=10**18)
    got = decode_table(spark, f"{d}/b", f"{d}/m", columns=["k", "v"],
                       predicate=pred)
    exp = (df1.select("k", F.col("v").cast("decimal(22,2)"))
           .unionAll(df2)
           .filter((F.col("v") >= -5.0) & (F.col("v") <= 10**16)))
    assert sorted(got.collect()) == sorted(exp.collect())
    assert got.count() == df1.filter(F.col("v") >= -5.0).count()
