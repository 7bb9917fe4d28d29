"""Composite predicates: OrPredicate (cross-column disjunction),
AndPredicate (conjunction nested inside OR), NotPredicate (negation —
the engine's '!=' / NOT LIKE).  The conjunctive predicate-list cascade
cannot express any of these; eval_group_predicate recurses so every
leaf keeps its zone-map/bloom/dictionary short-circuits.  Parity vs
Catalyst on nullable data, aggregate-cascade reuse, DSv2 Not pushdown,
and exact zone-verdict inversion for NOT."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.filters import (ALL, NONE, SOME, AndPredicate,
                                      BytesEqPredicate, BytesPrefixPredicate,
                                      NotPredicate, OrPredicate,
                                      RangePredicate)


@pytest.fixture(scope="module")
def comp_table(spark, tmp_path_factory):
    df = (spark.range(6000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 5 != 0,
                         (F.col("id") * 37) % 1000).alias("v"),
                  (F.col("id") % 7).cast("string").alias("lang"),
                  F.when(F.col("id") % 13 != 0, F.concat(
                      F.lit("f_"), (F.col("id") % 23).cast("string"),
                      F.lit("/x"))).alias("path")))
    base = tmp_path_factory.mktemp("compenc")
    out, man = str(base / "blocks"), str(base / "manifest")
    encode_table(df, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, block_bytes=32 << 10,
                 resume=False)
    return df, out, man


def _parity(spark, df, out, man, pred, cond, cols=("k", "v", "lang", "path")):
    got = decode_table(spark, out, man, predicate=pred, columns=list(cols))
    exp = df.select(*cols).filter(cond)
    exp_rows = sorted(map(tuple, exp.collect()))
    assert exp_rows, "vacuous parity case"
    assert sorted(map(tuple, got.collect())) == exp_rows


def test_or_cross_column_matches_catalyst(spark, comp_table):
    df, out, man = comp_table
    pred = OrPredicate([
        RangePredicate(column="v", upper=300, upper_inclusive=False),
        BytesEqPredicate(column="lang", value=b"3"),
    ])
    cond = ((F.col("v") < 300) & F.col("v").isNotNull()) | (F.col("lang") == "3")
    _parity(spark, df, out, man, pred, cond)
    # a null v row with lang='3' must survive the OR (SQL ternary)
    n = decode_table(spark, out, man, predicate=pred).filter(
        F.col("v").isNull()).count()
    assert n == df.filter(F.col("v").isNull() & (F.col("lang") == "3")).count()
    assert n > 0


def test_or_same_column_matches_catalyst(spark, comp_table):
    df, out, man = comp_table
    pred = OrPredicate([
        RangePredicate(column="v", upper=50),
        RangePredicate(column="v", lower=900, null_allowed=True),
    ])
    cond = ((F.col("v") <= 50) | (F.col("v") >= 900)) | F.col("v").isNull()
    _parity(spark, df, out, man, pred, cond)


def test_and_nested_in_or_matches_catalyst(spark, comp_table):
    df, out, man = comp_table
    pred = OrPredicate([
        AndPredicate([
            RangePredicate(column="v", lower=100, upper=400),
            BytesEqPredicate(column="lang", value=b"5"),
        ]),
        BytesPrefixPredicate(column="path", prefix=b"f_22"),
    ])
    cond = (F.col("v").between(100, 400) & (F.col("lang") == "5")) | \
        F.col("path").startswith("f_22")
    _parity(spark, df, out, man, pred, cond)


def test_not_predicate_matches_catalyst(spark, comp_table):
    df, out, man = comp_table
    # != over a dict string column (no nulls in lang)
    _parity(spark, df, out, man,
            NotPredicate(BytesEqPredicate(column="lang", value=b"3")),
            F.col("lang") != "3")
    # NOT over a nullable numeric range: NOT(NULL) is NULL -> dropped
    _parity(spark, df, out, man,
            NotPredicate(RangePredicate(column="v", lower=200, upper=800)),
            ~F.col("v").between(200, 800) & F.col("v").isNotNull())
    # ... unless null_allowed on the NOT itself
    _parity(spark, df, out, man,
            NotPredicate(RangePredicate(column="v", lower=200, upper=800),
                         null_allowed=True),
            (~F.col("v").between(200, 800)) | F.col("v").isNull())
    # NOT LIKE 'f_1%' on a nullable string column
    _parity(spark, df, out, man,
            NotPredicate(BytesPrefixPredicate(column="path", prefix=b"f_1")),
            ~F.col("path").startswith("f_1") & F.col("path").isNotNull())


def test_not_zone_verdicts_invert_exactly():
    r = RangePredicate(column="v", lower=0, upper=10)
    n = NotPredicate(r)
    # child ALL (zone inside range, no nulls) -> NOT skips the block
    assert n.check_zone({"vmin": 2, "vmax": 9, "has_null": False}) == NONE
    # child NONE (zone disjoint) -> NOT accepts the whole block unopened
    assert n.check_zone({"vmin": 20, "vmax": 30, "has_null": False}) == ALL
    # nulls present: 'all valid pass' is not 'all rows pass'
    assert n.check_zone({"vmin": 20, "vmax": 30, "has_null": True}) == SOME
    assert NotPredicate(r, null_allowed=True).check_zone(
        {"vmin": 20, "vmax": 30, "has_null": True}) == ALL
    assert n.check_zone({"vmin": 5, "vmax": 30, "has_null": False}) == SOME
    # the child's own null_allowed must NOT leak into the inversion
    ra = RangePredicate(column="v", lower=0, upper=10, null_allowed=True)
    assert NotPredicate(ra).check_zone(
        {"vmin": 2, "vmax": 9, "has_null": False}) == NONE


def test_not_rejects_composites():
    with pytest.raises(TypeError):
        NotPredicate(OrPredicate([RangePredicate(column="v", upper=1)]))
    with pytest.raises(TypeError):
        NotPredicate(NotPredicate(RangePredicate(column="v", upper=1)))


def test_or_in_aggregate_cascade(spark, comp_table):
    from boltspark.engine.agg import column_sum, value_counts

    df, out, man = comp_table
    pred = OrPredicate([
        RangePredicate(column="v", upper=100),
        BytesEqPredicate(column="lang", value=b"6"),
    ])
    cond = ((F.col("v") <= 100) & F.col("v").isNotNull()) | (F.col("lang") == "6")
    got = column_sum(spark, out, man, "k", predicate=pred).collect()[0]
    exp = df.filter(cond).agg(F.sum("k").alias("s"),
                              F.count(F.lit(1)).alias("n")).collect()[0]
    assert got["n_rows"] == exp["n"] > 0
    assert got["sum_value"] == float(exp["s"])
    got_vc = {r["value"]: r["cnt"] for r in value_counts(
        spark, out, man, "lang", predicate=pred).collect()}
    exp_vc = {r["lang"]: r["n"] for r in df.filter(cond).groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got_vc == exp_vc


def test_not_via_datasource_pushdown(spark, comp_table):
    from boltspark.sources import datasource as ds

    df, out, man = comp_table
    r = ds.load(spark, out, man)
    got = r.filter(F.col("lang") != "2").select("k", "lang")
    exp = df.filter(F.col("lang") != "2").select("k", "lang")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))
    # NOT over a nullable column through DSv2: ternary rule holds
    r2 = ds.load(spark, out, man)
    got2 = r2.filter(~F.col("path").startswith("f_1")).select("k", "path")
    exp2 = df.filter(~F.col("path").startswith("f_1")).select("k", "path")
    assert sorted(map(tuple, got2.collect())) == \
        sorted(map(tuple, exp2.collect()))


def test_or_with_evolved_column(spark, tmp_path_factory):
    """OR where one child's column is absent from older runs (schema
    evolution): absent = all-null for that child, so only the other
    disjunct can keep those rows."""
    base = tmp_path_factory.mktemp("compevo")
    out, man = str(base / "blocks"), str(base / "manifest")
    df1 = spark.range(800).select(F.col("id").alias("k"),
                                  (F.col("id") % 10).alias("a"))
    encode_table(df1, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, resume=False)
    df2 = spark.range(800, 1600).select(F.col("id").alias("k"),
                                        (F.col("id") % 10).alias("a"),
                                        (F.col("id") % 3).alias("b"))
    encode_table(df2, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, resume=False)
    pred = OrPredicate([RangePredicate(column="a", upper=1),
                        RangePredicate(column="b", lower=2)])
    got = decode_table(spark, out, man, predicate=pred, columns=["k"])
    union = df1.select("k", "a", F.lit(None).cast("long").alias("b")) \
        .unionByName(df2)
    exp = union.filter(((F.col("a") <= 1) & F.col("a").isNotNull())
                       | ((F.col("b") >= 2) & F.col("b").isNotNull())) \
        .select("k")
    assert sorted(r[0] for r in got.collect()) == \
        sorted(r[0] for r in exp.collect())


def test_not_over_d128_range(spark, tmp_path_factory):
    """NotPredicate propagates supports_d128 from its child, so
    NOT(decimal38 range) filters d128 word-pair blocks instead of
    tripping the decode guard; ternary null rule holds."""
    from decimal import Decimal

    from boltspark.engine.filters import Decimal128RangePredicate

    df = (spark.range(2000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 9 != 0,
                         F.concat(F.col("id").cast("string"),
                                  F.lit("0" * 21)).cast("decimal(38,0)"))
                  .alias("d")))  # exact id * 10^21, needs >64 bits
    base = tmp_path_factory.mktemp("notd128")
    out, man = str(base / "b"), str(base / "m")
    encode_table(df, out, man, key_cols=("k",), n_parts=2, resume=False)
    lo, hi = 500 * 10**21, 1500 * 10**21  # unscaled (scale 0) bounds
    pred = NotPredicate(Decimal128RangePredicate(column="d", lower=lo,
                                                 upper=hi))
    got = decode_table(spark, out, man, predicate=pred, columns=["k"])
    exp = df.filter(~F.col("d").between(
        Decimal(500 * 10**21), Decimal(1500 * 10**21))
        & F.col("d").isNotNull()).select("k")
    assert sorted(r[0] for r in got.collect()) == \
        sorted(r[0] for r in exp.collect())


def test_not_preserves_temporal_spark_literals():
    """Review fix: NotPredicate's null_allowed-stripped child copy must
    keep the user's original datetime bounds for to_spark_condition
    (a plain dataclasses.replace re-runs __post_init__ on the already-
    converted epoch ints and clobbers them)."""
    import datetime as dt

    child = RangePredicate(column="ts", lower=dt.datetime(2024, 1, 1),
                           null_allowed=True)
    n = NotPredicate(child)
    assert isinstance(n._vchild._spark_lower, dt.datetime)
    # and the storage-side bound stays the epoch integer
    assert isinstance(n._vchild.lower, int)
