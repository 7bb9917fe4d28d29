"""Decimal support in column_minmax / column_topk: unscaled-integer
storage (int64 low words for p<=18, d128 word pairs for p<=38) must
surface as digit-exact Decimal results — previously both operators
raised on decimal columns (round-5 gap)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from boltspark.engine import encode_table
from boltspark.engine.agg import column_minmax, column_topk
from boltspark.engine.filters import RangePredicate


@pytest.fixture(scope="module")
def dec_table(spark, tmp_path_factory):
    """decimal(14,3) (int64 path) and decimal(38,4) (d128 path, values
    needing the high word, alternating sign for two's-complement
    carries), plus nulls."""
    df = (spark.range(6000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 17 != 0,
                         (F.col("id").cast("decimal(14,3)") - 3000) / 7)
                  .alias("d"),
                  F.expr(
                      "CAST((CAST(id AS DECIMAL(38,0)) * 1000000000000000000"
                      " + id * 13) * CASE WHEN id % 2 = 0 THEN -1 ELSE 1 END"
                      " AS DECIMAL(38,4))").alias("w")))
    base = tmp_path_factory.mktemp("decmm")
    out, man = str(base / "blocks"), str(base / "manifest")
    encode_table(df, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, block_bytes=64 << 10,
                 resume=False)
    return df, out, man


def test_decimal_minmax_exact(spark, dec_table):
    df, out, man = dec_table
    for col in ("d", "w"):
        got = column_minmax(spark, out, man, col).collect()[0]
        exp = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi"),
                     F.sum(F.col(col).isNull().cast("long")).alias("z")
                     ).collect()[0]
        assert got["vmin"] == exp["lo"], col
        assert got["vmax"] == exp["hi"], col
        assert got["n_nulls"] == exp["z"], col


def test_decimal_minmax_filtered(spark, dec_table):
    df, out, man = dec_table
    pred = RangePredicate(column="k", lower=1000, upper=4500,
                          null_allowed=False)
    cond = (F.col("k") >= 1000) & (F.col("k") <= 4500)
    for col in ("d", "w"):
        got = column_minmax(spark, out, man, col, predicate=pred).collect()[0]
        exp = df.filter(cond).agg(F.min(col).alias("lo"),
                                  F.max(col).alias("hi")).collect()[0]
        assert got["vmin"] == exp["lo"] and got["vmax"] == exp["hi"], col


def test_decimal_topk_exact(spark, dec_table):
    df, out, man = dec_table
    for col in ("d", "w"):
        for asc in (False, True):
            got = [r["value"] for r in
                   column_topk(spark, out, man, col, k=7,
                               ascending=asc).collect()]
            order = F.col(col).asc() if asc else F.col(col).desc()
            exp = [r[col] for r in
                   df.filter(F.col(col).isNotNull())
                   .orderBy(order).limit(7).collect()]
            assert got == exp, (col, asc)


def test_decimal_topk_filtered(spark, dec_table):
    df, out, man = dec_table
    pred = RangePredicate(column="k", lower=2000, upper=5000,
                          null_allowed=False)
    got = [r["value"] for r in
           column_topk(spark, out, man, "w", k=5, predicate=pred).collect()]
    exp = [r["w"] for r in
           df.filter((F.col("k") >= 2000) & (F.col("k") <= 5000))
           .orderBy(F.col("w").desc()).limit(5).collect()]
    assert got == exp
