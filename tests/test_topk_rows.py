"""topk_rows: whole-row ORDER BY col LIMIT k — phase 1 finds the k-th
value in the compressed domain (column_topk), phase 2 decodes only the
at-or-beyond-threshold rows (zone maps skip the rest), Catalyst sorts
the survivors.  Parity vs decode-everything + orderBy, NULLS LAST
fill, tie determinism, predicate composition, decimal ranking."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.agg import topk_rows
from boltspark.engine.filters import BytesEqPredicate


@pytest.fixture(scope="module")
def topk_table(spark, tmp_path_factory):
    df = (spark.range(5000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 11 != 0,
                         (F.col("id") * 7919) % 2000).alias("stars"),
                  (F.col("id") % 5).cast("string").alias("lang"),
                  ((F.col("id") % 997) / F.lit(100.0))
                  .cast("decimal(12,2)").alias("price")))
    base = tmp_path_factory.mktemp("topkrows")
    out, man = str(base / "blocks"), str(base / "manifest")
    encode_table(df, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, block_bytes=32 << 10,
                 resume=False)
    return df, out, man


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_topk_rows_matches_full_sort(spark, topk_table):
    df, out, man = topk_table
    got = topk_rows(spark, out, man, "stars", k=25, tiebreak=("k",))
    exp = df.orderBy(F.col("stars").desc_nulls_last(), F.col("k")).limit(25)
    assert _rows(got) == _rows(exp.select(got.columns))
    got_asc = topk_rows(spark, out, man, "stars", k=25, ascending=True,
                        tiebreak=("k",))
    exp_asc = df.orderBy(F.col("stars").asc_nulls_last(), F.col("k")).limit(25)
    assert _rows(got_asc) == _rows(exp_asc.select(got_asc.columns))


def test_topk_rows_projection_and_predicate(spark, topk_table):
    df, out, man = topk_table
    got = topk_rows(spark, out, man, "stars", k=10,
                    columns=["k", "lang"], tiebreak=("k",),
                    predicate=BytesEqPredicate(column="lang", value=b"3"))
    exp = (df.filter(F.col("lang") == "3")
           .orderBy(F.col("stars").desc_nulls_last(), F.col("k"))
           .limit(10).select("k", "lang"))
    assert got.columns == ["k", "lang"]
    assert _rows(got) == _rows(exp)


def test_topk_rows_nulls_fill_the_tail(spark, topk_table):
    """Fewer than k non-null values under the predicate: SQL NULLS LAST
    pads the limit with null rows — so must we."""
    df, out, man = topk_table
    # lang='0' rows where id%11==0 have null stars; shrink the non-null
    # pool below k by predicating on a narrow slice
    pred = BytesEqPredicate(column="lang", value=b"0")
    n_lang0 = df.filter(F.col("lang") == "0").count()
    k = n_lang0 + 7  # more than every lang-0 row -> all survive
    got = topk_rows(spark, out, man, "stars", k=k, predicate=pred,
                    tiebreak=("k",))
    exp = (df.filter(F.col("lang") == "0")
           .orderBy(F.col("stars").desc_nulls_last(), F.col("k")).limit(k))
    assert _rows(got) == _rows(exp.select(got.columns))
    assert any(r["stars"] is None for r in got.collect())


def test_topk_rows_all_null_order_column(spark, tmp_path_factory):
    df = spark.range(300).select(
        F.col("id").alias("k"), F.lit(None).cast("long").alias("v"))
    base = tmp_path_factory.mktemp("topknull")
    out, man = str(base / "blocks"), str(base / "manifest")
    encode_table(df, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, resume=False)
    got = topk_rows(spark, out, man, "v", k=5, tiebreak=("k",))
    assert [r["k"] for r in got.collect()] == [0, 1, 2, 3, 4]
    assert all(r["v"] is None for r in got.collect())


def test_topk_rows_decimal(spark, topk_table):
    df, out, man = topk_table
    got = topk_rows(spark, out, man, "price", k=8, tiebreak=("k",))
    exp = df.orderBy(F.col("price").desc_nulls_last(), F.col("k")).limit(8)
    assert _rows(got) == _rows(exp.select(got.columns))
    assert isinstance(got.collect()[0]["price"], Decimal)


def test_topk_rows_string_order_column(spark, topk_table):
    """Byte columns rank lexicographically (BytesRangePredicate
    threshold); list/map/struct order columns still refuse."""
    df, out, man = topk_table
    got = topk_rows(spark, out, man, "lang", k=9, tiebreak=("k",))
    exp = df.orderBy(F.col("lang").desc_nulls_last(), F.col("k")).limit(9)
    assert _rows(got) == _rows(exp.select(got.columns))


def test_topk_rows_decodes_only_threshold_rows(spark, topk_table):
    """The phase-2 scan's predicate keeps <= ties-inclusive survivors,
    not the table: check by running the same threshold decode."""
    from boltspark.engine.filters import RangePredicate

    df, out, man = topk_table
    got = topk_rows(spark, out, man, "stars", k=12, tiebreak=("k",))
    kth = [r["stars"] for r in
           df.orderBy(F.col("stars").desc_nulls_last()).limit(12).collect()][-1]
    survivors = decode_table(
        spark, out, man,
        predicate=RangePredicate(column="stars", lower=int(kth))).count()
    total = df.count()
    assert survivors < total / 10  # the decode is a sliver of the table
    assert got.count() == 12
