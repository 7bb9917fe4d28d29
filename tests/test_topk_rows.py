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


def _win_exp(df, group, value, k, tiebreak, ascending=False):
    from pyspark.sql import Window

    order = [F.col(value).asc_nulls_last() if ascending
             else F.col(value).desc_nulls_last()]
    order += [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(group).orderBy(*order)
    return (df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k))


def test_grouped_topk_rows_matches_window(spark, topk_table):
    from boltspark.engine.agg import grouped_topk_rows

    df, out, man = topk_table
    got = grouped_topk_rows(spark, out, man, "lang", "stars", k=4,
                            tiebreak=("k",))
    exp = _win_exp(df, "lang", "stars", 4, ("k",))
    assert sorted(map(tuple, got.select(*exp.columns).collect())) == \
        sorted(map(tuple, exp.collect()))
    # nulls fill the tail when a group has < k non-null values: force it
    # by asking for more rows than any lang group has non-null stars
    got_asc = grouped_topk_rows(spark, out, man, "lang", "stars", k=3,
                                ascending=True, tiebreak=("k",))
    exp_asc = _win_exp(df, "lang", "stars", 3, ("k",), ascending=True)
    assert sorted(map(tuple, got_asc.select(*exp_asc.columns).collect())) == \
        sorted(map(tuple, exp_asc.collect()))


def test_grouped_topk_rows_null_group_and_null_fill(spark, tmp_path_factory):
    from boltspark.engine.agg import grouped_topk_rows

    df = (spark.range(600)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 3 != 0,
                         (F.col("id") % 2).cast("string")).alias("g"),
                  F.when(F.col("id") % 7 != 0, F.col("id") * 11 % 97)
                  .alias("v")))
    base = tmp_path_factory.mktemp("gtkrows")
    out, man = str(base / "b"), str(base / "m")
    from boltspark.engine import encode_table

    encode_table(df, out, man, key_cols=("k",), n_parts=2, resume=False)
    # k larger than any group's non-null v count -> null rows fill
    k = 250
    got = grouped_topk_rows(spark, out, man, "g", "v", k=k, tiebreak=("k",))
    exp = _win_exp(df, "g", "v", k, ("k",))
    assert sorted(map(tuple, got.select(*exp.columns).collect())) == \
        sorted(map(tuple, exp.collect()))
    rows = got.collect()
    assert any(r["g"] is None for r in rows)  # NULL group is a group
    assert any(r["v"] is None for r in rows)  # nulls filled the tail


def test_grouped_topk_rows_group_cap(spark, topk_table):
    from boltspark.engine.agg import grouped_topk_rows

    _, out, man = topk_table
    with pytest.raises(ValueError, match="max_groups"):
        grouped_topk_rows(spark, out, man, "lang", "stars", k=2,
                          max_groups=2)


def test_grouped_topk_rows_guard_collect_is_bounded(spark, topk_table,
                                                    monkeypatch):
    """The over-cap refusal must never materialize the full group list
    on the driver: pointed at the high-cardinality key column (5000
    distinct), every driver-side collect stays <= max_groups + 1 rows."""
    # patch the CONCRETE class: in Spark 4 instances are
    # pyspark.sql.classic.dataframe.DataFrame, which overrides collect
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older Spark: one DataFrame class
        from pyspark.sql import DataFrame

    from boltspark.engine.agg import grouped_topk_rows

    _, out, man = topk_table
    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    with pytest.raises(ValueError, match="max_groups"):
        grouped_topk_rows(spark, out, man, "k", "stars", k=2, max_groups=8)
    assert sizes and max(sizes) <= 9


def test_grouped_topk_rows_projection_predicate(spark, topk_table):
    from boltspark.engine.agg import grouped_topk_rows

    df, out, man = topk_table
    pred = BytesEqPredicate(column="lang", value=b"1")
    got = grouped_topk_rows(spark, out, man, "lang", "stars", k=5,
                            columns=["k", "lang"], tiebreak=("k",),
                            predicate=pred)
    exp = _win_exp(df.filter(F.col("lang") == "1"), "lang", "stars",
                   5, ("k",)).select("k", "lang", "rnk")
    assert got.columns == ["k", "lang", "rnk"]
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_collected_timestamps_localize_to_os_zone():
    """Review fix: PySpark collect() returns timestamps as naive
    OS-local datetimes (TimestampType.fromInternal); _session_aware
    must attach the OS zone so the UTC storage-epoch conversion is
    exact on non-UTC drivers."""
    import datetime as dt
    import os
    import time as time_mod

    from boltspark.engine.agg import _session_aware
    from boltspark.engine.filters import _storage_bound

    abs_utc = dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone.utc)
    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time_mod.tzset()
    try:
        # what collect() would hand back on a NY driver: naive local
        collected = dt.datetime.fromtimestamp(abs_utc.timestamp())
        assert collected.hour == 8  # 12:00Z == 08:00 EDT
        fixed = _session_aware(None, collected)
        assert _storage_bound(fixed) == int(abs_utc.timestamp() * 1e6)
        # the naive-as-UTC misread would have been 4 h off
        assert _storage_bound(collected) != int(abs_utc.timestamp() * 1e6)
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time_mod.tzset()


def test_topk_rows_timestamps_non_utc_session(spark, tmp_path_factory):
    """Timestamp ordering end-to-end under a non-UTC SESSION timezone
    (parse/render path; collect localization is pinned above)."""
    import datetime as dt

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.range(3000).select(
            F.col("id").alias("k"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=F.col("id"))).alias("ts"))
        base = tmp_path_factory.mktemp("topktz")
        out, man = str(base / "b"), str(base / "m")
        encode_table(df, out, man, key_cols=("k",), n_parts=2,
                     block_bytes=16 << 10, resume=False)
        got = topk_rows(spark, out, man, "ts", k=10, tiebreak=("k",))
        exp = df.orderBy(F.col("ts").desc_nulls_last(), F.col("k")).limit(10)
        assert _rows(got) == _rows(exp.select(got.columns))
        assert isinstance(got.collect()[0]["ts"], dt.datetime)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_grouped_topk_rows_nan_group_raises(spark, tmp_path_factory):
    from boltspark.engine.agg import grouped_topk_rows

    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit(float("nan")))
        .otherwise(F.lit(1.0)).alias("g"),
        (F.col("id") % 7).alias("v"))
    base = tmp_path_factory.mktemp("gtknan")
    out, man = str(base / "b"), str(base / "m")
    encode_table(df, out, man, key_cols=("k",), n_parts=2, resume=False)
    with pytest.raises(NotImplementedError, match="NaN group keys"):
        grouped_topk_rows(spark, out, man, "g", "v", k=2)


def test_grouped_topk_rows_rnk_collision_raises(spark, tmp_path_factory):
    from boltspark.engine.agg import grouped_topk_rows

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("rnk"),
        (F.col("id") % 7).alias("v"))
    base = tmp_path_factory.mktemp("gtkrnk")
    out, man = str(base / "b"), str(base / "m")
    encode_table(df, out, man, key_cols=("k",), n_parts=2, resume=False)
    with pytest.raises(ValueError, match="'rnk' collides"):
        grouped_topk_rows(spark, out, man, "v", "k", k=2)
