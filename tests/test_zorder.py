"""Z-order clustering (encode_table zorder_cols=): interleaved-bit
multi-dimensional sort gives every block narrow zone ranges on ALL the
zorder columns — a range predicate on ANY of them prunes blocks, where
plain sort_cols clustering serves only its leading column.  Measured
with explain_scan (metadata-only); round-trip correctness unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.filters import RangePredicate
from boltspark.engine.stats import explain_scan


@pytest.fixture(scope="module")
def grid(spark):
    # two independent uniform dimensions: x row-major, y column-major —
    # a single-column sort can cluster one but never both
    return (spark.range(40000)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 200).alias("x"),
                    ((F.col("id") * 7919) % 200).alias("y")))


def _skip_fraction(spark, out, man, col):
    pred = RangePredicate(column=col, lower=40, upper=59)  # 10% slice
    rep = {r["verdict"]: r["n_groups"]
           for r in explain_scan(spark, out, man, predicate=pred).collect()}
    total = sum(rep.values())
    return rep.get("skip", 0) / total, total


def test_zorder_prunes_both_dimensions(spark, grid, tmp_path_factory):
    base = tmp_path_factory.mktemp("zord")
    zo, zm = str(base / "zb"), str(base / "zm")
    encode_table(grid, zo, zm, key_cols=("k",), zorder_cols=("x", "y"),
                 n_parts=2, block_bytes=8 << 10, resume=False)
    so, sm = str(base / "sb"), str(base / "sm")
    encode_table(grid, so, sm, key_cols=("k",), sort_cols=("x",),
                 n_parts=2, block_bytes=8 << 10, resume=False)
    zx, n = _skip_fraction(spark, zo, zm, "x")
    zy, _ = _skip_fraction(spark, zo, zm, "y")
    sx, _ = _skip_fraction(spark, so, sm, "x")
    sy, _ = _skip_fraction(spark, so, sm, "y")
    assert n > 20  # enough blocks for fractions to mean something
    # single-column sort: leading column prunes hard, the other ~never
    assert sx > 0.8 and sy < 0.1, (sx, sy)
    # z-order: BOTH dimensions prune meaningfully
    assert zx > 0.4 and zy > 0.4, (zx, zy)


def test_zorder_roundtrip_and_filter_parity(spark, grid, tmp_path_factory):
    base = tmp_path_factory.mktemp("zordrt")
    out, man = str(base / "b"), str(base / "m")
    encode_table(grid, out, man, key_cols=("k",), zorder_cols=("x", "y"),
                 n_parts=2, resume=False)
    got = decode_table(spark, out, man)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, grid.collect()))
    pred = [RangePredicate(column="x", lower=10, upper=20),
            RangePredicate(column="y", lower=100, upper=120)]
    got_f = decode_table(spark, out, man, predicate=pred)
    exp_f = grid.filter(F.col("x").between(10, 20)
                        & F.col("y").between(100, 120))
    assert sorted(map(tuple, got_f.collect())) == \
        sorted(map(tuple, exp_f.collect()))


def test_zorder_guards(spark, grid, tmp_path_factory):
    base = tmp_path_factory.mktemp("zordg")
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_table(grid, str(base / "a"), str(base / "am"),
                     key_cols=("k",), sort_cols=("x",),
                     zorder_cols=("y",), resume=False)
    s = grid.withColumn("s", F.col("x").cast("string"))
    with pytest.raises(TypeError, match="numeric-only"):
        encode_table(s, str(base / "b"), str(base / "bm"),
                     key_cols=("k",), zorder_cols=("s",), resume=False)


def test_zorder_constant_and_null_dims(spark, tmp_path_factory):
    """Constant or all-null dimensions carry no bits but never break
    the encode; null values bucket to 0."""
    df = (spark.range(2000)
          .select(F.col("id").alias("k"),
                  F.lit(7).alias("c"),
                  F.when(F.col("id") % 5 != 0, F.col("id") % 50).alias("v")))
    base = tmp_path_factory.mktemp("zordn")
    out, man = str(base / "b"), str(base / "m")
    encode_table(df, out, man, key_cols=("k",), zorder_cols=("c", "v"),
                 n_parts=2, resume=False)
    got = decode_table(spark, out, man)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, df.collect()))


def test_recluster_restores_pruning(spark, tmp_path_factory):
    """OPTIMIZE-style recluster: three arrival-order appends leave wide
    zone ranges; recluster_table(zorder_cols=) restores multi-dim
    pruning and the data is bit-identical."""
    from boltspark.engine.compact import recluster_table

    base = tmp_path_factory.mktemp("reclust")
    out, man = str(base / "b"), str(base / "m")
    for i in range(3):  # arrival order: x/y interleave badly per run
        df = (spark.range(i * 8000, (i + 1) * 8000)
              .select(F.col("id").alias("k"),
                      ((F.col("id") * 37) % 200).alias("x"),
                      ((F.col("id") * 7919) % 200).alias("y")))
        encode_table(df, out, man, key_cols=("k",), n_parts=2,
                     block_bytes=8 << 10, resume=False)
    full = (spark.range(24000)
            .select(F.col("id").alias("k"),
                    ((F.col("id") * 37) % 200).alias("x"),
                    ((F.col("id") * 7919) % 200).alias("y")))
    before_x, _ = _skip_fraction(spark, out, man, "x")
    ro, rm = str(base / "rb"), str(base / "rm")
    res = recluster_table(spark, out, man, ro, rm, zorder_cols=("x", "y"),
                          block_bytes=8 << 10)
    after_x, n = _skip_fraction(spark, ro, rm, "x")
    after_y, _ = _skip_fraction(spark, ro, rm, "y")
    assert before_x < 0.1 and after_x > 0.4 and after_y > 0.4, \
        (before_x, after_x, after_y)
    got = decode_table(spark, ro, rm)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, full.collect()))
    # guards
    with pytest.raises(ValueError, match="sort_cols or zorder_cols"):
        recluster_table(spark, out, man, str(base / "x"), str(base / "xm"))
