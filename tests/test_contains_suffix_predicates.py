"""BytesContainsPredicate / BytesSuffixPredicate (LIKE '%s%' and LIKE
'%s'): byte-level substring/suffix pushdown into the decode cascade.
No order relation -> no zone pruning, but the dictionary path evaluates
the scan once per DISTINCT value; parity vs Catalyst incl. nulls, and
DSv2 StringContains/StringEndsWith land as engine predicates."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.filters import (BytesContainsPredicate,
                                      BytesSuffixPredicate)
from boltspark.kernels import strings


def test_check_bytes_matches_python(rng):
    vals = [bytes(rng.integers(0, 256, rng.integers(0, 30)).astype(np.uint8))
            for _ in range(500)] + [b"", b"ab", b"xabx"]
    col = strings.from_pylist(vals)
    for needle in (b"ab", b"\x00", b"", b"zzz-not-there"):
        got = BytesContainsPredicate(column="c", needle=needle).check_bytes(col)
        exp = np.array([needle in v for v in vals])
        assert (np.asarray(got) == exp).all(), needle
        got = BytesSuffixPredicate(column="c", suffix=needle).check_bytes(col)
        exp = np.array([v.endswith(needle) for v in vals])
        assert (np.asarray(got) == exp).all(), needle


@pytest.fixture(scope="module")
def path_table(spark, tmp_path_factory):
    df = (spark.range(4000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 13 != 0, F.concat(
                      F.lit("repo/"), (F.col("id") % 37).cast("string"),
                      F.lit("/src/mod_"), (F.col("id") % 11).cast("string"),
                      F.when(F.col("id") % 3 == 0, F.lit(".py"))
                      .when(F.col("id") % 3 == 1, F.lit(".rs"))
                      .otherwise(F.lit(".go")))).alias("path"),
                  (F.col("id") % 7).cast("string").alias("lang")))
    base = tmp_path_factory.mktemp("containsenc")
    out, man = str(base / "blocks"), str(base / "manifest")
    encode_table(df, out, man, key_cols=("k",),
                 target_partition_bytes=1 << 18, block_bytes=32 << 10,
                 resume=False)
    return df, out, man


def test_contains_decode_matches_catalyst(spark, path_table):
    df, out, man = path_table
    for needle, null_allowed in ((b"/src/", False), (b"mod_1", False),
                                 (b".py", True), (b"absent!", False)):
        pred = BytesContainsPredicate(column="path", needle=needle,
                                      null_allowed=null_allowed)
        got = decode_table(spark, out, man, predicate=pred,
                           columns=["k", "path"])
        cond = F.col("path").contains(needle.decode())
        cond = (cond | F.col("path").isNull()) if null_allowed else \
            (cond & F.col("path").isNotNull())
        exp = df.select("k", "path").filter(cond)
        assert sorted(got.collect()) == sorted(exp.collect()), needle


def test_suffix_decode_matches_catalyst(spark, path_table):
    df, out, man = path_table
    for suffix, null_allowed in ((b".py", False), (b".rs", True),
                                 (b"", False), (b"nope", False)):
        pred = BytesSuffixPredicate(column="path", suffix=suffix,
                                    null_allowed=null_allowed)
        got = decode_table(spark, out, man, predicate=pred,
                           columns=["k", "path"])
        cond = F.col("path").endswith(suffix.decode())
        cond = (cond | F.col("path").isNull()) if null_allowed else \
            (cond & F.col("path").isNotNull())
        exp = df.select("k", "path").filter(cond)
        assert sorted(got.collect()) == sorted(exp.collect()), suffix


def test_contains_via_datasource_pushdown(spark, path_table):
    from boltspark.sources import datasource as ds

    df, out, man = path_table
    r = ds.load(spark, out, man)
    got = (r.filter(F.col("path").contains("/src/mod_3")
                    & F.col("path").endswith(".py"))
           .select("k", "path"))
    exp = df.filter(F.col("path").contains("/src/mod_3")
                    & F.col("path").endswith(".py")).select("k", "path")
    assert sorted(got.collect()) == sorted(exp.collect())


def test_contains_in_aggregate_cascade(spark, path_table):
    """Predicate classes plug into the aggregate mask cascade too."""
    from boltspark.engine.agg import column_sum

    df, out, man = path_table
    pred = BytesContainsPredicate(column="path", needle=b".rs")
    got = column_sum(spark, out, man, "k", predicate=pred).collect()[0]
    exp = df.filter(F.col("path").contains(".rs")).agg(
        F.sum("k").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    assert got["n_rows"] == exp["n"]
    assert got["sum_value"] == float(exp["s"])
