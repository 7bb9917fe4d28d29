"""BytesRangePredicate: lexicographic byte-column ranges (path >= 'a/'
AND path < 'b/') with 24-byte-prefix zone pruning — parity vs Catalyst
incl. nulls and bound inclusivity, block-skip on sorted data, NOT
inversion, DSv2 string-range pushdown, and string-ordered topk_rows."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from boltspark.engine import decode_table, encode_table
from boltspark.engine.filters import (ALL, NONE, BytesRangePredicate,
                                      NotPredicate)
from boltspark.kernels import strings


def test_check_bytes_matches_python(rng):
    vals = [bytes(rng.integers(0, 256, rng.integers(0, 20)).astype(np.uint8))
            for _ in range(400)] + [b"", b"m", b"mm", b"\xff"]
    col = strings.from_pylist(vals)
    for lo, hi, li, ui in ((b"m", b"t", True, True), (b"m", b"t", False, False),
                           (None, b"m", True, True), (b"\x00", None, True, True),
                           (b"", b"", True, True)):
        p = BytesRangePredicate(column="c", lower=lo, upper=hi,
                                lower_inclusive=li, upper_inclusive=ui)
        got = p.check_bytes(col)
        exp = np.array([
            (lo is None or (v >= lo if li else v > lo))
            and (hi is None or (v <= hi if ui else v < hi)) for v in vals])
        assert (np.asarray(got) == exp).all(), (lo, hi, li, ui)


def test_zone_verdicts():
    p = BytesRangePredicate(column="c", lower=b"b/", upper=b"c/",
                            upper_inclusive=False)
    exact = dict(vmin_exact=True, vmax_exact=True, has_null=False)
    assert p.check_zone({"vmin_pfx": b"a/a", "vmax_pfx": b"a/z", **exact}) == NONE
    assert p.check_zone({"vmin_pfx": b"d/a", "vmax_pfx": b"d/z", **exact}) == NONE
    assert p.check_zone({"vmin_pfx": b"b/a", "vmax_pfx": b"b/z", **exact}) == ALL
    # inexact max prefix: ALL still provable when upper's prefix clears it
    inexact = dict(vmin_exact=True, vmax_exact=False, has_null=False)
    assert p.check_zone({"vmin_pfx": b"b/a", "vmax_pfx": b"b/z", **inexact}) == ALL
    # inexact max at the boundary: b/z... could extend past c/? no — stays ALL
    # but a max prefix equal to the upper bound cannot prove containment
    assert p.check_zone(
        {"vmin_pfx": b"b/a", "vmax_pfx": b"c/", **inexact}) != NONE


@pytest.fixture(scope="module")
def path_sorted(spark, tmp_path_factory):
    df = (spark.range(8000)
          .select(F.col("id").alias("k"),
                  F.when(F.col("id") % 17 != 0, F.concat(
                      F.lpad((F.col("id") % 26).cast("string"), 2, "0"),
                      F.lit("/f"), (F.col("id") % 400).cast("string")))
                  .alias("path")))
    base = tmp_path_factory.mktemp("brange")
    out, man = str(base / "b"), str(base / "m")
    encode_table(df, out, man, key_cols=("k",), sort_cols=("path",),
                 n_parts=4, block_bytes=4 << 10, resume=False)
    return df, out, man


def test_decode_matches_catalyst(spark, path_sorted):
    df, out, man = path_sorted
    for lo, hi, ui, na in (("05/", "10/", False, False),
                           ("20/", None, True, False),
                           (None, "03/", False, True)):
        pred = BytesRangePredicate(column="path", lower=lo, upper=hi,
                                   upper_inclusive=ui, null_allowed=na)
        got = decode_table(spark, out, man, predicate=pred)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("path") >= lo)
        if hi is not None:
            cond = cond & ((F.col("path") <= hi) if ui else (F.col("path") < hi))
        cond = (cond | F.col("path").isNull()) if na else \
            (cond & F.col("path").isNotNull())
        exp = df.filter(cond)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, exp.collect())), (lo, hi)


def test_zone_pruning_on_sorted_paths(spark, path_sorted):
    from boltspark.engine.stats import explain_scan

    _, out, man = path_sorted
    pred = BytesRangePredicate(column="path", lower=b"10/", upper=b"12/")
    rep = {r["verdict"]: r["n_groups"]
           for r in explain_scan(spark, out, man, predicate=pred).collect()}
    total = sum(rep.values())
    assert rep.get("skip", 0) > total // 2  # sorted data -> most blocks skip


def test_not_bytes_range(spark, path_sorted):
    df, out, man = path_sorted
    pred = NotPredicate(BytesRangePredicate(column="path", lower="05/",
                                            upper="20/"))
    got = decode_table(spark, out, man, predicate=pred)
    exp = df.filter(~((F.col("path") >= "05/") & (F.col("path") <= "20/"))
                    & F.col("path").isNotNull())
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_string_range_via_datasource(spark, path_sorted):
    from boltspark.sources import datasource as ds

    df, out, man = path_sorted
    r = ds.load(spark, out, man)
    got = r.filter((F.col("path") >= "07/") & (F.col("path") < "09/"))
    exp = df.filter((F.col("path") >= "07/") & (F.col("path") < "09/"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))


def test_topk_rows_string_order(spark, path_sorted):
    from boltspark.engine.agg import topk_rows

    df, out, man = path_sorted
    got = topk_rows(spark, out, man, "path", k=15, tiebreak=("k",))
    exp = df.orderBy(F.col("path").desc_nulls_last(), F.col("k")).limit(15)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in exp.select(got.columns).collect()]
    got_asc = topk_rows(spark, out, man, "path", k=15, ascending=True,
                        tiebreak=("k",))
    exp_asc = df.orderBy(F.col("path").asc_nulls_last(), F.col("k")).limit(15)
    assert [tuple(r) for r in got_asc.collect()] == \
        [tuple(r) for r in exp_asc.select(got_asc.columns).collect()]
