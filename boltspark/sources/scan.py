"""Parquet scan API + CLI with the reference's exact user surface.

bolt-parquet-reader's entire user-facing query surface is
``reader_cli -f files -c "a;b" -l batch_size [-p -s skip]``
(/root/reference/examples/reader_cli.rs:32-143): projected,
predicate-filtered, batched, skip-offset streaming scans over parquet.
This module is the drop-in equivalent on Spark — a user of the
reference can run every query they run today:

    python -m boltspark.sources.scan -f data.parquet -c "a;b" -l 10000
    python -m boltspark.sources.scan -f data.parquet -c a -p -s 100000 -l 50

Filters map to the same null-aware predicate objects the decode engine
uses (engine.filters); projection/pushdown ride Catalyst's built-in
ColumnPruning / PushDownPredicate (SURVEY.md §4: "free").
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections.abc import Iterator

from ..engine.filters import Predicate


def scan(
    spark,
    files: list[str] | str,
    columns: list[str] | None = None,
    filters: list[Predicate] | None = None,
    skip: int = 0,
    limit: int | None = None,
):
    """Projected, filtered, offset scan — LocalFileReader::from_local_file
    + read + skip semantics (local_file_reader.rs:49-171) as one
    DataFrame.  ``skip``/``limit`` follow the file's row order like the
    reference's point query."""
    from pyspark.sql import functions as F

    if isinstance(files, str):
        files = [files]
    df = spark.read.parquet(*files)
    if columns:
        unknown = set(columns) - set(df.columns)
        if unknown:  # row_group_reader.rs:107-113: unknown column -> error
            raise KeyError(f"unknown columns {unknown}; file has {df.columns}")
    for pred in filters or []:
        df = df.filter(pred.to_spark_condition())
    if skip or limit is not None:
        # stable file order: rank files by their position in the given
        # list (the reference reads files in argument order), then by the
        # parquet-native per-file row index.  monotonically_increasing_id
        # would follow Spark's split packing, not the file order.
        # normalize both sides to an absolute scheme-less path and compare
        # for EQUALITY (a suffix match mis-ranks when one given path is a
        # path-suffix of another, e.g. 'x/a.parquet' vs '/data/x/a.parquet')
        # file_path may be 'file:/p', 'file:///p', 's3://b/p', or bare '/p'
        import re as _re

        def _norm(p: str) -> str:
            m = _re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:/+", p)
            if m:  # URI: strip the scheme, keep the path rooted
                return "/" + p[m.end():].lstrip("/")
            return os.path.abspath(p)

        fp_norm = F.regexp_replace(F.col("_metadata.file_path"),
                                   r"^[A-Za-z][A-Za-z0-9+.\-]*:/+", "/")
        fp = F.col("_metadata.file_path")
        rank = None
        for i, f in enumerate(files):
            cond = fp_norm == _norm(f)
            rank = F.when(cond, i) if rank is None else rank.when(cond, i)
        rank = rank.otherwise(len(files))
        w_cols = columns or list(df.columns)
        rows = df.select(*w_cols, fp.alias("__fp"),
                         F.col("_metadata.row_index").alias("__ri"),
                         rank.alias("__rank")).orderBy("__rank", "__fp", "__ri")
        if skip:
            rows = rows.offset(skip)
        if limit is not None:
            # orderBy+limit compiles to TakeOrdered(skip+limit): bounded,
            # not a full global sort, for the point-query shapes the
            # reference CLI supports.  Bulk offset reads over an encoded
            # dataset should use decode_table(part_ids=...) which skips
            # from manifest arithmetic alone.
            rows = rows.limit(limit)
        df = rows.select(*w_cols)
    elif columns:
        df = df.select(*columns)
    return df


def scan_batches(spark, files, columns=None, filters=None,
                 batch_size: int = 10_000, skip: int = 0,
                 limit: int | None = None) -> Iterator:
    """Streaming batch iterator — the shape of the reference's
    ``loop { read(batch_size) }`` (reader_cli.rs:126-130): yields Arrow
    RecordBatches without materializing the result."""
    df = scan(spark, files, columns, filters, skip, limit)
    yield from df.toArrow().to_batches(max_chunksize=batch_size)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="bolt-parquet-reader reader_cli equivalent on Spark")
    ap.add_argument("-f", "--files", required=True,
                    help="parquet file(s), ';'-separated")
    ap.add_argument("-c", "--columns", default=None,
                    help="columns to read, ';'-separated")
    ap.add_argument("-l", "--batch-size", type=int, default=10_000)
    ap.add_argument("-p", "--point-query", action="store_true")
    ap.add_argument("-s", "--skip", type=int, default=0)
    args = ap.parse_args(argv)

    from ..engine.session import get_session

    spark = get_session("boltspark-scan")
    spark.sparkContext.setLogLevel("ERROR")
    files = args.files.split(";")
    columns = args.columns.split(";") if args.columns else None

    t0 = time.time()
    if args.point_query:  # skip then one bounded read (reader_cli.rs:83-110)
        batches = scan_batches(spark, files, columns, skip=args.skip,
                               limit=args.batch_size)
    else:
        batches = scan_batches(spark, files, columns,
                               batch_size=args.batch_size)
    total = 0
    for b in batches:
        total += b.num_rows
    print(f"read {total} rows in {(time.time() - t0) * 1000:.0f} ms",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
