"""Capture .explain('formatted') for the bench-relevant query plans.

Usage: python bench/capture_plans.py --repo /root/repo --out plans/r06 \
           --suffix after [--sf-dir /root/testdata/sf0.1]

Run once against the round-start checkout (--suffix before) and once
against HEAD (--suffix after); the judge reads the files, not a live
Spark.  Plans captured:

  encode            the clustered DataFrame feeding the encode mapInArrow
  decode_corpus     full decode_table of an encoded corpus
  decode_filtered   predicate decode (JVM zone prefilter + pushdown)
  decode_point      part_ids point query (PushedFilters on part_id)
  verify            the bench's sha256 full-outer verification join
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    sys.path.insert(0, args.repo)
    os.makedirs(args.out, exist_ok=True)

    import tempfile

    from pyspark.sql import functions as F

    from boltspark import corpus
    from boltspark.engine import decode_table, encode_table
    from boltspark.engine.encode import DEFAULT_KEY_COLS
    from boltspark.engine.filters import BytesPrefixPredicate
    from boltspark.engine.partitioner import (
        DEFAULT_TARGET_PARTITION_BYTES, estimate_bytes_fast, num_partitions,
        with_partition_id)
    from boltspark.engine.session import get_session

    spark = get_session(f"plans-{args.suffix}", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = "/tmp/bsk_plans_corpus.parquet"
    if not os.path.exists(corpus_path):
        corpus.write_parquet(corpus_path, 20000)
    df = spark.read.parquet(corpus_path)
    columns = list(df.columns)
    df_sel = df.select(*dict.fromkeys(list(DEFAULT_KEY_COLS) + columns))
    n_parts = num_partitions(
        estimate_bytes_fast(df, columns), DEFAULT_TARGET_PARTITION_BYTES,
        min_parts=spark.sparkContext.defaultParallelism)

    def cap(name, dframe):
        buf = io.StringIO()
        with redirect_stdout(buf):
            dframe.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)

    cap("encode", with_partition_id(df_sel, DEFAULT_KEY_COLS, n_parts))

    d = tempfile.mkdtemp(prefix="bsk_plans_")
    encode_table(df, f"{d}/blocks", f"{d}/manifest", resume=False)
    cap("decode_corpus", decode_table(spark, f"{d}/blocks", f"{d}/manifest"))
    cap("decode_filtered", decode_table(
        spark, f"{d}/blocks", f"{d}/manifest",
        columns=["repo", "path", "lang"],
        predicate=BytesPrefixPredicate(column="repo", prefix=b"org3/")))
    cap("decode_point", decode_table(
        spark, f"{d}/blocks", f"{d}/manifest",
        columns=["repo", "lang"], part_ids=[0, 1]))

    decoded = decode_table(spark, f"{d}/blocks", f"{d}/manifest")
    orig_h = df.select(F.sha2("content", 256).alias("h"))
    back_h = decoded.select(F.sha2("content", 256).alias("h"))
    cap("verify", orig_h.groupBy("h").count().join(
        back_h.groupBy("h").count().withColumnRenamed("count", "c2"),
        "h", "full_outer").filter(
        (F.col("count").isNull()) | (F.col("c2").isNull())
        | (F.col("count") != F.col("c2"))))

    spark.stop()


if __name__ == "__main__":
    main()
