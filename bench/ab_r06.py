"""Round-6 interleaved same-phase A/B experiments (guide §1, CLAUDE.md
measurement discipline: only interleaved same-phase A/Bs are strong
evidence on this host).

Experiments (all noop-sink, best-of-N interleaved A/B/A/B):
  sort        repartition+sort vs repartition only (encode shuffle)
  batch       arrow.maxRecordsPerBatch 2048 vs 8192 for the boundary
  skew        repartition(P) vs repartition(8P) on the part column
  split       decode with maxPartitionBytes 128m vs 16m
  codec       (separate sessions) lz4 vs zstd shuffle codec

Usage: python bench/ab_r06.py [--sf-dir DIR] [--exp sort,batch,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _host_probe


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def interleave(name_a, fn_a, name_b, fn_b, rounds=3):
    """A/B/A/B...: report best-of per side from the same window."""
    best = {name_a: None, name_b: None}
    for _ in range(rounds):
        for name, fn in ((name_a, fn_a), (name_b, fn_b)):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            b = best[name]
            best[name] = dt if b is None else min(b, dt)
    print(json.dumps({k: round(v, 3) for k, v in best.items()}), flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("--exp", default="sort,batch,skew,split")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    exps = set(args.exp.split(","))

    import re
    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    sf = float(m.group(1)) if m else 0.1

    print(json.dumps({"probe": _host_probe()}), flush=True)

    from pyspark.sql import functions as F

    from boltspark import corpus
    from boltspark.engine import encode_table
    from boltspark.engine.encode import DEFAULT_KEY_COLS
    from boltspark.engine.partitioner import (
        DEFAULT_TARGET_PARTITION_BYTES, PART_COL, estimate_bytes_fast,
        num_partitions, with_partition_id)
    from boltspark.engine.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_session("bsk-ab-r06", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    mb = int(os.environ.get("BOLTSPARK_BENCH_MB", max(32, int(4096 * sf))))
    n_rows = int(mb * 1e6 / 2600)
    corpus_path = f"/tmp/boltspark_bench_corpus_{n_rows}.parquet"
    if not os.path.exists(corpus_path):
        corpus.write_parquet(corpus_path, n_rows)
    df = spark.read.parquet(corpus_path)
    df.count()
    columns = list(df.columns)
    df_sel = df.select(*dict.fromkeys(list(DEFAULT_KEY_COLS) + columns))
    n_parts = num_partitions(
        estimate_bytes_fast(df, columns), DEFAULT_TARGET_PARTITION_BYTES,
        min_parts=spark.sparkContext.defaultParallelism)
    noop(df_sel)  # warm scan + workers

    keyed = with_partition_id(df_sel, DEFAULT_KEY_COLS, n_parts)
    keyed_nosort = df_sel.withColumn(
        PART_COL, F.pmod(F.xxhash64(*[F.col(c) for c in DEFAULT_KEY_COLS]),
                         F.lit(n_parts))).repartition(n_parts, F.col(PART_COL))

    if "sort" in exps:
        print("== sort: repartition+sortWithinPartitions vs repartition only",
              flush=True)
        interleave("with_sort", lambda: noop(keyed),
                   "no_sort", lambda: noop(keyed_nosort), args.rounds)

    if "skew" in exps:
        print("== skew: repartition(P) vs repartition(8P) on part col",
              flush=True)
        keyed8 = df_sel.withColumn(
            PART_COL, F.pmod(F.xxhash64(*[F.col(c) for c in DEFAULT_KEY_COLS]),
                             F.lit(n_parts))).repartition(
            8 * n_parts, F.col(PART_COL)).sortWithinPartitions(
            PART_COL, *DEFAULT_KEY_COLS)
        interleave("p1", lambda: noop(keyed), "p8", lambda: noop(keyed8),
                   args.rounds)

    if "batch" in exps:
        import pyarrow as pa

        def count_batches(batches):
            nb = 0
            n = 0
            for b in batches:
                nb += 1
                n += b.num_rows
            yield pa.RecordBatch.from_arrays(
                [pa.array([n]), pa.array([nb])], names=["n", "nb"])

        def run_with_batch(nrec):
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", str(nrec))
            try:
                noop(keyed.mapInArrow(count_batches, "n long, nb long"))
            finally:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", "2048")

        print("== batch: maxRecordsPerBatch 2048 vs 8192 (boundary)",
              flush=True)
        interleave("b2048", lambda: run_with_batch(2048),
                   "b8192", lambda: run_with_batch(8192), args.rounds)

    if "split" in exps:
        import tempfile

        from boltspark.engine import decode_table

        d = tempfile.mkdtemp(prefix="bsk_ab_split_")
        encode_table(df, f"{d}/blocks", f"{d}/manifest", resume=False)

        def run_with_split(size):
            spark.conf.set("spark.sql.files.maxPartitionBytes", size)
            try:
                noop(decode_table(spark, f"{d}/blocks", f"{d}/manifest"))
            finally:
                spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

        print("== split: decode noop, maxPartitionBytes 128m vs 16m",
              flush=True)
        interleave("s128m", lambda: run_with_split("128m"),
                   "s16m", lambda: run_with_split("16m"), args.rounds)

        def count_with_split(size):
            spark.conf.set("spark.sql.files.maxPartitionBytes", size)
            try:
                decode_table(spark, f"{d}/blocks", f"{d}/manifest").count()
            finally:
                spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

        print("== split: decode count, maxPartitionBytes 128m vs 16m",
              flush=True)
        interleave("c128m", lambda: count_with_split("128m"),
                   "c16m", lambda: count_with_split("16m"), args.rounds)

    print(json.dumps({"probe_end_pre_stop": True}), flush=True)
    spark.stop()
    print(json.dumps({"probe_end": _host_probe()}), flush=True)


if __name__ == "__main__":
    main()
