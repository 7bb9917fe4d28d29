"""Phase-decomposition profiler for the driver bench queries (guide §1).

NOT the driver contract — bench.py stays frozen.  This file isolates
where each timed query's wall goes, using the noop sink (guide §1.4)
so computation is timed without the sink, and labels jobs (§1.5).

Phases for encode_corpus:
  scan        JVM parquet scan of the corpus only
  shuffle     + partition id + repartition + sortWithinPartitions
  boundary    + Arrow crossing into Python (counts rows, yields 1 row/batch)
  kernels     + the real encoder mapInArrow (no parquet write)
  write       full encode_table (adds blocks write + manifest commit)

Phases for decode/verify:
  blocks_scan JVM scan of the blocks parquet (block chunks projected)
  decode      decode_table count
  decode_noop decode_table noop write (materializes every column)
  sha_orig    sha256+groupBy on the original df only
  verify      the full bench verify block

Usage: python bench_extra.py [--sf-dir DIR] [--phases a,b,c]
Prints one JSON line per phase: {"phase": ..., "sec": ..., "probe_gbps": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _host_probe  # same probe kernel as the frozen bench


def timed(name, fn, repeats=2):
    best = None
    out = None
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"phase": name, "sec": round(best, 3)}), flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--phases", default="")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    want = set(args.phases.split(",")) if args.phases else None

    def on(p):
        return want is None or p in want

    import re
    m = re.search(r"sf([0-9.]+)", args.sf_dir)
    sf = float(m.group(1)) if m else 0.1

    probe = _host_probe()
    print(json.dumps({"phase": "probe", "gbps": probe}), flush=True)

    from pyspark.sql import functions as F

    from boltspark import corpus
    from boltspark.engine import decode_table, encode_table
    from boltspark.engine.encode import DEFAULT_KEY_COLS
    from boltspark.engine.partitioner import with_partition_id
    from boltspark.engine.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_session("boltspark-bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    mb = int(os.environ.get("BOLTSPARK_BENCH_MB", max(32, int(4096 * sf))))
    n_rows = int(mb * 1e6 / 2600)
    corpus_path = f"/tmp/boltspark_bench_corpus_{n_rows}.parquet"
    if not os.path.exists(corpus_path):
        corpus.write_parquet(corpus_path, n_rows)
    df = spark.read.parquet(corpus_path)
    df.count()

    import tempfile
    warm = tempfile.mkdtemp(prefix="bsk_extra_warm_")
    encode_table(df.limit(4000), f"{warm}/blocks", f"{warm}/manifest",
                 resume=False, n_parts=cpus)

    work = tempfile.mkdtemp(prefix="bsk_extra_")
    columns = list(df.columns)
    key_cols = DEFAULT_KEY_COLS
    df_sel = df.select(*dict.fromkeys(list(key_cols) + columns))

    from boltspark.engine.partitioner import (
        DEFAULT_TARGET_PARTITION_BYTES, estimate_bytes_fast, num_partitions)
    n_parts = num_partitions(
        estimate_bytes_fast(df, columns), DEFAULT_TARGET_PARTITION_BYTES,
        min_parts=sc.defaultParallelism)
    print(json.dumps({"phase": "n_parts", "n": n_parts}), flush=True)

    if on("scan"):
        sc.setJobDescription("phase: scan")
        timed("scan", lambda: noop(df_sel), args.repeats)

    keyed = with_partition_id(df_sel, key_cols, n_parts)
    if on("shuffle"):
        sc.setJobDescription("phase: shuffle+sort")
        timed("shuffle", lambda: noop(keyed), args.repeats)

    if on("boundary"):
        import pyarrow as pa

        def count_batches(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_arrays([pa.array([n])], names=["n"])

        sc.setJobDescription("phase: boundary")
        timed("boundary",
              lambda: noop(keyed.mapInArrow(count_batches, "n long")),
              args.repeats)

    if on("kernels"):
        import uuid

        from boltspark.engine.encode import (
            DEFAULT_BLOCK_BYTES, DEFAULT_OUTER_LEVEL, _make_encoder,
            _prebuild_fsst_tables)
        from boltspark.engine.memutil import trimmed
        from boltspark.engine.schema import blocks_spark_schema

        fsst_tables = _prebuild_fsst_tables(df_sel, columns, None)
        enc = _make_encoder(columns, uuid.uuid4().hex[:12],
                           DEFAULT_BLOCK_BYTES, "zstd", None,
                           DEFAULT_OUTER_LEVEL, fsst_tables)
        sc.setJobDescription("phase: kernels")
        timed("kernels",
              lambda: noop(keyed.mapInArrow(trimmed(enc),
                                            blocks_spark_schema(columns))),
              args.repeats)

    enc_res = None
    if on("write"):
        sc.setJobDescription("phase: full encode_table")

        def full_encode():
            d = tempfile.mkdtemp(prefix="bsk_extra_enc_")
            return encode_table(df, f"{d}/blocks", f"{d}/manifest",
                                resume=False), d

        best = None
        for _ in range(args.repeats):
            t0 = time.time()
            enc_res, work = full_encode()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(json.dumps({"phase": "write", "sec": round(best, 3)}),
              flush=True)
    else:
        enc_res, _ = (encode_table(df, f"{work}/blocks", f"{work}/manifest",
                                   resume=False), work)
        work = work

    blocks, manifest = f"{work}/blocks", f"{work}/manifest"

    if on("blocks_scan"):
        bdf = spark.read.option("mergeSchema", "true").parquet(blocks)
        sc.setJobDescription("phase: blocks_scan")
        timed("blocks_scan", lambda: noop(bdf), args.repeats)

    if on("decode"):
        sc.setJobDescription("phase: decode count")
        timed("decode",
              lambda: decode_table(spark, blocks, manifest).count(),
              args.repeats)

    if on("decode_noop"):
        sc.setJobDescription("phase: decode noop")
        timed("decode_noop",
              lambda: noop(decode_table(spark, blocks, manifest)),
              args.repeats)

    if on("sha_orig"):
        sc.setJobDescription("phase: sha_orig")
        timed("sha_orig", lambda: (
            df.select(F.sha2("content", 256).alias("h"))
            .groupBy("h").count().count()), args.repeats)

    if on("verify"):
        sc.setJobDescription("phase: verify")

        def verify():
            decoded = decode_table(spark, blocks, manifest)
            orig_h = df.select(F.sha2("content", 256).alias("h"))
            back_h = decoded.select(F.sha2("content", 256).alias("h"))
            return (
                orig_h.groupBy("h").count().join(
                    back_h.groupBy("h").count().withColumnRenamed("count", "c2"),
                    "h", "full_outer",
                ).filter((F.col("count").isNull()) | (F.col("c2").isNull())
                         | (F.col("count") != F.col("c2"))).count())
        timed("verify", verify, args.repeats)

    spark.stop()
    print(json.dumps({"phase": "probe_end", "gbps": _host_probe()}),
          flush=True)


if __name__ == "__main__":
    main()
