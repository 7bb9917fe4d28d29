"""Shuffle-codec A/B: spark.io.compression.codec lz4 (default) vs zstd.

The codec is a core conf fixed at SparkContext creation, so the A/B
alternates whole sessions: lz4, zstd, lz4, zstd ... with the encode
shuffle (noop sink) timed inside each, plus the memcpy probe around
every session so host-phase drift is visible.  Content text compresses
~2x under lz4 and ~3.5x under zstd-1: in this host's degraded-bandwidth
phases the shuffle is byte-bound, so fewer shuffle-file bytes should
win there even at extra CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _host_probe


def run_once(codec: str, level: int | None, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"bsk-codec-{codec}")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.default.parallelism", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.files.maxPartitionBytes", "16m")
         .config("spark.io.compression.codec", codec))
    if level is not None:
        b = b.config(f"spark.io.compression.{codec}.level", str(level))
    if os.path.isdir("/dev/shm"):
        b = b.config("spark.local.dir", "/dev/shm/boltspark-spark-local")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from boltspark.engine.shipping import ship_package
    ship_package(spark)

    import re
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    mb = int(os.environ.get("BOLTSPARK_BENCH_MB", max(32, int(4096 * sf))))
    n_rows = int(mb * 1e6 / 2600)
    corpus_path = f"/tmp/boltspark_bench_corpus_{n_rows}.parquet"

    from boltspark.engine.encode import DEFAULT_KEY_COLS
    from boltspark.engine.partitioner import (
        DEFAULT_TARGET_PARTITION_BYTES, estimate_bytes_fast, num_partitions,
        with_partition_id)

    df = spark.read.parquet(corpus_path)
    df.count()
    columns = list(df.columns)
    df_sel = df.select(*dict.fromkeys(list(DEFAULT_KEY_COLS) + columns))
    n_parts = num_partitions(
        estimate_bytes_fast(df, columns), DEFAULT_TARGET_PARTITION_BYTES,
        min_parts=spark.sparkContext.defaultParallelism)
    keyed = with_partition_id(df_sel, DEFAULT_KEY_COLS, n_parts)

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    noop(df_sel)  # warm
    best = None
    for _ in range(3):
        t0 = time.time()
        noop(keyed)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return {"codec": codec, "level": level, "shuffle_noop_best": round(best, 3)}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    for rnd in range(2):
        for codec, level in (("lz4", None), ("zstd", 1)):
            p0 = _host_probe()
            res = run_once(codec, level, sf_dir)
            res.update({"round": rnd, "probe_before": p0})
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
