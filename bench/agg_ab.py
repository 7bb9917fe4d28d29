"""Interleaved A/B: compressed-domain aggregation vs decode-then-Catalyst.

The host's Python-worker throughput swings ~8x between phases, so this
benchmark strictly interleaves the two sides (A B A B ...) inside one
process and reports best-of — the only comparison BENCH/BASELINE.md
accepts (see the round-4 host-phase caveat).

  A  grouped_sum / column_sum / value_counts on the encoded blocks
     (partial aggregates per block, tiny final shuffle)
  B  decode_table -> the same aggregate in Catalyst over decoded rows

Usage: python bench/agg_ab.py [--repeats 3] [--sf-dir /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=1,
                    help="union the table with itself N times (scale knob: "
                         "shows the crossover where decode cost dominates "
                         "the fixed overhead both paths share)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from boltspark.engine import decode_table, encode_table
    from boltspark.engine.agg import column_sum, grouped_sum, value_counts
    from boltspark.engine.filters import RangePredicate
    from boltspark.engine.session import get_session

    spark = get_session()
    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice")
    if args.mult > 1:
        base = li
        for m in range(1, args.mult):
            li = li.unionAll(base.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(m * 100_000_000)))
    n_rows = li.count()
    d = tempfile.mkdtemp(prefix="boltspark_aggab_")
    bp, mp = f"{d}/blocks", f"{d}/manifest"
    encode_table(li, bp, mp, key_cols=("l_orderkey", "l_linenumber"),
                 target_partition_bytes=4 << 20, resume=False)
    pred = RangePredicate(column="l_quantity", lower=5.0, upper=45.0,
                          null_allowed=False)

    def a_grouped():
        return grouped_sum(spark, bp, mp, "l_returnflag",
                           "l_extendedprice").collect()

    def b_grouped():
        return (decode_table(spark, bp, mp,
                             columns=["l_returnflag", "l_extendedprice"])
                .groupBy("l_returnflag")
                .agg(F.sum("l_extendedprice"), F.count(F.lit(1))).collect())

    def a_sum_filtered():
        return column_sum(spark, bp, mp, "l_extendedprice",
                          predicate=pred).collect()

    def b_sum_filtered():
        return (decode_table(spark, bp, mp,
                             columns=["l_extendedprice", "l_quantity"],
                             predicate=pred)
                .agg(F.sum("l_extendedprice"), F.count(F.lit(1))).collect())

    def a_counts():
        return value_counts(spark, bp, mp, "l_returnflag").collect()

    def b_counts():
        return (decode_table(spark, bp, mp, columns=["l_returnflag"])
                .groupBy("l_returnflag").count().collect())

    pairs = {"grouped_sum": (a_grouped, b_grouped),
             "filtered_sum": (a_sum_filtered, b_sum_filtered),
             "value_counts": (a_counts, b_counts)}

    # untimed warmup of both paths
    for a, b in pairs.values():
        a(), b()

    best: dict[str, dict[str, float]] = {k: {"compressed": float("inf"),
                                             "decoded": float("inf")}
                                         for k in pairs}
    for _ in range(args.repeats):
        for name, (a, b) in pairs.items():
            t0 = time.perf_counter()
            a()
            best[name]["compressed"] = min(best[name]["compressed"],
                                           time.perf_counter() - t0)
            t0 = time.perf_counter()
            b()
            best[name]["decoded"] = min(best[name]["decoded"],
                                        time.perf_counter() - t0)

    out = {"metric": "compressed-domain agg vs decode+Catalyst (interleaved "
                     "best-of, same process)",
           "rows": n_rows, "repeats": args.repeats,
           "queries": {k: {"compressed_s": round(v["compressed"], 3),
                           "decoded_s": round(v["decoded"], 3),
                           "speedup": round(v["decoded"] / v["compressed"], 2)}
                       for k, v in best.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
