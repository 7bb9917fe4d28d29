"""Shuffle-placement optimizations (round 6): the encode shuffle maps
partitions to reduce tasks 1:1 via Murmur3 preimages, so no task
encodes several partitions while a neighbor sits empty.

Correctness does NOT depend on the murmur implementation matching
Spark's (any part->shuf function keeps a partition's rows together);
the 1:1 placement does — so the parity test pins it against Spark
itself.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from boltspark.engine.partitioner import (
    PART_COL, _murmur3_long, shuffle_preimages, with_partition_id)


def test_murmur3_long_matches_spark(spark):
    vals = (list(range(256)) + [-1, -61, 2**40 + 7, -(2**40) - 13,
                                2**62, -(2**62), 2**63 - 1, -(2**63)])
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    got = [r["h"] for r in df.select(F.hash("x").alias("h")).collect()]
    exp = _murmur3_long(np.array(vals, dtype=np.int64)).tolist()
    assert got == exp


@pytest.mark.parametrize("n_parts", [1, 8, 61, 1000])
def test_shuffle_preimages_are_a_bijection(spark, n_parts):
    pre = shuffle_preimages(n_parts)
    assert len(pre) == n_parts and (pre >= 0).all()
    # Spark itself must place preimage p into reduce bucket p
    df = spark.createDataFrame(
        [(int(p), int(k)) for p, k in enumerate(pre)], "p long, k long")
    rows = df.select(
        "p", F.expr(f"pmod(hash(k), {n_parts})").alias("bucket")).collect()
    assert all(r["p"] == r["bucket"] for r in rows)


def test_with_partition_id_one_partition_per_task(spark):
    n_parts = 16
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    keyed = with_partition_id(df, ("k",), n_parts)
    placed = (keyed.withColumn("task", F.spark_partition_id())
              .select(PART_COL, "task").distinct().collect())
    # bijection: every part in its own task, every task used once
    by_task: dict[int, set] = {}
    for r in placed:
        by_task.setdefault(r["task"], set()).add(r[PART_COL])
    assert len(by_task) == n_parts
    assert all(len(parts) == 1 for parts in by_task.values())
    # the partition id itself is the frozen on-disk contract
    expect = df.select(
        F.pmod(F.xxhash64("k"), F.lit(n_parts)).alias("p"), "k").collect()
    got = {r["k"]: r[PART_COL]
           for r in keyed.select("k", PART_COL).collect()}
    assert all(got[r["k"]] == r["p"] for r in expect)


def test_manifest_driver_reads_tolerate_glob_metacharacters(spark, tmp_path):
    """[, ], * are valid filename characters.  Spark's file source
    glob-interprets READ paths (Hadoop semantics) so such table paths
    were never fully readable — but the round-6 driver-side fast paths
    (_exists / run_exists / table_meta via pyarrow+listdir) must not
    make it worse by glob-matching to nothing (review fix: a False
    run_exists re-encodes a committed streaming epoch).  Create the
    manifest at a plain path, rename the directory, and pin the
    driver-side answers."""
    import shutil

    from pyspark.sql import functions as F

    from boltspark.engine import encode_table
    from boltspark.engine import manifest as manifestmod

    plain = tmp_path / "plain"
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    res = encode_table(df, str(plain / "blocks"), str(plain / "manifest"),
                       key_cols=("k",), n_parts=4, resume=False)
    weird = tmp_path / "t[1] x*"
    shutil.move(str(plain), str(weird))
    man = str(weird / "manifest")
    assert manifestmod._exists(spark, man)
    assert manifestmod.run_exists(spark, man, res.run_id)
    assert not manifestmod.run_exists(spark, man, "nope")
    assert manifestmod.table_meta(spark, man)["columns"] == ["k", "v"]
