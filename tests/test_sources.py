"""Iceberg-lite table layout: snapshots, appends, time travel, and the
encode path reading straight from a table snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from boltspark import corpus
from boltspark.engine import decode_table, encode_table
from boltspark.sources import iceberg_lite as il


def test_write_read_append_timetravel(spark, tmp_path):
    table = str(tmp_path / "tbl")
    df1 = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    il.write_table(df1, table)
    assert il.read_table(spark, table).count() == 100

    df2 = spark.range(100, 150).withColumn("v", F.col("id") * 2)
    meta = il.write_table(df2, table, mode="append")
    assert il.read_table(spark, table).count() == 150
    assert len(meta["snapshots"]) == 2

    # time travel to the first snapshot
    first = il.snapshots(table)[0]["snapshot-id"]
    assert il.read_table(spark, table, snapshot_id=first).count() == 100

    # overwrite starts a fresh lineage for current
    df3 = spark.range(0, 10).withColumn("v", F.col("id"))
    il.write_table(df3, table, mode="overwrite")
    assert il.read_table(spark, table).count() == 10

    import pytest

    with pytest.raises(KeyError):
        il.read_table(spark, table, snapshot_id=999999)


def test_encode_from_iceberg_snapshot(spark, tmp_path):
    table = str(tmp_path / "corpus_tbl")
    pdf = corpus.generate(1200)
    df = spark.createDataFrame(pdf.to_pandas())
    il.write_table(df, table)

    src = il.read_table(spark, table)
    out = str(tmp_path / "blocks")
    man = str(tmp_path / "manifest")
    encode_table(src, out, man, target_partition_bytes=1 << 20)
    decoded = decode_table(spark, out, man)
    orig = df.select(F.sha2("content", 256).alias("h")).groupBy("h").count()
    back = decoded.select(F.sha2("content", 256).alias("h")).groupBy("h").count()
    assert orig.exceptAll(back).count() + back.exceptAll(orig).count() == 0
