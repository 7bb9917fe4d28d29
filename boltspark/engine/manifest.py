"""Checkpoint manifest: per-partition lineage, codec choices, metrics.

The footer analog (parquet_footer.rs loads FileMetaData before any
data is touched; decode here loads the manifest before any block is
touched).  One parquet row per (partition, column) plus a per-run
table-meta row carrying the original Spark schema JSON.  Resume =
``completed_partitions`` anti-join (the reference's skip,
local_file_reader.rs:126-171, hops row groups from footer arithmetic
alone — we hop partitions from the manifest alone).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession, functions as F

from .schema import PART_ID

META_KEY = "__table_meta__"


def _exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False


def completed_partitions(spark: SparkSession, manifest_path: str) -> set[int]:
    if not _exists(spark, manifest_path):
        return set()
    rows = (
        spark.read.parquet(manifest_path)
        .filter(F.col("column") != META_KEY)
        .select(PART_ID).distinct().collect()
    )
    return {r[PART_ID] for r in rows}


def commit(
    spark: SparkSession,
    blocks_path: str,
    manifest_path: str,
    *,
    run_id: str,
    columns: list[str],
    key_cols: tuple[str, ...],
    n_parts: int,
    schema_json: str,
) -> dict:
    """Aggregate this run's blocks into manifest rows and append them.

    Reads only metadata columns of the blocks parquet (column pruning:
    the binary payload is never touched — .explain shows ReadSchema
    without `block`).
    """
    blocks = (
        spark.read.parquet(blocks_path)
        .select(PART_ID, "run_id", "column", "n_rows", "raw_bytes",
                "enc_bytes", "enc_ms", "codec", "outer")  # never touch payloads
        .filter(F.col("run_id") == run_id)
    )
    per_part = (
        blocks.groupBy(PART_ID, "run_id", "column")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("enc_ms").alias("enc_ms"),
            F.count("*").alias("n_blocks"),
            F.first("codec").alias("codec"),
            F.first("outer").alias("outer"),
        )
        .withColumn("table_meta", F.lit(None).cast("string"))
    )
    meta = json.dumps({
        "columns": columns, "key_cols": list(key_cols), "n_parts": n_parts,
        "schema_json": schema_json,
    })
    meta_row = spark.createDataFrame(
        [(-1, run_id, META_KEY, 0, 0, 0, 0.0, 0, "", "", meta)],
        per_part.schema,
    )
    per_part.unionByName(meta_row).write.mode("append").parquet(manifest_path)

    # totals from the (tiny) written manifest — no second pass over blocks
    tot = (
        spark.read.parquet(manifest_path)
        .filter((F.col("run_id") == run_id) & (F.col("column") != META_KEY))
        .agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e"))
        .collect()[0]
    )
    return {"raw_bytes": int(tot["r"] or 0), "enc_bytes": int(tot["e"] or 0)}


def table_meta(spark: SparkSession, manifest_path: str) -> dict:
    row = (
        spark.read.parquet(manifest_path)
        .filter(F.col("column") == META_KEY)
        .select("table_meta").limit(1).collect()
    )
    if not row:
        raise FileNotFoundError(f"no table meta in manifest at {manifest_path}")
    return json.loads(row[0]["table_meta"])


def valid_block_keys(spark: SparkSession, manifest_path: str):
    """(part_id, run_id) pairs committed to the manifest — the join key
    that makes orphan blocks from crashed runs invisible."""
    return (
        spark.read.parquet(manifest_path)
        .filter(F.col("column") != META_KEY)
        .select(PART_ID, "run_id").distinct()
    )
