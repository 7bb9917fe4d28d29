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


def run_exists(spark: SparkSession, manifest_path: str, run_id: str) -> bool:
    """True if this run id already committed (idempotent epoch replay)."""
    if not _exists(spark, manifest_path):
        return False
    return bool(
        spark.read.parquet(manifest_path)
        .filter(F.col("run_id") == run_id).limit(1).collect()
    )


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
    # one read job over block *metadata* (column pruning: the binary
    # payload column is never touched), aggregated and collected — the
    # result is tiny (one row per partition-column), so the manifest is
    # then written from the driver in a single tiny job
    rows = (
        spark.read.parquet(blocks_path)
        .select(PART_ID, "run_id", "column", "n_rows", "raw_bytes",
                "enc_bytes", "enc_ms", "codec", "outer")
        .filter(F.col("run_id") == run_id)
        .groupBy(PART_ID, "run_id", "column")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sum("enc_ms").alias("enc_ms"),
            F.count("*").alias("n_blocks"),
            F.first("codec").alias("codec"),
            F.first("outer").alias("outer"),
        )
        .collect()
    )
    meta = json.dumps({
        "columns": columns, "key_cols": list(key_cols), "n_parts": n_parts,
        "schema_json": schema_json,
    })
    schema = ("part_id long, run_id string, column string, n_rows long, "
              "raw_bytes long, enc_bytes long, enc_ms double, n_blocks long, "
              "codec string, outer string, table_meta string")
    data = [tuple(r) + (None,) for r in rows]
    data.append((-1, run_id, META_KEY, 0, 0, 0, 0.0, 0, "", "", meta))
    spark.createDataFrame(data, schema).coalesce(1).write.mode("append").parquet(
        manifest_path)
    return {
        "raw_bytes": sum(r["raw_bytes"] for r in rows),
        "enc_bytes": sum(r["enc_bytes"] for r in rows),
    }


def table_meta(spark: SparkSession, manifest_path: str) -> dict:
    return load(spark, manifest_path)[0]


def load(spark: SparkSession, manifest_path: str):
    """One read of the (tiny) manifest -> (table_meta dict, valid
    (part_id, run_id) pairs).  The pairs are the join key that makes
    orphan blocks from crashed runs invisible."""
    rows = (
        spark.read.parquet(manifest_path)
        .select(PART_ID, "run_id", "column", "table_meta")
        .collect()
    )
    meta = None
    pairs = set()
    for r in rows:
        if r["column"] == META_KEY:
            meta = meta or json.loads(r["table_meta"])
        else:
            pairs.add((r[PART_ID], r["run_id"]))
    if meta is None:
        raise FileNotFoundError(f"no table meta in manifest at {manifest_path}")
    return meta, sorted(pairs)
