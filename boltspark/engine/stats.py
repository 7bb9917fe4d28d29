"""Metadata-only table statistics: answers from zone-map stats leaves.

The wide blocks layout stores each column's typed stats struct as its
own parquet column chunk (engine/schema.py), so table-level MIN/MAX
aggregate from the tiny stats leaves WITHOUT touching a single payload
byte — the scan's ReadSchema contains no ``block`` field at all.  The
reference reads column min/max from footer Statistics the same way
(parquet_metadata_thrift.rs:657); here it is a first-class query.

Exactness: numeric ``vmin``/``vmax`` are stored as float64 — exact for
doubles/floats and for integers within ±2^53; integer bounds beyond
that were widened OUTWARD at encode, so the result is conservative
(min'' <= true min, max'' >= true max), never wrong-side.  Byte columns
report their 24-byte min/max PREFIXES plus whether every contributing
block stored the exact value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import manifest as manifestmod
from .schema import PART_ID


def column_minmax(
    spark: SparkSession,
    blocks_path: str,
    manifest_path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """(column, vmin, vmax, n_rows, has_null) per column, computed
    entirely from stats leaves (no payload reads, no Python evaluation
    node).  Unknown columns raise.  Byte and list columns carry no
    numeric zone bounds, so their vmin/vmax come back NULL (row counts
    and null flags are still real)."""
    meta = manifestmod.table_meta(spark, manifest_path)
    all_cols = meta["columns"]
    cols = list(columns or all_cols)
    unknown = set(cols) - set(all_cols)
    if unknown:
        raise KeyError(f"unknown columns {unknown}; encoded: {all_cols}")
    blocks = spark.read.option("mergeSchema", "true").parquet(blocks_path)
    valid = manifestmod.valid_pairs_df(spark, manifest_path)
    melt = F.explode(F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("cols").getField(c).getField("stats").getField("vmin").alias("vmin"),
            F.col("cols").getField(c).getField("stats").getField("vmax").alias("vmax"),
            F.col("cols").getField(c).getField("stats").getField("has_null")
            .alias("has_null"),
        )
        for c in cols
    ])).alias("m")
    return (
        blocks.join(F.broadcast(valid), [PART_ID, "run_id"], "inner")
        .select(F.col("n_rows"), melt)
        .select("n_rows", "m.*")
        .groupBy("column")
        .agg(
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("n_rows").alias("n_rows"),
            # a NULL stats struct means the group PREDATES the column
            # (schema evolution) — its rows decode as NULL, so the
            # column does contain nulls there
            F.max(F.coalesce(F.col("has_null"), F.lit(True))).alias("has_null"),
        )
    )
