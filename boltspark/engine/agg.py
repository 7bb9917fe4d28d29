"""Compressed-domain aggregation: SUM / COUNT / GROUP-BY-count computed
from encoded blocks WITHOUT materializing rows.

The reference stops at zone statistics (footer min/max,
parquet_metadata_thrift.rs:657); this module pushes whole aggregations
into the encoded domain, the classic "compute on compressed data" move
of column stores:

* ``rle`` blocks aggregate over (run_value, run_length) pairs — O(runs)
  instead of O(rows), no ``np.repeat`` materialization;
* ``dict`` blocks aggregate over (dictionary, code histogram) —
  ``np.bincount`` of the code stream plus one pass over the distinct
  values, never touching the decoded strings;
* every other codec decodes the block normally but reduces it INSIDE
  the task, so exactly one partial-aggregate row per block crosses the
  executor boundary (map-side combine below the row level).

At 100 TB the difference is structural: a GROUP BY over a dictionary-
coded flag column moves (n_blocks x n_distinct) tiny rows through one
final shuffle instead of n_rows values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels import block as blockmod
from ..kernels import dictionary, lists, strings
from . import manifest as manifestmod
from .schema import PART_ID


def _open_dense(blk: bytes):
    """open_block + the n_valid arithmetic every aggregate needs."""
    payload, validity, meta, tag, codec, n_rows = blockmod.open_block(blk)
    n_valid = int(validity.sum()) if validity is not None else n_rows
    return payload, meta, tag, codec, n_rows, n_valid


def _block_sum(blk: bytes) -> tuple[float | int, int, int]:
    """(sum_of_non_null, n_rows, n_valid) for one numeric block.

    rle sums run_value * run_length (O(runs)); dict sums
    dictionary[code] via the code histogram (O(distinct + codes));
    other codecs decode-and-reduce in the task.
    """
    payload, meta, tag, codec, n_rows, n_valid = _open_dense(blk)
    if tag in ("bytes", "d128") or tag in lists.LIST_TAGS:
        raise TypeError(f"sum over tag {tag!r} is not defined")
    if codec == "rle":
        run_values, run_lengths = blockmod.decode_rle_runs(
            payload, meta, n_valid, tag)
        # exact integer path vs float path, both vectorized
        if run_values.dtype.kind == "f":
            return float(np.dot(run_values.astype(np.float64),
                                run_lengths.astype(np.float64))), n_rows, n_valid
        return int(np.dot(run_values.astype(np.int64),
                          run_lengths.astype(np.int64))), n_rows, n_valid
    if codec == "dict":
        uniques, codes = dictionary.decode_parts(payload, meta, n_valid, tag)
        cnt = np.bincount(codes, minlength=len(uniques))
        u = np.asarray(uniques)
        if u.dtype.kind == "f":
            return float(np.dot(u.astype(np.float64), cnt)), n_rows, n_valid
        return int(np.dot(u.astype(np.int64), cnt)), n_rows, n_valid
    values = blockmod.decode_values(payload, meta, n_valid, tag, codec)
    v = np.asarray(values)
    if v.dtype.kind == "f":
        return float(v.sum(dtype=np.float64)), n_rows, n_valid
    return int(v.sum(dtype=np.int64)), n_rows, n_valid


def _block_value_counts(blk: bytes):
    """(values, counts, n_null) for one block — values stay in their
    kernel representation (StringColumn for bytes, ndarray otherwise),
    counts int64, nulls reported separately (SQL GROUP BY semantics)."""
    payload, meta, tag, codec, n_rows, n_valid = _open_dense(blk)
    if tag == "d128" or tag in lists.LIST_TAGS:
        raise TypeError(f"value_counts over tag {tag!r} is not defined")
    n_null = n_rows - n_valid
    if codec == "dict":
        uniques, codes = dictionary.decode_parts(payload, meta, n_valid, tag)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        return uniques, cnt, n_null
    if codec == "rle" and tag != "bytes":
        run_values, run_lengths = blockmod.decode_rle_runs(
            payload, meta, n_valid, tag)
        u, inv = np.unique(np.asarray(run_values), return_inverse=True)
        cnt = np.zeros(len(u), dtype=np.int64)
        np.add.at(cnt, inv, run_lengths.astype(np.int64))
        return u, cnt, n_null
    values = blockmod.decode_values(payload, meta, n_valid, tag, codec)
    if tag == "bytes":
        import pyarrow.compute as pc

        vc = pc.value_counts(strings.to_arrow(values))
        u = strings.from_arrow(vc.field("values").combine_chunks()
                               if isinstance(vc.field("values"), pa.ChunkedArray)
                               else vc.field("values"))
        cnt = np.asarray(vc.field("counts")).astype(np.int64)
        return u, cnt, n_null
    u, cnt = np.unique(np.asarray(values), return_counts=True)
    return u, cnt.astype(np.int64), n_null


def _blocks_proj(spark: SparkSession, blocks_path: str, manifest_path: str,
                 column: str) -> DataFrame:
    meta = manifestmod.table_meta(spark, manifest_path)
    if column not in meta["columns"]:
        raise KeyError(f"unknown column {column}; encoded: {meta['columns']}")
    blocks = (spark.read.option("mergeSchema", "true").parquet(blocks_path)
              .select(PART_ID, "run_id", "n_rows",
                      F.col("cols").getField(column).getField("block")
                      .alias("__blk")))
    valid = manifestmod.valid_pairs_df(spark, manifest_path)
    return blocks.join(F.broadcast(valid), [PART_ID, "run_id"], "inner")


def column_sum(spark: SparkSession, blocks_path: str, manifest_path: str,
               column: str) -> DataFrame:
    """One-row DataFrame (column, sum_value, n_rows, n_nulls) computed in
    the compressed domain: each task reduces its blocks to one partial
    row; Spark's final aggregation folds the partials (exact int64 for
    integer storage, float64 for floats)."""
    blocks = _blocks_proj(spark, blocks_path, manifest_path, column)

    def gen(batches):
        for batch in batches:
            names = batch.schema.names
            blks = batch.column(names.index("__blk"))
            grows = batch.column(names.index("n_rows"))
            s_l = 0
            s_d = 0.0
            is_float = False
            rows = 0
            nulls = 0
            for i in range(batch.num_rows):
                b = blks[i]
                if not b.is_valid:
                    # evolved column: the group predates it — all rows NULL
                    g = grows[i].as_py()
                    rows += g
                    nulls += g
                    continue
                s, n_rows, n_valid = _block_sum(b.as_py())
                if isinstance(s, float):
                    is_float = True
                    s_d += s
                else:
                    s_l += s
                rows += n_rows
                nulls += n_rows - n_valid
            if rows:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([s_l], pa.int64()),
                     pa.array([s_d], pa.float64()),
                     pa.array([is_float], pa.bool_()),
                     pa.array([rows], pa.int64()),
                     pa.array([nulls], pa.int64())],
                    names=["s_l", "s_d", "is_f", "rows", "nulls"])

    partials = blocks.mapInArrow(
        gen, "s_l long, s_d double, is_f boolean, rows long, nulls long")
    return (partials.agg(
        F.sum("s_l").alias("s_l"), F.sum("s_d").alias("s_d"),
        F.max("is_f").alias("is_f"), F.sum("rows").alias("n_rows"),
        F.sum("nulls").alias("n_nulls"))
        .select(F.lit(column).alias("column"),
                F.when(F.col("is_f"), F.col("s_d") + F.col("s_l"))
                .otherwise(F.col("s_l").cast("double")).alias("sum_value"),
                "n_rows", "n_nulls"))


def value_counts(spark: SparkSession, blocks_path: str, manifest_path: str,
                 column: str) -> DataFrame:
    """GROUP BY ``column`` -> COUNT(*) in the compressed domain: dict
    blocks contribute (dictionary value, code-histogram count) rows, rle
    blocks (run value, summed lengths), others reduce with np.unique —
    only per-block distinct values ride the final (tiny) shuffle.  A
    NULL group row is emitted when the column has nulls (SQL GROUP BY
    semantics).  Returns (value, cnt); value typed by the table schema.
    """
    import json as jsonmod

    from pyspark.sql import types as T

    meta = manifestmod.table_meta(spark, manifest_path)
    schema = T.StructType.fromJson(jsonmod.loads(meta["schema_json"]))
    field = {f.name: f for f in schema.fields}[column]
    tname = field.dataType.typeName()
    is_bytes = tname in ("string", "binary")
    out_schema = T.StructType([
        T.StructField("value", field.dataType, True),
        T.StructField("cnt", T.LongType(), False),
    ])
    blocks = _blocks_proj(spark, blocks_path, manifest_path, column)
    from .decode import arrow_out_type

    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    out_t = arrow_out_type(field.dataType, tz)

    def gen(batches):
        for batch in batches:
            names = batch.schema.names
            blks = batch.column(names.index("__blk"))
            grows = batch.column(names.index("n_rows"))
            for i in range(batch.num_rows):
                b = blks[i]
                if not b.is_valid:
                    # evolved column: whole group is the NULL value
                    g = grows[i].as_py()
                    if g:
                        yield pa.RecordBatch.from_arrays(
                            [pa.nulls(1, out_t), pa.array([g], pa.int64())],
                            names=["value", "cnt"])
                    continue
                u, cnt, n_null = _block_value_counts(b.as_py())
                if is_bytes:
                    varr = strings.to_arrow(u)
                else:
                    varr = pa.array(np.asarray(u))
                if not varr.type.equals(out_t):
                    varr = varr.cast(out_t)
                carr = pa.array(cnt, pa.int64())
                if n_null:
                    varr = pa.concat_arrays([varr, pa.nulls(1, varr.type)])
                    carr = pa.concat_arrays([carr, pa.array([n_null], pa.int64())])
                yield pa.RecordBatch.from_arrays([varr, carr],
                                                 names=["value", "cnt"])

    partials = blocks.mapInArrow(gen, out_schema)
    return partials.groupBy("value").agg(F.sum("cnt").alias("cnt"))
