"""Schemas shared by the encode/decode jobs and the manifest.

The blocks table is the engine's page store, laid out WIDE: one row
per (partition, run, seq) block group, with one parquet struct column
per encoded table column.  Because parquet stores every struct leaf as
its own column chunk, the table's own columnar layout gives the read
path everything the reference gets from page/footer arithmetic:

* projection reads only the requested ``cols.<name>.block`` chunks
  (nested schema pruning — the ReadSchema shrinks to what was asked);
* point queries prune whole row groups on ``part_id`` min/max stats
  (tasks write rows sorted by part id);
* the manifest aggregation reads only the tiny metadata leaves, never
  a block payload;
* every row is a self-contained block group, so decode needs NO
  shuffle and no regrouping — it is embarrassingly parallel over scan
  splits.

The manifest is the footer analog (parquet_footer.rs): per-partition
lineage, source of truth for resume — blocks without a manifest entry
are ignored (orphans from crashed runs).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

PART_ID = "part_id"

# typed zone-map stats: REAL parquet columns instead of a JSON string,
# so (a) parquet row-group min/max stats exist on vmin/vmax themselves,
# (b) a JVM-side prefilter can drop non-matching groups before they
# ever cross into Python, and (c) the bloom rides as raw binary (half
# the hex size).  Numeric bounds are stored as double (exact for the
# i64 ranges the corpus uses; conservative-correct regardless since
# zone checks only widen).
_STATS_ARROW = pa.struct([
    pa.field("vmin", pa.float64(), True),
    pa.field("vmax", pa.float64(), True),
    pa.field("vmin_pfx", pa.binary(), True),
    pa.field("vmax_pfx", pa.binary(), True),
    pa.field("vmin_exact", pa.bool_(), True),
    pa.field("vmax_exact", pa.bool_(), True),
    pa.field("has_null", pa.bool_(), True),
    pa.field("bloom", pa.binary(), True),
])

_STATS_SPARK = T.StructType([
    T.StructField("vmin", T.DoubleType(), True),
    T.StructField("vmax", T.DoubleType(), True),
    T.StructField("vmin_pfx", T.BinaryType(), True),
    T.StructField("vmax_pfx", T.BinaryType(), True),
    T.StructField("vmin_exact", T.BooleanType(), True),
    T.StructField("vmax_exact", T.BooleanType(), True),
    T.StructField("has_null", T.BooleanType(), True),
    T.StructField("bloom", T.BinaryType(), True),
])

# per-encoded-column struct: the page-header fields of the reference
# (codec, sizes, statistics) + the encoded block bytes
_COL_ARROW_FIELDS = [
    pa.field("block", pa.large_binary(), False),
    pa.field("codec", pa.string(), False),
    pa.field("outer", pa.string(), False),
    pa.field("raw_bytes", pa.int64(), False),
    pa.field("enc_bytes", pa.int64(), False),
    pa.field("enc_ms", pa.float64(), False),
    pa.field("stats", _STATS_ARROW, False),
]

_COL_SPARK_STRUCT = T.StructType([
    T.StructField("block", T.BinaryType(), False),
    T.StructField("codec", T.StringType(), False),
    T.StructField("outer", T.StringType(), False),
    T.StructField("raw_bytes", T.LongType(), False),
    T.StructField("enc_bytes", T.LongType(), False),
    T.StructField("enc_ms", T.DoubleType(), False),
    T.StructField("stats", _STATS_SPARK, False),
])


def blocks_arrow_schema(columns: list[str]) -> pa.Schema:
    return pa.schema([
        pa.field(PART_ID, pa.int64(), False),
        pa.field("run_id", pa.string(), False),
        pa.field("seq", pa.int32(), False),
        pa.field("n_rows", pa.int64(), False),
        pa.field("cols", pa.struct([
            pa.field(c, pa.struct(_COL_ARROW_FIELDS), False) for c in columns
        ]), False),
    ])


def _as_nullable(dt):
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _as_nullable(f.dataType), True)
            for f in dt.fields])
    return dt


def read_blocks(spark, blocks_path: str, columns: list[str]):
    """Blocks scan with the schema DERIVED from the manifest's merged
    column list instead of a ``mergeSchema`` footer sweep: mergeSchema
    reads every file footer in a separate job before the real scan,
    paid on EVERY decode/aggregate call, while the manifest already
    knows the union schema (table_meta merges per-run column sets).
    Files from runs that predate a column read its struct as null —
    the same result the footer merge produced.  The schema is made
    fully nullable because file-source nullability is advisory and
    evolved files genuinely contain nulls."""
    return spark.read.schema(
        _as_nullable(blocks_spark_schema(columns))).parquet(blocks_path)


def blocks_spark_schema(columns: list[str]) -> T.StructType:
    return T.StructType([
        T.StructField(PART_ID, T.LongType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("cols", T.StructType([
            T.StructField(c, _COL_SPARK_STRUCT, False) for c in columns
        ]), False),
    ])

# arrow type -> (physical tag, needs_cast_back)
_ARROW_TAGS = {
    pa.bool_(): "bool",
    pa.int32(): "i32",
    pa.int64(): "i64",
    pa.float32(): "f32",
    pa.float64(): "f64",
}


_LIST_ELEM_TAGS = {
    pa.int32(): "li32", pa.int64(): "li64",
    pa.float32(): "lf32", pa.float64(): "lf64",
}


def tag_for_arrow_type(t: pa.DataType) -> str:
    if t in _ARROW_TAGS:
        return _ARROW_TAGS[t]
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "bytes"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    # temporal types ride as their epoch integers (FoR loves timestamps:
    # a partition's values cluster tightly around one reference)
    if pa.types.is_timestamp(t):
        return "i64"
    if pa.types.is_date32(t):
        return "i32"
    if pa.types.is_date64(t):
        return "i64"
    # decimals up to 18 digits ride as their unscaled int64 (scaled-int
    # FoR storage); 19..38 digits as the 16-byte two's-complement word
    # pair (tag "d128", word-plane plain storage).  The reference
    # rejects decimals outright (primitive_column_reader.rs:450-455) —
    # we leapfrog it
    if pa.types.is_decimal(t):
        if t.precision <= 18:
            return "i64"
        if t.precision <= 38:
            return "d128"
        raise TypeError(f"decimal precision > 38 unsupported: {t}")
    # lists flatten to (lengths, values) — kernels/lists.py: fixed
    # elements (array<float> embeddings) and string/binary elements
    # (array<string> tags, map keys/values)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        elem = t.value_type
        if elem in _LIST_ELEM_TAGS:
            return _LIST_ELEM_TAGS[elem]
        if (pa.types.is_string(elem) or pa.types.is_large_string(elem)
                or pa.types.is_binary(elem) or pa.types.is_large_binary(elem)):
            return "lbytes"
        raise TypeError(f"unsupported list element type {elem}")
    raise TypeError(
        f"unsupported column type {t} (reference likewise rejects INT96/FLBA:"
        " primitive_column_reader.rs:450-455)"
    )


def storage_cast(arr: pa.Array) -> pa.Array:
    """Cast temporal arrays to their integer storage before encoding."""
    t = arr.type
    if pa.types.is_timestamp(t):
        return arr.cast(pa.int64())
    if pa.types.is_date32(t):
        return arr.cast(pa.int32())
    if pa.types.is_date64(t):
        return arr.cast(pa.int64())
    return arr


def arrow_type_for_tag(tag: str, original: str | None = None) -> pa.DataType:
    if tag == "bytes":
        return pa.large_string() if original == "string" else pa.large_binary()
    return {
        "bool": pa.bool_(), "i32": pa.int32(), "i64": pa.int64(),
        "f32": pa.float32(), "f64": pa.float64(),
    }[tag]
