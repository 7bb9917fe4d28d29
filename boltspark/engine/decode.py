"""Distributed decode: blocks parquet + manifest -> original DataFrame.

The read path mirrors the reference's scan semantics:

* column pruning — only requested columns' blocks are read (the parquet
  filter on ``column`` is pushed into the blocks scan, the analog of
  ``columns_to_read`` in local_file_reader.rs:33-51);
* predicate pushdown — the filter column decodes first; zone-map stats
  skip whole blocks without touching payload bytes (the reference
  defines check_range but never wires it — we do), dictionary blocks
  evaluate the predicate once per distinct value then map over codes
  (dictionary_page_int32_with_filters.rs:97-177), and surviving masks
  gate the remaining columns exactly like the RowRangeSet cascade in
  row_group_reader.rs:204-258;
* streaming — one RecordBatch out per (partition, seq) block group, so
  peak memory is one block group, not one partition.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..kernels import block as blockmod
from ..kernels import bitpack, dictionary, strings
from . import manifest as manifestmod
from .filters import ALL, NONE, Predicate
from .schema import PART_ID

_FIXED_STRUCT = {
    "boolean": pa.bool_(), "integer": pa.int32(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
}


def _scatter_bytes(dense: strings.StringColumn, validity: np.ndarray) -> pa.Array:
    """Dense byte rows + validity -> nullable Arrow array (nulls are
    0-length, data blob unchanged)."""
    n = len(validity)
    lens = np.zeros(n, dtype=np.int64)
    lens[validity] = dense.lengths()
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [
            pa.py_buffer(bitpack.pack_bools(validity)),
            pa.py_buffer(offsets),
            pa.py_buffer(dense.data),
        ],
    )


def _to_arrow_full(values, validity, tag: str) -> pa.Array:
    if tag == "bytes":
        if validity is None:
            return strings.to_arrow(values)
        return _scatter_bytes(values, validity)
    if validity is None:
        return pa.array(values)
    full = blockmod.scatter_nulls_fixed(np.asarray(values), validity)
    return pa.array(full, mask=~validity)


def _decode_mask(blk: bytes, stats_json: str, predicate: Predicate):
    """Predicate column fast path -> (verdict, mask).  Zone-map stats can
    answer without touching payload bytes; dictionary blocks evaluate the
    predicate once per distinct value and map over codes."""
    stats = json.loads(stats_json)
    zone = predicate.check_range(
        stats.get("vmin"), stats.get("vmax"), stats.get("has_null", False)
    )
    if zone == NONE:
        return "none", None
    payload, validity, meta, tag, codec, n_rows = blockmod.open_block(blk)
    n_valid = int(validity.sum()) if validity is not None else n_rows
    if codec == "dict":
        uniques, codes = dictionary.decode_parts(payload, meta, n_valid, tag)
        mask = predicate.dict_mask(uniques, codes, validity)
    else:
        values = blockmod.decode_values(payload, meta, n_valid, tag, codec)
        mask = predicate.mask(values, validity)
    if zone == ALL or mask.all():
        return "all", None
    if not mask.any():
        return "none", None
    return "some", mask


def _emit_columns(col_blocks: dict, out_cols: list[str], out_types: dict,
                  mask: np.ndarray | None) -> pa.RecordBatch | None:
    arrays = []
    fields = []
    for name in out_cols:
        blk = col_blocks[name]
        values, validity, tag, codec, n_rows = blockmod.decode_block(blk)
        arr = _to_arrow_full(values, validity, tag)
        if mask is not None:
            arr = arr.filter(pa.array(mask))
        target = out_types[name]
        if not arr.type.equals(target):
            arr = arr.cast(target)
        arrays.append(arr)
        fields.append(pa.field(name, target, True))
    if arrays and len(arrays[0]) == 0:
        return None
    return pa.RecordBatch.from_arrays(arrays, schema=pa.schema(fields))


def _make_decoder(read_cols: list[str], out_cols: list[str], out_types: dict,
                  predicates: list[Predicate], include_part_id: bool):
    def decode_stream(batches):
        pending: dict[str, dict] = {}  # column -> row dict, current group
        current: tuple[int, str, int] | None = None  # (part, run, seq)

        def flush():
            nonlocal pending
            if not pending:
                return None
            missing = set(read_cols) - set(pending)
            if missing:
                raise ValueError(f"blocks missing for columns {missing} "
                                 f"in group {current} — corrupt dataset")
            # conjunctive cascade (row_group_reader.rs:204-258): each
            # predicate column narrows the surviving mask in turn; an
            # all-false mask short-circuits the remaining columns
            mask = None
            for pred in predicates:
                row = pending[pred.column]
                verdict, pmask = _decode_mask(row["block"], row["stats"], pred)
                if verdict == "none":
                    pending = {}
                    return None
                if pmask is not None:
                    mask = pmask if mask is None else (mask & pmask)
                    if not mask.any():
                        pending = {}
                        return None
            out = _emit_columns(
                {c: pending[c]["block"] for c in out_cols}, out_cols, out_types, mask
            )
            if out is not None and include_part_id:
                pid = pa.array(np.full(out.num_rows, current[0], np.int64))
                out = pa.RecordBatch.from_arrays(
                    list(out.columns) + [pid],
                    schema=out.schema.append(pa.field(PART_ID, pa.int64(), False)),
                )
            pending = {}
            return out

        for batch in batches:
            d = batch.to_pylist()
            for row in d:
                key = (row[PART_ID], row["run_id"], row["seq"])
                if key != current:
                    out = flush()
                    if out is not None:
                        yield out
                    current = key
                pending[row["column"]] = row
        out = flush()
        if out is not None:
            yield out

    return decode_stream


def decode_table(
    spark,
    blocks_path: str,
    manifest_path: str,
    columns: list[str] | None = None,
    predicate: Predicate | list[Predicate] | None = None,
    include_part_id: bool = False,
    n_tasks: int | None = None,
    part_ids: list[int] | None = None,
    shuffle: bool = True,
):
    """Reconstruct the encoded table (or a projected, filtered slice).

    ``predicate`` may be a list: predicates are ANDed as a cascade —
    each filter column decodes in turn and narrows the surviving mask,
    short-circuiting the rest of the block group when it empties (the
    reference's multi-column read_with_filter cascade, SURVEY.md §3.2).

    ``shuffle=False`` is the zero-shuffle fast path: block groups are
    contiguous in the files the encoder wrote, and Spark never splits a
    parquet file smaller than spark.sql.files.maxPartitionBytes
    (128 MB), so the scan's own task layout already satisfies the
    decoder's contiguity contract.  Use only when every blocks file is
    under that limit (the default 64 MB partitions guarantee it);
    appended datasets and the default path keep the repartition.

    ``part_ids`` is the point-query path: only the named partitions'
    blocks are ever read (parquet predicate pushdown on part_id — the
    analog of the reference's skip() hopping whole row groups from
    footer arithmetic, local_file_reader.rs:126-171).
    """
    from pyspark.sql import functions as F, types as T

    meta, valid_pairs = manifestmod.load(spark, manifest_path)
    all_cols = meta["columns"]
    out_cols = list(columns or all_cols)
    unknown = set(out_cols) - set(all_cols)
    if unknown:
        # column resolution by name, unknown -> error (row_group_reader.rs:107-113)
        raise KeyError(f"unknown columns {unknown}; encoded: {all_cols}")
    predicates = ([] if predicate is None
                  else predicate if isinstance(predicate, list) else [predicate])
    read_cols = list(out_cols)
    for pred in predicates:
        if pred.column not in all_cols:
            raise KeyError(f"predicate column {pred.column} not encoded")
        if pred.column not in read_cols:
            read_cols.append(pred.column)

    schema = T.StructType.fromJson(json.loads(meta["schema_json"]))
    field_by_name = {f.name: f for f in schema.fields}
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    out_types = {}
    out_fields = []
    for c in out_cols:
        t = field_by_name[c].dataType
        out_types[c] = {
            "string": pa.string(), "binary": pa.binary(),
            "timestamp": pa.timestamp("us", tz=tz),
            "timestamp_ntz": pa.timestamp("us"),
            "date": pa.date32(),
            **{k: v for k, v in _FIXED_STRUCT.items()},
        }[t.typeName()]
        out_fields.append(T.StructField(c, t, True))
    if include_part_id:
        out_fields.append(T.StructField(PART_ID, T.LongType(), False))
    out_schema = T.StructType(out_fields)

    if part_ids is not None:
        wanted = set(part_ids)
        valid_pairs = [p for p in valid_pairs if p[0] in wanted]
    valid = spark.createDataFrame(valid_pairs, f"{PART_ID} long, run_id string")
    blocks = (
        spark.read.parquet(blocks_path)
        .join(F.broadcast(valid), [PART_ID, "run_id"], "inner")
        .filter(F.col("column").isin(read_cols))
    )
    if part_ids is not None:
        # explicit scan-level filter so pruning shows in PushedFilters
        blocks = blocks.filter(F.col(PART_ID).isin(list(wanted)))
    if shuffle:
        if n_tasks is None:
            n_tasks = max(spark.sparkContext.defaultParallelism,
                          min(int(meta["n_parts"]), 2048))
        blocks = blocks.repartition(n_tasks, F.col(PART_ID)).sortWithinPartitions(
            PART_ID, "run_id", "seq"  # appended runs are separate block groups
        )
    return blocks.mapInArrow(
        _make_decoder(read_cols, out_cols, out_types, predicates, include_part_id),
        out_schema,
    )
