"""Dictionary codec: sorted uniques + hybrid RLE/BP code stream.

Capability parity (inverted: the reference only decodes):
  - dictionary pages, fixed width + byte array:
    /root/reference/src/page_reader/dictionary_page/dictionary_page_int32.rs:87-155,
    dictionary_page_byte_array.rs:86-165
  - RLE/BP dictionary-coded data pages:
    /root/reference/src/page_reader/data_page_v1/rle_bp_data_page_int32_v1.rs
  - the ``is_sorted`` flag (dictionary_page_byte_array.rs:157): our
    dictionaries are always stored sorted, enabling binary-search
    predicate evaluation on the dictionary (``decode_parts`` +
    engine.filters implement the dictionary-level predicate pushdown of
    dictionary_page_int32_with_filters.rs:97-177).

Layout: ``u64 dict_payload_len | dict sub-payload | hybrid RLE/BP codes``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack, rle, strings
from .types import BYTES, dtype_of
from .varint import CorruptBlockError


def _factorize_fixed(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    # float columns factorize on the BIT PATTERN (uint view) so that
    # -0.0 vs 0.0 and non-canonical NaN payloads survive bit-identical
    # (float equality would collapse them; the decode invariant is
    # sha256-exact, not ==-exact).  The dictionary bytes are unchanged —
    # the uint view has the same width, so decode's frombuffer+view
    # reproduces the original bits.
    if values.dtype.kind == "f":
        iv = values.view(np.uint32 if values.dtype.itemsize == 4 else np.uint64)
        uniq_iv, codes = np.unique(iv, return_inverse=True)
        return uniq_iv.view(values.dtype), codes.astype(np.uint64)
    uniques, codes = np.unique(values, return_inverse=True)
    return uniques, codes.astype(np.uint64)


def _factorize_bytes(col: strings.StringColumn) -> tuple[strings.StringColumn, np.ndarray]:
    arr = strings.to_arrow(col)
    denc = arr.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dict_arr = denc.dictionary
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # sort the dictionary; remap codes through the permutation
    order = pc.array_sort_indices(dict_arr).to_numpy()
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    sorted_dict = strings.from_arrow(pc.take(dict_arr, pa.array(order)))
    return sorted_dict, rank[codes].astype(np.uint64)


def encode(values, tag: str) -> tuple[bytes, dict]:
    if tag == BYTES:
        uniques, codes = _factorize_bytes(values)
        dict_payload, _ = strings.encode_plain(uniques)
        n_dict = len(uniques)
    else:
        uniques, codes = _factorize_fixed(np.ascontiguousarray(values))
        dict_payload = np.ascontiguousarray(uniques, dtype=dtype_of(tag)).tobytes()
        n_dict = len(uniques)
    width = bitpack.min_bit_width(max(n_dict - 1, 0))
    code_stream = rle.encode_hybrid(codes, width)
    payload = struct.pack("<Q", len(dict_payload)) + dict_payload + code_stream
    return payload, {"n_dict": n_dict, "width": width, "sorted": True}


def decode_dictionary(payload: bytes, meta: dict, tag: str):
    """Return ONLY the (sorted) dictionary, never touching the code
    stream — the hook for distinct-set aggregation, where every entry is
    known to occur in the block by construction."""
    if len(payload) < 8:
        raise CorruptBlockError("dict: truncated header")
    (dict_len,) = struct.unpack_from("<Q", payload, 0)
    if len(payload) < 8 + dict_len:
        raise CorruptBlockError("dict: truncated dictionary")
    dict_payload = payload[8 : 8 + dict_len]
    n_dict = int(meta["n_dict"])
    if tag == BYTES:
        return strings.decode_plain(dict_payload, n_dict)
    dt = dtype_of(tag)
    if dict_len != n_dict * dt.itemsize:
        raise CorruptBlockError("dict: dictionary size mismatch "
                                "(dictionary_page_int32.rs:87-155 checks the same)")
    return np.frombuffer(dict_payload, dtype=dt)


def decode_parts(payload: bytes, meta: dict, n: int, tag: str):
    """Return (uniques, codes) without materializing values — the hook for
    dictionary-level predicate pushdown (evaluate predicate once per
    distinct value, then mask codes)."""
    uniques = decode_dictionary(payload, meta, tag)
    (dict_len,) = struct.unpack_from("<Q", payload, 0)
    n_dict = int(meta["n_dict"])
    width = int(meta["width"])
    codes = rle.decode_hybrid(payload[8 + dict_len :], width, n).astype(np.int64)
    if n and n_dict and int(codes.max()) >= n_dict:
        raise CorruptBlockError("dict: code out of range")
    return uniques, codes


def decode(payload: bytes, meta: dict, n: int, tag: str):
    uniques, codes = decode_parts(payload, meta, n, tag)
    if tag == BYTES:
        return strings.take(uniques, codes)
    return uniques[codes]
