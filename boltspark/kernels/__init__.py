"""Pure, Spark-free codec kernels operating on numpy/pyarrow arrays.

Each codec module exposes ``encode(...) -> (payload: bytes, meta: dict)``
and ``decode(payload, meta, n) -> values``.  The block container format
(validity bitmap, codec id, outer compression) lives in ``block.py``;
codec auto-selection in ``selector.py``.

Reference parity map (file:line cites are into /root/reference):
  varint.py     — src/utils/encoding/varint.rs:36-75
  bitpack.py    — RLE/BP bit-packed groups, src/utils/encoding/rle_bp.rs:30-98
  rle.py        — hybrid RLE/bit-pack format + vectorized array RLE
  dictionary.py — dictionary pages, src/page_reader/dictionary_page/*
  foref.py      — frame-of-reference (north-rule codec, absent in reference)
  fsst.py       — FSST string compression (VLDB 2020 paper; absent in reference)
  block.py      — page analog: header+validity+payload container
  selector.py   — sampled-stats codec auto-selection (absent in reference)
"""
