"""Fixed-element list columns (``array<float>`` embeddings etc.).

Same decomposition trick the byte-array kernel uses (strings.py):
a list column is (offsets, flattened fixed values).  The reference
parses nested schemas but refuses to read them
(/root/reference/src/metadata/utils.rs:88-209, rep_def_parser.rs:36-46);
here list columns are first-class.

Block layout for the ``list`` codec:

    inner   u8   index into block.CODEC_IDS (codec of the VALUES stream)
    lwidth  u8   bit width of the length stream
    llen    u64  byte length of the hybrid RLE/BP length stream
    lengths hybrid RLE/BP stream (n values)  — embeddings have one
            constant dimension, so this is typically a single RLE run
    values  inner-codec payload of the flattened element stream

The values codec is picked by the same sampled-trial selector as any
fixed column, so constant embeddings dictionaries, monotone int lists
(FoR) etc. all compress as they would flat.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from . import bitpack, rle
from .types import dtype_of
from .varint import CorruptBlockError

# list tag -> element tag ("lbytes" = list<string|binary>: the values
# stream is a StringColumn riding the byte-array sub-codecs)
LIST_TAGS = {"li32": "i32", "li64": "i64", "lf32": "f32", "lf64": "f64",
             "lbytes": "bytes"}


@dataclass(frozen=True)
class ListColumn:
    """Dense list column: offsets (int64, len n+1) + flat element values.

    ``elem_validity`` (the definition-level analog one nesting level
    down — the reference's rep_def_parser refuses nested nulls at read,
    rep_def_parser.rs:36-46; we carry them) marks null ELEMENTS inside
    list values: ``offsets`` then count every element slot including
    nulls, while ``values`` holds only the valid (dense) elements."""

    offsets: np.ndarray
    values: np.ndarray
    elem_validity: np.ndarray | None = None  # bool per element slot

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def nbytes(self) -> int:
        ev = self.elem_validity
        return (self.values.nbytes + self.offsets.nbytes
                + (ev.nbytes if ev is not None else 0))

    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)


def encode(col: ListColumn, tag: str,
           outer_level: int | None = None) -> tuple[bytes, dict]:
    from . import block, selector  # lazy: block imports this module

    value_tag = LIST_TAGS[tag]
    lengths = col.lengths().astype(np.uint64)
    lwidth = bitpack.min_bit_width(int(lengths.max()) if len(lengths) else 0)
    lstream = rle.encode_hybrid(lengths, lwidth)
    if value_tag == "bytes":
        values = col.values  # StringColumn element stream
    else:
        values = np.ascontiguousarray(col.values, dtype=dtype_of(value_tag))
    # trial WITH the outer compressor: codecs like byte-stream split only
    # pay through it (the block layer applies the actual outer pass, so
    # only choice.codec is used here).  fsst is excluded for element
    # streams: with no prebuilt table the trial AND the real encode
    # would each build a symbol table PER BLOCK (~0.7 s of pure-Python
    # greedy construction each) — an indefensible per-block cost at
    # scale for a marginal ratio win over dict/plain+zstd on tag-like
    # element data.
    choice = selector.choose(values, value_tag, outer="zstd",
                             outer_level=outer_level, exclude=("fsst",))
    try:
        vpayload, vmeta = block.encode_values(values, value_tag, choice.codec)
        inner = choice.codec
    except (TypeError, ValueError):
        vpayload, vmeta = block.encode_values(values, value_tag, "plain")
        inner = "plain"
    ev = b""
    meta = {"inner": inner, "vmeta": vmeta, "n_values": len(values)}
    if col.elem_validity is not None:
        # element-validity bitmap between the length and value streams
        # (mirrors the row-validity design in block.py)
        ev = bitpack.pack_bools(col.elem_validity)
        meta["ev"] = True
        meta["n_slots"] = int(len(col.elem_validity))
    payload = (
        struct.pack("<BBQ", block.CODEC_IDS.index(inner), lwidth, len(lstream))
        + lstream + ev + vpayload
    )
    return payload, meta


def decode(payload: bytes, meta: dict, n: int, tag: str) -> ListColumn:
    from . import block  # lazy

    value_tag = LIST_TAGS[tag]
    if len(payload) < 10:
        raise CorruptBlockError("list: truncated header")
    inner_id, lwidth, llen = struct.unpack_from("<BBQ", payload, 0)
    if inner_id >= len(block.CODEC_IDS):
        raise CorruptBlockError("list: bad inner codec id")
    inner = block.CODEC_IDS[inner_id]
    if inner != meta.get("inner"):
        raise CorruptBlockError("list: inner codec mismatch with meta")
    pos = 10
    if len(payload) < pos + llen:
        raise CorruptBlockError("list: truncated length stream")
    lengths = rle.decode_hybrid(payload[pos : pos + llen], lwidth, n).astype(np.int64)
    pos += llen
    n_values = int(meta["n_values"])
    elem_validity = None
    if meta.get("ev"):
        n_slots = int(meta["n_slots"])
        if int(lengths.sum()) != n_slots:
            raise CorruptBlockError("list: lengths do not sum to slot count")
        nbytes = (n_slots + 7) // 8
        if len(payload) < pos + nbytes:
            raise CorruptBlockError("list: truncated element-validity bitmap")
        elem_validity = bitpack.unpack_bools(payload[pos : pos + nbytes], n_slots)
        pos += nbytes
        if int(elem_validity.sum()) != n_values:
            raise CorruptBlockError("list: element validity does not sum to "
                                    "value count")
    elif int(lengths.sum()) != n_values:
        raise CorruptBlockError("list: lengths do not sum to value count")
    values = block.decode_values(payload[pos:], meta.get("vmeta", {}),
                                 n_values, value_tag, inner)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if value_tag != "bytes":
        values = np.asarray(values)
    return ListColumn(offsets, values, elem_validity)
