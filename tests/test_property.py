"""Hypothesis property tests: every codec round-trips arbitrary inputs
bit-exactly, and corrupted blocks never decode silently.  The
randomized-round-trip discipline of the reference's codec tests
(rle_bp.rs:144-228, varint.rs:83-158) with a real shrinker behind it."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from boltspark.kernels import bitpack, block, rle, strings, varint


_SETTINGS = dict(max_examples=60, deadline=None)


@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
@settings(**_SETTINGS)
def test_varint_roundtrip_any_u64(values):
    v = np.array(values, dtype=np.uint64)
    out, consumed = varint.decode_array(varint.encode_array(v), len(v))
    assert out.tolist() == values


@given(st.integers(0, 64).flatmap(
    lambda w: st.tuples(st.just(w),
                        st.lists(st.integers(0, 2**w - 1 if w else 0),
                                 max_size=300))))
@settings(**_SETTINGS)
def test_bitpack_roundtrip_any_width(args):
    width, values = args
    v = np.array(values, dtype=np.uint64)
    assert bitpack.unpack(bitpack.pack(v, width), width, len(v)).tolist() == values


@given(st.lists(st.integers(0, 2**20 - 1), max_size=400),
       st.integers(20, 32))
@settings(**_SETTINGS)
def test_hybrid_rle_roundtrip(values, width):
    v = np.array(values, dtype=np.uint64)
    out = rle.decode_hybrid(rle.encode_hybrid(v, width), width, len(v))
    assert out.tolist() == values


@given(st.lists(st.binary(max_size=64), max_size=80))
@settings(**_SETTINGS)
def test_string_codecs_roundtrip_any_bytes(rows):
    col = strings.from_pylist(rows)
    for codec in ("plain", "dict", "fsst"):
        blk = block.encode_block(col, "bytes", codec)
        out, *_ = block.decode_block(blk)
        assert out.to_pylist() == rows, codec


@given(st.lists(st.integers(-2**62, 2**62), max_size=120),
       st.sampled_from(["plain", "rle", "for", "dict"]))
@settings(**_SETTINGS)
def test_int_codecs_roundtrip(values, codec):
    v = np.array(values, dtype=np.int64)
    blk = block.encode_block(v, "i64", codec)
    out, *_ = block.decode_block(blk)
    assert out.tolist() == values


@given(st.lists(st.tuples(st.integers(-2**63, 2**63 - 1),
                          st.integers(-2**63, 2**63 - 1)), max_size=100),
       st.lists(st.booleans(), max_size=100))
@settings(**_SETTINGS)
def test_d128_word_pairs_roundtrip(pairs, valid_bits):
    """128-bit (lo, hi) word pairs (decimal 19..38 storage): word-plane
    plain encode must round-trip every bit pattern, with and without a
    validity bitmap, through both full decode and decode_block_rows."""
    v = np.array(pairs, dtype=np.int64).reshape(-1, 2)
    n = len(v)
    blk = block.encode_block(v, "d128", "plain")
    out, validity, tag, codec, n_rows = block.decode_block(blk)
    assert tag == "d128" and n_rows == n
    assert np.asarray(out).tolist() == v.tolist()
    # with validity: dense rows scatter back per the bitmap
    validity = np.array((valid_bits + [True] * n)[:n], dtype=bool)
    if n:
        dense = v[validity]
        blk2 = block.encode_block(dense, "d128", "plain", validity=validity)
        out2, val2, *_ = block.decode_block(blk2)
        assert val2.tolist() == validity.tolist()
        assert np.asarray(out2).tolist() == dense.tolist()
        # late materialization picks the same rows
        mask = np.zeros(n, dtype=bool)
        mask[:: 2] = True
        sel, vsel, *_ = block.decode_block_rows(blk2, mask)
        assert np.asarray(sel).tolist() == v[mask & validity].tolist()


@given(st.lists(st.binary(min_size=1, max_size=40), min_size=5, max_size=40),
       st.data())
@settings(**_SETTINGS)
def test_corruption_never_silent(rows, data):
    """Flip one byte anywhere in an encoded block: decode must either
    raise CorruptBlockError or reproduce the original exactly (flips in
    padding are allowed to be harmless — but silent WRONG data never)."""
    col = strings.from_pylist(rows)
    blk = bytearray(block.encode_block(col, "bytes", "dict", outer="zstd"))
    pos = data.draw(st.integers(0, len(blk) - 1))
    blk[pos] ^= data.draw(st.integers(1, 255))
    try:
        out, *_ = block.decode_block(bytes(blk))
    except Exception:
        return  # loud failure is correct behavior for corrupted bytes
    assert out.to_pylist() == rows


@st.composite
def _string_lists(draw):
    n = draw(st.integers(0, 20))
    rows = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            rows.append(None)  # null row
        else:
            m = draw(st.integers(0, 6))
            rows.append([
                draw(st.one_of(st.none(), st.binary(max_size=12)))
                for _ in range(m)
            ])
    return rows


@given(_string_lists())
@settings(max_examples=60, deadline=None)
def test_lbytes_block_roundtrip_property(rows):
    """Arbitrary list<binary> rows (null rows, null elements, empty
    lists, empty bytes) survive the lbytes block bit-exact."""
    import numpy as np

    from boltspark.kernels import bitpack, block, lists, strings

    dense_rows = [r for r in rows if r is not None]
    validity = None
    if len(dense_rows) != len(rows):
        validity = np.array([r is not None for r in rows], dtype=bool)
    slots = [e for r in dense_rows for e in r]
    ev = None
    elems = slots
    if any(e is None for e in slots):
        ev = np.array([e is not None for e in slots], dtype=bool)
        elems = [e for e in slots if e is not None]
    offsets = np.zeros(len(dense_rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in dense_rows], out=offsets[1:])
    col = lists.ListColumn(offsets, strings.from_pylist(elems), ev)
    blk = block.encode_block(col, "lbytes", "list", validity=validity)
    out, out_validity, tag, codec, n = block.decode_block(blk)
    assert n == len(rows) and tag == "lbytes"
    if validity is None:
        assert out_validity is None
    else:
        assert np.array_equal(out_validity, validity)
    assert np.array_equal(out.offsets, offsets)
    assert out.values.to_pylist() == elems
    if ev is None:
        assert out.elem_validity is None
    else:
        assert np.array_equal(out.elem_validity, ev)
    # row gather agrees with full decode on a random-ish mask
    if len(dense_rows):
        mask = np.zeros(len(dense_rows), dtype=bool)
        mask[:: 2] = True
        sel, _, _, _, _ = block.decode_block_rows(
            block.encode_block(col, "lbytes", "list"), mask)
        keep = np.nonzero(mask)[0]
        exp = [dense_rows[i] for i in keep]
        got = []
        p = 0
        for i, r in enumerate(keep):
            row = []
            for s in range(sel.offsets[i], sel.offsets[i + 1]):
                if sel.elem_validity is not None and not sel.elem_validity[s]:
                    row.append(None)
                else:
                    row.append(sel.values[p])
                    p += 1
            got.append(row)
        assert got == exp
