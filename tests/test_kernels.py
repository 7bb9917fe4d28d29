"""Codec kernel tests, mirroring the reference's test strategy (SURVEY.md §5):
randomized round-trips at every bit width (rle_bp.rs:144-167), constant
runs (rle_bp.rs:209-228), varint sweeps incl. 0/u64::MAX (varint.rs:83-131),
corruption tests (rle_bp.rs:169-186, varint.rs:133-158), and dual-path
pinning of vectorized kernels against slow pure-Python references."""

from __future__ import annotations

import numpy as np
import pytest

from boltspark.kernels import (
    bitpack,
    block,
    dictionary,
    foref,
    fsst,
    reference_impl as ref,
    rle,
    strings,
    varint,
)
from boltspark.kernels.varint import CorruptBlockError

# ---------------------------------------------------------------------------
# varint
# ---------------------------------------------------------------------------


def test_varint_scalar_sweep():
    # mirrors varint.rs:83-131: num << shift sweep, 0 and u64::MAX edges
    values = [0, 1, 127, 128, 300, 2**32 - 1, 2**64 - 1]
    for base in (1, 3, 127, 255, 12345):
        for shift in range(0, 57, 7):
            if (base << shift) < 2**64:
                values.append(base << shift)
    for v in values:
        buf = varint.encode_one(v)
        assert len(buf) <= varint.MAX_VARINT_LEN
        out, pos = varint.decode_one(buf)
        assert out == v and pos == len(buf)


def test_varint_array_roundtrip_and_pinning(rng):
    v = rng.integers(0, 2**63, 2000, dtype=np.uint64)
    v[:10] = [0, 1, 127, 128, 2**64 - 1, 5, 300, 2**32, 7, 2**50]
    buf = varint.encode_array(v)
    assert buf == ref.varint_encode(v)  # dual-path pinning
    out, consumed = varint.decode_array(buf, len(v))
    assert consumed == len(buf)
    np.testing.assert_array_equal(out, v)


def test_varint_corruption():
    # truncated
    with pytest.raises(CorruptBlockError):
        varint.decode_one(b"\x80\x80")
    # >10 bytes (varint.rs too-long test)
    with pytest.raises(CorruptBlockError):
        varint.decode_one(b"\x80" * 11)
    with pytest.raises(CorruptBlockError):
        varint.decode_array(b"\x80\x80\x01\x80", 2)


# ---------------------------------------------------------------------------
# bitpack
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("width", [0, 1, 2, 3, 5, 7, 8, 13, 16, 20, 31, 32, 48, 63, 64])
def test_bitpack_roundtrip_every_width(width, rng):
    # mirrors rle_bp.rs:144-167: random values at every bit width
    n = 257
    hi = (1 << width) if width < 64 else 2**64
    v = rng.integers(0, hi, n, dtype=np.uint64) if width else np.zeros(n, np.uint64)
    buf = bitpack.pack(v, width)
    assert len(buf) == bitpack.packed_size(n, width)
    np.testing.assert_array_equal(bitpack.unpack(buf, width, n), v)
    if width <= 16:  # slow-path pinning
        assert buf == ref.bitpack_pack(v.tolist(), width)
        assert ref.bitpack_unpack(buf, width, n) == v.tolist()


def test_bitpack_chunk_boundary(rng):
    # cross the internal 1Mi-value chunking boundary
    n = (1 << 20) + 77
    v = rng.integers(0, 1 << 5, n, dtype=np.uint64)
    np.testing.assert_array_equal(bitpack.unpack(bitpack.pack(v, 5), 5, n), v)


def test_bitpack_corruption():
    with pytest.raises(CorruptBlockError):
        bitpack.unpack(b"\x01", 8, 100)
    with pytest.raises(CorruptBlockError):
        bitpack.unpack(b"\x01" * 8, 65, 1)


def test_bools_roundtrip(rng):
    v = rng.integers(0, 2, 1001).astype(bool)
    np.testing.assert_array_equal(bitpack.unpack_bools(bitpack.pack_bools(v), len(v)), v)


# ---------------------------------------------------------------------------
# hybrid RLE/BP (rle_bp.rs parity format)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("width", [1, 2, 7, 8, 12, 20, 32])
def test_hybrid_random_roundtrip(width, rng):
    v = rng.integers(0, 1 << min(width, 20), 3000, dtype=np.uint64)
    buf = rle.encode_hybrid(v, width)
    np.testing.assert_array_equal(rle.decode_hybrid(buf, width, len(v)), v)
    assert ref.hybrid_decode(buf, width, len(v)) == v.tolist()  # pinning


def test_hybrid_constant_runs(rng):
    # mirrors rle_bp.rs:209-228: constant runs of length 1..100 at all widths
    for width in (1, 4, 9, 16):
        chunks = []
        for run in range(1, 101):
            chunks.append(np.full(run, run % (1 << min(width, 16)), np.uint64))
        v = np.concatenate(chunks)
        buf = rle.encode_hybrid(v, width)
        np.testing.assert_array_equal(rle.decode_hybrid(buf, width, len(v)), v)


def test_hybrid_all_same_is_tiny():
    v = np.full(100_000, 7, np.uint64)
    buf = rle.encode_hybrid(v, 3)
    assert len(buf) < 8
    np.testing.assert_array_equal(rle.decode_hybrid(buf, 3, len(v)), v)


def test_hybrid_width_zero():
    v = np.zeros(500, np.uint64)
    buf = rle.encode_hybrid(v, 0)
    np.testing.assert_array_equal(rle.decode_hybrid(buf, 0, 500), v)


def test_hybrid_corruption(rng):
    v = rng.integers(0, 1 << 8, 512, dtype=np.uint64)
    buf = rle.encode_hybrid(v, 8)
    with pytest.raises(CorruptBlockError):  # truncated (rle_bp.rs:169-186)
        rle.decode_hybrid(buf[: len(buf) // 2], 8, 512)


# ---------------------------------------------------------------------------
# frame-of-reference
# ---------------------------------------------------------------------------


def test_foref_roundtrip(rng):
    v = (10_000_000_000 + rng.integers(0, 4096, 5000)).astype(np.int64)
    payload, meta = foref.encode(v, "i64")
    assert meta["width"] <= 12
    assert len(payload) < v.nbytes / 4
    np.testing.assert_array_equal(foref.decode(payload, meta, len(v), "i64"), v)


def test_foref_negative_and_constant(rng):
    v = rng.integers(-500, -100, 1000).astype(np.int32)
    payload, meta = foref.encode(v, "i32")
    np.testing.assert_array_equal(foref.decode(payload, meta, len(v), "i32"), v)
    c = np.full(777, -42, np.int64)
    payload, meta = foref.encode(c, "i64")
    assert meta["width"] == 0 and payload == b""
    np.testing.assert_array_equal(foref.decode(payload, meta, 777, "i64"), c)


# ---------------------------------------------------------------------------
# strings / dictionary
# ---------------------------------------------------------------------------


def _random_strings(rng, n, max_len=40, card=None):
    vocab = None
    if card:
        vocab = [rng.bytes(rng.integers(0, max_len)) for _ in range(card)]
    vals = []
    for _ in range(n):
        if vocab is not None:
            vals.append(vocab[int(rng.integers(0, card))])
        else:
            vals.append(rng.bytes(int(rng.integers(0, max_len))))
    return vals


def test_strings_plain_roundtrip(rng):
    vals = _random_strings(rng, 500) + [b"", b"\x00\xff", "héllo→".encode()]
    col = strings.from_pylist(vals)
    payload, _ = strings.encode_plain(col)
    out = strings.decode_plain(payload, len(vals))
    assert out.to_pylist() == vals
    assert ref.strings_plain_decode(payload, len(vals)).to_pylist() == vals


def test_strings_arrow_roundtrip(rng):
    import pyarrow as pa

    vals = _random_strings(rng, 300)
    col = strings.from_arrow(pa.array(vals, pa.binary()))
    assert col.to_pylist() == vals
    back = strings.to_arrow(col)
    assert back.to_pylist() == vals


def test_dict_bytes_roundtrip(rng):
    # cardinality 1000 forcing dictionary encoding (test_utils.rs:303-318)
    vals = [str(i % 1000).encode() for i in range(20_000)]
    col = strings.from_pylist(vals)
    payload, meta = dictionary.encode(col, "bytes")
    assert meta["n_dict"] == 1000 and meta["sorted"]
    assert len(payload) < col.nbytes / 2
    out = dictionary.decode(payload, meta, len(vals), "bytes")
    assert out.to_pylist() == vals


@pytest.mark.parametrize("tag,dtype", [("i32", np.int32), ("i64", np.int64),
                                       ("f64", np.float64)])
def test_dict_fixed_roundtrip(tag, dtype):
    v = (np.arange(15_000) % 1000).astype(dtype)
    payload, meta = dictionary.encode(v, tag)
    assert meta["n_dict"] == 1000
    np.testing.assert_array_equal(dictionary.decode(payload, meta, len(v), tag), v)


def test_dict_parts_expose_sorted_dictionary(rng):
    vals = [b"kiwi", b"apple", b"pear"] * 100
    payload, meta = dictionary.encode(strings.from_pylist(vals), "bytes")
    uniques, codes = dictionary.decode_parts(payload, meta, len(vals), "bytes")
    assert uniques.to_pylist() == [b"apple", b"kiwi", b"pear"]
    # dictionary-level predicate eval: mask on uniques, map over codes
    mask = np.array([u < b"l" for u in uniques.to_pylist()])
    keep = mask[codes]
    assert int(keep.sum()) == 200


def test_dict_corruption(rng):
    vals = [str(i % 50).encode() for i in range(500)]
    payload, meta = dictionary.encode(strings.from_pylist(vals), "bytes")
    with pytest.raises(CorruptBlockError):
        dictionary.decode(payload[:10], meta, 500, "bytes")
    bad = dict(meta, n_dict=10)  # codes out of range
    with pytest.raises(CorruptBlockError):
        dictionary.decode(payload, bad, 500, "bytes")


def test_float_bit_identity_dict_rle():
    """-0.0 vs 0.0 and non-canonical NaN payloads must survive dict/rle
    bit-identical (factorize/run-detect on the uint view, ADVICE r1)."""
    odd_nan = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(), "<f8")[0]
    v = np.array([0.0, -0.0, 0.0, -0.0, np.nan, odd_nan, 1.5, 1.5], np.float64)
    for codec in ("plain", "dict", "rle"):
        blk = block.encode_block(v, "f64", codec)
        out = np.asarray(block.decode_block(blk)[0])
        assert out.view(np.uint64).tolist() == v.view(np.uint64).tolist(), codec
    v32 = np.array([0.0, -0.0, -0.0, 2.5] * 10, np.float32)
    for codec in ("dict", "rle"):
        blk = block.encode_block(v32, "f32", codec)
        out = np.asarray(block.decode_block(blk)[0])
        assert out.view(np.uint32).tolist() == v32.view(np.uint32).tolist(), codec


def test_truncated_block_raises_corrupt_not_struct_error():
    blk = block.encode_block(np.arange(100, dtype=np.int64), "i64", "plain")
    for cut in range(4, len(blk), 7):
        with pytest.raises((CorruptBlockError, ValueError)):
            block.decode_block(blk[:cut])


def test_bitflip_fuzz_never_silent(rng):
    """Any single-bit flip anywhere in a block (header, meta, validity,
    lengths, payload) must either raise a typed error or decode
    bit-identical — never silently wrong data.  The CRC chains over the
    whole block, not just the payload."""
    vals = strings.from_pylist([f"src/m_{i % 40}/f.py".encode() for i in range(2000)])
    blk = block.encode_block(vals, "bytes", "dict", outer="zstd")
    ref = block.decode_block(blk)[0].to_pylist()
    for _ in range(200):
        b = bytearray(blk)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            got = block.decode_block(bytes(b))[0].to_pylist()
        except (CorruptBlockError, ValueError, KeyError, TypeError):
            continue
        assert got == ref, f"silent corruption from flip at byte {i}"


def test_list_block_roundtrip(rng):
    from boltspark.kernels import lists

    n, dim = 200, 48
    offs = np.arange(0, dim * (n + 1), dim, dtype=np.int64)
    for tag, vals in [
        ("lf32", rng.normal(size=dim * n).astype(np.float32)),
        ("lf64", rng.normal(size=dim * n).astype(np.float64)),
        ("li64", rng.integers(0, 40, dim * n).astype(np.int64)),
        ("li32", rng.integers(-5, 5, dim * n).astype(np.int32)),
    ]:
        col = lists.ListColumn(offs, vals)
        blk = block.encode_block(col, tag, "list", outer="zstd")
        out, validity, t2, codec, nn = block.decode_block(blk)
        assert nn == n and validity is None and codec == "list"
        assert (out.offsets == col.offsets).all()
        assert out.values.tobytes() == col.values.tobytes(), tag  # bit-identical
        with pytest.raises(CorruptBlockError):
            block.decode_block(blk[: len(blk) // 2])


def test_list_block_ragged_and_nulls(rng):
    from boltspark.kernels import lists

    validity = rng.random(400) > 0.25
    dense_n = int(validity.sum())
    lens = rng.integers(0, 9, dense_n).astype(np.int64)
    offs = np.zeros(dense_n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vals = rng.integers(0, 1000, int(lens.sum())).astype(np.int64)
    col = lists.ListColumn(offs, vals)
    blk = block.encode_block(col, "li64", "list", validity=validity)
    out, v2, _, _, nn = block.decode_block(blk)
    assert nn == 400 and (v2 == validity).all()
    assert (out.offsets == col.offsets).all()
    assert out.values.tobytes() == col.values.tobytes()


def test_decode_block_rows_matches_full_decode(rng):
    """Selective decode must equal full-decode-then-index across codecs,
    null layouts, and types (late-materialization kernel)."""
    from boltspark.kernels import lists

    n = 1200
    validity = rng.random(n) > 0.2
    nv = int(validity.sum())
    cases = [
        ("bytes", "dict", strings.from_pylist(
            [f"lang_{i % 7}".encode() for i in range(nv)])),
        ("bytes", "plain", strings.from_pylist(
            [f"row {i} text {'x' * (i % 19)}".encode() for i in range(nv)])),
        ("bytes", "fsst", strings.from_pylist(
            [f"def f_{i}(): return {i % 13}\n".encode() for i in range(nv)])),
        ("i64", "for", (rng.integers(0, 500, nv) + 10**9).astype(np.int64)),
        ("i64", "rle", np.repeat(np.arange(nv // 10 + 1), 10)[:nv].astype(np.int64)),
        ("f64", "plain", rng.normal(size=nv)),
    ]
    lens = rng.integers(0, 6, nv).astype(np.int64)
    offs = np.zeros(nv + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    cases.append(("li64", "list", lists.ListColumn(
        offs, rng.integers(0, 99, int(lens.sum())).astype(np.int64))))
    for tag, codec, dense in cases:
        for val in (None, validity):
            if codec == "fsst":
                from boltspark.kernels import fsst as fsstmod
                table = fsstmod.build_symbol_table_best(dense.data[: 1 << 14])
                blk = block.encode_block(dense, tag, codec, validity=val,
                                         outer="zstd", fsst_table=table)
            else:
                blk = block.encode_block(dense, tag, codec, validity=val)
            full_v, full_val, _, _, n_rows = block.decode_block(blk)
            mask = rng.random(n_rows) < 0.1
            mask[0] = True  # never empty
            sel_v, sel_val, t2, c2, n_sel = block.decode_block_rows(blk, mask)
            assert n_sel == int(mask.sum())
            rows = np.nonzero(mask)[0]
            # expected: full decode indexed at selected rows
            if full_val is not None:
                exp_val = full_val[rows]
                assert (sel_val == exp_val).all()
                dcum = np.cumsum(full_val) - 1
                didx = dcum[rows[exp_val]]
            else:
                assert sel_val is None
                didx = rows
            if tag == "bytes":
                exp = [full_v[int(i)] for i in didx]
                assert sel_v.to_pylist() == exp, (tag, codec)
            elif tag.startswith("l"):
                explens = full_v.lengths()[didx]
                assert (sel_v.lengths() == explens).all()
                expvals = np.concatenate([
                    np.asarray(full_v.values)[full_v.offsets[i]:full_v.offsets[i + 1]]
                    for i in didx]) if len(didx) else np.zeros(0, np.int64)
                assert sel_v.values.tolist() == expvals.tolist(), (tag, codec)
            else:
                assert np.asarray(sel_v).tobytes() == np.asarray(full_v)[didx].tobytes(), (tag, codec)


def test_bloom_never_false_negative(rng):
    from boltspark.kernels import bloom

    vals = [rng.bytes(int(rng.integers(1, 30))) for _ in range(3000)]
    bl = bloom.build(set(vals))
    assert all(bloom.maybe_contains(bl, v) for v in vals)
    # false-positive rate sane at this load
    misses = sum(not bloom.maybe_contains(bl, b"absent-%d" % i)
                 for i in range(2000))
    assert misses > 1000, f"fp rate too high: {(2000 - misses) / 2000}"


def test_bloom_build_matches_reference_loop(rng):
    """Round-6 vectorized build must stay BIT-identical to the original
    per-value loop — the double-hash layout is an on-disk contract
    (filters written by old encoders are probed by new readers and
    vice versa)."""
    import zlib

    from boltspark.kernels import bloom

    def reference_build(values):
        bits = bytearray(bloom.M_BITS // 8)
        for v in values:
            h1 = zlib.crc32(v)
            h2 = zlib.crc32(v, 0x9E3779B9 & 0xFFFFFFFF) | 1
            for i in range(bloom.K):
                p = (h1 + i * h2) % bloom.M_BITS
                bits[p >> 3] |= 1 << (p & 7)
        return bytes(bits)

    for n in (0, 1, 7, 500):
        vals = [rng.bytes(int(rng.integers(0, 40))) for _ in range(n)]
        assert bloom.build(iter(vals)) == reference_build(vals), n


def test_from_arrow_sliced_array_exact():
    """from_arrow on a SLICED arrow array (non-zero offset) must return
    exactly the slice's rows and bytes — the encode path slices record
    batches at block boundaries."""
    import pyarrow as pa

    vals = [b"alpha", b"", b"bravo-longer", b"c", b"dd", b"eee"]
    arr = pa.array(vals, pa.large_binary())
    for lo, hi in ((0, 6), (1, 5), (2, 6), (3, 3)):
        sl = arr.slice(lo, hi - lo)
        col = strings.from_arrow(sl)
        assert col.to_pylist() == vals[lo:hi], (lo, hi)
        assert int(col.offsets[0]) == 0
        assert len(col.data) == sum(len(v) for v in vals[lo:hi])


def test_split_codec_roundtrip_bit_exact(rng):
    """Byte-stream split (the BYTE_STREAM_SPLIT the reference's Thrift
    model names but its readers reject) round-trips bit-exact."""
    odd = np.frombuffer(np.uint64(0x7FF8000000000001).tobytes(), "<f8")[0]
    cases = [
        ("f64", np.concatenate([rng.normal(size=3000), [0.0, -0.0, np.nan, odd]])),
        ("f32", rng.normal(size=3000).astype(np.float32)),
        ("i64", rng.integers(0, 10**12, 3000)),
        ("i32", rng.integers(-50000, 50000, 3000).astype(np.int32)),
    ]
    for tag, v in cases:
        blk = block.encode_block(v, tag, "split", outer="zstd")
        out = np.asarray(block.decode_block(blk)[0])
        assert out.tobytes() == np.ascontiguousarray(v).tobytes(), tag
        with pytest.raises(CorruptBlockError):
            block.decode_block(blk[: len(blk) - 7])


def test_selector_picks_split_for_large_float_noise(rng):
    """At real block sizes the exponent byte-plane pays through zstd;
    the trial-encoding selector must see it (the win only appears past
    ~256 KB inputs where zstd blocks align with planes — smaller inputs
    correctly keep plain)."""
    from boltspark.kernels import selector

    v = (rng.normal(size=300_000) * 0.1).astype(np.float32)
    ch = selector.choose(v, "f32")
    assert ch.codec == "split" and ch.outer == "zstd", (ch.codec, ch.outer)


def test_list_block_null_elements_roundtrip():
    """Element-validity bitmap inside the list codec: null elements
    round-trip exactly; validity/value-count mismatches raise."""
    import numpy as np

    from boltspark.kernels import block, lists
    from boltspark.kernels.varint import CorruptBlockError

    offsets = np.array([0, 3, 3, 7, 8], dtype=np.int64)  # slot counts
    ev = np.array([1, 0, 1, 1, 1, 0, 0, 1], dtype=bool)  # 8 slots, 5 valid
    dense = np.array([1.5, 2.5, 3.5, 4.5, 5.5], dtype=np.float64)
    col = lists.ListColumn(offsets, dense, ev)
    blk = block.encode_block(col, "lf64", "list")
    out, validity, tag, codec, n = block.decode_block(blk)
    assert n == 4 and validity is None and tag == "lf64"
    assert np.array_equal(out.offsets, offsets)
    assert np.array_equal(out.elem_validity, ev)
    assert np.array_equal(out.values, dense)

    # late-materialized row gather keeps slot/dense mapping straight
    mask = np.array([True, False, True, False])
    sel, _, _, _, nsel = block.decode_block_rows(blk, mask)
    assert nsel == 2
    assert np.array_equal(sel.offsets, [0, 3, 7])
    assert np.array_equal(sel.elem_validity, ev[[0, 1, 2, 3, 4, 5, 6]])
    assert np.array_equal(sel.values, [1.5, 2.5, 3.5, 4.5])

    # corrupted bitmap count raises loudly
    bad = lists.ListColumn(offsets, dense[:4], ev)
    try:
        block.encode_block(bad, "lf64", "list")
        payload_ok = True
    except Exception:
        payload_ok = False
    # (encode does not cross-check; decode must) — flip a meta-recorded
    # count by re-encoding with inconsistent inputs and expect decode to
    # catch the lengths/validity mismatch
    if payload_ok:
        import pytest

        with pytest.raises(CorruptBlockError):
            block.decode_block(block.encode_block(
                lists.ListColumn(np.array([0, 9], np.int64), dense, ev),
                "lf64", "list"))


def test_lbytes_list_block_roundtrip():
    """list<string> blocks: lengths stream + byte-array element stream
    (own selector), element validity, and the row gather."""
    import numpy as np

    from boltspark.kernels import block, lists, strings

    offsets = np.array([0, 2, 2, 5, 6], dtype=np.int64)
    vals = strings.from_pylist([b"ab", b"", b"hello", b"x", b"yy", b"zzz"])
    col = lists.ListColumn(offsets, vals)
    blk = block.encode_block(col, "lbytes", "list")
    out, validity, tag, codec, n = block.decode_block(blk)
    assert (n, tag) == (4, "lbytes") and validity is None
    assert np.array_equal(out.offsets, offsets)
    assert out.values.to_pylist() == vals.to_pylist()

    ev = np.array([1, 0, 1, 1, 0, 1], dtype=bool)
    dense = strings.from_pylist([b"ab", b"hello", b"x", b"zzz"])
    blk2 = block.encode_block(lists.ListColumn(offsets, dense, ev),
                              "lbytes", "list")
    o2, *_ = block.decode_block(blk2)
    assert np.array_equal(o2.elem_validity, ev)
    assert o2.values.to_pylist() == dense.to_pylist()
    sel, _, _, _, ns = block.decode_block_rows(blk2, np.array([True, False, True, False]))
    assert ns == 2 and np.array_equal(sel.offsets, [0, 2, 5])
    assert sel.values.to_pylist() == [b"ab", b"hello", b"x"]


# ---------------------------------------------------------------------------
# delta codec (sorted ints) + prefix front coding (sorted byte arrays)
# ---------------------------------------------------------------------------


def test_delta_roundtrip_shapes(rng):
    from boltspark.kernels import delta

    ts = np.cumsum(rng.integers(1, 1000, 50000)).astype(np.int64) + 1_600_000_000_000_000
    cases = [
        ("i64", ts),                                              # sorted
        ("i64", rng.integers(-2**40, 2**40, 10000).astype(np.int64)),  # random
        ("i32", rng.integers(-2**20, 2**20, 10000).astype(np.int32)),
        ("i64", np.full(777, -42, dtype=np.int64)),               # constant
        ("i64", np.array([7], dtype=np.int64)),                   # single
        ("i64", np.zeros(0, dtype=np.int64)),                     # empty
    ]
    for tag, v in cases:
        payload, meta = delta.encode(v, tag)
        out = delta.decode(payload, meta, len(v), tag)
        np.testing.assert_array_equal(out, v)
        assert out.dtype == v.dtype
        # through the block container too (CRC + validity paths)
        blk = block.encode_block(v, tag, "delta", outer="zstd")
        np.testing.assert_array_equal(np.asarray(block.decode_block(blk)[0]), v)


def test_delta_refuses_wide_spans():
    from boltspark.kernels import delta

    # value span and delta span beyond safe int64 arithmetic must raise
    # (the engine's fallback then stores the block plain)
    with pytest.raises(ValueError):
        delta.encode(np.array([-(2**62), 2**62], dtype=np.int64), "i64")
    with pytest.raises(ValueError):
        delta.encode(np.array([0, 2**61, 0, 2**61], dtype=np.int64), "i64")
    with pytest.raises(TypeError):
        delta.encode(np.zeros(4, dtype=np.float64), "f64")


def test_delta_beats_foref_on_sorted(rng):
    from boltspark.kernels import delta, foref

    ts = np.cumsum(rng.integers(1, 500, 65536)).astype(np.int64) + 10**15
    d_payload, _ = delta.encode(ts, "i64")
    f_payload, _ = foref.encode(ts, "i64")
    assert len(d_payload) < len(f_payload) / 2  # step range << value range


def test_selector_picks_delta_for_sorted_timestamps(rng):
    from boltspark.kernels import selector

    ts = np.cumsum(rng.integers(1, 1000, 65536)).astype(np.int64) + 10**15
    choice = selector.choose(ts, "i64")
    assert choice.codec == "delta"


def _sorted_paths(rng, n_repos=4, per_repo=800):
    rows = []
    for r in range(n_repos):
        base = f"github.com/org{r}/project-{r}/src/main/java/com/example/mod{r}/"
        for i in range(per_repo):
            rows.append((base + f"dir{i//50:03d}/File_{i:05d}_"
                         f"{int(rng.integers(10**8)):09d}.java").encode())
    rows.sort()
    return rows


def test_prefix_roundtrip_sorted_paths(rng):
    from boltspark.kernels import prefix

    rows = _sorted_paths(rng)
    # edge rows: empties, duplicates, a long outlier
    rows = [b"", b""] + rows + [rows[-1], b"z" * 5000]
    col = strings.from_pylist(rows)
    payload, meta = prefix.encode(col, "bytes")
    out = prefix.decode(payload, meta, len(col), "bytes")
    assert out.data == col.data and (out.offsets == col.offsets).all()
    blk = block.encode_block(col, "bytes", "prefix", outer="zstd")
    got = block.decode_block(blk)[0]
    assert got.to_pylist() == rows


def test_prefix_roundtrip_unsorted_and_edge(rng):
    from boltspark.kernels import prefix

    # arbitrary (unsorted) bytes must still round-trip bit-exact
    rows = [bytes(rng.integers(0, 256, int(rng.integers(0, 40))).astype(np.uint8))
            for _ in range(500)]
    col = strings.from_pylist(rows)
    payload, meta = prefix.encode(col, "bytes")
    out = prefix.decode(payload, meta, len(col), "bytes")
    assert out.to_pylist() == rows
    # empty column
    empty = strings.from_pylist([])
    p2, m2 = prefix.encode(empty, "bytes")
    assert prefix.decode(p2, m2, 0, "bytes").to_pylist() == []


def test_prefix_block_with_nulls_and_late_materialization(rng):
    from boltspark.kernels import prefix  # noqa: F401

    rows = _sorted_paths(rng, n_repos=2, per_repo=300)
    validity = rng.random(len(rows) + 100) > 0.2
    dense = strings.from_pylist(rows[: int(validity.sum())]
                                if int(validity.sum()) <= len(rows)
                                else rows + rows[: int(validity.sum()) - len(rows)])
    blk = block.encode_block(dense, "bytes", "prefix", validity=validity,
                             outer="zstd")
    vals, vd, tag, codec, n = block.decode_block(blk)
    assert codec == "prefix" and n == len(validity)
    assert vals.to_pylist() == dense.to_pylist()
    # late materialization goes through full-decode + take for prefix
    mask = rng.random(len(validity)) < 0.1
    sel, vsel, *_ = block.decode_block_rows(blk, mask)
    idx = np.nonzero(mask)[0]
    dcum = np.cumsum(validity) - 1
    expect = [dense[int(dcum[i])] for i in idx if validity[i]]
    assert sel.to_pylist() == expect


def test_prefix_corruption_is_loud(rng):
    from boltspark.kernels import prefix

    rows = _sorted_paths(rng, n_repos=1, per_repo=400)
    col = strings.from_pylist(rows)
    payload, meta = prefix.encode(col, "bytes")
    with pytest.raises(CorruptBlockError):
        prefix.decode(payload[: len(payload) // 3], meta, len(col), "bytes")
    with pytest.raises(CorruptBlockError):
        prefix.decode(b"", meta, len(col), "bytes")
    # whole-block bitflips: typed error or bit-identical, never silent
    blk = block.encode_block(col, "bytes", "prefix", outer="zstd")
    ref_rows = block.decode_block(blk)[0].to_pylist()
    for _ in range(150):
        b = bytearray(blk)
        i = int(rng.integers(0, len(b)))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            got = block.decode_block(bytes(b))[0].to_pylist()
        except (CorruptBlockError, ValueError, KeyError, TypeError):
            continue
        assert got == ref_rows, f"silent corruption from flip at byte {i}"


def test_selector_picks_prefix_for_sorted_paths(rng):
    from boltspark.kernels import selector

    rows = _sorted_paths(rng, n_repos=4, per_repo=900)
    col = strings.from_pylist(rows)
    choice = selector.choose(col, "bytes", exclude=("fsst",))
    assert choice.codec == "prefix"
