"""FSST and block-container tests: round-trips on adversarial string
corpora (FIXTURES.md §3), null interleave (%5/%17 pattern), outer
compression layering, and corruption behavior."""

from __future__ import annotations

import numpy as np
import pytest

from boltspark.kernels import block, fsst, selector, strings
from boltspark.kernels.varint import CorruptBlockError
from tests.conftest import null_mask

CODE_SAMPLE = b'''\
def encode_partition(batch, codec):
    for column in batch.columns:
        values = np.asarray(column)
        payload, meta = encode_values(values, tag, codec)
        yield payload, meta
'''


def _code_corpus(n=400):
    vals = []
    for i in range(n):
        vals.append(CODE_SAMPLE.replace(b"codec", b"codec%d" % (i % 7))
                    + b"# line %d\n" % i)
    return vals


@pytest.mark.parametrize("vals", [
    [],
    [b""],
    [b"", b"", b""],
    [b"a"],
    [b"ab" * 500],
    _code_corpus(),
    [b"x" * 100, b"", b"x" * 100],          # self-overlapping run content
    ["código→λ".encode() for _ in range(50)],  # unicode bytes
    [bytes([i % 256]) for i in range(1000)],   # incompressible-ish
])
def test_fsst_roundtrip(vals):
    col = strings.from_pylist(vals)
    payload, meta = fsst.encode(col)
    out = fsst.decode(payload, meta, len(vals))
    assert out.to_pylist() == vals


def test_fsst_random_binary(rng):
    vals = [rng.bytes(int(rng.integers(0, 200))) for _ in range(300)]
    col = strings.from_pylist(vals)
    payload, _ = fsst.encode(col)
    assert fsst.decode(payload, {}, len(vals)).to_pylist() == vals


def test_fsst_compresses_code():
    vals = _code_corpus(1000)
    col = strings.from_pylist(vals)
    payload, _ = fsst.encode(col)
    # source-code text should compress well below raw blob size
    assert len(payload) < 0.6 * len(col.data)
    assert fsst.decode(payload, {}, len(vals)).to_pylist() == vals


def test_fsst_no_cross_row_symbols():
    # a symbol must never bridge two rows: these rows concatenate into a
    # highly compressible stream but each row is a fragment
    vals = [b"abcd", b"efgh"] * 200
    col = strings.from_pylist(vals)
    payload, _ = fsst.encode(col)
    assert fsst.decode(payload, {}, len(vals)).to_pylist() == vals


def test_fsst_corruption():
    vals = _code_corpus(50)
    payload, _ = fsst.encode(strings.from_pylist(vals))
    with pytest.raises(CorruptBlockError):
        fsst.decode(payload[: len(payload) // 3], {}, len(vals))
    # flip the token-count region
    bad = bytearray(payload)
    bad[-1] ^= 0xFF
    with pytest.raises(CorruptBlockError):
        fsst.decode(bytes(bad), {}, len(vals))


# ---------------------------------------------------------------------------
# block container
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec,tag,make", [
    ("plain", "i64", lambda: np.arange(5000, dtype=np.int64)),
    ("plain", "f32", lambda: np.arange(5000, dtype=np.float32)),
    ("plain", "bool", lambda: (np.arange(5000) % 4 == 0)),
    ("rle", "i32", lambda: (np.arange(5000) // 50).astype(np.int32)),
    ("rle", "bool", lambda: (np.arange(5000) // 100 % 2).astype(bool)),
    ("dict", "i64", lambda: (np.arange(5000) % 100).astype(np.int64)),
    ("for", "i64", lambda: 10**10 + (np.arange(5000) % 4096)),
    ("bitpack", "i32", lambda: (np.arange(5000) % 1024).astype(np.int32)),
])
def test_block_fixed_roundtrip(codec, tag, make):
    v = make()
    buf = block.encode_block(v, tag, codec)
    out, validity, otag, ocodec, n = block.decode_block(buf)
    assert (otag, ocodec, n) == (tag, codec, len(v))
    assert validity is None
    np.testing.assert_array_equal(out, v)


@pytest.mark.parametrize("codec", ["plain", "dict", "fsst"])
@pytest.mark.parametrize("outer", ["none", "zstd", "gzip", "snappy", "lz4"])
def test_block_bytes_roundtrip_outer(codec, outer):
    vals = [str(i % 1000).encode() * 3 for i in range(4000)]
    col = strings.from_pylist(vals)
    buf = block.encode_block(col, "bytes", codec, outer=outer)
    out, validity, *_ = block.decode_block(buf)
    assert out.to_pylist() == vals


def test_block_nulls_roundtrip():
    # the reference's canonical null pattern, test_utils.rs:60
    n = 3000
    validity = null_mask(n)
    full = np.arange(n, dtype=np.int64)
    dense = full[validity]
    buf = block.encode_block(dense, "i64", "for", validity=validity)
    out, out_validity, *_ , n_rows = block.decode_block(buf)
    assert n_rows == n
    np.testing.assert_array_equal(out_validity, validity)
    np.testing.assert_array_equal(out, dense)
    restored = block.scatter_nulls_fixed(out, out_validity)
    np.testing.assert_array_equal(restored[validity], full[validity])


def test_block_corruption():
    v = np.arange(100, dtype=np.int64)
    buf = block.encode_block(v, "i64", "plain")
    with pytest.raises(CorruptBlockError):
        block.decode_block(b"XXXX" + buf[4:])
    with pytest.raises(CorruptBlockError):
        block.decode_block(buf[:20])
    bad = bytearray(buf)
    bad[4] = 99  # codec id out of range
    with pytest.raises(CorruptBlockError):
        block.decode_block(bytes(bad))


# ---------------------------------------------------------------------------
# selector (FIXTURES.md §4: known-best-codec fixtures)
# ---------------------------------------------------------------------------


def test_selector_known_best():
    n = 8000
    all_const = np.full(n, 3, np.int64)
    # rle and for(width=0) are both ~free on constants; either is correct
    assert selector.choose(all_const, "i64", outer=None).codec in ("rle", "for")

    runny = np.repeat(np.arange(80, dtype=np.int64) * 10**9, 100)
    assert selector.choose(runny, "i64", outer=None).codec == "rle"

    # 8 distinct small ints: for/bitpack tie at 3 bits/value; dict adds overhead
    eight_distinct = (np.arange(n) * 2654435761 % 8).astype(np.int64)
    assert selector.choose(eight_distinct, "i64", outer=None).est_ratio < 0.07

    # 8 distinct HUGE scattered ints: dictionary must win
    vocab = (np.arange(8) * 7 + 1) * 10**17 + np.arange(8)
    eight_wide = vocab[(np.arange(n) * 2654435761 % 8)]
    assert selector.choose(eight_wide, "i64", outer=None).codec == "dict"

    narrow_band = 10**10 + (np.arange(n) * 48271 % 4096)
    assert selector.choose(narrow_band, "i64", outer=None).codec == "for"

    text = strings.from_pylist(_code_corpus(500))
    assert selector.choose(text, "bytes", outer=None).codec == "fsst"

    rng = np.random.default_rng(7)
    noise = strings.from_pylist([rng.bytes(100) for _ in range(500)])
    choice = selector.choose(noise, "bytes", outer=None)
    assert choice.codec == "plain"  # incompressible must fall back


def test_selector_never_worse_than_plain(rng):
    v = rng.integers(-(2**60), 2**60, 4000).astype(np.int64)
    choice = selector.choose(v, "i64")
    assert choice.est_ratio <= 1.01


def test_fsst_decode_rows_random_access(rng):
    """Random-access row decode must match the full decode's selected
    rows without materializing the block (the FSST paper's 'fast random
    access' claim made real — block-level zstd cannot do this)."""
    rows = [f"def fn_{i}(x):\n    return x * {i % 37} + OFFSET_{i % 11}\n".encode()
            * (1 + i % 3) for i in range(800)]
    rows[17] = b""  # empty row in the middle
    col = strings.from_pylist(rows)
    table = fsst.build_symbol_table_best(col.data[: 1 << 15])
    payload, _ = fsst.encode(col, table=table)
    full = fsst.decode(payload, {}, len(col))
    for sel in (np.array([0]), np.array([17]), np.array([799, 0, 400]),
                rng.integers(0, 800, 50)):
        got = fsst.decode_rows(payload, len(col), sel)
        assert got.to_pylist() == [full[int(i)] for i in sel]
    assert fsst.decode_rows(payload, len(col), np.array([], dtype=np.int64)).to_pylist() == []


def test_selector_cost_penalty_is_a_knob():
    """Whether fsst+zstd beats plain+zstd is data-dependent (the
    selector's trial measures real final sizes per partition); the
    encode-cost penalty is the policy layer on top and must be
    overridable: with a crushing penalty fsst is never picked, with
    penalty 1.0 the choice is purely the measured size."""
    from boltspark import corpus

    t = corpus.generate(400)
    col = strings.from_pylist([s.encode() for s in t.column("content").to_pylist()])
    table = fsst.build_symbol_table_best(col.data[: 1 << 15])
    banned = selector.choose(col, "bytes", fsst_table=table,
                             cost_penalty={"fsst": 1e9})
    assert banned.codec != "fsst"
    free = selector.choose(col, "bytes", fsst_table=table,
                           cost_penalty={"fsst": 1.0})
    # pure size decision (any byte-capable codec may win it)
    assert free.codec in ("fsst", "plain", "dict", "prefix")
