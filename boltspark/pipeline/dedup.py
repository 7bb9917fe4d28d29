"""Deduplication operators for document tables.

Exact dedup is a hash-groupBy (pure built-ins).  Near-dup detection is
MinHash + LSH banding: shingle -> minhash signature (vectorized numpy
inside a pandas UDF, same concatenated-buffer technique as the FSST
kernel) -> band buckets -> self-join on bucket -> exact Jaccard / simhash
verification of candidates.  All shuffles are on banded bucket keys, so
the candidate join never goes quadratic at scale (only rows sharing a
band bucket meet).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, cols: list[str] | None = None,
                key: str = "doc_id") -> DataFrame:
    """Keep one row (min key) per exact duplicate group (hash-groupBy)."""
    cols = cols or [c for c in df.columns if c != key]
    h = F.sha2(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                                     for c in cols]), 256)
    tagged = df.withColumn("__h", h)
    keep = tagged.groupBy("__h").agg(F.min(key).alias(key)).select(key)
    return df.join(keep, key, "left_semi")


def duplicate_groups(df: DataFrame, text_col: str = "text",
                     key: str = "doc_id") -> DataFrame:
    """(hash, n_dups, min_key) per exact-duplicate text group with >1 member."""
    h = F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("text_hash")
    return (
        df.select(h, F.col(key))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(key).alias("min_key"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_batch(texts: pd.Series, n_hashes: int, shingle: int,
                   seed: int) -> pd.Series:
    """Vectorized minhash signatures for one Arrow batch.

    Each row is laid out in a shared buffer with ``shingle-1`` zero pad
    bytes after it, so a rolling shingle hash NEVER reads a neighboring
    row's bytes — the signature of a text is a pure function of that
    text, independent of batch composition.  Pad/empty positions are
    neutralized to u64::MAX before the per-row ``np.minimum.reduceat``
    (rows shorter than ``shingle`` therefore share one sentinel
    signature; the n-gram Jaccard verification stage discards any false
    pairs that creates).
    """
    nrows = len(texts)
    data = texts.fillna("").astype(str).str.encode("utf-8")
    lens = data.str.len().to_numpy(dtype=np.int64)
    blob = b"".join(data.tolist())
    src = np.frombuffer(blob, dtype=np.uint8)
    pad = shingle - 1
    total = int(lens.sum()) + nrows * pad
    buf = np.zeros(max(total, 1), dtype=np.uint8)
    if len(src):
        # scatter: row i's bytes shift right by i*pad (vectorized)
        row_of_byte = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        buf[np.arange(len(src), dtype=np.int64) + row_of_byte * pad] = src
    n = len(buf)

    # rolling `shingle`-byte hash at every position (polynomial, u64 wrap)
    h = np.zeros(n, dtype=np.uint64)
    mult = np.uint64(1099511628211)
    padded = np.zeros(n + shingle, dtype=np.uint8)
    padded[:n] = buf
    for k in range(shingle):
        h = h * mult + padded[k : k + n].astype(np.uint64)

    # row i occupies [starts[i], starts[i] + lens[i] + pad); its valid
    # shingle positions are [starts[i], starts[i] + lens[i]) — shingles
    # starting there read only the row's own bytes + its zero pad
    starts = np.zeros(nrows, dtype=np.int64)
    if nrows:
        np.cumsum(lens[:-1] + pad, out=starts[1:])
    mark = np.zeros(n + 1, dtype=np.int64)
    np.add.at(mark, starts, 1)
    np.add.at(mark, starts + lens, -1)
    invalid = np.cumsum(mark[:-1]) == 0
    starts = np.minimum(starts, max(n - 1, 0))  # reduceat bound safety

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, n_hashes, dtype=np.uint64)
    sig = np.empty((nrows, n_hashes), dtype=np.int64)
    for k in range(n_hashes):
        y = h * a[k] + b[k]  # u64 wraparound is a fine permutation proxy
        y[invalid] = np.uint64(0xFFFFFFFFFFFFFFFF)
        mins = np.minimum.reduceat(y, starts) if nrows else y[:0]
        sig[:, k] = (mins >> np.uint64(1)).astype(np.int64)  # keep positive
    return pd.Series(list(sig))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       n_hashes: int = 64, shingle: int = 5,
                       seed: int = 42) -> DataFrame:
    sig_udf = F.pandas_udf(
        lambda s: _minhash_batch(s, n_hashes, shingle, seed),
        T.ArrayType(T.LongType()),
    )
    return df.withColumn("minhash", sig_udf(F.col(text_col)))


def lsh_candidate_pairs(df: DataFrame, key: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 64,
                        bands: int = 16, shingle: int = 5,
                        seed: int = 42, max_bucket: int = 64) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    signature -> `bands` band-hash keys -> explode -> groupBy band key
    (the shuffle is on bucket keys: scalable) -> pairs within buckets.
    Returns (key_a, key_b, n_shared_bands), key_a < key_b.

    ``max_bucket`` bounds the membership of any one band bucket (kept
    members are the ``max_bucket`` smallest keys, deterministic): k
    identical documents share EVERY band bucket and would otherwise
    produce k^2/2 candidate pairs — the common web-scale case.  Run
    ``exact_dedup`` first so identical texts collapse to one
    representative; the cap is the backstop for near-identical floods.
    Pair count per bucket is then <= max_bucket^2/2 regardless of skew.
    """
    from pyspark.sql import Window

    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, n_hashes, shingle, seed)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("minhash")[b * rows_per_band + r]
                        for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(F.col(key), *band_cols)
    melted = banded.select(
        key,
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias("bucket"),
    )
    if max_bucket:
        # the row_number shuffle is on the same bucket key as the join
        # below — no extra exchange shape, just a bounded sort per bucket
        w = Window.partitionBy("bucket").orderBy(key)
        melted = (melted.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= max_bucket).drop("__rn"))
    left = melted.alias("a")
    right = melted.alias("b")
    pairs = (
        left.join(right, (F.col("a.bucket") == F.col("b.bucket"))
                  & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .groupBy(F.col(f"a.{key}").alias("key_a"), F.col(f"b.{key}").alias("key_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def ngram_jaccard(df: DataFrame, pairs: DataFrame, key: str = "doc_id",
                  text_col: str = "text", n: int = 3) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs
    (verification stage after LSH) — pure built-ins."""
    toks = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    ))
    gdf = df.select(F.col(key), grams.alias("grams"))
    a = gdf.alias("ga")
    b = gdf.alias("gb")
    return (
        pairs.join(a, pairs["key_a"] == F.col(f"ga.{key}"))
        .join(b, pairs["key_b"] == F.col(f"gb.{key}"))
        .select(
            "key_a", "key_b", "n_shared_bands",
            (F.size(F.array_intersect("ga.grams", "gb.grams"))
             / F.greatest(F.size(F.array_union("ga.grams", "gb.grams")), F.lit(1))
             ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Python oracle for the JVM simhash (tests pin parity against it):
    crc32-hash each whitespace token (two salts -> 64 bits), bit-vote,
    sign.  The production path is ``simhash`` below — pure built-ins."""
    import zlib

    out = np.zeros(len(texts), dtype=np.int64)
    token_lists = texts.fillna("").astype(str).str.lower().str.split()
    flat = []
    rows = []
    for i, tl in enumerate(token_lists):
        flat.extend(tl)
        rows.extend([i] * len(tl))
    if flat:
        h_lo = np.fromiter((zlib.crc32(t.encode()) for t in flat), np.uint64, len(flat))
        h_hi = np.fromiter((zlib.crc32((t + "\x01").encode()) for t in flat), np.uint64, len(flat))
        h = (h_hi << np.uint64(32)) | h_lo
        rows = np.asarray(rows, dtype=np.int64)
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        for bit in range(64):
            b = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
            np.add.at(votes[:, bit], rows, b)
        bits = (votes > 0).astype(np.uint64)
        val = np.zeros(len(texts), dtype=np.uint64)
        for bit in range(64):
            val |= bits[:, bit] << np.uint64(bit)
        out = val.view(np.int64)
    return pd.Series(out)


# bit masks 1<<b as signed int64 (1<<63 wraps to the sign bit)
_BIT_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def simhash(df: DataFrame, text_col: str = "text",
            out_col: str = "simhash") -> DataFrame:
    """64-bit simhash per document with pure JVM built-ins (no Python in
    the hot path — the r1 per-token-Python kernel is now only a test
    oracle).  Identical output to ``_simhash_batch``: token hash =
    crc32(token+'\\x01') << 32 | crc32(token), per-bit votes over the
    token list via aggregate/zip_with, sign -> bit.

    Higher-order array functions don't enter whole-stage codegen but
    evaluate JVM-side — no BatchEvalPython/ArrowEvalPython node exists
    in this plan (gated in tests/test_plans.py).
    """
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    hashes = F.transform(
        toks,
        lambda t: F.shiftleft(
            F.crc32(F.encode(F.concat(t, F.lit("\x01")), "utf-8")), 32
        ).bitwiseOR(F.crc32(F.encode(t, "utf-8"))),
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.withColumn(out_col, sim)


def simhash_near_pairs(df: DataFrame, key: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 16-bit
    chunks (pigeonhole: distance <= 3 => some 16-bit quarter matches)."""
    sh = simhash(df, text_col)
    chunks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)))
        .alias(f"c{i}")
        for i in range(4)
    ]
    base = sh.select(F.col(key), F.col("simhash"), *chunks)
    melted = base.select(
        key, "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("q"), F.col(f"c{i}").alias("v")) for i in range(4)
        ])).alias("blk"),
    ).select(key, "simhash", F.col("blk.q").alias("q"), F.col("blk.v").alias("v"))
    a, b = melted.alias("a"), melted.alias("b")
    pairs = (
        a.join(b, (F.col("a.q") == F.col("b.q")) & (F.col("a.v") == F.col("b.v"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(
            F.col(f"a.{key}").alias("key_a"), F.col(f"b.{key}").alias("key_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        # filter BEFORE distinct: the dedup shuffle then carries only the
        # near pairs, not the non-near majority of chunk collisions
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
