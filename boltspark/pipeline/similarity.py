"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k with pure built-ins (zip_with/aggregate stay
in whole-stage codegen) as the correctness baseline, and a
random-hyperplane LSH-bucketed variant as the scale path (candidates
meet only inside a bucket — the shuffle is on bucket keys, never a
cross join).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    # accumulate in double: float32 products drift vs any oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_scores(df: DataFrame, query: list[float],
                  vec_col: str = "embedding") -> DataFrame:
    """cosine(vec, query) for every row — JVM-side, no UDF."""
    q = F.array(*[F.lit(float(x)) for x in query])
    denom = _norm(F.col(vec_col)) * F.lit(float(np.linalg.norm(query)))
    cos = F.when(denom > 0, _dot(F.col(vec_col), q) / denom).otherwise(F.lit(0.0))
    return df.withColumn("cosine", cos.cast("double"))


def brute_force_topk(df: DataFrame, query: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     key: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine — the oracle path.  orderBy+limit lets Spark
    run a per-partition TakeOrdered then a driver-side merge (no full sort)."""
    return (
        cosine_scores(df, query, vec_col)
        .select(key, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(key))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec_col: str, planes: np.ndarray):
    """Random-hyperplane signature as a bucket id (built-ins only):
    bit_i = sign(dot(vec, plane_i))."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ann_topk(df: DataFrame, query: list[float], k: int = 10,
             vec_col: str = "embedding", key: str = "vec_id",
             n_planes: int = 8, n_probes: int = 3, seed: int = 42) -> DataFrame:
    """LSH-bucketed approximate top-k: score only rows whose hyperplane
    signature is within `n_probes` bit flips of the query's (multi-probe).

    At 100 TB the bucket column is precomputed+partitioned-by once and
    reused across queries; here it is computed inline.
    """
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    qv = np.asarray(query, dtype=np.float64)
    for i, p in enumerate(planes):
        if float(qv @ p) > 0:
            qsig |= 1 << i
    probe_sigs = {qsig}
    if n_probes >= 1:
        for i in range(n_planes):
            probe_sigs.add(qsig ^ (1 << i))
    if n_probes >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe_sigs.add(qsig ^ (1 << i) ^ (1 << j))
    bucketed = df.withColumn("__sig", lsh_bucket_col(vec_col, planes))
    cands = bucketed.filter(F.col("__sig").isin(list(probe_sigs)))
    return (
        cosine_scores(cands, query, vec_col)
        .select(key, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(key))
        .limit(k)
    )


def banded_signatures(df: DataFrame, vec_col: str = "embedding",
                      n_planes: int = 12, bands: int = 4,
                      seed: int = 42, dim: int | None = None) -> DataFrame:
    """Precompute `bands` independent hyperplane signatures (one column
    per band) — the 100 TB ANN path: run ONCE over the corpus, write with
    ``.write.bucketBy(N, "__band_0")`` (or partitionBy at coarse card),
    then every query filters buckets instead of scanning embeddings.

    With B bands of P planes each, a query scans ~B/2^P of the corpus
    (4 bands x 12 planes = 0.1%) with recall 1-(1-s^P)^B for signature
    agreement rate s — versus the single-signature multi-probe variant
    that scanned ~14% for the same recall.

    Pass ``dim`` when known (callers usually know it) to skip the
    fallback probe job that reads one row for the vector width."""
    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    out = df
    for b in range(bands):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * b)
        out = out.withColumn(f"__band_{b}", lsh_bucket_col(vec_col, planes))
    return out


def ann_topk_banded(bucketed: DataFrame, query: list[float], k: int = 10,
                    vec_col: str = "embedding", key: str = "vec_id",
                    n_planes: int = 12, bands: int = 4,
                    seed: int = 42) -> DataFrame:
    """Approximate top-k over a `banded_signatures` table: candidates are
    rows agreeing with the query's signature in ANY band (per-band
    equality filters push to the scan / bucket pruning), scored exactly,
    then TakeOrdered."""
    qv = np.asarray(query, dtype=np.float64)
    cond = None
    for b in range(bands):
        planes = _hyperplanes(len(query), n_planes, seed + 1000 * b)
        qsig = 0
        for i, p in enumerate(planes):
            if float(qv @ p) > 0:
                qsig |= 1 << i
        c = F.col(f"__band_{b}") == qsig
        cond = c if cond is None else (cond | c)
    cands = bucketed.filter(cond)
    return (
        cosine_scores(cands, query, vec_col)
        .select(key, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(key))
        .limit(k)
    )


def pairwise_near_dup(df: DataFrame, threshold: float = 0.95,
                      vec_col: str = "embedding", key: str = "vec_id",
                      n_planes: int = 8, seed: int = 42,
                      dim: int | None = None,
                      max_bucket: int = 256) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked: only vectors
    sharing a hyperplane-signature bucket are compared exactly.  Pass
    ``dim`` when known to skip the one-row width probe job.

    ``max_bucket`` bounds any one signature bucket's membership (kept
    members are the ``max_bucket`` smallest keys, deterministic — the
    same backstop as ``dedup.lsh_candidate_pairs``): a low-entropy
    corpus whose vectors collapse into few signatures would otherwise
    go quadratic in one bucket.  Pair count per bucket is then
    <= max_bucket^2/2 regardless of skew; the row_number shuffle is on
    the same ``__sig`` key as the join, so no extra exchange shape.
    Pass ``max_bucket=0`` to disable (exact pairs on small corpora)."""
    from pyspark.sql import Window

    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    planes = _hyperplanes(dim, n_planes, seed)
    b = df.withColumn("__sig", lsh_bucket_col(vec_col, planes)).select(
        key, vec_col, "__sig")
    if max_bucket:
        w = Window.partitionBy("__sig").orderBy(key)
        b = (b.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= max_bucket).drop("__rn"))
    a2, b2 = b.alias("a"), b.alias("b")
    pairs = a2.join(
        b2, (F.col("a.__sig") == F.col("b.__sig"))
        & (F.col(f"a.{key}") < F.col(f"b.{key}"))
    )
    num = _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    den = _norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))
    return (
        pairs.select(
            F.col(f"a.{key}").alias("key_a"), F.col(f"b.{key}").alias("key_b"),
            F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
