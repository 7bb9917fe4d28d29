"""Physical-plan quality gates (.explain-driven): predicate/column
pruning must reach the parquet scans, and built-in pipelines must stay
inside whole-stage codegen (no row-at-a-time Python in JVM paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from boltspark import corpus
from boltspark.engine import decode_table, encode_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("plans")
    path = str(base / "c.parquet")
    corpus.write_parquet(path, 1500)
    df = spark.read.parquet(path)
    res = encode_table(df, str(base / "blocks"), str(base / "manifest"),
                       target_partition_bytes=1 << 20)
    return res


def test_blocks_scan_prunes_columns_and_pushes_filters(spark, encoded):
    decoded = decode_table(spark, encoded.out_path, encoded.manifest_path,
                           columns=["lang"])
    plan = _plan(decoded)
    # the projection filter on `column` is pushed into the parquet scan of
    # the blocks dataset (local_file_reader columns_to_read analog)
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("column" in ln for ln in pushed), pushed


def test_manifest_aggregation_never_reads_payloads(spark, encoded):
    blocks = spark.read.parquet(encoded.out_path).select(
        "part_id", "column", "n_rows").groupBy("column").agg(F.sum("n_rows"))
    plan = _plan(blocks)
    schemas = [ln.split("ReadSchema:", 1)[1] for ln in plan.splitlines()
               if "ReadSchema:" in ln]
    assert schemas and all("block:binary" not in s for s in schemas), schemas


def test_similarity_topk_stays_jvm_side(spark):
    from boltspark.pipeline import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    topk = similarity.brute_force_topk(emb, [0.1] * dim, k=5)
    plan = _plan(topk)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # top-k compiles to TakeOrderedAndProject, not a global sort
    assert "TakeOrdered" in plan, plan


def test_textstats_stay_jvm_side(spark):
    from boltspark.pipeline import textstats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = textstats.language_id(textstats.quality_features(docs))
    plan = _plan(out.select("doc_id", "quality_score", "lang_pred"))
    # higher-order array functions aren't codegen'd but stay JVM-side:
    # the gate is "no Python eval nodes in the hot path"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_dedup_is_hash_aggregate(spark):
    from boltspark.pipeline import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.exact_dedup(docs, cols=["text"]))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_lsh_candidates_shuffle_on_bucket_not_cross_join(spark):
    from boltspark.pipeline import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pairs = dedup.lsh_candidate_pairs(docs, n_hashes=16, bands=4)
    plan = _plan(pairs)
    # candidates meet via an equi-join on the band bucket — a cartesian
    # product would be quadratic at scale
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_resume_antijoin_prunes_partitions(spark, encoded):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    # planning only: resume with an existing manifest must not error and
    # must filter on the partition id column
    res = encode_table(
        df.withColumnRenamed("doc_id", "k").withColumn("repo", F.lit("r"))
          .withColumn("path", F.col("k").cast("string"))
          .withColumn("commit", F.lit("c")),
        encoded.out_path + "_r", encoded.manifest_path + "_r",
        key_cols=("repo", "path", "commit"), target_partition_bytes=1 << 20,
    )
    assert res.n_partitions >= 1
