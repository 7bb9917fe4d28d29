"""Two-parallelism scaling bench -> BENCH/BASELINE.md.

Sandbox substitution for the north rule's N->4N executor criterion
(see BASELINE.md): the same spark-submit --py-files job runs on the
same input at local[8] and local[32]; we report throughput at both and
scaling efficiency = (thr_32 / thr_8) / 4, target >= 0.8.

    python bench/scaling.py [--rows 200000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, rows: int, corpus: str, repeats: int,
              n_parts: int) -> dict:
    """spark-submit --py-files at one parallelism level; best of N runs."""
    from boltspark.engine.shipping import build_package_zip

    zip_path = build_package_zip()
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("python")), "spark-submit")
    best = None
    for _ in range(repeats):
        out_json = tempfile.mktemp(suffix=".json")
        cmd = [
            spark_submit,
            "--master", f"local[{cpus}]",
            "--py-files", zip_path,
            "--conf", f"spark.sql.shuffle.partitions={cpus}",
            "--conf", f"spark.default.parallelism={cpus}",
            "--conf", "spark.driver.memory=48g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=16384",
            os.path.join(REPO, "bench", "job.py"),
            "--rows", str(rows), "--corpus", corpus, "--json-out", out_json,
            "--n-parts", str(n_parts),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        with open(out_json) as f:
            r = json.load(f)
        assert r["sha_mismatches"] == 0, "round-trip broke during bench!"
        if best is None or r["encode_sec"] + r["decode_sec"] < best["encode_sec"] + best["decode_sec"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)  # ~1 GB content
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--n-parts", type=int, default=None)
    args = ap.parse_args()
    lo_cpus, hi_cpus = (int(x) for x in args.levels.split(","))
    # partitioning is fixed by the data, not the cluster size: both
    # levels run the identical job, only the executor count differs
    n_parts = args.n_parts or max(2 * hi_cpus, args.rows * 2600 // (64 << 20))

    from boltspark import corpus as corpusmod

    corpus_path = f"/tmp/boltspark_bench_corpus_{args.rows}.parquet"
    if not os.path.exists(corpus_path):
        corpusmod.write_parquet(corpus_path, args.rows)
    raw_mb = os.path.getsize(corpus_path) / 1e6

    lo = run_level(lo_cpus, args.rows, corpus_path, args.repeats, n_parts)
    hi = run_level(hi_cpus, args.rows, corpus_path, args.repeats, n_parts)

    factor = hi_cpus / lo_cpus
    eff_enc = (hi["encode_gbps"] / lo["encode_gbps"]) / factor
    eff_dec = (hi["decode_gbps"] / lo["decode_gbps"]) / factor

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling & throughput

## Method

Same job, same input, two parallelism levels (sandbox substitution for
the N->4N executor criterion — no real cluster here; see BASELINE.md).
Launch: `spark-submit --master local[N] --py-files boltspark.zip
bench/job.py` — the north rule's launch mode.  Input: deterministic
synthetic corpus (seed=42), {args.rows:,} rows,
{lo['raw_bytes']/1e9:.2f} GB logical column bytes
({raw_mb:.0f} MB as snappy parquet on disk).  Encode is CPU-bound
(codec kernels + zstd); best of {args.repeats} runs per level (the
sandbox's per-core speed is noisy).

## Results

| level | encode s | decode s | encode GB/s | decode GB/s | compression |
|---|---|---|---|---|---|
| local[{lo_cpus}] (N) | {lo['encode_sec']} | {lo['decode_sec']} | {lo['encode_gbps']} | {lo['decode_gbps']} | {lo['enc_bytes']/lo['raw_bytes']:.3f} |
| local[{hi_cpus}] (4N) | {hi['encode_sec']} | {hi['decode_sec']} | {hi['encode_gbps']} | {hi['decode_gbps']} | {hi['enc_bytes']/hi['raw_bytes']:.3f} |

## Scaling efficiency (target >= 0.8)

- encode: (thr_{hi_cpus} / thr_{lo_cpus}) / {factor:.0f} = **{eff_enc:.2f}**
- decode: (thr_{hi_cpus} / thr_{lo_cpus}) / {factor:.0f} = **{eff_dec:.2f}**

## Correctness rider

sha256 round-trip mismatches during both runs: {lo['sha_mismatches']} + {hi['sha_mismatches']}
(must be 0). Partitions: {hi['n_partitions']} (deterministic
pmod(xxhash64(repo,path,commit), P) salting).

Caveat: local[{lo_cpus}] and local[{hi_cpus}] share one memory bus and one
OS image; on a real 4x cluster, shuffle crosses the network but codec
CPU scales per-node. Encode/decode here are CPU-bound kernels inside
mapInArrow tasks with no cross-task communication after the initial
repartition, which is the property that transfers to multi-node.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"lo": lo, "hi": hi,
                      "eff_encode": round(eff_enc, 3),
                      "eff_decode": round(eff_dec, 3)}))


if __name__ == "__main__":
    main()
