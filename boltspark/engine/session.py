"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app: str = "boltspark", cpus: int | None = None,
                shuffle_partitions: int | None = None,
                driver_memory: str = "48g", ship: bool = True) -> SparkSession:
    """local[N] session tuned for Arrow-UDF encode/decode jobs.

    On a real cluster the same configs ship via spark-submit --conf and
    the package via --py-files; ``ship=True`` reproduces the --py-files
    behavior programmatically (addPyFile of a package zip) so executors
    can import boltspark regardless of their working directory.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        # 4x cores as the INITIAL shuffle partition count, AQE coalesces
        # small ones back down (guide §2.2/§9): at small scale the plans
        # are unchanged (measured identical at sf1), while large
        # aggregations stop under-partitioning — the 42 GB verify join
        # measured 21.8 s vs 26.1 s at exactly-cores partitions
        # (interleaved same-phase A/B).  Explicit shuffle_partitions
        # still overrides.
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or 4 * cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch size: the streaming window of the engine
        # (StreamingByteBuffer analog) — rows per batch into mapInArrow
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", driver_memory)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the boltspark Python data source translates pushed filters into
        # engine predicates (sources/datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # file-packing cost: the default 4 MB open cost packed a
        # 61-file blocks dataset (~10 MB/file of pre-compressed block
        # payloads that expand ~7x on decode) into ~6 scan tasks,
        # leaving 26 of 32 cores idle for every decode.  Charging each
        # file 64 MB keeps one-or-two blocks FILES per task (~70-140 MB
        # of decoded working set — guide §6's guidance measured in
        # DECODED bytes) without touching how LARGE single files split
        # (maxPartitionBytes stays at its 128 MB default, so plain
        # parquet scans and the JVM write control are unaffected).
        # Parameterised for real clusters via env.
        .config("spark.sql.files.openCostInBytes",
                os.environ.get("BOLTSPARK_OPEN_COST_BYTES", str(64 << 20)))
    )
    if os.path.isdir("/dev/shm"):
        # this host's disk contends badly under parallel shuffle I/O;
        # tmpfs spill measurably improves scaling (see BENCH/BASELINE.md)
        b = b.config("spark.local.dir", "/dev/shm/boltspark-spark-local")
    spark = b.getOrCreate()
    if ship:
        from .shipping import ship_package

        ship_package(spark)
    return spark
