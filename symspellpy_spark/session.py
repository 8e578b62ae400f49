"""SparkSession factory tuned for this engine.

Local-mode testing runs on local[N]; the same settings are what we'd
submit to a real cluster (AQE, Arrow, skew-join handling). Keep shuffle
partitions ~ cores locally; on a 1000-executor cluster this is set to
~2-3x total cores by the submitter.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "symspellpy_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession.

    ``cores``: int N -> local[N]; "*" -> local[*]; None -> env
    SPARK_GRAFT_CPUS or local[*].
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n_cores = os.cpu_count() or 8 if cores in ("*",) else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n_cores)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64MB advisory partitions under-parallelize mid-size exchanges
        # (e.g. signature arrays) on wide-core workers; 16MB keeps
        # AQE-coalesced stages at >= cores tasks without tiny-task spam
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # prefer shuffled-hash over sort-merge when the per-partition
        # build side fits (guide §3.1): skips both sort passes on the
        # verify/semi-join paths. Deliberate sort-merge sites
        # (_bucket_pairs' self-join, whose identical sorted children
        # make SMJ exchange-and-sort-free) carry explicit merge hints
        # and are unaffected. The 64m AQE threshold is per post-shuffle
        # partition — bounded by the advisory size above at any scale,
        # so the build-side-OOM risk SMJ-by-default guards against does
        # not apply
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        # local-mode shuffle/spill funnels through ONE virtual disk; a
        # real N-executor cluster has N sets of local disks. tmpfs gives
        # the same per-core shuffle bandwidth a cluster's striped local
        # SSDs would (falls back to /tmp when /dev/shm is absent)
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
