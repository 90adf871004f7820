"""SparkSession factory tuned for the rollup engine.

Local-mode defaults mirror what a cluster deployment would set via
spark-submit --conf; everything here is also correct on a real
multi-executor cluster (AQE, Arrow, skew-join handling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fforma_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32). On a real
    cluster, pass ``None`` and let spark-submit supply the master.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism; AQE coalesces small partitions at runtime
        n = master[6:-1] if master.startswith("local[") else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Single-JVM local mode: many task threads contend on the
        # process mmap_lock (measured: threads stuck in
        # lock_mm_and_find_vma/__vm_munmap during shuffles). Fixed,
        # pre-touched heap + ParallelGC (never uncommits regions) +
        # no shuffle-block mmap removes the mmap/munmap churn.
        # Irrelevant-but-harmless on a real cluster (executor JVMs are
        # sized with Xms=Xmx there anyway).
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .config("spark.storage.memoryMapThreshold", "2g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        # numpy kernels inside pandas UDFs must not oversubscribe BLAS
        # (reference pins BLAS to 1 thread: fforma/utils/utils.py:28-32)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_python_workers(spark: SparkSession) -> None:
    """Launch the pyspark worker daemon while the JVM heap is still
    small.

    In local mode the daemon is forked from the (single) JVM at the
    FIRST Python stage; once the driver heap has grown (e.g. after a
    cached cascade) that fork costs tens of seconds of page-table
    copying. Spawning the daemon up front makes every later pandas-UDF
    stage fork from the small resident daemon instead. No-op cost
    ~3-6s once per process; saves ~10x that on the first kernel stage.
    """
    import pandas as pd  # noqa: F401

    n = spark.sparkContext.defaultParallelism

    def _noop(it):
        for pdf in it:
            yield pdf

    spark.range(0, n, 1, n).mapInPandas(_noop, "id long").count()
