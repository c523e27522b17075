"""SparkSession factory tuned for this engine.

Local mode is a single JVM; the same settings (AQE, sensible shuffle
partition counts, Arrow transfers) are what we would ship to a real
multi-executor cluster via spark-submit --py-files.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xpshacl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Env overrides: SPARK_GRAFT_CPUS (core count for local[N]),
    SPARK_GRAFT_MASTER, SPARK_GRAFT_DRIVER_MEM.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism in local mode instead of the 200 default;
        # on a real cluster this would be sized to input bytes / target
        # partition size and AQE coalescing handles the rest.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Scan-split size (guide §6): the local bench tables are SINGLE
        # parquet files (lineitem sf1.0: one 126 MB file, six ~21 MB
        # row groups), so Spark's 128 MB default yields a ONE-TASK scan
        # and every map-side aggregation over lineitem runs
        # single-threaded. 16 MB splits let each row group decode in
        # its own task (measured: the fused lineitem agg queries drop
        # ~2-4x; see OPTIMIZATION_r06.md). Scale-dependent and
        # parameterised: a production 100 TB table is thousands of
        # row-group-sized files where larger splits (128 MB - 1 GB)
        # cut scheduling overhead — set SPARK_GRAFT_MAX_PARTITION_BYTES
        # there; AQE still coalesces small shuffle partitions either
        # way.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        # keep catalog-table data out of the launch directory (bucketed
        # tables pass explicit external paths; this covers any default),
        # per-process so concurrent sessions' managed tables never
        # clobber each other's files
        .config("spark.sql.warehouse.dir", f"/tmp/xpshacl_warehouse_{os.getpid()}")
    )
    # Executor-fidelity knob: SPARK_GRAFT_PROC_CPUS=<k> declares the
    # JVM's core budget (-XX:ActiveProcessorCount), sizing GC/JIT/common
    # pools to k instead of the machine's visible CPU count. A real
    # cluster executor JVM is launched knowing the cores it owns; a
    # local[1] "executor analog" that silently sizes ~23 GC threads to
    # 32 visible CPUs is NOT one executor — with several such JVMs
    # concurrent, their service-thread storms collide (measured in
    # BENCH.md's process-protocol runs). Opt-in via env so normal
    # local[N] sessions are unaffected.
    proc_cpus = os.environ.get("SPARK_GRAFT_PROC_CPUS")
    if proc_cpus:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-XX:ActiveProcessorCount={int(proc_cpus)}",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
