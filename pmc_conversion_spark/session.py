"""SparkSession factory.

Local mode is a single JVM with N executor threads; on a real cluster the
same conf holds except memory/parallelism are sized per executor. AQE is
on so runtime statistics re-plan joins (broadcast conversion, skew
splitting, partition coalescing) — our 100 TB posture relies on it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pmc-conversion-spark",
              cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 per the
    driver contract). Shuffle partitions default to 2×cores locally; on a
    cluster AQE coalesces them down from a higher initial number anyway.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(str(cpus)), 32)
        except ValueError:  # cpus == "*"
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate synthesizes size(child)>0 filters
        # whose pushdown INLINES the generator child below exchanges —
        # for expensive children (tokenize+shingle chains) the filter
        # re-runs the whole expression, single-partition, twice
        # (measured 4x on the shingle family at sf0.1). Our explodes
        # never cross a shuffle before the Generate, so the inferred
        # prune buys nothing here.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # long-lived sessions running hundreds of distinct queries
        # generate thousands of codegen classes; at the JVM default
        # (240 MB) the code cache can fill mid-run, silently disabling
        # the JIT so later queries run interpreted FOR THE REST OF THE
        # PROCESS (observed as a whole-process 3x slow mode on the
        # shingle ops). 1 GB keeps compilation alive for the full
        # registry; local mode, so driver==executor.
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # shuffle/spill files on tmpfs: this host's disk FS shows long
        # syscall stalls under many small shuffle files; RAM-backed
        # local dirs sidestep it (plenty of headroom at test SFs)
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS",
                                                  "/dev/shm/spark-local"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
