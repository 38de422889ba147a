"""SparkSession factory with scale-appropriate defaults.

Local sandbox runs on local[N]; on a real cluster the same configs apply
(AQE handles post-shuffle coalescing and skew-join splitting at any size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — coalesce small shuffle partitions, split skewed
    # ones, convert to broadcast joins when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas_udf / toPandas — the extraction UDF mandate.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamps across environments: UTC session tz, and read
    # parquet isAdjustedToUTC=false timestamps as plain TIMESTAMP (not NTZ).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Partition sizing: 128 MiB input splits is the right default at 100 TB too.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Don't let tiny local test files produce one giant partition.
    "spark.sql.files.openCostInBytes": "4194304",
    "spark.ui.enabled": "false",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def get_spark(
    app_name: str = "gobblin-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    ``shuffle_partitions`` defaults to 2× the core count, capped at 200 —
    on a real cluster leave AQE to coalesce; the initial number just needs
    to exceed parallelism.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        ncores = os.cpu_count() or 8
        shuffle_partitions = min(200, 2 * ncores)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
