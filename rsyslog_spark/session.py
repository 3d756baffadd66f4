"""SparkSession factory with scale-oriented defaults.

Defaults mirror what we'd ship for a 1000-executor cluster reading
100 TB: AQE on (runtime coalescing + skew-join splitting), Arrow for
every Python<->JVM hop, and shuffle-partition counts that AQE can
shrink. Local test sessions just downsize memory/parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conservative-at-scale knobs. On a real cluster these ride on
# spark-submit conf; locally they make local[N] behave like a
# miniature cluster (AQE coalescing, skew splitting, Arrow batches).
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size for pandas UDFs: big enough to amortize, small
    # enough to bound executor memory per batch at wide rows.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # 128 MiB input splits — parquet row-group aligned.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast anything under 64 MiB; all rsyslog lookup tables are
    # tiny dimensions, so joins against them must never shuffle.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # RFC 5424 allows repeated SD param names and rsyslog keeps the
    # last occurrence; default EXCEPTION policy would abort the whole
    # job on the first repeated key in map_from_arrays/_entries
    # (mmpstrucdata, mmnormalize).
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
}


def get_spark(
    app_name: str = "rsyslog_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for sandbox runs; on a cluster, leave unset and let spark-submit
    provide it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core locally; AQE coalesces further
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in SCALE_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions", str(shuffle_partitions)
    )
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
