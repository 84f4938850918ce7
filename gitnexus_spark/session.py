"""SparkSession factory tuned for the KG-construction workload.

Scale posture: these configs are chosen for a multi-executor cluster
reading ~100 TB of WARC-derived pages; local[N] is only the test harness.

- AQE on (runtime coalesce + skew-join split) — head entities
  (Wikipedia-scale hubs) produce skewed join keys; the reference has no
  skew handling at all (candidate lists simply grow,
  call-processor.ts:242-258), we handle it with AQE + explicit salting
  (operators/skew.py).
- Arrow enabled with a bounded batch size so the pandas-UDF extraction
  stages (pass 1/2) keep a flat memory profile per task.
- shuffle.partitions kept moderate locally; on a real cluster this is
  set ~2-3x total cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gitnexus-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
