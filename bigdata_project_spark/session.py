"""SparkSession factory.

The reference configures its engine once per process (a singleton DuckDB
connection with UTC-ish semantics, relaxed ordering and a spill budget —
/root/reference/airflow/dags/bronze/utils.py:119-153,140-141). The Spark
equivalent is a single SparkSession with:

- ``spark.sql.session.timeZone=UTC`` — pins timestamp semantics so results
  are reproducible and oracle-comparable (DuckDB timestamps are UTC-naive).
- AQE on — runtime re-planning (skew-join splitting, partition coalescing,
  broadcast-join conversion) is the main lever that keeps one static plan
  valid from sf=0.001 up to 100 TB.
- ``spark.sql.shuffle.partitions`` sized to the machine, not the 200
  default. On a real cluster this should be ~2-3× total cores or left to
  AQE's coalescing with a high initial value.
- Arrow on — every toPandas()/pandas-UDF boundary is batch-columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bigdata_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # SPARK_GRAFT_SHUFFLE_PARTITIONS decouples reducer count from
        # core count for A/B floor experiments (BASELINE.md §4d): at
        # local benchmark scale most shuffles carry far less data than
        # cores, and each extra reducer task costs scheduling floor.
        env_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_parts:
            try:
                shuffle_partitions = int(env_parts)
            except ValueError:
                raise ValueError(
                    f"SPARK_GRAFT_SHUFFLE_PARTITIONS={env_parts!r} is not an integer"
                ) from None
            if shuffle_partitions < 1:
                raise ValueError(
                    f"SPARK_GRAFT_SHUFFLE_PARTITIONS={env_parts!r} must be >= 1"
                )
        else:
            shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Stage progress bars write \r-lines to stdout; the bench driver
        # parses a JSON line out of stdout's tail, so keep it clean.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def enable_runtime_bloom_filters(spark: SparkSession) -> None:
    """Semi-join pushdown for big shuffle joins: when one join side
    carries a selective filter, Spark builds a bloom filter over its join
    keys and pushes it into the other side's scan — rows that can't match
    never reach the shuffle. This is the single biggest lever for
    "big fact ⋈ filtered table" joins too large to broadcast at 100 TB.

    On by default upstream, but gated behind size thresholds tuned for
    clusters; the scan-size gate is dropped here so the rewrite also
    fires at test scale (the creation-side cap still bounds filter build
    cost). Verified by plan shape in tests/test_plans.py."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
