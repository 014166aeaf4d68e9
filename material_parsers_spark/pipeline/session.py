"""SparkSession factory with the scale-oriented defaults this engine needs.

Single place that turns on AQE (runtime re-plan + skew-join splitting),
Arrow transfer for pandas UDFs, and bounds Arrow batch size so long
transcript turns can't blow executor memory (SURVEY.md §4.2)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "material-parsers-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 8192 rows/batch: one Arrow batch per ~4k-row task partition
        # instead of several, fewer JVM<->Python round trips (measured
        # ~5% on the flagship); turns are short rows, so the batch stays
        # a few MB — bound it lower for corpora with very long texts
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
