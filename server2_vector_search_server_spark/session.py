"""SparkSession factory.

Local testing runs a single JVM with N threads (``local[N]``); production is a
multi-executor cluster. Everything scale-relevant is expressed through the
DataFrame API (partitioning, broadcast hints, AQE) so the same plans hold on a
1000-executor cluster — only these session configs change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "server2_vector_search_server_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults are sized for local mode: shuffle partitions ≈ cores (the default
    200 over-parallelizes small local data), AQE on so runtime statistics can
    coalesce post-shuffle partitions and rewrite skewed joins — both of which
    are exactly the behaviors we rely on at 100 TB scale.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet reader
    rejects; we read nanos as long (legacy conf) and convert to microsecond
    timestamps JVM-side — a narrow, distributed transformation (no driver
    materialization), so it holds at any scale. The DuckDB oracle mirrors the
    truncation with ``CAST(ts AS TIMESTAMP)``.
    """
    from pyspark.sql import functions as F

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.read.parquet(path)
            # integer DIV, not float /: nanos ~1.7e18 exceed double's 53-bit
            # mantissa, so float division drifts by up to ±1 microsecond
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load driver-generated parquet tables and register temp views.

    Returns a dict name -> DataFrame. Registering views lets operators be
    written in either DataFrame or SQL form against the same Catalyst catalog.
    """
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
