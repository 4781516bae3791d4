"""SparkSession factory with scale-conscious defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads) but
every config below is chosen to also be the right default on a large cluster:

- AQE on: runtime partition coalescing, skew-join splitting, and dynamic
  join-strategy switching replace most hand-tuning at 100 TB.
- shuffle partitions sized for the local box; on a real cluster AQE's
  ``coalescePartitions`` makes the initial number a ceiling, not a target.
- Arrow enabled so any Pandas-UDF path is batch-columnar, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark import SparkConf
from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "smartbulkcopy-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or 32 — the driver's harness
    contract. On a real cluster you would drop ``master`` and submit via
    spark-submit; nothing else here is local-mode-specific.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or max(int(cpus), 32))

    builder = SparkSession.builder.appName(app_name)
    # Respect a master configured via spark-submit / spark-defaults / env —
    # forcing local[] there would silently un-cluster the job. Only default
    # to local[] when nothing else chose a master.
    if not SparkConf().contains("spark.master") and "MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let eager()/persist materializations use AQE too (off by
        # default): without it every cached intermediate materializes at
        # the full session shuffle width — 200 near-empty tasks per
        # eager() on a default foreign session, and measurably slower
        # eager-heavy chains here (q107 5.4 -> 4.6 s at sf0.1).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is nanosecond parquet; read as raw nanos once, globally,
        # instead of mutating session conf per query (round-1 verdict #5).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Per-table copy jobs are submitted from a driver thread pool
        # (executor.py); FAIR scheduling interleaves their stages the way
        # the reference's greedy worker queue interleaves work items.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register the synthetic test tables (TESTDATA.md) as temp views and
    return them as a dict of DataFrames."""
    all_names = (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for name in names or all_names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
