"""Live JDBC source/sink tests against embedded Derby (ships in Spark's
jars) — the closest available stand-in for a real database endpoint.

Covers the rows the round-1 verdict flagged untested: the bulk-insert
sink (S4), truncate-then-load (S5), and partition-predicated parallel
reads (S2) — all through the same `sources/jdbc.py` functions a SQL
Server endpoint would use. The logical-bucket predicate spelling
(`% N = k`) is T-SQL and is covered by Catalyst-parse tests instead;
here the portable range predicates exercise the predicates→partitions
mechanism.
"""

from __future__ import annotations

import pytest

from smartbulkcopy_spark.config import EngineConfig
from smartbulkcopy_spark.model import TableInfo
from smartbulkcopy_spark.planner import PhysicalPartitionCopyTask
from smartbulkcopy_spark.sources.jdbc import (
    jdbc_predicates,
    read_jdbc_partitioned,
    write_jdbc,
)
from smartbulkcopy_spark.verify import content_fingerprint

URL = "jdbc:derby:memory:sbctest;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def seeded(spark, sf_dir):
    """lineitem's simple-typed columns, written into Derby."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    df.write.mode("overwrite").jdbc(URL, "lineitem", properties=PROPS)
    return df


def test_jdbc_sink_append_then_verify(spark, seeded):
    """S4: the engine's JDBC writer appends into an existing table (the
    reference's only supported shape: destination objects pre-exist);
    content fingerprint must match source exactly."""
    src = seeded
    # destination pre-created empty, same schema
    src.limit(0).write.mode("overwrite").jdbc(URL, "li_dest", properties=PROPS)
    config = EngineConfig(batch_size=997, truncate_tables=False)
    write_jdbc(
        src, URL, "li_dest", config, destination=TableInfo(name="li_dest"),
        properties=PROPS,
    )
    dst = spark.read.jdbc(URL, "li_dest", properties=PROPS)
    assert content_fingerprint(src) == content_fingerprint(dst)


def test_jdbc_partitioned_read_one_task_per_predicate(spark, seeded):
    """S2: each planner predicate becomes one Spark partition; the
    partition family is disjoint and exhaustive."""
    t = TableInfo(name="lineitem", columns=[
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ], location="lineitem")
    bounds = [2000, 4000]
    tasks = []
    n = len(bounds) + 1
    for i in range(1, n + 1):
        # Derby resolves unquoted identifiers upper-case; quote to match
        # the Spark-written lowercase column (SQL Server needs no quoting).
        tasks.append(PhysicalPartitionCopyTask(
            source=t, destination=t, partition_number=i,
            partition_column='"l_orderkey"',
            lower=bounds[i - 2] if i >= 2 else None,
            upper=bounds[i - 1] if i <= len(bounds) else None,
        ))
    preds = jdbc_predicates(tasks)
    assert len(preds) == 3 and all(p != "1=1" for p in preds)

    df = read_jdbc_partitioned(spark, URL, tasks, properties=PROPS)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == seeded.count()
    assert content_fingerprint(df) == content_fingerprint(seeded)


def test_staged_copy_exactly_once_under_injected_failures(spark, seeded):
    """SURVEY §7.4 known-hard #1, end-to-end on a real database: a 3-way
    partitioned copy where partition 2's first write attempt leaves
    partial rows and dies with a transient error. The staging protocol
    must truncate-and-retry that partition and publish every partition
    exactly once — final content identical to the source, no loss, no
    duplication."""
    from smartbulkcopy_spark.model import TableInfo
    from smartbulkcopy_spark.planner import LogicalPartitionCopyTask
    from smartbulkcopy_spark.retry import TransientError
    from smartbulkcopy_spark.sources.jdbc import staged_jdbc_copy

    src = seeded
    src.limit(0).write.mode("overwrite").jdbc(URL, "li_staged", properties=PROPS)

    # The bucket predicate is evaluated by Catalyst on the source
    # DataFrame — Derby never parses it, so no identifier quoting needed.
    t = TableInfo(name="lineitem", columns=list(src.columns))
    tasks = [
        LogicalPartitionCopyTask(
            source=t, destination=t, partition_number=i, n_partitions=3,
            bucket_column="l_orderkey",
        )
        for i in range(1, 4)
    ]

    failures = {"n": 0}

    def inject(task, staging):
        if task.partition_number == 2 and failures["n"] == 0:
            failures["n"] += 1
            # leave partial rows behind, then die mid-write
            src.limit(50).write.mode("append").jdbc(URL, staging, properties=PROPS)
            raise TransientError(10054, "connection reset mid-stream")

    staged_jdbc_copy(
        spark, src, tasks, URL, "li_staged",
        EngineConfig(retry_max_attempt=3, retry_delay_increment=1),
        job_id="t1", dialect="derby", properties=PROPS,
        before_write=inject, sleep=lambda _: None,
    )

    assert failures["n"] == 1  # the injection fired
    dst = spark.read.jdbc(URL, "li_staged", properties=PROPS)
    assert content_fingerprint(dst) == content_fingerprint(src)


def test_jdbc_truncate_then_load(spark, seeded):
    """S5: truncate-then-load maps to overwrite+truncate; the rewritten
    table holds exactly the new content."""
    seeded.write.mode("overwrite").jdbc(URL, "li_trunc", properties=PROPS)
    half = seeded.where("l_orderkey % 2 = 0")
    config = EngineConfig(truncate_tables=True)
    write_jdbc(
        half, URL, "li_trunc", config,
        destination=TableInfo(name="li_trunc"), properties=PROPS,
    )
    dst = spark.read.jdbc(URL, "li_trunc", properties=PROPS)
    assert content_fingerprint(dst) == content_fingerprint(half)
