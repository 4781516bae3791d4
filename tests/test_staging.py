"""Staging commit protocol: partial write -> retry -> exactly-once publish
(the reference's transactional per-partition semantics, re-expressed as
stage-then-publish; reference: client/SmartBulkCopy.cs:450-607)."""

from __future__ import annotations

import pytest

from smartbulkcopy_spark.config import EngineConfig
from smartbulkcopy_spark.retry import TransientError
from smartbulkcopy_spark.sources.jdbc import StagingProtocol, staging_plan


class FakeConnection:
    def __init__(self):
        self.sql = []

    def execute(self, sql):
        self.sql.append(sql)


def _cfg():
    return EngineConfig(retry_max_attempt=5, retry_delay_increment=1)


def test_happy_path_publishes_once():
    conn = FakeConnection()
    plan = staging_plan("[dbo].[t]", "job1", 3)
    writes = []
    StagingProtocol(conn, _cfg()).run(plan, lambda st: writes.append(st))
    assert writes == [plan.staging_table]
    publishes = [s for s in conn.sql if s == plan.publish_sql]
    assert len(publishes) == 1
    # cleanup runs before create (leftovers) and after publish
    assert conn.sql[0] == plan.cleanup_sql
    assert conn.sql[-1] == plan.cleanup_sql
    assert conn.sql.index(plan.create_sql) < conn.sql.index(plan.publish_sql)


def test_partial_write_retries_from_truncate_then_publishes_once():
    conn = FakeConnection()
    plan = staging_plan("dbo.t", "job2", 1)
    attempts = {"n": 0}

    def write(st):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise TransientError(10054, "connection reset mid-stream")

    proto = StagingProtocol(conn, _cfg())
    # make retry instantaneous
    import smartbulkcopy_spark.retry as retry_mod

    orig_sleep = retry_mod.time.sleep
    retry_mod.time.sleep = lambda _: None
    try:
        proto.run(plan, write)
    finally:
        retry_mod.time.sleep = orig_sleep

    truncates = [s for s in conn.sql if s.startswith("TRUNCATE")]
    assert len(truncates) == 3  # one per attempt: no partial rows survive
    assert sum(1 for s in conn.sql if s == plan.publish_sql) == 1
    assert conn.sql[-1] == plan.cleanup_sql


def test_fatal_write_cleans_up_and_never_publishes():
    conn = FakeConnection()
    plan = staging_plan("dbo.t", "job3", 2)

    def write(st):
        raise TransientError(2627, "PK violation")  # not transient

    with pytest.raises(TransientError):
        StagingProtocol(conn, _cfg()).run(plan, write)
    assert plan.publish_sql not in conn.sql
    assert conn.sql[-1] == plan.cleanup_sql  # staging dropped on failure


def test_staging_names_are_deterministic_per_partition():
    p1 = staging_plan("[dbo].[big table]", "j", 1)
    p2 = staging_plan("[dbo].[big table]", "j", 2)
    assert p1.staging_table != p2.staging_table
    assert p1 == staging_plan("[dbo].[big table]", "j", 1)
