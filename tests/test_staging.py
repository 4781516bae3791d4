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

    proto = StagingProtocol(conn, _cfg(), sleep=lambda _: None)
    proto.run(plan, write)

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


def test_ambiguous_publish_failure_probed_not_blindly_retried():
    """A connection drop during publish is ambiguous — the transaction may
    have committed. The retry must consult the probe and skip the
    re-execution when the first attempt landed (else: duplicated rows)."""
    plan = staging_plan("dbo.t", "job4", 1)
    state = {"published": False, "probes": 0}

    class AmbiguousConn(FakeConnection):
        def execute(self, sql):
            super().execute(sql)
            if sql == plan.publish_sql and not state["published"]:
                state["published"] = True  # server committed...
                raise TransientError(10054, "connection reset")  # ...ack lost

    def probe(p):
        state["probes"] += 1
        return state["published"]

    conn = AmbiguousConn()
    StagingProtocol(conn, _cfg(), published_probe=probe,
                    sleep=lambda _: None).run(plan, lambda st: None)

    assert sum(1 for s in conn.sql if s == plan.publish_sql) == 1
    assert state["probes"] >= 1
    assert conn.sql[-1] == plan.cleanup_sql


def test_publish_without_probe_does_not_retry():
    """No probe -> a transient publish failure propagates instead of
    risking a double insert; the table-level retry restarts the cycle."""
    plan = staging_plan("dbo.t", "job5", 1)

    class FailingConn(FakeConnection):
        def execute(self, sql):
            super().execute(sql)
            if sql == plan.publish_sql:
                raise TransientError(10054, "connection reset")

    conn = FailingConn()
    with pytest.raises(TransientError):
        StagingProtocol(conn, _cfg()).run(plan, lambda st: None)
    assert sum(1 for s in conn.sql if s == plan.publish_sql) == 1
    assert conn.sql[-1] == plan.cleanup_sql


def test_staging_names_are_deterministic_per_partition():
    p1 = staging_plan("[dbo].[big table]", "j", 1)
    p2 = staging_plan("[dbo].[big table]", "j", 2)
    assert p1.staging_table != p2.staging_table
    assert p1 == staging_plan("[dbo].[big table]", "j", 1)


def test_staging_names_are_valid_unquoted_identifiers():
    """The staging identifier is emitted unquoted in CREATE/INSERT/DROP —
    spaces, quotes, and brackets from the target name must be folded."""
    import re

    for target in ("[dbo].[big table]", "dbo.o'brien", 'dbo."quoted"'):
        st = staging_plan(target, "j", 1).staging_table
        assert re.fullmatch(r"[A-Za-z0-9_]+", st), st


def test_staging_names_bounded_to_128_chars():
    """SQL Server identifiers max out at 128 chars; a long target name must
    be truncated in the readable part while the hash tag + job id +
    partition number (the uniqueness carriers) survive intact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        target=st.text(min_size=1, max_size=300),
        job=st.from_regex(r"[A-Za-z0-9_]{1,40}", fullmatch=True),
        part=st.integers(min_value=0, max_value=99_999),
    )
    def check(target, job, part):
        import re

        st_name = staging_plan(target, job, part).staging_table
        assert len(st_name) <= 128, (len(st_name), st_name)
        assert re.fullmatch(r"[A-Za-z0-9_]+", st_name), st_name
        assert st_name.endswith(f"_{job}_{part}")

    check()

    # distinct long targets sharing a 120+-char prefix must not collide:
    # the md5 tag of the RAW name survives truncation
    a = staging_plan("x" * 200 + "a", "j", 1).staging_table
    b = staging_plan("x" * 200 + "b", "j", 1).staging_table
    assert a != b
    assert len(a) <= 128 and len(b) <= 128


def test_staged_copy_rejects_vacuous_multi_task_family():
    """N predicate-less tasks would stage and publish the full table N
    times; the guard must fire before any connection is opened."""
    import pytest

    from smartbulkcopy_spark.planner import FullCopyTask
    from smartbulkcopy_spark.sources.jdbc import staged_jdbc_copy

    tasks = [FullCopyTask(source=None, destination=None) for _ in range(2)]
    with pytest.raises(ValueError, match="vacuous"):
        staged_jdbc_copy(
            None, None, tasks, "jdbc:x", "t", _cfg(), job_id="j"
        )
