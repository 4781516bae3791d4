"""JDBC source/sink: partition-predicated parallel reads and batch-controlled
writes, with an idempotent staging commit protocol for retry safety.

This is the direct Spark expression of the reference's data plane
(reference: client/SmartBulkCopy.cs:398-663). No live database exists in
the build container, so these functions are exercised by unit tests only
at the SQL/plumbing level; the parquet path covers end-to-end behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from smartbulkcopy_spark.config import COLUMNSTORE_MIN_BATCH, EngineConfig
from smartbulkcopy_spark.model import IndexKind, TableInfo
from smartbulkcopy_spark.planner import (
    CopyTask,
    LogicalPartitionCopyTask,
    PhysicalPartitionCopyTask,
)


def jdbc_predicates(tasks: list[CopyTask], dialect: str = "ansi") -> list[str]:
    """One predicate string per plan node -> one Spark task per partition
    (reference generates one SELECT per work item,
    client/SmartBulkCopy.cs:424-428).

    A physical-partition task without range boundaries (SQL Server source
    whose catalog didn't surface sys.partition_range_values) falls back to
    the native ``$partition.fn(col) = n`` spelling — without this, every
    predicate degenerated to ``1=1`` and an N-task family read the whole
    table N times (round-1 advice).

    ``dialect="mssql"`` appends ``OPTION (MAXDOP 1)`` to each
    logical-partition predicate, exactly as the reference does
    (client/CopyInfo.cs:63): N concurrent modulo scans already saturate N
    source cores, and letting each scan also parallelize server-side
    thrashes the source. Spark pastes a lone partition predicate verbatim
    after WHERE, so the statement-final hint lands in the right position
    — but ONLY when no Catalyst filter is pushed into the same scan:
    with pushed filters Spark emits ``WHERE (filters) AND (predicate)``,
    and the parenthesized hint is a syntax error. read_jdbc_partitioned
    therefore disables JDBC filter pushdown whenever hints are embedded
    (partition slicing still happens server-side; residual filters run
    in Spark). The hint is T-SQL only — never emitted for other
    dialects, and never on the Catalyst-side predicate path."""
    preds = []
    for t in tasks:
        p = t.predicate_sql()
        if (
            p is None
            and isinstance(t, PhysicalPartitionCopyTask)
            and t.partition_function
        ):
            p = t.mssql_predicate()
        if (
            p is not None
            and dialect == "mssql"
            and isinstance(t, LogicalPartitionCopyTask)
        ):
            p = f"{p} OPTION (MAXDOP 1)"
        preds.append(p if p else "1=1")
    if len(preds) > 1 and any(p == "1=1" for p in preds):
        raise ValueError(
            "multi-task family contains a vacuous predicate — this would"
            f" copy the table {len(preds)} times: {preds}"
        )
    return preds


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    tasks: list[CopyTask],
    properties: dict[str, str] | None = None,
    dialect: str = "ansi",
) -> DataFrame:
    """Partition-parallel JDBC read: each planner predicate becomes one
    Spark partition (SURVEY §2.1 S2/S3). When the catalog fetched column
    types, the declared type-mapping policy (types.py) is enforced AT THE
    SCAN via customSchema — the JDBC dialect never guesses."""
    from smartbulkcopy_spark.types import custom_schema_hints

    head = tasks[0]
    table = head.source.location or head.source.name
    props = dict(properties or {})
    if head.source.column_types and "customSchema" not in props:
        hints = custom_schema_hints(head.source.column_types)
        if hints:
            props["customSchema"] = hints
    preds = jdbc_predicates(tasks, dialect=dialect)
    if any("OPTION (MAXDOP" in p for p in preds):
        # A pushed Catalyst filter would wrap the predicate in parens
        # (`WHERE (filter) AND (pred OPTION ...)`) — invalid T-SQL. Keep
        # the partition predicate the ONLY server-side clause so the
        # statement-final hint placement is guaranteed; residual filters
        # evaluate in Spark. OVERRIDES any caller-supplied
        # pushDownPredicate — a 'true' here is not a tuning choice, it
        # is a syntax error waiting for the first pushed filter.
        props["pushDownPredicate"] = "false"
    df = spark.read.jdbc(
        url=url,
        table=table,
        predicates=preds,
        properties=props,
    )
    return df.select(*head.select_columns())


def effective_batch_size(config: EngineConfig, destination: TableInfo) -> int:
    """Columnstore destinations force >=102,400-row batches so rowgroups
    compress straight to columnar segments without delta-store churn
    (reference: client/SmartBulkCopy.cs:511-516, README.md:80-82)."""
    if destination.primary_index.kind is IndexKind.COLUMNSTORE_CLUSTERED:
        return max(config.batch_size, COLUMNSTORE_MIN_BATCH)
    return config.batch_size


def _jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    config: EngineConfig,
    destination: TableInfo,
    properties: dict[str, str] | None,
):
    """The one place writer options are assembled — shared by the plain
    and staged write paths so batch/isolation settings can't drift."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", effective_batch_size(config, destination))
        .option("isolationLevel", "READ_COMMITTED")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return writer


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    config: EngineConfig,
    destination: TableInfo,
    properties: dict[str, str] | None = None,
) -> None:
    """Append write with batch control; truncate-then-load maps to
    mode=overwrite + truncate=true (SURVEY §2.1 S4/S5)."""
    writer = _jdbc_writer(df, url, table, config, destination, properties)
    if config.truncate_tables:
        writer = writer.mode("overwrite").option("truncate", "true")
    else:
        writer = writer.mode("append")
    writer.save()


# ---------------------------------------------------------------------------
# Idempotent commit protocol (SURVEY §7.4 known-hard #1).
#
# Plain JDBC appends are not idempotent under Spark task retry: a task that
# dies mid-batch leaves partial rows. The reference wraps each partition in
# an explicit transaction with rollback + retry
# (reference: client/SmartBulkCopy.cs:450-607). The Spark-native equivalent
# is stage-then-publish: every attempt writes to a staging table keyed by
# (job, partition), and publication is a single INSERT...SELECT that the
# driver executes exactly once per partition after the write succeeds.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StagingPlan:
    target_table: str
    staging_table: str
    dialect: str = "mssql"

    @property
    def create_sql(self) -> str:
        if self.dialect == "derby":
            # Derby (used by the live tests) has no SELECT INTO.
            return (
                f"CREATE TABLE {self.staging_table} AS SELECT * FROM"
                f" {self.target_table} WITH NO DATA"
            )
        return (
            f"SELECT * INTO {self.staging_table} FROM {self.target_table}"
            " WHERE 1 = 0"
        )

    @property
    def publish_sql(self) -> str:
        if self.dialect == "derby":
            return (
                f"INSERT INTO {self.target_table}"
                f" SELECT * FROM {self.staging_table}"
            )
        return (
            f"INSERT INTO {self.target_table} WITH (TABLOCK)"
            f" SELECT * FROM {self.staging_table}"
        )

    @property
    def cleanup_sql(self) -> str:
        if self.dialect == "derby":
            return f"DROP TABLE {self.staging_table}"
        return f"DROP TABLE IF EXISTS {self.staging_table}"


def staging_plan(
    target_table: str,
    job_id: str,
    partition_number: int,
    dialect: str = "mssql",
) -> StagingPlan:
    import hashlib
    import re

    # The staging identifier is emitted unquoted: every character outside
    # [A-Za-z0-9_] (spaces, quotes, dots, brackets) must be folded away or
    # a name like [dbo].[big table] produces invalid staging SQL. Folding
    # can collide distinct targets ([a b] vs [a.b]), so a short hash of
    # the RAW name keeps staging tables collision-free per target.
    safe = re.sub(r"[^A-Za-z0-9_]", "_", target_table.replace("]", ""))
    tag = hashlib.md5(target_table.encode()).hexdigest()[:6]
    # SQL Server identifiers are capped at 128 chars. The hash tag, job id,
    # and partition number carry the uniqueness, so only the readable name
    # part is truncated to fit.
    suffix = f"_{tag}_{job_id}_{partition_number}"
    budget = 128 - len("stage_") - len(suffix)
    if budget < 1:
        raise ValueError(
            f"staging suffix leaves no identifier budget (job_id too long?):"
            f" {suffix!r}"
        )
    return StagingPlan(
        target_table=target_table,
        staging_table=f"stage_{safe[:budget]}{suffix}",
        dialect=dialect,
    )


# Transient error numbers the retry loop treats as retryable
# (reference: client/SmartBulkCopy.cs:21-33).
TRANSIENT_SQLSERVER_ERRORS = frozenset(
    {0, 53, 121, 258, 1205, 4060, 4221, 10054, 10928, 10929, 40143, 40197, 40501, 40613, 49918, 49919, 49920}
)


class StagingProtocol:
    """Execute the stage-then-publish commit protocol over a DB-API-style
    connection (anything with ``execute(sql)``).

    Guarantees, mirroring the reference's per-partition transaction
    (reference: client/SmartBulkCopy.cs:450-607, rollback at 576-591):

    - every WRITE attempt starts from an empty staging table (truncate
      before each try), so a mid-write death never leaks partial rows;
    - PUBLISH is a single ``INSERT...SELECT`` statement — one transaction
      on the server. A publish failure is AMBIGUOUS when the connection
      drops: the transaction may have committed before the ack was lost,
      and blindly retrying would double-insert the partition. So a retry
      after a publish failure first consults ``published_probe`` (a
      caller-supplied check, e.g. comparing target vs staging partition
      row counts) and skips the re-execution if the first attempt landed.
      Without a probe, publish is NOT retried — the error propagates for
      the table-level retry to restart the whole stage-then-publish cycle
      (safe, because cleanup drops the staging table first);
    - CLEANUP always runs, dropping the staging table on success and
      failure alike.
    """

    def __init__(self, connection, config: EngineConfig, log=None,
                 published_probe=None, sleep=None):
        import time

        self.connection = connection
        self.config = config
        self.log = log or (lambda *_: None)
        self.published_probe = published_probe
        self.sleep = sleep or time.sleep  # injectable for tests

    def run(self, plan: StagingPlan, write_fn) -> None:
        from smartbulkcopy_spark.retry import with_retry

        conn = self.connection
        self._cleanup(plan)  # drop leftovers from a dead run
        conn.execute(plan.create_sql)
        try:
            def attempt():
                conn.execute(f"TRUNCATE TABLE {plan.staging_table}")
                write_fn(plan.staging_table)

            with_retry(attempt, self.config, log=self.log, sleep=self.sleep)

            if self.published_probe is None:
                conn.execute(plan.publish_sql)
            else:
                def publish():
                    if self.published_probe(plan):
                        self.log(
                            f"{plan.staging_table}: publish already landed;"
                            " skipping re-execution"
                        )
                        return
                    conn.execute(plan.publish_sql)

                with_retry(
                    publish, self.config, log=self.log, sleep=self.sleep
                )
        finally:
            self._cleanup(plan)

    def _cleanup(self, plan: StagingPlan) -> None:
        """Best-effort staging drop: a missing table (Derby has no IF
        EXISTS) or a post-publish drop failure must not fail the copy."""
        try:
            self.connection.execute(plan.cleanup_sql)
        except Exception as exc:
            self.log(f"staging cleanup ({plan.staging_table}): {exc}")


class JvmJdbcConnection:
    """A real ``java.sql.Connection`` reached through Spark's Py4J
    gateway — lets the driver execute the DDL/DML the DataFrame API can't
    express (staging create/publish/cleanup, temporal hooks, reseeds)
    without a separate Python database driver."""

    def __init__(self, spark: SparkSession, url: str):
        self._conn = spark._sc._jvm.java.sql.DriverManager.getConnection(url)

    def execute(self, sql: str) -> None:
        stmt = self._conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()

    def scalar(self, sql: str):
        """First column of the first row (for published-probes)."""
        stmt = self._conn.createStatement()
        try:
            rs = stmt.executeQuery(sql)
            try:
                return rs.getObject(1) if rs.next() else None
            finally:
                rs.close()
        finally:
            stmt.close()

    def close(self) -> None:
        self._conn.close()


def staged_jdbc_copy(
    spark: SparkSession,
    source_df: DataFrame,
    tasks: list[CopyTask],
    url: str,
    table: str,
    config: EngineConfig,
    job_id: str,
    dialect: str = "mssql",
    properties: dict[str, str] | None = None,
    log=None,
    before_write=None,
    sleep=None,
    source_url: str | None = None,
    source_properties: dict[str, str] | None = None,
) -> None:
    """Per-partition exactly-once JDBC copy (SURVEY §7.4 known-hard #1).

    Each plan node's rows are filtered Catalyst-side with the node's own
    predicate (the canonical bucket expression — the database never parses
    it), written into a partition-private staging table with
    truncate-before-every-attempt retry, then published atomically with
    one INSERT...SELECT. The published-probe is PER-PARTITION: it compares
    the target's count under this partition's own predicate (the canonical
    expression is plain ANSI, so the target server evaluates it too)
    against the pre-publish baseline plus the staging count. Partitions
    are disjoint, so concurrent publishes of the table's OTHER partitions
    never perturb the probed count — the only remaining assumption is that
    no third party concurrently inserts rows matching THIS partition's
    predicate (single-writer-per-partition, the same assumption the
    reference's per-partition transaction makes).

    ``before_write`` is a test seam invoked with (task, staging_table)
    before each write attempt — failure-injection for the retry path.
    """
    import pyspark.sql.functions as F

    log = log or (lambda *_: None)

    def mssql_fallback(t: CopyTask) -> bool:
        # Boundary-less physical partitions can't be expressed as a
        # Catalyst filter, but the native $partition spelling pushes to
        # the SOURCE server when its url is known.
        return (
            source_url is not None
            and isinstance(t, PhysicalPartitionCopyTask)
            and bool(t.partition_function)
        )

    # Same guard as jdbc_predicates: a predicate-less task in a multi-task
    # family (with no server-side fallback) would stage and publish the
    # FULL table once per task.
    if len(tasks) > 1 and any(
        t.predicate_sql() is None and not mssql_fallback(t) for t in tasks
    ):
        raise ValueError(
            "multi-task family contains a vacuous predicate — each task"
            f" would publish the whole table ({len(tasks)} duplicates);"
            " collect partition boundaries or pass source_url for"
            " $partition pushdown"
        )
    conn = JvmJdbcConnection(spark, url)
    try:
        total_published = 0

        for task in tasks:
            plan = staging_plan(
                table, job_id, task.partition_number, dialect=dialect
            )
            pred = task.predicate_sql()
            if pred is not None:
                part_df = source_df.filter(F.expr(pred))
            elif mssql_fallback(task):
                part_df = spark.read.jdbc(
                    url=source_url,
                    table=task.source.location or task.source.name,
                    predicates=[task.mssql_predicate()],
                    properties=source_properties or properties or {},
                )
            else:
                part_df = source_df

            # This partition's rows, as the TARGET server sees them. The
            # canonical predicate parses on mssql (T-SQL `%`), but not on
            # every dialect (Derby has only MOD()), so predicate-scoped
            # probing is mssql-only. $partition.pf() predicates are NOT
            # usable here: they bind the SOURCE's partition function,
            # which the destination may not have at all (partitioned
            # source -> heap destination is a supported shape, reference:
            # client/TableAnalyzer.cs:109-113) or may define with
            # different boundaries — either erroring the probe or, worse,
            # mis-scoping it. Those tasks — like non-mssql dialects —
            # fall back to the whole-table count, which stays correct
            # because this copy publishes partitions serially (single
            # writer per table).
            tsql_pred = pred if dialect == "mssql" else None
            where = f" WHERE {tsql_pred}" if tsql_pred else ""
            part_count_sql = f"SELECT COUNT(*) FROM {table}{where}"
            # pre-publish baseline under this partition's predicate only —
            # pre-existing rows (append mode) must not read as "published"
            baseline_part = conn.scalar(part_count_sql) or 0
            staged_rows = 0

            def write_fn(staging, df=part_df, t=task):
                if before_write is not None:
                    before_write(t, staging)
                _jdbc_writer(
                    df, url, staging, config, t.destination, properties
                ).mode("append").save()
                nonlocal staged_rows
                staged_rows = (
                    conn.scalar(f"SELECT COUNT(*) FROM {staging}") or 0
                )

            def probe(
                p, count_sql=part_count_sql, want=lambda: staged_rows,
                base=lambda: baseline_part,
            ):
                # this partition's slice of the target grew by the staged
                # row count -> the publish landed before the failure.
                n = conn.scalar(count_sql) or 0
                return n >= base() + want()

            proto = StagingProtocol(
                conn, config, log=log, published_probe=probe, sleep=sleep
            )
            proto.run(plan, write_fn)
            total_published += staged_rows
            log(
                f"{table} partition {task.partition_number}: published"
                f" (+{staged_rows} rows, total {total_published})"
            )
    finally:
        conn.close()
