"""Pre/post-copy DDL hooks: temporal-table disable/enable and identity
reseed.

The reference executes these directly against the destination
(system-versioning off before load, on after: client/SmartBulkCopy.cs:
256-280, SQL shape docs/FAQ.md:53-66; identity reseed:
client/SmartBulkCopy.cs:341-389). Spark has no temporal/identity concepts,
so the engine *emits* the statements: executed over a JDBC connection when
the destination is a database, logged as actionable output for file
destinations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from smartbulkcopy_spark.model import HistoryInfo, TableInfo, TableType


def temporal_disable_sql(table: str) -> str:
    return f"ALTER TABLE {table} SET (SYSTEM_VERSIONING = OFF)"


def temporal_enable_sql(table: str, history: HistoryInfo | None) -> str:
    opts = []
    if history and history.history_table:
        opts.append(f"HISTORY_TABLE = {history.history_table}")
    if history and history.retention_period and history.retention_period != "INFINITE":
        opts.append(f"HISTORY_RETENTION_PERIOD = {history.retention_period}")
    inner = f" ({', '.join(opts)})" if opts else ""
    return f"ALTER TABLE {table} SET (SYSTEM_VERSIONING = ON{inner})"


def identity_reseed_sql(table: str, new_seed) -> str:
    return f"DBCC CHECKIDENT('{table}', RESEED, {new_seed})"


@dataclass
class TableHooks:
    """DDL to run around one table's load, in order."""

    pre: list[str] = field(default_factory=list)
    post: list[str] = field(default_factory=list)


def hooks_for(destination: TableInfo) -> TableHooks:
    """Derive the hook set from destination metadata: temporal tables are
    un-versioned for the load and re-versioned after (the planner only
    lets a temporal destination through when stop-if is waived)."""
    hooks = TableHooks()
    if destination.table_type is TableType.SYSTEM_VERSIONED_TEMPORAL:
        hooks.pre.append(temporal_disable_sql(destination.name))
        hooks.post.append(
            temporal_enable_sql(destination.name, destination.history_info)
        )
    return hooks
