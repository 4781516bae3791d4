"""Catalog data model: tables, indexes (physical layout), sizes.

Re-expresses the reference's TableInfo family
(reference: client/TableInfoCollector.cs:12-117) as plain dataclasses the
driver-side planner consumes. Spark itself is layout-agnostic; the index
kind here is *planner metadata* that selects read parallelism, write sort,
and batch sizing — exactly the role it plays in the reference.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class IndexKind(enum.Enum):
    UNKNOWN = "unknown"
    HEAP = "heap"
    ROWSTORE_CLUSTERED = "rowstore_clustered"
    COLUMNSTORE_CLUSTERED = "columnstore_clustered"


class TableType(enum.Enum):
    """reference: client/TableInfoCollector.cs:19-23"""

    REGULAR = 0
    HISTORY = 1
    SYSTEM_VERSIONED_TEMPORAL = 2


@dataclass(frozen=True)
class IndexColumn:
    """reference: client/TableInfoCollector.cs:34-40"""

    name: str
    ordinal: int = 0
    descending: bool = False
    partition_ordinal: int = 0
    computed: bool = False


@dataclass
class TableIndex:
    """A table's physical organization; drives the planner's decisions
    (reference: client/TableInfoCollector.cs:42-89)."""

    kind: IndexKind = IndexKind.UNKNOWN
    columns: list[IndexColumn] = field(default_factory=list)

    @property
    def is_partitioned(self) -> bool:
        return any(c.partition_ordinal != 0 for c in self.columns)

    def order_by_columns(self) -> list[IndexColumn]:
        """Sort keys, computed columns excluded
        (reference: client/TableInfoCollector.cs:48)."""
        if self.kind in (IndexKind.HEAP, IndexKind.COLUMNSTORE_CLUSTERED):
            return []
        # ordinal (sys.index_columns.key_ordinal) is 0 for columns that are
        # in the index only as partition/included columns — they are not
        # sort keys and must not lead the ORDER BY.
        return sorted(
            (c for c in self.columns if not c.computed and c.ordinal > 0),
            key=lambda c: c.ordinal,
        )

    def partition_by_columns(self) -> list[IndexColumn]:
        return sorted(
            (c for c in self.columns if c.partition_ordinal != 0),
            key=lambda c: c.partition_ordinal,
        )

    def order_by_spec(self) -> tuple[tuple[str, bool], ...]:
        """Canonical (column, descending) order spec — the planner compares
        these across source/destination the way the reference compares its
        GetOrderByString() results."""
        return tuple((c.name, c.descending) for c in self.order_by_columns())

    def partition_by_spec(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.partition_by_columns())


@dataclass
class HistoryInfo:
    """reference: client/TableInfoCollector.cs:12-18"""

    history_table: str = ""
    period_start_column: str = ""
    period_end_column: str = ""
    retention_period: str = ""


@dataclass
class TableSize:
    """reference: client/TableInfoCollector.cs:24-28 (SizeInGB is an int
    there; we keep integer semantics so the partition-count heuristic is
    bit-identical to the reference's)."""

    row_count: int = 0
    size_gb: int = 0


@dataclass
class TableInfo:
    """reference: client/TableInfoCollector.cs:91-117"""

    name: str
    exists: bool = True
    primary_index: TableIndex = field(default_factory=TableIndex)
    secondary_indexes: int = 0
    foreign_keys: int = 0
    columns: list[str] = field(default_factory=list)
    # Columns safely castable to BIGINT for logical bucketing. None means
    # "unknown" (a catalog that didn't fetch types) — the planner then
    # trusts the clustered key like the reference trusts %%PhysLoc%%.
    # An empty LIST means "known: no numeric columns" and forbids
    # modulo bucketing outright.
    numeric_columns: list[str] | None = None
    # (name, system_type_id, precision, scale) per copyable column, when
    # the catalog fetched types (JDBC). Drives the declared type-mapping
    # policy (types.py): customSchema hints at the scan + lossy-column
    # warnings in the planner log. None for file sources (parquet types
    # are already Spark types).
    column_types: list[tuple[str, int, int, int]] | None = None
    # The IDENTITY column, when the catalog knows it (sys.identity_columns
    # over JDBC, LayoutSpec for files). Drives post-copy reseed.
    identity_column: str | None = None
    size: TableSize = field(default_factory=TableSize)
    table_type: TableType = TableType.REGULAR
    history_info: HistoryInfo | None = None
    # Physical partitioning metadata (reference queries these live from
    # sys.partition_functions, client/TableAnalyzer.cs:296-338; we carry
    # them in the catalog so planning stays a pure function).
    partition_count: int = 0
    partition_column: str | None = None
    partition_function: str | None = None
    # Range boundaries for file-side physical partitioning: N partitions
    # need N-1 sorted upper boundaries. Optional — JDBC sources can
    # address partitions ordinally instead.
    partition_boundaries: list[object] = field(default_factory=list)
    # Source location (path for files, table name for JDBC).
    location: str | None = None

    def missing(self) -> bool:
        return not self.exists
