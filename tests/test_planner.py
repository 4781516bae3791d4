"""Plan-shape tests mirroring the reference's NUnit suite
(reference: tests/Heap.cs, tests/ClusteredRowstore.cs,
tests/ClusteredColumnstore.cs, tests/Issues.cs, tests/Misc.cs).

The fixtures simulate the six LINEITEM layouts with the reference's own
benchmark numbers (59,986,052 rows / 8 GB heap) so expected partition
counts are identical: 9 logical for the big heap, 3 for the columnstore,
85 physical for partitioned layouts."""

from __future__ import annotations

import pytest

from smartbulkcopy_spark.config import EngineConfig, StopIf
from smartbulkcopy_spark.model import (
    IndexColumn,
    IndexKind,
    TableIndex,
    TableInfo,
    TableSize,
    TableType,
)
from smartbulkcopy_spark.planner import (
    FullCopyTask,
    LogicalPartitionCopyTask,
    Outcome,
    OrderHint,
    PhysicalPartitionCopyTask,
    analyze,
    logical_partition_count,
)

LINEITEM_ROWS = 59_986_052  # reference: README.md:159
LINEITEM_GB = 8  # 8.8 GB -> int pages math gives 8


def heap(partition_col=None):
    cols = []
    if partition_col:
        cols.append(IndexColumn(name=partition_col, ordinal=1, partition_ordinal=1))
    return TableIndex(kind=IndexKind.HEAP, columns=cols)


def rowstore(keys, partition_col=None):
    cols = [
        IndexColumn(name=n, ordinal=i + 1, descending=d)
        for i, (n, d) in enumerate(keys)
    ]
    if partition_col:
        names = {c.name for c in cols}
        if partition_col in names:
            cols = [
                IndexColumn(c.name, c.ordinal, c.descending, 1, c.computed)
                if c.name == partition_col
                else c
                for c in cols
            ]
        else:
            cols.append(
                IndexColumn(name=partition_col, ordinal=len(cols) + 1, partition_ordinal=1)
            )
    return TableIndex(kind=IndexKind.ROWSTORE_CLUSTERED, columns=cols)


def columnstore(partition_col=None):
    cols = []
    if partition_col:
        cols.append(IndexColumn(name=partition_col, ordinal=1, partition_ordinal=1))
    return TableIndex(kind=IndexKind.COLUMNSTORE_CLUSTERED, columns=cols)


def tinfo(name, index, rows=LINEITEM_ROWS, gb=LINEITEM_GB, partitions=0, pcol=None, **kw):
    kw.setdefault("columns", ["l_orderkey", "l_linenumber", "l_quantity"])
    return TableInfo(
        name=name,
        primary_index=index,
        size=TableSize(row_count=rows, size_gb=gb),
        partition_count=partitions,
        partition_column=pcol,
        **kw,
    )


def plan_one(src, dst, config=None):
    cfg = config or EngineConfig()
    return analyze([src.name], [src], [dst], cfg)


# --- heaps (reference: tests/Heap.cs:14-51) --------------------------------


def test_small_heap_single_stream():
    src = tinfo("t", heap(), rows=1000, gb=0)
    dst = tinfo("t", heap(), rows=0, gb=0)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.SUCCESS
    assert len(r.tasks) == 1
    assert isinstance(r.tasks[0], FullCopyTask)
    assert r.tasks[0].order_hint is OrderHint.NONE


def test_big_heap_nine_logical_partitions():
    src = tinfo("lineitem_heap", heap())
    dst = tinfo("lineitem_heap", heap(), rows=0, gb=0)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.SUCCESS
    assert len(r.tasks) == 9  # reference: tests/Heap.cs:34
    assert all(isinstance(t, LogicalPartitionCopyTask) for t in r.tasks)
    preds = [t.predicate_sql() for t in r.tasks]
    assert len(set(preds)) == 9  # disjoint buckets


def test_big_partitioned_heap_85_physical():
    src = tinfo(
        "lineitem_heap_p", heap("l_commitdate"), partitions=85, pcol="l_commitdate"
    )
    dst = tinfo("lineitem_heap_p", heap("l_commitdate"), rows=0, gb=0)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.SUCCESS
    assert len(r.tasks) == 85  # reference: tests/Heap.cs:47-50
    assert all(isinstance(t, PhysicalPartitionCopyTask) for t in r.tasks)
    assert all(t.order_hint is OrderHint.PARTITION_KEY_ONLY for t in r.tasks)


# --- clustered rowstore (reference: tests/ClusteredRowstore.cs:14-77) ------


def test_partitioned_source_with_zero_partitions_falls_back_to_full_copy():
    """A partitioned source whose catalog reported partition_count=0 must
    still be copied (one full task), never silently skipped under
    SUCCESS."""
    src = tinfo("t0", heap("d"), partitions=0, pcol="d")
    dst = tinfo("t0", heap("d"), rows=0, gb=0)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.SUCCESS
    assert len(r.tasks) == 1
    assert isinstance(r.tasks[0], FullCopyTask)


def test_partition_only_column_not_in_order_by():
    """sys.index_columns rows with key_ordinal=0 (partition/included
    columns) are not sort keys: the ORDER BY spec must not include or
    lead with them."""
    idx = TableIndex(
        kind=IndexKind.ROWSTORE_CLUSTERED,
        columns=[
            IndexColumn(name="d", ordinal=0, partition_ordinal=1),
            IndexColumn(name="k1", ordinal=1),
            IndexColumn(name="k2", ordinal=2),
        ],
    )
    assert idx.order_by_spec() == (("k1", False), ("k2", False))
    assert idx.partition_by_spec() == ("d",)


def test_rowstore_single_ordered_stream():
    keys = [("l_orderkey", False), ("l_linenumber", False)]
    src = tinfo("li_cr", rowstore(keys))
    dst = tinfo("li_cr", rowstore(keys), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 1
    assert isinstance(r.tasks[0], FullCopyTask)
    assert r.tasks[0].order_hint is OrderHint.CLUSTERED_INDEX
    assert r.tasks[0].order_by_spec() == (
        ("l_orderkey", False),
        ("l_linenumber", False),
    )


def test_rowstore_partitioned_85_ordered():
    keys = [("l_orderkey", False), ("l_linenumber", False), ("l_commitdate", False)]
    src = tinfo(
        "li_crp",
        rowstore(keys, "l_commitdate"),
        partitions=85,
        pcol="l_commitdate",
    )
    dst = tinfo("li_crp", rowstore(keys, "l_commitdate"), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 85  # reference: tests/ClusteredRowstore.cs:46-50
    assert all(isinstance(t, PhysicalPartitionCopyTask) for t in r.tasks)
    assert all(t.order_hint is OrderHint.CLUSTERED_INDEX for t in r.tasks)


def test_rowstore_computed_column_drops_from_order_by():
    # reference: tests/ClusteredRowstore.cs:54-64 + client/TableInfoCollector.cs:48
    idx = TableIndex(
        kind=IndexKind.ROWSTORE_CLUSTERED,
        columns=[
            IndexColumn(name="a", ordinal=1),
            IndexColumn(name="comp", ordinal=2, computed=True),
        ],
    )
    src = tinfo("t", idx, rows=100, gb=0)
    dst = tinfo("t", idx, rows=0, gb=0)
    r = plan_one(src, dst)
    assert r.tasks[0].order_by_spec() == (("a", False),)


def test_rowstore_desc_key_honored():
    # reference: tests/Issues.cs:14-38 ([L_LINENUMBER] DESC)
    keys = [("l_commitdate", False), ("l_orderkey", False), ("l_linenumber", True)]
    src = tinfo(
        "li_issue17",
        rowstore(keys, "l_commitdate"),
        partitions=85,
        pcol="l_commitdate",
    )
    dst = tinfo("li_issue17", rowstore(keys, "l_commitdate"), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 85
    assert r.tasks[0].order_by_spec()[-1] == ("l_linenumber", True)


# --- clustered columnstore (reference: tests/ClusteredColumnstore.cs) ------


def test_columnstore_small_single():
    src = tinfo("li_cci", columnstore(), rows=1000, gb=0)
    dst = tinfo("li_cci", columnstore(), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 1
    assert isinstance(r.tasks[0], FullCopyTask)


def test_columnstore_big_three_logical():
    # CCI compresses ~10 GB to ~1 GB -> auto gives 1 -> clamped to 3
    src = tinfo("li_cci", columnstore(), gb=1)
    dst = tinfo("li_cci", columnstore(), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 3  # reference: tests/ClusteredColumnstore.cs:34
    assert all(isinstance(t, LogicalPartitionCopyTask) for t in r.tasks)


def test_columnstore_partitioned_85_physical_partition_hint():
    src = tinfo(
        "li_ccip", columnstore("l_commitdate"), partitions=85, pcol="l_commitdate"
    )
    dst = tinfo("li_ccip", columnstore("l_commitdate"), rows=0, gb=0)
    r = plan_one(src, dst)
    assert len(r.tasks) == 85  # reference: tests/ClusteredColumnstore.cs:47-50
    assert all(t.order_hint is OrderHint.PARTITION_KEY_ONLY for t in r.tasks)


# --- guard rails (reference: tests/Misc.cs:14-52) --------------------------


def test_foreign_keys_always_fatal():
    src = tinfo("t", heap(), rows=10, gb=0)
    dst = tinfo("t", heap(), rows=0, gb=0, foreign_keys=2)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.FOREIGN_KEYS_FOUND_ON_DESTINATION
    assert r.tasks == []


def test_secondary_index_stops_by_default():
    src = tinfo("t", heap(), rows=10, gb=0)
    dst = tinfo("t", heap(), rows=0, gb=0, secondary_indexes=1)
    r = plan_one(src, dst)
    assert r.outcome is Outcome.SECONDARY_INDEX_FOUND_ON_DESTINATION


def test_secondary_index_warns_when_flag_cleared():
    cfg = EngineConfig(stop_if=StopIf.TEMPORAL_TABLE)
    src = tinfo("t", heap(), rows=10, gb=0)
    dst = tinfo("t", heap(), rows=0, gb=0, secondary_indexes=1)
    r = plan_one(src, dst, cfg)
    assert r.outcome is Outcome.SUCCESS


def test_temporal_table_stops_by_default():
    src = tinfo("t", heap(), rows=10, gb=0)
    dst = tinfo(
        "t", heap(), rows=0, gb=0, table_type=TableType.SYSTEM_VERSIONED_TEMPORAL
    )
    r = plan_one(src, dst)
    assert r.outcome is Outcome.DESTINATION_IS_TEMPORAL_TABLE


def test_missing_tables():
    src = tinfo("t", heap(), rows=10, gb=0)
    missing = TableInfo(name="t", exists=False)
    assert (
        plan_one(missing, src).outcome is Outcome.SOURCE_TABLE_DOES_NOT_EXIST
    )
    assert (
        plan_one(src, missing).outcome is Outcome.DESTINATION_TABLE_DOES_NOT_EXIST
    )


# --- partition-count heuristic (reference: client/TableAnalyzer.cs:246-270) -


@pytest.mark.parametrize(
    "rows,gb,expected",
    [
        (LINEITEM_ROWS, 8, 9),  # one per GB, forced odd
        (LINEITEM_ROWS, 1, 3),  # clamp-min 3
        (2_000_000, 0, 3),  # rows/(10*batch)=2 -> clamp 3
        (9_000_000, 0, 9),  # rows/(10*batch)=9
        (LINEITEM_ROWS, 100, 21),  # clamp-max 3*tasks=21
    ],
)
def test_logical_partition_count_auto(rows, gb, expected):
    assert logical_partition_count(EngineConfig(), rows, gb) == expected


def test_logical_partition_buckets_cover_everything():
    src = tinfo("t", heap())
    dst = tinfo("t", heap(), rows=0, gb=0)
    tasks = plan_one(src, dst).tasks
    n = tasks[0].n_partitions
    assert sorted(t.partition_number for t in tasks) == list(range(1, n + 1))
