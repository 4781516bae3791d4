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


def copy_benchmarks(spark, sf_dir: str) -> dict[str, float]:
    """Time `copy_table` of lineitem under the reference's three headline
    layouts (BASELINE.md: heap 135s / heap-partitioned 111s / clustered
    rowstore 505s at TPC-H sf10; the ordered single stream is 4.5x the
    partitioned copy there).

    Two caveats when reading these numbers against the baseline shape:
    - at local sf0.1 the fixed per-job cost (~1.5s) dominates, so layout
      deltas are in the noise; the layout spread only opens up at scale;
    - the reference's ordered load is a SINGLE stream because SqlBulkCopy
      feeds a clustered index serially; our ordered write is a parallel
      range-sort (global order preserved across ordered output files), so
      the reference's 4.5x ordered-load penalty is designed out rather
      than reproduced."""
    import datetime as dt
    import shutil
    import tempfile

    from smartbulkcopy_spark.catalog import LayoutSpec, ParquetCatalog
    from smartbulkcopy_spark.config import (
        EngineConfig,
        LogicalPartitioningStrategy,
    )
    from smartbulkcopy_spark.model import IndexKind
    from smartbulkcopy_spark.planner import Outcome, analyze
    from smartbulkcopy_spark.sources.parquet import copy_table

    layouts = {
        "heap": LayoutSpec(),
        "heap_partitioned": LayoutSpec(
            partition_column="l_shipdate",
            partition_function="pf_year",
            partition_boundaries=[
                dt.datetime(y, 1, 1) for y in range(1993, 1999)
            ],
        ),
        "ordered_rowstore": LayoutSpec(
            kind=IndexKind.ROWSTORE_CLUSTERED,
            key_columns=[("l_orderkey", False), ("l_linenumber", False)],
        ),
    }
    config = EngineConfig(
        logical_partitioning_strategy=LogicalPartitioningStrategy.COUNT,
        logical_partitions=9,
        batch_size=1000,
    )
    out: dict[str, float] = {}
    for name, layout in layouts.items():
        cat = ParquetCatalog(sf_dir, {"lineitem": layout})
        src = cat.collect("lineitem")
        import dataclasses

        dst = dataclasses.replace(src)
        plan = analyze(["lineitem"], [src], [dst], config)
        assert plan.outcome is Outcome.SUCCESS, (name, plan.outcome)
        dest = tempfile.mkdtemp(prefix=f"sbc_bench_{name}_")
        try:
            t0 = time.perf_counter()
            copy_table(spark, plan.tasks, dest, truncate=True)
            secs = time.perf_counter() - t0
            out[name] = round(secs, 4)
            # BASELINE.md's heap copy moves ~444k rows/s; surface the
            # directly comparable number.
            out[f"{name}_rows_per_sec"] = round(src.size.row_count / secs)
        finally:
            shutil.rmtree(dest, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(app_name="sbc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer cache so per-query numbers measure the
    # steady-state plan, not first-touch classloading.
    run_one(spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1))
    # ...and the Python worker pool + Arrow serializer, so the mapInPandas
    # query measures compute rather than one-time worker spin-up.
    run_one(
        spark.range(1).mapInPandas(
            lambda it: it, "id long"
        )
    )

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        run_one(spec.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)
        # LSH queries persist their signature tables (both self-join sides
        # read them); drop them between queries so timings stay
        # independent and storage doesn't accumulate dead cache.
        spark.catalog.clearCache()

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
