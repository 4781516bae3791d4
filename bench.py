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

    timings: dict[str, float] = {}
    for name, spec in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        run_one(spec.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_of_query_wall_times",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
