"""Isolated per-query timing probe with optional session-conf overrides.

Same methodology as bench.py (table/worker warm-up, best-of-2 with a
>1.5x tiebreak third run, clearCache between runs) so numbers are
comparable, but scoped to a named query subset and a conf override —
the tool behind alternating-PROCESS A/B comparisons (e.g. the round-14
cache-AQE flag study: run this with --conf ...=true / ...=false
alternately on an idle host and compare medians per query).

Usage:
    python tools/ab_conf_probe.py q105_curation_funnel,q107_... \
        [--conf spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false] \
        [--sf-dir /root/testdata/sf0.1] [--reps 1]

Prints ONE JSON line: {"conf": {...}, "queries": {name: sec}, "loadavg": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_one  # noqa: E402
from smartbulkcopy_spark.queries import REGISTRY  # noqa: E402
from smartbulkcopy_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated registered query names")
    ap.add_argument("--conf", action="append", default=[], metavar="K=V")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]
    for n in names:
        if n not in REGISTRY:
            ap.error(f"unknown query {n}")
    conf = dict(kv.split("=", 1) for kv in args.conf)

    spark = get_spark(app_name="sbc-ab-probe", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        run_one(
            spark.read.parquet(os.path.join(args.sf_dir, f"{t}.parquet")).limit(1)
        )
    run_one(spark.range(1).mapInPandas(lambda it: it, "id long"))

    out: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        runs: list[float] = []
        while len(runs) < 2 or (len(runs) == 2 and max(runs) > 1.5 * min(runs)):
            t0 = time.perf_counter()
            run_one(spec.fn(spark, args.sf_dir))
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(min(runs), 4)
    try:
        la = [round(v, 2) for v in os.getloadavg()]
    except OSError:
        la = None
    print(
        "ABPROBE "
        + json.dumps(
            {"conf": conf, "queries": out, "loadavg": la},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
