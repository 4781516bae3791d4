"""Round-14 optimization harness: per-query isolated timing (noop sink,
warm + best-of-N — the bench.py methodology) and formatted-plan dumps
into plans/r13/<query>_<suffix>.txt for the judge's plan-claim checks.

Usage (repo root, idle machine):
    python tools/r14_opt.py --plans before q119_crossdoc_repeated_spans ...
    python tools/r14_opt.py --time 2 q119_crossdoc_repeated_spans ...
    python tools/r14_opt.py --time 2 --top 30        # the 30 slowest per
                                                     # BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PLANS_DIR = Path(os.environ.get("R14_PLANS_DIR", REPO / "plans" / "r14"))


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", metavar="SUFFIX", default=None)
    ap.add_argument("--time", type=int, default=0, metavar="N")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from smartbulkcopy_spark.queries import REGISTRY, release_caches
    from smartbulkcopy_spark.session import get_spark

    names = list(args.queries)
    if args.top:
        detail = json.loads((REPO / "BENCH_DETAIL.json").read_text())
        ranked = sorted(
            detail["queries"].items(), key=lambda kv: -kv[1]
        )
        names += [n for n, _ in ranked[: args.top] if n in REGISTRY]
    for n in names:
        assert n in REGISTRY, f"unknown query {n}"

    spark = get_spark(
        app_name="r14-opt",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg {os.getloadavg()}", flush=True)

    # same warm-up as bench.py: parquet footers + python worker pool
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(
            os.path.join(args.sf_dir, f"{t}.parquet")
        ).limit(1).write.format("noop").mode("overwrite").save()
    spark.range(1).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    if args.plans:
        PLANS_DIR.mkdir(parents=True, exist_ok=True)
        for n in names:
            df = REGISTRY[n].fn(spark, args.sf_dir)
            (PLANS_DIR / f"{n}_{args.plans}.txt").write_text(_plan_str(df))
            release_caches()
            spark.catalog.clearCache()
            print(f"plan dumped: {n}_{args.plans}.txt", flush=True)

    if args.time:
        out: dict[str, float] = {}
        for n in names:
            fn = REGISTRY[n].fn
            runs = []
            for i in range(args.time + 1):  # +1 warm run, discarded
                spark.sparkContext.setJobDescription(f"{n} run{i}")
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                secs = time.perf_counter() - t0
                release_caches()
                spark.catalog.clearCache()
                if i:
                    runs.append(secs)
            spark.sparkContext._jvm.System.gc()
            out[n] = min(runs)
            print(
                f"{n}: best {min(runs):.2f}s of "
                f"{[f'{r:.2f}' for r in runs]}",
                flush=True,
            )
        print(json.dumps(out))


if __name__ == "__main__":
    main()
