"""One-off stage profile for soft_dedup_weights' 1.18 disjoint exponent
(round-12 task): time the chain's stages separately at 16x and 32x
content-disjoint inflation to locate the super-linear stage before
registration. Stages:
  pairs  — verified_pairs (minhash LSH -> candidate -> Jaccard verify)
  cc     — dedup_clusters (pairs + connected components + orderBy)
  full   — soft_dedup_weights (eager(cc) + sizes + corpus LEFT join +
           coin + global orderBy)
Run from the repo root on an IDLE machine:
  python tools/soft_dedup_stage_profile.py [scales...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from winnow_tail_probe import inflate_documents  # noqa: E402

SCALES = [int(a) for a in sys.argv[1:]] or [16, 32]


def main() -> None:
    import os

    from smartbulkcopy_spark import queries
    from smartbulkcopy_spark.pipeline.dedup import (
        dedup_clusters,
        soft_dedup_weights,
        verified_pairs,
    )
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(
        app_name="soft-dedup-stage-profile",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg())
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="sbc_soft_stage_")
    stages = {
        "pairs": lambda d: verified_pairs(spark, d),
        "cc": lambda d: dedup_clusters(spark, d),
        "full": lambda d: soft_dedup_weights(spark, d),
    }
    try:
        for n in SCALES:
            d = f"{tmp}/disjoint_{n}"
            inflate_documents(spark, base, d, n, "disjoint")
            for name, fn in stages.items():
                t0 = time.perf_counter()
                fn(d).write.format("noop").mode("overwrite").save()
                secs = time.perf_counter() - t0
                queries.release_caches()
                spark.catalog.clearCache()
                print(f"{n}x {name}: {secs:.2f}s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
