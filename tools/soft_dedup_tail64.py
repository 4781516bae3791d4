"""Round-12 task: resolve soft_dedup_weights' 1.18 disjoint exponent
(SCALE.md staged tail) before registration. Exact staged_probe --tail
protocol (inflate -> warm run -> timed run -> release) for this ONE
builder at 16x/32x/64x disjoint, so the 32x->64x exponent shows whether
the 16x->32x reading was real super-linearity or host drift.
Run from the repo root on an IDLE machine:
  python tools/soft_dedup_tail64.py [mode] [scales...]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from winnow_tail_probe import inflate_documents, time_one  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "disjoint"
SCALES = [int(a) for a in sys.argv[2:]] or [16, 32, 64]


def main() -> None:
    from smartbulkcopy_spark.pipeline.dedup import soft_dedup_weights
    from smartbulkcopy_spark.queries import release_caches
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(
        app_name="soft-dedup-tail64",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", os.getloadavg(), flush=True)
    base = "/root/testdata/sf0.1"
    tmp = tempfile.mkdtemp(prefix="sbc_soft_tail64_")
    times: dict[int, float] = {}
    try:
        for n in SCALES:
            d = f"{tmp}/{MODE}_{n}"
            inflate_documents(spark, base, d, n, MODE)
            time_one(spark, soft_dedup_weights, d)  # warm
            release_caches()
            times[n] = time_one(spark, soft_dedup_weights, d)
            release_caches()
            print(f"{MODE} {n}x: {times[n]:.2f}s", flush=True)
            shutil.rmtree(d, ignore_errors=True)
        for a, b in zip(SCALES, SCALES[1:]):
            print(
                f"exponent {a}x->{b}x:"
                f" {math.log2(times[b] / times[a]):.2f}",
                flush=True,
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
