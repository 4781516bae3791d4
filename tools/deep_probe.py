"""Deep scale probe: run documents-only operators at 16x and 32x
corpus inflation (content-disjoint copies via tools/winnow_tail_probe's
Caesar-shift + reverse construction) and record the 16x->32x wall-time
exponent — evidence that the 8x SCALE.md ratios keep flattening rather
than turning super-linear as data doubles twice more.

Only operators whose inputs are entirely the `documents` table are
eligible (the inflation writes documents.parquet alone). Run alone on
an idle machine: python tools/deep_probe.py [names...]
Appends/replaces a `## Deep probes` section in SCALE.md (preserved by
scale_probe's manual-section rule).
"""

from __future__ import annotations

import math
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from winnow_tail_probe import inflate_documents, time_one  # noqa: E402

SCALES = (16, 32)
DEFAULT = [
    "q119_crossdoc_repeated_spans",
    "q113_cluster_size_histogram",
    "q107_minhash_estimate_quality",
    "q128_prefix_filter_join",
]


def main() -> None:
    import os

    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")

    spark = get_spark(
        app_name="deep-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    la1 = os.getloadavg()[0]
    results: dict[tuple[str, int], float] = {}
    tmp = tempfile.mkdtemp(prefix="sbc_deep_probe_")
    try:
        for n in SCALES:
            d = f"{tmp}/x{n}"
            inflate_documents(spark, base, d, n, "disjoint")
            for q in names:
                fn = REGISTRY[q].fn
                time_one(spark, fn, d)  # warm
                t = time_one(spark, fn, d)
                results[(q, n)] = t
                print(f"{q} {n}x: {t:.2f}s", flush=True)
            shutil.rmtree(d, ignore_errors=True)
        lines = [
            "",
            "## Deep probes (documents-only operators at 16x/32x)",
            "",
            f"`tools/deep_probe.py`, loadavg {la1:.2f} at start."
            " Content-disjoint inflation (winnow_tail_probe"
            " construction); exponent = log2(t32/t16), 1.0 = linear.",
            "",
            "| operator | t(16x) s | t(32x) s | exponent |",
            "|---|---|---|---|",
        ]
        for q in names:
            t16, t32 = results[(q, 16)], results[(q, 32)]
            lines.append(
                f"| {q} | {t16:.2f} | {t32:.2f} |"
                f" {math.log2(t32 / t16):.2f} |"
            )
        note = "\n".join(lines) + "\n"
        scale = REPO / "SCALE.md"
        text = scale.read_text()
        marker = "## Deep probes"
        if marker in text:
            # Replace the section IN PLACE so repeated runs don't
            # reorder SCALE.md's manual sections (winnow_tail_probe
            # keeps its own position the same way).
            head, rest = text.split(marker, 1)
            nxt = rest.find("\n## ")
            tail = rest[nxt + 1:] if nxt != -1 else ""
            text = head.rstrip() + "\n" + note + "\n" + tail
            scale.write_text(text.rstrip() + "\n")
        else:
            scale.write_text(text.rstrip() + "\n" + note)
        print(note)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
