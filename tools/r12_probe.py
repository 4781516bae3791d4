"""Round-12 verdict items 5 and 6: deep-probe the two unprobed round-11
registrations at 16x/32x in BOTH corpus modes (q187 composes two pair
generators, q191 had the table's highest 8x ratio), and take an idle
best-of-3 for q164 to rule out a bimodal plan (it read ~4x the sweep
median in two consecutive loaded driver runs while its probes are
clean). Splices a manual section into SCALE.md IN PLACE (never
truncates below its marker — the round-11 winnow_tail_probe lesson).
Run from the repo root on an IDLE machine: python tools/r12_probe.py
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from staged_probe import _split_section  # noqa: E402
from winnow_tail_probe import inflate_documents, time_one  # noqa: E402

QUERIES = ("q187_lexical_detector_overlap", "q191_winnow_posting_histogram")
SCALES = (16, 32)
_MARKER = "## Round-12 probes"


def main() -> None:
    from smartbulkcopy_spark.queries import REGISTRY, release_caches
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(
        app_name="r12-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    la = os.getloadavg()
    base = "/root/testdata/sf0.1"

    # q164 best-of-3 first, on the coolest machine state.
    q164 = REGISTRY["q164_winnowing_overlap"].fn
    time_one(spark, q164, base)  # warm
    release_caches()
    runs = []
    for _ in range(3):
        runs.append(time_one(spark, q164, base))
        release_caches()
    print(f"q164 best-of-3: {[f'{t:.2f}' for t in runs]}", flush=True)

    results: dict[tuple[str, str, int], float] = {}
    tmp = tempfile.mkdtemp(prefix="sbc_r12_probe_")
    try:
        for mode in ("disjoint", "verbatim"):
            for n in SCALES:
                d = f"{tmp}/{mode}_{n}"
                inflate_documents(spark, base, d, n, mode)
                for q in QUERIES:
                    fn = REGISTRY[q].fn
                    time_one(spark, fn, d)  # warm
                    release_caches()
                    results[(q, mode, n)] = time_one(spark, fn, d)
                    release_caches()
                    print(
                        f"{q} {mode} {n}x:"
                        f" {results[(q, mode, n)]:.2f}s",
                        flush=True,
                    )
                shutil.rmtree(d, ignore_errors=True)
        rows = [
            f"| {q} | {mode} | {results[(q, mode, 16)]:.2f} |"
            f" {results[(q, mode, 32)]:.2f} |"
            f" {math.log2(results[(q, mode, 32)] / results[(q, mode, 16)]):.2f} |"
            for q in QUERIES
            for mode in ("disjoint", "verbatim")
        ]
        r164 = ", ".join(f"{t:.2f}" for t in runs)
        note = (
            "\n".join(
                [
                    _MARKER,
                    "",
                    f"`tools/r12_probe.py`, loadavg {la[0]:.2f}/{la[1]:.2f}"
                    " at start. Same inflation and exponent conventions"
                    " as the winnowing tail probe; q164 best-of-3 runs"
                    " at plain sf0.1 (the bimodal-plan check, verdict"
                    " item 6):",
                    "",
                    f"q164 idle best-of-3: {r164} s.",
                    "",
                    "| query | mode | t(16x) s | t(32x) s | exponent |",
                    "|---|---|---|---|---|",
                    *rows,
                ]
            )
            + "\n"
        )
        scale = REPO / "SCALE.md"
        text = scale.read_text()
        if _MARKER in text:
            head, _sect, rest = _split_section(text, _MARKER)
            text = head + note + rest
        else:
            text = text.rstrip() + "\n\n" + note
        scale.write_text(text.rstrip() + "\n")
        print(note)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
