"""8x pre-probe for the round-14 STAGED builders (not yet registered):
time each at sf0.1 and on the content-disjoint 8x inflation, and splice
a manual section into SCALE.md — so registration day inherits measured
ratios instead of promising them. Splices IN PLACE (never truncates
below its marker: the round-11 winnow_tail_probe lesson).
Run from the repo root on an IDLE machine: python tools/staged_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from deep_probe import inflate_embeddings  # noqa: E402
from winnow_tail_probe import inflate_documents, time_one  # noqa: E402

INFLATE = 8

_MARKER = "## Staged builders"
_TAIL_MARK = "\n16x/32x tail ("


def _split_section(text: str, marker: str):
    """(head, section, rest) of SCALE.md at `marker`: section runs to
    just before the next '\n## ' heading (rest keeps that newline).
    ONE parser for every splice in this tool — the round-11 lesson was
    a probe variant that truncated every manual section below its own
    marker, and four hand-rolled copies of this logic is how that bug
    comes back."""
    head, after = text.split(marker, 1)
    nxt = after.find("\n## ")
    if nxt == -1:
        return head, marker + after, ""
    return head, marker + after[:nxt], after[nxt:]

# builder name -> (input tables, fn(spark, d) -> DataFrame)


def _builders():
    # round-14 staged queue (the round-13 pair registered as q200/q201
    # and left this table; their pre-registration dual-mode exponents
    # — dsir -0.25/-0.24, repetition 0.43/-0.13 — are recorded in the
    # section prose below since the main table now carries their qNN
    # rows)
    from smartbulkcopy_spark.pipeline.ensemble import (
        contamination_ensemble_matrix,
    )
    from smartbulkcopy_spark.pipeline.multimodal import (
        cross_modal_coverage_audit,
        image_contamination_screen,
    )

    return {
        "image_contamination_screen": (
            ("documents",),
            image_contamination_screen,
        ),
        "cross_modal_coverage_audit": (
            ("documents", "embeddings"),
            cross_modal_coverage_audit,
        ),
        "contamination_ensemble_matrix": (
            ("documents",),
            contamination_ensemble_matrix,
        ),
    }


def tail() -> None:
    """--tail: the document-side staged builders at 16x/32x in both
    corpus modes (the q180 precedent — measure exponents BEFORE
    registration). `verbatim` is the axis that matters for the image
    screen: verbatim copies share their ahash, so the eval rep index
    COLLAPSES while the train side grows — the probe proves the banded
    join stays linear, the failure class member-count caps hid.
    cross_modal_coverage_audit is documents+embeddings and has no
    pair-generating stage (id-keyed LEFT joins only), so only the 8x
    main probe applies to it. Appends a paragraph under the
    staged-builders section."""
    import math

    from smartbulkcopy_spark.queries import release_caches
    from smartbulkcopy_spark.session import get_spark

    # select from the ONE builder registry so both tables measure the
    # same callables (a rename or wrapper change cannot desynchronize)
    builders = _builders()
    probes = [
        (n, builders[n][1])
        for n in (
            "image_contamination_screen",
            "contamination_ensemble_matrix",
        )
    ]
    spark = get_spark(
        app_name="staged-tail-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    la1 = os.getloadavg()[0]
    results: dict[tuple[str, str, int], float] = {}
    tmp = tempfile.mkdtemp(prefix="sbc_staged_tail_")
    try:
        for mode in ("disjoint", "verbatim"):
            for n in (16, 32):
                d = f"{tmp}/{mode}_{n}"
                inflate_documents(spark, base, d, n, mode)
                for name, fn in probes:
                    time_one(spark, fn, d)  # warm
                    results[(name, mode, n)] = time_one(spark, fn, d)
                    release_caches()
                    print(
                        f"{name} {mode} {n}x:"
                        f" {results[(name, mode, n)]:.2f}s",
                        flush=True,
                    )
                shutil.rmtree(d, ignore_errors=True)
        rows = [
            f"| {name} | {mode} | {results[(name, mode, 16)]:.2f} |"
            f" {results[(name, mode, 32)]:.2f} |"
            f" {math.log2(results[(name, mode, 32)] / results[(name, mode, 16)]):.2f} |"
            for name, _fn in probes
            for mode in ("disjoint", "verbatim")
        ]
        note = "\n".join(
            [
                "",
                f"16x/32x tail (`--tail`, loadavg {la1:.2f} at start;"
                " same disjoint/verbatim inflation and exponent"
                " convention as the winnowing tail probe):",
                "",
                "| builder | mode | t(16x) s | t(32x) s | exponent |",
                "|---|---|---|---|---|",
                *rows,
            ]
        ) + "\n"
        scale = REPO / "SCALE.md"
        text = scale.read_text()
        if _MARKER not in text:
            raise SystemExit("run the main staged probe first")
        head, sect, rest = _split_section(text, _MARKER)
        cut = sect.find(_TAIL_MARK)  # idempotent: replace a prior block
        if cut != -1:
            sect = sect[:cut]
        text = head + sect.rstrip() + "\n" + note + rest
        scale.write_text(text.rstrip() + "\n")
        print(note)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from smartbulkcopy_spark.queries import release_caches
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(
        app_name="staged-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    la1 = os.getloadavg()[0]
    builders = _builders()
    results: dict[tuple[str, int], float] = {}
    tmp = tempfile.mkdtemp(prefix="sbc_staged_probe_")
    try:
        d8 = f"{tmp}/x{INFLATE}"
        need = {t for tabs, _ in builders.values() for t in tabs}
        if "documents" in need:
            inflate_documents(spark, base, d8, INFLATE, "disjoint")
        if "embeddings" in need:
            inflate_embeddings(spark, base, d8, INFLATE)
        for name, (_tabs, fn) in builders.items():
            for scale, d in ((1, base), (INFLATE, d8)):
                time_one(spark, fn, d)  # warm
                results[(name, scale)] = time_one(spark, fn, d)
                release_caches()
                print(
                    f"{name} {scale}x: {results[(name, scale)]:.2f}s",
                    flush=True,
                )
        lines = [
            "",
            "## Staged builders (round-14 queue, pre-registration)",
            "",
            f"`tools/staged_probe.py`, loadavg {la1:.2f} at start."
            " Same content-disjoint inflation and noop-write timing as"
            " the main table; these operators are builder-only until"
            " the round-14 window opens, so the ratios here are the"
            " registration gate, not a rotation artifact.",
            "",
            f"| builder | t(1x) s | t({INFLATE}x) s | ratio |",
            "|---|---|---|---|",
        ]
        for name in builders:
            t1 = results[(name, 1)]
            t8 = results[(name, INFLATE)]
            lines.append(
                f"| {name} | {t1:.2f} | {t8:.2f} | {t8 / t1:.1f}x |"
            )
        lines += [
            "",
            "Reading: both audits pay one mapInPandas ahash pass over",
            "the corpus (the dominant, linear term); the screen's",
            "banded train x eval-rep join and the coverage joins are",
            "id-and-two-longs narrow. Registration gate for the round-",
            "14 window. The round-13 queue's pre-registration dual-mode",
            "exponents (superseded here by their main-table qNN rows):",
            "dsir_importance_weights 16x->32x disjoint -0.25 / verbatim",
            "-0.24; repetition_removal_audit disjoint 0.43 / verbatim",
            "-0.13.",
        ]
        note = "\n".join(lines) + "\n"
        scale = REPO / "SCALE.md"
        text = scale.read_text()
        if _MARKER in text:
            head, sect, rest = _split_section(text, _MARKER)
            # a prior --tail block is kept ONLY if it measures the same
            # builder set (a requeue replaces the whole section — stale
            # tail rows under a new table misattribute the numbers)
            cut = sect.find(_TAIL_MARK)
            keep = ""
            if cut != -1 and any(
                name in sect[cut:] for name in builders
            ):
                keep = sect[cut:].rstrip() + "\n"
            text = head.rstrip() + "\n" + note + keep + rest
            scale.write_text(text.rstrip() + "\n")
        else:
            scale.write_text(text.rstrip() + "\n" + note)
        print(note)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if "--tail" in sys.argv:
        tail()
    else:
        main()
