"""Deep scale probe: run documents/embeddings operators at 16x and
32x corpus inflation (documents: tools/winnow_tail_probe's Caesar-shift
+ reverse construction; embeddings: per-copy cyclic component rotation,
the scale_probe.inflate convention) and record the 16x->32x wall-time
exponent — evidence that the 8x SCALE.md ratios keep flattening rather
than turning super-linear as data doubles twice more.

Eligible operators read only documents.parquet and/or
embeddings.parquet (the inflation writes those two). q93 follows
scale_probe's production configuration: the centroid count grows with
the inflation factor so inverted lists stay bounded. Run alone on an
idle machine: python tools/deep_probe.py [names...]
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

# Per-operator input tables the inflation must write — the ONE mapping
# both main() (which tables to inflate) and _probe_fn (which builders
# get scaled parameters) consult. A probe name absent here fails loudly
# BEFORE the expensive inflation instead of crashing mid-run against a
# directory missing its parquet input.
INPUTS: dict[str, tuple[str, ...]] = {
    "q119_crossdoc_repeated_spans": ("documents",),
    "q113_cluster_size_histogram": ("documents",),
    "q107_minhash_estimate_quality": ("documents",),
    "q128_prefix_filter_join": ("documents",),
    "q111_image_near_dup": ("documents",),
    "q180_exact_substring_verify": ("documents",),
    "q93_incremental_ann_ingest": ("embeddings",),
    "q183_ann_tree_assignment": ("embeddings",),
    "q188_tree_depth3_assignment": ("embeddings",),
}

DEFAULT = [
    "q119_crossdoc_repeated_spans",
    "q113_cluster_size_histogram",
    "q107_minhash_estimate_quality",
    "q128_prefix_filter_join",
    # round-9 verdict item 6: the two worst remaining 8x ratios without
    # a deep-probe exponent (q93 4.2x by-design centroid scaling, q111
    # 4.1x). A full default run replaces the SCALE.md section wholesale,
    # so keep every probed operator in DEFAULT.
    "q93_incremental_ann_ingest",
    "q111_image_near_dup",
    # the fix for q93's by-construction rows x K exponent: same scaled
    # K as the q93 probe, but BRANCH x log K per row
    "q183_ann_tree_assignment",
    # round-10 verdict item 4: the heaviest r10 operator (8x ratio 3.4x)
    # — its verify stage fans candidate pairs by side-A gram count
    "q180_exact_substring_verify",
]


def inflate_embeddings(spark, src_dir: str, out_dir: str, n: int) -> None:
    """n content-decorrelated embedding copies: cyclic component
    rotation per copy (k < 32 < EMBED_DIM so every copy's projection
    space differs), the scale_probe.inflate convention."""
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    n_vecs = emb.count()
    dim = len(emb.first()["embedding"])
    copies = []
    for k in range(n):
        rot = F.expr(
            f"concat(slice(embedding, {k % dim + 1}, {dim - k % dim}),"
            f" slice(embedding, 1, {k % dim}))"
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + k * n_vecs).alias("vec_id"),
                rot.alias("embedding"),
                "label",
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def _probe_fn(name: str, n: int):
    """q93 scales K with the inflation (bounded inverted lists — the
    scale_probe._probe_fns rule); everything else runs the registered
    builder unchanged."""
    from smartbulkcopy_spark.queries import REGISTRY

    if name == "q93_incremental_ann_ingest":
        from smartbulkcopy_spark.pipeline.similarity import (
            N_CENTROIDS,
            incremental_ann_ingest,
        )

        return lambda spark, d: incremental_ann_ingest(
            spark, d, k=N_CENTROIDS * n
        )
    if name == "q183_ann_tree_assignment":
        # same scaled K as the q93 probe (apples-to-apples): the tree
        # walk pays BRANCH x ceil(log4 K) per row where q93 pays K
        from smartbulkcopy_spark.pipeline.similarity import (
            N_CENTROIDS,
            tree_assignment,
        )

        return lambda spark, d: tree_assignment(
            spark, d, k=N_CENTROIDS * n
        )
    return REGISTRY[name].fn


def main() -> None:
    import os

    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    unmapped = [n for n in names if n not in INPUTS]
    if unmapped:
        raise SystemExit(
            f"no INPUTS entry (which tables must inflate?): {unmapped}"
        )

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
            need = {t for q in names for t in INPUTS[q]}
            if "documents" in need:
                inflate_documents(spark, base, d, n, "disjoint")
            if "embeddings" in need:
                inflate_embeddings(spark, base, d, n)
            for q in names:
                fn = _probe_fn(q, n)
                time_one(spark, fn, d)  # warm
                t = time_one(spark, fn, d)
                results[(q, n)] = t
                print(f"{q} {n}x: {t:.2f}s", flush=True)
            shutil.rmtree(d, ignore_errors=True)
        lines = [
            "",
            "## Deep probes (heavy-tail operators at 16x/32x)",
            "",
            f"`tools/deep_probe.py`, loadavg {la1:.2f} at start."
            " Content-disjoint inflation (winnow_tail_probe Caesar+"
            "reverse for documents, cyclic component rotation for"
            " embeddings; q93 scales K with the inflation);"
            " exponent = log2(t32/t16), 1.0 = linear.",
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
        lines += [
            "",
            "Reading: flat assignment (q93) costs rows x K and the",
            "probe grows K with the corpus (bounded inverted lists),",
            "so its asymptote is 2.0 even while amortizing fixed costs",
            "keeps the measured exponent lower at these scales. q183",
            "assigns the same scaled K through a 4-ary pivot tree at",
            "BRANCH x log K per row (row-local map-literal walk, zero",
            "joins) — the structural fix. Sub-second run-to-run noise",
            "moves the smaller operators' exponents by ~0.1-0.2 between",
            "rounds; compare trends, not single runs.",
        ]
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
