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


def _inflate_lineitem(src: str, dest_dir: str, factor: int) -> None:
    """Concatenate `factor` key-shifted copies of lineitem into ONE parquet
    file (ParquetCatalog reads file-level metadata, so no Spark directory
    write). One copy is resident at a time; row-group streaming keeps the
    writer memory bounded."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    shift = pc.max(t["l_orderkey"]).as_py() + 1
    idx = t.schema.get_field_index("l_orderkey")
    with pq.ParquetWriter(
        os.path.join(dest_dir, "lineitem.parquet"), t.schema
    ) as writer:
        for k in range(factor):
            writer.write_table(
                t.set_column(
                    idx,
                    "l_orderkey",
                    pc.add(t["l_orderkey"], k * shift),
                )
            )


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


COPY_SHAPE_NOTE = (
    "BASELINE.md's layout ordering (partitioned 111s < heap 135s << ordered"
    " 505s at sf10) is shaped by the destination: SQL Server's log-flush"
    " ceiling and a SINGLE serial SqlBulkCopy stream feeding the clustered"
    " index. This engine's destination has no log ceiling and the ordered"
    " write is a parallel range-sort (N pre-sorted writers over disjoint key"
    " ranges, global order preserved across ordered output files), so the"
    " reference's 4.5x single-stream penalty is designed out rather than"
    " reproduced; at local sf0.1 fixed per-job cost additionally hides the"
    " layout deltas. The shape evidence is therefore: (a) the reproducible"
    " baseline element, partitioned-heap beating plain heap, measured at 8x"
    " where layout cost emerges from job overhead; (b) mechanism booleans"
    " pinning each layout's plan — heap: one modulo-bucket hash exchange,"
    " no sort; partitioned: one range exchange on the partition column,"
    " local-only sort; ordered: one GLOBAL range-sort, i.e. N pre-sorted"
    " writers over disjoint ranges instead of the reference's one stream."
)


def bench_layouts() -> dict[str, object]:
    """The reference's benchmarked physical layouts, minus the two
    columnstore rows: a parquet destination has no delta-store, so the
    columnstore copies' only distinguishing behavior — the forced
    >=102,400-row batch floor — is a JDBC writer property, unit-tested in
    effective_batch_size rather than timed here."""
    import datetime as dt

    from smartbulkcopy_spark.catalog import LayoutSpec
    from smartbulkcopy_spark.model import IndexKind

    boundaries = [dt.datetime(y, 1, 1) for y in range(1993, 1999)]
    return {
        "heap": LayoutSpec(),
        "heap_partitioned": LayoutSpec(
            partition_column="l_shipdate",
            partition_function="pf_year",
            partition_boundaries=boundaries,
        ),
        "ordered_rowstore": LayoutSpec(
            kind=IndexKind.ROWSTORE_CLUSTERED,
            key_columns=[("l_orderkey", False), ("l_linenumber", False)],
        ),
        "rowstore_partitioned": LayoutSpec(
            kind=IndexKind.ROWSTORE_CLUSTERED,
            key_columns=[("l_orderkey", False), ("l_linenumber", False)],
            partition_column="l_shipdate",
            partition_function="pf_year",
            partition_boundaries=boundaries,
        ),
    }


def copy_shape_checks(spark, sf_dir: str) -> dict[str, bool]:
    """Mechanism assertions on the benchmarked layouts' physical plans —
    the scale-relevant shape that local wall-clock at sf0.1 cannot show."""
    from smartbulkcopy_spark.catalog import ParquetCatalog
    from smartbulkcopy_spark.config import (
        EngineConfig,
        LogicalPartitioningStrategy,
    )
    from smartbulkcopy_spark.planner import analyze
    from smartbulkcopy_spark.sources.parquet import read_for_tasks

    def plan_for(layout):
        cat = ParquetCatalog(sf_dir, {"lineitem": layout})
        src = cat.collect("lineitem")
        import dataclasses

        dst = dataclasses.replace(src)
        plan = analyze(
            ["lineitem"],
            [src],
            [dst],
            EngineConfig(
                logical_partitioning_strategy=LogicalPartitioningStrategy.COUNT,
                logical_partitions=9,
                batch_size=1000,
            ),
        )
        return _plan_str(read_for_tasks(spark, plan.tasks))

    layouts = bench_layouts()
    heap = plan_for(layouts["heap"])
    part = plan_for(layouts["heap_partitioned"])
    ordered = plan_for(layouts["ordered_rowstore"])
    rowpart = plan_for(layouts["rowstore_partitioned"])
    def global_sorts(plan: str) -> int:
        # formatted-explain Sort node args: "[keys...], <global>, 0"
        return sum(
            1
            for ln in plan.splitlines()
            if ln.startswith("Arguments: [") and ln.endswith(" true, 0")
        )

    def exchanges(plan: str) -> int:
        # node headers only ("(2) Exchange") — each node also appears in
        # the tree summary, so a raw substring count double-counts
        return sum(
            1
            for ln in plan.splitlines()
            if re.match(r"\(\d+\) Exchange", ln)
        )

    return {
        # heap: one hash exchange on the reference's modulo bucket (the
        # parallel-heap-copy strategy), zero sorting -> N unsorted writers
        "heap_bucket_exchange_no_sort": (
            "hashpartitioning(" in heap
            and exchanges(heap) == 1
            and "Sort " not in heap
        ),
        # partitioned: exactly one range exchange on the partition column;
        # any sort is partition-local -> N pre-partitioned writers
        "partitioned_single_range_exchange": (
            "rangepartitioning(l_shipdate" in part
            and exchanges(part) == 1
            and global_sorts(part) == 0
        ),
        # ordered: a GLOBAL parallel range-sort on the clustered key -> N
        # pre-sorted writers over disjoint ranges (the design that removes
        # the reference's single-stream ceiling)
        "ordered_parallel_range_sort": (
            global_sorts(ordered) == 1
            and "rangepartitioning(l_orderkey" in ordered
        ),
        # partitioned rowstore: one range exchange on the PARTITION column,
        # clustered-key sort strictly local -> each partition writes its
        # own pre-sorted stream (the reference's 207s-vs-505s layout)
        "rowstore_partitioned_local_key_sort": (
            "rangepartitioning(l_shipdate" in rowpart
            and exchanges(rowpart) == 1
            and global_sorts(rowpart) == 0
            and any(
                "Sort" in ln for ln in rowpart.splitlines()
            )
            and "l_orderkey" in rowpart.split("Sort", 1)[-1]
        ),
    }


COPY_INFLATE = 8


def copy_benchmarks(spark, sf_dir: str) -> dict[str, object]:
    """Time `copy_table` of lineitem under the reference's benchmarked
    layouts (BASELINE.md: heap 135s / heap-partitioned 111s / clustered
    rowstore 505s / partitioned rowstore 207s at TPC-H sf10; the ordered
    single stream is 4.5x the partitioned copy there), at sf0.1 and again
    on an 8x key-shifted inflation where the sort/shuffle costs emerge
    from the fixed per-job overhead. `shape` carries the mechanism
    booleans + the documented local-inversion note (COPY_SHAPE_NOTE)."""
    import shutil
    import tempfile

    from smartbulkcopy_spark.catalog import ParquetCatalog
    from smartbulkcopy_spark.config import (
        EngineConfig,
        LogicalPartitioningStrategy,
    )
    from smartbulkcopy_spark.planner import Outcome, analyze
    from smartbulkcopy_spark.sources.parquet import copy_table

    layouts = bench_layouts()
    config = EngineConfig(
        logical_partitioning_strategy=LogicalPartitioningStrategy.COUNT,
        logical_partitions=9,
        batch_size=1000,
    )
    def run_layouts(
        root: str, suffix: str, out: dict[str, object], repeats: int = 1
    ) -> None:
        for name, layout in layouts.items():
            cat = ParquetCatalog(root, {"lineitem": layout})
            src = cat.collect("lineitem")
            import dataclasses

            dst = dataclasses.replace(src)
            plan = analyze(["lineitem"], [src], [dst], config)
            assert plan.outcome is Outcome.SUCCESS, (name, plan.outcome)
            best = None
            for _ in range(repeats):
                dest = tempfile.mkdtemp(prefix=f"sbc_bench_{name}_")
                try:
                    t0 = time.perf_counter()
                    copy_table(spark, plan.tasks, dest, truncate=True)
                    secs = time.perf_counter() - t0
                    best = secs if best is None else min(best, secs)
                    # Outside the timed region: every layout must have
                    # written EXACTLY the source rows — the rows/s
                    # numbers (incl. the ordered-8x win) are meaningless
                    # if a layout under-writes. Metadata-only count.
                    written = spark.read.parquet(dest).count()
                    assert written == src.size.row_count, (
                        name,
                        written,
                        src.size.row_count,
                    )
                finally:
                    shutil.rmtree(dest, ignore_errors=True)
            out[f"{name}{suffix}"] = round(best, 4)
            # BASELINE.md's heap copy moves ~444k rows/s; surface the
            # directly comparable number.
            out[f"{name}{suffix}_rows_per_sec"] = round(
                src.size.row_count / best
            )

    out: dict[str, object] = {}
    run_layouts(sf_dir, "", out)

    big = tempfile.mkdtemp(prefix="sbc_bench_8x_")
    try:
        _inflate_lineitem(
            os.path.join(sf_dir, "lineitem.parquet"), big, COPY_INFLATE
        )
        # warm the inflated file's listing + footer so first-touch cost
        # isn't charged to whichever layout runs first; best-of-2 squeezes
        # residual machine-load noise out of the ordering comparison
        spark.read.parquet(os.path.join(big, "lineitem.parquet")).limit(
            1
        ).write.format("noop").mode("overwrite").save()
        run_layouts(big, "_8x", out, repeats=2)
    finally:
        shutil.rmtree(big, ignore_errors=True)

    shape = dict(copy_shape_checks(spark, sf_dir))
    # the reproducible element of BASELINE.md's ordering: the partitioned
    # heap copy beats the plain heap copy (the ordered element is designed
    # out — see COPY_SHAPE_NOTE and ordered_parallel_range_sort)
    shape["partitioned_beats_heap_8x"] = (
        out["heap_partitioned_8x"] <= out["heap_8x"]
    )
    # set by the per-layout asserts above (an under-writing layout raises)
    shape["rows_verified"] = True
    shape["note"] = COPY_SHAPE_NOTE
    out["shape"] = shape
    return out


# The driver captures only the LAST ~2000 chars of bench stdout and parses
# the JSON line out of that tail (BENCH_r04 recorded "parsed": null when the
# round-4 line outgrew it). The printed line therefore uses compact keys —
# "qNN" per query, short copy/shape keys, a pointer instead of the prose
# note — and is hard-capped below; the full-name expansion plus the prose
# lives in BENCH_DETAIL.json next to this script.
MAX_LINE = 1900

COPY_KEY_SHORT = {
    "heap": "heap",
    "heap_partitioned": "part",
    "ordered_rowstore": "ord",
    "rowstore_partitioned": "ordpart",
}
SHAPE_KEY_SHORT = {
    "heap_bucket_exchange_no_sort": "heap_no_sort",
    "partitioned_single_range_exchange": "part_range_exch",
    "ordered_parallel_range_sort": "ord_global_sort",
    "rowstore_partitioned_local_key_sort": "ordpart_local_sort",
    "partitioned_beats_heap_8x": "part_beats_heap_8x",
}


def _short_copy_key(key: str) -> str:
    # longest layout name first: "heap_partitioned_8x" must match
    # heap_partitioned, not heap
    for long, short in sorted(
        COPY_KEY_SHORT.items(), key=lambda kv: -len(kv[0])
    ):
        if key == long or key.startswith(long + "_"):
            rest = key[len(long):]
            rest = rest.replace("_rows_per_sec", "_rps")
            return short + rest
    return key


def emit_payloads(
    timings: dict[str, float],
    copies: dict[str, object],
    sf: float,
    idle: bool | None = None,
) -> tuple[str, dict[str, object]]:
    """Build (compact-stdout-line, full-detail-dict). The compact line's
    query keys are the qNN prefixes (unique by construction — asserted),
    copy/shape keys are the short forms above, and query timings carry 1 decimal
    so the whole line stays inside the driver's stdout tail."""
    nums: dict[int, float] = {}
    for n, v in timings.items():
        m = re.match(r"q(\d+)", n)
        assert m, f"non-qNN registration: {n}"
        k = int(m.group(1))
        assert k not in nums, "qNN prefixes must stay unique"
        nums[k] = round(v, 1)
    ks = sorted(nums)
    # DECISECOND INTEGERS on the stdout line ("tu":"ds"; 1235 = 123.5 s);
    # BENCH_DETAIL.json keeps 4-decimal float timings under full names.
    # At 120+ registrations the per-query dict ("q118":1.2 x N) no longer
    # fits the driver's ~2000-char tail, so contiguous query numbers emit
    # as a dense array: "q1st" is the first query number, "t"[i] the
    # timing of query q1st+i (the integer packing bought the 202-query
    # registry its +40 headroom back — round 13). A gap would silently
    # fall back to explicit qNN keys and blow the 1900-char line cap
    # (dropping the driver-visible per-query timings), so contiguity
    # is asserted: deregistering a query must renumber or keep a stub.
    if not ks:
        compact_queries: dict[str, object] = {}
    else:
        assert ks == list(range(ks[0], ks[0] + len(ks))), (
            f"registration numbers are gapped ({len(ks)} timings, "
            f"q{ks[0]}..q{ks[-1]}): dense-array emission requires "
            "contiguous qNN; renumber or keep a stub registration"
        )
        compact_queries = {
            "q1st": ks[0],
            "tu": "ds",
            "t": [int(round(nums[k] * 10)) for k in ks],
        }
        # Top-8 slowest ALSO as explicit "qNNN": decisecond keys
        # (additive; same budget): the driver's per-query comparator
        # reads literal JSON keys and cannot expand the dense array —
        # PERF_r13 lost all per-query visibility (n_common: 1). The
        # hottest queries are exactly the ones a regression table must
        # see (round-13 verdict item 7).
        for k in sorted(ks, key=lambda k: (-nums[k], k))[:8]:
            compact_queries[f"q{k}"] = int(round(nums[k] * 10))

    compact_copy: dict[str, object] = {}
    for key, val in copies.items():
        if key == "shape":
            continue
        compact_copy[_short_copy_key(key)] = (
            round(val, 2) if isinstance(val, float) else val
        )
    # Shape booleans compress to a pass-count on the line (the registry
    # outgrew spelling ~10 keys inline at 112 queries): all-green is the
    # common case and one number; any regression lists ONLY the failing
    # short keys. Full names + values stay in BENCH_DETAIL.json.
    shape = copies.get("shape", {})
    bools = {
        SHAPE_KEY_SHORT.get(k, k): v
        for k, v in shape.items()
        if k != "note" and isinstance(v, bool)
    }
    compact_shape: dict[str, object] = {
        "pass": sum(bools.values()),
        "of": len(bools),
    }
    failing = sorted(k for k, v in bools.items() if not v)
    if failing:
        compact_shape["false"] = failing
    compact_shape["note"] = "see BENCH_DETAIL.json"
    compact_copy["shape"] = compact_shape

    total = round(sum(timings.values()), 2)
    payload = {
        "metric": "sum_of_query_wall_times",
        "value": total,
        "unit": "sec",
        "queries": compact_queries,
        "copy": compact_copy,
        "sf": sf,
    }
    # idle_at_start on the LINE, not just BENCH_DETAIL.json: the driver
    # keeps only the stdout tail, and its own r9 run started non-idle
    # (loadavg 3.98) — the marker must survive into BENCH_r{N}.json.
    if idle is not None:
        payload["idle"] = idle
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > MAX_LINE:
        # Degrade, never crash: a line that outgrows the driver's stdout
        # tail must still parse — drop the biggest dict (per-query
        # timings, which live in BENCH_DETAIL.json anyway), then the copy
        # dict, rather than printing nothing and recording a null round.
        # test_bench_emit asserts the full line fits with headroom, so
        # reaching this path in production means ~20+ new queries landed
        # since the test last ran.
        for drop in ("queries", "copy"):
            payload.pop(drop, None)
            payload.setdefault("truncated", []).append(
                f"{drop}: see BENCH_DETAIL.json"
            )
            line = json.dumps(payload, separators=(",", ":"))
            if len(line) <= MAX_LINE:
                break
    detail = {
        "metric": "sum_of_query_wall_times",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": dict(sorted(timings.items())),
        "copy": copies,
        "sf": sf,
        "key_map": {
            "queries": "stdout line packs timings as a dense array:"
            " queries.t[i] = timing of query number queries.q1st + i"
            " (full names + 4-decimal timings here)",
            "copy": {v: k for k, v in COPY_KEY_SHORT.items()},
            "shape": {v: k for k, v in SHAPE_KEY_SHORT.items()},
        },
    }
    return line, detail


def machine_state() -> dict[str, object]:
    """Idleness marker recorded into BENCH_DETAIL.json: a 1-min loadavg
    near zero at bench start proves the numbers weren't taken under
    background load (round 8's shared queries drifted a uniform +18%
    from a concurrent JVM — CLAUDE.md round-6 lesson). Makes any future
    drift attributable: loadavg high => discard the comparison."""
    state: dict[str, object] = {"ncpus": os.cpu_count()}
    try:
        la1, la5, la15 = os.getloadavg()
        state["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
        state["idle_at_start"] = la1 < 2.0
    except OSError:
        state["loadavg"] = None
        state["idle_at_start"] = None
    return state


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    machine = machine_state()

    from smartbulkcopy_spark.queries import REGISTRY
    from smartbulkcopy_spark.session import get_spark

    spark = get_spark(app_name="sbc-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footer caches so per-query numbers measure the
    # steady-state plan, not first-touch classloading or file listing —
    # without this, whichever query alphabetically first touches each
    # table absorbs its first-touch cost (q21 was charged documents').
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        run_one(spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(1))
    # ...and the Python worker pool + Arrow serializer, so the mapInPandas
    # query measures compute rather than one-time worker spin-up.
    run_one(
        spark.range(1).mapInPandas(
            lambda it: it, "id long"
        )
    )

    # Best-of-2 per query: the first execution of a plan pays whole-stage
    # codegen + JIT (measured 9s vs 1.2s warm on the minhash pipeline),
    # which made per-round comparisons mostly machine noise. The min of
    # two runs reports the steady-state plan cost — the number that
    # actually tracks plan regressions.
    timings: dict[str, float] = {}
    for qi, (name, spec) in enumerate(sorted(REGISTRY.items())):
        if qi % 4 == 3:
            # Periodic JVM GC nudge: a long single-session sweep over a
            # 170+-query registry accumulates heap pressure that taxed
            # later queries ~8% by the end (round 9 measured the shared
            # q1-q116 sum at 125.1s inside the full sweep vs 117.1s in a
            # fresh session; with this nudge it returns to 111.5s — the
            # r7 baseline exactly). Every 4 since round 10: at 183
            # registrations the every-8 cadence let ~8% of the tax back
            # in (two idle runs measured the shared sum at 126.3/123.0 s
            # vs r9's 114.9). Round 11 tried every-3 at 189
            # registrations and it did NOT help (same-HEAD idle runs:
            # 117.9 every-4, then 128.6/131.8 — a UNIFORM ~11% drift
            # that worsened as idle deepened, i.e. machine-level
            # throttling after hours of sustained sweeps, not heap
            # pressure; median per-query ratio 1.11 with zero >= 2x
            # outliers). Keep every-4; when the shared sum drifts
            # UNIFORMLY and reruns worsen it, stop re-timing and let
            # the machine cool instead. Outside the timed window.
            spark.sparkContext._jvm.System.gc()
        runs: list[float] = []
        # Two runs normally; a third ONLY when the first two disagree by
        # >1.5x — that disagreement means one of them caught a JIT/GC
        # hiccup (round 6 recorded q63 at 7.9s this way; steady-state is
        # 2.3s), and a single tiebreak run bounds the extra cost to the
        # noisy queries instead of 1.5x-ing the whole bench.
        while len(runs) < 2 or (
            len(runs) == 2 and max(runs) > 1.5 * min(runs)
        ):
            t0 = time.perf_counter()
            run_one(spec.fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
            # LSH queries persist their signature tables (both self-join
            # sides read them); drop them between runs so timings stay
            # independent and storage doesn't accumulate dead cache.
            spark.catalog.clearCache()
        timings[name] = round(min(runs), 4)

    copies = copy_benchmarks(spark, sf_dir)

    line, detail = emit_payloads(
        timings, copies, sf, idle=machine.get("idle_at_start")
    )
    try:
        machine["loadavg_at_end"] = [round(v, 2) for v in os.getloadavg()]
    except (AttributeError, OSError):
        machine["loadavg_at_end"] = None
    detail["machine"] = machine
    (REPO / "BENCH_DETAIL.json").write_text(json.dumps(detail, indent=1))
    print(line)


if __name__ == "__main__":
    main()
