"""Every registered query with an oracle must hash-match DuckDB on the same
parquet (mirrors the driver's CORRECTNESS gate, SURVEY §2.10)."""

from __future__ import annotations

import pytest

from smartbulkcopy_spark.queries import REGISTRY

from .util import assert_matches_oracle

ORACLED = [name for name, spec in REGISTRY.items() if spec.oracle is not None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, duck, spec.oracle, name=name)


def test_registry_nonempty():
    assert len(REGISTRY) >= 19


def test_driver_emission_order():
    """The driver oracle-checks only the first ~50 queries() entries
    (SURVEY §2.12): the window must always contain the full §2.10
    contract (tier 1), every registered query must appear exactly once
    overall, and the rotation must emit least-recently-driver-green
    first so never-graded operators drain at 27 slots/round."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        TIER1,
        ordered_names,
    )

    names = ordered_names()
    assert sorted(names) == sorted(REGISTRY)
    window = set(names[: DRIVER_WINDOW])
    assert set(TIER1) <= window

    # Rotation invariant: after the pinned tier-1 block, last-green rounds
    # are non-decreasing (never-graded = round 0 sorts first).
    rounds = [LAST_GREEN.get(n, 0) for n in names[len(TIER1) :]]
    assert rounds == sorted(rounds)

    # Every never-graded query must be inside the next driver window while
    # capacity allows (backlog <= rotating slots).
    never = [n for n in names if n not in LAST_GREEN]
    capacity = DRIVER_WINDOW - len(TIER1)
    if len(never) <= capacity:
        assert set(never) <= window
    # The ledger only names registered queries (no typos / renames).
    assert set(LAST_GREEN) <= set(REGISTRY)

    import __spark_entry__ as e

    assert list(e.queries()) == names


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))


def test_json_int_is_integer_strict(spark):
    """Malformed/missing JSON values must classify as NULL, never cast
    through engine-specific rounding (DuckDB would round '1.5' to 2)."""
    import pyspark.sql.functions as F

    from smartbulkcopy_spark.queries import json_int

    df = spark.createDataFrame(
        [
            ('{"k": 5}',),
            ('{"k": -7}',),
            ('{"k": 1.5}',),
            ('{"k": "x"}',),
            ("{}",),
            (None,),
        ],
        "props string",
    )
    got = [
        r["k"] for r in df.select(json_int("props", "$.k").alias("k")).collect()
    ]
    assert got == [5, -7, None, None, None, None]


def test_round_closeout_discipline():
    """The recurring late-registration gap (rounds 5-7): a new
    registration is only DONE when it carries a QUEUED_SINCE seniority
    entry AND appears in the plan/scale tooling. Pin it: every
    registered query must be ledger-known (QUEUED_SINCE or LAST_GREEN),
    and every registration from round 7 on (batch >= 70) must have a
    dump_plans annotation and a scale_probe entry."""
    import importlib.util
    from pathlib import Path

    from smartbulkcopy_spark.queries import LAST_GREEN, QUEUED_SINCE

    def load(name):
        p = Path(__file__).parents[1] / "tools" / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    ANNOTATED = load("dump_plans").ANNOTATED
    OPS = load("scale_probe").PROBES

    unknown = [
        n
        for n in REGISTRY
        if n not in QUEUED_SINCE and n not in LAST_GREEN
    ]
    assert not unknown, f"registrations missing ledger entries: {unknown}"
    assert set(QUEUED_SINCE) <= set(REGISTRY)

    recent = [n for n, b in QUEUED_SINCE.items() if b >= 70]
    missing_plan = [n for n in recent if n not in ANNOTATED]
    missing_scale = [n for n in recent if n not in OPS]
    assert not missing_plan, f"no dump_plans annotation: {missing_plan}"
    assert not missing_scale, f"no scale_probe entry: {missing_scale}"

    # File-backed artifact check (round-8 verdict item 8): the ANNOTATED
    # list only proves intent; the committed PLANS.md must actually carry
    # a section per registration from batch 96 on.
    plans = (Path(__file__).parents[1] / "PLANS.md").read_text()
    newest = [n for n, b in QUEUED_SINCE.items() if b >= 96]
    missing_section = [n for n in newest if f"## {n}" not in plans]
    assert not missing_section, f"no PLANS.md section: {missing_section}"


def test_r9_window_prediction():
    """Round-8 verdict item 6: with the qNN tie-break, the round-9
    rotation window must be exactly the 27 most-senior never-graded
    queries in query-number order (q143, q145..q170). Guarded on the
    ledger state so the pin retires itself once round 9 is folded."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        TIER1,
        ordered_names,
    )

    if max(LAST_GREEN.values()) != 8:
        pytest.skip("ledger has moved past round 8; pin satisfied")
    rotation = ordered_names()[len(TIER1) : DRIVER_WINDOW]
    expected = ["q143_hard_negative_mining"] + [
        n
        for n in sorted(
            REGISTRY,
            key=lambda n: int(n[1 : n.index("_")]),
        )
        if 145 <= int(n[1 : n.index("_")]) <= 170
    ]
    assert rotation == expected


def test_r10_window_prediction():
    """Round-9 verdict item 1: the round-10 rotation window must take
    the 8 spilled never-graded rows (q171..q178), the seven round-10
    registrations (q179..q185), and the full r04-stale dozen — exactly
    filling the 27 rotation slots. Guarded on the ledger state so the
    pin retires itself once round 10 is folded."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        TIER1,
        ordered_names,
    )

    if max(LAST_GREEN.values()) != 9:
        pytest.skip("ledger has moved past round 9; pin satisfied")
    rotation = ordered_names()[len(TIER1) : DRIVER_WINDOW]
    bynum = sorted(REGISTRY, key=lambda n: int(n[1 : n.index("_")]))
    never_graded = [
        n for n in bynum if 171 <= int(n[1 : n.index("_")]) <= 185
    ]
    assert len(never_graded) == 15
    stale_r04 = [
        n for n in bynum if LAST_GREEN.get(n) == 4
    ]  # q48 q49 q50 q52 q53 q56 q60 q63 q64 q65 q66 q68
    assert len(stale_r04) == 12
    expected = never_graded + stale_r04
    assert rotation == expected


def test_r11_window_prediction():
    """Round-10 verdict item 2: with the never-graded backlog at zero,
    the round-11 rotation window must be the six round-11
    registrations (q186..q191, never-graded sorts first) followed by
    the r05-stale block in query-number order — q21..q34 + q36..q42
    fill the remaining 21 slots (q43/q44/q47/q51/q54/q55 wait for
    r12). Guarded on the ledger state so the pin retires itself once
    round 11 is folded."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        QUEUED_SINCE,
        TIER1,
        ordered_names,
    )

    if max(LAST_GREEN.values()) != 10:
        pytest.skip("ledger has moved past round 10; pin satisfied")
    rotation = ordered_names()[len(TIER1) : DRIVER_WINDOW]

    def qnum(n):
        return int(n[1 : n.index("_")])

    new_r11 = sorted(
        (n for n, b in QUEUED_SINCE.items() if b >= 110), key=qnum
    )
    assert len(new_r11) == 6
    stale_r05 = sorted(
        (n for n in REGISTRY if LAST_GREEN.get(n) == 5), key=qnum
    )
    assert len(stale_r05) == 27
    expected = new_r11 + stale_r05[: DRIVER_WINDOW - len(TIER1) - 6]
    assert rotation == expected


def test_r12_window_prediction():
    """Round-11 verdict item 2: the round-12 rotation window must be
    the eight round-12 registrations (q192..q199, never-graded sorts
    first, seniority = registration batch = query number here),
    followed by the r05-stale residue (q43/q44/q47/q51/q54/q55) and
    then the r06 block in query-number order filling the remaining 13
    slots (q57, q61, q62, q67, q69..q77). Guarded on the ledger state
    so the pin retires itself once round 12 is folded."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        QUEUED_SINCE,
        TIER1,
        ordered_names,
    )

    if max(LAST_GREEN.values()) != 11:
        pytest.skip("ledger has moved past round 11; pin satisfied")
    rotation = ordered_names()[len(TIER1) : DRIVER_WINDOW]

    def qnum(n):
        return int(n[1 : n.index("_")])

    new_r12 = sorted(
        (n for n, b in QUEUED_SINCE.items() if b >= 120), key=qnum
    )
    assert len(new_r12) == 8
    stale_r05 = sorted(
        (n for n in REGISTRY if LAST_GREEN.get(n) == 5), key=qnum
    )
    assert stale_r05 == [
        "q43_ann_bucketed_topk",
        "q44_ivf_probe_topk",
        "q47_ann_recall",
        "q51_pack_offsets",
        "q54_embedding_norm_audit",
        "q55_embedding_dim_stats",
    ]
    stale_r06 = sorted(
        (n for n in REGISTRY if LAST_GREEN.get(n) == 6), key=qnum
    )
    expected = (new_r12 + stale_r05 + stale_r06)[
        : DRIVER_WINDOW - len(TIER1)
    ]
    assert rotation == expected


def test_r13_window_prediction():
    """Round-12 verdict items 2/3: the round-13 rotation window must
    be the three round-13 registrations (q200/q201 staged builders +
    the q202 cap-recall study; never-graded sorts first), followed by
    the r06-stale block (q78..q91, 14 rows) and then the r07 block in
    (QUEUED_SINCE, query-number) order filling the remaining 10 slots
    (q92..q101 — q58/q59 carry no QUEUED_SINCE entry and sort last in
    their LAST_GREEN class, exactly as ordered_names() does).
    Guarded on the ledger state so the pin retires itself once round
    13 is folded."""
    from smartbulkcopy_spark.queries import (
        DRIVER_WINDOW,
        LAST_GREEN,
        QUEUED_SINCE,
        TIER1,
        ordered_names,
    )

    if max(LAST_GREEN.values()) != 12:
        pytest.skip("ledger has moved past round 12; pin satisfied")
    rotation = ordered_names()[len(TIER1) : DRIVER_WINDOW]

    def qnum(n):
        return int(n[1 : n.index("_")])

    new_r13 = sorted(
        (n for n, b in QUEUED_SINCE.items() if b >= 130), key=qnum
    )
    assert new_r13 == [
        "q200_dsir_importance_weights",
        "q201_repetition_removal_audit",
        "q202_contamination_cap_recall",
    ]
    stale_r06 = sorted(
        (n for n in REGISTRY if LAST_GREEN.get(n) == 6), key=qnum
    )
    assert len(stale_r06) == 14 and stale_r06[0] == "q78_burst_detection"
    stale_r07 = sorted(
        (n for n in REGISTRY if LAST_GREEN.get(n) == 7),
        key=lambda n: (QUEUED_SINCE.get(n, 99), qnum(n)),
    )
    expected = (new_r13 + stale_r06 + stale_r07)[
        : DRIVER_WINDOW - len(TIER1)
    ]
    assert expected[-1] == "q101_hourly_cohort_retention"
    assert rotation == expected
