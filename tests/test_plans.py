"""Physical-plan assertions: the scale contract, checked via explain().

Correct results aren't enough — the plans must be the ones that survive a
100x scale-up: filters pushed to the parquet scan, projections pruned,
dimension joins broadcast, aggregation in whole-stage codegen, and no
cartesian product anywhere in the registered query surface."""

from __future__ import annotations

import contextlib
import io

import pytest

from smartbulkcopy_spark.queries import REGISTRY


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_q03_filter_pushed_to_scan(spark, sf_dir):
    plan = explain_str(REGISTRY["q03_range_partition_predicate"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed


def test_q01_projection_pruned_at_scan(spark, sf_dir):
    plan = explain_str(REGISTRY["q01_scan_project"].fn(spark, sf_dir))
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, plan
    line = schema_lines[0]
    assert "l_orderkey" in line and "l_quantity" in line
    # the widest money columns must NOT be read for a 3-column projection
    assert "l_extendedprice" not in line
    assert "l_comment" not in line


def test_q09_dimension_join_is_broadcast(spark, sf_dir):
    plan = explain_str(REGISTRY["q09_inner_join_agg"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q17_partial_aggregation_before_shuffle(spark, sf_dir):
    """Map-side combine: a partial HashAggregate must run before the
    exchange, so only (group, partial-sum) rows shuffle. (AQE's formatted
    explain omits WholeStageCodegen markers; partial_sum is the load-
    bearing property.)"""
    plan = explain_str(REGISTRY["q17_agg_sweep"].fn(spark, sf_dir))
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_q27_band_cap_applied_before_collect_list(spark, sf_dir):
    """Hot-band cap must run BEFORE list aggregation: the window count +
    filter on `bc` precedes every collect_list in the plan, so an over-cap
    boilerplate band never materializes its member list as one giant row.
    Also pins the signatures-run-once property: exactly one band-key
    exchange materializes at runtime; the star branch reads it through
    a ReusedExchange.

    Cold-plan assertion: earlier pipeline tests leave persisted LSH
    signature tables in the session's cache manager, and Spark swaps
    matching subplans for InMemoryRelation, which would hide the
    exchange — clear the cache first."""
    spark.catalog.clearCache()
    df = REGISTRY["q27_minhash_lsh_pairs"].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "Window" in plan
    filt = plan.find("bc#")
    coll = plan.find("collect_list")
    assert filt != -1 and coll != -1
    assert filt < coll, "band-size filter must precede collect_list"
    # The clique/star union gives the STATIC plan two band exchanges —
    # AQE dedupes them at runtime (the branches share one canonical
    # Window subtree; see candidate_pairs' no-op rep reference).
    # Execute and assert on the FINAL adaptive plan: exactly one band
    # shuffle materializes, the other branch reads a ReusedExchange —
    # the signature pipeline runs once.
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert final.splitlines()[0].endswith("isFinalPlan=true")
    final = final.split("== Initial Plan ==")[0]
    real = [
        ln
        for ln in final.splitlines()
        if "Exchange hashpartitioning(band" in ln
        and "ReusedExchange" not in ln
    ]
    reused = [
        ln
        for ln in final.splitlines()
        if "ReusedExchange" in ln and "hashpartitioning(band" in ln
    ]
    # The INVARIANT is one materialized band exchange (a second would
    # be the 2x-signature-cost regression this test guards); the exact
    # ReusedExchange count is optimizer behavior — clique + star +
    # chain currently reuse it twice, but a Catalyst upgrade folding
    # the no-op predicate could merge branches without any real
    # regression, so pin >= 1 reuse, not the count (round-11 advice).
    assert len(real) == 1, real
    assert len(reused) >= 1, reused


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product_anywhere(spark, sf_dir, name):
    """The all-pairs join is the one plan shape that can never ship.
    (q20 executes a copy as a side effect — plan checked, still cheap.)"""
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q72_salt_spreads_join_and_avoids_broadcast(spark, sf_dir):
    """The salted join must actually join on (key, salt) in a shuffled
    hash join: a broadcast would make the salting a no-op, and a join
    key without the salt would funnel the hot key through one task."""
    plan = explain_str(REGISTRY["q72_salted_skew_join"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    key_lines = [
        ln
        for ln in plan.splitlines()
        if ln.startswith(("Left keys", "Right keys"))
    ]
    assert key_lines and all("salt" in ln for ln in key_lines), key_lines
    # dimension replication: the explode of the salt sequence is present
    assert "explode(" in plan


def test_q85_vocab_reenters_as_broadcast(spark, sf_dir):
    """The bounded top-k vocabulary must come back onto the token stream
    as a broadcast, not shuffle the token stream against it."""
    spark.catalog.clearCache()
    plan = explain_str(REGISTRY["q85_oov_rate"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q89_no_corpus_wide_window_partition(spark, sf_dir):
    """The curriculum rank must never put the whole corpus in ONE window
    partition: every window in the plan either partitions by `score`
    (document side, parallel across scores) or runs over the tiny score
    histogram (input already aggregated by score). A global window over
    raw documents would show a Window whose child is the corpus scan
    with an Exchange SinglePartition — assert no SinglePartition
    exchange exists at all."""
    spark.catalog.clearCache()
    plan = explain_str(REGISTRY["q89_curriculum_stages"].fn(spark, sf_dir))
    assert "Window" in plan
    # any SinglePartition exchange must feed from an aggregate (the
    # <=101-row score histogram), never directly from a file scan
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            tail = "\n".join(lines[i : i + 6])
            assert "HashAggregate" in tail or "Aggregate" in tail, tail


def test_q95_range_join_is_equi_keyed(spark, sf_dir):
    """The interval join must run as an equi-join on (user, bucket) with
    the range predicate as a post-join condition — never a nested-loop
    or a pure-inequality join."""
    spark.catalog.clearCache()
    plan = explain_str(REGISTRY["q95_interval_click_attribution"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan
    assert "explode(" in plan  # probe side fans out over its <=2 buckets


def test_q97_pair_space_thinned_before_join(spark, sf_dir):
    """Association mining must LEFT-SEMI thin tokens to the top vocab
    BEFORE the doc-keyed pair join (the bounded-pair-space guarantee)."""
    spark.catalog.clearCache()
    plan = explain_str(REGISTRY["q97_token_cooccurrence"].fn(spark, sf_dir))
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name, hashcols",
    [
        ("q111_image_near_dup", ("ahash_hi", "ahash_lo")),
        ("q112_simhash_near_dup", ("sim_hi", "sim_lo")),
    ],
)
def test_hash_banded_two_level_rule_plan_shape(spark, sf_dir, name, hashcols):
    """The round-12 two-level rule, both hash-banded detectors: the
    distinct-signature cap (window filter on `bc`) precedes the rep
    collect_list; the star and rep-clique branches each shuffle the
    banded table ONCE on the coarse (band_idx, band_val) key, with the
    fine signature-group window riding the same exchange via sort (no
    4-column exchange anywhere); the EXPENSIVE part — the fingerprint
    pipeline — feeds both branches from cache (InMemoryTableScan), so
    it runs once.

    Two exchanges, not one: the branches' exchange subtrees don't
    canonicalize equal across the self-union's re-aliased cache scans,
    so AQE reuse (the q27 pattern) doesn't fire. Deliberately accepted:
    a second shuffle of the NARROW banded rows (id + two longs + band
    key) costs about what caching the data-sized band table would, and
    the cap on this plan is that nothing recomputes fingerprints. A
    third band exchange would flag a real regression."""
    spark.catalog.clearCache()
    from smartbulkcopy_spark.queries import release_caches

    release_caches()
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir))
    assert "Window" in plan
    filt = plan.find("bc#")
    coll = plan.find("collect_list")
    assert filt != -1 and coll != -1
    assert filt < coll, "signature-count filter must precede collect_list"
    assert "InMemoryTableScan" in plan
    band_exchanges = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(band_idx" in ln
    ]
    assert len(band_exchanges) == 2, band_exchanges
    # the fine window must NOT demand its own 4-column exchange
    assert not any(
        c in ln for c in hashcols for ln in band_exchanges
    )
    release_caches()


@pytest.mark.parametrize(
    "name",
    [
        "q94_ensemble_dedup",
        "q107_minhash_estimate_quality",
        "q115_detector_agreement",
        "q164_winnowing_overlap",
        "q170_winnowing_contamination",
        "q174_growth_accounting",
    ],
)
def test_multi_consumer_pair_sets_read_from_cache(spark, sf_dir, name):
    """Operators whose pair sets feed multiple consumers must read them
    back as InMemoryTableScans — a plan without the cache would recompute
    the verify chain per consumer."""
    spark.catalog.clearCache()
    from smartbulkcopy_spark.queries import release_caches

    release_caches()
    plan = explain_str(REGISTRY[name].fn(spark, sf_dir))
    assert "InMemoryTableScan" in plan
    release_caches()


def test_q114_batch_joins_index_only(spark, sf_dir):
    """Incremental image dedup must join the NEW batch against the
    capped corpus index (q63's batch x index asymmetry), never self-join
    the corpus: both split filters appear in the plan, the hot-bucket
    cap (bc) exists, the batch side is LEFT-SEMI thinned to surviving
    buckets, and the eager ahash table re-enters from cache instead of
    re-running the decode pipeline per consumer."""
    spark.catalog.clearCache()
    from smartbulkcopy_spark.pipeline.dedup import INCREMENTAL_SPLIT_ID
    from smartbulkcopy_spark.queries import release_caches

    release_caches()
    plan = explain_str(
        REGISTRY["q114_incremental_image_dedup"].fn(spark, sf_dir)
    )
    release_caches()
    assert f"< {INCREMENTAL_SPLIT_ID}" in plan, "corpus-side split filter"
    assert f">= {INCREMENTAL_SPLIT_ID}" in plan, "batch-side split filter"
    assert "LeftSemi" in plan
    assert "bc#" in plan, "hot-bucket cap aggregate"
    assert "InMemoryTableScan" in plan


def test_q164_posting_cap_guards_pair_join(spark, sf_dir):
    """Winnowing pairs must be generated from the CAPPED posting set:
    the cap aggregate (pc) exists, the pair join is an equi hash join
    on the fingerprint (no nested-loop shape anywhere), and the capped
    set re-enters from cache for its two consumers."""
    spark.catalog.clearCache()
    from smartbulkcopy_spark.queries import release_caches

    release_caches()
    plan = explain_str(REGISTRY["q164_winnowing_overlap"].fn(spark, sf_dir))
    release_caches()
    assert "pc#" in plan, "posting-cap aggregate missing"
    assert "fph" in plan
    assert "InMemoryTableScan" in plan


def test_two_phase_rank_windows_stay_banded(spark, sf_dir):
    """q165/q169/q172 replace data-sized global windows with the
    two-phase band decomposition: every unpartitioned window in their
    plans must run over the band-total/band-count grain (its input
    carries the band column), never over the raw data grain."""
    from smartbulkcopy_spark.queries import release_caches

    # q172 shares the decomposition but returns a driver-assembled
    # single-row DataFrame (its banded plan executes inside the
    # builder), so only the lazily-returned two are pinned here.
    for name in (
        "q165_pareto_abc",
        "q169_zipf_coverage",
    ):
        spark.catalog.clearCache()
        release_caches()
        plan = explain_str(REGISTRY[name].fn(spark, sf_dir))
        release_caches()
        assert "band" in plan, name
        # every single-partition exchange must feed from an aggregate
        # (the band-total/band-count table), never directly from a
        # data-sized scan — the q89 criterion
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" in ln:
                tail = "\n".join(lines[i : i + 6])
                assert (
                    "HashAggregate" in tail or "Aggregate" in tail
                ), (name, tail)
