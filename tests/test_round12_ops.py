"""Round-12 registrations: the star-fallback recall study (q199), the
scoped CC shuffle-width override it rides on, and registration-shape
pins for the shipped staged queue (q192-q198 behavior is covered by the
builder tests in test_round11_ops.py; cross-engine equality by the
driver-mimic/oracle suite)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_star_fallback_recall_is_lossless(spark, sf_dir):
    """The registered form of the round-11 claim: on families straddling
    MINHASH_CLIQUE_CAP (6/14/22/30 members vs cap 16), the clique/star
    candidate graph yields EXACTLY the families the clique-only graph
    does — same family count, every member labeled identically."""
    from smartbulkcopy_spark.pipeline.dedup import (
        STUDY_SEEDS,
        star_fallback_recall,
    )

    row = star_fallback_recall(spark, sf_dir).collect()[0]
    # >= 6 members per family; seeds that are near-dups of EACH OTHER
    # merge identically on both sides, so family count can dip below
    # STUDY_SEEDS but never exceed it and never differ between rules.
    assert row["n_docs"] >= STUDY_SEEDS * 6
    assert row["star_families"] == row["clique_families"]
    assert row["star_families"] <= STUDY_SEEDS
    assert row["agree_docs"] == row["n_docs"]
    assert row["agree_pct"] == 100


def test_star_fallback_study_sizes_straddle_cap(spark, sf_dir):
    """The study is only evidence if the synthetic bands actually
    exercise BOTH branches: at least one family at or under the cap
    (clique path) and at least one over it (star path)."""
    from smartbulkcopy_spark.pipeline.dedup import (
        MINHASH_CLIQUE_CAP,
        STUDY_SEEDS,
        _STUDY_SIZE_SPARK,
    )
    from smartbulkcopy_spark.queries import table

    sizes = [
        r["sz"]
        for r in table(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(STUDY_SEEDS)
        .select((F.expr(_STUDY_SIZE_SPARK) + 1).alias("sz"))
        .collect()
    ]
    assert any(s <= MINHASH_CLIQUE_CAP for s in sizes)
    assert any(s > MINHASH_CLIQUE_CAP for s in sizes)


def test_cc_shuffle_partitions_scoped_and_restored(spark):
    """connected_components(shuffle_partitions=N) must bind N for its
    own actions and restore the session default even on success; the
    labels it returns must already be materialized (checkpoint-backed)
    so later consumption does not silently re-plan at the narrow
    width."""
    from smartbulkcopy_spark.pipeline.dedup import connected_components

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a_id", "b_id"]
    )
    labels = connected_components(spark, pairs, shuffle_partitions=4)
    assert spark.conf.get(key) == before
    got = {(r["node"], r["lbl"]) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_cc_shuffle_partitions_restored_on_error(spark):
    """A bad edge frame must not leave the session at study width:
    analysis runs BEFORE the override binds, and any later failure
    restores through the finally."""
    from smartbulkcopy_spark.pipeline.dedup import connected_components

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    bad = spark.createDataFrame([(1, 2)], ["a_id", "wrong_name"])
    with pytest.raises(Exception):
        connected_components(spark, bad, shuffle_partitions=4)
    assert spark.conf.get(key) == before


def test_round12_registrations_complete():
    """Every round-12 registration (batch >= 120) carries the full
    close-out kit: a REGISTRY entry with an oracle, a QUEUED_SINCE
    batch, and (enforced globally by test_round_closeout_discipline)
    dump_plans/scale_probe entries. Pin the exact name set so a
    silently-dropped registration cannot pass."""
    from smartbulkcopy_spark.queries import QUEUED_SINCE, REGISTRY

    new = sorted(n for n, b in QUEUED_SINCE.items() if b >= 120)
    assert new == [
        "q192_bigram_lm_fit",
        "q193_quality_calibration",
        "q194_soft_dedup_weights",
        "q195_winnow_drop_share",
        "q196_embedding_split_leakage",
        "q197_tree_multiprobe_recall",
        "q198_stream_click_attribution",
        "q199_star_fallback_recall",
    ]
    for n in new:
        assert n in REGISTRY
        # full DuckDB oracle, no rows-only fallback
        assert REGISTRY[n].oracle
