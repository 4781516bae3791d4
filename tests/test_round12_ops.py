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


# ---------------------------------------------------------------------------
# q112 two-level rule (round 12): signature-group stars + distinct-
# signature rep cliques. The headline is the >cap verbatim family: the
# old member-count skip-cap dropped EVERY bucket of a family past 1024
# copies (and at 100 TB ambient bucket growth in a 16-bit band space
# would eventually skip every bucket, period); the two-level rule keeps
# it connected with one hamming-0 star edge per member while the cap
# keeps killing ambient cross-signature collision mass.
# ---------------------------------------------------------------------------


def _simhash_corpus(tmp_path, n_hot, n_cold):
    import pandas as pd

    x = "the quick brown fox jumps over the lazy dog again and again"
    xp = "again the lazy dog jumps over the quick brown fox and again"
    y = "pack my box with five dozen liquor jugs before the dawn breaks"
    # xp is a token permutation of x's multiset -> IDENTICAL simhash
    # signature, so it lands in x's signature group (hamming 0).
    texts = [x] * n_hot + [xp] + [y] * n_cold + [
        "completely unrelated content block one with many unique grams",
        "another entirely distinct document with its own shingle space",
    ]
    pd.DataFrame(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return len(texts)


def test_q112_two_level_rule_survives_overcap_verbatim_family(
    spark, tmp_path
):
    """1030 verbatim copies (plus one token-permuted twin — same
    64-bit signature) exceed MAX_BAND_BUCKET=1024 in every band. Old
    rule: every bucket skipped, family LOST. Two-level rule: the
    signature group emits exactly one hamming-0 star edge per member
    around doc 0; the 3-copy y family stars around its own min; no
    cross-family pairs. Spark and the DuckDB oracle agree
    pair-for-pair."""
    import duckdb

    from smartbulkcopy_spark.pipeline.dedup import MAX_BAND_BUCKET
    from smartbulkcopy_spark.queries import REGISTRY, release_caches

    assert MAX_BAND_BUCKET == 1024  # the corpus is sized around it
    n_hot = 1030
    n = _simhash_corpus(tmp_path, n_hot=n_hot, n_cold=3)
    got = [
        tuple(r)
        for r in REGISTRY["q112_simhash_near_dup"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    release_caches()
    # x group = copies 0..1029 plus the permuted twin at id 1030
    x_star = [(0, m, 0) for m in range(1, n_hot + 1)]
    y_min = n_hot + 1
    y_star = [(y_min, m, 0) for m in range(y_min + 1, y_min + 3)]
    assert got == sorted(x_star + y_star)
    assert n == y_min + 3 + 2

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q112_simhash_near_dup"].oracle
        ).fetchall()
    ]
    assert got == want


def test_q111_two_level_rule_survives_overcap_verbatim_family(
    spark, tmp_path
):
    """The image twin of the q112 over-cap test: 1030 byte-identical
    blobs share the full 64-bit ahash, so every band bucket exceeds
    MAX_BAND_BUCKET — the old member-count skip-cap dropped the family
    entirely (meme-grade duplication is exactly where image dedup
    matters); the two-level rule keeps one hamming-0 star edge per
    member. Spark and the DuckDB oracle agree pair-for-pair."""
    import duckdb

    from smartbulkcopy_spark.pipeline.dedup import MAX_BAND_BUCKET
    from smartbulkcopy_spark.queries import REGISTRY, release_caches

    n_hot = MAX_BAND_BUCKET + 6
    _simhash_corpus(tmp_path, n_hot=n_hot, n_cold=3)
    got = [
        tuple(r)
        for r in REGISTRY["q111_image_near_dup"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    release_caches()
    # blobs are the text bytes, so the permuted twin (id n_hot) has its
    # OWN ahash (unlike simhash) and stays a singleton; x stars span
    # the verbatim copies only.
    x_star = [(0, m, 0) for m in range(1, n_hot)]
    y_min = n_hot + 1
    y_star = [(y_min, m, 0) for m in range(y_min + 1, y_min + 3)]
    assert got == sorted(x_star + y_star)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q111_image_near_dup"].oracle
        ).fetchall()
    ]
    assert got == want
