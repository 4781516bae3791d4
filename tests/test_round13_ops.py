"""Round-13 additions: the q202 contamination-cap recall study, the
ADVICE fixes that ride with it, and the round-14 STAGED builders
(image contamination screen + cross-modal coverage audit — tested and
oracled this round, registered when the r14 window opens, per the
staged-builder discipline)."""

from __future__ import annotations

import duckdb
import pytest


def _mini_docs(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] if len(r) > 2 else "src0" for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)


# ---------------------------------------------------------------------------
# q202 — contamination-cap recall study
# ---------------------------------------------------------------------------


def test_q202_screen_full_recall_capped_chain_blind(spark, sf_dir, duck):
    """The study's headline claims, asserted on the values themselves
    (not just cross-engine equality): the cap-free screen finds every
    synthetic verbatim copy at full fingerprint coverage, while the
    capped pair chain loses every over-cap family — strictly fewer
    docs. Both engines agree row-for-row."""
    from smartbulkcopy_spark.queries import REGISTRY, release_caches

    r = REGISTRY["q202_contamination_cap_recall"]
    got = [tuple(x) for x in r.fn(spark, sf_dir).collect()]
    release_caches()
    want = [tuple(x) for x in duck.execute(r.oracle).fetchall()]
    assert got == want and len(got) == 1
    n_train, screen_docs, screen_full, capped_docs, s_pct, c_pct = got[0]
    assert n_train > 0
    assert screen_docs == n_train and screen_full == n_train
    assert s_pct == 100
    assert capped_docs < n_train and c_pct < 100


# ---------------------------------------------------------------------------
# Round-14 staged builder: image contamination screen
# ---------------------------------------------------------------------------


def test_image_contamination_hand_corpus(spark, tmp_path):
    """A verbatim cross-source text copy decodes to the identical fake
    image (codec is md5-of-text-derived), so the training copy must
    surface at Hamming 0 against its eval twin; Spark and the oracle
    agree row-for-row."""
    from smartbulkcopy_spark.pipeline.multimodal import (
        _image_contamination_oracle,
        image_contamination_screen,
    )
    from smartbulkcopy_spark.queries import release_caches

    _mini_docs(
        tmp_path,
        [
            (1, "the quick brown fox jumps over the lazy dog", "src0"),
            (2, "completely different eval text content here", "src0"),
            (3, "the quick brown fox jumps over the lazy dog", "crawl"),
            (4, "some other training text with no eval match", "crawl"),
        ],
    )
    got = [
        tuple(r)
        for r in image_contamination_screen(spark, str(tmp_path)).collect()
    ]
    release_caches()
    by_id = {r[0]: r for r in got}
    assert 3 in by_id, "verbatim image copy must be flagged"
    assert by_id[3][1] == 1 and by_id[3][2] == 0  # dup_of=1, hamming 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(_image_contamination_oracle()).fetchall()
    ]
    assert got == want


def test_r14_staged_builders_reconcile_on_fixture(spark, sf_dir, duck):
    """Both round-14 staged oracles replay their builders row-for-row
    at fixture scale (the pre-registration cross-engine gate). The
    cross-modal audit must be non-trivial (>= 1 source row); the
    contamination screen may legitimately be empty when the fixture
    has no cross-source verbatim image twins."""
    from smartbulkcopy_spark.pipeline.multimodal import (
        _cross_modal_oracle,
        _image_contamination_oracle,
        cross_modal_coverage_audit,
        image_contamination_screen,
    )
    from smartbulkcopy_spark.queries import release_caches

    got = [
        tuple(r)
        for r in cross_modal_coverage_audit(spark, sf_dir).collect()
    ]
    release_caches()
    want = [tuple(r) for r in duck.execute(_cross_modal_oracle()).fetchall()]
    assert got == want and len(got) >= 1

    got2 = [
        tuple(r)
        for r in image_contamination_screen(spark, sf_dir).collect()
    ]
    release_caches()
    want2 = [
        tuple(r)
        for r in duck.execute(_image_contamination_oracle()).fetchall()
    ]
    assert got2 == want2


# ---------------------------------------------------------------------------
# ADVICE regression pins
# ---------------------------------------------------------------------------


def test_two_level_bc_counts_distinct_signatures(spark, tmp_path):
    """The round-13 O(1)-state bc rewrite (conditional count of rep
    rows) must still count DISTINCT signatures per bucket: two verbatim
    pairs sharing a band bucket = bc 2 (reps clique), and the bucket's
    members connect regardless. Identical-text docs collide on every
    band, so the family stays connected via hamming-0 stars."""
    from smartbulkcopy_spark.pipeline.dedup import simhash_near_dup_pairs

    _mini_docs(
        tmp_path,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "one two three four five six seven eight nine ten"),
            (5, "one two three four five six seven eight nine ten"),
        ],
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in simhash_near_dup_pairs(spark, str(tmp_path)).collect()
    }
    # family {1,2,3}: star edges around min id 1; family {4,5}
    assert {(1, 2), (1, 3), (4, 5)} <= got
    # no cross-family pair may verify at hamming 0
    assert not any(
        a in (1, 2, 3) and b in (4, 5) for a, b in got
    )
