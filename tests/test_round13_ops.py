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


# ---------------------------------------------------------------------------
# Hypothesis: the q200/q201/q202 oracles vs straight-line Python
# references (the r9 lesson — hand corpora miss tie- and edge-dense
# inputs; the fixture tests already pin Spark == oracle, so oracle ==
# reference closes the triangle).
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import re as _re
from collections import Counter as _Counter

import pandas as _pd
from hypothesis import given, settings
from hypothesis import strategies as st

from smartbulkcopy_spark.pipeline.dedup import (
    WINNOW_K,
    WINNOW_MAX_POSTINGS,
    WINNOW_MOD,
    WINNOW_W,
    WSTUDY_ID_STRIDE,
    WSTUDY_SEEDS,
)
from smartbulkcopy_spark.pipeline.text import REP_GRAM, VOCAB_BUCKETS
from smartbulkcopy_spark.queries import REGISTRY


def _norm(t):
    return _re.sub(r"\s+", " ", t or "").lower().strip()


def _docs_frame(texts, sources=None):
    return _pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources or ["src0"] * len(texts),
            "n_chars": [len(t or "") for t in texts],
        }
    )


_tok = st.sampled_from(["a", "b", "ab", "ba", "xy", "q"])
_doc = st.lists(_tok, min_size=0, max_size=14).map(" ".join)


def _ref_repetition(texts):
    rows = []
    for i, t in enumerate(texts, start=1):
        n = _norm(t)
        if not n:
            rows.append((i, 0, 0, 0))
            continue
        toks = n.split(" ")
        nt = len(toks)
        grams = [
            (s, " ".join(toks[s - 1 : s + REP_GRAM - 1]))
            for s in range(1, nt - REP_GRAM + 2)
        ]
        first = {}
        for s, g in grams:
            first.setdefault(g, s)
        covered = set()
        for s, g in grams:
            if s > first[g]:
                covered.update(range(s, s + REP_GRAM))
        nr = len(covered)
        rows.append((i, nt, nr, nr * 1_000_000 // max(nt, 1)))
    return rows


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc | st.none(), min_size=1, max_size=8))
def test_q201_oracle_matches_reference(texts):
    import duckdb

    con = duckdb.connect()
    con.register("documents", _docs_frame(texts))
    got = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q201_repetition_removal_audit"].oracle
        ).fetchall()
    ]
    con.close()
    assert got == _ref_repetition(texts)


def _bucket(w1, w2):
    return (
        int(_hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:4], 16)
        % VOCAB_BUCKETS
    )


def _ref_dsir(texts, sources):
    tgt = min(sources)
    occ = []  # (doc_id, is_tgt, bucket)
    for i, (t, src) in enumerate(zip(texts, sources), start=1):
        n = _norm(t)
        if not n:
            continue
        toks = n.split(" ")
        for w1, w2 in zip(toks, toks[1:]):
            occ.append((i, src == tgt, _bucket(w1, w2)))
    nt = sum(1 for _, it, _b in occ if it)
    nr = len(occ) - nt
    ct: _Counter = _Counter()
    cr: _Counter = _Counter()
    for _i, it, b in occ:
        (ct if it else cr)[b] += 1
    d = {
        b: (ct[b] + 1) * 1_000_000 // (nt + VOCAB_BUCKETS)
        - (cr[b] + 1) * 1_000_000 // (nr + VOCAB_BUCKETS)
        for b in set(ct) | set(cr)
    }
    agg = {}
    for i, _it, b in occ:
        nb, sd = agg.get(i, (0, 0))
        agg[i] = (nb + 1, sd + d[b])
    return [
        (i, *agg.get(i, (0, 0)), agg.get(i, (0, 0))[1] > 0)
        for i in range(1, len(texts) + 1)
    ]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(_doc | st.none(), st.sampled_from(["s0", "s1"])),
        min_size=1,
        max_size=8,
    )
)
def test_q200_oracle_matches_reference(rows):
    import duckdb

    texts = [t for t, _ in rows]
    sources = [s for _, s in rows]
    con = duckdb.connect()
    con.register("documents", _docs_frame(texts, sources))
    got = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q200_dsir_importance_weights"].oracle
        ).fetchall()
    ]
    con.close()
    assert got == _ref_dsir(texts, sources)


def _ref_cap_recall(texts):
    # seed fingerprints (first WSTUDY_SEEDS docs by id; all here)
    fps = {}
    for i, t in enumerate(texts[:WSTUDY_SEEDS], start=1):
        n = _norm(t)
        if len(n) < WINNOW_K + WINNOW_W - 1:
            continue
        H = []
        for p in range(len(n) - WINNOW_K + 1):
            h = 0
            for ch in n[p : p + WINNOW_K]:
                h = (h * 31 + ord(ch)) % WINNOW_MOD
            H.append(h)
        s = {
            min(H[p : p + WINNOW_W])
            for p in range(len(H) - WINNOW_W + 1)
        }
        if s:
            fps[i] = s
    ev = set().union(*fps.values()) if fps else set()
    tr = {}  # train doc -> fp multiset (set: fps are distinct per doc)
    for i, s in fps.items():
        size = 10 + (i % 2) * 14
        for k in range(1, size + 1):
            tr[i * WSTUDY_ID_STRIDE + k] = s
    postings: _Counter = _Counter()
    for i, s in fps.items():
        for f in s:
            postings[f] += 1
    for d, s in tr.items():
        for f in s:
            postings[f] += 1
    keep = {f for f, c in postings.items() if c <= WINNOW_MAX_POSTINGS}
    n_train = len(tr)
    screen_docs = sum(1 for s in tr.values() if s & ev)
    screen_full = sum(1 for s in tr.values() if len(s & ev) == len(s))
    capped_docs = sum(1 for s in tr.values() if s & keep)
    if n_train == 0:
        return [(0, None, None, None, None, None)]
    return [
        (
            n_train,
            screen_docs,
            screen_full,
            capped_docs,
            screen_docs * 100 // n_train,
            capped_docs * 100 // n_train,
        )
    ]


_long_doc = st.lists(_tok, min_size=8, max_size=20).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_long_doc | _doc | st.none(), min_size=1, max_size=6))
def test_q202_oracle_matches_reference(texts):
    import duckdb

    con = duckdb.connect()
    con.register("documents", _docs_frame(texts))
    got = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q202_contamination_cap_recall"].oracle
        ).fetchall()
    ]
    con.close()
    assert got == _ref_cap_recall(texts)


# ---------------------------------------------------------------------------
# Round-14 staged builder: contamination ensemble matrix
# ---------------------------------------------------------------------------


def test_contamination_ensemble_hand_corpus(spark, tmp_path):
    """A corpus built so each detector has a distinguishable verdict:
    doc 11 shares a verbatim 12-token run with eval doc 1 (all three
    detectors must flag it); doc 12 is clean. Spark and the oracle
    agree row-for-row and the all-three row is present."""
    from smartbulkcopy_spark.pipeline.ensemble import (
        _contamination_ensemble_oracle,
        contamination_ensemble_matrix,
    )
    from smartbulkcopy_spark.queries import release_caches

    leak = "the quick brown fox jumps over the lazy dog again and again"
    _mini_docs(
        tmp_path,
        [
            (1, leak, "src0"),
            (2, "an unrelated evaluation benchmark prompt entirely", "src0"),
            (11, leak, "crawl"),
            (12, "training text with no overlap whatsoever here", "crawl"),
        ],
    )
    got = [
        tuple(r)
        for r in contamination_ensemble_matrix(
            spark, str(tmp_path)
        ).collect()
    ]
    release_caches()
    assert (True, True, True) in {(g, w, l) for g, w, l, _n in got}
    flagged = {n for g, w, l, n in got}
    assert all(n >= 1 for n in flagged)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(_contamination_ensemble_oracle()).fetchall()
    ]
    assert got == want


def test_contamination_ensemble_reconciles_on_fixture(spark, sf_dir, duck):
    """The staged ensemble's oracle replays the builder row-for-row at
    fixture scale, and the union is non-trivial (the fixture has known
    gram and winnow contamination: q68/q170 emit rows there)."""
    from smartbulkcopy_spark.pipeline.ensemble import (
        _contamination_ensemble_oracle,
        contamination_ensemble_matrix,
    )
    from smartbulkcopy_spark.queries import release_caches

    got = [
        tuple(r)
        for r in contamination_ensemble_matrix(spark, sf_dir).collect()
    ]
    release_caches()
    want = [
        tuple(r)
        for r in duck.execute(_contamination_ensemble_oracle()).fetchall()
    ]
    assert got == want and len(got) >= 1
    assert sum(n for *_f, n in got) >= 1
