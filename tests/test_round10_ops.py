"""Round-10 operator invariants: q179 budgeted BPE training, q180
exact-substring verify, q181 PQ codebook refresh, q182 streaming peak
concurrency. The shared DuckDB oracle run in test_queries covers the
fixture corpus; these pin what the fixture can't prove — the tf-floor
early-out actually firing (and skipping rewrites), a hand-built
verified/unverified candidate pair, refresh-count conservation, and
bit-equality of the stateful streaming twin against batch q172."""

from __future__ import annotations

import pandas as pd

from smartbulkcopy_spark.queries import REGISTRY


def _write_documents(path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["src0"] * len(rows),
            "n_chars": [len(r[1] or "") for r in rows],
        }
    ).to_parquet(path / "documents.parquet", index=False)


def test_q179_floor_fires_and_skips_rewrites(spark, tmp_path):
    """One doc 'x x x x': round 1 mints ('x x', tf 3); the rewritten
    stream [xx, xx] has top tf 1 < floor 2, so training stops after ONE
    round — the floor branch, unreachable on the fixture corpus where
    every budget round clears the floor."""
    d = tmp_path / "sf_q179a"
    d.mkdir()
    _write_documents(d, [(1, "x x x x")])
    got = [
        tuple(r)
        for r in REGISTRY["q179_bpe_vocab_budget"].fn(spark, str(d)).collect()
    ]
    assert got == [(1, "x x", 3, 1)]


def test_q179_budget_exhausts(spark, tmp_path):
    """Two copies of 'p q r s t u': every round's top pair has tf 2
    (>= floor 2) and the ascending-pair tie-break walks the prefix
    left to right, so all five budget rounds mint — the
    budget-exhausted branch, hand-checked."""
    d = tmp_path / "sf_q179b"
    d.mkdir()
    _write_documents(d, [(1, "p q r s t u"), (2, "p q r s t u")])
    got = [
        tuple(r)
        for r in REGISTRY["q179_bpe_vocab_budget"].fn(spark, str(d)).collect()
    ]
    assert got == [
        (1, "p q", 2, 2),
        (2, "pq r", 2, 2),
        (3, "pqr s", 2, 2),
        (4, "pqrs t", 2, 2),
        (5, "pqrst u", 2, 2),
    ]


# A 90-char sentence shared VERBATIM by docs 1 and 2 (plenty of shared
# winnowing fingerprints AND shared 34-char windows -> verified), and
# six ~26-char snippets shared by docs 3 and 4 but wrapped in different
# filler on each side (each contributes >= 1 shared fingerprint — the
# 17-char winnowing guarantee — but no 34-char run survives the
# differing boundaries -> candidate yet UNVERIFIED).
_VERBATIM = (
    "the quarterly ingestion audit flagged twelve parquet shards"
    " with mismatched row counts today"
)
_SNIPPETS = [
    "alpha baseline threshold met",
    "beta rollout window confirmed",
    "gamma shard checksum repaired",
    "delta replica lag normalized",
    "epsilon queue drain completed",
    "zeta manifest digest verified",
]


def test_q180_verified_vs_reworded(spark, tmp_path):
    d = tmp_path / "sf_q180"
    d.mkdir()
    doc3 = " one ".join(f"unrelated{i} {s} spacer{i}" for i, s in enumerate(_SNIPPETS))
    doc4 = " two ".join(f"distinct{i} {s} padding{i}" for i, s in enumerate(_SNIPPETS))
    _write_documents(
        d,
        [
            (1, f"intro left context {_VERBATIM} trailing words here"),
            (2, f"other opening words {_VERBATIM} different tail text"),
            (3, doc3),
            (4, doc4),
        ],
    )
    rows = {
        (r["a_id"], r["b_id"]): r
        for r in REGISTRY["q180_exact_substring_verify"].fn(spark, str(d)).collect()
    }
    assert (1, 2) in rows and (3, 4) in rows
    v, u = rows[(1, 2)], rows[(3, 4)]
    assert v["verified"] == 1 and v["verified_grams"] >= 1
    assert v["shared_fps"] >= 5
    assert u["verified"] == 0 and u["verified_grams"] == 0
    assert u["shared_fps"] >= 5


def test_q185_apply_rewrites_through_last_rule(spark, tmp_path):
    """Training on 'x x x x' mints one rule then floor-stops; the
    tokenizer must still APPLY that rule (training's loop stops one
    rewrite short — application may not): [x,x,x,x] -> [xx,xx]."""
    d = tmp_path / "sf_q185"
    d.mkdir()
    _write_documents(d, [(1, "x x x x")])
    got = [
        tuple(r)
        for r in REGISTRY["q185_bpe_tokenize_apply"].fn(spark, str(d)).collect()
    ]
    assert got == [(1, 4, 2, 2)]


def test_q184_matches_batch_q153(spark, sf_dir):
    """The stateful funnel twin must converge bit-equal to batch q153
    on the fixture feed (single availableNow batch = time-ordered
    arrival)."""
    stream_rows = (
        REGISTRY["q184_stream_session_funnel"].fn(spark, sf_dir).collect()
    )
    batch_rows = REGISTRY["q153_session_funnel"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in stream_rows] == [tuple(r) for r in batch_rows]


def test_q181_refresh_conservation(spark, sf_dir):
    """Every vector is assigned exactly once per subspace, so the
    n_vecs column must sum to the embedding count within each m; the
    grid left join keeps all 32 (m, code) rows; drift is non-negative
    by construction."""
    from smartbulkcopy_spark.pipeline.similarity import PQ_K, PQ_M
    from smartbulkcopy_spark.queries import table

    n_emb = table(spark, sf_dir, "embeddings").count()
    rows = REGISTRY["q181_pq_codebook_refresh"].fn(spark, sf_dir).collect()
    assert len(rows) == PQ_M * PQ_K
    per_m: dict[int, int] = {}
    for r in rows:
        per_m[r["m"]] = per_m.get(r["m"], 0) + r["n_vecs"]
        assert r["drift_e6"] >= 0
        assert (r["n_vecs"] == 0) <= (r["drift_e6"] == 0)
    assert per_m == {m: n_emb for m in range(PQ_M)}


def test_q183_tree_walk_conservation(spark, sf_dir):
    """Fixture invariants: every vector lands on exactly one leaf
    (counts conserve), error mass is non-negative, and each assigned
    leaf appears once."""
    from smartbulkcopy_spark.queries import table

    n_emb = table(spark, sf_dir, "embeddings").count()
    rows = REGISTRY["q183_ann_tree_assignment"].fn(spark, sf_dir).collect()
    assert sum(r["n_vecs"] for r in rows) == n_emb
    assert all(r["err_e6"] >= 0 for r in rows)
    leaf_codes = {r["code"] for r in rows}
    assert len(leaf_codes) == len(rows)  # one row per assigned leaf


def test_q183_routing_exact_on_separated_clusters(spark, tmp_path):
    """Hand-built routing pin: 16 vectors in 4 well-separated clusters
    of 4, laid out so leaf group g IS cluster g (vec_id order). Every
    vector is itself a leaf: level 1 must route it to its own
    cluster's pivot (the clusters are far apart) and level 2 to
    ITSELF (self-distance is the strict minimum) — so the histogram is
    exactly one vector per leaf with error 0. A wrong child-index
    precompute in _tree_levels, a broken tie order, or a misaligned
    map key would all scatter the histogram or leave residual error."""
    import pandas as pd

    dim = 8
    rows = []
    for g in range(4):
        for i in range(4):
            v = [0.0] * dim
            v[g] = 100.0 * (g + 1)  # cluster centers far apart
            v[4 + (i % 4) // 2] = 1.0 + i  # small within-cluster spread
            rows.append((4 * g + i, v, g))
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[2] for r in rows],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = [
        tuple(r)
        for r in REGISTRY["q183_ann_tree_assignment"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert got == [(code, 1, 0) for code in range(16)]


def test_q182_matches_batch_q172(spark, sf_dir):
    """The stateful streaming twin must converge bit-equal to batch
    q172 on the fixture feed (single availableNow batch = time-ordered
    arrival, the convergence precondition)."""
    stream_row = (
        REGISTRY["q182_stream_peak_concurrency"].fn(spark, sf_dir).collect()
    )
    batch_row = REGISTRY["q172_peak_concurrency"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in stream_row] == [tuple(r) for r in batch_row]
