"""Round-11 operator invariants: q186 IVF list rebalancing audit, q187
MinHash-vs-winnowing agreement, q188 depth-3 tree assignment, q189
tree-vs-flat agreement, q190 tree-probed recall, q191 posting
histogram, plus the round-12 staged builders (multi-probe search,
fingerprint drop-share, bigram-LM fit, embedding split leakage, soft
dedup, quality calibration). The shared DuckDB oracle run in test_queries
covers the fixture corpus; these pin what the fixture can't prove —
count conservation against the underlying q93 assignment, matrix
marginals equal to the detectors' own pair sets, exact routing on
hand-built hierarchical/satellite corpora, the agreement gate reading
100% when the tree is exact by construction, cross-engine equality of
the GENERATED tree oracle at ragged (leaves, branch) shapes, recall
monotone in n_probe, and drop-share reconciliation against q191."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from smartbulkcopy_spark.queries import REGISTRY, release_caches, table


def test_q186_conservation_and_q93_consistency(spark, sf_dir):
    """Per centroid n_index + n_batch == n_total; totals conserve the
    corpus; and the n_batch column must equal the per-list batch counts
    derived from q93's own assignment output (same centroids, same
    argmin) — the pairing contract."""
    from smartbulkcopy_spark.pipeline.similarity import (
        BATCH_MOD,
        BATCH_REM,
        N_CENTROIDS,
    )

    emb = table(spark, sf_dir, "embeddings")
    n_emb = emb.count()
    n_batch = emb.where(
        F.col("vec_id") % BATCH_MOD == BATCH_REM
    ).count()

    rows = REGISTRY["q186_ivf_list_rebalance"].fn(spark, sf_dir).collect()
    assert len(rows) == N_CENTROIDS
    assert all(r["n_index"] + r["n_batch"] == r["n_total"] for r in rows)
    assert sum(r["n_total"] for r in rows) == n_emb
    assert sum(r["n_batch"] for r in rows) == n_batch
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000

    q93_batch = {
        r["cid"]: r["n"]
        for r in REGISTRY["q93_incremental_ann_ingest"]
        .fn(spark, sf_dir)
        .groupBy("cid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {r["cid"]: r["n_batch"] for r in rows if r["n_batch"] > 0}
    assert got == q93_batch


def test_q187_marginals_match_detectors(spark, sf_dir):
    """The matrix marginals must equal the two detectors' own verified
    pair counts, the (minhash OR winnowing) total must equal the union,
    and a (false, false) cell cannot exist (the union only contains
    pairs at least one detector fired on)."""
    from smartbulkcopy_spark.pipeline.dedup import (
        Q180_MIN_SHARED_FPS,
        verified_pairs,
        winnow_capped_pairs,
    )

    rows = (
        REGISTRY["q187_lexical_detector_overlap"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert all(r["minhash"] or r["winnowing"] for r in rows)

    lex = verified_pairs(spark, sf_dir).select("a_id", "b_id")
    _pkf, pr = winnow_capped_pairs(spark, sf_dir)
    win = pr.where(
        F.col("shared_fps") >= Q180_MIN_SHARED_FPS
    ).select("a_id", "b_id")
    n_lex = lex.count()
    n_win = win.count()
    n_union = lex.union(win).distinct().count()
    release_caches()

    assert sum(r["n_pairs"] for r in rows if r["minhash"]) == n_lex
    assert sum(r["n_pairs"] for r in rows if r["winnowing"]) == n_win
    assert sum(r["n_pairs"] for r in rows) == n_union


def test_q188_conservation(spark, sf_dir):
    """Depth-3 invariants on the fixture: every vector lands on exactly
    one of the 64 leaves, error mass non-negative, one row per assigned
    leaf."""
    n_emb = table(spark, sf_dir, "embeddings").count()
    rows = (
        REGISTRY["q188_tree_depth3_assignment"].fn(spark, sf_dir).collect()
    )
    assert sum(r["n_vecs"] for r in rows) == n_emb
    assert all(r["err_e6"] >= 0 for r in rows)
    codes = {r["code"] for r in rows}
    assert len(codes) == len(rows)


def _hierarchical_embeddings(tmp_path, n=64, dim=12):
    """64 vectors whose layout mirrors the 4-ary depth-3 tree exactly:
    component blocks encode (level-1 group, level-2 subgroup, leaf slot)
    at magnitudes 100 / 10 / ~1, so the nearest pivot at every level is
    the vector's own subtree and the nearest leaf is itself."""
    rows = []
    for v in range(n):
        g1, g2, leaf = v // 16, (v % 16) // 4, v % 4
        vec = [0.0] * dim
        vec[g1] = 100.0
        vec[4 + g2] = 10.0
        vec[8 + leaf] = 1.0 + 0.01 * v  # strict self-minimum
        rows.append((v, vec))
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[0] % 4 for r in rows],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)


def test_q188_routing_exact_on_hierarchical_clusters(spark, tmp_path):
    """Hand-built depth-3 routing pin (the q183 separated-cluster test
    one level deeper): every vector is a leaf of the 64-leaf tree and
    the component-block layout makes each level's own-subtree pivot the
    strict argmin, so the histogram must be exactly one vector per leaf
    with zero error. A wrong gsub/gcur at ANY of the three levels, a
    broken child-index precompute, or a desynchronized oracle depth
    would scatter it."""
    _hierarchical_embeddings(tmp_path)
    got = [
        tuple(r)
        for r in REGISTRY["q188_tree_depth3_assignment"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert got == [(code, 1, 0) for code in range(64)]


def test_q189_reads_full_agreement_when_tree_is_exact(spark, tmp_path):
    """On the q183 separated-cluster corpus the tree walk IS exact, so
    the agreement gate must read 100%: per leaf n_flat == n_tree ==
    n_agree == 1 and agree_ppm == 1e6. (The real-fixture disagreement
    level is pinned by the DuckDB oracle in test_queries.)"""
    dim = 8
    rows = []
    for g in range(4):
        for i in range(4):
            v = [0.0] * dim
            v[g] = 100.0 * (g + 1)
            v[4 + (i % 4) // 2] = 1.0 + i
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
        for r in REGISTRY["q189_tree_flat_agreement"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    assert got == [(code, 1, 1, 1, 1_000_000) for code in range(16)]


def _synthetic_embeddings(tmp_path, n=24, dim=6):
    """Deterministic small corpus with no duplicate vectors (n < 29
    keeps the residue pattern collision-free)."""
    rows = []
    for v in range(n):
        vec = [((v * 7 + d * 13) % 29) / 7.0 - 2.0 for d in range(dim)]
        rows.append((v, vec))
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[0] % 3 for r in rows],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)


@pytest.mark.parametrize(
    "k,branch",
    [(5, 2), (10, 3), (12, 4), (16, 4), (24, 3)],
)
def test_tree_walk_cross_engine_at_odd_shapes(spark, tmp_path, k, branch):
    """The generated oracle chain must replay the Spark walk at ANY
    (leaves, branch) — including non-powers of branch, where the last
    subtree of each level is PARTIAL (the registered q183/q188 configs
    are exact powers, so only this test exercises the ragged-group
    arithmetic in _tree_levels and the generated gsub/gcur SQL)."""
    import duckdb

    from smartbulkcopy_spark.pipeline.similarity import (
        _TREE_HIST_SELECT,
        _tree_walk_ctes,
        tree_assignment,
    )

    _synthetic_embeddings(tmp_path)
    got = [
        tuple(r)
        for r in tree_assignment(
            spark, str(tmp_path), k=k, branch=branch
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = con.execute(
        "WITH " + _tree_walk_ctes(k, branch) + _TREE_HIST_SELECT
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert sum(r[1] for r in got) == 24  # every vector assigned once


def test_q189_fixture_invariants(spark, sf_dir):
    """Both assignments conserve the corpus; agreements can't exceed
    either marginal; ppm bounded."""
    n_emb = table(spark, sf_dir, "embeddings").count()
    rows = REGISTRY["q189_tree_flat_agreement"].fn(spark, sf_dir).collect()
    release_caches()
    assert sum(r["n_flat"] for r in rows) == n_emb
    assert sum(r["n_tree"] for r in rows) == n_emb
    for r in rows:
        assert r["n_agree"] <= min(r["n_flat"], r["n_tree"])
        assert 0 <= r["agree_ppm"] <= 1_000_000


def test_q190_recall_shape(spark, sf_dir):
    """Single-row contract: hits <= 10, hits <= n_list, recall_pct is
    exactly hits x 10, and the scanned list is a strict subset of the
    corpus (the probe actually pruned)."""
    n_emb = table(spark, sf_dir, "embeddings").count()
    rows = REGISTRY["q190_tree_probe_recall"].fn(spark, sf_dir).collect()
    release_caches()
    assert len(rows) == 1
    r = rows[0]
    assert r["method"] == "tree_probe"
    assert 0 <= r["hits"] <= 10
    assert r["hits"] <= r["n_list"]
    assert r["recall_pct"] == r["hits"] * 10
    assert 0 < r["n_list"] < n_emb - 1


def test_q190_routing_and_recall_on_satellite_corpus(spark, tmp_path):
    """Hand-built probe pin: the 16 separated leaves (q183 corpus) plus
    two near-identical SATELLITES per leaf (tiny perturbation in an
    unused dimension). Satellites must route to their own leaf, so the
    query's scanned list is exactly its two satellites — and both sit
    at the top of the exact cosine ranking, so hits == n_list == 2.
    A routing error at either level scatters satellites to other lists
    (n_list wrong); a rerank error drops a near-duplicate from the
    top-10 (hits wrong)."""
    dim = 8
    rows = []
    for g in range(4):
        for i in range(4):
            v = [0.0] * dim
            v[g] = 100.0 * (g + 1)
            v[4 + (i % 4) // 2] = 1.0 + i
            rows.append((4 * g + i, v))
    for s in range(16, 48):
        leaf_vec = list(rows[s % 16][1])
        leaf_vec[6] = 0.0001 * s  # near-duplicate of its leaf
        rows.append((s, leaf_vec))
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [r[0] % 16 for r in rows],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got = (
        REGISTRY["q190_tree_probe_recall"].fn(spark, str(tmp_path)).collect()
    )
    release_caches()
    assert len(got) == 1
    r = got[0]
    assert r["n_list"] == 2  # the query leaf's two satellites, only
    assert r["hits"] == 2  # both are exact near-duplicates -> top-10
    assert r["recall_pct"] == 20


def test_q191_histogram_conserves_fingerprints(spark, sf_dir):
    """sum(sz x n_fps) must equal the total (doc, fph) posting rows,
    every sz appears once, and the dropped flag is exactly
    sz > WINNOW_MAX_POSTINGS."""
    from smartbulkcopy_spark.pipeline.dedup import (
        WINNOW_MAX_POSTINGS,
        winnow_fingerprints,
    )

    total = winnow_fingerprints(spark, sf_dir).count()
    rows = (
        REGISTRY["q191_winnow_posting_histogram"].fn(spark, sf_dir).collect()
    )
    assert sum(r["sz"] * r["n_fps"] for r in rows) == total
    assert len({r["sz"] for r in rows}) == len(rows)
    for r in rows:
        assert r["dropped"] == (r["sz"] > WINNOW_MAX_POSTINGS)


def test_tree_multiprobe_recall_monotone(spark, sf_dir):
    """Round-12 stage (builder-only): the probe-N recall curve must be
    monotone non-decreasing and the scanned list strictly grows with
    n_probe; at n_probe=1 the probe set is the query's own routed leaf,
    so the candidates match q190's single-list search exactly."""
    from smartbulkcopy_spark.pipeline.similarity import (
        _min_vec_id,
        q30,
        tree_multiprobe_search,
        tree_probe_search,
    )

    qid = _min_vec_id(spark, sf_dir)
    exact = {r["vec_id"] for r in q30(spark, sf_dir).collect()}

    single_cand, _ = tree_probe_search(spark, sf_dir, qid)
    single_ids = {r["vec_id"] for r in single_cand.collect()}

    prev_hits, prev_n = -1, 0
    for n_probe in (1, 2, 4):
        cand, topk = tree_multiprobe_search(
            spark, sf_dir, qid, k=10, n_probe=n_probe
        )
        ids = {r["vec_id"] for r in cand.collect()}
        hits = sum(
            1 for r in topk.collect() if r["vec_id"] in exact
        )
        if n_probe == 1:
            assert ids == single_ids  # same list as q190's router
        assert len(ids) >= prev_n  # probes only ADD lists
        assert hits >= prev_hits  # recall monotone in n_probe
        prev_hits, prev_n = hits, len(ids)
    release_caches()


def test_winnow_drop_share_consistency(spark, sf_dir):
    """Round-12 stage (builder-only): per-doc totals must reconcile
    with the raw fingerprint table and with q191's histogram — the sum
    of n_dropped equals the posting mass of the over-cap lists, and
    drop_ppm is bounded."""
    from smartbulkcopy_spark.pipeline.dedup import (
        WINNOW_MAX_POSTINGS,
        winnow_drop_share,
        winnow_fingerprints,
    )

    total = winnow_fingerprints(spark, sf_dir).count()
    hist = (
        REGISTRY["q191_winnow_posting_histogram"].fn(spark, sf_dir).collect()
    )
    dropped_mass = sum(
        r["sz"] * r["n_fps"] for r in hist if r["dropped"]
    )
    rows = winnow_drop_share(spark, sf_dir).collect()
    assert sum(r["n_fps"] for r in rows) == total
    assert sum(r["n_dropped"] for r in rows) == dropped_mass
    for r in rows:
        assert 0 <= r["n_dropped"] <= r["n_fps"]
        assert 0 <= r["drop_ppm"] <= 1_000_000


def _mini_docs(tmp_path, texts):
    _mini_docs_ids(tmp_path, list(range(len(texts))), texts)


def _mini_docs_ids(tmp_path, ids, texts):
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_bigram_lm_fit_hand_corpus(spark, tmp_path):
    """Round-12 stage (builder-only): exact add-one arithmetic on a
    hand corpus where V, the context counts, and every smoothed
    probability are computable by eye. V = {a, b, z} = 3; c1(a) = 3;
    p(a,a) = (2+1)*1e6 // (3+3) = 500000, p(a,b) = (1+1)*1e6 // 6 =
    333333. The single-token and empty docs must both come back as
    zero rows of the LEFT join (and 'z' must still count toward V)."""
    import duckdb

    from smartbulkcopy_spark.pipeline.text import (
        _bigram_lm_oracle,
        bigram_lm_fit,
    )

    _mini_docs(tmp_path, ["a a a", "a b", "z", ""])
    got = [tuple(r) for r in bigram_lm_fit(spark, str(tmp_path)).collect()]
    assert got == [
        (0, 2, 500000, 500000),
        (1, 1, 333333, 333333),
        (2, 0, 0, 0),
        (3, 0, 0, 0),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == [tuple(r) for r in con.execute(_bigram_lm_oracle()).fetchall()]


def test_bigram_lm_fit_fixture_invariants(spark, sf_dir, duck):
    """One row per document; bigram mass reconciles with the token
    stream (sum n_bigrams == total tokens minus non-empty docs); the
    integer probabilities are bounded and min <= mean; and the drafted
    DuckDB oracle replays the Spark result row-for-row on the fixture."""
    from smartbulkcopy_spark.pipeline.text import (
        _bigram_lm_oracle,
        _tokens,
        bigram_lm_fit,
        norm_text,
    )

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_nonempty = docs.where(F.trim(norm_text()) != "").count()
    n_tokens = _tokens(spark, sf_dir).count()

    rows = bigram_lm_fit(spark, sf_dir).collect()
    assert len(rows) == n_docs
    assert sum(r["n_bigrams"] for r in rows) == n_tokens - n_nonempty
    for r in rows:
        assert 0 <= r["min_p_e6"] <= r["mean_p_e6"] <= 1_000_000 or (
            r["n_bigrams"] == 0
            and r["mean_p_e6"] == 0
            and r["min_p_e6"] == 0
        )
    want = [tuple(r) for r in duck.execute(_bigram_lm_oracle()).fetchall()]
    assert [tuple(r) for r in rows] == want


def _py_split(vid: int) -> str:
    """The q50 90/5/5 policy recomputed independently (hashlib, not
    either engine)."""
    import hashlib

    b = int(hashlib.md5(str(vid).encode()).hexdigest()[:4], 16) % 100
    return "train" if b < 90 else ("val" if b < 95 else "test")


def test_embedding_split_leakage_reconciles_with_q33(spark, sf_dir, duck):
    """Round-12 stage (builder-only): the leak rollup must be exactly
    the q33 pair set restricted to one-side-train pairs, grouped on the
    eval side — recomputed here driver-side with hashlib as the
    independent split arbiter — and the drafted oracle must replay it."""
    from collections import defaultdict

    from smartbulkcopy_spark.pipeline.similarity import (
        _split_leakage_oracle,
        embedding_split_leakage,
        q33,
    )

    pairs = [tuple(r) for r in q33(spark, sf_dir).collect()]
    want = defaultdict(lambda: [0, -(10**9)])
    for a_id, b_id, cos_e4 in pairs:
        sa, sb = _py_split(a_id), _py_split(b_id)
        if (sa == "train") == (sb == "train"):
            continue
        ev, sp = (b_id, sb) if sa == "train" else (a_id, sa)
        want[(ev, sp)][0] += 1
        want[(ev, sp)][1] = max(want[(ev, sp)][1], cos_e4)

    rows = embedding_split_leakage(spark, sf_dir).collect()
    release_caches()
    got = {
        (r["vec_id"], r["split"]): [r["n_train_dups"], r["max_cos_e4"]]
        for r in rows
    }
    assert got == dict(want)
    assert all(sp in ("val", "test") for _, sp in got)
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in duck.execute(_split_leakage_oracle()).fetchall()
    ]


def test_soft_dedup_weights_reconciles(spark, sf_dir, duck):
    """Round-12 stage (builder-only): soft dedup must agree with q69 on
    every clustered doc's (rep, size), default singletons to their own
    cluster of 1 at weight 1e6, decide kept with the salted md5 coin
    (recomputed here with hashlib as the independent arbiter — and a
    singleton's coin < 1e6 always, so no surviving-alone doc is ever
    dropped), and the drafted DuckDB oracle must replay it all."""
    import hashlib

    from smartbulkcopy_spark.pipeline.dedup import (
        _soft_dedup_oracle,
        soft_dedup_weights,
    )

    q69 = {
        r["doc_id"]: r["cluster_rep"]
        for r in REGISTRY["q69_dedup_clusters"].fn(spark, sf_dir).collect()
    }
    from collections import Counter

    sizes = Counter(q69.values())

    rows = soft_dedup_weights(spark, sf_dir).collect()
    release_caches()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        if r["doc_id"] in q69:
            assert r["cluster_rep"] == q69[r["doc_id"]]
            assert r["cluster_size"] == sizes[r["cluster_rep"]]
        else:
            assert r["cluster_rep"] == r["doc_id"]
            assert r["cluster_size"] == 1
            assert r["kept"]  # singletons always survive
        assert r["weight_ppm"] == 1_000_000 // r["cluster_size"]
        u = (
            int(
                hashlib.md5(f"soft:{r['doc_id']}".encode()).hexdigest()[:8],
                16,
            )
            % 1_000_000
        )
        assert r["kept"] == (u < r["weight_ppm"])

    want = [tuple(r) for r in duck.execute(_soft_dedup_oracle()).fetchall()]
    assert [tuple(r) for r in rows] == want


def test_staged_builders_plan_shapes(spark, sf_dir):
    """The registry-wide no-BNLJ/no-cartesian contract (test_plans),
    applied to the round-12 staged builders BEFORE registration — a
    staged op must never wait until wiring day to learn its joins
    degenerate."""
    from smartbulkcopy_spark.pipeline.dedup import (
        soft_dedup_weights,
        winnow_drop_share,
    )
    from smartbulkcopy_spark.pipeline.similarity import (
        _min_vec_id,
        embedding_split_leakage,
        tree_multiprobe_search,
    )
    from smartbulkcopy_spark.pipeline.text import bigram_lm_fit

    spark.catalog.clearCache()  # persisted upstreams change plan shapes
    qid = _min_vec_id(spark, sf_dir)
    dfs = [
        bigram_lm_fit(spark, sf_dir),
        embedding_split_leakage(spark, sf_dir),
        soft_dedup_weights(spark, sf_dir),
        winnow_drop_share(spark, sf_dir),
        *tree_multiprobe_search(spark, sf_dir, qid, n_probe=2),
    ]
    for df in dfs:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan
    release_caches()


def test_drop_share_oracle_replays_builder(spark, sf_dir, duck):
    """The drafted drop-share oracle must replay the Spark builder
    row-for-row on the fixture (registration wiring becomes a pure
    rename)."""
    from smartbulkcopy_spark.pipeline.dedup import (
        _drop_share_oracle,
        winnow_drop_share,
    )

    got = [tuple(r) for r in winnow_drop_share(spark, sf_dir).collect()]
    want = [tuple(r) for r in duck.execute(_drop_share_oracle()).fetchall()]
    assert got == want


def test_multiprobe_oracle_replays_builder(spark, sf_dir, duck):
    """The drafted multiprobe recall-curve oracle must reproduce, per
    n_probe in (1, 2, 4), exactly the (n_list, hits, recall) the staged
    builder computes — the driver-side d2 leaf ranking and the SQL
    window ranking must agree fold-for-fold, ties included."""
    from smartbulkcopy_spark.pipeline.similarity import (
        _min_vec_id,
        _multiprobe_oracle,
        q30,
        tree_multiprobe_search,
    )

    qid = _min_vec_id(spark, sf_dir)
    exact = {r["vec_id"] for r in q30(spark, sf_dir).collect()}
    got = []
    for p in (1, 2, 4):
        cand, topk = tree_multiprobe_search(spark, sf_dir, qid, n_probe=p)
        n_list = cand.count()
        hits = sum(1 for r in topk.collect() if r["vec_id"] in exact)
        got.append((p, n_list, hits, hits * 10))
    release_caches()
    want = [tuple(r) for r in duck.execute(_multiprobe_oracle()).fetchall()]
    assert got == want


def test_quality_calibration_reconciles(spark, sf_dir, duck):
    """Round-12 stage (builder-only): the calibration curve must
    conserve the corpus, its bin populations must equal a driver-side
    rebinning of q120's own scores (floor semantics, negative bins
    included), per-bin means must be bounded by the q25 signal ranges,
    and the drafted oracle must replay it."""
    from smartbulkcopy_spark.pipeline.text import (
        CAL_BIN,
        _calibration_oracle,
        quality_score_calibration,
    )

    import math

    scores = {
        r["doc_id"]: r["score"]
        for r in REGISTRY["q120_hashed_linear_quality"]
        .fn(spark, sf_dir)
        .collect()
    }
    from collections import Counter

    want_bins = Counter(
        math.floor(s / CAL_BIN) for s in scores.values()
    )

    rows = quality_score_calibration(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == len(scores)
    assert {r["bin"]: r["n_docs"] for r in rows} == dict(want_bins)
    for r in rows:
        assert 0 <= r["mean_alpha_pct"] <= 100
        assert 0 <= r["mean_space_pct"] <= 100
        assert r["mean_tokens"] >= 0
    assert [tuple(r) for r in rows] == [
        tuple(r) for r in duck.execute(_calibration_oracle()).fetchall()
    ]


def _hot_band_corpus(tmp_path, n_hot=20, n_cold=5, split=None):
    """Hand corpus for the star-fallback regime: `n_hot` verbatim
    copies of one text (every band bucket = n_hot > MINHASH_CLIQUE_CAP
    -> star), `n_cold` copies of another (bucket = n_cold <= cap ->
    clique), plus two distinct singletons. With `split`, ids >= split
    become the q63 'new batch' instead."""
    x = "the quick brown fox jumps over the lazy dog again and again"
    y = "pack my box with five dozen liquor jugs before the dawn breaks"
    texts = [x] * n_hot + [y] * n_cold + [
        "completely unrelated content block one with many unique grams",
        "another entirely distinct document with its own shingle space",
    ]
    ids = list(range(len(texts)))
    if split is not None:
        # place one hot-family copy and one cold copy in the new batch
        ids = ids[:-2] + [split + 1, split + 2]
        texts = texts[:-2] + [x, y]
    _mini_docs_ids(tmp_path, ids, texts)
    return ids


def test_hot_band_star_fallback_cross_engine(spark, tmp_path):
    """The star+chain regime, which no fixture scale reaches (all
    buckets <= 6 < cap): 20 verbatim copies share every band, so the
    candidate set must be exactly the 19 star edges (0, m) plus the 18
    extra chain edges (m, m+1) — never the 190-pair clique — while the
    5-copy family still enumerates its full 10-pair clique. Spark and
    the oracle must agree pair-for-pair, and the downstream cluster
    operator must keep both families CONNECTED (the old skip-the-band
    rule lost the hot family entirely; the chain additionally keeps
    co-located subfamilies of a MIXED hot band connected when they
    fail the rep verify)."""
    import duckdb

    from smartbulkcopy_spark.pipeline.dedup import MINHASH_CLIQUE_CAP

    assert MINHASH_CLIQUE_CAP == 16  # the corpus is sized around it
    _hot_band_corpus(tmp_path)
    got = [
        tuple(r)
        for r in REGISTRY["q27_minhash_lsh_pairs"]
        .fn(spark, str(tmp_path))
        .orderBy("a_id", "b_id")
        .collect()
    ]
    star = [(0, m) for m in range(1, 20)]
    chain = [(m, m + 1) for m in range(0, 19)]
    clique = [
        (a, b) for a in range(20, 25) for b in range(a + 1, 25)
    ]
    assert got == sorted(set(star + chain + clique))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(
            REGISTRY["q27_minhash_lsh_pairs"].oracle
        ).fetchall()
    ]
    assert got == want

    clusters = {
        r["doc_id"]: r["cluster_rep"]
        for r in REGISTRY["q69_dedup_clusters"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    release_caches()
    assert clusters == {
        **{m: 0 for m in range(20)},
        **{m: 20 for m in range(20, 25)},
    }
    assert [
        tuple(r)
        for r in con.execute(
            REGISTRY["q69_dedup_clusters"].oracle
        ).fetchall()
    ] == sorted(clusters.items())


def test_hot_band_star_incremental_cross_engine(spark, tmp_path):
    """q63's cross-side star rule: a new doc landing in a HOT old-index
    band verifies against the band's BOUNDED representative set — its
    MINHASH_CLIQUE_CAP lowest doc_ids, not a single rep (dedup.py's
    bounded-representative-set comment) — and is still flagged a
    duplicate; a new doc landing in a cold band keeps the full
    old-candidate join. Spark and oracle agree row-for-row."""
    import duckdb

    from smartbulkcopy_spark.pipeline.dedup import INCREMENTAL_SPLIT_ID

    _hot_band_corpus(tmp_path, split=INCREMENTAL_SPLIT_ID)
    got = [
        tuple(r)
        for r in REGISTRY["q63_incremental_dedup"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    release_caches()
    # new hot-family copy dups the hot band's rep (doc 0); new cold
    # copy dups the oldest cold member (doc 20); both exact -> j=1000
    assert got == [
        (INCREMENTAL_SPLIT_ID + 1, 0, 1000),
        (INCREMENTAL_SPLIT_ID + 2, 20, 1000),
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{tmp_path}/documents.parquet')"
    )
    assert got == [
        tuple(r)
        for r in con.execute(
            REGISTRY["q63_incremental_dedup"].oracle
        ).fetchall()
    ]
