"""Structural invariants of the round-7 operators (q111/q112) beyond
the per-query DuckDB oracle equality (test_queries covers that): these
pin the SEMANTIC contracts — Hamming bounds, pair ordering, and the
exact-duplicate-collides property — that an oracle string shared with
the implementation could not falsify on its own."""

from __future__ import annotations

import pyspark.sql.functions as F

from smartbulkcopy_spark.queries import REGISTRY, table

from .conftest import SF_SMOKE


def _run(name, spark):
    return REGISTRY[name].fn(spark, SF_SMOKE).toPandas()


def test_q111_pair_contract(spark):
    from smartbulkcopy_spark.pipeline.multimodal import IMAGE_HAMMING_MAX

    df = _run("q111_image_near_dup", spark)
    assert len(df) > 0, "fixture must yield image near-dup pairs"
    assert (df["a_id"] < df["b_id"]).all()
    assert df["hamming"].between(0, IMAGE_HAMMING_MAX).all()


def test_q111_exact_text_dups_collide_at_zero(spark):
    """Identical documents produce identical fake blobs, hence identical
    ahashes: every exact text-duplicate pair that became a candidate
    must appear with Hamming 0."""
    df = _run("q111_image_near_dup", spark).set_index(["a_id", "b_id"])
    texts = {
        r["doc_id"]: r["t"]
        for r in table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.coalesce("text", F.lit("")).alias("t"))
        .collect()
    }
    zero_pairs = df[df["hamming"] == 0]
    assert len(zero_pairs) > 0
    # and conversely: any reported pair with equal text must be at 0
    for (a, b), row in df.iterrows():
        if texts[a] == texts[b]:
            assert row["hamming"] == 0, (a, b)


def test_q112_pair_contract_and_hash_consistency(spark):
    from smartbulkcopy_spark.pipeline.dedup import (
        SIMHASH64_HAMMING_MAX,
        simhash64,
    )

    df = _run("q112_simhash_near_dup", spark)
    assert len(df) > 0, "fixture must yield simhash near-dup pairs"
    assert (df["a_id"] < df["b_id"]).all()
    assert df["hamming"].between(0, SIMHASH64_HAMMING_MAX).all()
    # reported Hamming distances must equal a direct recomputation from
    # the signature table (catches banding/verify wiring mistakes)
    sims = {
        r["doc_id"]: (r["sim_hi"], r["sim_lo"])
        for r in simhash64(spark, SF_SMOKE).collect()
    }
    for row in df.itertuples():
        hi_a, lo_a = sims[row.a_id]
        hi_b, lo_b = sims[row.b_id]
        expect = bin(hi_a ^ hi_b).count("1") + bin(lo_a ^ lo_b).count("1")
        assert row.hamming == expect, (row.a_id, row.b_id)


def test_q112_token_multiset_invariance(spark, tmp_path):
    """SimHash is order- and whitespace-blind over the token multiset:
    a reordering or re-spacing of the same tokens must produce the
    IDENTICAL 64-bit signature (the edit class this detector exists to
    catch), while a token substitution must change it."""
    import pandas as pd

    from smartbulkcopy_spark.pipeline.dedup import simhash64

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "dog lazy the over jumps fox brown quick the",  # permutation
        3: "the  quick   brown fox\tjumps over the lazy dog",  # respaced
        4: "the quick brown fox jumps over the lazy cat",  # substitution
    }
    docs = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["src0"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    d = tmp_path / "sf_q112"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet", index=False)
    sims = {
        r["doc_id"]: (r["sim_hi"], r["sim_lo"])
        for r in simhash64(spark, str(d)).collect()
    }
    assert sims[1] == sims[2] == sims[3]
    assert sims[4] != sims[1]
