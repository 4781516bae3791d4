"""The assembled corpus-curation pipeline: every cleaning stage the
engine implements, composed end-to-end into one declarative plan —
exact dedup (q21 keep-first) ∩ near-dup dedup (q34 LSH→verify→anti-join)
∩ minimum-quality filter ∩ mixture resampling (q56 weights), then split
assignment (q50) and per-split stats / a partitioned parquet export.

No reference analog (the reference moves tables; this is what the moved
corpus is FOR) — Phase-5 pipeline assembly (SURVEY §7.2).

Scale notes (100 TB):
- The pipeline is one declarative plan with a single deliberate
  materialization: the LSH candidate id set (tiny — id pairs, not
  documents) is persisted so the exact-Jaccard verify stage can be
  LEFT-SEMI thinned to candidate members before shingle sets are built.
  Every other stage stays lazy: the keep-filters (token minimum, mixture
  hash) collapse into the scans and the wide operations are the ones the
  component operators already pay — the content-hash groupBy, the
  banded-LSH candidate pipeline, and the final per-split aggregate.
- Both dedup keep-lists join as LEFT SEMI on doc_id — ids only, never
  text — and the row-local filters are applied before the joins, so the
  semi-join probe side is already thinned.
- The export writes partitioned-by-split parquet: downstream trainers
  prune to their split at the directory level, and writer parallelism is
  the upstream partitioning (no global sort, no single-writer funnel).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from smartbulkcopy_spark.pipeline.dedup import (
    _jac_cte_duck,
    NEAR_DUP_JACCARD_MILLIS,
    verified_pairs,
)
from smartbulkcopy_spark.pipeline.text import (
    _MIX_BUCKET_DUCK,
    _MIX_RATE_SQL,
    NORM_SQL_DUCK,
    SPLIT_CASE_DUCK,
    TOKENS_SQL_DUCK,
    exact_key_cols,
    mix_keep_col,
    norm_text,
    split_col,
    token_count,
)
from smartbulkcopy_spark.queries import register, table

# Minimum whitespace-token count for a document to survive curation
# (fixture tokens span 10..99; 25 drops the thin tail).
MIN_TOKENS = 25


def curated_docs(spark, sf_dir, pairs=None):
    """The curated corpus as one lazy plan: documents surviving exact
    dedup, near-dup dedup, the token minimum, and mixture resampling,
    with their split assignment attached.

    pairs: optional precomputed verified-pair DataFrame (a_id, b_id) —
    see `dedup.verified_pairs`. The composed `curate()` entry point
    persists one pair set and injects it here AND into the cluster
    labeler, so a production run pays for LSH + Jaccard verification
    exactly once; when omitted (the registered q61 path, graded in
    isolation) the pairs are computed inline."""
    docs = table(spark, sf_dir, "documents")

    keep_exact = (
        docs.select("doc_id", F.md5(norm_text()).alias("hx"))
        .groupBy(*exact_key_cols())
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    if pairs is None:
        pairs = verified_pairs(spark, sf_dir)
    drops = pairs.select(F.col("b_id").alias("doc_id")).distinct()

    return (
        docs.withColumn("n_tokens", token_count().cast("long"))
        .where((F.col("n_tokens") >= MIN_TOKENS) & mix_keep_col())
        .join(keep_exact, "doc_id", "left_semi")
        .join(drops, "doc_id", "left_anti")
        .withColumn("split", split_col())
    )


def curate(spark, sf_dir: str, out_dir: str):
    """Run the full curation pipeline and export the surviving corpus as
    split-partitioned parquet; returns the per-split stats DataFrame
    (same answer as q61).

    The verified near-dup pair set is materialized ONCE here and shared
    by every consumer (the pair-local drop filter; a cluster labeler if
    the caller extends the plan) — the expensive LSH + Jaccard stage is
    not recomputed per consumer the way isolated per-query grading does."""
    pairs = verified_pairs(spark, sf_dir).persist()
    try:
        pairs.count()  # materialize before fan-out to consumers
        kept = curated_docs(spark, sf_dir, pairs=pairs)
        (
            kept.select(
                "doc_id", "text", "lang", "source", "n_tokens", "split"
            )
            .write.partitionBy("split")
            .mode("overwrite")
            .parquet(out_dir)
        )
    finally:
        pairs.unpersist()
    return (
        spark.read.parquet(out_dir)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split")
    )


@register(
    "q61_curation_stats",
    "WITH " + _jac_cte_duck() + ","
    f" keepx AS (SELECT min(doc_id) AS doc_id FROM"
    f" (SELECT doc_id, md5({NORM_SQL_DUCK}) AS hx FROM documents)"
    " GROUP BY substr(hx, 1, 15), substr(hx, 16, 15)),"
    " base AS (SELECT doc_id,"
    f" CAST({TOKENS_SQL_DUCK} AS BIGINT) AS n_tokens,"
    " CAST(substr(source, 4) AS INT) AS si,"
    f" {_MIX_BUCKET_DUCK} AS mb,"
    f" {SPLIT_CASE_DUCK} AS split"
    " FROM documents),"
    " final AS (SELECT b.split, b.n_tokens FROM base b"
    " JOIN keepx k ON k.doc_id = b.doc_id"
    f" WHERE b.n_tokens >= {MIN_TOKENS}"
    f" AND b.mb < {_MIX_RATE_SQL}"
    " AND b.doc_id NOT IN (SELECT b_id FROM jac"
    f" WHERE j >= {NEAR_DUP_JACCARD_MILLIS}))"
    " SELECT split, count(*) AS n_docs,"
    " CAST(sum(n_tokens) AS BIGINT) AS total_tokens"
    " FROM final GROUP BY split ORDER BY split",
    doc="Per-split stats of the fully-curated corpus — exact dedup ∩"
    " near-dup dedup ∩ token minimum ∩ mixture resampling, then q50"
    " split assignment — the acceptance report of the whole pipeline"
    " composed as ONE declarative plan (see pipeline/curate.py for the"
    " partitioned-parquet export of the same plan). Row-local filters"
    " precede the id-only semi/anti joins; the only wide stages are the"
    " ones the component operators already pay.",
)
def q61(spark, sf_dir):
    return (
        curated_docs(spark, sf_dir)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("split")
    )


_FUNNEL_STAGES = [
    (0, "raw"),
    (1, "token_min"),
    (2, "mixture"),
    (3, "exact_dedup"),
    (4, "near_dup"),
]


@register(
    "q105_curation_funnel",
    "WITH " + _jac_cte_duck() + ","
    f" keepx AS (SELECT min(doc_id) AS doc_id FROM"
    f" (SELECT doc_id, md5({NORM_SQL_DUCK}) AS hx FROM documents)"
    " GROUP BY substr(hx, 1, 15), substr(hx, 16, 15)),"
    " base AS (SELECT doc_id,"
    f" CAST({TOKENS_SQL_DUCK} AS BIGINT) AS n_tokens,"
    " CAST(substr(source, 4) AS INT) AS si,"
    f" {_MIX_BUCKET_DUCK} AS mb FROM documents),"
    f" s1 AS (SELECT doc_id FROM base WHERE n_tokens >= {MIN_TOKENS}),"
    f" s2 AS (SELECT doc_id FROM base WHERE n_tokens >= {MIN_TOKENS}"
    f" AND mb < {_MIX_RATE_SQL}),"
    " s3 AS (SELECT s2.doc_id FROM s2 JOIN keepx k"
    " ON k.doc_id = s2.doc_id),"
    " s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN"
    f" (SELECT b_id FROM jac WHERE j >= {NEAR_DUP_JACCARD_MILLIS})),"
    " f AS ("
    " SELECT 0 AS stage_id, 'raw' AS stage,"
    " CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_surviving"
    " UNION ALL SELECT 1, 'token_min',"
    " CAST((SELECT count(*) FROM s1) AS BIGINT)"
    " UNION ALL SELECT 2, 'mixture',"
    " CAST((SELECT count(*) FROM s2) AS BIGINT)"
    " UNION ALL SELECT 3, 'exact_dedup',"
    " CAST((SELECT count(*) FROM s3) AS BIGINT)"
    " UNION ALL SELECT 4, 'near_dup',"
    " CAST((SELECT count(*) FROM s4) AS BIGINT))"
    " SELECT CAST(stage_id AS BIGINT) AS stage_id, stage, n_surviving,"
    " CAST(coalesce(lag(n_surviving) OVER (ORDER BY stage_id)"
    " - n_surviving, 0) AS BIGINT) AS n_dropped"
    " FROM f ORDER BY stage_id",
    doc="The curation funnel: surviving-document counts after each"
    " cumulative stage of the q61 pipeline (raw -> token minimum ->"
    " mixture resampling -> exact dedup -> near-dup dedup), with the"
    " per-stage drop — the operational readout every curation run"
    " ships, showing exactly where the corpus shrinks. SINGLE-PASS:"
    " one corpus scan attaches boolean stage flags (the two id-only"
    " keep/drop markers join onto it), one aggregate takes all five"
    " conditional counts, and the 5-row funnel unpivots from that row"
    " — the corpus is never re-scanned per stage, and the only"
    " expensive input (the near-dup drop list) is the same bucketed"
    " candidates + verify chain every dedup consumer pays.",
)
def q105(spark, sf_dir):
    return curation_funnel(spark, sf_dir)


def curation_funnel(spark, sf_dir, pairs=None):
    """q105 as a composable builder: pairs = optional precomputed
    verified-pair DataFrame (a_id, b_id) — see `dedup_report`, which
    persists one LSH+verify chain and feeds all four dedup audits."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        token_count().cast("long").alias("n_tokens"),
        mix_keep_col().alias("mk"),
    )
    keep_exact = (
        docs.select("doc_id", F.md5(norm_text()).alias("hx"))
        .groupBy(*exact_key_cols())
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(True).alias("kx"))
    )
    if pairs is None:
        pairs = verified_pairs(spark, sf_dir)
    drops = (
        pairs.select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("dp", F.lit(True))
    )
    flagged = (
        base.join(keep_exact, "doc_id", "left")
        .join(drops, "doc_id", "left")
        .select(
            (F.col("n_tokens") >= MIN_TOKENS).alias("f1"),
            "mk",
            F.coalesce(F.col("kx"), F.lit(False)).alias("kx"),
            F.coalesce(F.col("dp"), F.lit(False)).alias("dp"),
        )
        .select(
            "f1",
            (F.col("f1") & F.col("mk")).alias("f2"),
            (F.col("f1") & F.col("mk") & F.col("kx")).alias("f3"),
            (
                F.col("f1") & F.col("mk") & F.col("kx") & ~F.col("dp")
            ).alias("f4"),
        )
    )

    def _n(flag):
        return F.sum(flag.cast("long")).cast("long")

    row = flagged.agg(
        F.count("*").cast("long").alias("n0"),
        _n(F.col("f1")).alias("n1"),
        _n(F.col("f2")).alias("n2"),
        _n(F.col("f3")).alias("n3"),
        _n(F.col("f4")).alias("n4"),
    )
    stack = ", ".join(
        f"{sid}L, '{name}', n{sid}" for sid, name in _FUNNEL_STAGES
    )
    counts = row.selectExpr(
        f"stack({len(_FUNNEL_STAGES)}, {stack})"
        " AS (stage_id, stage, n_surviving)"
    )
    w = Window.orderBy("stage_id")  # 5 funnel rows, never documents
    return (
        counts.withColumn(
            "n_dropped",
            F.coalesce(
                F.lag("n_surviving").over(w) - F.col("n_surviving"),
                F.lit(0),
            ).cast("long"),
        )
        .orderBy("stage_id")
    )


def dedup_report(spark, sf_dir):
    """All four dedup audits from ONE materialization of the expensive
    chain: candidates -> exact Jaccard -> verified pairs runs once
    (eager-persisted), then the funnel (q105), provenance map (q106),
    MinHash-estimator quality (q107), and threshold distribution (q108)
    are derived from the shared pair table — the composed form a
    production curation run uses, where per-query isolation (each
    registered audit recomputing the chain, ~4x the cost) is only a
    grading convention. Answers are identical to the registered queries;
    tests/test_pipeline.py pins both that and the single-materialization
    plan shape. Release the persisted intermediates afterwards with
    queries.release_caches()."""
    from smartbulkcopy_spark.pipeline.dedup import (
        NEAR_DUP_JACCARD_MILLIS,
        dedup_provenance,
        jaccard_distribution,
        jaccard_pairs,
        minhash_estimate_quality,
    )
    from smartbulkcopy_spark.queries import eager

    jac = eager(jaccard_pairs(spark, sf_dir))
    vp = jac.where(
        F.col("jaccard_millis") >= NEAR_DUP_JACCARD_MILLIS
    ).select("a_id", "b_id")
    return {
        "funnel": curation_funnel(spark, sf_dir, pairs=vp),
        "provenance": dedup_provenance(spark, sf_dir, jac=jac),
        "estimator_quality": minhash_estimate_quality(
            spark, sf_dir, jac=jac
        ),
        "threshold_distribution": jaccard_distribution(
            spark, sf_dir, jac=jac
        ),
    }


def detector_report(spark, sf_dir):
    """The full three-detector curation readout from ONE materialization
    of each detector chain: the lexical Jaccard pair table, the semantic
    (bucketed-cosine) pair set, and the SimHash pair set each persist
    exactly once, then the four dedup audits (q105-q108), the
    lexical-x-semantic ensemble (q94), and the three-detector agreement
    matrix (q115) all derive from the shared state. Registered per-query
    isolation recomputes the lexical chain 6x and the other two chains
    2x each — a grading convention, not the production shape; answers
    are identical to the registered queries (pinned in
    tests/test_pipeline.py alongside the single-materialization plan
    shape). Release the persisted intermediates afterwards with
    queries.release_caches()."""
    from smartbulkcopy_spark.pipeline.dedup import (
        NEAR_DUP_JACCARD_MILLIS,
        dedup_provenance,
        jaccard_distribution,
        jaccard_pairs,
        minhash_estimate_quality,
        simhash_near_dup_pairs,
    )
    from smartbulkcopy_spark.pipeline.ensemble import (
        detector_agreement,
        ensemble_pairs,
    )
    from smartbulkcopy_spark.pipeline.similarity import q33
    from smartbulkcopy_spark.queries import eager, eager_parallel

    def _lex_chain():
        jac = eager(jaccard_pairs(spark, sf_dir))
        # vp feeds five consumers (funnel drops + two unions + two
        # marker joins) — persist the thinned id pairs, not just the
        # jac table. vp depends on jac, so both share this builder.
        vp = eager(
            jac.where(
                F.col("jaccard_millis") >= NEAR_DUP_JACCARD_MILLIS
            ).select("a_id", "b_id")
        )
        return jac, vp

    (jac, vp), sem, shx = eager_parallel(
        _lex_chain,
        lambda: eager(q33(spark, sf_dir).select("a_id", "b_id")),
        lambda: eager(
            simhash_near_dup_pairs(spark, sf_dir).select("a_id", "b_id")
        ),
    )
    return {
        "funnel": curation_funnel(spark, sf_dir, pairs=vp),
        "provenance": dedup_provenance(spark, sf_dir, jac=jac),
        "estimator_quality": minhash_estimate_quality(
            spark, sf_dir, jac=jac
        ),
        "threshold_distribution": jaccard_distribution(
            spark, sf_dir, jac=jac
        ),
        "ensemble": ensemble_pairs(vp, sem),
        "agreement": detector_agreement(vp, sem, shx),
    }
