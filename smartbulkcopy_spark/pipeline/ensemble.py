"""Ensemble deduplication: the lexical (MinHash-LSH + exact-Jaccard) and
semantic (hyperplane-bucketed cosine) near-dup detectors disagree in
informative ways — lexical-only pairs are verbatim/templated copies whose
embeddings drifted (paraphrase-destroying edits), semantic-only pairs are
paraphrases sharing few shingles. A production curation pass runs BOTH and
reviews the disagreement set; this module is that audit.

No reference analog — Phase-5 pipeline operator (SURVEY §7.2). The
documents and embeddings tables are id-aligned 1:1 (q57 reconciles them),
so a (doc) pair and a (vec) pair with the same ids describe the same
document pair.

Scale design (100 TB): both pair sets come from their existing BUCKETED
generators (LSH bands / hyperplane buckets — never all-pairs); this module
adds only id-keyed joins on the two (tiny) verified pair sets.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from smartbulkcopy_spark.pipeline.dedup import (
    SIMHASH64_HAMMING_MAX,
    simhash_pairs_cte_duck,
)
from smartbulkcopy_spark.queries import eager, register


def _sem_pairs_cte_duck() -> str:
    """q33's bucketed cosine pair chain with ensemble-local CTE names
    (the lexical chain already owns `vp`/`sh`/`cand`)."""
    from smartbulkcopy_spark.pipeline.similarity import (
        NEAR_DUP_COS,
        _dot_duck,
        bucket_expr,
    )

    cos = (
        f"{_dot_duck('x.embedding', 'y.embedding')}"
        f" / (sqrt({_dot_duck('x.embedding', 'x.embedding')})"
        f" * sqrt({_dot_duck('y.embedding', 'y.embedding')}))"
    )
    return (
        " eb AS (SELECT vec_id, embedding,"
        f" CAST({bucket_expr('duck')} AS BIGINT) AS bk FROM embeddings),"
        " semvp AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id"
        " FROM eb x JOIN eb y ON x.bk = y.bk AND x.vec_id < y.vec_id"
        f" WHERE {cos} >= {NEAR_DUP_COS})"
    )


def _lex_pairs_cte_duck() -> str:
    """The q69 verified-pair chain (cand -> sh -> jac -> vp)."""
    from smartbulkcopy_spark.pipeline.dedup import (
        NEAR_DUP_JACCARD_MILLIS,
        _candidate_cte_duck,
        shingle_set_expr,
    )

    return (
        _candidate_cte_duck() + ","
        f" sh AS (SELECT doc_id, {shingle_set_expr('duck')} AS s"
        " FROM documents),"
        " jac AS (SELECT c.a_id, c.b_id,"
        " CAST(floor(1000.0 * len(list_intersect(sa.s, sb.s))"
        "   / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))))"
        " AS BIGINT) AS j"
        " FROM cand c JOIN sh sa ON sa.doc_id = c.a_id"
        " JOIN sh sb ON sb.doc_id = c.b_id),"
        " vp AS (SELECT a_id, b_id FROM jac"
        f" WHERE j >= {NEAR_DUP_JACCARD_MILLIS})"
    )


@register(
    "q94_ensemble_dedup",
    "WITH " + _lex_pairs_cte_duck() + "," + _sem_pairs_cte_duck() + ","
    " u AS (SELECT a_id, b_id FROM vp"
    " UNION SELECT a_id, b_id FROM semvp)"
    " SELECT u.a_id, u.b_id,"
    " (l.a_id IS NOT NULL) AS lexical,"
    " (s.a_id IS NOT NULL) AS semantic"
    " FROM u LEFT JOIN vp l ON u.a_id = l.a_id AND u.b_id = l.b_id"
    " LEFT JOIN semvp s ON u.a_id = s.a_id AND u.b_id = s.b_id"
    " ORDER BY u.a_id, u.b_id",
    doc="Ensemble near-dup audit: the union of the lexical verified-pair"
    " set (q29/q69's banded-LSH + exact-Jaccard chain) and the semantic"
    " pair set (q33's hyperplane-bucketed cosine), flagged by which"
    " detector fired. lexical-only = verbatim/templated copies whose"
    " embeddings drifted; semantic-only = paraphrases sharing few"
    " shingles; both = hard duplicates. Both generators stay bucketed"
    " (never all-pairs); this operator adds only id-keyed joins on the"
    " two tiny verified pair sets.",
)
def q94(spark, sf_dir):
    from smartbulkcopy_spark.pipeline.dedup import verified_pairs
    from smartbulkcopy_spark.pipeline.similarity import q33

    # Each pair set feeds TWO consumers (the union and its marker
    # join); eager() so the expensive verify chains run once (q33/q69
    # pattern — a lazy persist would let the consumers race) and the
    # cache is tracked for queries.release_caches() in long sessions.
    lex = eager(verified_pairs(spark, sf_dir).select("a_id", "b_id"))
    sem = eager(q33(spark, sf_dir).select("a_id", "b_id"))
    return ensemble_pairs(lex, sem)


def ensemble_pairs(lex, sem):
    """(a_id, b_id, lexical, semantic) over two verified pair frames.
    Callers must have persisted the inputs — each feeds the union AND
    its own marker join (q94 and detector_report do; see eager())."""
    u = lex.union(sem).distinct()
    lmark = lex.withColumn("lex", F.lit(True))
    smark = sem.withColumn("sem", F.lit(True))
    return (
        u.join(lmark, ["a_id", "b_id"], "left")
        .join(smark, ["a_id", "b_id"], "left")
        .select(
            "a_id",
            "b_id",
            F.coalesce(F.col("lex"), F.lit(False)).alias("lexical"),
            F.coalesce(F.col("sem"), F.lit(False)).alias("semantic"),
        )
        .orderBy("a_id", "b_id")
    )


@register(
    "q115_detector_agreement",
    "WITH " + _lex_pairs_cte_duck() + "," + _sem_pairs_cte_duck() + ","
    + simhash_pairs_cte_duck("sx")
    + ", sxvp AS (SELECT a_id, b_id FROM sxham"
    f" WHERE hamming <= {SIMHASH64_HAMMING_MAX}),"
    " u AS (SELECT a_id, b_id FROM vp"
    " UNION SELECT a_id, b_id FROM semvp"
    " UNION SELECT a_id, b_id FROM sxvp),"
    " m AS (SELECT u.a_id, u.b_id,"
    " (l.a_id IS NOT NULL) AS lexical,"
    " (s.a_id IS NOT NULL) AS semantic,"
    " (x.a_id IS NOT NULL) AS simhash"
    " FROM u LEFT JOIN vp l ON u.a_id = l.a_id AND u.b_id = l.b_id"
    " LEFT JOIN semvp s ON u.a_id = s.a_id AND u.b_id = s.b_id"
    " LEFT JOIN sxvp x ON u.a_id = x.a_id AND u.b_id = x.b_id)"
    " SELECT lexical, semantic, simhash,"
    " CAST(count(*) AS BIGINT) AS n_pairs"
    " FROM m GROUP BY lexical, semantic, simhash"
    " ORDER BY lexical, semantic, simhash",
    doc="Three-detector agreement matrix: every verified near-dup pair"
    " from the lexical (MinHash + exact Jaccard), semantic (bucketed"
    " cosine), and SimHash (64-bit Hamming) detectors, rolled up by"
    " which detector combination fired — the calibration readout that"
    " decides whether the detectors are redundant (mass on the"
    " all-true cell) or complementary (mass on single-detector cells)"
    " before paying for all three at 100 TB. Each pair set comes from"
    " its existing bucketed generator and persists once; the matrix"
    " itself is <= 7 rows from id-keyed joins on the tiny pair sets.",
)
def q115(spark, sf_dir):
    from smartbulkcopy_spark.pipeline.dedup import (
        simhash_near_dup_pairs,
        verified_pairs,
    )
    from smartbulkcopy_spark.pipeline.similarity import q33

    lex = eager(verified_pairs(spark, sf_dir).select("a_id", "b_id"))
    sem = eager(q33(spark, sf_dir).select("a_id", "b_id"))
    shp = eager(
        simhash_near_dup_pairs(spark, sf_dir).select("a_id", "b_id")
    )
    return detector_agreement(lex, sem, shp)


def detector_agreement(lex, sem, shx):
    """(lexical, semantic, simhash, n_pairs) agreement matrix over
    three verified pair frames. Callers must have persisted the inputs
    — each feeds the union AND its own marker join."""
    u = lex.union(sem).union(shx).distinct()
    lm = lex.withColumn("lex", F.lit(True))
    sm = sem.withColumn("sem", F.lit(True))
    xm = shx.withColumn("shx", F.lit(True))
    return (
        u.join(lm, ["a_id", "b_id"], "left")
        .join(sm, ["a_id", "b_id"], "left")
        .join(xm, ["a_id", "b_id"], "left")
        .select(
            F.coalesce(F.col("lex"), F.lit(False)).alias("lexical"),
            F.coalesce(F.col("sem"), F.lit(False)).alias("semantic"),
            F.coalesce(F.col("shx"), F.lit(False)).alias("simhash"),
        )
        .groupBy("lexical", "semantic", "simhash")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("lexical", "semantic", "simhash")
    )
