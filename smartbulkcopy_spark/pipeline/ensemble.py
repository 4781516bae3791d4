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
from smartbulkcopy_spark.queries import eager, eager_parallel, register, sql_darr


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
        f" sh AS MATERIALIZED (SELECT doc_id, {shingle_set_expr('duck')} AS s"
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
    # The two chains are independent, so they materialize concurrently.
    lex, sem = eager_parallel(
        lambda: eager(verified_pairs(spark, sf_dir).select("a_id", "b_id")),
        lambda: eager(q33(spark, sf_dir).select("a_id", "b_id")),
    )
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

    # Three independent chains -> concurrent materialization
    # (eager_parallel: 10.1s -> 5.6s at sf0.1).
    lex, sem, shp = eager_parallel(
        lambda: eager(verified_pairs(spark, sf_dir).select("a_id", "b_id")),
        lambda: eager(q33(spark, sf_dir).select("a_id", "b_id")),
        lambda: eager(
            simhash_near_dup_pairs(spark, sf_dir).select("a_id", "b_id")
        ),
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


# ---------------------------------------------------------------------------
# MinHash-vs-winnowing agreement audit (SURVEY §7.5 round-11 item b) —
# the q115 calibration pattern applied WITHIN the lexical family: the
# two lexical near-dup detectors sample different evidence (MinHash =
# whole-document shingle-set Jaccard; winnowing = localized shared
# fingerprint runs), so their disagreement regions are informative:
# minhash-only pairs are diffuse whole-doc similarity without a long
# shared run, winnowing-only pairs share strong verbatim passages
# inside otherwise-different documents (containment, which symmetric
# Jaccard under-scores). The matrix decides whether running both at
# 100 TB buys coverage or redundancy. Both pair sets come from their
# existing bucketed generators (LSH bands / capped fingerprint posting
# lists — never all-pairs); this operator adds only id-keyed joins on
# the two tiny verified pair sets (q115's scale argument verbatim).
# ---------------------------------------------------------------------------


def _q187_oracle() -> str:
    from smartbulkcopy_spark.pipeline.dedup import (
        Q180_MIN_SHARED_FPS,
        _winnow_pair_ctes,
        _winnow_pk_ctes,
    )

    return (
        "WITH " + _lex_pairs_cte_duck() + ", "
        + _winnow_pk_ctes() + ","
        + _winnow_pair_ctes()
        + ", mvp AS MATERIALIZED (SELECT a_id, b_id FROM vp),"
        " wvp AS MATERIALIZED (SELECT a_id, b_id FROM pr"
        f" WHERE shared_fps >= {Q180_MIN_SHARED_FPS}),"
        " u AS (SELECT a_id, b_id FROM mvp"
        " UNION SELECT a_id, b_id FROM wvp),"
        " m AS (SELECT u.a_id, u.b_id,"
        " (l.a_id IS NOT NULL) AS minhash,"
        " (w.a_id IS NOT NULL) AS winnowing"
        " FROM u LEFT JOIN mvp l ON l.a_id = u.a_id AND l.b_id = u.b_id"
        " LEFT JOIN wvp w ON w.a_id = u.a_id AND w.b_id = u.b_id)"
        " SELECT minhash, winnowing, CAST(count(*) AS BIGINT) AS n_pairs"
        " FROM m GROUP BY minhash, winnowing ORDER BY minhash, winnowing"
    )


@register(
    "q187_lexical_detector_overlap",
    _q187_oracle(),
    doc="MinHash-vs-winnowing agreement matrix — the q115 calibration"
    " readout for the two LEXICAL detectors: every verified pair from"
    " the MinHash chain (banded LSH + exact Jaccard, the q29/q69"
    " verified set) and the strong winnowing set (capped fingerprint"
    " pairs sharing >= the q180 threshold), rolled up by which"
    " detector fired. minhash-only = diffuse whole-doc similarity"
    " without a long shared run; winnowing-only = strong verbatim"
    " passages inside otherwise-different docs (containment, which"
    " symmetric Jaccard under-scores); both = hard duplicates. Both"
    " generators stay bucketed (LSH bands / capped posting lists);"
    " the matrix itself is <= 3 rows from id-keyed joins on the tiny"
    " pair sets, each persisted once (union + its marker join).",
)
def q187(spark, sf_dir):
    from smartbulkcopy_spark.pipeline.dedup import (
        Q180_MIN_SHARED_FPS,
        verified_pairs,
        winnow_capped_pairs,
    )

    def _win_chain():
        _pkf, pr = winnow_capped_pairs(spark, sf_dir)
        return eager(
            pr.where(F.col("shared_fps") >= Q180_MIN_SHARED_FPS).select(
                "a_id", "b_id"
            )
        )

    # MinHash and winnowing chains are independent -> concurrent
    # materialization (eager_parallel; the winnow side's internal pkf
    # eager stays inside its builder thread).
    lex, win = eager_parallel(
        lambda: eager(verified_pairs(spark, sf_dir).select("a_id", "b_id")),
        _win_chain,
    )
    u = lex.union(win).distinct()
    lm = lex.withColumn("mh", F.lit(True))
    wm = win.withColumn("wn", F.lit(True))
    return (
        u.join(lm, ["a_id", "b_id"], "left")
        .join(wm, ["a_id", "b_id"], "left")
        .select(
            F.coalesce(F.col("mh"), F.lit(False)).alias("minhash"),
            F.coalesce(F.col("wn"), F.lit(False)).alias("winnowing"),
        )
        .groupBy("minhash", "winnowing")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("minhash", "winnowing")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of lexical and semantic retrieval. The "more
# like this" corpus probe production actually runs: take a query
# document, rank the corpus lexically (BM25 over the query doc's rarest
# terms) AND semantically (exact cosine to its embedding), and fuse the
# two rankings with RRF — score(d) = sum over rankings of 1/(60+rank).
# RRF needs only the integer ranks, so the fusion is exact integer
# arithmetic (1e6 DIV (60+rank)) and both engines agree bit-for-bit;
# ranks themselves come from integer sort keys (score_e3, cos_e4) with
# id tie-breaks. The doc/vec id alignment is the module convention.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOPK = 10
_QV_DUCK = "(SELECT min(vec_id) FROM embeddings)"


def _rrf_cos_cte_duck() -> str:
    from smartbulkcopy_spark.pipeline.similarity import _dot_duck

    return (
        " qe AS (SELECT embedding FROM embeddings"
        f" WHERE vec_id = {_QV_DUCK}),"
        " cr AS (SELECT vec_id AS doc_id,"
        " CAST(row_number() OVER (ORDER BY ce4 DESC, vec_id)"
        " AS BIGINT) AS cos_rank FROM"
        " (SELECT e.vec_id, CAST(floor(10000.0"
        f" * {_dot_duck('e.embedding', 'qe.embedding')}"
        f" / (sqrt({_dot_duck('e.embedding', 'e.embedding')})"
        f" * sqrt({_dot_duck('qe.embedding', 'qe.embedding')})))"
        " AS BIGINT) AS ce4 FROM embeddings e, qe"
        f" WHERE e.vec_id != {_QV_DUCK}"
        " ORDER BY ce4 DESC, vec_id LIMIT 20))"
    )


def _rrf_oracle() -> str:
    from smartbulkcopy_spark.pipeline.text import (
        _BM25_BASE_DUCK,
        _BM25_SCORE_DUCK,
    )

    return (
        "WITH " + _BM25_BASE_DUCK + ","
        " qt AS (SELECT p.t, v.df FROM post p JOIN voc v ON v.t = p.t"
        f" WHERE p.doc_id = {_QV_DUCK}"
        " ORDER BY v.df, p.t LIMIT 3),"
        + _BM25_SCORE_DUCK + ","
        " bk AS (SELECT doc_id, score_e3,"
        " CAST(row_number() OVER (ORDER BY score_e3 DESC, doc_id)"
        " AS BIGINT) AS bm25_rank FROM"
        " (SELECT * FROM agg"
        f" WHERE doc_id != {_QV_DUCK}"
        " ORDER BY score_e3 DESC, doc_id LIMIT 20)),"
        + _rrf_cos_cte_duck() +
        " SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,"
        " CAST(coalesce(b.bm25_rank, 0) AS BIGINT) AS bm25_rank,"
        " CAST(coalesce(c.cos_rank, 0) AS BIGINT) AS cos_rank,"
        f" CAST(coalesce(1000000 // ({RRF_K} + b.bm25_rank), 0)"
        f" + coalesce(1000000 // ({RRF_K} + c.cos_rank), 0) AS BIGINT)"
        " AS rrf_e6"
        " FROM bk b FULL OUTER JOIN cr c ON b.doc_id = c.doc_id"
        f" ORDER BY rrf_e6 DESC, doc_id LIMIT {RRF_TOPK}"
    )


@register(
    "q135_rrf_retrieval_fusion",
    _rrf_oracle(),
    doc="Reciprocal-rank fusion of the two retrieval modalities for a"
    " query document (the min-vec_id doc, the q30 convention): BM25"
    " top-20 over the query doc's three RAREST terms (integer BM25,"
    " q134 machinery) fused with exact-cosine top-20 to its embedding"
    " (q30 machinery, ranks from the floored cos_e4 integer key), via"
    " RRF score = sum of 1e6 DIV (60+rank). Ranks-only fusion means"
    " the cross-engine agreement is exact; absent-from-a-list docs"
    " contribute 0 by convention and rank columns report 0. Both"
    " rankings are top-k TakeOrdered over bounded lists; the fusion"
    " joins two 20-row tables.",
)
def q135(spark, sf_dir):
    from smartbulkcopy_spark.pipeline.similarity import dot_fold
    from smartbulkcopy_spark.pipeline.text import (
        _bm25_postings,
        _bm25_rank,
    )
    from smartbulkcopy_spark.queries import table
    import math

    from pyspark.sql.window import Window

    emb = table(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").select("vec_id", "embedding").first()
    qid = int(qrow["vec_id"])
    qvec = [float(v) for v in qrow["embedding"]]
    nq = math.sqrt(sum(v * v for v in qvec))

    post = eager(_bm25_postings(spark, sf_dir))
    dl = post.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    voc = post.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    qt = (
        post.where(F.col("doc_id") == qid)
        .join(voc, "t")
        .orderBy("df", "t")
        .limit(3)
        .select("t", "df")
    )
    bk = _bm25_rank(spark, post, dl, qt, exclude_id=qid).select(
        "doc_id", "bm25_rank"
    )

    qlit = F.expr(sql_darr(qvec))
    e = F.col("embedding")
    ce4 = F.floor(
        10000.0 * dot_fold(e, qlit) / (F.sqrt(dot_fold(e, e)) * F.lit(nq))
    ).cast("bigint")
    wc = Window.orderBy(F.col("ce4").desc(), "vec_id")
    cr = (
        emb.where(F.col("vec_id") != qid)
        .select(F.col("vec_id").alias("doc_id"), ce4.alias("ce4"))
        .orderBy(F.col("ce4").desc(), F.col("doc_id"))
        .limit(20)
        .withColumnRenamed("doc_id", "vec_id")
        .withColumn(
            "cos_rank", F.row_number().over(wc).cast("long")
        )
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )
    fused = bk.join(cr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce("cos_rank", F.lit(0)).cast("long").alias("cos_rank"),
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({RRF_K} + bm25_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({RRF_K} + cos_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_e6"),
    )
    return fused.orderBy(F.col("rrf_e6").desc(), "doc_id").limit(RRF_TOPK)


# ---------------------------------------------------------------------------
# Round-14 stage: contamination ensemble matrix — the q115/q187
# agreement pattern applied to the DECONTAMINATION family. Three
# detectors flag training documents against the held-out eval source
# at three granularities: exact 5-token grams (q68 — verbatim spans),
# winnowing fingerprints (q170 — near-verbatim runs surviving light
# edits), and whole-document verified near-dups whose partner is an
# eval doc (the q49/q69 LSH+Jaccard chain — rewraps). A production
# decontamination pass runs all three and reviews the disagreement
# set: gram-only = short verbatim quotes, winnow-only = edited
# passages below the 5-gram floor, lsh-only = whole-doc rewraps with
# few shared shingles... and docs all three flag are the hard leaks.
# Scale: each flag set comes from its existing bucketed/deduped-index
# generator; this matrix adds only id-keyed joins on tiny doc-id sets.
# ---------------------------------------------------------------------------


def contamination_ensemble_matrix(spark, sf_dir):
    """(gram5, winnow, lshdup, n_docs): over the union of training
    docs any detector flags, the per-combination doc counts. Callers
    get the audit that prices each detector's marginal coverage."""
    from smartbulkcopy_spark.pipeline.dedup import (
        WINNOW_EVAL_SOURCE,
        verified_pairs,
        winnow_contamination_screen_full,
    )
    from smartbulkcopy_spark.pipeline.text import q68
    from smartbulkcopy_spark.queries import table

    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("a_id"),
        (F.col("source") == WINNOW_EVAL_SOURCE).alias("ea"),
    )
    sb = src.select(
        F.col("doc_id").alias("b_id"),
        (F.col("source") == WINNOW_EVAL_SOURCE).alias("eb"),
    )
    # Three independent detector chains -> concurrent materialization
    # (eager_parallel; the q115 pattern).
    g5, wn, ld = eager_parallel(
        lambda: eager(q68(spark, sf_dir).select("doc_id")),
        lambda: eager(
            winnow_contamination_screen_full(spark, sf_dir).select("doc_id")
        ),
        lambda: eager(
            verified_pairs(spark, sf_dir)
            .select("a_id", "b_id")
            .join(sa, "a_id")
            .join(sb, "b_id")
            .where(F.col("ea") != F.col("eb"))
            .select(
                F.when(F.col("ea"), F.col("b_id"))
                .otherwise(F.col("a_id"))
                .alias("doc_id")
            )
            .distinct()
        ),
    )
    u = g5.union(wn).union(ld).distinct()
    gm = g5.withColumn("g", F.lit(True))
    wm = wn.withColumn("w", F.lit(True))
    lm = ld.withColumn("l", F.lit(True))
    return (
        u.join(gm, "doc_id", "left")
        .join(wm, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .select(
            F.coalesce(F.col("g"), F.lit(False)).alias("gram5"),
            F.coalesce(F.col("w"), F.lit(False)).alias("winnow"),
            F.coalesce(F.col("l"), F.lit(False)).alias("lshdup"),
        )
        .groupBy("gram5", "winnow", "lshdup")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("gram5", "winnow", "lshdup")
    )


def _contamination_ensemble_oracle() -> str:
    """DuckDB replay of contamination_ensemble_matrix, drafted with
    the builder (round-14 registration wires it up): the q68 gram
    chain, the q170 winnow-screen chain (prefix 'w'), and the q69
    verified-pair chain, each reduced to a distinct flagged-doc set
    and rolled up by combination."""
    from smartbulkcopy_spark.pipeline.dedup import (
        WINNOW_EVAL_SOURCE,
        _winnow_pk_ctes,
    )
    from smartbulkcopy_spark.pipeline.sketch import _grams_duck

    ev = WINNOW_EVAL_SOURCE
    return (
        "WITH " + _grams_duck() + ","
        + _winnow_pk_ctes("w") + ","
        + _lex_pairs_cte_duck() + ","
        " srcx AS (SELECT doc_id, source FROM documents),"
        " ev5 AS (SELECT DISTINCT gh FROM gd"
        f" WHERE source = '{ev}'),"
        " g5 AS MATERIALIZED (SELECT DISTINCT doc_id FROM gd"
        f" WHERE source != '{ev}' AND gh IN (SELECT gh FROM ev5)),"
        " pksw AS (SELECT p.doc_id, s.source, p.fph FROM pkw p"
        " JOIN srcx s ON s.doc_id = p.doc_id),"
        " evw AS (SELECT DISTINCT fph FROM pksw"
        f" WHERE source = '{ev}'),"
        " wn AS MATERIALIZED (SELECT DISTINCT doc_id FROM pksw"
        f" WHERE source != '{ev}' AND fph IN (SELECT fph FROM evw)),"
        " lsd AS MATERIALIZED (SELECT DISTINCT CASE WHEN"
        f" xa.source = '{ev}' THEN vp.b_id ELSE vp.a_id END AS doc_id"
        " FROM vp JOIN srcx xa ON xa.doc_id = vp.a_id"
        " JOIN srcx xb ON xb.doc_id = vp.b_id"
        f" WHERE (xa.source = '{ev}') != (xb.source = '{ev}')),"
        " u AS (SELECT doc_id FROM g5 UNION SELECT doc_id FROM wn"
        " UNION SELECT doc_id FROM lsd)"
        " SELECT (g5.doc_id IS NOT NULL) AS gram5,"
        " (wn.doc_id IS NOT NULL) AS winnow,"
        " (lsd.doc_id IS NOT NULL) AS lshdup,"
        " CAST(count(*) AS BIGINT) AS n_docs"
        " FROM u LEFT JOIN g5 ON g5.doc_id = u.doc_id"
        " LEFT JOIN wn ON wn.doc_id = u.doc_id"
        " LEFT JOIN lsd ON lsd.doc_id = u.doc_id"
        " GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    )
