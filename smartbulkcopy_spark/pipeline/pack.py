"""Sequence packing: assign every document a (pack_id, pack_pos) slot in
fixed-length token windows — the layout step that turns a filtered corpus
into trainer-ready context blocks.

No reference analog (the reference copies bytes); this is a Phase-5
pipeline operator (SURVEY §7.2). Packing is "concatenate in doc_id order,
then chunk every MAX_LEN tokens": each document's global token offset is
the running sum of all earlier documents' token counts, and its pack is
``offset DIV MAX_LEN``. Documents whose span crosses a pack boundary are
flagged so a trainer can split or drop them.

Scale notes (100 TB):
- The naive spelling is ``sum(n_tokens) OVER (ORDER BY doc_id)`` — a
  GLOBAL window, which Spark executes on a single partition: the whole
  corpus funnels through one task. That is the canonical cumulative-sum
  scale trap, and the oracle (DuckDB, single node) uses exactly that
  spelling while the Spark plan must not.
- Instead the running sum is computed in two phases over deterministic
  doc_id blocks (``block_id = doc_id DIV PACK_BLOCK``):
    1. block-local prefix sums — a window PARTITIONED by block_id, all
       blocks in parallel;
    2. per-block totals (partial-aggregated groupBy, one tiny row per
       block) turned into block prefix offsets by a window over the
       block-total rows only — #docs/PACK_BLOCK rows, not #docs — and
       broadcast-joined back.
  global_offset = block_prefix + local_prefix. The only data-sized
  shuffles are keyed by block_id; the single-partition window touches
  only the block-total rows (at 1e9 docs with production PACK_BLOCK=1e5
  that is 1e4 rows; a third level of the same trick covers 1e12+).
- The result is independent of the block size — blocks only decompose
  the sum — which is why the test-scale PACK_BLOCK=64 (8 blocks at 500
  docs) and a production 1e5 produce identical output, and why the
  single-window oracle agrees bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from smartbulkcopy_spark.pipeline.text import TOKENS_SQL_DUCK, token_count
from smartbulkcopy_spark.queries import register, table

# Tokens per training context window.
PACK_MAX_LEN = 512
# Documents per prefix-sum block. 64 exercises the two-phase path at the
# 500-doc test scale (8 blocks); production would use ~1e5.
PACK_BLOCK = 64


def pack_offsets(
    docs: DataFrame, max_len: int = PACK_MAX_LEN, block: int = PACK_BLOCK
) -> DataFrame:
    """Per-document global token offset + pack slot, two-phase cumsum.

    ``docs`` must carry (doc_id, n_tokens). Output is one row per doc:
    (doc_id, n_tokens, global_offset, pack_id, pack_pos, spans_boundary),
    identical to the single-window spelling for any ``block`` > 0.
    """
    t = docs.withColumn("block_id", F.expr(f"doc_id DIV {int(block)}"))

    # Phase 1: block-local exclusive prefix sums (all blocks in parallel).
    w_local = (
        Window.partitionBy("block_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_prev", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )

    # Phase 2: exclusive prefix over the per-block totals. This window is
    # global but runs over #blocks rows only (partial-aggregated groupBy
    # first), then broadcasts back — the corpus itself never single-threads.
    w_blocks = Window.orderBy("block_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    block_prefix = (
        t.groupBy("block_id")
        .agg(F.sum("n_tokens").alias("block_total"))
        .withColumn(
            "block_prev",
            F.coalesce(F.sum("block_total").over(w_blocks), F.lit(0)),
        )
        .select("block_id", "block_prev")
    )

    offset = F.col("block_prev") + F.col("local_prev")
    pos = offset % max_len
    return (
        local.join(F.broadcast(block_prefix), "block_id")
        .select(
            "doc_id",
            "n_tokens",
            offset.alias("global_offset"),
            F.floor(offset / max_len).alias("pack_id"),
            pos.alias("pack_pos"),
            ((pos + F.col("n_tokens")) > max_len).alias("spans_boundary"),
        )
    )


@register(
    "q51_pack_offsets",
    "WITH t AS (SELECT doc_id,"
    f" CAST({TOKENS_SQL_DUCK} AS BIGINT) AS n_tokens FROM documents),"
    " c AS (SELECT doc_id, n_tokens,"
    " CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS global_offset FROM t)"
    " SELECT doc_id, n_tokens, global_offset,"
    f" global_offset // {PACK_MAX_LEN} AS pack_id,"
    f" global_offset % {PACK_MAX_LEN} AS pack_pos,"
    f" (global_offset % {PACK_MAX_LEN}) + n_tokens > {PACK_MAX_LEN}"
    " AS spans_boundary"
    " FROM c ORDER BY doc_id",
    doc="Sequence packing: global token offset and fixed-512-token pack"
    " slot per document, concatenating in doc_id order. Spark computes"
    " the running sum in two phases over doc_id blocks (parallel"
    " block-local windows + a tiny block-prefix window broadcast back);"
    " the oracle is the equivalent single global window. Boundary-"
    "crossing docs are flagged for the trainer to split or drop.",
)
def q51(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", token_count().cast("long").alias("n_tokens")
    )
    return pack_offsets(docs)


@register(
    "q62_pack_fill",
    "WITH t AS (SELECT doc_id,"
    f" CAST({TOKENS_SQL_DUCK} AS BIGINT) AS n_tokens FROM documents),"
    " c AS (SELECT doc_id, n_tokens,"
    " CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS global_offset FROM t)"
    f" SELECT global_offset // {PACK_MAX_LEN} AS pack_id,"
    " count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,"
    f" CAST(sum(CASE WHEN (global_offset % {PACK_MAX_LEN}) + n_tokens"
    f" > {PACK_MAX_LEN} THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning"
    " FROM c GROUP BY pack_id ORDER BY pack_id",
    doc="Pack utilization report: per training pack, how many documents"
    " start in it, their token mass, and how many overrun the boundary"
    " — the fill/waste metric that decides whether to split, drop, or"
    " re-order boundary documents. Same two-phase offsets as q51 plus"
    " one partial-aggregated (pack_id, partials) rollup.",
)
def q62(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", token_count().cast("long").alias("n_tokens")
    )
    return (
        pack_offsets(docs)
        .groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.col("spans_boundary").cast("int"))
            .cast("long")
            .alias("n_spanning"),
        )
        .orderBy("pack_id")
    )


# ---------------------------------------------------------------------------
# Systematic PPS (probability-proportional-to-size) sampling. q56 keeps
# a Bernoulli fraction per source and q75 draws k uniform docs per
# source; neither draws an EXACT-size sample weighted by document size —
# the standard primitive for eval-set carving and inspection draws where
# long documents should be proportionally represented. Systematic PPS
# does it deterministically with pure integer math: order the corpus by
# a salted hash (a reprocessing-stable shuffle), take the exclusive
# cumulative token-weight C_i, and select each document with
# multiplicity floor((C_i+w_i)*K/T) - floor(C_i*K/T) — the number of
# multiples of T/K its weight span crosses. Multiplicities always sum to
# exactly K, a doc's selection probability is proportional to its
# weight, and docs heavier than T/K are drawn with multiplicity > 1.
# The cumsum is the same two-phase block decomposition as pack_offsets
# (the hash PREFIX is the block key, so block order equals hash order
# and no corpus-wide window ever runs); the oracle uses the naive
# single-window spelling the block form provably equals.
# ---------------------------------------------------------------------------

PPS_K = 128


@register(
    "q130_pps_token_sample",
    "WITH t AS (SELECT doc_id,"
    f" CAST({TOKENS_SQL_DUCK} AS BIGINT) AS n_tokens,"
    " md5('pps:' || CAST(doc_id AS VARCHAR)) AS hk FROM documents),"
    " c AS (SELECT doc_id, n_tokens, hk,"
    " CAST(coalesce(sum(n_tokens) OVER (ORDER BY hk, doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
    " AS cum_prev,"
    " CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM t)"
    " SELECT doc_id, n_tokens, cum_prev,"
    f" CAST((cum_prev + n_tokens) * {PPS_K} // total"
    f" - cum_prev * {PPS_K} // total AS BIGINT) AS multiplicity"
    " FROM c"
    f" WHERE (cum_prev + n_tokens) * {PPS_K} // total"
    f" > cum_prev * {PPS_K} // total"
    " ORDER BY doc_id",
    doc="Systematic PPS sample of exactly K=128 draws, weight = token"
    " count: corpus ordered by salted md5 (reprocessing-stable), each"
    " doc selected with multiplicity = #multiples of T/K its cumulative"
    " weight span crosses — multiplicities sum to exactly K, selection"
    " probability proportional to length, all integer arithmetic. The"
    " cumulative sum is the pack_offsets two-phase block decomposition"
    " keyed on the hash PREFIX (block order = hash order), so no"
    " corpus-wide single-partition window; the oracle runs the naive"
    " global-window spelling the block form provably equals.",
)
def q130(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        token_count().cast("long").alias("n_tokens"),
        F.md5(
            F.concat(F.lit("pps:"), F.col("doc_id").cast("string"))
        ).alias("hk"),
    )
    # block key = 2-hex-char hash prefix: 256 blocks whose lexicographic
    # order is consistent with the full sort key, so the two-phase
    # decomposition reproduces the global order's prefix sums
    t = docs.withColumn("block_id", F.substring("hk", 1, 2))
    w_local = (
        Window.partitionBy("block_id")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = t.withColumn(
        "local_prev", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    w_blocks = Window.orderBy("block_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    block_prefix = (
        t.groupBy("block_id")
        .agg(F.sum("n_tokens").alias("block_total"))
        .withColumn(
            "block_prev",
            F.coalesce(F.sum("block_total").over(w_blocks), F.lit(0)),
        )
    )
    # bounded global scalar (256 block totals -> one number), attached
    # driver-side per the q52/q102 convention — never a lit==lit join
    total = (
        block_prefix.agg(F.sum("block_total").alias("t")).collect()[0]["t"]
    )
    cum = local.join(
        F.broadcast(block_prefix.select("block_id", "block_prev")),
        "block_id",
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("block_prev") + F.col("local_prev")).alias("cum_prev"),
    )
    lo = F.expr(f"cum_prev * {PPS_K} DIV {total}")
    hi = F.expr(f"(cum_prev + n_tokens) * {PPS_K} DIV {total}")
    return (
        cum.withColumn("multiplicity", (hi - lo).cast("long"))
        .where(F.col("multiplicity") > 0)
        .select("doc_id", "n_tokens", "cum_prev", "multiplicity")
        .orderBy("doc_id")
    )
