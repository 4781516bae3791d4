"""Probabilistic sketches — the scale answer when exact global state is
the bottleneck. At 100 TB, `countDistinct` over tokens shuffles the full
token space and an exact heavy-hitter table holds the whole vocabulary;
the production substitutes are HyperLogLog (distinct counts in m bytes)
and Count-Min (frequency estimates in d*w counters). Both sketches here
are BUILT DISTRIBUTED (partial-aggregated register/counter maxima and
counts — the merge is the sketch's native union) and both are
oracle-checked EXACTLY: the register/counter contents derive from md5
(bit-identical across engines), the HLL harmonic fold runs left-to-right
over the register array in fixed order (the q30 order-fixed double-fold
primitive — Spark `aggregate` init 0.0 is bit-identical to DuckDB
`list_reduce`), and Count-Min is pure integer arithmetic. Each operator
also joins the exact answer alongside, so the registered query IS the
estimator-quality audit (the q107 pattern: measure the sketch before
trusting it on 100 TB).

No reference analog — Phase-5 pipeline operators (SURVEY §7.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from smartbulkcopy_spark.pipeline.text import NORM_SQL_DUCK, norm_text
from smartbulkcopy_spark.queries import register, sql_iarr, table

# ---------------------------------------------------------------------------
# HyperLogLog distinct-token estimate (m = 256 registers). Register
# index = first md5 byte; rank = leading-zero count + 1 of the next 32
# md5 bits. The raw harmonic estimate uses only exact powers of two and
# an order-fixed fold; the standard small-range linear-counting branch
# (floor(m * ln(m/V))) would need libm ln — which differs across
# engines in the last ulp — so its 256 possible outputs are precomputed
# once in Python (HLL_LIN) and embedded as integer literals in BOTH
# engines. bin() strips leading zeros identically in both engines
# (bit_length = length(bin)).
# ---------------------------------------------------------------------------

HLL_M = 256
# alpha_256 = 0.7213 / (1 + 1.079/256), fixed as ppm so both engines
# constant-fold the same double.
HLL_ALPHA_PPM = 718273

# Small-range (linear-counting) correction, applied when zero registers
# exist and the raw estimate is <= 2.5m: estimate = floor(m * ln(m/V)).
# ln has only 256 possible inputs here (V = 1..256), so the table is
# precomputed ONCE in Python and embedded as integer literals in BOTH
# engines — query-time arithmetic stays libm-free and bit-identical.
import math  # noqa: E402

HLL_LIN = [
    math.floor(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M + 1)
]
HLL_RAW_CUTOVER = 5 * HLL_M // 2  # 2.5m


def _tok_duck() -> str:
    return (
        "tok AS (SELECT unnest(string_split(trim("
        + NORM_SQL_DUCK + "), ' ')) AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != '')"
    )


@register(
    "q121_hll_distinct_tokens",
    "WITH " + _tok_duck() + ","
    " h AS (SELECT CAST(('0x'||substr(md5(t),1,2)) AS INT) AS reg,"
    " CAST(('0x'||substr(md5(t),3,8)) AS BIGINT) AS v, t FROM tok),"
    " r AS (SELECT reg, max(CASE WHEN v = 0 THEN 33"
    " ELSE 33 - length(bin(v)) END) AS mr FROM h GROUP BY reg),"
    f" fr AS (SELECT i.reg, coalesce(r.mr, 0) AS m FROM"
    f" (SELECT unnest(range(0, {HLL_M})) AS reg) i"
    " LEFT JOIN r USING (reg)),"
    " arr AS (SELECT list(m ORDER BY reg) AS ms FROM fr),"
    " est0 AS (SELECT"
    " CAST(len(list_filter(ms, x -> x = 0)) AS BIGINT)"
    " AS n_zero_registers,"
    " CAST(floor(((" + f"{HLL_ALPHA_PPM}.0 / 1000000.0) * {HLL_M}.0"
    f" * {HLL_M}.0)"
    " / list_reduce(list_prepend(0.0, list_transform(ms,"
    " x -> power(2.0, -x))), (acc, x) -> acc + x)) AS BIGINT)"
    " AS raw FROM arr),"
    " est AS (SELECT n_zero_registers,"
    " CASE WHEN n_zero_registers > 0 AND raw <= "
    f"{HLL_RAW_CUTOVER} THEN"
    f" (CAST({HLL_LIN} AS BIGINT[]))[CAST(n_zero_registers AS INT)]"
    " ELSE raw END AS estimate FROM est0),"
    " ex AS (SELECT CAST(count(DISTINCT t) AS BIGINT)"
    " AS exact_distinct FROM tok)"
    f" SELECT CAST({HLL_M} AS BIGINT) AS m, n_zero_registers, estimate,"
    " exact_distinct,"
    " CAST(abs(estimate - exact_distinct) * 1000000"
    " // exact_distinct AS BIGINT) AS err_ppm"
    " FROM est, ex",
    doc="HyperLogLog distinct-token estimate (m=256 registers) WITH the"
    " exact answer alongside — the estimator-quality audit run before"
    " trusting the sketch at 100 TB, where exact countDistinct shuffles"
    " the full token space but HLL registers merge in 256 bytes."
    " Register maxima partial-aggregate map-side; the harmonic fold"
    " runs left-to-right over the REG-SORTED register array (the q30"
    " order-fixed double-fold primitive) and powers of two are exact,"
    " so the raw floor is bit-identical across engines; the standard"
    " small-range linear-counting branch (V > 0, raw <= 2.5m) avoids"
    " query-time libm entirely by indexing a 256-entry floor(m*ln(m/V))"
    " table precomputed once in Python and embedded as literals in"
    " BOTH engines.",
)
def q121(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    base = docs.select(norm_text().alias("n"))
    tok = base.where(F.trim(F.col("n")) != "").select(
        F.explode(F.split(F.trim(F.col("n")), " ")).alias("t")
    )
    h = tok.select(
        "t",
        F.conv(F.substring(F.md5("t"), 1, 2), 16, 10)
        .cast("int")
        .alias("reg"),
        F.conv(F.substring(F.md5("t"), 3, 8), 16, 10)
        .cast("long")
        .alias("v"),
    )
    rank = F.when(F.col("v") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.expr("bin(v)"))
    )
    regs = h.select("reg", rank.alias("rank")).groupBy("reg").agg(
        F.max("rank").alias("mr")
    )
    full = (
        spark.range(HLL_M)
        .select(F.col("id").cast("int").alias("reg"))
        .join(regs, "reg", "left")
        .select("reg", F.coalesce("mr", F.lit(0)).alias("m"))
    )
    # exact distinct is a bounded global scalar: attach driver-side
    # (q52/q102 pattern — a lit(1)==lit(1) join would plan as BNLJ)
    exact = tok.select(F.countDistinct("t").alias("x")).collect()[0]["x"]
    one = full.agg(
        F.expr(
            "transform(sort_array(collect_list(struct(reg, m))), x -> x.m)"
        ).alias("ms")
    )
    z = F.expr(
        "aggregate(transform(ms, x -> power(2.0D, -x)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    raw = F.floor(
        F.lit((HLL_ALPHA_PPM / 1000000.0) * HLL_M * HLL_M) / z
    ).cast("long")
    staged = one.select(
        F.lit(HLL_M).cast("long").alias("m"),
        F.expr("size(filter(ms, x -> x = 0))")
        .cast("long")
        .alias("n_zero_registers"),
        raw.alias("raw"),
        F.lit(exact).cast("long").alias("exact_distinct"),
    )
    lin = F.element_at(
        F.expr(sql_iarr(HLL_LIN)),
        F.col("n_zero_registers").cast("int"),
    ).cast("long")
    out = staged.select(
        "m",
        "n_zero_registers",
        F.when(
            (F.col("n_zero_registers") > 0)
            & (F.col("raw") <= HLL_RAW_CUTOVER),
            lin,
        )
        .otherwise(F.col("raw"))
        .alias("estimate"),
        "exact_distinct",
    )
    return out.withColumn(
        "err_ppm",
        F.expr(
            "abs(estimate - exact_distinct) * 1000000L DIV exact_distinct"
        ).cast("long"),
    )


# ---------------------------------------------------------------------------
# Count-Min frequency estimates for the exact heavy hitters. The sketch
# is d x w integer counters (md5-salted row hashes — the minhash salt
# idiom); estimate(t) = min over rows of counter[r][hash_r(t)], which
# NEVER underestimates. The registered query builds the sketch
# distributed (counter counts partial-aggregate before one (r, c)
# shuffle bounded by d*w), probes it with the exact top-20 tokens, and
# emits exact vs estimate vs overestimate — pure integer arithmetic,
# hash-exact across engines.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024
CMS_TOP_K = 20


def _cms_bucket_spark(r: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{r}:"), F.col("t"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def _cms_bucket_duck(r: str) -> str:
    return (
        f"CAST(('0x'||substr(md5(CAST({r} AS VARCHAR)||':'||t),1,4))"
        f" AS INT) % {CMS_W}"
    )


@register(
    "q122_cms_heavy_hitters",
    "WITH " + _tok_duck() + ","
    " cb AS (SELECT t, rr.r AS r,"
    + _cms_bucket_duck("rr.r")
    + " AS c FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS rr(r)),"
    " cnts AS (SELECT r, c, count(*) AS cnt FROM cb GROUP BY r, c),"
    " topk AS (SELECT t, count(*) AS tf FROM tok GROUP BY t"
    f" ORDER BY tf DESC, t LIMIT {CMS_TOP_K}),"
    " pr AS (SELECT t, tf, rr.r AS r,"
    + _cms_bucket_duck("rr.r")
    + " AS c FROM topk CROSS JOIN (VALUES (0), (1), (2), (3)) AS rr(r)),"
    " est AS (SELECT t, tf, min(cnt) AS cms FROM pr"
    " JOIN cnts USING (r, c) GROUP BY t, tf)"
    " SELECT t AS token, CAST(tf AS BIGINT) AS tf_exact,"
    " CAST(cms AS BIGINT) AS cms_estimate,"
    " CAST(cms - tf AS BIGINT) AS overestimate FROM est"
    " ORDER BY tf_exact DESC, token",
    doc="Count-Min heavy-hitter audit: a d=4 x w=1024 integer counter"
    " sketch built distributed (counter counts partial-aggregate before"
    " the one (row, column) shuffle, bounded by d*w regardless of"
    " corpus size), probed with the exact top-20 tokens — emits exact"
    " frequency, sketch estimate, and the overestimate (never negative:"
    " the count-min guarantee, property-tested). The 100 TB shape: the"
    " sketch replaces a full-vocabulary frequency table when only"
    " approximate heavy-hitter mass is needed; pure integer arithmetic"
    " keeps both engines hash-identical.",
)
def q122(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    base = docs.select(norm_text().alias("n"))
    tok = base.where(F.trim(F.col("n")) != "").select(
        F.explode(F.split(F.trim(F.col("n")), " ")).alias("t")
    )
    buckets = F.array(*[_cms_bucket_spark(r) for r in range(CMS_D)])
    counters = (
        tok.select("t", F.posexplode(buckets).alias("r", "c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )
    topk = (
        tok.groupBy("t")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "t")
        .limit(CMS_TOP_K)
    )
    probes = topk.select("t", "tf", F.posexplode(buckets).alias("r", "c"))
    est = (
        probes.join(F.broadcast(counters), ["r", "c"])
        .groupBy("t", "tf")
        .agg(F.min("cnt").alias("cms"))
    )
    return est.select(
        F.col("t").alias("token"),
        F.col("tf").cast("long").alias("tf_exact"),
        F.col("cms").cast("long").alias("cms_estimate"),
        (F.col("cms") - F.col("tf")).cast("long").alias("overestimate"),
    ).orderBy(F.col("tf_exact").desc(), "token")


# ---------------------------------------------------------------------------
# Bloom-filter decontamination screen — the third classic sketch, in the
# role it actually plays at 100 TB: exact eval-overlap joins (q68) key
# the full training-gram space, but a Bloom filter of the eval set's
# 5-gram hashes is a few KB that screens the corpus with NO false
# negatives. The filter is k=3 md5-salted bit positions in an m=2^15
# bit space; the Spark-native bitmap is the distinct SET-BIT table
# (<= m rows), broadcast to the probe side. The registered query runs
# the screen AND the exact join side by side (the q107/q121/q122
# estimator-audit pattern): bloom_flagged >= exact_hits always (no
# false negatives — property-tested), and false_pos measures the m/k
# sizing before a production run. Pure integer + md5: hash-exact.
# ---------------------------------------------------------------------------

BLOOM_M = 32768  # 2^15 bits
BLOOM_K = 3

from smartbulkcopy_spark.pipeline.text import (  # noqa: E402
    DECON_EVAL_SOURCE,
    DECON_N,
)


def _bloom_bit_spark(j: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), F.col("gh"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def _bloom_bit_duck(j: str) -> str:
    return (
        f"CAST(('0x'||substr(md5(CAST({j} AS VARCHAR)||':'||gh),1,4))"
        f" AS INT) % {BLOOM_M}"
    )


def _grams_duck() -> str:
    return (
        "tokd AS (SELECT doc_id, source, string_split(trim("
        + NORM_SQL_DUCK + "), ' ') AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != ''),"
        " gd AS (SELECT doc_id, source, unnest(list_transform("
        f"range(1, len(t) - {DECON_N - 1} + 1),"
        f" i -> md5(array_to_string(list_slice(t, i, i + {DECON_N - 1}),"
        f" ' ')))) AS gh FROM tokd WHERE len(t) >= {DECON_N})"
    )


@register(
    "q123_bloom_decontamination",
    "WITH " + _grams_duck() + ","
    " ev AS (SELECT DISTINCT gh FROM gd"
    f" WHERE source = '{DECON_EVAL_SOURCE}'),"
    " bits AS (SELECT DISTINCT "
    + _bloom_bit_duck("jj.j")
    + " AS bit FROM ev CROSS JOIN (VALUES (0), (1), (2)) AS jj(j)),"
    " tr AS (SELECT DISTINCT doc_id, gh FROM gd"
    f" WHERE source != '{DECON_EVAL_SOURCE}'),"
    " pb AS (SELECT doc_id, gh, jj.j AS j,"
    + _bloom_bit_duck("jj.j")
    + " AS bit FROM tr CROSS JOIN (VALUES (0), (1), (2)) AS jj(j)),"
    " flag AS (SELECT doc_id, gh FROM pb JOIN bits USING (bit)"
    f" GROUP BY doc_id, gh HAVING count(*) = {BLOOM_K}),"
    " bl AS (SELECT doc_id, count(*) AS bloom_flagged FROM flag"
    " GROUP BY doc_id),"
    " exj AS (SELECT doc_id, count(*) AS exact_hits FROM tr"
    " JOIN ev USING (gh) GROUP BY doc_id),"
    " base AS (SELECT doc_id, count(*) AS n_grams FROM tr"
    " GROUP BY doc_id)"
    " SELECT b.doc_id, CAST(b.n_grams AS BIGINT) AS n_grams,"
    " CAST(coalesce(bl.bloom_flagged, 0) AS BIGINT) AS bloom_flagged,"
    " CAST(coalesce(exj.exact_hits, 0) AS BIGINT) AS exact_hits,"
    " CAST(coalesce(bl.bloom_flagged, 0)"
    " - coalesce(exj.exact_hits, 0) AS BIGINT) AS false_pos"
    " FROM base b LEFT JOIN bl USING (doc_id)"
    " LEFT JOIN exj USING (doc_id) ORDER BY b.doc_id",
    doc="Bloom-filter decontamination screen vs the exact 5-gram join:"
    f" the eval source's gram hashes set k={BLOOM_K} md5-salted bits in"
    f" an m={BLOOM_M}-bit space; a training gram is flagged iff ALL its"
    " bits are set. The set-bit table (<= m rows, a few KB serialized)"
    " broadcasts to the probe — at 100 TB this replaces the full"
    " training-gram shuffle the exact join needs, with zero false"
    " negatives (bloom_flagged >= exact_hits, property-tested) and the"
    " false_pos column measuring the m/k sizing. Distinct per-doc grams"
    " on both paths keep the two counts comparable; pure integer + md5"
    " arithmetic is hash-exact across engines.",
)
def q123(spark, sf_dir):
    from smartbulkcopy_spark.queries import spread

    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    tok = (
        docs.select("doc_id", "source", n.alias("nn"))
        .where(F.col("nn") != "")
        .select("doc_id", "source", F.split(F.col("nn"), " ").alias("t"))
        .where(F.size("t") >= DECON_N)
    )
    grams = tok.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {DECON_N - 1}),"
                f" i -> md5(array_join(slice(t, i, {DECON_N}), ' ')))"
            )
        ).alias("gh"),
    )
    ev = (
        grams.where(F.col("source") == DECON_EVAL_SOURCE)
        .select("gh")
        .distinct()
    )
    jbits = F.array(*[_bloom_bit_spark(j) for j in range(BLOOM_K)])
    bits = ev.select(F.explode(jbits).alias("bit")).distinct()
    tr = (
        grams.where(F.col("source") != DECON_EVAL_SOURCE)
        .select("doc_id", "gh")
        .distinct()
    )
    probe = tr.select("doc_id", "gh", F.explode(jbits).alias("bit"))
    flagged = (
        probe.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("doc_id", "gh")
        .agg(F.count("*").alias("nb"))
        .where(F.col("nb") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count("*").alias("bloom_flagged"))
    )
    exact = (
        tr.join(ev, "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("exact_hits"))
    )
    base = tr.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        base.join(flagged, "doc_id", "left")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("bloom_flagged", F.lit(0))
            .cast("long")
            .alias("bloom_flagged"),
            F.coalesce("exact_hits", F.lit(0))
            .cast("long")
            .alias("exact_hits"),
            (
                F.coalesce("bloom_flagged", F.lit(0))
                - F.coalesce("exact_hits", F.lit(0))
            )
            .cast("long")
            .alias("false_pos"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Grouped HLL: distinct users per hour over the event stream — the form
# the sketch actually ships in (one register set PER GROUP, merged by
# per-register max, so hourly sketches also union into daily/weekly
# ones for free). Same register/rank/fold/linear-counting machinery as
# q121, exercised per group; exact per-hour countDistinct rides along
# as the audit. Timestamps stay in the NTZ domain (trunc_hour_ntz) so
# the group keys are session-timezone-independent.
# ---------------------------------------------------------------------------


@register(
    "q126_hourly_hll_users",
    "WITH ev AS (SELECT date_trunc('hour', ts) AS w, user_id"
    " FROM events),"
    " h AS (SELECT w,"
    " CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,2)) AS INT)"
    " AS reg,"
    " CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),3,8)) AS BIGINT)"
    " AS v FROM ev),"
    " r AS (SELECT w, reg, max(CASE WHEN v = 0 THEN 33"
    " ELSE 33 - length(bin(v)) END) AS mr FROM h GROUP BY w, reg),"
    " hrs AS (SELECT DISTINCT w FROM ev),"
    " grid AS (SELECT hrs.w, t.reg FROM hrs"
    f" CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS reg) t),"
    " fr2 AS (SELECT g.w, g.reg, coalesce(r.mr, 0) AS m FROM grid g"
    " LEFT JOIN r ON r.w = g.w AND r.reg = g.reg),"
    " arr AS (SELECT w, list(m ORDER BY reg) AS ms FROM fr2"
    " GROUP BY w),"
    " est0 AS (SELECT w,"
    " CAST(len(list_filter(ms, x -> x = 0)) AS BIGINT)"
    " AS n_zero_registers,"
    " CAST(floor(((" + f"{HLL_ALPHA_PPM}.0 / 1000000.0) * {HLL_M}.0"
    f" * {HLL_M}.0)"
    " / list_reduce(list_prepend(0.0, list_transform(ms,"
    " x -> power(2.0, -x))), (acc, x) -> acc + x)) AS BIGINT)"
    " AS raw FROM arr),"
    " est AS (SELECT w, n_zero_registers,"
    " CASE WHEN n_zero_registers > 0 AND raw <= "
    f"{HLL_RAW_CUTOVER} THEN"
    f" (CAST({HLL_LIN} AS BIGINT[]))[CAST(n_zero_registers AS INT)]"
    " ELSE raw END AS estimate FROM est0),"
    " ex AS (SELECT w, CAST(count(DISTINCT user_id) AS BIGINT)"
    " AS exact_users FROM ev GROUP BY w)"
    " SELECT est.w, n_zero_registers, estimate, exact_users,"
    " CAST(abs(estimate - exact_users) * 1000000"
    " // exact_users AS BIGINT) AS err_ppm"
    " FROM est JOIN ex ON est.w = ex.w ORDER BY est.w",
    doc="Per-hour distinct-user HyperLogLog vs the exact count — the"
    " grouped form the sketch ships in at 100 TB: one 256-register set"
    " per hour, built by per-(hour, register) max (partial-aggregated"
    " map-side), mergeable upward into daily/weekly sketches by the"
    " same max. The register grid materializes by exploding a"
    " 256-element literal per hour (never a cross join); fold and"
    " linear-counting branch are the q121 machinery per group; hour"
    " keys stay in the NTZ domain.",
)
def q126(spark, sf_dir):
    from smartbulkcopy_spark.queries import trunc_hour_ntz

    ev = table(spark, sf_dir, "events").select(
        trunc_hour_ntz("ts").alias("w"), "user_id"
    )
    uh = F.md5(F.col("user_id").cast("string"))
    h = ev.select(
        "w",
        F.conv(F.substring(uh, 1, 2), 16, 10).cast("int").alias("reg"),
        F.conv(F.substring(uh, 3, 8), 16, 10).cast("long").alias("v"),
    )
    rank = F.when(F.col("v") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.expr("bin(v)"))
    )
    r = (
        h.select("w", "reg", rank.alias("rank"))
        .groupBy("w", "reg")
        .agg(F.max("rank").alias("mr"))
    )
    grid = (
        ev.select("w")
        .distinct()
        .select(
            "w",
            F.explode(
                F.expr(f"sequence(0, {HLL_M - 1})")
            ).alias("reg"),
        )
    )
    fr = grid.join(r, ["w", "reg"], "left").select(
        "w", "reg", F.coalesce("mr", F.lit(0)).alias("m")
    )
    one = fr.groupBy("w").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(reg, m))), x -> x.m)"
        ).alias("ms")
    )
    z = F.expr(
        "aggregate(transform(ms, x -> power(2.0D, -x)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    raw = F.floor(
        F.lit((HLL_ALPHA_PPM / 1000000.0) * HLL_M * HLL_M) / z
    ).cast("long")
    staged = one.select(
        "w",
        F.expr("size(filter(ms, x -> x = 0))")
        .cast("long")
        .alias("n_zero_registers"),
        raw.alias("raw"),
    )
    lin = F.element_at(
        F.expr(sql_iarr(HLL_LIN)),
        F.col("n_zero_registers").cast("int"),
    ).cast("long")
    est = staged.select(
        "w",
        "n_zero_registers",
        F.when(
            (F.col("n_zero_registers") > 0)
            & (F.col("raw") <= HLL_RAW_CUTOVER),
            lin,
        )
        .otherwise(F.col("raw"))
        .alias("estimate"),
    )
    exact = ev.groupBy("w").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        est.join(exact, "w")
        .withColumn(
            "err_ppm",
            F.expr(
                "abs(estimate - exact_users) * 1000000L DIV exact_users"
            ).cast("long"),
        )
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k) cross-source overlap matrix. HLL can union but not
# intersect; the bottom-k sketch can: keep each source's k smallest
# distinct-token md5s, and for a pair estimate Jaccard as the fraction
# of the union's k smallest hashes present in BOTH sketches. At 100 TB
# this estimates the full source x source token-overlap matrix from
# 20 sketches of k hashes each, where the exact answer joins the entire
# token space. Everything is exact-set arithmetic over md5 strings
# (lexicographic = numeric order at fixed width), so both engines agree
# bit-for-bit; the exact Jaccard rides along as the audit. Spark avoids
# the inequality self-join (BNLJ) by collecting the 20 (source, sketch)
# structs into one row and exploding pairs row-local (the q111 bucket
# pattern); the oracle uses a plain SQL self-join.
# ---------------------------------------------------------------------------

KMV_K = 256


@register(
    "q127_kmv_source_overlap",
    "WITH tokS AS (SELECT DISTINCT source, unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS t FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    " hs AS (SELECT source, md5(t) AS h FROM tokS),"
    " rk AS (SELECT source, h, row_number()"
    " OVER (PARTITION BY source ORDER BY h) AS rn FROM hs),"
    f" ka AS (SELECT source, list(h ORDER BY h) AS kv FROM rk"
    f" WHERE rn <= {KMV_K} GROUP BY source),"
    " pr AS (SELECT x.source AS source_a, y.source AS source_b,"
    " x.kv AS kva, y.kv AS kvb FROM ka x JOIN ka y"
    " ON x.source < y.source),"
    " es AS (SELECT source_a, source_b,"
    f" list_sort(list_distinct(list_concat(kva, kvb)))[1:{KMV_K}] AS u,"
    " kva, kvb FROM pr),"
    " km AS (SELECT source_a, source_b,"
    " CAST(1000 * len(list_filter(u, e -> list_contains(kva, e)"
    " AND list_contains(kvb, e))) // len(u) AS BIGINT)"
    " AS kmv_jaccard_millis FROM es),"
    " ex AS (SELECT a.source AS source_a, b.source AS source_b,"
    " count(*) AS inter FROM tokS a JOIN tokS b"
    " ON a.t = b.t AND a.source < b.source"
    " GROUP BY a.source, b.source),"
    " sz AS (SELECT source, count(*) AS n FROM tokS GROUP BY source)"
    " SELECT km.source_a, km.source_b, km.kmv_jaccard_millis,"
    " CAST(1000 * coalesce(ex.inter, 0)"
    " // (sa.n + sb.n - coalesce(ex.inter, 0)) AS BIGINT)"
    " AS exact_jaccard_millis,"
    " CAST(abs(km.kmv_jaccard_millis - 1000 * coalesce(ex.inter, 0)"
    " // (sa.n + sb.n - coalesce(ex.inter, 0))) AS BIGINT)"
    " AS err_millis"
    " FROM km LEFT JOIN ex ON km.source_a = ex.source_a"
    " AND km.source_b = ex.source_b"
    " JOIN sz sa ON sa.source = km.source_a"
    " JOIN sz sb ON sb.source = km.source_b"
    " ORDER BY km.source_a, km.source_b",
    doc="Cross-source token-overlap matrix via KMV (bottom-k) sketches"
    f" (k={KMV_K}): each source keeps its k smallest distinct-token"
    " md5s; a pair's Jaccard estimate is the fraction of the union's k"
    " smallest hashes present in both sketches — the set-INTERSECTION"
    " capability HLL lacks, estimating the full source x source matrix"
    " from KBs per source where the exact answer joins the whole token"
    " space. The exact Jaccard rides along as the audit; md5 order is"
    " engine-identical, all arithmetic integer. Spark explodes pairs"
    " from one collected row (never an inequality self-join).",
)
def q127(spark, sf_dir):
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    base = docs.select("source", norm_text().alias("n"))
    tok = (
        base.where(F.trim(F.col("n")) != "")
        .select(
            "source", F.explode(F.split(F.trim(F.col("n")), " ")).alias("t")
        )
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    kmv = (
        tok.select("source", F.md5("t").alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("source")
        .agg(F.sort_array(F.collect_list("h")).alias("kv"))
    )
    one = kmv.agg(
        F.sort_array(F.collect_list(F.struct("source", "kv"))).alias("ss")
    )
    pairs = one.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (a, i) ->"
                " transform(slice(ss, i + 2, size(ss)),"
                " b -> struct(a, b))))"
            )
        ).alias("p")
    ).select(
        F.col("p.a.source").alias("source_a"),
        F.col("p.b.source").alias("source_b"),
        F.col("p.a.kv").alias("kva"),
        F.col("p.b.kv").alias("kvb"),
    )
    u = F.expr(f"slice(array_sort(array_union(kva, kvb)), 1, {KMV_K})")
    km = pairs.select(
        "source_a",
        "source_b",
        F.expr(
            f"1000 * size(array_intersect(array_intersect("
            f"slice(array_sort(array_union(kva, kvb)), 1, {KMV_K}), kva),"
            f" kvb)) DIV size(slice(array_sort(array_union(kva, kvb)),"
            f" 1, {KMV_K}))"
        )
        .cast("long")
        .alias("kmv_jaccard_millis"),
    )
    # exact side: per-token source sets explode to pairs row-local
    pt = tok.groupBy("t").agg(
        F.sort_array(F.collect_set("source")).alias("ss")
    )
    ex = (
        pt.select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, (a, i) ->"
                    " transform(slice(ss, i + 2, size(ss)),"
                    " b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .select(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("inter"))
    )
    sz = tok.groupBy("source").agg(F.count("*").alias("n"))
    sa = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    out = (
        km.join(ex, ["source_a", "source_b"], "left")
        .join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "kmv_jaccard_millis",
            F.expr(
                "1000 * coalesce(inter, 0L)"
                " DIV (na + nb - coalesce(inter, 0L))"
            )
            .cast("long")
            .alias("exact_jaccard_millis"),
        )
    )
    return out.withColumn(
        "err_millis",
        F.expr("abs(kmv_jaccard_millis - exact_jaccard_millis)").cast(
            "long"
        ),
    ).orderBy("source_a", "source_b")


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantile sketch. The sketch-family closer: HLL
# (q121/q126) answers distinct-count, CMS (q122) point frequency, Bloom
# (q123) membership, KMV (q127) set intersection — this answers
# QUANTILES from a mergeable summary. Per source the sketch is <= 64
# (bin, count) pairs that merge upward by addition (shard -> source ->
# corpus), so at 100 TB the length distribution of every slice costs a
# map-side-combined groupBy; the exact per-source quantile (which needs
# a per-source sort) rides along as the audit, with the estimate's
# error bounded by the bin width by construction. All integer: the
# q-th quantile estimate is the lower edge of the first bin whose
# cumulative count reaches ceil(q*n).
# ---------------------------------------------------------------------------

HQ_BINW = 16  # tokens per histogram bin
HQ_NBINS = 64  # lengths >= 1008 tokens clamp into the last bin

_HQ_NTOK_DUCK = (
    "CASE WHEN trim(" + NORM_SQL_DUCK + ") = '' THEN 0"
    " ELSE len(string_split(trim(" + NORM_SQL_DUCK + "), ' ')) END"
)


@register(
    "q133_hist_quantile_sketch",
    "WITH d AS (SELECT source, doc_id,"
    f" CAST({_HQ_NTOK_DUCK} AS BIGINT) AS n_tokens FROM documents),"
    f" b AS (SELECT source, least(n_tokens // {HQ_BINW},"
    f" {HQ_NBINS - 1}) AS bin, count(*) AS cnt FROM d"
    " GROUP BY source, bin),"
    " c AS (SELECT source, bin, cnt,"
    " sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,"
    " sum(cnt) OVER (PARTITION BY source) AS n FROM b),"
    " est AS (SELECT source,"
    f" CAST(min(CASE WHEN 1000 * cum >= 500 * n THEN bin END)"
    f" * {HQ_BINW} AS BIGINT) AS p50_hist,"
    f" CAST(min(CASE WHEN 1000 * cum >= 900 * n THEN bin END)"
    f" * {HQ_BINW} AS BIGINT) AS p90_hist,"
    f" CAST(min(CASE WHEN 1000 * cum >= 990 * n THEN bin END)"
    f" * {HQ_BINW} AS BIGINT) AS p99_hist FROM c GROUP BY source),"
    " r AS (SELECT source, n_tokens,"
    " row_number() OVER (PARTITION BY source"
    " ORDER BY n_tokens, doc_id) AS rn,"
    " count(*) OVER (PARTITION BY source) AS n FROM d),"
    " ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(min(CASE WHEN rn = (500 * n + 999) // 1000"
    " THEN n_tokens END) AS BIGINT) AS p50_exact,"
    " CAST(min(CASE WHEN rn = (900 * n + 999) // 1000"
    " THEN n_tokens END) AS BIGINT) AS p90_exact,"
    " CAST(min(CASE WHEN rn = (990 * n + 999) // 1000"
    " THEN n_tokens END) AS BIGINT) AS p99_exact FROM r"
    " GROUP BY source)"
    " SELECT ex.source, ex.n_docs,"
    " est.p50_hist, ex.p50_exact, est.p90_hist, ex.p90_exact,"
    " est.p99_hist, ex.p99_exact"
    " FROM ex JOIN est ON est.source = ex.source ORDER BY ex.source",
    doc="Mergeable histogram-quantile sketch vs exact: per source, the"
    " p50/p90/p99 token-length quantiles estimated from a 64-bin"
    " fixed-width histogram (the estimate is the lower edge of the"
    " first bin whose cumulative count reaches ceil(q*n) — error"
    " bounded by the 16-token bin width) alongside the exact"
    " percentile_disc values. The sketch is <= 64 integers per source"
    " and merges by addition shard->source->corpus; only the audit"
    " side sorts within a source. Completes the sketch family:"
    " HLL=distinct, CMS=frequency, Bloom=membership, KMV=intersection,"
    " histogram=quantiles.",
)
def q133(spark, sf_dir):
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.when(F.trim(norm_text()) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(norm_text()), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    hist = d.groupBy(
        "source",
        F.least(
            F.expr(f"n_tokens DIV {HQ_BINW}"), F.lit(HQ_NBINS - 1)
        ).alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("source")
    c = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )

    def _est(q):
        return (
            F.min(
                F.when(1000 * F.col("cum") >= q * F.col("n"), F.col("bin"))
            )
            * HQ_BINW
        ).cast("long")

    est = c.groupBy("source").agg(
        _est(500).alias("p50_hist"),
        _est(900).alias("p90_hist"),
        _est(990).alias("p99_hist"),
    )
    w_rn = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    r = d.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count("*").over(w_all)
    )

    def _exact(q):
        return F.min(
            F.when(
                F.col("rn") == F.expr(f"({q} * n + 999) DIV 1000"),
                F.col("n_tokens"),
            )
        ).cast("long")

    ex = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        _exact(500).alias("p50_exact"),
        _exact(900).alias("p90_exact"),
        _exact(990).alias("p99_exact"),
    )
    return (
        ex.join(est, "source")
        .select(
            "source",
            "n_docs",
            "p50_hist",
            "p50_exact",
            "p90_hist",
            "p90_exact",
            "p99_hist",
            "p99_exact",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Log2-bucketed inter-event-gap quantile sketch. Event gaps span seven
# orders of magnitude (milliseconds to days), so the q133 fixed-width
# histogram is useless here; the standard trick is power-of-two bins —
# bucket = length of the binary representation of the gap in ms, a pure
# STRING/integer operation both engines spell identically (bin() has no
# leading zeros in either), giving a guaranteed <= 2x relative error
# with ~40 buckets per event type, mergeable by addition. The exact
# per-type quantiles ride along as the audit.
# ---------------------------------------------------------------------------

_GAP_Q = (500, 900, 990)


@register(
    "q139_gap_quantile_sketch",
    "WITH g AS (SELECT event_type,"
    " CAST((epoch_us(ts) - epoch_us(lag(ts) OVER"
    " (PARTITION BY user_id ORDER BY ts, event_id))) // 1000 AS BIGINT)"
    " AS gap_ms FROM events),"
    " gg AS (SELECT event_type, gap_ms,"
    " CAST(length(bin(gap_ms)) AS BIGINT) AS b FROM g"
    " WHERE gap_ms IS NOT NULL),"
    " h AS (SELECT event_type, b, count(*) AS cnt FROM gg"
    " GROUP BY event_type, b),"
    " c AS (SELECT event_type, b, cnt,"
    " sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,"
    " sum(cnt) OVER (PARTITION BY event_type) AS n FROM h),"
    " est AS (SELECT event_type,"
    + ", ".join(
        f" CAST(CASE WHEN min(CASE WHEN 1000 * cum >= {q} * n"
        f" THEN b END) = 1 THEN 0 ELSE CAST(1 AS BIGINT) << (min(CASE WHEN 1000 * cum"
        f" >= {q} * n THEN b END) - 1) END AS BIGINT) AS p{q}_est_ms"
        for q in _GAP_Q
    )
    + " FROM c GROUP BY event_type),"
    " r AS (SELECT event_type, gap_ms,"
    " row_number() OVER (PARTITION BY event_type ORDER BY gap_ms) AS rn,"
    " count(*) OVER (PARTITION BY event_type) AS n FROM gg),"
    " ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,"
    + ", ".join(
        f" CAST(min(CASE WHEN rn = ({q} * n + 999) // 1000"
        f" THEN gap_ms END) AS BIGINT) AS p{q}_ms"
        for q in _GAP_Q
    )
    + " FROM r GROUP BY event_type)"
    " SELECT ex.event_type, ex.n_gaps,"
    " est.p500_est_ms, ex.p500_ms, est.p900_est_ms, ex.p900_ms,"
    " est.p990_est_ms, ex.p990_ms"
    " FROM ex JOIN est ON est.event_type = ex.event_type"
    " ORDER BY ex.event_type",
    doc="Inter-event-gap quantile sketch per event type: gaps (ms,"
    " NTZ-safe microsecond arithmetic, attributed to the later event in"
    " (ts, event_id) order per user) summarized into power-of-two"
    " buckets — bucket = length(bin(gap_ms)), a string-integer op both"
    " engines spell identically — giving <= 2x relative error from ~40"
    " mergeable counters per type; estimates are the bucket's lower"
    " edge at the first cumulative count reaching ceil(q*n). Exact"
    " p50/p90/p99 ride along as the audit.",
)
def q139(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        F.lag("ts").over(wl).alias("prev_ts"),
        "ts",
    ).select(
        "event_type",
        F.expr("timestampdiff(MICROSECOND, prev_ts, ts) DIV 1000")
        .cast("long")
        .alias("gap_ms"),
    )
    gg = g.where(F.col("gap_ms").isNotNull()).select(
        "event_type",
        "gap_ms",
        F.length(F.bin("gap_ms")).cast("long").alias("b"),
    )
    h = gg.groupBy("event_type", "b").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    c = h.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_all)
    )

    def _est_b(q):
        return F.min(
            F.when(1000 * F.col("cum") >= q * F.col("n"), F.col("b"))
        ).alias(f"p{q}_b")

    est = c.groupBy("event_type").agg(
        *[_est_b(q) for q in _GAP_Q]
    ).select(
        "event_type",
        *[
            F.expr(
                f"CASE WHEN p{q}_b = 1 THEN 0L ELSE"
                f" shiftleft(1L, cast(p{q}_b - 1 AS int)) END"
            )
            .cast("long")
            .alias(f"p{q}_est_ms")
            for q in _GAP_Q
        ],
    )
    w_rn = Window.partitionBy("event_type").orderBy("gap_ms")
    r = gg.withColumn("rn", F.row_number().over(w_rn)).withColumn(
        "n", F.count("*").over(w_all)
    )

    def _exact(q):
        return (
            F.min(
                F.when(
                    F.col("rn") == F.expr(f"({q} * n + 999) DIV 1000"),
                    F.col("gap_ms"),
                )
            )
            .cast("long")
            .alias(f"p{q}_ms")
        )

    ex = r.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        *[_exact(q) for q in _GAP_Q],
    )
    return (
        ex.join(est, "event_type")
        .select(
            "event_type",
            "n_gaps",
            "p500_est_ms",
            "p500_ms",
            "p900_est_ms",
            "p900_ms",
            "p990_est_ms",
            "p990_ms",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rolling 24-hour HLL: the MERGEABILITY payoff of q126's grouped
# sketches. "Distinct users in the trailing 24 h" is the dashboard
# number an exact count(DISTINCT) cannot produce without re-scanning 24
# hours of raw events per output hour; with per-hour register sets it
# is a per-register max across the trailing window. The window merge is
# spelled as a bounded contribution explode (each hour's sparse
# register rows contribute to target hours h..h+23, then max per
# (target, reg)) — an equi-shuffle both engines share, instead of the
# range self-join Spark would plan as BroadcastNestedLoop. The exact
# trailing-24h distinct count rides along via the same explode over
# distinct (hour, user) pairs.
# ---------------------------------------------------------------------------

ROLL_H = 24
# NTZ epoch for integer hour indexing (predates every fixture event)
_ROLL_ORIGIN = "1995-01-01 00:00:00"

_Q146_ORACLE = (
    "WITH ev AS (SELECT date_trunc('hour', ts) AS w, user_id"
    " FROM events),"
    f" hh AS (SELECT date_diff('hour', TIMESTAMP '{_ROLL_ORIGIN}', w)"
    " AS h, w, user_id FROM ev),"
    " hr AS (SELECT h,"
    " CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,2)) AS INT)"
    " AS reg,"
    " CAST(('0x'||substr(md5(CAST(user_id AS VARCHAR)),3,8)) AS BIGINT)"
    " AS v FROM hh),"
    " r AS (SELECT h, reg, max(CASE WHEN v = 0 THEN 33"
    " ELSE 33 - length(bin(v)) END) AS mr FROM hr GROUP BY h, reg),"
    " con AS (SELECT r.h + t.off AS tgt, r.reg, max(r.mr) AS mr"
    f" FROM r CROSS JOIN (SELECT unnest(range(0, {ROLL_H})) AS off) t"
    " GROUP BY tgt, r.reg),"
    " obs AS (SELECT DISTINCT h, w FROM hh),"
    " grid AS (SELECT obs.h, obs.w, t.reg FROM obs"
    f" CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS reg) t),"
    " fr2 AS (SELECT g.h, g.w, g.reg, coalesce(con.mr, 0) AS m"
    " FROM grid g LEFT JOIN con ON con.tgt = g.h AND con.reg = g.reg),"
    " arr AS (SELECT h, w, list(m ORDER BY reg) AS ms FROM fr2"
    " GROUP BY h, w),"
    " est0 AS (SELECT h, w,"
    " CAST(len(list_filter(ms, x -> x = 0)) AS BIGINT)"
    " AS n_zero_registers,"
    f" CAST(floor((({HLL_ALPHA_PPM}.0 / 1000000.0) * {HLL_M}.0"
    f" * {HLL_M}.0)"
    " / list_reduce(list_prepend(0.0, list_transform(ms,"
    " x -> power(2.0, -x))), (acc, x) -> acc + x)) AS BIGINT)"
    " AS raw FROM arr),"
    " est AS (SELECT h, w, n_zero_registers,"
    f" CASE WHEN n_zero_registers > 0 AND raw <= {HLL_RAW_CUTOVER}"
    f" THEN (CAST({HLL_LIN} AS BIGINT[]))[CAST(n_zero_registers"
    " AS INT)] ELSE raw END AS estimate FROM est0),"
    " ex AS (SELECT du.h + t.off AS tgt,"
    " CAST(count(DISTINCT du.user_id) AS BIGINT) AS exact_users_24h"
    " FROM (SELECT DISTINCT h, user_id FROM hh) du"
    f" CROSS JOIN (SELECT unnest(range(0, {ROLL_H})) AS off) t"
    " GROUP BY tgt)"
    " SELECT est.w, est.n_zero_registers, est.estimate,"
    " ex.exact_users_24h,"
    " CAST(abs(est.estimate - ex.exact_users_24h) * 1000000"
    " // ex.exact_users_24h AS BIGINT) AS err_ppm"
    " FROM est JOIN ex ON ex.tgt = est.h ORDER BY est.w"
)


@register(
    "q146_rolling_hll_users",
    _Q146_ORACLE,
    doc="Trailing-24h distinct-user HLL per observed hour — the"
    " mergeability payoff of q126's per-hour register sets: the"
    " rolling union is a per-register max across the window, spelled"
    " as a bounded contribution explode (sparse register rows fan to"
    " target hours h..h+23, equi-keyed groupBy max) instead of the"
    " range self-join Spark would plan as BNLJ. Register grid,"
    " rank/fold and linear-counting branch are the q121/q126"
    " machinery; the exact trailing count audits via the same explode"
    " over distinct (hour, user) pairs; hour indexing stays NTZ-safe"
    " (integer hours from a fixed naive origin).",
)
def q146(spark, sf_dir):
    from smartbulkcopy_spark.queries import trunc_hour_ntz

    ev = table(spark, sf_dir, "events").select(
        trunc_hour_ntz("ts").alias("w"), "user_id"
    )
    hh = ev.select(
        F.expr(
            f"timestampdiff(HOUR, TIMESTAMP_NTZ '{_ROLL_ORIGIN}', w)"
        )
        .cast("long")
        .alias("h"),
        "w",
        "user_id",
    )
    uh = F.md5(F.col("user_id").cast("string"))
    hr = hh.select(
        "h",
        F.conv(F.substring(uh, 1, 2), 16, 10).cast("int").alias("reg"),
        F.conv(F.substring(uh, 3, 8), 16, 10).cast("long").alias("v"),
    )
    rank = F.when(F.col("v") == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.expr("bin(v)"))
    )
    r = (
        hr.select("h", "reg", rank.alias("rank"))
        .groupBy("h", "reg")
        .agg(F.max("rank").alias("mr"))
    )
    off = F.explode(F.expr(f"sequence(0, {ROLL_H - 1})")).alias(
        "off"
    )
    con = (
        r.select("h", "reg", "mr", off)
        .select((F.col("h") + F.col("off")).alias("tgt"), "reg", "mr")
        .groupBy("tgt", "reg")
        .agg(F.max("mr").alias("mr"))
    )
    obs = hh.select("h", "w").distinct()
    grid = obs.select(
        "h",
        "w",
        F.explode(F.expr(f"sequence(0, {HLL_M - 1})")).alias(
            "reg"
        ),
    )
    fr = grid.join(
        con,
        (F.col("tgt") == F.col("h")) & (con["reg"] == grid["reg"]),
        "left",
    ).select(
        "h", "w", grid["reg"], F.coalesce("mr", F.lit(0)).alias("m")
    )
    one = fr.groupBy("h", "w").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(reg, m))), x -> x.m)"
        ).alias("ms")
    )
    z = F.expr(
        "aggregate(transform(ms, x -> power(2.0D, -x)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    raw = F.floor(
        F.lit((HLL_ALPHA_PPM / 1000000.0) * HLL_M * HLL_M) / z
    ).cast("long")
    staged = one.select(
        "h",
        "w",
        F.expr("size(filter(ms, x -> x = 0))")
        .cast("long")
        .alias("n_zero_registers"),
        raw.alias("raw"),
    )
    lin = F.element_at(
        F.expr(sql_iarr(HLL_LIN)),
        F.col("n_zero_registers").cast("int"),
    ).cast("long")
    est = staged.select(
        "h",
        "w",
        "n_zero_registers",
        F.when(
            (F.col("n_zero_registers") > 0)
            & (F.col("raw") <= HLL_RAW_CUTOVER),
            lin,
        )
        .otherwise(F.col("raw"))
        .alias("estimate"),
    )
    ex = (
        hh.select("h", "user_id")
        .distinct()
        .select("user_id", "h", off)
        .select((F.col("h") + F.col("off")).alias("tgt"), "user_id")
        .groupBy("tgt")
        .agg(
            F.countDistinct("user_id").cast("long").alias(
                "exact_users_24h"
            )
        )
    )
    return (
        est.join(ex, est["h"] == ex["tgt"])
        .select(
            "w",
            "n_zero_registers",
            "estimate",
            "exact_users_24h",
            F.expr(
                "abs(estimate - exact_users_24h) * 1000000L"
                " DIV exact_users_24h"
            )
            .cast("long")
            .alias("err_ppm"),
        )
        .orderBy("w")
    )
