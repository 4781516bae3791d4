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
from smartbulkcopy_spark.queries import register, table

# ---------------------------------------------------------------------------
# HyperLogLog distinct-token estimate (m = 256 registers, raw estimator).
# Register index = first md5 byte; rank = leading-zero count + 1 of the
# next 32 md5 bits. The raw harmonic estimate is emitted WITHOUT the
# small-range linear-counting correction: ln() is libm-dependent and
# would break bit-exact cross-engine floors, so n_zero_registers is
# emitted alongside for consumers that apply corrections. bin() strips
# leading zeros identically in both engines (bit_length = length(bin)).
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
        F.array(*[F.lit(x) for x in HLL_LIN]),
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
