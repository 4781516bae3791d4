"""Text-analysis operators over the `documents` table: exact dedup,
corpus stats, token counting, language-ID heuristic, quality scoring,
content fingerprinting.

No reference analog (the reference copies bytes, it never reads text) —
these are the Phase-5 pipeline operators (SURVEY §7.2). All expressions
are JVM-side `pyspark.sql.functions`; the only shuffles are the final
aggregations, which are partial-aggregate (map-side combine) by
construction.

Scale notes (100 TB):
- exact dedup groups by a 128-bit content hash, NOT the text itself — the
  shuffle carries (16-byte hash, doc_id), not document bodies.
- per-doc scores (tokens, quality, fingerprint) are pure row-local
  projections: zero shuffle, pipelined into whatever consumes them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from smartbulkcopy_spark.queries import eager, register, spread, table

# Canonical normalization: NULL -> '', lowercase, collapse whitespace
# runs. The DuckDB spelling (note the 'g' flag — DuckDB replaces
# first-match by default, Spark replaces all):
NORM_SQL_DUCK = "lower(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g'))"


def norm_text(col="text"):
    return F.lower(
        F.regexp_replace(F.coalesce(F.col(col), F.lit("")), r"\s+", " ")
    )


def token_count(col="text"):
    """Whitespace token count; empty/blank text counts 0 tokens."""
    trimmed = F.trim(F.col(col))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


TOKENS_SQL_DUCK = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


@register(
    "q21_exact_dedup",
    "SELECT CAST(('0x' || substr(hx, 1, 15)) AS BIGINT) AS h_hi,"
    " CAST(('0x' || substr(hx, 16, 15)) AS BIGINT) AS h_lo,"
    " min(doc_id) AS keep_doc_id, count(*) AS dup_count"
    " FROM (SELECT md5(" + NORM_SQL_DUCK + ") AS hx, doc_id"
    " FROM documents) GROUP BY h_hi, h_lo ORDER BY keep_doc_id",
    doc="Exact deduplication by normalized-content hash, keep-first"
    " semantics. Groups on the md5 split into two 60-bit BIGINT halves"
    " (120 bits — exact-dedup-grade; the round-13 integer-key rule), so"
    " the corpus-wide shuffle carries two 8-byte longs, never the text"
    " and never a 32-char hex string.",
)
def q21(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    hx = docs.select(F.md5(norm_text()).alias("hx"), "doc_id")
    return hx.groupBy(*exact_key_cols()).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("dup_count"),
    )


@register(
    "q22_text_stats",
    "SELECT lang, source, count(*) AS n_docs,"
    " CAST(sum(n_chars) AS BIGINT) AS total_chars,"
    " min(n_chars) AS min_chars, max(n_chars) AS max_chars"
    " FROM documents GROUP BY lang, source ORDER BY lang, source",
    doc="Corpus composition stats per (lang, source) — the first question"
    " anyone asks of a training corpus. Plain partial-aggregable groupBy.",
)
def q22(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "q23_token_counts",
    "SELECT lang, count(*) AS n_docs,"
    " CAST(sum(" + TOKENS_SQL_DUCK + ") AS BIGINT) AS total_tokens,"
    " max(" + TOKENS_SQL_DUCK + ") AS max_tokens"
    " FROM documents GROUP BY lang ORDER BY lang",
    doc="Whitespace token counting (the BPE-precursor budget metric),"
    " aggregated per language. Token count is a row-local expression;"
    " only (lang, partial sums) shuffle.",
)
def q23(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("n_tokens", token_count())
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang")
    )


# Deterministic split assignment: bucket 0-89 train, 90-94 val, 95-99
# test, from the first 4 hex chars of md5(id). Hash-based (not random)
# so the split is stable under reprocessing, joinable from any table
# that knows the id, and identically computable by any engine — the
# properties a 100 TB pipeline needs from its train/val/test split.
# ONE generator per policy: every consumer (q50/q76/q86/q92/q98,
# curate's export) derives its spelling from these two functions, so a
# policy change cannot leave a consumer computing a different split.


def hash_bucket_sql(engine: str, col: str, mod: int) -> str:
    """The md5-prefix hash bucket, spelled for either engine."""
    if engine == "spark":
        return (
            f"CAST(conv(substr(md5(CAST({col} AS STRING)), 1, 4),"
            f" 16, 10) AS INT) % {mod}"
        )
    return (
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))"
        f" AS INT) % {mod}"
    )


def split_case_sql(engine: str, col: str = "doc_id") -> str:
    """The 90/5/5 split policy as a CASE expression over `col`."""
    b = hash_bucket_sql(engine, col, 100)
    return (
        f"CASE WHEN {b} < 90 THEN 'train'"
        f" WHEN {b} < 95 THEN 'val'"
        " ELSE 'test' END"
    )


_SPLIT_BUCKET_SPARK = hash_bucket_sql("spark", "doc_id", 100)
_SPLIT_BUCKET_DUCK = hash_bucket_sql("duck", "doc_id", 100)
SPLIT_CASE_DUCK = split_case_sql("duck", "doc_id")


def split_col():
    """The split assignment as a Spark Column (the q50 policy)."""
    bucket = F.expr(_SPLIT_BUCKET_SPARK)
    return (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


@register(
    "q50_split_assignment",
    f"WITH s AS (SELECT lang, {SPLIT_CASE_DUCK} AS split FROM documents)"
    " SELECT lang, split, count(*) AS n_docs"
    " FROM s GROUP BY lang, split ORDER BY lang, split",
    doc="Deterministic 90/5/5 train/val/test split assignment from"
    " md5(doc_id) buckets, audited per language. Row-local hash, tiny"
    " (lang, split, partials) shuffle; the same expression filters any"
    " downstream table without a join, and reprocessing or backfilling"
    " never reshuffles examples across splits.",
)
def q50(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", split_col().alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


VOCAB_TOP_K = 100


@register(
    "q48_vocab_topk",
    "WITH tok AS (SELECT doc_id, unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS token FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != '')"
    " SELECT token, count(*) AS tf,"
    " count(DISTINCT doc_id) AS df"
    " FROM tok GROUP BY token"
    f" ORDER BY tf DESC, token LIMIT {VOCAB_TOP_K}",
    doc="Corpus vocabulary: top-100 tokens by term frequency, with"
    " document frequency — the first artifact of BPE/tokenizer training"
    " and the standard stopword-discovery pass. Explode is row-local;"
    " partial aggregation collapses each partition's token counts before"
    " the single (token, partials) shuffle, and the top-k is TakeOrdered"
    " — no global sort materializes the full vocabulary. count-distinct"
    " over doc_id rides the same shuffle (Spark plans it as a two-phase"
    " aggregate, still keyed by token).",
)
def q48(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    toks = (
        docs.select("doc_id", n.alias("n"))
        .where(F.col("n") != "")
        .select("doc_id", F.explode(F.split(F.col("n"), " ")).alias("token"))
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(VOCAB_TOP_K)
    )


TFIDF_TOP_TERMS = 3


@register(
    "q52_tfidf_top_terms",
    "WITH tok AS (SELECT doc_id, unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS token FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    " tf AS (SELECT doc_id, token, count(*) AS tf FROM tok"
    " GROUP BY doc_id, token),"
    " df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),"
    " scored AS (SELECT t.doc_id, t.token,"
    " CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df,"
    " CAST(t.tf * 10000 * (SELECT count(*) FROM documents) // d.df"
    " AS BIGINT) AS score_e4"
    " FROM tf t JOIN df d USING (token))"
    " SELECT doc_id, token, tf, df, score_e4, CAST(rn AS BIGINT) AS rnk"
    " FROM (SELECT *, row_number() OVER (PARTITION BY doc_id"
    " ORDER BY score_e4 DESC, token) AS rn FROM scored)"
    f" WHERE rn <= {TFIDF_TOP_TERMS} ORDER BY doc_id, rnk",
    doc="TF-IDF top-3 characteristic terms per document. The score is"
    " exact integer arithmetic (tf·1e4·N DIV df) — same rank order as"
    " tf·idf with a reciprocal-df idf, but reproducible bit-for-bit on"
    " any engine, unlike a float ln() whose last ulp can differ across"
    " libm builds. tf and df are partial-aggregated groupBys; the tf⋈df"
    " join is keyed by token (AQE broadcasts the vocabulary side when it"
    " fits); the per-doc ranking window partitions by doc_id, so groups"
    " are document-sized and all documents rank in parallel.",
)
def q52(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()  # bounded scalar, same pattern as the IVF centroids
    norm = F.trim(norm_text())
    toks = (
        docs.select("doc_id", norm.alias("n"))
        .where(F.col("n") != "")
        .select("doc_id", F.explode(F.split(F.col("n"), " ")).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "token").withColumn(
        "score_e4", F.expr(f"tf * 10000 * {n_docs}L DIV df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_e4").desc(), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TFIDF_TOP_TERMS)
        .select("doc_id", "token", "tf", "df", "score_e4", "rnk")
    )


# Per-source mixture rates for the resampling audit: the first 5 sources
# are kept whole, the next 5 at 50 %, the long tail at 10 % — the shape
# of a data-mixture spec (quality tiers get different sampling weights).
_MIX_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 4),"
    " 16, 10) AS INT) % 100"
)
_MIX_BUCKET_DUCK = (
    "CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))"
    " AS INT) % 100"
)
_MIX_RATE_SQL = "CASE WHEN si < 5 THEN 100 WHEN si < 10 THEN 50 ELSE 10 END"


def mix_rate_col():
    """Per-source mixture weight (percent kept) as a Spark Column —
    the single spelling shared by q56's audit and curate.py's filter."""
    si = F.substring("source", 4, 10).cast("int")
    return F.when(si < 5, 100).when(si < 10, 50).otherwise(10)


def mix_keep_col():
    """True iff the salted doc hash lands under the source's weight."""
    return F.expr(_MIX_BUCKET_SPARK) < mix_rate_col()


@register(
    "q56_mixture_resample",
    "WITH s AS (SELECT source,"
    " CAST(substr(source, 4) AS INT) AS si,"
    f" {_MIX_BUCKET_DUCK} AS b FROM documents)"
    f" SELECT source, CAST({_MIX_RATE_SQL} AS BIGINT) AS target_pct,"
    " count(*) AS n_docs,"
    f" CAST(sum(CASE WHEN b < {_MIX_RATE_SQL} THEN 1 ELSE 0 END)"
    " AS BIGINT) AS n_kept"
    " FROM s GROUP BY source, target_pct ORDER BY source",
    doc="Data-mixture resampling audit: each source is down-sampled to"
    " its mixture weight by a salted deterministic hash of doc_id —"
    " a zero-shuffle row-local filter, stable under reprocessing and"
    " disjoint from the q50 split hash (different salt). The audit"
    " aggregates (source, kept) counts so the realized mixture can be"
    " compared to the target weights; the same keep-expression filters"
    " the corpus downstream without any join.",
)
def q56(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            mix_rate_col().cast("long").alias("target_pct"),
            mix_keep_col().cast("int").alias("kept"),
        )
        .groupBy("source", "target_pct")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "q65_exact_length_quantiles",
    # NULL n_chars would sort NULLS FIRST in Spark's window but NULLS
    # LAST in DuckDB's, corrupting every cumulative count in the group —
    # rows with unknown length are excluded from the distribution.
    "WITH h AS (SELECT lang, n_chars, count(*) AS c FROM documents"
    " WHERE n_chars IS NOT NULL GROUP BY lang, n_chars),"
    " cum AS (SELECT lang, n_chars, c,"
    " sum(c) OVER (PARTITION BY lang ORDER BY n_chars"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc,"
    " sum(c) OVER (PARTITION BY lang) AS tot FROM h)"
    " SELECT lang,"
    " min(CASE WHEN rc * 2 >= tot THEN n_chars END) AS median_chars,"
    " min(CASE WHEN rc * 10 >= tot * 9 THEN n_chars END) AS p90_chars,"
    " min(n_chars) AS min_chars, max(n_chars) AS max_chars"
    " FROM cum GROUP BY lang ORDER BY lang",
    doc="EXACT per-language length quantiles via cumulative histogram —"
    " the deterministic alternative to approx_percentile, whose sketch"
    " output is neither cross-engine nor run-to-run stable enough to"
    " oracle-check. The histogram groupBy is partial-aggregated and the"
    " window runs over HISTOGRAM rows (distinct values per group), not"
    " documents — at 100 TB a length histogram is a few thousand rows"
    " per language, so the per-group window is trivially small while"
    " the answer stays exact. All-integer arithmetic: no interpolation,"
    " no float quantile semantics to disagree on.",
)
def q65(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    h = (
        docs.where(F.col("n_chars").isNotNull())
        .groupBy("lang", "n_chars")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.select(
        "lang",
        "n_chars",
        F.sum("c").over(w).alias("rc"),
        F.sum("c").over(Window.partitionBy("lang")).alias("tot"),
    )
    med = F.when(F.col("rc") * 2 >= F.col("tot"), F.col("n_chars"))
    p90 = F.when(F.col("rc") * 10 >= F.col("tot") * 9, F.col("n_chars"))
    return (
        cum.groupBy("lang")
        .agg(
            F.min(med).alias("median_chars"),
            F.min(p90).alias("p90_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


# Word-boundary blocklist for the redaction audit. The fixture text is
# lowercase word salad, so classic PII shapes (emails, digit runs) never
# occur; redacting corpus terms exercises the identical machinery —
# boundary-anchored RE2/Java-compatible alternation, global replace,
# post-redaction fingerprint — on patterns that actually fire.
_BLOCKLIST_RE = r"\b(customer|key|vector)\b"
_REDACTED = "[TERM]"
_BLOCK_KEEP_MAX = 3


@register(
    "q53_blocklist_redaction",
    f"WITH n AS (SELECT doc_id, {NORM_SQL_DUCK} AS norm FROM documents)"
    " SELECT doc_id,"
    f" CAST(len(regexp_extract_all(norm, '{_BLOCKLIST_RE}')) AS BIGINT)"
    "  AS n_blocked,"
    f" len(regexp_extract_all(norm, '{_BLOCKLIST_RE}')) <= {_BLOCK_KEEP_MAX}"
    "  AS kept,"
    f" md5(regexp_replace(norm, '{_BLOCKLIST_RE}', '{_REDACTED}', 'g'))"
    "  AS redacted_md5"
    " FROM n ORDER BY doc_id",
    doc="Blocklist redaction audit: per-document count of blocklisted"
    " terms (word-boundary alternation), a keep/drop flag against the"
    " policy threshold, and the md5 fingerprint of the redacted text —"
    " the verifiable artifact a PII/ToS scrubbing pass must produce."
    " Pure row-local projection: zero shuffle, pipelines into any"
    " consumer at corpus scale. Both engines run the same RE2-compatible"
    " pattern and a global replace, so the fingerprints agree"
    " bit-for-bit.",
)
def q53(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pat = F.lit(_BLOCKLIST_RE)
    n = norm_text()
    n_blocked = F.regexp_count(n, pat).cast("long")
    return docs.select(
        "doc_id",
        n_blocked.alias("n_blocked"),
        (n_blocked <= _BLOCK_KEEP_MAX).alias("kept"),
        F.md5(F.regexp_replace(n, _BLOCKLIST_RE, _REDACTED)).alias(
            "redacted_md5"
        ),
    )


# Stopword-marker language guesser. The fixture text is synthetic word
# salad, so accuracy against the label is irrelevant — what the oracle
# checks is that the classification EXPRESSION is deterministic and
# identical across engines (the honest form of an n-gram heuristic).
_LANG_MARKERS = [
    ("de", [" der ", " und ", " nicht "]),
    ("fr", [" le ", " les ", " est "]),
    ("es", [" el ", " que ", " los "]),
    ("en", [" the ", " and ", " of "]),
]


def _guess_lang_spark():
    # .like() mirrors the oracle's LIKE patterns literally (the markers
    # contain no SQL wildcard metacharacters, so LIKE == contains here).
    padded = F.concat(F.lit(" "), norm_text(), F.lit(" "))
    expr = F.lit("und")
    for lang, markers in reversed(_LANG_MARKERS):
        cond = None
        for m in markers:
            c = padded.like(f"%{m}%")
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def _guess_lang_duck() -> str:
    padded = "(' ' || " + NORM_SQL_DUCK + " || ' ')"
    cases = []
    for lang, markers in _LANG_MARKERS:
        conds = " OR ".join(
            f"{padded} LIKE '%{m}%'" for m in markers
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


@register(
    "q24_lang_id_confusion",
    "SELECT lang AS labeled, " + _guess_lang_duck() + " AS guessed,"
    " count(*) AS c FROM documents GROUP BY labeled, guessed"
    " ORDER BY labeled, guessed",
    doc="Marker-word language-ID heuristic with a labeled-vs-guessed"
    " confusion matrix. Row-local classify, tiny shuffle.",
)
def q24(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled"),
            _guess_lang_spark().alias("guessed"),
        )
        .groupBy("labeled", "guessed")
        .agg(F.count("*").alias("c"))
        .orderBy("labeled", "guessed")
    )


@register(
    "q25_quality_score",
    "SELECT doc_id,"
    " CAST(floor(100.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    "   / greatest(length(text), 1)) AS BIGINT) AS alpha_pct,"
    " CAST(floor(100.0 * (length(text) - length(replace(text, ' ', '')))"
    "   / greatest(length(text), 1)) AS BIGINT) AS space_pct,"
    " " + TOKENS_SQL_DUCK + " AS n_tokens"
    " FROM documents ORDER BY doc_id",
    doc="Per-document quality signals: alphabetic ratio, whitespace ratio,"
    " token count — the standard cheap filters before expensive model"
    " scoring. Pure projection, zero shuffle.",
)
def q25(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n = F.greatest(F.length("text"), F.lit(1))
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    spaces = F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", ""))
    return docs.select(
        "doc_id",
        F.floor(100.0 * alpha / n).alias("alpha_pct"),
        F.floor(100.0 * spaces / n).alias("space_pct"),
        token_count().alias("n_tokens"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the classic GPT-2-style split minus the unicode categories (kept to
# ASCII classes so Java regex and RE2 agree byte-for-byte). Runs over the
# normalized text, where whitespace is already collapsed to single
# spaces.
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "q38_bpe_token_counts",
    "SELECT lang, count(*) AS n_docs,"
    f" CAST(sum(len(regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}')))"
    " AS BIGINT) AS total_bpe_tokens,"
    " CAST(sum(" + TOKENS_SQL_DUCK + ") AS BIGINT) AS total_ws_tokens"
    " FROM documents GROUP BY lang ORDER BY lang",
    doc="BPE-ish regex pre-tokenization (letter runs / digit runs /"
    " single punctuation) next to the whitespace budget metric, per"
    " language. The regex stays in ASCII classes so both engines'"
    " regex dialects agree. Row-local extract; only (lang, partial"
    " sums) shuffle.",
)
def q38(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all(norm_text(), F.lit(_BPE_PATTERN), 0))
    return (
        docs.select("lang", bpe.alias("bpe"), token_count().alias("ws"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe").alias("total_bpe_tokens"),
            F.sum("ws").alias("total_ws_tokens"),
        )
        .orderBy("lang")
    )


# Polynomial rolling hash (Rabin-Karp family): h = fold over chars of
# (h*31 + codepoint) mod 2^31. Order-dependent by construction — unlike
# the md5 fingerprint it supports incremental window updates, which is
# why dedup literature uses it for content-defined chunking. The fold is
# inherently sequential per document, so it is spelled as a higher-order
# aggregate (per-row local, zero shuffle); cross-engine parity holds
# because both engines fold left-to-right over int64.
ROLLING_MOD = 2_147_483_648  # 2^31


@register(
    "q39_rolling_hash",
    "SELECT doc_id, CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),"
    f" list_transform(range(1, len({NORM_SQL_DUCK}) + 1),"
    f" i -> ord(substr({NORM_SQL_DUCK}, i, 1)))),"
    f" (a, b) -> (a * 31 + b) % {ROLLING_MOD}) AS BIGINT) AS rhash"
    " FROM documents ORDER BY doc_id",
    doc="Rabin-Karp polynomial rolling hash of the normalized document"
    " (base 31, mod 2^31) — the incremental-update fingerprint used for"
    " content-defined chunking. Sequential per-row fold, zero shuffle.",
)
def q39(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    # Pre-project the normalized text: the HOF lambda below re-evaluates
    # its bound expression per element, so the regex must not be inline.
    rolled = F.expr(
        "aggregate(transform(split(n, ''), c -> ascii(c)), 0L,"
        f" (a, b) -> (a * 31 + b) % {ROLLING_MOD})"
    )
    return docs.select("doc_id", norm_text().alias("n")).select(
        "doc_id", rolled.cast("bigint").alias("rhash")
    )


@register(
    "q26_doc_fingerprint",
    "SELECT doc_id, md5(" + NORM_SQL_DUCK + ") AS fingerprint"
    " FROM documents ORDER BY doc_id",
    doc="Stable 128-bit content fingerprint of the normalized document —"
    " the join key for cross-corpus dedup and provenance tracking."
    " Row-local, zero shuffle.",
)
def q26(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))


# Exact n-gram decontamination: the eval-leakage pass (the GPT-3
# appendix-C method) — flag every training document sharing an exact
# 5-token n-gram with the held-out eval source. Distinct machinery from
# the LSH contamination check (q49): that finds REWRAPPED near-copies;
# this finds verbatim spans, the thing eval benchmarks actually leak as.
DECON_N = 5
DECON_EVAL_SOURCE = "src0"  # the fixture's stand-in held-out eval set

# 60-bit INTEGER gram key: the first 15 hex chars of the gram md5,
# parsed to BIGINT identically on both engines. Every gram-stream
# shuffle in the repo keys on this (q68/q80 per-token decontamination,
# q119/q180 per-char substring spans): shuffling an 8-byte long
# instead of a 32-char hex string removed a measured resource cliff at
# high verbatim mass (round 13: q68's hex shuffle read 18.1 s /
# exponent 1.68 at verbatim 16x->32x of sf0.1, the integer key 5.9 s /
# 0.45 — flat-then-cliff, width-insensitive, i.e. string sort/join
# memory, not the plan). Collision risk is negligible (n^2/2^61:
# ~0.06 expected collisions at 3x10^8 distinct grams) and a collision
# only ADDS a flagged doc / merges one span pair — the conservative
# direction for contamination screens and dedup alike (q123's bloom
# variant embraces false positives outright; it keeps the hex string
# because its k bit probes salt it).


def gram_key_spark(gram: str) -> str:
    return f"CAST(conv(substr(md5({gram}), 1, 15), 16, 10) AS BIGINT)"


def gram_key_duck(gram: str) -> str:
    return f"CAST(('0x' || substr(md5({gram}), 1, 15)) AS BIGINT)"


# EXACT-dedup grade 120-bit variant: the md5 split into two 60-bit
# BIGINT halves (conv() of 16 hex chars would overflow BIGINT, so 15+15
# of the 32). Collision risk n^2/2^121 — zero at any corpus size worth
# naming — while the corpus-wide groupBy shuffles two 8-byte longs
# instead of a 32-char hex string. Consumers: q21 and the curate
# keep_exact stages.


def exact_key_cols(hx: str = "hx"):
    return [
        F.expr(f"CAST(conv(substr({hx}, 1, 15), 16, 10) AS BIGINT)").alias(
            "h_hi"
        ),
        F.expr(f"CAST(conv(substr({hx}, 16, 15), 16, 10) AS BIGINT)").alias(
            "h_lo"
        ),
    ]


@register(
    "q68_eval_decontamination",
    "WITH tok AS (SELECT doc_id, source, string_split(trim("
    + NORM_SQL_DUCK + "), ' ') AS t FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    f" g AS (SELECT doc_id, source, unnest(list_transform("
    f"range(1, len(t) - {DECON_N - 1} + 1),"
    " i -> " + gram_key_duck(
        f"array_to_string(list_slice(t, i, i + {DECON_N - 1}), ' ')"
    )
    + f")) AS gh FROM tok WHERE len(t) >= {DECON_N}),"
    f" ev AS (SELECT DISTINCT gh FROM g"
    f" WHERE source = '{DECON_EVAL_SOURCE}'),"
    f" tr AS (SELECT doc_id, gh FROM g"
    f" WHERE source != '{DECON_EVAL_SOURCE}')"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_gram_hits,"
    " CAST(count(DISTINCT gh) AS BIGINT) AS n_shared_grams"
    " FROM tr JOIN ev USING (gh) GROUP BY doc_id ORDER BY doc_id",
    doc="Exact 5-token-gram decontamination against the held-out eval"
    " source: training documents sharing any verbatim 5-gram with an"
    " eval document, with hit counts. An inverted-index join on the"
    " 60-bit integer gram key (md5-derived — see gram_key_spark: the"
    " 8-byte long shuffle removed a measured string-sort resource"
    " cliff at high verbatim mass) — the eval side is DEDUPED before"
    " the join, so a boilerplate gram fans out 1:1 per training"
    " instance, never quadratically; the shuffle carries (8-byte key,"
    " doc_id), never text. Per-doc aggregation groups are"
    " document-sized.",
)
def q68(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    tok = (
        docs.select("doc_id", "source", n.alias("n"))
        .where(F.col("n") != "")
        .select("doc_id", "source", F.split(F.col("n"), " ").alias("t"))
        .where(F.size("t") >= DECON_N)
    )
    # t is referenced by both the sequence bound and the slice, so the
    # projection survives CollapseProject (the HOF re-evaluation trap).
    grams = tok.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {DECON_N - 1}),"
                " i -> "
                + gram_key_spark(
                    f"array_join(slice(t, i, {DECON_N}), ' ')"
                )
                + ")"
            )
        ).alias("gh"),
    )
    ev = (
        grams.where(F.col("source") == DECON_EVAL_SOURCE)
        .select("gh")
        .distinct()
    )
    tr = grams.where(F.col("source") != DECON_EVAL_SOURCE).select(
        "doc_id", "gh"
    )
    return (
        tr.join(ev, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_gram_hits"),
            F.countDistinct("gh").alias("n_shared_grams"),
        )
        .orderBy("doc_id")
    )


# Span REMOVAL — the operator an eval-decontamination pipeline actually
# ships. q68 detects leaked 5-grams; this rewrites the training corpus so
# the leakage is GONE: every token covered by a leaked 5-gram window is
# dropped and each maximal dropped run collapses to one sentinel token.
# Residual leakage is provably zero: any 5-gram of the redacted text that
# does not contain the sentinel is a contiguous run of kept tokens, which
# was a contiguous window of the original text — and every leaked window
# was removed; grams containing the sentinel cannot match eval grams
# because the sentinel token never occurs in (normalized) eval text.
DECON_SENTINEL = "<redacted>"


def _covered(j: str) -> str:
    """SQL predicate: token position `j` lies inside a leaked window
    starting at any hit position h (windows span h .. h+N-1)."""
    return f"exists(hits, h -> {j} >= h AND {j} <= h + {DECON_N - 1})"


@register(
    "q80_decontaminated_redact",
    "WITH tok AS (SELECT doc_id, source, string_split(trim("
    + NORM_SQL_DUCK + "), ' ') AS t FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    f" ev AS (SELECT DISTINCT unnest(list_transform("
    f"range(1, len(t) - {DECON_N - 1} + 1),"
    " i -> " + gram_key_duck(
        f"array_to_string(list_slice(t, i, i + {DECON_N - 1}), ' ')"
    )
    + ")) AS gh FROM tok"
    f" WHERE source = '{DECON_EVAL_SOURCE}' AND len(t) >= {DECON_N}),"
    f" trn AS (SELECT doc_id, t FROM tok"
    f" WHERE source != '{DECON_EVAL_SOURCE}'),"
    f" tg0 AS (SELECT doc_id, t,"
    f" unnest(range(1, len(t) - {DECON_N - 1} + 1)) AS i FROM trn"
    f" WHERE len(t) >= {DECON_N}),"
    " tg AS (SELECT doc_id, i, " + gram_key_duck(
        f"array_to_string(list_slice(t, i, i + {DECON_N - 1}), ' ')"
    )
    + " AS gh FROM tg0),"
    " hit AS (SELECT doc_id, list(i) AS hits FROM tg"
    " JOIN ev USING (gh) GROUP BY doc_id),"
    " red AS (SELECT trn.doc_id, trn.t,"
    " coalesce(h.hits, []) AS hits FROM trn LEFT JOIN hit h USING (doc_id))"
    " SELECT doc_id,"
    " CAST(len(list_filter(range(1, len(t) + 1), j ->"
    f" len(list_filter(hits, h -> j >= h AND j <= h + {DECON_N - 1})) > 0))"
    " AS BIGINT) AS n_tokens_removed,"
    " CAST(len(list_filter(range(1, len(t) + 1), j ->"
    f" len(list_filter(hits, h -> j >= h AND j <= h + {DECON_N - 1})) > 0"
    " AND (j = 1 OR len(list_filter(hits, h ->"
    f" j - 1 >= h AND j - 1 <= h + {DECON_N - 1})) = 0)))"
    " AS BIGINT) AS n_spans,"
    " array_to_string(list_filter(list_transform(range(1, len(t) + 1),"
    " j -> CASE WHEN len(list_filter(hits, h ->"
    f" j >= h AND j <= h + {DECON_N - 1})) = 0 THEN t[j]"
    " WHEN j = 1 OR len(list_filter(hits, h ->"
    f" j - 1 >= h AND j - 1 <= h + {DECON_N - 1})) = 0"
    f" THEN '{DECON_SENTINEL}' ELSE '' END), p -> p != ''), ' ')"
    " AS redacted_text"
    " FROM red ORDER BY doc_id",
    doc="Verbatim-span REMOVAL completing q68's detection: every training"
    " document rewritten with leaked 5-gram windows excised, maximal"
    " removed runs collapsed to one sentinel token, plus removal counts."
    " Residual leakage is zero by construction (see module comment)."
    " Scale shape: the hit positions come from the same inverted-index"
    " gram-key join as q68 (eval side deduped, shuffle carries the"
    " 60-bit integer key + doc_id + int position, never text); per-doc"
    " hit lists are"
    " collected once (bounded by doc length) and the rewrite itself is"
    " row-local array arithmetic — no second corpus shuffle.",
)
def q80(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    tok = (
        docs.select("doc_id", "source", n.alias("n"))
        .where(F.col("n") != "")
        .select("doc_id", "source", F.split(F.col("n"), " ").alias("t"))
    )
    gram_struct = F.expr(
        f"transform(sequence(1, size(t) - {DECON_N - 1}),"
        " i -> struct(i AS i, "
        + gram_key_spark(f"array_join(slice(t, i, {DECON_N}), ' ')")
        + " AS gh))"
    )
    ev = (
        tok.where(
            (F.col("source") == DECON_EVAL_SOURCE)
            & (F.size("t") >= DECON_N)
        )
        .select(F.explode(gram_struct).alias("g"))
        .select(F.col("g.gh").alias("gh"))
        .distinct()
    )
    trn = tok.where(F.col("source") != DECON_EVAL_SOURCE).select(
        "doc_id", "t"
    )
    hits = (
        trn.where(F.size("t") >= DECON_N)
        .select("doc_id", F.explode(gram_struct).alias("g"))
        .select("doc_id", F.col("g.i").alias("i"), F.col("g.gh").alias("gh"))
        .join(ev, "gh")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("hits"))
    )
    red = trn.join(hits, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce(F.col("hits"), F.expr("array()")).alias("hits"),
    )
    piece = (
        f"CASE WHEN NOT {_covered('j')} THEN element_at(t, j)"
        f" WHEN j = 1 OR NOT {_covered('j - 1')}"
        f" THEN '{DECON_SENTINEL}' ELSE '' END"
    )
    return red.select(
        "doc_id",
        F.expr(f"size(filter(sequence(1, size(t)), j -> {_covered('j')}))")
        .cast("bigint")
        .alias("n_tokens_removed"),
        F.expr(
            f"size(filter(sequence(1, size(t)), j -> {_covered('j')}"
            f" AND (j = 1 OR NOT {_covered('j - 1')})))"
        )
        .cast("bigint")
        .alias("n_spans"),
        F.expr(
            f"array_join(filter(transform(sequence(1, size(t)),"
            f" j -> {piece}), p -> p != ''), ' ')"
        ).alias("redacted_text"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Corpus-model novelty scoring: a two-pass character-trigram model. Pass 1
# learns the corpus's top-V trigrams (the "model" — small by construction);
# pass 2 scores every document by the share of its trigrams OUTSIDE the
# model. High novelty flags encoding garbage, keyboard mashing, and
# out-of-distribution text the way an LM-perplexity filter would, but with
# integer-exact arithmetic that hashes identically across engines (no
# float log). Scale: pass 1 is a partial-aggregated trigram count + a
# TakeOrdered(V) — no global sort; pass 2 joins exploded trigrams against
# the BROADCAST V-row model and rolls up per doc with map-side combine.
# Two corpus scans total, the textbook shape for learn-then-score; the
# exploded trigrams are never persisted or shuffled document-sized.
# Ties at the rank-V boundary break on the trigram string (binary UTF-8
# collation in both engines), so the model set is deterministic.
# ---------------------------------------------------------------------------

TRIGRAM_V = 1024

_TRIGRAMS_SPARK = (
    "transform(sequence(1, greatest(length(n) - 2, 1)),"
    " i -> substr(n, i, 3))"
)
_TRIGRAMS_DUCK = (
    "list_transform(range(1, greatest(length(nn) - 2, 1) + 1),"
    " i -> substr(nn, i, 3))"
)


@register(
    "q71_trigram_novelty",
    f"WITH n AS (SELECT doc_id, {NORM_SQL_DUCK} AS nn FROM documents),"
    f" gr AS (SELECT doc_id, unnest({_TRIGRAMS_DUCK}) AS g FROM n),"
    " model AS (SELECT g FROM (SELECT g, count(*) AS c FROM gr GROUP BY g"
    f" ORDER BY c DESC, g LIMIT {TRIGRAM_V})),"
    " s AS (SELECT d.doc_id, count(*) AS n_grams,"
    " sum(CASE WHEN m.g IS NULL THEN 1 ELSE 0 END) AS unk"
    " FROM gr d LEFT JOIN model m ON d.g = m.g GROUP BY d.doc_id)"
    " SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,"
    " CAST(unk AS BIGINT) AS novel_grams,"
    " CAST(floor(1000.0 * unk / n_grams) AS BIGINT) AS novelty_permille"
    " FROM s ORDER BY doc_id",
    doc="Corpus-trigram novelty score per document: share (per-mille) of"
    " a doc's character trigrams outside the corpus's top-1024 trigram"
    " model. The integer-exact stand-in for LM-perplexity filtering;"
    " two-pass learn-then-score, broadcast model join, no float"
    " aggregation anywhere.",
)
def q71(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    base = docs.select("doc_id", norm_text().alias("n"))
    grams = base.select(
        "doc_id", F.explode(F.expr(_TRIGRAMS_SPARK)).alias("g")
    )
    model = (
        grams.groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "g")
        .limit(TRIGRAM_V)
        .select("g", F.lit(1).alias("known"))
    )
    scored = grams.join(F.broadcast(model), "g", "left")
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.when(F.col("known").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("novel_grams"),
    )
    return agg.select(
        "doc_id",
        "n_grams",
        "novel_grams",
        F.floor(1000.0 * F.col("novel_grams") / F.col("n_grams"))
        .cast("long")
        .alias("novelty_permille"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Training-window chunking: fixed token windows with overlap (stride <
# window), the step that turns variable-length documents into model-ready
# sequences BEFORE packing (q51 packs whole docs; q73 splits long ones).
# Entirely row-local — token array, start offsets, slices, and chunk
# hashes are all computed per document with zero shuffle, so the
# operator pipelines into the scan at any corpus size. The chunk md5
# makes the output self-verifying: the oracle reproduces the exact
# chunk contents, not just counts.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 128
CHUNK_STRIDE = 96  # 32-token overlap between consecutive windows


@register(
    "q73_doc_chunking",
    f"WITH n AS (SELECT doc_id, trim({NORM_SQL_DUCK}) AS nn FROM documents),"
    " t AS (SELECT doc_id, string_split(nn, ' ') AS toks FROM n),"
    " s AS (SELECT doc_id, toks, unnest(range(0,"
    f" greatest(len(toks), 1), {CHUNK_STRIDE})) AS start_tok FROM t),"
    " c AS (SELECT doc_id, start_tok,"
    f" list_slice(toks, start_tok + 1, start_tok + {CHUNK_TOKENS}) AS ch"
    " FROM s)"
    f" SELECT doc_id, CAST(start_tok / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,"
    " CAST(start_tok AS BIGINT) AS start_tok,"
    " CAST(len(ch) AS BIGINT) AS n_tok,"
    " md5(array_to_string(ch, ' ')) AS chunk_md5"
    " FROM c ORDER BY doc_id, chunk_idx",
    doc="Overlapping token-window chunking (128-token windows, 96-token"
    " stride): every document split into model-ready sequences, each"
    " chunk content-hashed. Pure row-local array arithmetic, zero"
    " shuffle; the md5 proves both engines produced identical chunk"
    " text, not merely identical counts.",
)
def q73(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.split(F.trim(norm_text()), " ").alias("toks")
    )
    starts = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(
                "sequence(0, greatest(size(toks) - 1, 0),"
                f" {CHUNK_STRIDE})"
            )
        ).alias("start_tok"),
    )
    ch = starts.select(
        "doc_id",
        "start_tok",
        F.expr(f"slice(toks, start_tok + 1, {CHUNK_TOKENS})").alias("ch"),
    )
    return ch.select(
        "doc_id",
        (F.col("start_tok") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long"),
        F.size("ch").cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", "ch")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Deterministic per-group inspection sampling: the k lowest
# md5('sample:' || doc_id) documents per source — a reprocessing-stable
# "random" sample for eyeballing each slice of the corpus. The naive
# spelling is one window over each source partition, which at 100 TB
# means one task sorting an entire source's documents. The registered
# plan is the scale-correct TWO-PHASE top-k: rank within (source,
# salt-bucket) first — 64 small partitions per source — then rank the
# tiny per-bucket survivor set (<= 64k rows per source) for the final
# answer. The global top-k per source is always contained in the union
# of per-bucket top-ks, so the result equals the naive spelling, which
# is exactly what the oracle runs.
# ---------------------------------------------------------------------------

SAMPLE_K = 2
SAMPLE_SALTS = 64


@register(
    "q75_group_sample",
    "WITH h AS (SELECT source, doc_id, lang,"
    " md5('sample:' || CAST(doc_id AS VARCHAR)) AS hk FROM documents),"
    " r AS (SELECT source, doc_id, lang,"
    " row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)"
    " AS sample_rank FROM h)"
    f" SELECT source, doc_id, lang, CAST(sample_rank AS BIGINT)"
    f" AS sample_rank FROM r WHERE sample_rank <= {SAMPLE_K}"
    " ORDER BY source, sample_rank",
    doc="Deterministic per-source inspection sample (k lowest salted-md5"
    " doc ids). Two-phase top-k: per-(source, salt-bucket) ranking"
    " prunes to a bounded candidate set before the final per-source"
    " rank, so no task ever sorts a whole source; the oracle runs the"
    " single-window naive spelling the two-phase plan provably equals.",
)
def q75(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
        .alias("hk"),
        F.pmod(F.xxhash64("doc_id"), F.lit(SAMPLE_SALTS)).alias("s"),
    )
    w1 = Window.partitionBy("source", "s").orderBy("hk", "doc_id")
    cand = docs.withColumn("r1", F.row_number().over(w1)).where(
        F.col("r1") <= SAMPLE_K
    )
    w2 = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        cand.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= SAMPLE_K)
        .select(
            "source",
            "doc_id",
            "lang",
            F.col("sample_rank").cast("long").alias("sample_rank"),
        )
        .orderBy("source", "sample_rank")
    )


# ---------------------------------------------------------------------------
# Stratified split audit: does the deterministic hash split stay balanced
# WITHIN every (language, length-quartile) stratum, or did it
# accidentally starve val/test of long documents somewhere? Composes the
# exact-quantile machinery (q65's cumulative histogram — windows over
# histogram rows, never documents) with the q50 split policy: per-lang
# quartile boundaries are a languages-sized table broadcast back onto
# the corpus, the quartile CASE and split hash are row-local, and the
# only corpus-sized shuffle is the final (lang, quartile, split)
# partial-aggregated rollup.
# ---------------------------------------------------------------------------


@register(
    "q76_stratified_split_audit",
    "WITH h AS (SELECT lang, n_chars, count(*) AS c FROM documents"
    " WHERE n_chars IS NOT NULL GROUP BY lang, n_chars),"
    " cum AS (SELECT lang, n_chars, c,"
    " sum(c) OVER (PARTITION BY lang ORDER BY n_chars"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc,"
    " sum(c) OVER (PARTITION BY lang) AS tot FROM h),"
    " b AS (SELECT lang,"
    " min(CASE WHEN rc * 4 >= tot THEN n_chars END) AS p25,"
    " min(CASE WHEN rc * 2 >= tot THEN n_chars END) AS p50,"
    " min(CASE WHEN rc * 4 >= tot * 3 THEN n_chars END) AS p75"
    " FROM cum GROUP BY lang),"
    " s AS (SELECT d.lang,"
    " CASE WHEN d.n_chars <= b.p25 THEN 1 WHEN d.n_chars <= b.p50 THEN 2"
    " WHEN d.n_chars <= b.p75 THEN 3 ELSE 4 END AS quartile,"
    f" {SPLIT_CASE_DUCK} AS split"
    " FROM documents d JOIN b ON d.lang = b.lang"
    " WHERE d.n_chars IS NOT NULL)"
    " SELECT lang, CAST(quartile AS BIGINT) AS quartile, split,"
    " count(*) AS n_docs FROM s GROUP BY lang, quartile, split"
    " ORDER BY lang, quartile, split",
    doc="Split-balance audit per (language, exact length quartile)"
    " stratum: exact cumulative-histogram boundaries (no"
    " approx_percentile sketches), broadcast back onto the corpus,"
    " crossed with the deterministic q50 hash split. Catches strata"
    " where the 90/5/5 policy under-serves val/test; windows run over"
    " histogram rows, so the quantile pass is corpus-scale-free.",
)
def q76(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    )
    h = docs.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.select(
        "lang",
        "n_chars",
        F.sum("c").over(w).alias("rc"),
        F.sum("c").over(Window.partitionBy("lang")).alias("tot"),
    )
    rc, tot, nc = F.col("rc"), F.col("tot"), F.col("n_chars")
    bounds = cum.groupBy("lang").agg(
        F.min(F.when(rc * 4 >= tot, nc)).alias("p25"),
        F.min(F.when(rc * 2 >= tot, nc)).alias("p50"),
        F.min(F.when(rc * 4 >= tot * 3, nc)).alias("p75"),
    )
    quartile = (
        F.when(F.col("n_chars") <= F.col("p25"), 1)
        .when(F.col("n_chars") <= F.col("p50"), 2)
        .when(F.col("n_chars") <= F.col("p75"), 3)
        .otherwise(4)
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .select(
            "lang",
            quartile.cast("long").alias("quartile"),
            split_col().alias("split"),
        )
        .groupBy("lang", "quartile", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "quartile", "split")
    )


# ---------------------------------------------------------------------------
# Round-6 additions: the sampling / scoring / tokenizer-training operators
# that sit between curation (dedup, quality) and the trainer. Same
# determinism discipline as everything above: integer arithmetic for every
# cross-row aggregate; sqrt is the one float primitive used (IEEE-754
# requires sqrt to be correctly rounded, so — unlike ln/exp, whose last
# ulp varies across libm builds — floor(sqrt(n)*1e6) is bit-identical on
# both engines).
# ---------------------------------------------------------------------------


@register(
    "q84_mixture_weights",
    "WITH s AS (SELECT lang, count(*) AS n_docs,"
    " CAST(sum(" + TOKENS_SQL_DUCK + ") AS BIGINT) AS total_tokens"
    " FROM documents GROUP BY lang),"
    " w AS (SELECT *, CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT)"
    " AS w_e6 FROM s)"
    " SELECT lang, n_docs, total_tokens,"
    " CAST(n_docs * 1000000 // CAST(sum(n_docs) OVER () AS BIGINT)"
    " AS BIGINT) AS prop_ppm,"
    " CAST(w_e6 * 1000000 // CAST(sum(w_e6) OVER () AS BIGINT)"
    " AS BIGINT) AS temp_ppm,"
    " CAST(w_e6 * 1000000 // CAST(sum(w_e6) OVER () AS BIGINT) // 10"
    " AS BIGINT) AS alloc_100k"
    " FROM w ORDER BY lang",
    doc="Temperature-based sampling weights per language domain"
    " (alpha = 0.5, the multilingual-LM standard): proportional vs"
    " temperature-flattened mixture shares in exact ppm, plus the doc"
    " allocation for a 100k-example epoch. The corpus-wide pass is one"
    " partial-aggregable groupBy; the share normalization is a window"
    " over the HANDFUL of domain rows (never the corpus), and all"
    " shares are integer ppm so engines agree bit-for-bit.",
)
def q84(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count()).alias("total_tokens"),
    )
    w = s.withColumn(
        "w_e6", F.floor(F.sqrt(F.col("n_docs")) * 1000000.0).cast("long")
    )
    tot = Window.partitionBy()  # 5 domain rows, not the corpus
    nd, we = F.col("n_docs"), F.col("w_e6")
    return (
        w.select(
            "lang",
            "n_docs",
            "total_tokens",
            F.expr("n_docs * 1000000").alias("nd6"),
            F.expr("w_e6 * 1000000").alias("we6"),
            F.sum(nd).over(tot).alias("tn"),
            F.sum(we).over(tot).alias("tw"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.expr("nd6 DIV tn").alias("prop_ppm"),
            F.expr("we6 DIV tw").alias("temp_ppm"),
            F.expr("we6 DIV tw DIV 10").alias("alloc_100k"),
        )
        .orderBy("lang")
    )


# Tokenized view of the corpus shared by q85/q87/q91 (the q48 spelling).
_TOK_CTE_DUCK = (
    "tok AS (SELECT doc_id, unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS token FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != '')"
)


def _tokens(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    return (
        docs.select("doc_id", n.alias("n"))
        .where(F.col("n") != "")
        .select("doc_id", F.explode(F.split(F.col("n"), " ")).alias("token"))
    )


@register(
    "q85_oov_rate",
    "WITH " + _TOK_CTE_DUCK + ","
    " v AS (SELECT token FROM (SELECT token, count(*) AS tf FROM tok"
    f" GROUP BY token ORDER BY tf DESC, token LIMIT {VOCAB_TOP_K})),"
    " pd AS (SELECT t.doc_id, count(*) AS n_tokens,"
    " CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_oov FROM tok t LEFT JOIN v ON t.token = v.token"
    " GROUP BY t.doc_id)"
    " SELECT d.doc_id, CAST(coalesce(pd.n_tokens, 0) AS BIGINT)"
    " AS n_tokens, CAST(coalesce(pd.n_oov, 0) AS BIGINT) AS n_oov,"
    " CAST(CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0"
    " ELSE 1000 * pd.n_oov // pd.n_tokens END AS BIGINT) AS oov_permille"
    " FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id"
    " ORDER BY d.doc_id",
    doc="Per-document out-of-vocabulary rate against the corpus top-100"
    " vocabulary (the q48 tokenization) — the cheap proxy for 'will the"
    " tokenizer shred this document into bytes'. The vocabulary is a"
    " bounded top-k, BROADCAST to the token stream (the explode is"
    " row-local; the only corpus-keyed shuffle is the per-doc rollup),"
    " and the rate is integer permille.",
)
def q85(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(VOCAB_TOP_K)
        .select("token", F.lit(1).alias("in_v"))
    )
    pd_ = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    docs = table(spark, sf_dir, "documents").select("doc_id")
    nt, no = F.col("pd.n_tokens"), F.col("pd.n_oov")
    return (
        docs.join(pd_.alias("pd"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(nt, F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(no, F.lit(0)).cast("long").alias("n_oov"),
            F.when(F.coalesce(nt, F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("1000 * pd.n_oov DIV pd.n_tokens"))
            .cast("long")
            .alias("oov_permille"),
        )
        .orderBy("doc_id")
    )


@register(
    "q87_rarity_score",
    "WITH " + _TOK_CTE_DUCK + ","
    " df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok"
    " GROUP BY token),"
    " sc AS (SELECT t.doc_id,"
    " CAST(10000 * (SELECT count(*) FROM documents) // d.df AS BIGINT)"
    " AS idf_e4 FROM tok t JOIN df d ON t.token = d.token)"
    " SELECT doc_id, count(*) AS n_tokens,"
    " CAST(sum(idf_e4) AS BIGINT) AS rarity_sum_e4,"
    " CAST(CAST(sum(idf_e4) AS BIGINT) // count(*) AS BIGINT)"
    " AS rarity_mean_e4"
    " FROM sc GROUP BY doc_id ORDER BY doc_id",
    doc="Per-document rarity score: mean inverse document frequency"
    " (N*1e4 DIV df) over the document's token instances — the"
    " integer-exact stand-in for unigram-LM surprisal (whose float ln"
    " is NOT reproducible across libm builds; same rationale as q52's"
    " idf). High scores mark jargon-dense / low-redundancy documents,"
    " low scores boilerplate. df is a partial-aggregated groupBy; the"
    " token->df join is vocabulary-sized (AQE broadcasts it); the"
    " per-doc rollup is the only corpus-keyed shuffle.",
)
def q87(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    n_docs = table(spark, sf_dir, "documents").count()  # q52 pattern
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    sc = toks.join(df_, "token").withColumn(
        "idf_e4", F.expr(f"10000 * {n_docs}L DIV df")
    )
    return (
        sc.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("idf_e4").alias("rarity_sum_e4"),
        )
        .withColumn(
            "rarity_mean_e4", F.expr("rarity_sum_e4 DIV n_tokens")
        )
        .orderBy("doc_id")
    )


# q25's alpha-ratio quality signal, shared with the curriculum stager.
_SCORE_SQL_DUCK = (
    "CAST(floor(100.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    " / greatest(length(text), 1)) AS BIGINT)"
)

N_STAGES = 4


def stage_expr_sql(engine: str, n_expr: str, rank_col: str = "rn") -> str:
    """The curriculum stage formula, one spelling per engine (the
    property suite evaluates the duck spelling against a reference
    implementation, so the REAL expression is what gets tested)."""
    op = "DIV" if engine == "spark" else "//"
    return f"1 + (({rank_col} - 1) * {N_STAGES}) {op} ({n_expr})"


@register(
    "q89_curriculum_stages",
    "WITH sc AS (SELECT doc_id, " + _SCORE_SQL_DUCK + " AS score,"
    " " + TOKENS_SQL_DUCK + " AS n_toks FROM documents),"
    " r AS (SELECT *, row_number() OVER (ORDER BY score, doc_id) AS rn"
    " FROM sc)"
    " SELECT CAST("
    + stage_expr_sql("duck", "SELECT count(*) FROM documents")
    + " AS BIGINT) AS stage, count(*) AS n_docs,"
    " min(score) AS min_score, max(score) AS max_score,"
    " CAST(sum(n_toks) AS BIGINT) AS total_tokens"
    " FROM r GROUP BY stage ORDER BY stage",
    doc="Curriculum-learning stage assignment: documents ranked by the"
    " q25 alpha-ratio quality score and cut into 4 equal stages"
    " (stage = 1 + (rank-1)*4 DIV N, ties broken by doc_id). The rank"
    " is computed SCALE-FREE — a histogram over the <=101 distinct"
    " integer scores gives each score's global offset, and row_number"
    " only ever runs per-score-partition — so no corpus-wide single-"
    " partition window exists in the plan (the oracle uses the naive"
    " global window; same total order by construction).",
)
def q89(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n_all = docs.count()  # bounded scalar, q52 pattern
    nlen = F.greatest(F.length("text"), F.lit(1))
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    sc = docs.select(
        "doc_id",
        F.floor(100.0 * alpha / nlen).alias("score"),
        token_count().alias("n_toks"),
    )
    hist = sc.groupBy("score").agg(F.count("*").alias("c"))
    wb = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )  # window over the tiny score histogram, never the corpus
    offs = hist.select(
        "score", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("cb")
    )
    rn = F.row_number().over(
        Window.partitionBy("score").orderBy("doc_id")
    )
    ranked = sc.join(F.broadcast(offs), "score").withColumn(
        "rn", F.col("cb") + rn
    )
    return (
        ranked.withColumn(
            "stage", F.expr(stage_expr_sql("spark", f"{n_all}L"))
        )
        .groupBy("stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.sum("n_toks").alias("total_tokens"),
        )
        .orderBy("stage")
    )


# Power-of-two sequence-length buckets, one CASE spelling generated for
# both engines so the boundaries cannot drift apart.
_P2_BUCKETS = [2**i for i in range(13)]  # 1 .. 4096


def _p2_case(col_sql: str) -> str:
    whens = " ".join(
        f"WHEN {col_sql} <= {b} THEN {b}" for b in _P2_BUCKETS
    )
    return (
        f"CASE WHEN {col_sql} <= 0 THEN 0 {whens}"
        f" ELSE {2 * _P2_BUCKETS[-1]} END"
    )


@register(
    "q90_seqlen_histogram",
    "WITH sc AS (SELECT CAST(" + _p2_case(TOKENS_SQL_DUCK) + " AS BIGINT)"
    " AS bucket, " + TOKENS_SQL_DUCK + " AS n_toks FROM documents),"
    " h AS (SELECT bucket, count(*) AS n_docs,"
    " CAST(sum(n_toks) AS BIGINT) AS total_tokens FROM sc"
    " GROUP BY bucket)"
    " SELECT bucket, n_docs, total_tokens,"
    " CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,"
    " CAST(CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) * 1000000"
    " // (SELECT count(*) FROM documents) AS BIGINT) AS cum_ppm"
    " FROM h ORDER BY bucket",
    doc="Token-length histogram in power-of-two buckets with cumulative"
    " document share (ppm) — the pre-packing diagnostic that picks"
    " max_seq_len: read off the bucket where cum_ppm crosses the"
    " tolerable-truncation threshold. Bucketing is a row-local CASE"
    " generated from ONE Python list for both engines; the cumulative"
    " window runs over the ~13 bucket rows, never the corpus.",
)
def q90(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n_all = docs.count()
    sc = docs.select(token_count().alias("n_toks")).select(
        F.expr(_p2_case("n_toks")).cast("long").alias("bucket"),
        "n_toks",
    )
    h = sc.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )  # ~13 bucket rows
    return (
        h.select(
            "bucket",
            "n_docs",
            "total_tokens",
            F.sum("n_docs").over(wc).alias("cum_docs"),
        )
        .withColumn("cum_ppm", F.expr(f"cum_docs * 1000000 DIV {n_all}L"))
        .orderBy("bucket")
    )


@register(
    "q91_bpe_merge_candidates",
    "WITH tk AS (SELECT doc_id,"
    f" regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}') AS t"
    " FROM documents),"
    " pr AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS pair"
    " FROM tk, unnest(range(1, len(t))) AS u(i))"
    " SELECT pair, count(*) AS tf, count(DISTINCT doc_id) AS df"
    " FROM pr GROUP BY pair ORDER BY tf DESC, pair LIMIT 20",
    doc="The first BPE merge-rule pass of tokenizer training: frequency"
    " of every ADJACENT pre-token pair (q38's GPT-2-style pre-"
    " tokenization), top-20 by corpus frequency — rank 1 is the first"
    " merge a BPE trainer would mint. Pair construction is a row-local"
    " zip of the token array with its own tail (no self-join, no"
    " shuffle of text); counting is a partial-aggregated groupBy on"
    " the pair string and the top-k is TakeOrdered.",
)
def q91(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    t = F.regexp_extract_all(norm_text(), F.lit(_BPE_PATTERN), 0)
    tl = F.col("t")
    m = F.greatest(F.size(tl) - 1, F.lit(0))
    pairs = F.when(
        F.size(tl) >= 2,
        F.zip_with(
            F.slice(tl, 1, m),
            F.slice(tl, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", t.alias("t"))
        .select("doc_id", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "pair")
        .limit(20)
    )


N_SHARDS = 32

# Same md5-bucket family as the q50 split, 32-wide: the output-sharding
# decision for writing a curated corpus as N self-contained shards.
_SHARD_SPARK = hash_bucket_sql("spark", "doc_id", N_SHARDS)
_SHARD_DUCK = hash_bucket_sql("duck", "doc_id", N_SHARDS)


@register(
    "q92_shard_balance",
    f"WITH s AS (SELECT CAST({_SHARD_DUCK} AS BIGINT) AS shard, n_chars"
    " FROM documents),"
    " h AS (SELECT shard, count(*) AS n_docs,"
    " CAST(sum(n_chars) AS BIGINT) AS total_chars FROM s GROUP BY shard)"
    " SELECT shard, n_docs, total_chars,"
    " CAST(total_chars * 1000000 // (CAST(sum(total_chars) OVER ()"
    " AS BIGINT)) AS BIGINT) AS bytes_ppm"
    " FROM h ORDER BY shard",
    doc="Output-shard layout audit: every document hash-assigned to one"
    f" of {N_SHARDS} shards (md5(doc_id) buckets — reprocessing-stable,"
    " joinable without a join, same family as the q50 split), with per-"
    " shard byte share in exact ppm. The number a 100 TB export job"
    " reads before writing: skewed ppm = skewed output files = stragglers"
    " in every downstream consumer. One partial-agg pass; the"
    " normalization window runs over the 32 shard rows.",
)
def q92(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    h = (
        docs.select(F.expr(_SHARD_SPARK).cast("long").alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return (
        h.withColumn(
            "tot", F.sum("total_chars").over(Window.partitionBy())
        )
        .select(
            "shard",
            "n_docs",
            "total_chars",
            F.expr("total_chars * 1000000 DIV tot").alias("bytes_ppm"),
        )
        .orderBy("shard")
    )


PREFIX_TOKENS = 8


@register(
    "q96_template_prefix_detection",
    "WITH p AS (SELECT source, array_to_string(list_slice("
    f"string_split(trim({NORM_SQL_DUCK}), ' '), 1, {PREFIX_TOKENS}), ' ')"
    " AS prefix FROM documents),"
    " c AS (SELECT source, prefix, count(*) AS n_docs FROM p"
    " GROUP BY source, prefix),"
    " t AS (SELECT source, count(*) AS src_docs FROM documents"
    " GROUP BY source),"
    " r AS (SELECT c.source, c.prefix, c.n_docs, t.src_docs,"
    " row_number() OVER (PARTITION BY c.source"
    " ORDER BY c.n_docs DESC, c.prefix) AS rn"
    " FROM c JOIN t ON c.source = t.source)"
    " SELECT source, prefix, n_docs,"
    " CAST(n_docs * 1000000 // src_docs AS BIGINT) AS share_ppm"
    " FROM r WHERE rn = 1 ORDER BY source",
    doc="Boilerplate/template detection: the most common 8-token"
    " normalized document PREFIX per source, with its share of the"
    " source in ppm — scraped corpora carry nav-bars and licence"
    " headers as high-share prefixes, and this is the audit that finds"
    " them before a stripping pass. Prefix extraction is row-local;"
    " counts partial-aggregate on (source, prefix); the top-1 window"
    " partitions by source over that source's DISTINCT prefixes (never"
    " the corpus rows).",
)
def q96(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(F.split(F.trim(norm_text()), " "), 1, PREFIX_TOKENS), " "
    )
    c = (
        docs.select("source", prefix.alias("prefix"))
        .groupBy("source", "prefix")
        .agg(F.count("*").alias("n_docs"))
    )
    t = docs.groupBy("source").agg(F.count("*").alias("src_docs"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), "prefix"
    )
    return (
        c.join(F.broadcast(t), "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "source",
            "prefix",
            "n_docs",
            F.expr("n_docs * 1000000 DIV src_docs").alias("share_ppm"),
        )
        .orderBy("source")
    )


COOC_VOCAB = 50
COOC_TOP = 20


@register(
    "q97_token_cooccurrence",
    "WITH " + _TOK_CTE_DUCK + ","
    " v AS (SELECT token FROM (SELECT token, count(*) AS tf FROM tok"
    f" GROUP BY token ORDER BY tf DESC, token LIMIT {COOC_VOCAB})),"
    " d AS (SELECT DISTINCT t.doc_id, t.token FROM tok t"
    " JOIN v ON t.token = v.token),"
    " df AS (SELECT token, count(*) AS df FROM d GROUP BY token),"
    " ab AS (SELECT a.token AS t1, b.token AS t2, count(*) AS n_ab"
    " FROM d a JOIN d b ON a.doc_id = b.doc_id AND a.token < b.token"
    " GROUP BY t1, t2)"
    " SELECT t1, t2, n_ab,"
    " CAST(fa.df AS BIGINT) AS n_a, CAST(fb.df AS BIGINT) AS n_b,"
    " CAST(n_ab * (SELECT count(*) FROM documents) * 10000"
    " // (fa.df * fb.df) AS BIGINT) AS pmi_e4"
    " FROM ab JOIN df fa ON ab.t1 = fa.token"
    " JOIN df fb ON ab.t2 = fb.token"
    f" ORDER BY n_ab DESC, t1, t2 LIMIT {COOC_TOP}",
    doc="Token association mining over the top-50 vocabulary: document-"
    " level co-occurrence counts with an integer-exact PMI surrogate"
    " (n_ab·N·1e4 DIV (n_a·n_b) — the pointwise mutual information"
    " ratio without the float log whose last ulp drifts across libm"
    " builds). The pair space is BOUNDED by construction: documents"
    " are first thinned to their distinct top-vocab tokens (<=50 rows"
    " per doc), the pair join is keyed by doc_id with that hard cap,"
    " so at 100 TB cost is docs x vocab^2/2, never tokens^2.",
)
def q97(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    n_all = table(spark, sf_dir, "documents").count()
    vocab = (
        toks.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(COOC_VOCAB)
        .select("token")
    )
    d = (
        toks.join(F.broadcast(vocab), "token", "semi")
        .select("doc_id", "token")
        .distinct()
    )
    a = d.select("doc_id", F.col("token").alias("t1"))
    b = d.select("doc_id", F.col("token").alias("t2"))
    ab = (
        a.join(b, "doc_id")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_ab"))
    )
    df_ = d.groupBy("token").agg(F.count("*").alias("df"))
    fa = df_.select(F.col("token").alias("t1"), F.col("df").alias("n_a"))
    fb = df_.select(F.col("token").alias("t2"), F.col("df").alias("n_b"))
    return (
        ab.join(F.broadcast(fa), "t1")
        .join(F.broadcast(fb), "t2")
        .select(
            "t1",
            "t2",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(f"n_ab * {n_all}L * 10000 DIV (n_a * n_b)").alias(
                "pmi_e4"
            ),
        )
        .orderBy(F.col("n_ab").desc(), "t1", "t2")
        .limit(COOC_TOP)
    )


# Static stopword policy list (the union of the q24 language-marker
# words): a per-language-family function-word inventory. Static by
# design — a data-derived list would make the filter drift under
# reprocessing.
STOPWORDS = (
    "the", "and", "of", "a",
    "der", "und", "nicht",
    "le", "les", "est",
    "el", "que", "los",
)
_STOP_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "q99_stopword_ratio",
    "WITH t AS (SELECT doc_id, lang, CASE WHEN trim(" + NORM_SQL_DUCK
    + ") = '' THEN [] ELSE string_split(trim(" + NORM_SQL_DUCK
    + "), ' ') END AS toks FROM documents)"
    " SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,"
    f" CAST(len(list_filter(toks, x -> x IN {_STOP_IN})) AS BIGINT)"
    " AS n_stop,"
    " CAST(CASE WHEN len(toks) = 0 THEN 0 ELSE"
    f" 1000 * len(list_filter(toks, x -> x IN {_STOP_IN})) // len(toks)"
    " END AS BIGINT) AS stop_permille"
    " FROM t ORDER BY doc_id",
    doc="Stopword-ratio quality signal (the C4/Gopher 'has function"
    " words' filter): per-document share of tokens drawn from a STATIC"
    " multilingual function-word list — natural prose carries a"
    " nonzero floor of them, while keyword stuffing, tables, and code"
    " sit near zero. Static list = reprocessing-stable policy. Pure"
    " row-local array arithmetic, zero shuffle.",
)
def q99(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n = F.trim(norm_text())
    toks = F.when(
        n == "", F.array().cast("array<string>")
    ).otherwise(F.split(n, " "))
    t = docs.select("doc_id", "lang", toks.alias("toks"))
    n_stop = F.size(F.expr(f"filter(toks, x -> x IN {_STOP_IN})"))
    nt = F.size("toks")
    return t.select(
        "doc_id",
        "lang",
        nt.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stop"),
        F.when(nt == 0, F.lit(0))
        .otherwise(F.expr(f"1000 * size(filter(toks, x -> x IN {_STOP_IN}))"
                          " DIV size(toks)"))
        .cast("long")
        .alias("stop_permille"),
    ).orderBy("doc_id")


# Gopher-style quality rule thresholds (Rae et al. 2021 §A1.1, adapted
# to the fixture's ranges: the published bounds are 50..100k tokens,
# mean word length 3..10, >=80% alpha words).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MWL_E2 = 300
GOPHER_MAX_MWL_E2 = 1000
GOPHER_MIN_ALPHA_PCT = 70


@register(
    "q100_gopher_rules",
    "SELECT doc_id, " + TOKENS_SQL_DUCK + " AS n_tokens,"
    " CAST(CASE WHEN " + TOKENS_SQL_DUCK + " = 0 THEN 0 ELSE"
    " 100 * length(replace(trim(" + NORM_SQL_DUCK + "), ' ', ''))"
    " // " + TOKENS_SQL_DUCK + " END AS BIGINT) AS mean_wordlen_e2,"
    " CAST(floor(100.0 * length(regexp_replace(text, '[^A-Za-z]', '',"
    " 'g')) / greatest(length(text), 1)) AS BIGINT) AS alpha_pct,"
    " (" + TOKENS_SQL_DUCK + f" BETWEEN {GOPHER_MIN_TOKENS} AND"
    f" {GOPHER_MAX_TOKENS}"
    " AND CAST(CASE WHEN " + TOKENS_SQL_DUCK + " = 0 THEN 0 ELSE"
    " 100 * length(replace(trim(" + NORM_SQL_DUCK + "), ' ', ''))"
    " // " + TOKENS_SQL_DUCK + " END AS BIGINT)"
    f" BETWEEN {GOPHER_MIN_MWL_E2} AND {GOPHER_MAX_MWL_E2}"
    " AND CAST(floor(100.0 * length(regexp_replace(text, '[^A-Za-z]',"
    " '', 'g')) / greatest(length(text), 1)) AS BIGINT)"
    f" >= {GOPHER_MIN_ALPHA_PCT}) AS passes"
    " FROM documents ORDER BY doc_id",
    doc="The Gopher quality-rule battery (token-count bounds, mean word"
    " length 3-10, alphabetic ratio) with a combined pass flag — the"
    " standard pre-model heuristic gate, integer-exact: mean word"
    " length is 100·chars DIV tokens over the normalized text (the"
    " collapsed-whitespace char count IS the summed token length)."
    " Pure row-local projection, zero shuffle, pipelines into the"
    " curation chain at any scale.",
)
def q100(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    nt = token_count()
    base = docs.select(
        "doc_id",
        "text",
        nt.cast("long").alias("n_tokens"),
        F.length(F.regexp_replace(F.trim(norm_text()), " ", ""))
        .cast("long")
        .alias("sum_len"),
    )
    mwl = F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
        F.expr("100 * sum_len DIV n_tokens")
    )
    alpha = F.floor(
        100.0
        * F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
        / F.greatest(F.length("text"), F.lit(1))
    )
    scored = base.select(
        "doc_id",
        "n_tokens",
        mwl.cast("long").alias("mean_wordlen_e2"),
        alpha.cast("long").alias("alpha_pct"),
    )
    passes = (
        F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
        & F.col("mean_wordlen_e2").between(
            GOPHER_MIN_MWL_E2, GOPHER_MAX_MWL_E2
        )
        & (F.col("alpha_pct") >= GOPHER_MIN_ALPHA_PCT)
    )
    return scored.withColumn("passes", passes).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII detection audit. Patterns deliberately stay inside the
# RE2-AND-Java-compatible subset (character classes, bounded repeats,
# alternation — no lookaround, no backreferences) so Spark (Java regex)
# and DuckDB (RE2) count the same matches; tests/test_round8_ops.py
# drives both engines over a synthetic corpus with real hits (plus
# pinned hand-checked counts), since the fixture corpus is digit-free
# and audits clean (itself the meaningful answer: a training corpus
# SHOULD audit clean before release).
# ---------------------------------------------------------------------------

PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}",
    "n_ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(df, text_col: str = "text"):
    """Append per-class PII match counts + a has_pii flag to a corpus
    frame. Pure row-local regexp counting (whole-stage codegen, zero
    shuffle) — the pattern set is the policy artifact; swap in the
    production list without touching the plumbing."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            name,
            F.size(
                F.regexp_extract_all(t, F.lit(pat), F.lit(0))
            ).cast("long"),
        )
    total = sum(F.col(n) for n in PII_PATTERNS)
    return out.withColumn(
        "pii_total", total.cast("long")
    ).withColumn("has_pii", total > 0)


def _pii_duck() -> str:
    cols = ", ".join(
        f"CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}'))"
        f" AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(PII_PATTERNS)
    return (
        f"SELECT doc_id, {cols} FROM documents"
    ), total


@register(
    "q116_pii_audit",
    "WITH p AS (" + _pii_duck()[0] + ")"
    f" SELECT doc_id, n_emails, n_phones, n_ipv4,"
    f" CAST({_pii_duck()[1]} AS BIGINT) AS pii_total,"
    f" ({_pii_duck()[1]}) > 0 AS has_pii"
    " FROM p ORDER BY doc_id",
    doc="PII detection audit: per-document counts of email / phone /"
    " IPv4 pattern matches plus the release-gating has_pii flag — the"
    " scrubbing pass every training corpus runs before release (here"
    " it proves the fixture corpus is clean, zero hits everywhere,"
    " which is the answer the audit exists to certify). Patterns are"
    " confined to the RE2-and-Java common regex subset so both engines"
    " count identically; pure row-local projection, zero shuffle, the"
    " pattern list is a swappable policy artifact.",
)
def q116(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        pii_counts(docs)
        .select(
            "doc_id",
            "n_emails",
            "n_phones",
            "n_ipv4",
            "pii_total",
            "has_pii",
        )
        .orderBy("doc_id")
    )


# PII redaction — the excision pass completing q116's counting audit
# (the q53/q80 redaction pattern). Classes are applied in a FIXED
# sequence (email -> phone -> IPv4) on both engines, each stage counting
# on its own input text, so a span matched by two classes (an IPv4
# inside an email's local part) is attributed to exactly one class
# identically everywhere. The sentinel contains no digit/@/dot, so a
# replacement can never complete a new match; `residual` re-audits the
# final text against every class and is the oracle-checked proof of
# zero remaining hits (q80's re-audit property, also pinned in
# tests/test_round8_ops.py on a corpus with real PII).

PII_SENTINEL = "<PII>"
_PII_ORDER = ["n_emails", "n_phones", "n_ipv4"]


def pii_redact(df, text_col: str = "text"):
    """Append per-class removal counts, the redacted text, its md5, and
    the residual re-audit count. Pure row-local projection — zero
    shuffle; the staged texts are pre-projected columns so each regex
    runs once per row (HOF re-evaluation rule does not apply: these are
    plain projections, not lambda-bound expressions)."""
    out = df.withColumn("_t0", F.coalesce(F.col(text_col), F.lit("")))
    cur = "_t0"
    for i, name in enumerate(_PII_ORDER):
        pat = PII_PATTERNS[name]
        nxt = f"_t{i + 1}"
        out = out.withColumn(
            name, F.regexp_count(F.col(cur), F.lit(pat)).cast("long")
        ).withColumn(
            nxt, F.regexp_replace(F.col(cur), pat, PII_SENTINEL)
        )
        cur = nxt
    residual = sum(
        F.regexp_count(F.col(cur), F.lit(p)) for p in PII_PATTERNS.values()
    )
    return (
        out.withColumn("redacted_md5", F.md5(F.col(cur)))
        .withColumn("residual", residual.cast("long"))
        .drop("_t0", "_t1", "_t2", "_t3")
    )


def _pii_redact_duck() -> str:
    """Staged CTE chain mirroring pii_redact's sequence exactly."""
    stages = ["SELECT doc_id, coalesce(text, '') AS t0 FROM documents"]
    prev = "t0"
    ctes = [f"s0 AS ({stages[0]})"]
    for i, name in enumerate(_PII_ORDER):
        pat = PII_PATTERNS[name]
        nxt = f"t{i + 1}"
        ctes.append(
            f"s{i + 1} AS (SELECT *,"
            f" CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT)"
            f" AS {name},"
            f" regexp_replace({prev}, '{pat}', '{PII_SENTINEL}', 'g')"
            f" AS {nxt} FROM s{i})"
        )
        prev = nxt
    residual = " + ".join(
        f"len(regexp_extract_all({prev}, '{p}'))"
        for p in PII_PATTERNS.values()
    )
    return (
        ", ".join(ctes)
        + f", fin AS (SELECT *, md5({prev}) AS redacted_md5,"
        f" CAST({residual} AS BIGINT) AS residual FROM s3)"
    )


@register(
    "q118_pii_redaction",
    "WITH " + _pii_redact_duck()
    + " SELECT doc_id, n_emails, n_phones, n_ipv4, redacted_md5,"
    " residual FROM fin ORDER BY doc_id",
    doc="PII redaction (the excision pass completing q116's audit):"
    " every email/phone/IPv4 span replaced by a sentinel in a fixed"
    " class order, emitting per-class removal counts, the md5"
    " fingerprint of the scrubbed text (the verifiable release"
    " artifact), and a residual re-audit count that the oracle proves"
    " is zero — the q80 re-audit property. Row-local regex projection,"
    " zero shuffle; the staged texts are pre-projected columns so each"
    " pattern runs once per row. Sentinel chosen so no replacement can"
    " complete a new match.",
)
def q118(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        pii_redact(docs)
        .select(
            "doc_id",
            "n_emails",
            "n_phones",
            "n_ipv4",
            "redacted_md5",
            "residual",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier — the fastText/logistic-regression
# quality-filter shape applied at corpus scale: tokens feature-hash into
# a fixed bucket space, each bucket carries a learned weight, and the
# document score is the weight sum. The weight TABLE here is a
# deterministic placeholder (multiplicative-hash integers) so the
# oracle can re-derive it; a production deployment loads trained
# weights from parquet into the same broadcast join — the plan shape
# (explode -> broadcast weight join -> partial-agg sum) is the real
# one, and is exactly what survives 100 TB: the weight table is a few
# MB broadcast once, tokens never shuffle (the partial sum collapses
# each partition's (doc_id, score) before the one doc-keyed exchange).
# ---------------------------------------------------------------------------

VOCAB_BUCKETS = 4096
_W_MULT = 2654435761  # Knuth multiplicative constant
_W_MOD = 2003
_W_OFF = 1001  # centers weights on 0: range -1001..+1001


def hashed_weights(spark):
    """(bucket, w) deterministic weight table — swap for a parquet read
    of trained weights in production; consumers are unchanged."""
    return spark.range(VOCAB_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * _W_MULT) % _W_MOD - _W_OFF).alias("w"),
    )


@register(
    "q120_hashed_linear_quality",
    "WITH wt AS (SELECT i AS bucket,"
    f" (i * {_W_MULT}) % {_W_MOD} - {_W_OFF} AS w"
    f" FROM (SELECT unnest(range(0, {VOCAB_BUCKETS})) AS i) t),"
    " tok AS (SELECT doc_id, unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS t FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    " bk AS (SELECT doc_id,"
    f" CAST(('0x'||substr(md5(t),1,4)) AS INT) % {VOCAB_BUCKETS}"
    " AS bucket FROM tok),"
    " sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,"
    " CAST(sum(w) AS BIGINT) AS score"
    " FROM bk JOIN wt USING (bucket) GROUP BY doc_id)"
    " SELECT d.doc_id,"
    " CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,"
    " CAST(coalesce(sc.score, 0) AS BIGINT) AS score,"
    " coalesce(sc.score, 0) >= 0 AS keep"
    " FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id",
    doc="Hashed linear quality classifier: whitespace tokens feature-"
    f"hash (md5 -> 16 bits -> mod {VOCAB_BUCKETS}) into a bucketed"
    " weight table, the document score is the integer weight sum, keep"
    " = score >= 0 — the fastText-style learned quality gate shape."
    " Weights are a deterministic placeholder the oracle re-derives;"
    " production swaps in trained weights via the same broadcast join."
    " Integer weights make the sum order-independent; the weight table"
    " broadcasts (a few MB at any corpus size) and per-partition"
    " partial sums collapse before the single doc-keyed shuffle.",
)
def q120(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    base = docs.select("doc_id", norm_text().alias("n"))
    tok = base.where(F.trim(F.col("n")) != "").select(
        "doc_id", F.explode(F.split(F.trim(F.col("n")), " ")).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 4), 16, 10).cast("long")
        % VOCAB_BUCKETS
    )
    scored = (
        tok.select("doc_id", bucket.alias("bucket"))
        .join(F.broadcast(hashed_weights(spark)), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w").alias("score"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("score", F.lit(0)).cast("long").alias("score"),
            (F.coalesce("score", F.lit(0)) >= 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Vocabulary-growth (Heaps' law) audit. Tokenizer and dedup decisions
# both hinge on how fast the corpus keeps minting new types: a healthy
# crawl's vocabulary grows ~ n^beta (beta < 1); a flattening curve means
# the corpus went repetitive (boilerplate flood), a super-linear burst
# means an encoding/tokenization regression. The cumulative-distinct
# curve is the canonical scale trap (distinct-over-prefix is quadratic
# if done naively, and a running set is single-threaded); the scalable
# form is per-token FIRST OCCURRENCE (a min-aggregate, map-side
# combined) bucketed into doc_id blocks, then a cumsum over the tiny
# bucket table — the whole corpus is touched exactly once.
# ---------------------------------------------------------------------------

VG_BLOCK = 64  # docs per growth bucket


@register(
    "q131_vocab_growth",
    "WITH nd AS (SELECT doc_id, " + NORM_SQL_DUCK + " AS n FROM documents),"
    f" d AS (SELECT doc_id, doc_id // {VG_BLOCK} AS bucket_id,"
    " CASE WHEN trim(n) = '' THEN 0"
    " ELSE len(string_split(trim(n), ' ')) END AS n_tokens FROM nd),"
    " tok AS (SELECT doc_id, unnest(string_split(trim(n), ' ')) AS t"
    " FROM nd WHERE trim(n) != ''),"
    f" fo AS (SELECT t, min(doc_id) // {VG_BLOCK} AS bucket_id FROM tok"
    " GROUP BY t),"
    " nt AS (SELECT bucket_id, count(*) AS n_new_types FROM fo"
    " GROUP BY bucket_id),"
    " bk AS (SELECT bucket_id, count(*) AS n_docs,"
    " CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens FROM d"
    " GROUP BY bucket_id)"
    " SELECT bk.bucket_id, bk.n_docs,"
    " CAST(coalesce(nt.n_new_types, 0) AS BIGINT) AS n_new_types,"
    " CAST(sum(coalesce(nt.n_new_types, 0))"
    " OVER (ORDER BY bk.bucket_id) AS BIGINT) AS cum_types,"
    " bk.bucket_tokens,"
    " CAST(sum(bk.bucket_tokens) OVER (ORDER BY bk.bucket_id)"
    " AS BIGINT) AS cum_tokens"
    " FROM bk LEFT JOIN nt ON nt.bucket_id = bk.bucket_id"
    " ORDER BY bk.bucket_id",
    doc="Heaps'-law vocabulary-growth curve: per doc_id-block bucket,"
    " the count of never-before-seen token types, cumulative type count"
    " and cumulative token count. Scalable spelling of cumulative-"
    "distinct: each type contributes one (first-occurrence) row via a"
    " map-side-combined min-aggregate — the corpus is scanned once, no"
    " running set, no prefix re-scans; the only windows run over the"
    " ~#docs/64 bucket rows. A flattening curve flags boilerplate"
    " floods; a burst flags tokenization regressions.",
)
def q131(spark, sf_dir):
    nd = table(spark, sf_dir, "documents").select(
        "doc_id", norm_text().alias("n")
    )
    d = nd.select(
        "doc_id",
        F.expr(f"doc_id DIV {VG_BLOCK}").alias("bucket_id"),
        F.when(F.trim("n") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("n"), " ")))
        .alias("n_tokens"),
    )
    tok = nd.where(F.trim("n") != "").select(
        "doc_id", F.explode(F.split(F.trim("n"), " ")).alias("t")
    )
    nt = (
        tok.groupBy("t")
        .agg(F.expr(f"min(doc_id) DIV {VG_BLOCK}").alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(F.count("*").alias("n_new_types"))
    )
    bk = d.groupBy("bucket_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bucket_tokens"),
    )
    w = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        bk.join(nt, "bucket_id", "left")
        .select(
            "bucket_id",
            "n_docs",
            F.coalesce("n_new_types", F.lit(0)).cast("long").alias(
                "n_new_types"
            ),
            "bucket_tokens",
        )
        .withColumn(
            "cum_types", F.sum("n_new_types").over(w).cast("long")
        )
        .withColumn(
            "cum_tokens", F.sum("bucket_tokens").over(w).cast("long")
        )
        .select(
            "bucket_id",
            "n_docs",
            "n_new_types",
            "cum_types",
            "bucket_tokens",
            "cum_tokens",
        )
        .orderBy("bucket_id")
    )


# ---------------------------------------------------------------------------
# BM25 lexical retrieval. Curation pipelines rank documents lexically
# all the time (benchmark-similarity triage, "more like this" corpus
# probes, retrieval-augmented eval building), and BM25 is the standard
# scoring function. The whole computation is exact integer arithmetic:
# with k1 = 1.2 and b = 0.75, the term score
#   idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# multiplied through by 10*avgdl_e3 becomes
#   idf_e3 * 22 * tf * A  DIV  (10*tf*A + 3*A + 9000*dl)
# where A = avgdl_e3 = 1000*total_tokens DIV n_docs and
# idf_e3 = 1000*(2N - 2df + 1) DIV (2df + 1) (the Robertson-Sparck
# Jones idf with the +-0.5 smoothing cleared of fractions) — no float
# log, no cross-libm drift. Per-term scores are floored ints, so the
# per-doc sum is order-independent.
# ---------------------------------------------------------------------------

BM25_TOPK = 20
# The standing corpus-probe query: vocabulary ranks 10-12 by term
# frequency — mid-frequency terms (the head is stopwords, the tail is
# noise), derived from the corpus itself so the query always hits.
BM25_QRANK_LO, BM25_QRANK_HI = 10, 12

_BM25_BASE_DUCK = (
    "nd AS (SELECT doc_id, " + NORM_SQL_DUCK + " AS n FROM documents),"
    " ti AS (SELECT doc_id, unnest(string_split(trim(n), ' ')) AS t"
    " FROM nd WHERE trim(n) != ''),"
    " post AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf"
    " FROM ti GROUP BY doc_id, t),"
    " dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post"
    " GROUP BY doc_id),"
    " voc AS (SELECT t, CAST(sum(tf) AS BIGINT) AS tfg,"
    " CAST(count(*) AS BIGINT) AS df FROM post GROUP BY t),"
    " sc AS (SELECT CAST(count(*) AS BIGINT) AS nn,"
    " CAST(1000 * sum(dl) // count(*) AS BIGINT) AS a FROM dl)"
)

_BM25_SCORE_DUCK = (
    "ts AS (SELECT p.doc_id,"
    " CAST((1000 * (2 * sc.nn - 2 * q.df + 1) // (2 * q.df + 1))"
    " * 22 * p.tf * sc.a"
    " // (10 * p.tf * sc.a + 3 * sc.a + 9000 * d.dl) AS BIGINT) AS s_e3"
    " FROM post p JOIN qt q ON p.t = q.t"
    " JOIN dl d ON d.doc_id = p.doc_id, sc),"
    " agg AS (SELECT doc_id, CAST(sum(s_e3) AS BIGINT) AS score_e3"
    " FROM ts GROUP BY doc_id)"
)


@register(
    "q134_bm25_topk",
    "WITH " + _BM25_BASE_DUCK + ","
    " qt AS (SELECT t, df FROM (SELECT t, df,"
    " row_number() OVER (ORDER BY tfg DESC, t) AS rn FROM voc)"
    f" WHERE rn BETWEEN {BM25_QRANK_LO} AND {BM25_QRANK_HI}),"
    + _BM25_SCORE_DUCK
    + " SELECT doc_id, score_e3,"
    " CAST(row_number() OVER (ORDER BY score_e3 DESC, doc_id)"
    " AS BIGINT) AS bm25_rank FROM agg"
    f" ORDER BY score_e3 DESC, doc_id LIMIT {BM25_TOPK}",
    doc="BM25 top-20 for the standing corpus-probe query (vocabulary"
    " ranks 10-12 by term frequency — mid-frequency terms derived from"
    " the corpus so the query always hits). Exact integer BM25"
    " (k1=1.2, b=0.75 cleared of fractions; Robertson idf without the"
    " float log), so both engines rank identically. Postings are built"
    " once (eager-persisted for the three consumers: vocabulary, doc"
    " lengths, scoring); the query-term join is a 3-row broadcast; the"
    " top-k is TakeOrdered, never a global sort.",
)
def q134(spark, sf_dir):
    post = eager(_bm25_postings(spark, sf_dir))
    dl = post.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    voc = post.groupBy("t").agg(
        F.sum("tf").cast("long").alias("tfg"),
        F.count("*").cast("long").alias("df"),
    )
    w12 = Window.orderBy(F.col("tfg").desc(), "t")
    qt = (
        voc.orderBy(F.col("tfg").desc(), "t")
        .limit(BM25_QRANK_HI)
        .withColumn("rn", F.row_number().over(w12))
        .where(F.col("rn") >= BM25_QRANK_LO)
        .select("t", "df")
    )
    return _bm25_rank(spark, post, dl, qt)


def _bm25_postings(spark, sf_dir):
    """(doc_id, t, tf) term-instance counts over normalized text."""
    nd = table(spark, sf_dir, "documents").select(
        "doc_id", norm_text().alias("n")
    )
    ti = nd.where(F.trim("n") != "").select(
        "doc_id", F.explode(F.split(F.trim("n"), " ")).alias("t")
    )
    return ti.groupBy("doc_id", "t").agg(
        F.count("*").cast("long").alias("tf")
    )


def _bm25_rank(spark, post, dl, qt, exclude_id=None):
    """Top-BM25_TOPK (doc_id, score_e3, bm25_rank) for query terms `qt`
    (a tiny (t, df) DataFrame, broadcast). Corpus scalars (doc count,
    avgdl) attach driver-side per the q52/q102 bounded-scalar rule."""
    row = dl.agg(
        F.count("*").alias("nn"), F.sum("dl").alias("tt")
    ).collect()[0]
    nn, a = int(row["nn"]), 1000 * int(row["tt"]) // int(row["nn"])
    scored = post.join(F.broadcast(qt), "t").join(dl, "doc_id")
    if exclude_id is not None:
        scored = scored.where(F.col("doc_id") != exclude_id)
    term = F.expr(
        f"(1000 * (2 * {nn} - 2 * df + 1) DIV (2 * df + 1))"
        f" * 22 * tf * {a} DIV (10 * tf * {a} + 3 * {a} + 9000 * dl)"
    ).cast("long")
    agg = (
        scored.select("doc_id", term.alias("s_e3"))
        .groupBy("doc_id")
        .agg(F.sum("s_e3").cast("long").alias("score_e3"))
    )
    wr = Window.orderBy(F.col("score_e3").desc(), "doc_id")
    return (
        agg.orderBy(F.col("score_e3").desc(), "doc_id")
        .limit(BM25_TOPK)
        .withColumn("bm25_rank", F.row_number().over(wr).cast("long"))
    )


# ---------------------------------------------------------------------------
# Per-source token-distribution drift. When one feed's unigram
# distribution diverges from the corpus (encoding bug, language shift,
# spam flood), every downstream sampler inherits the skew. The drift
# statistic is total-variation distance in parts-per-million over the
# top-V corpus vocabulary — exact integer arithmetic (per-million token
# rates, absolute differences, halved), so both engines agree
# bit-for-bit, unlike a KL divergence whose float log drifts across
# libm builds. The vocabulary (V=50 tokens plus corpus totals) is a
# bounded driver-side scalar list attached as a literal array and
# exploded per source row (the q126 grid rule — never a cross join).
# ---------------------------------------------------------------------------

DRIFT_VOCAB = 50


@register(
    "q136_source_token_drift",
    "WITH nd AS (SELECT doc_id, source, " + NORM_SQL_DUCK
    + " AS n FROM documents),"
    " ti AS (SELECT source, unnest(string_split(trim(n), ' ')) AS t"
    " FROM nd WHERE trim(n) != ''),"
    " ct AS (SELECT t, CAST(count(*) AS BIGINT) AS tfg FROM ti"
    " GROUP BY t),"
    f" v AS (SELECT t, tfg FROM ct ORDER BY tfg DESC, t"
    f" LIMIT {DRIFT_VOCAB}),"
    " tot AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM ti),"
    " st AS (SELECT source, CAST(count(*) AS BIGINT) AS s_tokens"
    " FROM ti GROUP BY source),"
    " obs AS (SELECT source, t, CAST(count(*) AS BIGINT) AS o FROM ti"
    " JOIN v USING (t) GROUP BY source, t),"
    " grid AS (SELECT st.source, st.s_tokens, v.t, v.tfg,"
    " coalesce(obs.o, 0) AS o FROM st CROSS JOIN v"
    " LEFT JOIN obs ON obs.source = st.source AND obs.t = v.t),"
    " d AS (SELECT source, s_tokens, t,"
    " abs(1000000 * o // s_tokens"
    " - 1000000 * tfg // (SELECT tt FROM tot)) AS adiff FROM grid),"
    " r AS (SELECT source, s_tokens, t, adiff, row_number()"
    " OVER (PARTITION BY source ORDER BY adiff DESC, t) AS rn,"
    " sum(adiff) OVER (PARTITION BY source) AS sad FROM d)"
    " SELECT source, s_tokens,"
    " CAST(sad // 2 AS BIGINT) AS tv_ppm,"
    " t AS top_token, CAST(adiff AS BIGINT) AS top_adiff_ppm"
    " FROM r WHERE rn = 1 ORDER BY source",
    doc="Per-source unigram drift vs the corpus: total-variation"
    " distance in ppm over the top-50 corpus vocabulary, plus the"
    " single most-drifted token — the triage readout naming WHICH feed"
    " shifted and on what. Exact integer TV (per-million rates, abs"
    " diff, halved) instead of a float-log KL; the 50-token vocabulary"
    " and corpus total attach driver-side as a literal array exploded"
    " per source row (the q126 grid rule — never a cross join), so the"
    " grid is |sources| x 50 regardless of corpus size.",
)
def q136(spark, sf_dir):
    nd = table(spark, sf_dir, "documents").select(
        "source", norm_text().alias("n")
    )
    ti = nd.where(F.trim("n") != "").select(
        "source", F.explode(F.split(F.trim("n"), " ")).alias("t")
    )
    # ONE explode pass, map-side combined into (source, token) counts —
    # the persisted intermediate is vocab x sources sized, never the raw
    # token instances; vocabulary, corpus total, per-source totals and
    # the observation table all derive from it (4 consumers).
    obs_all = eager(
        ti.groupBy("source", "t").agg(F.count("*").alias("o"))
    )
    vt = (
        obs_all.groupBy("t")
        .agg(F.sum("o").alias("tfg"))
        .orderBy(F.col("tfg").desc(), "t")
        .limit(DRIFT_VOCAB)
        .collect()
    )
    tt = int(obs_all.agg(F.sum("o")).collect()[0][0])
    vocab_lit = F.array(
        *[
            F.struct(
                F.lit(r["t"]).alias("t"),
                # long, not int: 1000000 * tfg must not overflow 32-bit
                # under ANSI once per-token corpus counts pass ~2147
                F.lit(int(r["tfg"])).cast("long").alias("tfg"),
            )
            for r in vt
        ]
    )
    st = obs_all.groupBy("source").agg(F.sum("o").alias("s_tokens"))
    obs = obs_all.where(
        F.col("t").isin([r["t"] for r in vt])
    ).select("source", "t", "o")
    grid = st.select(
        "source", "s_tokens", F.explode(vocab_lit).alias("v")
    ).select("source", "s_tokens", "v.t", "v.tfg")
    d = grid.join(obs, ["source", "t"], "left").select(
        "source",
        "s_tokens",
        "t",
        F.abs(
            F.expr("1000000 * coalesce(o, 0L) DIV s_tokens")
            - F.expr(f"1000000 * tfg DIV {int(tt)}")
        ).alias("adiff"),
    )
    wsrc = Window.partitionBy("source")
    wr = Window.partitionBy("source").orderBy(F.col("adiff").desc(), "t")
    return (
        d.withColumn("sad", F.sum("adiff").over(wsrc))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("s_tokens").cast("long").alias("s_tokens"),
            F.expr("sad DIV 2").cast("long").alias("tv_ppm"),
            F.col("t").alias("top_token"),
            F.col("adiff").cast("long").alias("top_adiff_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Robust per-source length-outlier audit. Mean/stddev outlier rules are
# themselves corrupted by the outliers they hunt; the production rule
# is median +- k*MAD (median absolute deviation), which is exact
# integer arithmetic here: both medians are percentile_disc values
# (rank ceil(n/2) in a per-source sort), no float moments. Flags the
# docs a format regression produces (truncated-to-nothing or
# concatenated-megarow) per source.
# ---------------------------------------------------------------------------

MAD_K = 5


@register(
    "q137_mad_length_outliers",
    "WITH nd AS (SELECT doc_id, source, " + NORM_SQL_DUCK
    + " AS n FROM documents),"
    " d AS (SELECT doc_id, source,"
    " CASE WHEN trim(n) = '' THEN 0"
    " ELSE len(string_split(trim(n), ' ')) END AS len FROM nd),"
    " r1 AS (SELECT source, len, row_number() OVER"
    " (PARTITION BY source ORDER BY len, doc_id) AS rn,"
    " count(*) OVER (PARTITION BY source) AS n FROM d),"
    " med AS (SELECT source, CAST(min(CASE WHEN rn = (n + 1) // 2"
    " THEN len END) AS BIGINT) AS median_tokens FROM r1"
    " GROUP BY source),"
    " ad AS (SELECT d.doc_id, d.source, d.len,"
    " abs(d.len - m.median_tokens) AS adev FROM d"
    " JOIN med m ON m.source = d.source),"
    " r2 AS (SELECT source, adev, row_number() OVER"
    " (PARTITION BY source ORDER BY adev, doc_id) AS rn,"
    " count(*) OVER (PARTITION BY source) AS n FROM ad),"
    " mad AS (SELECT source, CAST(min(CASE WHEN rn = (n + 1) // 2"
    " THEN adev END) AS BIGINT) AS mad_tokens FROM r2 GROUP BY source)"
    " SELECT a.source, CAST(count(*) AS BIGINT) AS n_docs,"
    " m.median_tokens, x.mad_tokens,"
    f" CAST(sum(CASE WHEN a.adev > {MAD_K} * x.mad_tokens"
    " THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,"
    f" CAST(1000000 * sum(CASE WHEN a.adev > {MAD_K} * x.mad_tokens"
    " THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS outlier_ppm"
    " FROM ad a JOIN med m ON m.source = a.source"
    " JOIN mad x ON x.source = a.source"
    " GROUP BY a.source, m.median_tokens, x.mad_tokens"
    " ORDER BY a.source",
    doc="Robust per-source length-outlier audit: median +- 5*MAD over"
    " whitespace-token counts, both medians exact percentile_disc"
    " (rank ceil(n/2)) — no float moments, so the rule is not"
    " corrupted by the outliers it hunts and both engines agree"
    " exactly. Two bounded per-source window passes (rank within"
    " source), id-keyed median joins; flags the truncation/"
    "concatenation regressions a feed produces.",
)
def q137(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(F.trim(norm_text()) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(norm_text()), " ")))
        .alias("len"),
    )
    w1 = Window.partitionBy("source").orderBy("len", "doc_id")
    wn = Window.partitionBy("source")
    r1 = d.withColumn("rn", F.row_number().over(w1)).withColumn(
        "n", F.count("*").over(wn)
    )
    med = r1.groupBy("source").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("len"))
        )
        .cast("long")
        .alias("median_tokens")
    )
    ad = d.join(med, "source").select(
        "doc_id",
        "source",
        "len",
        "median_tokens",
        F.abs(F.col("len") - F.col("median_tokens")).alias("adev"),
    )
    w2 = Window.partitionBy("source").orderBy("adev", "doc_id")
    r2 = ad.withColumn("rn", F.row_number().over(w2)).withColumn(
        "n", F.count("*").over(wn)
    )
    mad = r2.groupBy("source").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("adev"))
        )
        .cast("long")
        .alias("mad_tokens")
    )
    out_flag = F.when(
        F.col("adev") > MAD_K * F.col("mad_tokens"), 1
    ).otherwise(0)
    return (
        ad.join(mad, "source")
        .groupBy("source", "median_tokens", "mad_tokens")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(out_flag).cast("long").alias("n_outliers"),
        )
        .select(
            "source",
            "n_docs",
            "median_tokens",
            "mad_tokens",
            "n_outliers",
            F.expr("1000000 * n_outliers DIV n_docs")
            .cast("long")
            .alias("outlier_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility. Fertility (subword tokens per whitespace word) is
# THE tokenizer-health metric per language/source slice: a fertility
# spike means the tokenizer fragments that slice (wrong script, mojibake,
# digit floods) and its token budget silently inflates. Pure row-local
# counting (the q38 BPE-ish regex over the shared normalization) plus
# one partial-aggregated groupBy; the ratio is scaled-int e3.
# ---------------------------------------------------------------------------


@register(
    "q138_tokenizer_fertility",
    "WITH d AS (SELECT lang, source,"
    " CASE WHEN trim(" + NORM_SQL_DUCK + ") = '' THEN 0"
    " ELSE len(string_split(trim(" + NORM_SQL_DUCK + "), ' ')) END AS ws,"
    f" len(regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}')) AS bpe"
    " FROM documents)"
    " SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(ws) AS BIGINT) AS ws_tokens,"
    " CAST(sum(bpe) AS BIGINT) AS bpe_tokens,"
    " CAST(1000 * sum(bpe) // greatest(sum(ws), 1) AS BIGINT)"
    " AS fertility_e3"
    " FROM d GROUP BY lang, source ORDER BY lang, source",
    doc="Tokenizer fertility (BPE-ish subword tokens per whitespace"
    " word, scaled e3) per (lang, source) slice — the tokenizer-health"
    " readout: a fertility spike flags script mismatch/mojibake/digit"
    " floods inflating the slice's token budget. Row-local regex"
    " counting over the shared normalization, one map-side-combined"
    " groupBy, integer ratio.",
)
def q138(spark, sf_dir):
    ws = F.when(F.trim(norm_text()) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(norm_text()), " "))
    )
    bpe = F.size(F.regexp_extract_all(norm_text(), F.lit(_BPE_PATTERN), 0))
    return (
        table(spark, sf_dir, "documents")
        .select("lang", "source", ws.alias("ws"), bpe.alias("bpe"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.expr("1000 * bpe_tokens DIV greatest(ws_tokens, 1L)")
            .cast("long")
            .alias("fertility_e3"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# Encoding-anomaly (mojibake) audit. A feed that re-decodes bytes with
# the wrong charset litters text with U+FFFD replacement characters;
# binary-contaminated scrapes carry C0 control chars; PDF/HTML
# extraction leaves zero-width/format chars that inflate token counts
# invisibly. Counts are pure row-local length deltas (strip the class,
# subtract) — UTF-16-unit vs code-point length() disagreement between
# the engines cancels in the subtraction because every stripped char is
# BMP. The fixture corpus is clean ASCII, so (q116 lesson) the regex
# dialect parity is pinned by a dedicated synthetic-corpus test with
# real hits, not just the all-zeros oracle run.
# ---------------------------------------------------------------------------

# \x{...} hex notation parses identically in Java regex and RE2; the
# control class deliberately allows tab/LF/VT/FF/CR (Java \s members).
_ENC_REPL = "\\x{FFFD}"
_ENC_CTRL = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"
_ENC_ZW = "[\\x{200B}-\\x{200D}\\x{FEFF}]"


@register(
    "q142_encoding_anomaly_audit",
    "WITH d AS (SELECT source, coalesce(text, '') AS t FROM documents),"
    " a AS (SELECT source,"
    f" len(t) - len(regexp_replace(t, '{_ENC_REPL}', '', 'g')) AS repl,"
    f" len(t) - len(regexp_replace(t, '{_ENC_CTRL}', '', 'g')) AS ctrl,"
    f" len(t) - len(regexp_replace(t, '{_ENC_ZW}', '', 'g')) AS zw"
    " FROM d)"
    " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(CASE WHEN repl + ctrl + zw > 0 THEN 1 ELSE 0 END)"
    " AS BIGINT) AS docs_flagged,"
    " CAST(sum(repl) AS BIGINT) AS repl_chars,"
    " CAST(sum(ctrl) AS BIGINT) AS ctrl_chars,"
    " CAST(sum(zw) AS BIGINT) AS zw_chars,"
    " CAST(1000000 * sum(CASE WHEN repl + ctrl + zw > 0 THEN 1 ELSE 0"
    " END) // count(*) AS BIGINT) AS flagged_ppm"
    " FROM a GROUP BY source ORDER BY source",
    doc="Per-source encoding-anomaly audit: counts of U+FFFD"
    " replacement chars (wrong-charset re-decode), C0 control chars"
    " excluding tab/LF/VT/FF/CR (binary contamination), and zero-width/"
    "format chars (extraction residue), plus the ppm of flagged docs —"
    " the triage readout for a feed whose decoder regressed. Row-local"
    " strip-and-subtract length deltas (UTF-16 vs code-point length"
    " cancels: every stripped char is BMP); one map-side-combined"
    " groupBy. Regex dialect parity pinned on a real-hit synthetic"
    " corpus in tests/test_round8_ops.py (the fixture corpus is clean).",
)
def q142(spark, sf_dir):
    t = F.coalesce(F.col("text"), F.lit(""))

    def strip_count(pat):
        return F.length(t) - F.length(F.regexp_replace(t, pat, ""))

    a = table(spark, sf_dir, "documents").select(
        "source",
        strip_count(_ENC_REPL).alias("repl"),
        strip_count(_ENC_CTRL).alias("ctrl"),
        strip_count(_ENC_ZW).alias("zw"),
    )
    flagged = F.when(
        F.col("repl") + F.col("ctrl") + F.col("zw") > 0, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        a.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(flagged).cast("long").alias("docs_flagged"),
            F.sum("repl").cast("long").alias("repl_chars"),
            F.sum("ctrl").cast("long").alias("ctrl_chars"),
            F.sum("zw").cast("long").alias("zw_chars"),
        )
        .select(
            "source",
            "n_docs",
            "docs_flagged",
            "repl_chars",
            "ctrl_chars",
            "zw_chars",
            F.expr("1000000 * docs_flagged DIV n_docs")
            .cast("long")
            .alias("flagged_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Token-budget waterfill allocator. The production question: "the next
# run may only consume B tokens — how many from each source?" A
# proportional split starves small high-value feeds; a uniform cap
# wastes budget on sources smaller than the cap. Waterfilling gives
# every source min(its tokens, L) with the level L chosen so the total
# just fits — the max-min-fair allocation. Exact integer form: over
# sources sorted by token count ascending, L = max_i (B - prefix_{i-1})
# DIV (n-i+1), clamped at 0 before the DIV (Spark DIV truncates, DuckDB
# // floors — they agree only on non-negatives). Property-tested: the
# allocation fits B and no uniform level L+1 would.
# ---------------------------------------------------------------------------

WATERFILL_DEN = 2  # budget = total corpus tokens DIV 2


@register(
    "q144_token_budget_waterfill",
    "WITH d AS (SELECT source,"
    " CASE WHEN trim(" + NORM_SQL_DUCK + ") = '' THEN 0"
    " ELSE len(string_split(trim(" + NORM_SQL_DUCK + "), ' ')) END AS ws"
    " FROM documents),"
    " s AS (SELECT source, CAST(sum(ws) AS BIGINT) AS tokens FROM d"
    " GROUP BY source),"
    f" b AS (SELECT CAST(sum(tokens) // {WATERFILL_DEN} AS BIGINT)"
    " AS budget FROM s),"
    " r AS (SELECT source, tokens, budget,"
    " coalesce(CAST(sum(tokens) OVER (ORDER BY tokens, source"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)"
    " AS cum_prev,"
    " row_number() OVER (ORDER BY tokens, source) AS rn,"
    " count(*) OVER () AS n FROM s CROSS JOIN b),"
    " lv AS (SELECT *, greatest(budget - cum_prev, 0) // (n - rn + 1)"
    " AS level_i FROM r),"
    " fin AS (SELECT *, CAST(max(level_i) OVER () AS BIGINT) AS lvl"
    " FROM lv)"
    " SELECT source, tokens, budget, lvl AS level,"
    " CAST(least(tokens, lvl) AS BIGINT) AS alloc_tokens,"
    " CAST(CASE WHEN tokens <= lvl THEN 1 ELSE 0 END AS BIGINT)"
    " AS fully_taken,"
    " CAST(1000000 * least(tokens, lvl) // greatest(tokens, 1)"
    " AS BIGINT) AS take_ppm"
    " FROM fin ORDER BY source",
    doc="Max-min-fair token-budget allocation across sources"
    " (waterfill): every source gets min(tokens, L) with the level L"
    " the largest integer whose uniform allocation fits the budget"
    " (half the corpus here). Exact integer arithmetic: L = max over"
    " sorted sources of (B - prefix) DIV remaining, clamped at 0"
    " before the DIV (Spark truncates, DuckDB floors — non-negative"
    " only). The corpus pass is one map-side-combined groupBy; every"
    " window runs over the handful of per-source rows (q84 rule);"
    " the budget scalar attaches driver-side (q52 pattern — a lit=="
    "lit join would plan BroadcastNestedLoop).",
)
def q144(spark, sf_dir):
    from pyspark.sql.window import Window

    ws = F.when(F.trim(norm_text()) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(norm_text()), " "))
    )
    per_src = (
        table(spark, sf_dir, "documents")
        .select("source", ws.alias("ws"))
        .groupBy("source")
        .agg(F.sum("ws").cast("long").alias("tokens"))
    )
    per_src = eager(per_src)
    total = per_src.agg(F.sum("tokens")).first()[0] or 0
    budget = int(total) // WATERFILL_DEN

    w_ord = Window.orderBy("tokens", "source")
    w_all = Window.partitionBy()
    r = per_src.select(
        "source",
        "tokens",
        F.lit(budget).cast("long").alias("budget"),
        F.coalesce(
            F.sum("tokens").over(
                w_ord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cum_prev"),
        F.row_number().over(w_ord).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    ).withColumn(
        "level_i",
        F.expr("greatest(budget - cum_prev, 0L) DIV (n - rn + 1)"),
    )
    fin = r.withColumn(
        "lvl", F.max("level_i").over(w_all).cast("long")
    )
    return fin.select(
        "source",
        "tokens",
        "budget",
        F.col("lvl").alias("level"),
        F.least("tokens", "lvl").cast("long").alias("alloc_tokens"),
        F.when(F.col("tokens") <= F.col("lvl"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fully_taken"),
        F.expr("1000000 * least(tokens, lvl) DIV greatest(tokens, 1L)")
        .cast("long")
        .alias("take_ppm"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Sequence-length truncation frontier. q90 picks max_seq_len by DOC
# share; what the training-budget owner actually trades off is TOKEN
# mass: how many tokens survive truncate-to-L and how many are thrown
# away, per candidate L. One corpus pass computes the per-doc token
# count; the candidate grid attaches as a literal array exploded per
# row (the q126/q136 grid rule — never a cross join), so the shuffle
# carries (L, partial sums) for 4 groups.
# ---------------------------------------------------------------------------

SEQLEN_GRID = [256, 512, 1024, 2048]


@register(
    "q149_seqlen_truncation_frontier",
    "WITH d AS (SELECT CASE WHEN trim(" + NORM_SQL_DUCK + ") = '' THEN 0"
    " ELSE len(string_split(trim(" + NORM_SQL_DUCK + "), ' ')) END AS ws"
    " FROM documents),"
    f" g AS (SELECT ws, unnest({SEQLEN_GRID}) AS l FROM d)"
    " SELECT CAST(l AS BIGINT) AS max_seq_len,"
    " CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(CASE WHEN ws > l THEN 1 ELSE 0 END) AS BIGINT)"
    " AS docs_truncated,"
    " CAST(sum(least(ws, l)) AS BIGINT) AS tokens_kept,"
    " CAST(sum(greatest(ws - l, 0)) AS BIGINT) AS tokens_truncated,"
    " CAST(1000000 * sum(least(ws, l))"
    " // greatest(sum(ws), 1) AS BIGINT) AS kept_ppm"
    " FROM g GROUP BY l ORDER BY max_seq_len",
    doc="Truncate-to-L token-mass frontier over candidate max_seq_len"
    " values {256,512,1024,2048}: docs truncated, tokens kept vs"
    " thrown away, and the kept-ppm — the budget-side complement of"
    " q90's doc-share histogram (a 1% doc tail can carry 30% of the"
    " tokens). One corpus pass; the candidate grid explodes from a"
    " 4-element literal per row; integer sums only.",
)
def q149(spark, sf_dir):
    ws = F.when(F.trim(norm_text()) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(norm_text()), " "))
    )
    g = (
        table(spark, sf_dir, "documents")
        .select(ws.alias("ws"))
        .select(
            "ws",
            F.explode(
                F.array(*[F.lit(v) for v in SEQLEN_GRID])
            ).alias("l"),
        )
    )
    return (
        g.groupBy("l")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("ws") > F.col("l"), 1).otherwise(0))
            .cast("long")
            .alias("docs_truncated"),
            F.sum(F.least("ws", "l")).cast("long").alias("tokens_kept"),
            F.sum(F.greatest(F.col("ws") - F.col("l"), F.lit(0)))
            .cast("long")
            .alias("tokens_truncated"),
            F.sum("ws").cast("long").alias("_tw"),
        )
        .select(
            F.col("l").cast("long").alias("max_seq_len"),
            "n_docs",
            "docs_truncated",
            "tokens_kept",
            "tokens_truncated",
            F.expr("1000000 * tokens_kept DIV greatest(_tw, 1L)")
            .cast("long")
            .alias("kept_ppm"),
        )
        .orderBy("max_seq_len")
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) allocation of a labeling/eval budget across sources:
# sample proportionally to N_h * S_h, so high-variance feeds get deeper
# inspection. The determinism trick making this viable cross-engine:
# N_h*S_h = sqrt(N_h*Σx² − (Σx)²) EXACTLY, so the only float op is one
# IEEE sqrt of an exact integer (correctly rounded, bit-identical
# everywhere) — no mean, no float variance. The weight normalization
# folds the ~20 per-source doubles in source order (q30 order-fixed
# rule); Spark attaches the fold result driver-side (the q52 bounded-
# scalar pattern), the oracle spells the same fold as list_reduce.
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 10000


@register(
    "q151_neyman_allocation",
    "WITH d AS (SELECT source,"
    " CASE WHEN trim(" + NORM_SQL_DUCK + ") = '' THEN 0"
    " ELSE len(string_split(trim(" + NORM_SQL_DUCK + "), ' ')) END AS ws"
    " FROM documents),"
    " s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(ws) AS BIGINT) AS sx,"
    " CAST(sum(CAST(ws AS BIGINT) * ws) AS BIGINT) AS sxx"
    " FROM d GROUP BY source),"
    " w AS (SELECT source, n_docs, sx, sxx,"
    " sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) AS wgt FROM s),"
    " t AS (SELECT list_reduce(list_prepend(0.0,"
    " list(wgt ORDER BY source)), (acc, x) -> acc + x) AS total FROM w)"
    " SELECT source, n_docs,"
    " CAST(n_docs * sxx - sx * sx AS BIGINT) AS var_num,"
    " CAST(CASE WHEN total = 0.0 THEN 0 ELSE"
    " floor(1000000.0 * wgt / total) END AS BIGINT) AS share_ppm,"
    " CAST(CASE WHEN total = 0.0 THEN 0 ELSE"
    f" floor({NEYMAN_BUDGET}.0 * wgt / total) END AS BIGINT)"
    " AS alloc_docs"
    " FROM w CROSS JOIN t ORDER BY source",
    doc="Neyman-optimal allocation of a 10k-doc inspection budget"
    " across sources: weight N_h*S_h computed as one IEEE sqrt of the"
    " exact integer N·Σx²−(Σx)² (bit-identical cross-engine; no float"
    " moments), normalized by a source-ordered fold of the ~20 weight"
    " doubles (q30 order-fixed rule; Spark attaches the fold driver-"
    "side per the q52 bounded-scalar pattern). High-variance feeds get"
    " deeper sampling — the survey-statistics answer to 'where do the"
    " labelers look'.",
)
def q151(spark, sf_dir):
    ws = F.when(F.trim(norm_text()) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(norm_text()), " "))
    )
    s = (
        table(spark, sf_dir, "documents")
        .select("source", ws.alias("ws"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("sx"),
            F.sum(F.expr("ws * CAST(ws AS BIGINT)"))
            .cast("long")
            .alias("sxx"),
        )
    )
    s = eager(s)
    w = s.select(
        "source",
        "n_docs",
        F.expr("n_docs * sxx - sx * sx").cast("long").alias("var_num"),
    ).withColumn("wgt", F.sqrt(F.col("var_num").cast("double")))
    # source-ordered driver-side fold — same 0.0-seeded left fold as the
    # oracle's list_reduce(list_prepend(0.0, list(wgt ORDER BY source)))
    rows = sorted(
        (r["source"], float(r["wgt"])) for r in w.select("source", "wgt").collect()
    )
    total = 0.0
    for _, v in rows:
        total = total + v
    if total == 0.0:
        share = F.lit(0).cast("long")
        alloc = F.lit(0).cast("long")
    else:
        share = F.floor(1000000.0 * F.col("wgt") / F.lit(total)).cast(
            "long"
        )
        alloc = F.floor(
            float(NEYMAN_BUDGET) * F.col("wgt") / F.lit(total)
        ).cast("long")
    return (
        w.select(
            "source",
            "n_docs",
            "var_num",
            share.alias("share_ppm"),
            alloc.alias("alloc_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact Kolmogorov–Smirnov drift between the train and test splits'
# length distributions. q76/q98 check COUNTS per stratum; KS checks the
# SHAPE — a split hash that accidentally correlates with length (e.g.
# hashing a key that encodes ingest order) shifts the whole ECDF, and
# max |ECDF_train − ECDF_test| is the standard detector. Exact integer
# form: per distinct length value, cumulative conditional counts; the
# ECDFs floor to ppm; the windows run over the distinct-length
# histogram table (bounded by the value space, never the corpus).
# ---------------------------------------------------------------------------


@register(
    "q156_split_ks_drift",
    "WITH s AS (SELECT n_chars AS v,"
    f" {SPLIT_CASE_DUCK} AS split FROM documents),"
    " h AS (SELECT v,"
    " CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS ct,"
    " CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS ce FROM s WHERE split != 'val' GROUP BY v),"
    " c AS (SELECT v,"
    " CAST(sum(ct) OVER (ORDER BY v) AS BIGINT) AS cum_tr,"
    " CAST(sum(ce) OVER (ORDER BY v) AS BIGINT) AS cum_te,"
    " CAST(sum(ct) OVER () AS BIGINT) AS n_tr,"
    " CAST(sum(ce) OVER () AS BIGINT) AS n_te FROM h),"
    " g AS (SELECT v, n_tr, n_te,"
    " abs(1000000 * cum_tr // greatest(n_tr, 1)"
    " - 1000000 * cum_te // greatest(n_te, 1)) AS gap_ppm FROM c)"
    " SELECT n_tr AS n_train, n_te AS n_test,"
    " CAST(max(gap_ppm) AS BIGINT) AS ks_ppm,"
    " CAST(min(CASE WHEN gap_ppm = (SELECT max(gap_ppm) FROM g)"
    " THEN v END) AS BIGINT) AS at_value"
    " FROM g GROUP BY n_tr, n_te",
    doc="Exact Kolmogorov-Smirnov statistic between the train and test"
    " splits' n_chars distributions (ppm) + the length where the gap"
    " peaks: the SHAPE-level split-balance check q76/q98's counts"
    " can't see — a split hash correlated with length shifts the whole"
    " ECDF. Integer arithmetic throughout: cumulative conditional"
    " counts per distinct length, ECDFs floored to ppm; every window"
    " runs over the distinct-length histogram table, never the"
    " corpus.",
)
def q156(spark, sf_dir):
    from pyspark.sql.window import Window

    s = table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"), split_col().alias("split")
    )
    h = (
        s.where(F.col("split") != "val")
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
            .cast("long")
            .alias("ct"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
            .cast("long")
            .alias("ce"),
        )
    )
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    c = h.select(
        "v",
        F.sum("ct").over(w_cum).cast("long").alias("cum_tr"),
        F.sum("ce").over(w_cum).cast("long").alias("cum_te"),
        F.sum("ct").over(w_all).cast("long").alias("n_tr"),
        F.sum("ce").over(w_all).cast("long").alias("n_te"),
    )
    g = c.select(
        "v",
        "n_tr",
        "n_te",
        F.abs(
            F.expr("1000000 * cum_tr DIV greatest(n_tr, 1L)")
            - F.expr("1000000 * cum_te DIV greatest(n_te, 1L)")
        ).alias("gap_ppm"),
    )
    g2 = g.withColumn("mx", F.max("gap_ppm").over(w_all))
    return g2.agg(
        F.max("n_tr").cast("long").alias("n_train"),
        F.max("n_te").cast("long").alias("n_test"),
        F.max("gap_ppm").cast("long").alias("ks_ppm"),
        F.min(F.when(F.col("gap_ppm") == F.col("mx"), F.col("v")))
        .cast("long")
        .alias("at_value"),
    )


# ---------------------------------------------------------------------------
# Cross-lingual template (skeleton) duplicates. Translated boilerplate
# — the same generated page served in 20 languages — defeats lexical
# dedup (different words) and often semantic dedup (different
# embeddings), but its PUNCTUATION/DIGIT SKELETON is identical: strip
# letter runs to 'W' and digit runs to 'D' over the shared
# normalization and hash what remains. Groups spanning >= 2 languages
# are the template clusters a mixture audit must know about.
# ---------------------------------------------------------------------------

_SKELETON_DUCK = (
    "md5(regexp_replace(regexp_replace(" + NORM_SQL_DUCK + ","
    " '[a-z]+', 'W', 'g'), '[0-9]+', 'D', 'g'))"
)


@register(
    "q160_skeleton_template_dupes",
    "WITH s AS (SELECT doc_id, lang, source,"
    f" {_SKELETON_DUCK} AS sk FROM documents),"
    " g AS (SELECT sk, CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,"
    " CAST(count(DISTINCT source) AS BIGINT) AS n_sources,"
    " CAST(min(doc_id) AS BIGINT) AS exemplar_doc"
    " FROM s GROUP BY sk HAVING count(*) >= 2"
    " AND count(DISTINCT lang) >= 2)"
    " SELECT sk, n_docs, n_langs, n_sources, exemplar_doc FROM g"
    " ORDER BY n_docs DESC, sk LIMIT 20",
    doc="Cross-lingual template detection: the punctuation/digit"
    " SKELETON (letter runs -> 'W', digit runs -> 'D' over the shared"
    " normalization) hashes identically for translated boilerplate"
    " that lexical and semantic dedup both miss. Row-local skeleton"
    " hash, one 16-byte-key groupBy, top-20 multi-language groups —"
    " the template clusters a mixture audit must discount.",
)
def q160(spark, sf_dir):
    sk = F.md5(
        F.regexp_replace(
            F.regexp_replace(norm_text(), "[a-z]+", "W"),
            "[0-9]+",
            "D",
        )
    )
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", sk.alias("sk"))
        .groupBy("sk")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").cast("long").alias("exemplar_doc"),
        )
        .where((F.col("n_docs") >= 2) & (F.col("n_langs") >= 2))
        .orderBy(F.col("n_docs").desc(), "sk")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Zipf coverage curve. Tokenizer-design question zero: what fraction of
# the corpus token MASS do the top-100 / top-1k / top-10k vocabulary
# terms cover? Exact ranks come from a two-phase decomposition (the
# q165 band trick, here with LOG-spaced bands so the band table stays
# ~64 rows at any corpus size): rank = rows-in-strictly-higher-bands +
# within-band row_number, and rows whose band prefix already exceeds
# the largest k are pruned BEFORE the within-band window — the fat
# singleton-count tail is never sorted.
# ---------------------------------------------------------------------------

ZIPF_KS = (100, 1000, 10000)


@register(
    "q169_zipf_coverage",
    "WITH tok AS (SELECT unnest(string_split(trim("
    + NORM_SQL_DUCK + "), ' ')) AS token FROM documents"
    f" WHERE trim({NORM_SQL_DUCK}) != ''),"
    " vf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok"
    " GROUP BY token),"
    " r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, token)"
    " AS rnk FROM vf)"
    " SELECT (SELECT CAST(count(*) AS BIGINT) FROM vf) AS n_terms,"
    " (SELECT CAST(sum(tf) AS BIGINT) FROM vf) AS total_tokens,"
    + ", ".join(
        f"CAST(CAST(sum(CASE WHEN rnk <= {k} THEN tf ELSE 0 END)"
        " AS BIGINT) * 1000000"
        " // (SELECT CAST(sum(tf) AS BIGINT) FROM vf) AS BIGINT)"
        f" AS top{k}_ppm"
        for k in ZIPF_KS
    )
    + " FROM r",
    doc="Zipf coverage: corpus token-mass share (ppm) of the top-100/"
    "1k/10k vocabulary terms — the readout that sizes a tokenizer"
    " vocabulary. Spark computes exact ranks two-phase (q165 pattern"
    " with log2 count bands, ~64 band rows at any scale): within-band"
    " row_numbers run in parallel, the global prefix runs over the"
    " band-count table only, and bands whose prefix already exceeds"
    " max(k) are pruned BEFORE the window — the singleton-count tail"
    " (most of a web-scale vocabulary) is never sorted. The oracle is"
    " the equivalent single row_number window; totals are bounded"
    " driver scalars.",
)
def q169(spark, sf_dir):
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    vf = (
        docs.select(n.alias("n"))
        .where(F.col("n") != "")
        .select(F.explode(F.split(F.col("n"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    vf = eager(vf)
    totals = vf.agg(
        F.count("*").cast("long").alias("nt"),
        F.sum("tf").cast("long").alias("tot"),
    ).first()
    n_terms, total = int(totals["nt"] or 0), int(totals["tot"] or 0)
    kmax = max(ZIPF_KS)
    # log2 band of the count: monotone in tf, ties never straddle bands
    banded = vf.withColumn("band", F.expr("length(bin(tf))"))
    w_bands = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )  # runs over the ~64 band-count rows only
    prefix = (
        banded.groupBy("band")
        .agg(F.count("*").alias("bc"))
        .withColumn(
            "higher", F.coalesce(F.sum("bc").over(w_bands), F.lit(0))
        )
        .select("band", "higher")
    )
    w_in = Window.partitionBy("band").orderBy(
        F.col("tf").desc(), "token"
    )
    cand = (
        banded.join(F.broadcast(prefix), "band")
        # prune: anything in a band whose prefix already clears kmax
        # can never rank <= kmax — the fat tail skips the window
        .where(F.col("higher") < kmax)
        .withColumn(
            "rnk", F.col("higher") + F.row_number().over(w_in)
        )
    )
    agg = cand.agg(
        *[
            F.sum(
                F.when(F.col("rnk") <= k, F.col("tf")).otherwise(0)
            )
            .cast("long")
            .alias(f"c{k}")
            for k in ZIPF_KS
        ]
    )
    return agg.select(
        F.lit(n_terms).cast("long").alias("n_terms"),
        F.lit(total).cast("long").alias("total_tokens"),
        *[
            F.expr(f"c{k} * 1000000 DIV {max(total, 1)}")
            .cast("long")
            .alias(f"top{k}_ppm")
            for k in ZIPF_KS
        ],
    )


# ---------------------------------------------------------------------------
# Cross-source template flow matrix. q160 finds cross-LINGUAL template
# clusters; the same skeleton hash aggregated by SOURCE answers the
# provenance question — which ingestion feeds serve the same generated
# boilerplate? The join is keyed on the 16-byte skeleton and fans out
# at most (#sources choose 2) per skeleton — source count is a small
# dimension, so the matrix is bounded no matter the corpus size.
# ---------------------------------------------------------------------------


@register(
    "q171_source_template_matrix",
    "WITH s AS (SELECT doc_id, source,"
    f" {_SKELETON_DUCK} AS sk FROM documents),"
    " g AS (SELECT sk, source, CAST(count(*) AS BIGINT) AS c"
    " FROM s GROUP BY sk, source)"
    " SELECT a.source AS source_a, b.source AS source_b,"
    " CAST(count(*) AS BIGINT) AS n_shared_skeletons,"
    " CAST(sum(a.c) AS BIGINT) AS docs_a,"
    " CAST(sum(b.c) AS BIGINT) AS docs_b"
    " FROM g a JOIN g b ON a.sk = b.sk AND a.source < b.source"
    " GROUP BY a.source, b.source ORDER BY source_a, source_b",
    doc="Cross-source template flow: for each source pair, how many"
    " punctuation/digit skeletons (q160's hash) they share and how"
    " many documents sit on each side — the feed-provenance readout"
    " that tells a curation run which ingestion pipelines mirror each"
    " other's boilerplate. One skeleton-keyed groupBy; the pair join"
    " is keyed on the 16-byte hash with fanout bounded by the SOURCE"
    " dimension (never documents); output <= C(#sources, 2) rows.",
)
def q171(spark, sf_dir):
    sk = F.md5(
        F.regexp_replace(
            F.regexp_replace(norm_text(), "[a-z]+", "W"),
            "[0-9]+",
            "D",
        )
    )
    g = eager(
        table(spark, sf_dir, "documents")
        .select("source", sk.alias("sk"))
        .groupBy("sk", "source")
        .agg(F.count("*").cast("long").alias("c"))
    )
    a = g.select(
        F.col("sk").alias("ska"),
        F.col("source").alias("source_a"),
        F.col("c").alias("ca"),
    )
    b = g.select(
        F.col("sk").alias("skb"),
        F.col("source").alias("source_b"),
        F.col("c").alias("cb"),
    )
    return (
        a.join(
            b,
            (F.col("ska") == F.col("skb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_skeletons"),
            F.sum("ca").cast("long").alias("docs_a"),
            F.sum("cb").cast("long").alias("docs_b"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Iterated BPE merges (round-8 verdict item 5). q91 computes only the
# FIRST merge-rule pass; a tokenizer-training pipeline applies the rule
# and re-counts. Three merge rounds, each round's top pair collected as
# a bounded driver scalar (q52/q102 rule: a 1-row limit(1) collect, not
# a corpus collect) that parameterizes the next round's rewrite — the
# q77 lazy-unroll pattern, no driver loop over data.
#
# Merge application is the greedy left-to-right BPE scan, expressed as
# per-document window algebra instead of an O(n^2) array fold:
#   m(i)     = tok(i)=a AND tok(i+1)=b           (lead; consecutive
#                                                 matches only exist
#                                                 when a = b)
#   kept(i)  = m(i) AND (i - run_start(i)) % 2 = 0
#              with run_start = last non-match position + 1, a running
#              max over the SAME (doc_id, i) ordering as every other
#              window (greedy = every other match within a run; no
#              second hash exchange)
#   survivors drop rows where kept(i-1); kept rows become the merged
#   symbol a||b; positions renumber via row_number for the next round.
# All windows partition by doc_id (doc-length-bounded, q119 rule); the
# only corpus-sized shuffles key doc_id (3 rounds) and the pair string
# (3 partial-agg counts). The DuckDB oracle replays the identical
# algebra with scalar subqueries standing in for the collected literals,
# generated per round from ONE template so the engines cannot drift.
# ---------------------------------------------------------------------------

BPE_MERGE_ROUNDS = 3


def _bpe_tok0(spark, sf_dir, docs=None):
    if docs is None:
        docs = spread(spark, table(spark, sf_dir, "documents"))
    t = F.regexp_extract_all(norm_text(), F.lit(_BPE_PATTERN), 0)
    return docs.select(
        "doc_id", F.posexplode(t).alias("i", "tok")
    ).select("doc_id", F.col("i").cast("long").alias("i"), "tok")


def _bpe_pair_counts(tok):
    w = Window.partitionBy("doc_id").orderBy("i")
    nxt = F.lead("tok").over(w)
    pair = F.when(nxt.isNotNull(), F.concat("tok", F.lit(" "), nxt))
    return (
        tok.select("doc_id", pair.alias("pair"))
        .where(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
    )


def _bpe_top1(pairs):
    return pairs.orderBy(F.col("tf").desc(), "pair").limit(1)


def _bpe_apply(tok, a: str, b: str):
    """One greedy merge pass of rule (a, b): windows per the module
    comment; survivors renumbered to gapless per-doc positions.

    The run start is derived from the LAST NON-MATCH position over the
    same (doc_id, i) ordering as every other window — run_start =
    prev_nonmatch + 1, so greedy parity is (i - 1 - prev_nonmatch) % 2
    — rather than a min over (doc_id, island) partitions, which would
    add a second hash exchange per merge round for nothing."""
    w = Window.partitionBy("doc_id").orderBy("i")
    nxt = F.lead("tok").over(w)
    d = tok.withColumn(
        "m",
        F.coalesce(
            (F.col("tok") == a) & (nxt == F.lit(b)), F.lit(False)
        ),
    )
    prev_nonmatch = F.coalesce(
        F.max(F.when(~F.col("m"), F.col("i"))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
        F.min("i").over(w.rowsBetween(Window.unboundedPreceding, 0))
        - 1,
    )
    d = d.withColumn(
        "kept",
        F.col("m") & ((F.col("i") - 1 - prev_nonmatch) % 2 == 0),
    )
    d = d.withColumn("kprev", F.lag("kept").over(w))
    out = d.where(~F.coalesce(F.col("kprev"), F.lit(False))).select(
        "doc_id",
        "i",
        F.when(F.col("kept"), F.lit(a + b))
        .otherwise(F.col("tok"))
        .alias("tok"),
    )
    return out.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("i"))
        .cast("long")
        .alias("i"),
        "tok",
    )


def _bpe_round_ctes(r: int) -> str:
    """DuckDB CTEs for merge round r: pair counts + top-1 over
    tok{r-1}, and (consumed by round r+1) the rewritten tok{r}.

    tok{r}/top{r} are MATERIALIZED: DuckDB inlines CTEs per REFERENCE,
    and each round references its predecessors several times (pr + mm
    read tok{r-1}; mm/ss carry scalar subqueries on top{r}), so an
    unmaterialized unroll re-executes the whole chain exponentially —
    q179's 5-round oracle measured 56 s vs 0.3 s materialized."""
    return (
        f"pr{r} AS (SELECT doc_id, CASE WHEN lead(tok) OVER"
        " (PARTITION BY doc_id ORDER BY i) IS NOT NULL THEN"
        " tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i)"
        f" END AS pair FROM tok{r - 1}),"
        f" top{r} AS MATERIALIZED (SELECT pair,"
        " CAST(count(*) AS BIGINT) AS tf,"
        " CAST(count(DISTINCT doc_id) AS BIGINT) AS df"
        f" FROM pr{r} WHERE pair IS NOT NULL GROUP BY pair"
        " ORDER BY tf DESC, pair LIMIT 1),"
        f" mm{r} AS (SELECT doc_id, i, tok, coalesce("
        f"tok = (SELECT split_part(pair, ' ', 1) FROM top{r})"
        " AND lead(tok) OVER (PARTITION BY doc_id ORDER BY i)"
        f" = (SELECT split_part(pair, ' ', 2) FROM top{r}), false)"
        f" AS m FROM tok{r - 1}),"
        f" kk{r} AS (SELECT doc_id, i, tok, m, m AND"
        " (i - 1 - coalesce("
        " max(CASE WHEN NOT m THEN i END) OVER"
        " (PARTITION BY doc_id ORDER BY i"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),"
        " min(i) OVER (PARTITION BY doc_id ORDER BY i"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1"
        ")) % 2 = 0 AS kept"
        f" FROM mm{r}),"
        f" ss{r} AS (SELECT doc_id, i, CASE WHEN kept THEN"
        f" (SELECT replace(pair, ' ', '') FROM top{r})"
        " ELSE tok END AS tok, lag(kept) OVER"
        " (PARTITION BY doc_id ORDER BY i) AS kprev"
        f" FROM kk{r}),"
        f" tok{r} AS MATERIALIZED (SELECT doc_id, CAST(row_number() OVER"
        " (PARTITION BY doc_id ORDER BY i) AS BIGINT) AS i, tok"
        f" FROM ss{r} WHERE NOT coalesce(kprev, false))"
    )


_Q176_SQL = (
    "WITH tok0 AS MATERIALIZED (SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS i,"
    " t[u.i] AS tok FROM (SELECT doc_id,"
    f" regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}') AS t"
    " FROM documents) tk, unnest(range(1, len(t) + 1)) AS u(i)),"
    + ",".join(
        _bpe_round_ctes(r) for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    + " "
    + " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, pair, tf, df"
        f" FROM top{r}"
        for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    + " ORDER BY merge_round"
)


@register(
    "q176_bpe_iterated_merges",
    _Q176_SQL,
    doc=f"Iterated BPE tokenizer training: {BPE_MERGE_ROUNDS} unrolled"
    " merge rounds over q38's pre-tokenization — each round counts"
    " adjacent symbol pairs, mints the most frequent as a merge rule"
    " (tf DESC, pair tie-break), and REWRITES the symbol stream with a"
    " greedy left-to-right scan before re-counting (q91 stops after"
    " the count). The greedy scan is per-doc window algebra"
    " (consecutive-match islands + parity — overlapping matches only"
    " exist for a=b runs), never an O(n^2) array fold; each round's"
    " rule attaches as a bounded 1-row driver scalar (q52/q102 rule,"
    " q77 lazy unroll). Output: the minted rules with tf/df at mint"
    " time. Shuffles: 3 doc_id-keyed window rounds + 3 partial-agg"
    " pair counts — all doc-length-bounded windows, scale-safe.",
)
def q176(spark, sf_dir):
    # Each round's winner already comes from a bounded 1-row collect
    # (the q52/q102 scalar rule — it parameterizes the next rewrite);
    # emit THOSE rows as the result (the q179 spelling) instead of
    # keeping lazy top-1 branches that re-ran every round's pair count
    # a second time at action time.
    import pyspark.sql.types as _T

    tok = eager(_bpe_tok0(spark, sf_dir))
    minted: list[tuple[int, str, int, int]] = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        rows = _bpe_top1(_bpe_pair_counts(tok)).collect()  # limit(1)
        if not rows:
            break
        minted.append(
            (rnd, rows[0]["pair"], int(rows[0]["tf"]), int(rows[0]["df"]))
        )
        if rnd < BPE_MERGE_ROUNDS:
            a, b = rows[0]["pair"].split(" ", 1)
            tok = eager(_bpe_apply(tok, a, b))
    schema = _T.StructType(
        [
            _T.StructField("merge_round", _T.LongType()),
            _T.StructField("pair", _T.StringType()),
            _T.StructField("tf", _T.LongType()),
            _T.StructField("df", _T.LongType()),
        ]
    )
    return spark.createDataFrame(minted, schema).orderBy("merge_round")


# ---------------------------------------------------------------------------
# BPE vocabulary training to a BUDGET — q176's iterated merge loop run
# the way a real tokenizer trainer runs it: up to BPE_BUDGET_ROUNDS
# merge rounds, stopping EARLY the first round whose best pair falls
# below a tf floor (the "min_frequency" stop every BPE trainer exposes
# — merging a pair rarer than the floor mints a rule the corpus can't
# amortize). The floor is relative to corpus size (n_docs DIV 11,
# floored at 2) so the stop criterion scales with the data instead of
# being a magic absolute. Spark applies the early-out driver-side from
# the SAME bounded 1-row collect that parameterizes the next rewrite
# (q52/q102 scalar rule) — an early stop SKIPS the remaining rewrite
# rounds entirely, which is the point of the floor at 100 TB; the
# DuckDB oracle computes all unrolled rounds and filters with the
# equivalent cumulative NOT EXISTS (a round emits only if every round
# at or before it cleared the floor), so the engines agree on exactly
# which prefix of the budget was minted.
# ---------------------------------------------------------------------------

BPE_BUDGET_ROUNDS = 5
BPE_TF_FLOOR_DIVISOR = 11  # floor = greatest(2, n_docs DIV 11)

_Q179_FLOOR_SQL = (
    "(SELECT greatest(2, count(*) // "
    f"{BPE_TF_FLOOR_DIVISOR}) FROM documents)"
)

_Q179_SQL = (
    "WITH tok0 AS MATERIALIZED (SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS i,"
    " t[u.i] AS tok FROM (SELECT doc_id,"
    f" regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}') AS t"
    " FROM documents) tk, unnest(range(1, len(t) + 1)) AS u(i)),"
    + ",".join(
        _bpe_round_ctes(r) for r in range(1, BPE_BUDGET_ROUNDS + 1)
    )
    + ", allt AS ("
    + " UNION ALL ".join(
        f"SELECT {r} AS r, tf FROM top{r}"
        for r in range(1, BPE_BUDGET_ROUNDS + 1)
    )
    + "), minted AS ("
    + " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, pair, tf, df"
        f" FROM top{r}"
        for r in range(1, BPE_BUDGET_ROUNDS + 1)
    )
    + ") SELECT merge_round, pair, tf, df FROM minted t"
    " WHERE NOT EXISTS (SELECT 1 FROM allt s"
    " WHERE s.r <= t.merge_round"
    f" AND s.tf < {_Q179_FLOOR_SQL})"
    " ORDER BY merge_round"
)


def bpe_mint_to_budget(tok, budget, floor_tf, apply_all=False):
    """The budgeted merge loop on a token stream: returns the minted
    (round, pair, tf, df) rules and the final stream, stopping at the
    first round whose best pair's tf falls below floor_tf — and
    SKIPPING the remaining rewrite rounds when it does (the early-out
    is a compute saving, not just a filter). Extracted from q179 so a
    synthetic corpus can exercise both the budget-exhausted and
    floor-fired branches. Training (apply_all=False) skips the rewrite
    only when the BUDGET exhausts (the rule list is the artifact; a
    floor-fired stop still rewrote after its last minted rule, because
    counting the failing round's pairs required it); tokenization
    (apply_all=True, q185) always rewrites through the last minted
    rule — the returned stream is the corpus with every rule applied."""
    minted: list[tuple[int, str, int, int]] = []
    for rnd in range(1, budget + 1):
        rows = _bpe_top1(_bpe_pair_counts(tok)).collect()  # limit(1)
        if not rows or rows[0]["tf"] < floor_tf:
            break  # tf floor: stop minting, skip remaining rewrites
        minted.append(
            (rnd, rows[0]["pair"], int(rows[0]["tf"]), int(rows[0]["df"]))
        )
        if apply_all or rnd < budget:
            a, b = rows[0]["pair"].split(" ", 1)
            tok = eager(_bpe_apply(tok, a, b))
    return minted, tok



@register(
    "q179_bpe_vocab_budget",
    _Q179_SQL,
    doc=f"BPE vocabulary training to a budget: up to {BPE_BUDGET_ROUNDS}"
    " q176-style merge rounds with a tf-floor early-out — training"
    " stops the first round whose best pair's frequency drops below"
    f" greatest(2, n_docs DIV {BPE_TF_FLOOR_DIVISOR}) (every real BPE"
    " trainer's min_frequency rule; a rule rarer than the floor never"
    " amortizes its vocab slot). Each round's winner comes from the"
    " bounded 1-row collect that already parameterizes the rewrite"
    " (q52/q102 rule), so the early-out skips the remaining rewrite"
    " rounds ENTIRELY — the floor is a compute saving at 100 TB, not"
    " just a quality knob. The oracle unrolls all rounds and filters"
    " with the equivalent cumulative NOT EXISTS. Shuffles per emitted"
    " round: one doc_id-keyed window pass + one partial-agg pair"
    " count, identical to q176.",
)
def q179(spark, sf_dir):
    import pyspark.sql.types as _T

    n_docs = table(spark, sf_dir, "documents").count()
    floor_tf = max(2, n_docs // BPE_TF_FLOOR_DIVISOR)
    tok = eager(_bpe_tok0(spark, sf_dir))
    minted, _tok = bpe_mint_to_budget(tok, BPE_BUDGET_ROUNDS, floor_tf)
    schema = _T.StructType(
        [
            _T.StructField("merge_round", _T.LongType()),
            _T.StructField("pair", _T.StringType()),
            _T.StructField("tf", _T.LongType()),
            _T.StructField("df", _T.LongType()),
        ]
    )
    return spark.createDataFrame(minted, schema)


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION — the serving-side half of q179's training:
# the minted vocabulary (up to BPE_BUDGET_ROUNDS rules, tf-floor
# early-out) is applied to the corpus in mint order, greedy
# left-to-right per rule (the q176 window algebra), and the readout is
# the per-document compression the vocabulary bought: token counts
# before/after and the merge count. Unlike training, application
# rewrites through the LAST minted rule. The oracle cannot know the
# minted count k in advance, so its final stream SELECTS among the
# unrolled tok0..tokB streams with cumulative floor guards (tok{r}
# wins iff rounds 1..r all cleared the floor and round r+1 does not) —
# the SQL mirror of the driver-side break.
# ---------------------------------------------------------------------------


def _q185_ok(r: int) -> str:
    return (
        f"EXISTS (SELECT 1 FROM top{r}"
        f" WHERE tf >= {_Q179_FLOOR_SQL})"
    )


def _q185_branch(r: int) -> str:
    conds = [_q185_ok(s) for s in range(1, r + 1)]
    if r < BPE_BUDGET_ROUNDS:
        conds.append(f"NOT ({_q185_ok(r + 1)})")
    return (
        f"SELECT doc_id FROM tok{r} WHERE "
        + " AND ".join(conds or ["true"])
    )


_Q185_SQL = (
    "WITH tok0 AS MATERIALIZED (SELECT doc_id, CAST(u.i AS BIGINT) - 1"
    " AS i, t[u.i] AS tok FROM (SELECT doc_id,"
    f" regexp_extract_all({NORM_SQL_DUCK}, '{_BPE_PATTERN}') AS t"
    " FROM documents) tk, unnest(range(1, len(t) + 1)) AS u(i)),"
    + ",".join(
        _bpe_round_ctes(r) for r in range(1, BPE_BUDGET_ROUNDS + 1)
    )
    + ", cnt0 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok0"
    " FROM tok0 GROUP BY doc_id),"
    " fin AS ("
    + " UNION ALL ".join(
        _q185_branch(r) for r in range(0, BPE_BUDGET_ROUNDS + 1)
    )
    + "), cntk AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok"
    " FROM fin GROUP BY doc_id)"
    " SELECT doc_id, n_tok0, n_tok, n_tok0 - n_tok AS merged"
    " FROM cnt0 JOIN cntk USING (doc_id) ORDER BY doc_id"
)


@register(
    "q185_bpe_tokenize_apply",
    _Q185_SQL,
    doc="BPE tokenizer application (the q179 serving side): the minted"
    " vocabulary is applied to the corpus rule by rule in mint order —"
    " greedy left-to-right via the q176 per-doc window algebra,"
    " rewriting through the LAST rule (training stops one short; the"
    " rule list is its artifact, the tokenized stream is this one's)."
    " Output: per-document token counts before/after and the merge"
    " count the vocabulary bought. The oracle selects among the"
    " unrolled tok0..tok5 streams with cumulative tf-floor guards —"
    " the SQL mirror of the driver-side early-out. Shuffles: one"
    " doc_id-keyed window pass per applied rule + two per-doc count"
    " rollups; everything doc-length-bounded.",
)
def q185(spark, sf_dir):
    n_docs = table(spark, sf_dir, "documents").count()
    floor_tf = max(2, n_docs // BPE_TF_FLOOR_DIVISOR)
    tok0 = eager(_bpe_tok0(spark, sf_dir))
    _minted, tok = bpe_mint_to_budget(
        tok0, BPE_BUDGET_ROUNDS, floor_tf, apply_all=True
    )
    c0 = tok0.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok0")
    )
    ck = tok.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok")
    )
    return (
        c0.join(ck, "doc_id")
        .select(
            "doc_id",
            "n_tok0",
            "n_tok",
            (F.col("n_tok0") - F.col("n_tok")).alias("merged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-12 stage: bigram language-model fit score — the rationalized form
# of CCNet-style perplexity filtering. A real perplexity needs ln(), and
# libm ln differs in the last ulp across engines (the q52/HLL lesson:
# NORM of this file line 247, sketch.py:32), so the score is the mean
# ADD-ONE-SMOOTHED BIGRAM PROBABILITY in e6 integer space instead:
# p(w2|w1) = (c(w1,w2) + 1) * 1e6 DIV (c(w1) + V). Monotone in the same
# direction as negative perplexity for filtering purposes, and every
# step is integer arithmetic — bit-identical on any engine.
# ---------------------------------------------------------------------------


def _bigram_stream(spark, sf_dir):
    """(doc_id, w1, w2) — one row per ADJACENT whitespace-token pair,
    built row-locally by zipping each doc's token array with its own
    tail (the q91 pattern; no self-join, text never shuffles)."""
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    t = F.split(n, " ")
    tl = F.col("t")
    m = F.greatest(F.size(tl) - 1, F.lit(0))
    pairs = F.when(
        F.size(tl) >= 2,
        F.zip_with(
            F.slice(tl, 1, m),
            F.slice(tl, 2, m),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        docs.where(n != "")
        .select("doc_id", t.alias("t"))
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_lm_fit(spark, sf_dir):
    """Per-document bigram language-model fit: train an add-one-smoothed
    bigram LM on the corpus itself, then score every document by the
    mean (and minimum) smoothed transition probability of its adjacent
    token pairs — the quality-filter signal perplexity filtering reads,
    in deterministic e6 integer space (see the block comment above for
    why not ln()). V is the full distinct-token vocabulary, attached as
    a driver-side bounded scalar (the q52 n_docs pattern — never a
    constant-key join, which would plan as BNLJ).

    Scale: bigram construction is row-local; the model tables shuffle on
    token keys with map-side partial aggregation; scoring is ONE
    bigram-keyed shuffle join of the occurrence stream against the model
    (vocab-squared-bounded, so AQE may still broadcast it when small)
    plus one doc_id rollup. No corpus-wide window, no text shuffle.
    Sums are integer so reduction order cannot perturb the result."""
    # three consumers (c12, c1, the scoring join) — eager() or the
    # tokenize+zip+explode corpus pass runs once per consumer (the q33
    # multi-consumer rule; released via queries.release_caches)
    bg = eager(_bigram_stream(spark, sf_dir))
    toks = _tokens(spark, sf_dir)
    v_size = toks.select("token").distinct().count()  # bounded scalar

    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    model = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.expr(f"(c12 + 1) * 1000000 DIV (c1 + {v_size}L)").alias("p_e6"),
    )
    pd_ = bg.join(model, ["w1", "w2"]).groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("p_e6").alias("sum_p"),
        F.min("p_e6").alias("min_p"),
    )
    docs = table(spark, sf_dir, "documents")
    nb = F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(pd_, "doc_id", "left")
        .select(
            "doc_id",
            nb.alias("n_bigrams"),
            F.when(nb == 0, F.lit(0))
            .otherwise(F.expr("sum_p DIV n_bigrams"))
            .cast("long")
            .alias("mean_p_e6"),
            F.coalesce(F.col("min_p"), F.lit(0))
            .cast("long")
            .alias("min_p_e6"),
        )
        .orderBy("doc_id")
    )


def _bigram_lm_oracle() -> str:
    """The DuckDB replay of bigram_lm_fit — drafted with the builder so
    the round-12 registration only wires it up. Both heavy CTEs are
    MATERIALIZED (each is read twice; the round-10 DuckDB
    inline-per-reference lesson)."""
    return (
        "WITH tk AS MATERIALIZED (SELECT doc_id,"
        f" string_split(trim({NORM_SQL_DUCK}), ' ') AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != ''),"
        " bg AS MATERIALIZED (SELECT doc_id, t[u.i] AS w1,"
        " t[u.i + 1] AS w2 FROM tk, unnest(range(1, len(t))) AS u(i)),"
        " c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),"
        " c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),"
        " v AS (SELECT count(DISTINCT tok) AS v FROM"
        " (SELECT unnest(t) AS tok FROM tk)),"
        " model AS (SELECT w1, w2,"
        " (c12 + 1) * 1000000 // (c1 + v.v) AS p_e6"
        " FROM c12 JOIN c1 USING (w1), v),"
        " pd AS (SELECT doc_id, count(*) AS n_bigrams, sum(p_e6) AS s,"
        " min(p_e6) AS min_p FROM bg JOIN model USING (w1, w2)"
        " GROUP BY doc_id)"
        " SELECT d.doc_id,"
        " CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,"
        " CAST(CASE WHEN coalesce(pd.n_bigrams, 0) = 0 THEN 0"
        " ELSE pd.s // pd.n_bigrams END AS BIGINT) AS mean_p_e6,"
        " CAST(coalesce(pd.min_p, 0) AS BIGINT) AS min_p_e6"
        " FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id"
        " ORDER BY d.doc_id"
    )


# q192/q193 register at module end (q193's oracle reads builders
# defined below this point).


# ---------------------------------------------------------------------------
# Round-12 stage: quality-score calibration audit — the q115/q187/q189
# agreement pattern applied to the QUALITY family, which until now had
# two scorers (q25 heuristic signals, q120 hashed-linear classifier)
# and no audit tying them together. Fixed-width score bins (row-local;
# no corpus-wide quantile sort) against mean heuristic signals per bin:
# a learned gate whose high-score bins don't read cleaner on the cheap
# heuristics is miscalibrated or mis-hashed.
# ---------------------------------------------------------------------------

CAL_BIN = 4096  # ~|tokens| x mean|w| per doc spans a handful of bins


def quality_score_calibration(spark, sf_dir):
    """Per q120-score bin: doc count and mean q25 heuristic signals.
    Binning is floor(score / CAL_BIN) spelled as a double floor on BOTH
    engines (scores go negative, and Spark's integer DIV truncates
    toward zero while DuckDB's // floors — the one divergence the
    integer-division convention allows, so it never touches integers
    here). Means are integer DIV over non-negative sums.

    Scale: both inputs are row-local projections (q120's token scoring
    is a broadcast weight join + partial-agg rollup); the calibration
    itself is one doc_id equi-join and a tiny bin-keyed aggregation."""
    pred = q120(spark, sf_dir).select("doc_id", "score")
    heur = q25(spark, sf_dir).select(
        "doc_id", "alpha_pct", "space_pct", "n_tokens"
    )
    b = F.floor(F.col("score") / F.lit(float(CAL_BIN))).cast("long")
    return (
        pred.join(heur, "doc_id")
        .select(
            b.alias("bin"), "alpha_pct", "space_pct", "n_tokens"
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.expr("sum(alpha_pct) DIV count(*)")
            .cast("long")
            .alias("mean_alpha_pct"),
            F.expr("sum(space_pct) DIV count(*)")
            .cast("long")
            .alias("mean_space_pct"),
            F.expr("sum(n_tokens) DIV count(*)")
            .cast("long")
            .alias("mean_tokens"),
        )
        .orderBy("bin")
    )


def _calibration_oracle() -> str:
    """DuckDB replay of quality_score_calibration, drafted with the
    builder (q70-precedent CTE duplication of the q120 chain — both
    built from the same module constants, so they cannot drift
    independently)."""
    return (
        "WITH wt AS (SELECT i AS bucket,"
        f" (i * {_W_MULT}) % {_W_MOD} - {_W_OFF} AS w"
        f" FROM (SELECT unnest(range(0, {VOCAB_BUCKETS})) AS i) t),"
        " tok AS (SELECT doc_id, unnest(string_split(trim("
        + NORM_SQL_DUCK + "), ' ')) AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != ''),"
        " bk AS (SELECT doc_id,"
        f" CAST(('0x'||substr(md5(t),1,4)) AS INT) % {VOCAB_BUCKETS}"
        " AS bucket FROM tok),"
        " sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score"
        " FROM bk JOIN wt USING (bucket) GROUP BY doc_id),"
        " j AS (SELECT CAST(floor(coalesce(sc.score, 0)"
        f" / {CAL_BIN}.0) AS BIGINT) AS bin,"
        " CAST(floor(100.0 * length(regexp_replace(d.text,"
        " '[^A-Za-z]', '', 'g')) / greatest(length(d.text), 1))"
        " AS BIGINT) AS alpha_pct,"
        " CAST(floor(100.0 * (length(d.text)"
        " - length(replace(d.text, ' ', '')))"
        " / greatest(length(d.text), 1)) AS BIGINT) AS space_pct,"
        " " + TOKENS_SQL_DUCK + " AS n_tokens"
        " FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)"
        " SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(sum(alpha_pct) // count(*) AS BIGINT) AS mean_alpha_pct,"
        " CAST(sum(space_pct) // count(*) AS BIGINT) AS mean_space_pct,"
        " CAST(sum(n_tokens) // count(*) AS BIGINT) AS mean_tokens"
        " FROM j GROUP BY bin ORDER BY bin"
    )


@register(
    "q192_bigram_lm_fit",
    _bigram_lm_oracle(),
    doc="Per-document bigram language-model fit score — the"
    " perplexity-filter signal: an add-one-smoothed bigram LM trains"
    " on the corpus itself, then every document reports the mean and"
    " minimum smoothed transition probability of its adjacent token"
    " pairs, in deterministic e6 integer space (ln() would float-drift"
    " across engines; the monotone integer ratio ranks identically)."
    " V attaches as a driver-side bounded scalar (the q52 pattern —"
    " never a constant-key join). Bigram construction is row-local;"
    " model tables shuffle on token keys with map-side combine;"
    " scoring is one bigram-keyed join plus a doc_id rollup."
    " Staged-probe exponents: 8x ratio 1.8x, 16x->32x disjoint -0.02,"
    " verbatim 0.41 (SCALE.md staged tail).",
)
def q192(spark, sf_dir):
    return bigram_lm_fit(spark, sf_dir)


@register(
    "q193_quality_calibration",
    _calibration_oracle(),
    doc="Quality-score calibration audit — the q115/q187/q189 agreement"
    " pattern applied to the QUALITY family: per q120"
    " hashed-linear-classifier score bin (fixed width, floor(score /"
    f" {CAL_BIN}) as a double floor on both engines since scores go"
    " negative and Spark DIV truncates toward zero while DuckDB //"
    " floors), the doc count and mean q25 heuristic signals. A learned"
    " gate whose high-score bins don't read cleaner on the cheap"
    " heuristics is miscalibrated or mis-hashed. Both inputs are"
    " row-local projections; the calibration is one doc_id equi-join"
    " and a tiny bin-keyed aggregation. Staged-probe 8x ratio 1.0x.",
)
def q193(spark, sf_dir):
    return quality_score_calibration(spark, sf_dir)


# ---------------------------------------------------------------------------
# Round-13 stage: DSIR-style hashed importance weights (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling" —
# public). The practical recipe: hash n-gram features into B buckets,
# fit target vs raw bucket distributions, and weight every document by
# how much more target-like its features are. The paper's log-ratio sum
# needs ln() (libm last-ulp drift across engines — the q192 lesson), so
# the score is the integer-exact probability-DIFFERENCE sum instead:
# score = sum over the doc's hashed-bigram occurrences of
# (pt_e6(b) - pr_e6(b)), each side add-one smoothed ppm. Monotone in
# the same direction for selection purposes, bit-identical anywhere.
# Target domain = the alphabetically-first source (a driver-bounded
# 1-row scalar, the q52 pattern) — the "select web data that looks like
# wikipedia" shape.
# ---------------------------------------------------------------------------


def _bigram_bucket_expr(engine: str, w1: str = "w1", w2: str = "w2") -> str:
    """Hashed bigram feature bucket, q120's md5 hashing convention."""
    if engine == "spark":
        return (
            f"CAST(conv(substr(md5(concat({w1}, ' ', {w2})), 1, 4),"
            f" 16, 10) AS INT) % {VOCAB_BUCKETS}"
        )
    return (
        f"CAST(('0x' || substr(md5({w1} || ' ' || {w2}), 1, 4)) AS INT)"
        f" % {VOCAB_BUCKETS}"
    )


def dsir_importance_weights(spark, sf_dir):
    """(doc_id, n_bigrams, dsir_e6, target_like) — the importance-
    resampling signal: per document, the sum over its hashed-bigram
    occurrences of (target ppm - raw ppm), add-one smoothed; positive
    means the doc's feature mass looks more like the target domain
    than the rest of the corpus. Documents without bigrams score 0.

    Scale: the bigram->bucket stream is row-local; ONE bucket-keyed
    partial aggregation fits both distributions (conditional sums);
    the <= VOCAB_BUCKETS model broadcasts back onto the stream; one
    doc_id rollup. Corpus sizes Nt/Nr attach as driver-bounded 1-row
    scalars; integer sums are order-free."""
    docs = spread(spark, table(spark, sf_dir, "documents"))
    tgt_src = (
        table(spark, sf_dir, "documents")
        .agg(F.min("source"))
        .collect()[0][0]
    )  # bounded scalar: the target-domain label
    n = F.trim(norm_text())
    t = F.split(n, " ")
    tl = F.col("t")
    m = F.greatest(F.size(tl) - 1, F.lit(0))
    pairs = F.when(
        F.size(tl) >= 2,
        F.zip_with(
            F.slice(tl, 1, m),
            F.slice(tl, 2, m),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bk = eager(
        docs.where(n != "")
        .select(
            "doc_id",
            (F.col("source") == F.lit(tgt_src)).alias("is_tgt"),
            t.alias("t"),
        )
        .select("doc_id", "is_tgt", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            "is_tgt",
            F.expr(
                _bigram_bucket_expr("spark", "p.w1", "p.w2")
            ).alias("bucket"),
        )
    )
    tot = bk.agg(
        F.sum(F.col("is_tgt").cast("long")),
        F.sum((~F.col("is_tgt")).cast("long")),
    ).collect()[0]
    nt, nr = int(tot[0] or 0), int(tot[1] or 0)
    model = bk.groupBy("bucket").agg(
        F.sum(F.col("is_tgt").cast("long")).alias("ct"),
        F.sum((~F.col("is_tgt")).cast("long")).alias("cr"),
    )
    diff = model.select(
        "bucket",
        (
            F.expr(f"(ct + 1) * 1000000 DIV {nt + VOCAB_BUCKETS}L")
            - F.expr(f"(cr + 1) * 1000000 DIV {nr + VOCAB_BUCKETS}L")
        ).alias("d_e6"),
    )
    pd_ = bk.join(diff, "bucket").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("d_e6").cast("long").alias("dsir_e6"),
    )
    base = table(spark, sf_dir, "documents").select("doc_id")
    return (
        base.join(pd_, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("long")
            .alias("n_bigrams"),
            F.coalesce(F.col("dsir_e6"), F.lit(0))
            .cast("long")
            .alias("dsir_e6"),
            (F.coalesce(F.col("dsir_e6"), F.lit(0)) > 0).alias(
                "target_like"
            ),
        )
        .orderBy("doc_id")
    )


def _dsir_oracle() -> str:
    """DuckDB replay of dsir_importance_weights, drafted with the
    builder (round-13 registration wires it up). The bucket stream CTE
    is MATERIALIZED: the totals, the model, and the scoring join all
    read it."""
    bucket = _bigram_bucket_expr("duck", "w1", "w2")
    return (
        "WITH tgt AS (SELECT min(source) AS s FROM documents),"
        " tk AS (SELECT doc_id, source,"
        f" string_split(trim({NORM_SQL_DUCK}), ' ') AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != ''),"
        " bgw AS (SELECT doc_id, source, t[u.i] AS w1, t[u.i + 1] AS w2"
        " FROM tk, unnest(range(1, len(t))) AS u(i)),"
        " bk AS MATERIALIZED (SELECT doc_id,"
        " source = (SELECT s FROM tgt) AS is_tgt,"
        f" {bucket} AS bucket FROM bgw),"
        " nn AS (SELECT sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS nt,"
        " sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS nr FROM bk),"
        " m AS (SELECT bucket,"
        " sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct,"
        " sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS cr"
        " FROM bk GROUP BY bucket),"
        " d AS (SELECT bucket,"
        f" (ct + 1) * 1000000 // (nn.nt + {VOCAB_BUCKETS})"
        f" - (cr + 1) * 1000000 // (nn.nr + {VOCAB_BUCKETS}) AS d_e6"
        " FROM m, nn),"
        " pd AS (SELECT doc_id, count(*) AS n_bigrams,"
        " sum(d_e6) AS dsir FROM bk JOIN d USING (bucket)"
        " GROUP BY doc_id)"
        " SELECT doc.doc_id,"
        " CAST(coalesce(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,"
        " CAST(coalesce(pd.dsir, 0) AS BIGINT) AS dsir_e6,"
        " coalesce(pd.dsir, 0) > 0 AS target_like"
        " FROM documents doc LEFT JOIN pd ON doc.doc_id = pd.doc_id"
        " ORDER BY doc.doc_id"
    )


# ---------------------------------------------------------------------------
# Round-13 stage: intra-document repetition-removal audit — the
# RefinedWeb/Gopher "remove repeated spans" trimming signal, exactly
# defined: a token is REMOVABLE iff it is covered by some 3-gram
# occurrence whose gram already appeared EARLIER in the same document
# (first occurrences always survive). The audit reports how much of
# each document that rule would strip — chat boilerplate and lyrics
# score high, prose near zero.
# ---------------------------------------------------------------------------

REP_GRAM = 3


def repetition_removal_audit(spark, sf_dir):
    """(doc_id, n_tokens, n_removed, removed_ppm): per document, the
    token count, the number of token positions covered by REPEATED
    3-gram occurrences (gram seen earlier in the same doc), and the
    integer ppm share.

    Scale: gram starts enumerate row-locally (one array transform per
    doc); first-occurrence detection is a (doc_id, gram) window over
    doc-bounded groups; interval-union length is the gaps-and-islands
    running-max window per doc ordered by start (explicit ROWS frame on
    both engines — starts are unique per doc so ordering is total).
    Document text never shuffles; the wide keys are (doc_id, gram) and
    doc_id."""
    docs = spread(spark, table(spark, sf_dir, "documents"))
    n = F.trim(norm_text())
    t = F.split(n, " ")
    # Guard the enumeration: sequence(1, 0) steps DOWN to [1, 0] (Spark
    # defaults to step -1 when start > stop), so a <3-token doc would
    # index element_at(t, 0) and throw. The oracle's range(1, ...) is
    # empty for the same doc — the CASE keeps both engines at array().
    grams = F.expr(
        f"CASE WHEN size(t) >= {REP_GRAM} THEN"
        f" transform(sequence(1, size(t) - {REP_GRAM - 1}),"
        " i -> struct(i AS s, concat_ws(' ', element_at(t, i),"
        " element_at(t, i + 1), element_at(t, i + 2)) AS g))"
        " ELSE CAST(array() AS array<struct<s:int,g:string>>) END"
    )
    occ = (
        docs.where(n != "")
        .select("doc_id", F.size(t).alias("n_tokens"), t.alias("t"))
        .select("doc_id", "n_tokens", F.explode(grams).alias("o"))
        .select(
            "doc_id", "n_tokens", F.col("o.s").alias("s"), F.col("o.g").alias("g")
        )
    )
    wg = Window.partitionBy("doc_id", "g")
    rep = occ.withColumn("fs", F.min("s").over(wg)).where(
        F.col("s") > F.col("fs")
    )
    wd = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    add = F.greatest(
        F.lit(0),
        F.col("s")
        + F.lit(REP_GRAM - 1)
        - F.greatest(
            F.col("s"),
            F.coalesce(F.max(F.col("s") + REP_GRAM - 1).over(wd), F.lit(0))
            + 1,
        )
        + 1,
    )
    pd_ = (
        rep.select("doc_id", add.alias("add"))
        .groupBy("doc_id")
        .agg(F.sum("add").cast("long").alias("n_removed"))
    )
    base = docs.select(
        "doc_id",
        F.when(n != "", F.size(t)).otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        base.join(pd_, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_removed"), F.lit(0))
            .cast("long")
            .alias("n_removed"),
            F.expr(
                "coalesce(n_removed, 0) * 1000000"
                " DIV greatest(n_tokens, 1)"
            )
            .cast("long")
            .alias("removed_ppm"),
        )
        .orderBy("doc_id")
    )


def _repetition_oracle() -> str:
    """DuckDB replay of repetition_removal_audit, drafted with the
    builder (round-13 registration wires it up): same 1-based gram
    starts, same first-occurrence rule, same running-max interval
    union with an explicit ROWS frame."""
    return (
        "WITH tk AS (SELECT doc_id,"
        f" string_split(trim({NORM_SQL_DUCK}), ' ') AS t FROM documents"
        f" WHERE trim({NORM_SQL_DUCK}) != ''),"
        " occ AS MATERIALIZED (SELECT doc_id, len(t) AS n_tokens,"
        " u.i AS s, t[u.i] || ' ' || t[u.i + 1] || ' ' || t[u.i + 2] AS g"
        f" FROM tk, unnest(range(1, greatest(len(t) - {REP_GRAM - 1}, 0)"
        " + 1)) AS u(i)),"
        " rep AS (SELECT doc_id, n_tokens, s FROM (SELECT *,"
        " min(s) OVER (PARTITION BY doc_id, g) AS fs FROM occ)"
        " WHERE s > fs),"
        " cov AS (SELECT doc_id, s,"
        f" greatest(0, s + {REP_GRAM - 1} - greatest(s,"
        f" coalesce(max(s + {REP_GRAM - 1}) OVER (PARTITION BY doc_id"
        " ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),"
        " 0) + 1) + 1) AS add FROM rep),"
        " pd AS (SELECT doc_id,"
        " CAST(sum(add) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id),"
        " base AS (SELECT doc_id,"
        f" CASE WHEN trim({NORM_SQL_DUCK}) = '' THEN 0"
        f" ELSE len(string_split(trim({NORM_SQL_DUCK}), ' ')) END"
        " AS n_tokens FROM documents)"
        " SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,"
        " CAST(coalesce(pd.n_removed, 0) AS BIGINT) AS n_removed,"
        " CAST(coalesce(pd.n_removed, 0) * 1000000"
        " // greatest(b.n_tokens, 1) AS BIGINT) AS removed_ppm"
        " FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id"
        " ORDER BY b.doc_id"
    )


@register(
    "q200_dsir_importance_weights",
    _dsir_oracle(),
    doc="DSIR-style hashed importance-resampling weights (Xie et al."
    " 2023, public): hash every document's adjacent-token bigrams into"
    f" {VOCAB_BUCKETS} md5 buckets, fit add-one-smoothed target vs raw"
    " ppm distributions over ONE bucket-keyed partial aggregation, and"
    " score each document by the integer-exact probability-DIFFERENCE"
    " sum of its bucket stream (the paper's log-ratio needs ln() —"
    " libm last-ulp drift across engines, the q192 lesson; the"
    " difference is monotone for selection and bit-identical anywhere)."
    " Target domain = the alphabetically-first source, attached as a"
    " driver-bounded scalar (q52 pattern — never a constant-key join);"
    " the <= bucket-count model broadcasts back onto the stream; corpus"
    " text never shuffles. Staged-probe 8x ratio 1.2x, 16x->32x"
    " disjoint -0.25 / verbatim -0.24 (SCALE.md staged tables).",
)
def q200(spark, sf_dir):
    return dsir_importance_weights(spark, sf_dir)


@register(
    "q201_repetition_removal_audit",
    _repetition_oracle(),
    doc="Intra-document repetition-removal audit — the RefinedWeb/"
    "Gopher repeated-span trimming signal, exactly defined: a token is"
    f" REMOVABLE iff covered by a {REP_GRAM}-gram occurrence whose gram"
    " already appeared earlier in the same document (first occurrences"
    " survive); reports per-doc token count, removable-token count, and"
    " integer ppm share. Gram starts enumerate row-locally behind a"
    " size guard (a doc shorter than the gram width reports zero — the"
    " round-13 ADVICE fix; Spark's sequence() steps DOWN when start >"
    " stop); first-occurrence detection is a (doc_id, gram) window;"
    " coverage is the gaps-and-islands running-max union per doc with"
    " an explicit ROWS frame on both engines. Document text never"
    " shuffles — the wide keys are (doc_id, gram) and doc_id."
    " Staged-probe 8x ratio 1.1x, 16x->32x disjoint 0.43 / verbatim"
    " -0.13 (SCALE.md staged tables).",
)
def q201(spark, sf_dir):
    return repetition_removal_audit(spark, sf_dir)
