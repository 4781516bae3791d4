"""Streaming corpus ingestion: the path a 100 TB training corpus actually
arrives through — JSONL files landing continuously, read as a Structured
Stream, parsed against the DECLARED schema, malformed lines quarantined
with their raw bytes, and each micro-batch exact-deduplicated against the
already-ingested corpus before it is appended.

The reference's only "continuous" surface is the monitor polling loop
(reference: client/SmartBulkCopy.cs:665-766); the batch half of this
contract is `sources/jsonl.py` (same schema, same reject rule) and the
batch-vs-index incremental dedup is q63 — this module is the readStream
composition of the two.

Scale notes (100 TB):
- File-source micro-batches map 1:1 onto landing files; the declared
  schema keeps the stream single-pass (inference is impossible on a
  stream anyway), and `maxFilesPerTrigger` bounds per-batch memory.
- The dedup join is NEW-BATCH x INDEX on the 16-byte content
  fingerprint: the index side is an id+fingerprint projection of the
  ingested corpus (columnar scan reads two columns, never text), the
  batch side is micro-batch-sized, so the whole corpus is never
  re-shuffled per batch — the q63 shape, continuously.
- Restart safety is two-layered: the stream checkpoint makes file
  delivery exactly-once, and the fingerprint anti-join makes ingestion
  idempotent even under a LOST checkpoint (re-delivered documents land
  in the index as no-ops) — the same staged-idempotency stance as the
  copy path's staging commit (sources/jdbc.py).
- Quarantined lines carry their raw bytes + arrival batch id, so corpus
  accounting (lines in = clean + rejected) holds across restarts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException
from pyspark.sql.window import Window

from smartbulkcopy_spark.pipeline.text import norm_text
from smartbulkcopy_spark.queries import register, table
from smartbulkcopy_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    clean_line_ok,
    parse_lines,
)

# The classify rule is LITERALLY the batch reader's (one definition in
# sources/jsonl.py — the two paths cannot drift apart).
required_ok = clean_line_ok


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Open a JSONL corpus directory as a stream of parsed lines.

    Returns the raw+parsed shape (raw_line, d struct, ok flag) via the
    SAME ``parse_lines`` the batch reader uses — one text scan, schema
    declared, nothing inferred."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_lines(reader.text(path))


def _existing_fingerprints(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The ingested corpus's fingerprint index, or None before first
    append. Columnar projection: reads one 16-byte column, never text.
    Probed THROUGH Spark (not the driver's local filesystem) so the
    index is found on any supported store (HDFS/S3/local alike); only
    a missing/empty destination reads as None."""
    try:
        return spark.read.parquet(out_dir).select("fingerprint")
    except AnalysisException:
        return None


def run_corpus_ingest(
    spark: SparkSession,
    in_path: str,
    out_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Ingest everything currently in `in_path` (availableNow trigger):
    per micro-batch, quarantine rejects, exact-dedup clean docs within
    the batch (keep-first by doc_id) and against the ingested index,
    then append the survivors. Blocks until the backlog drains."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        parsed = batch_df.select(
            F.col("raw_line"),
            F.from_json("raw_line", DOCUMENTS_SCHEMA).alias("d"),
        ).withColumn("ok", clean_line_ok())
        rejects = parsed.where(~F.col("ok")).select("raw_line")
        # dynamic overwrite of THIS batch's partition: a replayed batch
        # (failure after the quarantine write but before the clean
        # append) rewrites its own rejects instead of appending them a
        # second time — the accounting identity survives restarts.
        (
            rejects.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(quarantine_dir)
        )
        clean = (
            parsed.where("ok")
            .select("d.*")
            .withColumn("n_chars", F.length("text").cast("long"))
            .withColumn("fingerprint", F.md5(norm_text()))
        )
        # within-batch keep-first: exactly ONE survivor per fingerprint
        # (min doc_id, then full-row order for determinism). A rank, not
        # a (fingerprint, doc_id) semi-join: the semi-join spelling
        # keeps BOTH copies of a literally-duplicated line (same id,
        # same text, twice in one landing file). Partitions are
        # duplicate-family-sized, never the corpus.
        wr = Window.partitionBy("fingerprint").orderBy(
            "doc_id", "text", "lang", "source"
        )
        fresh = (
            clean.withColumn("rn", F.row_number().over(wr))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        index = _existing_fingerprints(spark, out_dir)
        if index is not None:
            fresh = fresh.join(index, "fingerprint", "left_anti")
        fresh.write.mode("append").parquet(out_dir)

    stream = read_documents_stream(spark, in_path, max_files_per_trigger)
    q = (
        stream.select("raw_line")
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# q82: the ingest-quarantine accounting contract as a registered, oracle-
# checked query. The driver grades queries over the parquet tables, so the
# JSONL wire format is produced INSIDE the query: each document row is
# serialized to a JSON line (per-engine serialization — never compared
# across engines), a deterministic subset is corrupted (doc_id % 97 == 0:
# truncated mid-object -> malformed; % 97 == 1: serialized without the
# required text field -> parsed-but-incomplete), and the lines are pushed
# back through the REAL parse-and-classify rule the batch and streaming
# readers share. The audit row is the accounting identity every ingest
# run must satisfy: n_lines = n_clean + n_malformed + n_incomplete.
# ---------------------------------------------------------------------------


@register(
    "q82_jsonl_ingest_audit",
# to_json returns JSON-typed values; the casts keep the corrupted line
# VARCHAR (a CASE unifying VARCHAR with JSON coerces back to JSON and
# THROWS on the deliberately-truncated arm).
    "WITH l AS (SELECT doc_id % 97 AS m,"
    " CAST(to_json(struct_pack(doc_id := doc_id, text := text,"
    " lang := lang, source := source)) AS VARCHAR) AS line,"
    " CAST(to_json(struct_pack(doc_id := doc_id, lang := lang,"
    " source := source)) AS VARCHAR) AS line_no_text FROM documents),"
    " j AS (SELECT CASE WHEN m = 0 THEN substr(line, 1, length(line) - 1)"
    " WHEN m = 1 THEN line_no_text ELSE line END AS s FROM l),"
    # json_extract_string THROWS on invalid JSON (it does not return
    # NULL), so the extraction argument is guarded to '{}' for invalid
    # lines — the CASE arms for those rows never read the extraction.
    " p AS (SELECT CASE WHEN NOT json_valid(s) THEN 'malformed'"
    " WHEN json_extract_string(CASE WHEN json_valid(s) THEN s"
    " ELSE '{}' END, '$.doc_id') IS NULL"
    " OR json_extract_string(CASE WHEN json_valid(s) THEN s"
    " ELSE '{}' END, '$.text') IS NULL THEN 'incomplete'"
    " ELSE 'clean' END AS klass FROM j)"
    " SELECT CAST(count(*) AS BIGINT) AS n_lines,"
    " CAST(sum(CASE WHEN klass = 'clean' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_clean,"
    " CAST(sum(CASE WHEN klass = 'malformed' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_malformed,"
    " CAST(sum(CASE WHEN klass = 'incomplete' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_incomplete FROM p",
    doc="Ingest-quarantine accounting audit: serialize each document to a"
    " JSON line, corrupt a deterministic subset (truncation -> malformed;"
    " missing required field -> incomplete), re-parse through the shared"
    " reader classification, and report the accounting identity"
    " n_lines = n_clean + n_malformed + n_incomplete. Row-local"
    " serialize/parse + one global count — zero shuffle beyond the"
    " single-row aggregate; the same classify rule `sources/jsonl.py`"
    " and the streaming ingest apply to real corpora.",
)
def q82(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "text", "lang", "source"))
    line_no_text = F.to_json(F.struct("doc_id", "lang", "source"))
    m = F.col("doc_id") % 97
    s = (
        F.when(
            F.col("m") == 0, F.expr("substring(line, 1, length(line) - 1)")
        )
        .when(F.col("m") == 1, F.col("line_no_text"))
        .otherwise(F.col("line"))
    )
    # PERMISSIVE from_json does NOT null the struct on malformed input —
    # it nulls the FIELDS — so malformed vs parsed-but-incomplete needs
    # the corrupt-record column idiom: a _corrupt field in the parse
    # schema captures the raw line iff parsing failed.
    parse_schema = T.StructType(
        [*DOCUMENTS_SCHEMA.fields, T.StructField("_corrupt", T.StringType())]
    )
    parsed = (
        docs.select(
            m.alias("m"),
            line.alias("line"),
            line_no_text.alias("line_no_text"),
        )
        .select(s.alias("s"))
        .select(
            F.from_json(
                "s",
                parse_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
            ).alias("d")
        )
        .select(
            F.when(
                F.col("d").isNull() | F.col("d._corrupt").isNotNull(),
                "malformed",
            )
            .when(
                F.col("d.doc_id").isNull() | F.col("d.text").isNull(),
                "incomplete",
            )
            .otherwise("clean")
            .alias("klass")
        )
    )
    k = F.col("klass")
    return parsed.agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(k == "clean", 1).otherwise(0))
        .cast("bigint")
        .alias("n_clean"),
        F.sum(F.when(k == "malformed", 1).otherwise(0))
        .cast("bigint")
        .alias("n_malformed"),
        F.sum(F.when(k == "incomplete", 1).otherwise(0))
        .cast("bigint")
        .alias("n_incomplete"),
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff. Every recurring crawl/ingest produces "this
# week's corpus" next to last week's, and the first operational
# question is churn: what was added, what vanished, what changed in
# place. The diff is a full-outer join on doc_id comparing content
# fingerprints — id-and-hash only, text never shuffles. The fixture has
# a single snapshot, so snapshot B derives deterministically from A
# (drop doc_id%17 = deletions, append a marker to doc_id%13 = edits,
# re-key doc_id%19 into a new id range = additions) — the OPERATOR
# under test is the diff/rollup, which sees B only as a table.
# ---------------------------------------------------------------------------

_DIFF_ADD_OFFSET = 10_000_000


@register(
    "q150_snapshot_diff_audit",
    "WITH a AS (SELECT doc_id, source, md5(coalesce(text, '')) AS fp"
    " FROM documents),"
    " surv AS (SELECT doc_id, source,"
    " CASE WHEN doc_id % 13 = 0 THEN md5(coalesce(text, '') || ' v2')"
    " ELSE md5(coalesce(text, '')) END AS fp"
    " FROM documents WHERE doc_id % 17 != 0),"
    f" adds AS (SELECT doc_id + {_DIFF_ADD_OFFSET} AS doc_id, source,"
    " md5('new ' || coalesce(text, '')) AS fp FROM documents"
    " WHERE doc_id % 19 = 0),"
    " b AS (SELECT * FROM surv UNION ALL SELECT * FROM adds),"
    " d AS (SELECT coalesce(a.source, b.source) AS source,"
    " CASE WHEN b.doc_id IS NULL THEN 'removed'"
    " WHEN a.doc_id IS NULL THEN 'added'"
    " WHEN a.fp != b.fp THEN 'modified' ELSE 'unchanged' END AS st"
    " FROM a FULL OUTER JOIN b ON b.doc_id = a.doc_id)"
    " SELECT source,"
    " CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_unchanged,"
    " CAST(sum(CASE WHEN st = 'modified' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_modified,"
    " CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_removed,"
    " CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT)"
    " AS n_added,"
    " CAST(1000000 * sum(CASE WHEN st != 'unchanged' THEN 1 ELSE 0 END)"
    " // greatest(sum(CASE WHEN st != 'added' THEN 1 ELSE 0 END), 1)"
    " AS BIGINT) AS churn_ppm"
    " FROM d GROUP BY source ORDER BY source",
    doc="Corpus snapshot diff: full-outer join of two snapshots on"
    " doc_id comparing md5 content fingerprints, rolled up per source"
    " into unchanged/modified/removed/added counts + churn ppm (churn"
    " over the OLD snapshot's mass). Only (id, source, 16-byte hash)"
    " ever shuffles — text stays in the scan stage. Snapshot B is a"
    " deterministic transform of A (modulo-keyed deletions, edits,"
    " re-keyed additions); the diff operator sees it only as a table.",
)
def q150(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    a = docs.select("doc_id", "source", fp.alias("fp"))
    surv = docs.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.md5(F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" v2"))),
        )
        .otherwise(fp)
        .alias("fp"),
    )
    adds = docs.where(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + _DIFF_ADD_OFFSET).alias("doc_id"),
        "source",
        F.md5(
            F.concat(F.lit("new "), F.coalesce(F.col("text"), F.lit("")))
        ).alias("fp"),
    )
    b = surv.unionByName(adds)
    aa = a.select(
        F.col("doc_id").alias("a_id"),
        F.col("source").alias("a_source"),
        F.col("fp").alias("a_fp"),
    )
    bb = b.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("b_source"),
        F.col("fp").alias("b_fp"),
    )
    d = aa.join(bb, aa.a_id == bb.b_id, "full_outer").select(
        F.coalesce("a_source", "b_source").alias("source"),
        F.when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("a_fp") != F.col("b_fp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("st"),
    )

    def n(st):
        return (
            F.sum(F.when(F.col("st") == st, 1).otherwise(0))
            .cast("long")
            .alias(f"n_{st}")
        )

    return (
        d.groupBy("source")
        .agg(
            n("unchanged"),
            n("modified"),
            n("removed"),
            n("added"),
            F.sum(F.when(F.col("st") != "unchanged", 1).otherwise(0))
            .cast("long")
            .alias("_churned"),
            F.sum(F.when(F.col("st") != "added", 1).otherwise(0))
            .cast("long")
            .alias("_old_mass"),
        )
        .select(
            "source",
            "n_unchanged",
            "n_modified",
            "n_removed",
            "n_added",
            F.expr("1000000 * _churned DIV greatest(_old_mass, 1L)")
            .cast("long")
            .alias("churn_ppm"),
        )
        .orderBy("source")
    )
