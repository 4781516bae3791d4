"""JSONL (newline-delimited JSON) document source — the lingua franca of
training-data interchange (web-crawl dumps, exported corpora, eval sets).

No reference analog (the reference moves SQL tables); this feeds external
corpora into the same pipeline operators the parquet tables use.

Scale notes (100 TB):
- The schema is DECLARED, never inferred: schema inference reads the
  whole input once before the real job (a full extra 100 TB pass) and
  silently unions divergent per-file shapes. A fixed schema makes the
  read single-pass and the output shape stable across reprocessing.
- Malformed lines are quarantined, not fatal: the file is read as TEXT
  and parsed with ``from_json`` — a malformed line yields a NULL struct
  while its raw text stays in hand, so rejects keep their original
  bytes for inspection without the corrupt-column-only query
  restriction (and without caching the scan). A multi-TB crawl ALWAYS
  has some broken lines — failing the job on the first one is not an
  option, and dropping them silently corrupts corpus accounting.
- JSON text decoding parallelizes per file split like any text source;
  downstream operators see the same (doc_id, text, lang, source,
  n_chars) shape as the parquet `documents` table, so every registered
  operator runs on JSONL corpora unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The canonical documents shape (TESTDATA.md), as an explicit schema.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

def clean_line_ok():
    """THE clean-line rule, shared by the batch reader, the streaming
    ingest, and the q82 audit: a line is clean only if it parsed AND
    carries the required id/text fields (parsed-but-incomplete rows are
    rejects too — they would otherwise vanish from corpus accounting).
    A function, not a module-level Column — building a Column needs an
    active SparkContext."""
    return (
        F.col("d").isNotNull()
        & F.col("d.doc_id").isNotNull()
        & F.col("d.text").isNotNull()
    )


def parse_lines(lines: DataFrame) -> DataFrame:
    """Attach the declared-schema parse + clean flag to a text scan
    (batch or streaming): (raw_line, d struct, ok). One definition so
    the batch and streaming readers cannot drift apart."""
    return lines.select(
        F.col("value").alias("raw_line"),
        F.from_json("value", DOCUMENTS_SCHEMA).alias("d"),
    ).withColumn("ok", clean_line_ok())


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the canonical documents shape.

    Returns ``(docs, rejects)``: clean rows with ``n_chars`` derived
    (matching the parquet table's column), and the quarantined raw lines
    for accounting. Both are lazy single-pass plans over the same text
    scan, classified by the shared ``clean_line_ok`` rule.
    """
    parsed = parse_lines(spark.read.text(path))
    clean = (
        parsed.where("ok")
        .select("d.*")
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    rejects = parsed.where(~F.col("ok")).select("raw_line")
    return clean, rejects
