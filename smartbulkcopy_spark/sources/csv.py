"""CSV document source — the other interchange format corpora arrive in
(catalog exports, spreadsheet-era datasets, labeling-tool dumps).

No reference analog (the reference moves SQL tables); mirrors the JSONL
source's contract (`sources/jsonl.py`): declared schema, single-pass
text scan, malformed rows quarantined with their raw bytes.

Scale notes (100 TB):
- Schema DECLARED, never inferred — inference costs a full extra pass
  and unions divergent per-file shapes (same rule as JSONL).
- The file is read as TEXT and parsed with ``from_csv`` per line, so a
  malformed row (unparseable id, missing required fields) keeps its raw
  line for quarantine accounting instead of failing the job or
  vanishing. PERMISSIVE parsing nulls bad fields; the required-field
  check classifies those rows as rejects.
- Line-based parsing means embedded NEWLINES inside quoted fields are
  not supported (that variant needs Spark's multiLine CSV reader, which
  gives up per-line quarantine and splits per FILE, not per block — the
  wrong trade for 100 TB of many-line files). Quoted separators and
  escaped quotes within a line parse fine.
- Header lines are recognized by exact match against the declared
  column list and dropped — not counted as rejects — so per-file
  headers survive concatenated/globbed reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from smartbulkcopy_spark.sources.jsonl import DOCUMENTS_SCHEMA

_DDL = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in DOCUMENTS_SCHEMA)


def read_documents_csv(
    spark: SparkSession, path: str, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus into the canonical documents shape.

    Returns ``(docs, rejects)`` exactly like ``read_documents_jsonl``:
    clean rows with ``n_chars`` derived, rejects as raw lines. A row is
    clean only if it parsed AND carries doc_id + text.
    """
    header = sep.join(f.name for f in DOCUMENTS_SCHEMA)
    parsed = (
        spark.read.text(path)
        .where(F.col("value") != header)
        .select(
            F.col("value").alias("raw_line"),
            F.from_csv("value", _DDL, {"sep": sep}).alias("d"),
        )
    )
    ok = (
        F.col("d").isNotNull()
        & F.col("d.doc_id").isNotNull()
        & F.col("d.text").isNotNull()
    )
    clean = (
        parsed.where(ok)
        .select("d.*")
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    rejects = parsed.where(~ok).select("raw_line")
    return clean, rejects
