"""Post-copy verification: row-count reconciliation (the reference's check,
reference: client/SmartBulkCopy.cs:296-339) plus a strictly stronger
order-insensitive content hash (SURVEY Q20).

The hash is computed entirely JVM-side: xxhash64 across all columns per
row, combined with the commutative/associative BIT_XOR aggregate — one
map-side-combinable aggregation, no shuffle of data rows, no collect of
anything but a single row. At 100 TB this runs at scan speed.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def content_fingerprint(df: DataFrame) -> tuple[int, int]:
    """(row_count, xor-of-row-hashes). Column order is normalized so two
    DataFrames with the same set-of-rows fingerprint identically."""
    cols = sorted(df.columns)
    hashed = df.select(F.xxhash64(*cols).alias("h"))
    row = hashed.agg(
        F.count("*").alias("c"), F.expr("bit_xor(h)").alias("x")
    ).first()
    return int(row["c"]), int(row["x"] if row["x"] is not None else 0)


@dataclass
class TableCheck:
    table: str
    source_rows: int
    destination_rows: int
    source_hash: int | None = None
    destination_hash: int | None = None

    @property
    def rows_match(self) -> bool:
        return self.source_rows == self.destination_rows

    @property
    def content_match(self) -> bool:
        if self.source_hash is None or self.destination_hash is None:
            return self.rows_match
        return self.rows_match and self.source_hash == self.destination_hash


def check_copy(
    source_df: DataFrame,
    destination_df: DataFrame,
    table: str,
    with_hash: bool = True,
) -> TableCheck:
    if with_hash:
        sc, sh = content_fingerprint(source_df)
        dc, dh = content_fingerprint(destination_df)
        return TableCheck(table, sc, dc, sh, dh)
    return TableCheck(table, source_df.count(), destination_df.count())
