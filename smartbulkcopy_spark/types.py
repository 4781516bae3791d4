"""SQL Server -> Spark type-mapping policy (SURVEY §7.3 declared risk
area: TIME(7) / DATETIMEOFFSET / DATETIME2(7) precision and CLR types).

The reference never converts values — SqlBulkCopy moves native bytes —
so its only type logic is exclusion (rowversion 189 and column sets,
reference: client/TableInfoCollector.cs:159-160, 407). A Spark engine
DOES convert (JDBC driver -> Catalyst row), so every SQL Server type
needs a declared Spark target and an honest statement of what, if
anything, is lost:

- DATETIME2(7) carries 100 ns ticks; Spark timestamps are microsecond —
  sub-microsecond digits TRUNCATE (documented, `lossless=False`).
- TIME(n): Spark has no TIME type. Policy: STRING (ISO-8601 text) —
  lossless and portable, at the cost of losing time arithmetic.
- DATETIMEOFFSET: mapping to TIMESTAMP would normalize to an instant and
  DROP the offset. Policy: STRING, lossless round-trippable text.
- CLR types (hierarchyid/geometry/geography), sql_variant: opaque BINARY
  passthrough (reference serializes them the same way,
  reference: hack/SerializableBase.cs:8-44).
- rowversion (189) is NOT copyable — the destination regenerates it; it
  is excluded at the catalog layer, and `mapping_for` refuses it.

`custom_schema_hints` emits the `customSchema` option for
`spark.read.jdbc` so the mappings are enforced AT THE SCAN, not after
the driver has already guessed (the stock mssql dialect maps
DATETIMEOFFSET to a session-zone-shifted string, which is neither stable
nor documented).
"""

from __future__ import annotations

from dataclasses import dataclass

ROWVERSION_TYPE_ID = 189


@dataclass(frozen=True)
class TypeMapping:
    spark_type: str  # Spark SQL DDL type string
    lossless: bool
    note: str = ""

    def ddl(self, precision: int = 0, scale: int = 0) -> str:
        if "{p}" in self.spark_type:
            return self.spark_type.format(p=precision, s=scale)
        return self.spark_type


# system_type_id -> policy. Precision-parameterized entries use {p}/{s}.
SQLSERVER_TYPE_MAP: dict[int, TypeMapping] = {
    # exact numerics
    127: TypeMapping("BIGINT", True),
    56: TypeMapping("INT", True),
    52: TypeMapping("SMALLINT", True),
    48: TypeMapping("SMALLINT", True, "tinyint is unsigned 0..255; Spark"
                    " has no unsigned byte — widened to SMALLINT"),
    104: TypeMapping("BOOLEAN", True, "bit"),
    106: TypeMapping("DECIMAL({p},{s})", True),
    108: TypeMapping("DECIMAL({p},{s})", True, "numeric"),
    60: TypeMapping("DECIMAL(19,4)", True, "money"),
    122: TypeMapping("DECIMAL(10,4)", True, "smallmoney"),
    # approximate numerics
    62: TypeMapping("DOUBLE", True, "float(53)"),
    59: TypeMapping("FLOAT", True, "real"),
    # date/time
    40: TypeMapping("DATE", True),
    61: TypeMapping("TIMESTAMP_NTZ", True,
                    "datetime: 3.33 ms ticks fit microseconds exactly"),
    58: TypeMapping("TIMESTAMP_NTZ", True, "smalldatetime"),
    42: TypeMapping("TIMESTAMP_NTZ", False,
                    "datetime2(7): 100 ns ticks TRUNCATE to microseconds;"
                    " datetime2(0..6) is lossless"),
    41: TypeMapping("STRING", True,
                    "time(n): Spark has no TIME type; ISO-8601 text keeps"
                    " all 100 ns digits"),
    43: TypeMapping("STRING", True,
                    "datetimeoffset: text keeps the offset; TIMESTAMP"
                    " would normalize it away"),
    # character
    175: TypeMapping("STRING", True, "char"),
    167: TypeMapping("STRING", True, "varchar"),
    239: TypeMapping("STRING", True, "nchar"),
    231: TypeMapping("STRING", True, "nvarchar"),
    35: TypeMapping("STRING", True, "text (deprecated)"),
    99: TypeMapping("STRING", True, "ntext (deprecated)"),
    # binary
    173: TypeMapping("BINARY", True, "binary"),
    165: TypeMapping("BINARY", True, "varbinary"),
    34: TypeMapping("BINARY", True, "image (deprecated)"),
    # other
    36: TypeMapping("STRING", True, "uniqueidentifier as canonical text"),
    241: TypeMapping("STRING", True, "xml as text"),
    98: TypeMapping("BINARY", False,
                    "sql_variant: opaque bytes; per-value type tag is not"
                    " reconstructed"),
    240: TypeMapping("BINARY", True,
                     "CLR (hierarchyid/geometry/geography): native"
                     " serialization passthrough"),
}


def mapping_for(system_type_id: int) -> TypeMapping:
    """The declared policy for one catalog column type.

    Raises for rowversion (never copyable — the destination regenerates
    it; the catalog excludes it before planning) and for unknown ids
    (fail loudly rather than silently guessing a conversion).
    """
    if system_type_id == ROWVERSION_TYPE_ID:
        raise ValueError(
            "rowversion/timestamp columns are not copyable; the catalog"
            " must exclude them (reference:"
            " client/TableInfoCollector.cs:160)"
        )
    try:
        return SQLSERVER_TYPE_MAP[system_type_id]
    except KeyError:
        raise ValueError(
            f"no declared Spark mapping for system_type_id"
            f" {system_type_id}; add a policy entry rather than relying"
            " on JDBC-dialect guessing"
        ) from None


def custom_schema_hints(
    columns: list[tuple[str, int, int, int]],
) -> str | None:
    """Build the ``customSchema`` option for ``spark.read.jdbc`` from
    catalog rows of (name, system_type_id, precision, scale).

    Only types whose stock JDBC mapping is wrong or undocumented need a
    hint (time/datetimeoffset/sql_variant/CLR -> declared text/binary);
    emitting every column keeps the whole scan schema explicit and
    stable across driver versions. Returns None for an empty column
    list."""
    if not columns:
        return None
    parts = []
    for name, type_id, precision, scale in columns:
        m = mapping_for(type_id)
        quoted = name.replace("`", "``")  # backticks are legal in names
        parts.append(f"`{quoted}` {m.ddl(precision, scale)}")
    return ", ".join(parts)


def lossy_columns(
    columns: list[tuple[str, int, int, int]],
) -> list[tuple[str, str]]:
    """(column, reason) for every column whose declared mapping loses
    information — surfaced by the planner log so a truncation is a
    visible decision, never a surprise."""
    out = []
    for name, type_id, _p, scale in columns:
        m = mapping_for(type_id)
        if not m.lossless:
            # datetime2 is only lossy at scale 7 (100 ns); 0..6 fit
            # microseconds exactly.
            if type_id == 42 and scale <= 6:
                continue
            out.append((name, m.note))
    return out
