"""The SQL Server -> Spark type-mapping policy (SURVEY §7.3 risk area):
every catalog type has a declared target, truncations are explicit, and
the scan-level customSchema hints are well-formed."""

from __future__ import annotations

import pytest

from smartbulkcopy_spark.types import (
    ROWVERSION_TYPE_ID,
    SQLSERVER_TYPE_MAP,
    custom_schema_hints,
    lossy_columns,
    mapping_for,
)


def test_every_mapping_has_a_valid_ddl_type():
    for type_id, m in SQLSERVER_TYPE_MAP.items():
        ddl = m.ddl(18, 4)
        assert ddl and "{" not in ddl, (type_id, ddl)


def test_decimal_mapping_carries_precision_and_scale():
    assert mapping_for(106).ddl(18, 4) == "DECIMAL(18,4)"
    assert mapping_for(108).ddl(38, 0) == "DECIMAL(38,0)"


def test_exotic_temporal_types_have_documented_policies():
    # datetime2(7): 100ns -> microsecond truncation is declared lossy
    assert mapping_for(42).spark_type == "TIMESTAMP_NTZ"
    assert not mapping_for(42).lossless
    # time(n) and datetimeoffset round-trip as text, losslessly
    assert mapping_for(41).spark_type == "STRING"
    assert mapping_for(41).lossless
    assert mapping_for(43).spark_type == "STRING"
    assert mapping_for(43).lossless
    # CLR types pass through as bytes
    assert mapping_for(240).spark_type == "BINARY"


def test_rowversion_refused_and_unknown_fails_loudly():
    with pytest.raises(ValueError, match="rowversion"):
        mapping_for(ROWVERSION_TYPE_ID)
    with pytest.raises(ValueError, match="no declared Spark mapping"):
        mapping_for(9999)


def test_custom_schema_hints_shape():
    cols = [
        ("o_orderkey", 127, 19, 0),
        ("o_total", 106, 18, 2),
        ("o_when", 43, 34, 7),
    ]
    hints = custom_schema_hints(cols)
    assert hints == (
        "`o_orderkey` BIGINT, `o_total` DECIMAL(18,2), `o_when` STRING"
    )
    assert custom_schema_hints([]) is None


def test_lossy_columns_surfaced():
    cols = [
        ("ok", 127, 19, 0),
        ("precise", 42, 27, 7),
        ("fits", 42, 23, 3),  # datetime2(3) fits microseconds exactly
        ("variant", 98, 0, 0),
    ]
    lossy = dict(lossy_columns(cols))
    assert set(lossy) == {"precise", "variant"}
    assert "100 ns" in lossy["precise"]


def test_custom_schema_hints_escape_backticks():
    assert custom_schema_hints([("we`ird", 167, 0, 0)]) == (
        "`we``ird` STRING"
    )
