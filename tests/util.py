"""Result-set comparison mirroring the driver: row count + column names +
order-insensitive canonicalized values (Spark result vs DuckDB oracle)."""

from __future__ import annotations

import datetime as _dt
import decimal
import math


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _rows_from_pandas(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort()
    return cols, out


def assert_matches_oracle(spark_df, duck_con, oracle_sql, name=""):
    got_pdf = spark_df.toPandas()
    exp_pdf = duck_con.execute(oracle_sql).arrow().to_pandas()

    got_cols, got_rows = _rows_from_pandas(got_pdf)
    exp_cols, exp_rows = _rows_from_pandas(exp_pdf)

    assert got_cols == exp_cols, f"{name}: column mismatch {got_cols} vs {exp_cols}"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} vs {len(exp_rows)}"
    )
    for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
        assert g == e, f"{name}: row {i} differs:\n  spark={g}\n  duck ={e}"
