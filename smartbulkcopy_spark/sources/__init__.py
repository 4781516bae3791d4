"""Sources & sinks: parquet (tested in-container) and JDBC (API parity,
requires a live endpoint)."""
