"""Sources: file readers (CSV/JSON/parquet) and JDBC scans."""
