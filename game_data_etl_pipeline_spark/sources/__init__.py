"""Source connectors: parquet/json landing zones, REST extract, JDBC-style sinks."""
