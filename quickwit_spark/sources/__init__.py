"""Table-format source connectors (Iceberg snapshot reader/writer)."""
