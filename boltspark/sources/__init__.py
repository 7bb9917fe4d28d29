"""Table sources: the Iceberg-style table layout the corpus lives in."""
