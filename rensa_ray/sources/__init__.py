"""Sources: synthetic corpus generation and parquet readers."""
