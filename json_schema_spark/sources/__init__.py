"""Sources: parquet table loaders + deterministic synthetic webpages."""
