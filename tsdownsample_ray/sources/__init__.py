"""Dataset sources: Parquet readers and the deterministic synthetic
Common-Crawl-style page corpus."""
