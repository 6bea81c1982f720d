"""DataFrame-level operator jobs (index build, search, dedup, similarity...)."""
