"""Sources: table loaders and the deterministic synthetic crawl corpus."""
