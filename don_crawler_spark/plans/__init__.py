"""Crawl plans: round dataflow, multi-round driver, checkpoints, oracle."""
