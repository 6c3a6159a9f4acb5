"""Scalar kernel functions (extraction, URLs, hashing, robots, rate limits)."""
