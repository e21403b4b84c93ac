"""Structured Streaming jobs (SURVEY §2.8)."""
