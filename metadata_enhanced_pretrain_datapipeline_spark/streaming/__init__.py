"""Structured Streaming extension (beyond-reference; SURVEY.md §2.11)."""
