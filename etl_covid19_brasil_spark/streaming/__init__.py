"""Structured Streaming jobs (SURVEY.md §2.9)."""
