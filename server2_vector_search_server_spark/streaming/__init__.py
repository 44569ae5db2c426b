"""Structured Streaming ingestion and event-time analytics (SURVEY.md §2.I)."""
