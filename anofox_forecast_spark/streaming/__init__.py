"""Structured Streaming surfaces (optional; the reference has no event-stream
data model — SURVEY.md §1.3 'No streaming data model')."""
