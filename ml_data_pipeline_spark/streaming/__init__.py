"""Structured Streaming over the events table (SURVEY.md §2.9 scope note:
the reference has no streaming; this is the scale-extension demonstrator)."""
