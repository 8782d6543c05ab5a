"""Structured Streaming: windowed analytics over `events` and the queue
pollers re-expressed as micro-batch streams (SURVEY.md §2.A21-A26, §3.4)."""
