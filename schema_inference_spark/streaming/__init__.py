"""Structured Streaming validation surface (SURVEY.md §2.D20)."""
