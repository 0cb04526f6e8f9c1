"""Structured Streaming equivalents (SURVEY.md §2.11: the reference has
no streaming operators — its WAL/recovery is the closest machinery; here
streaming is first-class via readStream/withWatermark/window)."""
