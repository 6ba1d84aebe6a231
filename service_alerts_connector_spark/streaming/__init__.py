"""Structured Streaming execution of the pipeline (SURVEY §2.8 ST1-ST8)."""
