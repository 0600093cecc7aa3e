"""Experiment runners: one module per benchmark task, mirroring the
reference's experiments/<task>/ layout (SURVEY.md §2.5)."""
