"""Outward-facing sinks (SURVEY.md §2.1 S7-S9): table loads live in
operators/load.py, the console report in cli.py; this package holds the
mail sink (S9)."""
