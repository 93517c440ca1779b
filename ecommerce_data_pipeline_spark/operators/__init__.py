"""Operator inventory (SURVEY.md §2), one module per family."""
