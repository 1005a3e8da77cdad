"""Relational + graph-construction operators (SURVEY.md §2 families)."""
