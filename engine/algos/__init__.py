"""Iterative DataFrame graph algorithms (SURVEY.md §2 Table B.7)."""
