"""Scalar function library (SURVEY.md §2.9) — native column expressions only."""
