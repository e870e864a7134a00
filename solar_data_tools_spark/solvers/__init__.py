"""Solver layer (SURVEY.md §2.8): per-series signal decompositions run as
grouped-map pandas UDFs (``applyInPandas``) — fleet-parallel, tiny per-task
inputs (365 x years daily rows per site)."""
