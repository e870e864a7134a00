"""Analysis algorithms (SURVEY.md §2.8 wrappers + §2.10 ML-adjacent ops):
per-site solves orchestrated as grouped-map pandas UDFs over the daily
table, mirroring the reference's solardatatools/algorithms/ surface."""
