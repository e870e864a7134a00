"""Pipeline orchestration (SURVEY.md §3) — DataFrame-to-DataFrame stages."""
