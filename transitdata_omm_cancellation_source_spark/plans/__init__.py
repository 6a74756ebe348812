"""End-to-end query plans (SURVEY.md §3) and the oracle registry."""
