"""Relational / dataflow operators (SURVEY.md §2.3-§2.5 + north-star).

Every operator is a pure ``DataFrame -> DataFrame`` transformation so
Catalyst sees one logical plan end-to-end: filters still push down
through them, column pruning still reaches the scans, and AQE can
re-plan the joins they introduce.
"""
