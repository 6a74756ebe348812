"""PySpark-native analytics engine with the query and data-processing
capabilities of HSLdevcom/transitdata-omm-cancellation-source.

The reference (read-only at /root/reference/) is a single-threaded JDBC
poller: an 11-table SQL Server join is decoded row-at-a-time into
GTFS-RT-style trip-cancellation records, deduplicated with a
status-priority rule, diffed against the previous poll, and published to
Pulsar (see SURVEY.md).  This package re-hosts both halves — the T-SQL
relational algebra *and* the Java dataflow — as declarative Spark
DataFrame / Structured Streaming programs so Catalyst/Tungsten provide
the optimizer and vectorized execution the reference never had, and the
same logical plan scales from a laptop to a 1000-executor cluster.

Layout
------
- ``session``    SparkSession factory tuned for local[N] and cluster use
- ``catalog``    testdata / parquet table registry (schema-stable loads)
- ``config``     reference-equivalent runtime configuration (S8/S9)
- ``functions``  scalar & vector expression builders (SURVEY §2.2)
- ``operators``  joins, filters, dedup, diff, fuzzy-dedup, similarity,
                 text analysis (SURVEY §2.3-§2.5 + north-star ops)
- ``plans``      end-to-end query plans incl. the flagship cancellation
                 pipeline (SURVEY §3 E1-E3) and the oracle registry
- ``sources``    batch/JDBC/streaming sources and sinks (SURVEY §2.1)
- ``streaming``  micro-batch poller loop with cross-batch snapshot state
"""

__version__ = "0.1.0"
