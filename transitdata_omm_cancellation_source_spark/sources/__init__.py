"""Input connectors: JDBC relational source, config/env source."""
