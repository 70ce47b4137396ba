"""Source connectors: JSON payload ingestion, JDBC, Elasticsearch."""
