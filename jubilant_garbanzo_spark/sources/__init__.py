"""Source/sink connectors (SURVEY.md §2b "Scans / sources / sinks").

The reference has exactly one source (a twitter4j receiver,
``main.scala:41``) and one sink (driver println, ``main.scala:51-55``).
The engine generalizes to the formats a Spark deployment actually uses:
parquet (primary, via :mod:`..catalog`), CSV/JSON with explicit schemas,
``binaryFile`` for multimodal blobs, and partitioned parquet writes.
"""
