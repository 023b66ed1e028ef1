"""jubilant_garbanzo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``wildlyclassyprince/jubilant-garbanzo`` (a 64-line Spark
DStreams "trending hashtags" app, ``tweet-streamer/src/main/scala/main.scala``),
widened to the full operator inventory declared in ``SURVEY.md §2``:

- batch relational operators (scan/filter/project/join/agg/window/set-ops)
  expressed declaratively on the DataFrame API so Catalyst + AQE plan them;
- Structured Streaming forms of the reference's windowed trending pipeline
  (event-time windows + watermarks instead of processing-time DStreams);
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search over embeddings, text analysis,
  multimodal binary-column plumbing.

Design rules (see SURVEY.md §4.2): DataFrame-first, zero RDDs, zero
row-at-a-time Python UDFs in hot paths, broadcast small dimensions, let
AQE handle skew, keep every plan whole-stage-codegen friendly.
"""

__version__ = "0.1.0"

from jubilant_garbanzo_spark.session import get_spark, configure_runtime
from jubilant_garbanzo_spark.catalog import TABLES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "configure_runtime",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]
