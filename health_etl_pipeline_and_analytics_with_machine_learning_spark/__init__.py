"""PySpark-native analytics engine with the query and data-processing
capabilities of ``jimmyukaba1234-prog/Health-ETL-Pipeline-and-Analytics-with-Machine-learning``
(reference surveyed in /root/repo/SURVEY.md), rebuilt Spark-first.

Layout
------
- ``session``     : SparkSession factory tuned for local + cluster use.
- ``sources``     : ingest (CSV with encoding fallback + NA tokens, parquet) and sinks.
- ``functions``   : scalar column-expression libraries (health cleaning, text analysis).
- ``operators``   : relational query library (SURVEY §2 inventory), dedup,
                    similarity search, multimodal plumbing, record-id helpers.
- ``plans``       : plan-inspection helpers (pushdown / broadcast assertions).
- ``streaming``   : Structured Streaming flows over the events table.
- ``pipeline``    : the end-to-end health ETL (clean_health_dataset equivalent).
- ``ml``          : MLlib regression pipeline mirroring the reference's sklearn RF.
- ``quality``     : data-quality report as DataFrame-returning checks.

Everything is built on public Apache Spark APIs only; all engine compute is
native Catalyst expressions / built-in operators (no row-at-a-time Python UDFs
in any hot path — see SURVEY §4.2).
"""

__version__ = "0.1.0"
