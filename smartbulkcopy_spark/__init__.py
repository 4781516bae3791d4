"""smartbulkcopy_spark — a PySpark-native bulk data-movement + analytics engine.

A ground-up re-expression of the capabilities of Azure-Samples/smartbulkcopy
(reference surveyed in SURVEY.md) on Apache Spark:

- partition-parallel table copy (planner -> partitioned read -> optional
  sorted write -> verification), the reference's core job
  (reference: client/SmartBulkCopy.cs:69-253)
- the full relational query surface distilled in SURVEY.md §2.10
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) designed for 100 TB scale

Everything is declarative DataFrame/SQL-first so Catalyst picks physical
strategies; custom logic lives in a driver-side planner and a small set of
Arrow-batched Pandas UDFs.
"""

from smartbulkcopy_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
