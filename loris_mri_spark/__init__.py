"""loris_mri_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of aces/Loris-MRI (reference: /root/reference,
release 26.0).

This is NOT a port of the reference's Perl/Python row-at-a-time engine; it is
a Spark-first re-expression of the same semantics:

- relational tables          -> parquet-backed DataFrames (catalog.py)
- hand-written SQL           -> declarative DataFrame plans Catalyst optimizes
- per-file subprocess loops  -> single distributed DAGs
- rule engines (protocol id,
  QC checks)                 -> broadcast non-equi joins + priority windows
- EAV parameter tables       -> long tables + pivot/map views
- cron batch ingest          -> Structured Streaming file sources

See SURVEY.md for the operator inventory (§2) each module implements.
"""

from loris_mri_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
