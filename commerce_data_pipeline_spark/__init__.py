"""commerce_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (ashwin2912/commerce-data-pipeline),
extended with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design tenets (see SURVEY.md §4, §7):
- DataFrame/SQL API only; Catalyst handles pushdown, pruning, join planning.
- Built-in `pyspark.sql.functions` in all hot paths; Pandas UDFs only where
  built-ins genuinely can't express the semantics.
- Every operator designed for a 1000-executor cluster on ~100 TB: broadcast
  small dimensions, avoid unkeyed shuffles, keep plans whole-stage-codegen'd.
"""

from commerce_data_pipeline_spark.session import get_spark
from commerce_data_pipeline_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
